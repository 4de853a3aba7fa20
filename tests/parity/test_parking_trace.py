"""Golden-trace parity for parking-v0: continuous control + goal reward."""

import numpy as np
import jax.numpy as jnp
import pytest

import highwayenv_tpu as ht
from tests.parity.util import ref_positions, ref_speeds, ref_to_vehicle_state

gym = pytest.importorskip("gymnasium")
pytest.importorskip("highway_env")


def make_pair(seed=0):
    import jax
    from highwayenv_tpu.envs.base import EnvState

    ref = gym.make("parking-v0")
    ref.reset(seed=seed)
    ours = ht.make("parking-v0")
    veh = ref_to_vehicle_state(ref, ours)
    state = EnvState(
        vehicles=veh,
        time=jnp.zeros((), jnp.float32),
        steps=jnp.zeros((), jnp.int32),
        key=jax.random.PRNGKey(0),
    )
    return ref, ours, state


def test_goal_observation_matches():
    ref, ours, state = make_pair(seed=1)
    obs = ours._observe(state)
    ref_obs = ref.unwrapped.observation_type.observe()
    for k in ("observation", "achieved_goal", "desired_goal"):
        np.testing.assert_allclose(
            np.asarray(obs[k]), np.asarray(ref_obs[k]), atol=1e-5, err_msg=k
        )


@pytest.mark.parametrize("seed", [0, 6])
def test_parking_trace(seed):
    ref, ours, state = make_pair(seed=seed)
    actions = [
        [0.8, 0.3], [0.8, 0.3], [0.5, -0.4], [0.2, 0.0],
        [-0.5, 0.2], [0.0, -1.0], [1.0, 1.0], [0.3, 0.1],
    ]
    for t, action in enumerate(actions):
        a = np.asarray(action, np.float32)
        ref_obs, ref_r, ref_term, ref_trunc, ref_info = ref.step(a)
        obs, state, r, term, trunc, info = ours.step(state, jnp.asarray(a))
        n = len(ref.unwrapped.road.vehicles)
        tol = 0.05 * (t + 1) ** 2
        err = np.abs(
            np.asarray(state.vehicles.pos)[:n] - ref_positions(ref)[:n]
        ).max()
        assert err < tol, f"step {t}: max pos err {err}"
        assert abs(float(r) - ref_r) < 0.02 + 0.01 * t, (t, float(r), ref_r)
        assert bool(term) == ref_term, t
        assert bool(trunc) == ref_trunc, t
        assert bool(info["is_success"]) == bool(ref_info["is_success"]), t
        np.testing.assert_allclose(
            np.asarray(obs["observation"]),
            np.asarray(ref_obs["observation"]),
            atol=0.02,
        )
        if ref_term or ref_trunc:
            break
