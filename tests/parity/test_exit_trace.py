"""Golden-trace parity for exit-v0: multi-segment highway + ExitObservation."""

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

    ref = gym.make("exit-v0")
    ref.reset(seed=seed)
    ours = ht.make("exit-v0")
    veh = ref_to_vehicle_state(ref, ours)
    state = EnvState(
        vehicles=veh,
        time=jnp.zeros((), jnp.float32),
        steps=jnp.zeros((), jnp.int32),
        key=jax.random.PRNGKey(0),
    )
    return ref, ours, state


def test_exit_observation_matches_reference():
    ref, ours, state = make_pair(seed=1)
    obs = np.asarray(ours._observe(state))
    ref_obs = ref.unwrapped.observation_type.observe()
    assert obs.shape == ref_obs.shape == (15, 7)
    np.testing.assert_allclose(obs, ref_obs, atol=1e-4)


@pytest.mark.parametrize("seed", [0, 4])
def test_exit_trace(seed):
    ref, ours, state = make_pair(seed=seed)
    for t, action in enumerate([1, 2, 1, 2, 1, 3, 1, 1]):
        ref_obs, ref_r, ref_term, ref_trunc, ref_info = ref.step(action)
        obs, state, r, term, trunc, info = ours.step(state, jnp.int32(action))
        n = len(ref.unwrapped.road.vehicles)
        tol = 0.08 * (t + 1) ** 2
        err = np.abs(
            np.asarray(state.vehicles.pos)[:n] - ref_positions(ref)[:n]
        ).max()
        assert err < tol, f"step {t}: max pos err {err}"
        assert (
            np.abs(np.asarray(state.vehicles.speed)[:n] - ref_speeds(ref)[:n]).max()
            < tol
        )
        assert abs(float(r) - ref_r) < 0.03 + 0.01 * t, (t, float(r), ref_r)
        assert bool(term) == ref_term, t
        assert bool(trunc) == ref_trunc, t
        assert bool(info["is_success"]) == bool(ref_info["is_success"]), t
        if ref_term or ref_trunc:
            break
