"""Golden-trace parity for u-turn-v0: circular-turn routing + TTC obs."""

import numpy as np
import jax.numpy as jnp
import pytest

import highwayenv_tpu as ht
from tests.parity.util import ref_positions, ref_speeds, ref_to_vehicle_state

gym = pytest.importorskip("gymnasium")
pytest.importorskip("highway_env")


def make_pair(seed=0, env_id="u-turn-v0"):
    import jax
    from highwayenv_tpu.envs.base import EnvState

    ref = gym.make(env_id)
    ref.reset(seed=seed)
    ours = ht.make(env_id)
    veh = ref_to_vehicle_state(ref, ours)
    state = EnvState(
        vehicles=veh,
        time=jnp.zeros((), jnp.float32),
        steps=jnp.zeros((), jnp.int32),
        key=jax.random.PRNGKey(0),
    )
    return ref, ours, state


def test_network_layout_matches():
    ref, ours, _ = make_pair()
    net = ref.unwrapped.road.network
    for (f, t), lanes in ours.net.edges.items():
        for i, lane in enumerate(lanes):
            rl = net.get_lane((f, t, i))
            for s in (0.0, rl.length / 2, rl.length):
                np.testing.assert_allclose(
                    lane.position(s, 0.0), rl.position(s, 0.0), atol=1e-6
                )


def test_ttc_observation_matches_reference():
    ref, ours, state = make_pair(seed=3)
    obs = np.asarray(ours._observe(state))
    ref_obs = ref.unwrapped.observation_type.observe()
    assert obs.shape == ref_obs.shape == (3, 3, 16)
    np.testing.assert_allclose(obs, ref_obs, atol=1e-5)


@pytest.mark.parametrize("seed,env_id", [
    (0, "u-turn-v0"), (5, "u-turn-v0"), (0, "u-turn-v1"), (5, "u-turn-v1"),
])
def test_u_turn_trace(seed, env_id):
    ref, ours, state = make_pair(seed=seed, env_id=env_id)
    for t, action in enumerate([1, 1, 4, 1, 0, 1, 2, 1]):
        ref_obs, ref_r, ref_term, ref_trunc, _ = ref.step(action)
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
        if ref_term or ref_trunc:
            break
