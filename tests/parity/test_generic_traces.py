"""Golden-trace parity for the parameterized generic scenarios."""

import numpy as np
import jax.numpy as jnp
import pytest

import highwayenv_tpu as ht
from tests.parity.util import ref_positions, ref_speeds, ref_to_vehicle_state

gym = pytest.importorskip("gymnasium")
pytest.importorskip("highway_env")


def make_pair(env_id, seed=0, config=None):
    import jax
    from highwayenv_tpu.envs.base import EnvState

    ref = gym.make(env_id, config=config)
    ref.reset(seed=seed)
    ours = ht.make(env_id, config)
    veh = ref_to_vehicle_state(ref, ours)
    state = EnvState(
        vehicles=veh,
        time=jnp.zeros((), jnp.float32),
        steps=jnp.zeros((), jnp.int32),
        key=jax.random.PRNGKey(0),
    )
    return ref, ours, state


@pytest.mark.parametrize("env_id,seed", [
    ("merge-generic-v0", 0),
    ("merge-generic-v0", 3),
    ("roundabout-generic-v0", 0),
    ("roundabout-generic-v0", 2),
])
def test_generic_trace(env_id, seed):
    ref, ours, state = make_pair(env_id, seed=seed)
    for t, action in enumerate([1, 1, 2, 1, 0, 1, 1, 1]):
        ref_obs, ref_r, ref_term, ref_trunc, _ = ref.step(action)
        obs, state, r, term, trunc, info = ours.step(state, jnp.int32(action))
        n = len(ref.unwrapped.road.vehicles)
        tol = 0.1 * (t + 1) ** 2
        err = np.abs(
            np.asarray(state.vehicles.pos)[:n] - ref_positions(ref)[:n]
        ).max()
        assert err < tol, f"{env_id} step {t}: max pos err {err}"
        assert (
            np.abs(np.asarray(state.vehicles.speed)[:n] - ref_speeds(ref)[:n]).max()
            < tol
        )
        assert abs(float(r) - ref_r) < 0.05 + 0.01 * t, (t, float(r), ref_r)
        assert bool(term) == ref_term, t
        assert bool(trunc) == ref_trunc, t
        if ref_term or ref_trunc:
            break


def test_merge_generic_custom_geometry():
    cfg = {
        "lanes_count": 3,
        "before_merge_length": 100,
        "converge_merge_length": 60,
        "parallel_merge_length": 60,
        "after_merge_length": 120,
    }
    ref, ours, state = make_pair("merge-generic-v0", seed=1, config=cfg)
    net = ref.unwrapped.road.network
    for (f, t), lanes in ours.net.edges.items():
        for i, lane in enumerate(lanes):
            rl = net.get_lane((f, t, i))
            for s in (0.0, rl.length / 2, rl.length):
                np.testing.assert_allclose(
                    lane.position(s, 0.0), rl.position(s, 0.0), atol=1e-6
                )
