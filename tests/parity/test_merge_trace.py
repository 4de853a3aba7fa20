"""Golden-trace parity for merge-v0: sine-lane ramp, obstacle, altruistic reward."""

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

    ref = gym.make("merge-v0")
    ref.reset(seed=seed)
    ours = ht.make("merge-v0")
    veh = ref_to_vehicle_state(ref, ours)
    state = EnvState(
        vehicles=veh,
        time=jnp.zeros((), jnp.float32),
        steps=jnp.zeros((), jnp.int32),
        key=jax.random.PRNGKey(0),
    )
    return ref, ours, state


def test_network_layout_matches():
    ours = ht.make("merge-v0")
    import highway_env  # noqa: F401
    ref = gym.make("merge-v0")
    ref.reset(seed=0)
    ref_net = ref.unwrapped.road.network
    for idx, lane in ref_net.lanes_dict().items():
        g = ours.net.global_lane_index(idx)
        for s in np.linspace(0, max(lane.length, 1.0), 5):
            np.testing.assert_allclose(
                np.asarray(
                    __import__("highwayenv_tpu.road.lane", fromlist=["position"]).position(
                        ours.geo, jnp.int32(g), jnp.float32(s), jnp.float32(0.0)
                    )
                ),
                lane.position(s, 0),
                atol=2e-3,
            )


@pytest.mark.parametrize("seed", [0, 4])
def test_merge_trace(seed):
    ref, ours, state = make_pair(seed=seed)
    for t in range(7):
        action = 1
        ref_obs, ref_r, ref_term, ref_trunc, _ = ref.step(action)
        obs, state, r, term, trunc, info = ours.step(state, jnp.int32(action))
        n = len(ref.unwrapped.road.vehicles)
        tol = 0.05 * (t + 1) ** 2
        err = np.abs(np.asarray(state.vehicles.pos)[:n] - ref_positions(ref)[:n]).max()
        assert err < tol, f"step {t}: max pos err {err}"
        assert np.abs(
            np.asarray(state.vehicles.speed)[:n] - ref_speeds(ref)[:n]
        ).max() < tol
        assert abs(float(r) - ref_r) < 0.03 + 0.01 * t, (t, float(r), ref_r)
        assert bool(term) == ref_term, t
        np.testing.assert_allclose(np.asarray(obs), ref_obs, atol=3e-3 * (t + 1))
        if ref_term or ref_trunc:
            break
