"""Golden-trace parity: highway-v0 stepped from an identical initial scene.

The reference env is reset with a fixed seed, its scene injected into the TPU
engine, and both are stepped with the same action sequence.  We compare
per-step vehicle positions/speeds, ego reward/termination.  Tolerances admit
f32-vs-f64 drift; decision divergence (MOBIL lane choices) would blow up the
position error immediately, so tight-ish bounds over several steps are a
strong behavioral check.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import highwayenv_tpu as ht
from tests.parity.util import ref_positions, ref_speeds, ref_to_vehicle_state

gym = pytest.importorskip("gymnasium")
pytest.importorskip("highway_env")


def make_pair(config, env_id="highway-v0", seed=0):
    ref = gym.make(env_id, config=config)
    ref.reset(seed=seed)
    ours = ht.make(env_id, config)
    veh = ref_to_vehicle_state(ref, ours)
    from highwayenv_tpu.envs.base import EnvState
    import jax

    state = EnvState(
        vehicles=veh,
        time=jnp.zeros((), jnp.float32),
        steps=jnp.zeros((), jnp.int32),
        key=jax.random.PRNGKey(0),
    )
    return ref, ours, state


@pytest.mark.parametrize("seed", [0, 1])
def test_highway_idle_trace(seed):
    config = {"lanes_count": 4, "vehicles_count": 20, "duration": 40}
    ref, ours, state = make_pair(config, seed=seed)

    for t in range(8):
        action = 1  # IDLE
        _, ref_r, ref_term, ref_trunc, _ = ref.step(action)
        obs, state, r, term, trunc, info = ours.step(state, jnp.int32(action))

        n = len(ref.unwrapped.road.vehicles)
        ours_pos = np.asarray(state.vehicles.pos)[:n]
        ours_speed = np.asarray(state.vehicles.speed)[:n]
        rp = ref_positions(ref)[:n]
        rs = ref_speeds(ref)[:n]

        tol = 0.05 * (t + 1) ** 2
        err = np.abs(ours_pos - rp).max()
        assert err < tol, f"step {t}: max position error {err}"
        assert np.abs(ours_speed - rs).max() < tol, f"step {t} speeds"
        assert abs(float(r) - ref_r) < 0.03 + 0.01 * t, (t, float(r), ref_r)
        assert bool(term) == ref_term, t
        assert bool(trunc) == ref_trunc, t
        if ref_term or ref_trunc:
            break


def test_highway_action_sequence_trace():
    """Mixed meta-actions: lane changes and speed changes must track."""
    config = {"lanes_count": 4, "vehicles_count": 15, "duration": 40}
    ref, ours, state = make_pair(config, seed=3)
    actions = [3, 1, 0, 1, 2, 4, 1, 1]  # FASTER, IDLE, LEFT, ..., SLOWER
    ego_ref = ref.unwrapped.vehicle

    for t, action in enumerate(actions):
        ref.step(action)
        obs, state, r, term, trunc, info = ours.step(state, jnp.int32(action))
        tol = 0.05 * (t + 1) ** 2
        np.testing.assert_allclose(
            np.asarray(state.vehicles.pos[0]), ego_ref.position, atol=tol
        )
        assert (
            int(state.vehicles.speed_index[0]) == ego_ref.speed_index
        ), f"step {t} speed_index"
        ours_tl = int(state.vehicles.target_lane[0])
        ref_tl = ours.net.global_lane_index(ego_ref.target_lane_index)
        assert ours_tl == ref_tl, f"step {t} target lane"
        if bool(term):
            break


def test_highway_obs_parity():
    """Kinematics observation matches the reference's pandas pipeline."""
    config = {"lanes_count": 4, "vehicles_count": 20}
    ref, ours, state = make_pair(config, seed=5)
    ref_obs, *_ = ref.step(1)
    obs, state, *_ = ours.step(state, jnp.int32(1))
    np.testing.assert_allclose(np.asarray(obs), ref_obs, atol=2e-3)
