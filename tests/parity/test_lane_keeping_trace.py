"""Golden-trace parity for lane-keeping-v0: BicycleVehicle RK4 dynamics."""

import numpy as np
import jax.numpy as jnp
import pytest

import highwayenv_tpu as ht
from tests.parity.util import ref_to_vehicle_state

gym = pytest.importorskip("gymnasium")
pytest.importorskip("highway_env")


def make_pair(seed=0):
    import jax
    from highwayenv_tpu.envs.base import EnvState

    ref = gym.make("lane-keeping-v0")
    ref.reset(seed=seed)
    ours = ht.make("lane-keeping-v0")
    veh = ref_to_vehicle_state(ref, ours)
    state = EnvState(
        vehicles=veh,
        time=jnp.zeros((), jnp.float32),
        steps=jnp.zeros((), jnp.int32),
        key=jax.random.PRNGKey(0),
    )
    return ref, ours, state


def test_bicycle_dynamics_trace():
    ref, ours, state = make_pair()
    ego = ref.unwrapped.vehicle
    for t in range(25):
        a = np.asarray([0.4 * np.sin(0.3 * t)], np.float32)
        ref_obs, ref_r, *_ = ref.step(a)
        obs, state, r, term, trunc, info = ours.step(state, jnp.asarray(a))
        tol = 1e-3 * (t + 1) ** 2
        err = np.abs(np.asarray(state.vehicles.pos[0]) - ego.position).max()
        assert err < tol, f"step {t}: pos err {err}"
        assert (
            abs(float(state.vehicles.lateral_speed[0]) - ego.lateral_speed) < tol
        ), t
        assert abs(float(state.vehicles.yaw_rate[0]) - ego.yaw_rate) < tol, t
        # reward (lane-centering on the tracked lane)
        assert abs(float(r) - ref_r) < 0.02 + 0.002 * t, (t, float(r), ref_r)
        # noiseless part of the reference_state row must match
        np.testing.assert_allclose(
            np.asarray(obs["reference_state"])[1],
            ref_obs["reference_state"][1],
            atol=0.02 + 0.01 * t,
        )
