"""Preprocessor chain still steps (mirrors tests/envs/test_env_preprocessors.py)."""

import numpy as np
import jax
import jax.numpy as jnp

import highwayenv_tpu as ht
from highwayenv_tpu.envs import preprocessors as pp


def test_preprocessor_chain_still_steps():
    env = ht.make("highway-fast-v0")
    obs, state = env.reset(jax.random.PRNGKey(0))
    state = pp.simplify(env, state)
    state = pp.change_vehicles(
        env, state, "highway_env.vehicle.behavior.IDMVehicle"
    )
    state = pp.set_preferred_lane(env, state, 0)
    state = pp.set_vehicle_field(env, state, "enable_lane_change", False)
    state = pp.randomize_behavior(env, state, jax.random.PRNGKey(1))
    for _ in range(3):
        obs, state, r, term, trunc, info = env.step(state, jnp.int32(1))
        assert np.all(np.isfinite(np.asarray(obs)))


def test_change_vehicles_to_linear():
    from highwayenv_tpu.vehicle.state import KIND_LINEAR

    env = ht.make("highway-fast-v0")
    obs, state = env.reset(jax.random.PRNGKey(0))
    state = pp.change_vehicles(
        env, state, "highway_env.vehicle.behavior.AggressiveVehicle"
    )
    veh = state.vehicles
    npc = np.asarray(veh.kind) == KIND_LINEAR
    assert npc.sum() == env.config["vehicles_count"]
    assert np.allclose(np.asarray(veh.mobil_gain)[npc], 1.0)
    for _ in range(3):
        obs, state, *_ = env.step(state, jnp.int32(1))
    assert np.all(np.isfinite(np.asarray(obs)))


def test_simplify_deactivates_distant():
    env = ht.make("highway-v0")
    obs, state = env.reset(jax.random.PRNGKey(0))
    before = int(np.asarray(state.vehicles.active).sum())
    state = pp.simplify(env, state)
    after = int(np.asarray(state.vehicles.active).sum())
    assert after <= before
