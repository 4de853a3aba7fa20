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


def test_close_objects_to():
    import jax.numpy as jnp

    env = ht.make("highway-v0")
    _, state = env.reset(jax.random.PRNGKey(0))
    sel, ok = jax.jit(
        lambda s: env.close_objects_to(s, 0, 200.0, count=5, see_behind=False)
    )(state)
    assert sel.shape == (5,) and ok.shape == (5,)
    pos = np.asarray(state.vehicles.pos)
    d = np.linalg.norm(pos - pos[0], axis=-1)
    for s_, o_ in zip(np.asarray(sel), np.asarray(ok)):
        if o_:
            assert d[s_] < 200.0 and s_ != 0
    # sorted by |lane distance| ascending among valid entries
    ego_lane = state.vehicles.lane[0]
    from highwayenv_tpu.road import lane as lane_ops

    s_all, _ = lane_ops.local_coordinates(
        env.geo, jnp.broadcast_to(ego_lane, (state.vehicles.num_slots,)),
        state.vehicles.pos,
    )
    gaps = np.abs(np.asarray(s_all) - float(s_all[0]))
    chosen = [gaps[s_] for s_, o_ in zip(np.asarray(sel), np.asarray(ok)) if o_]
    assert chosen == sorted(chosen)


def test_set_route_at_intersection():
    from highwayenv_tpu.envs.preprocessors import set_route_at_intersection
    from highwayenv_tpu.ops.uncertainty import (
        route_of_slot,
        routes_at_intersection,
    )
    import jax.numpy as jnp

    env = ht.make("intersection-v0")
    _, state = env.reset(jax.random.PRNGKey(1))
    rl = np.asarray(state.vehicles.route_len)
    kinds = np.asarray(state.vehicles.kind)
    slot = int(np.nonzero((kinds == 2) & (rl > 1))[0][0])
    options = routes_at_intersection(env.net, route_of_slot(env, state, slot))
    assert len(options) >= 2
    for i in range(len(options)):
        st = set_route_at_intersection(env, state, slot, i)
        got = route_of_slot(env, st, slot)
        want = [
            (f, t, lid if lid is not None else lid) for f, t, lid in options[i]
        ]
        assert [(f, t) for f, t, _ in got] == [(f, t) for f, t, _ in want]
    # env still steps
    _, st2, r, *_ = env.step(st, jnp.int32(1))
    assert np.isfinite(float(r))
