"""Adversarial tie-order parity (PARITY #2/#3, resolved round 4).

These micro-semantics require exact coincidences (two objects at the same
longitudinal coordinate; two simultaneous future-collisions against one
vehicle in a 1/15 s frame) that no registered scenario's golden traces
reach, so each is forced here explicitly and checked against the LIVE
reference loops:

- impact assignment order: objects.py:104-111 ASSIGNS (never sums) and the
  pair loop road.py:477-481 makes the final value the last-written pair's;
- neighbour ties: road.py:539-545 keeps the LAST equally-distant front
  object (``<=`` overwrites) and the first rear one (strict ``>``).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import highwayenv_tpu as ht
from highwayenv_tpu.ops import collision
from tests.parity.util import ref_to_vehicle_state


def _ref_env(config=None):
    gym = pytest.importorskip("gymnasium")
    import highway_env  # noqa: F401  (registers envs)

    env = gym.make("highway-v0", config=config or {})
    env.reset(seed=0)
    return env


def _stack_vehicles(ref_env, xs, speeds):
    """Replace the reference scene with IDM vehicles at given longitudinal
    positions on the ego's current lane."""
    from highway_env.vehicle.behavior import IDMVehicle

    road = ref_env.unwrapped.road
    ego = ref_env.unwrapped.vehicle
    lane = road.network.get_lane(ego.lane_index)
    road.vehicles = [ego]
    ego.position = lane.position(float(xs[0]), 0.0)
    ego.heading = lane.heading_at(float(xs[0]))
    ego.speed = float(speeds[0])
    for x, sp in zip(xs[1:], speeds[1:]):
        v = IDMVehicle(
            road, lane.position(float(x), 0.0),
            lane.heading_at(float(x)), float(sp),
        )
        road.vehicles.append(v)
    return road


def test_multi_collision_impact_is_last_written():
    """Three overlapping vehicles -> the middle one receives impact from
    BOTH pairs; the reference keeps the last-written one.  Our kernel must
    match the reference's final impact per vehicle exactly."""
    ref = _ref_env({"vehicles_count": 4, "lanes_count": 2})
    dt = 1.0 / 15
    # overlap all three: pairwise will_intersect and intersecting
    road = _stack_vehicles(ref, [0.0, 3.0, 6.0], [10.0, 0.0, 0.0])

    for i, vehicle in enumerate(road.vehicles):
        for other in road.vehicles[i + 1:]:
            vehicle.handle_collisions(other, dt)
        for other in road.objects:
            vehicle.handle_collisions(other, dt)
    ref_impacts = [
        np.zeros(2) if v.impact is None else np.asarray(v.impact, float)
        for v in road.vehicles
    ]
    # the middle vehicle is in two will-pairs; the test is vacuous otherwise
    assert ref.unwrapped.road.vehicles[1].impact is not None

    env = ht.make("highway-v0", {"vehicles_count": 4, "lanes_count": 2})
    state = ref_to_vehicle_state(ref, env)
    out = jax.jit(lambda s: collision.handle_collisions(s, dt))(state)
    ours = np.asarray(out.impact)
    for i, ref_imp in enumerate(ref_impacts):
        np.testing.assert_allclose(
            ours[i], ref_imp, atol=1e-5,
            err_msg=f"slot {i}: impact mismatch vs reference last-write",
        )
    # crash flags still any-reduced
    for i, v in enumerate(road.vehicles):
        assert bool(np.asarray(out.crashed)[i]) == bool(v.crashed), i


def test_front_neighbour_tie_keeps_last_listed():
    """Two NPCs at the IDENTICAL longitudinal coordinate ahead of the ego:
    the reference scan returns the LAST listed one as front neighbour."""
    ref = _ref_env({"vehicles_count": 4, "lanes_count": 2})
    road = _stack_vehicles(ref, [0.0, 50.0, 50.0], [20.0, 10.0, 15.0])
    ego = ref.unwrapped.vehicle
    v_front, v_rear = road.neighbour_vehicles(ego)
    assert v_front is road.vehicles[2], "reference keeps the LAST tied front"

    env = ht.make("highway-v0", {"vehicles_count": 4, "lanes_count": 2})
    state = ref_to_vehicle_state(ref, env)

    from highwayenv_tpu.road import lane as lane_ops
    from highwayenv_tpu.vehicle import behavior

    table_s, table_lat = lane_ops.projection_table(env.geo, state.pos)
    n = behavior.neighbours(
        env.geo, state, state.lane, table_s, table_lat=table_lat
    )
    ego_slot = list(env.ego_slots)[0]
    # reference vehicles list order == slot order: last tied NPC = slot 2
    assert int(np.asarray(n.front_idx)[ego_slot]) == 2
    assert bool(np.asarray(n.front_ex)[ego_slot])


def test_rear_neighbour_tie_keeps_first_listed():
    ref = _ref_env({"vehicles_count": 4, "lanes_count": 2})
    road = _stack_vehicles(ref, [100.0, 50.0, 50.0], [20.0, 10.0, 15.0])
    ego = ref.unwrapped.vehicle
    _, v_rear = road.neighbour_vehicles(ego)
    assert v_rear is road.vehicles[1], "reference keeps the FIRST tied rear"

    env = ht.make("highway-v0", {"vehicles_count": 4, "lanes_count": 2})
    state = ref_to_vehicle_state(ref, env)

    from highwayenv_tpu.road import lane as lane_ops
    from highwayenv_tpu.vehicle import behavior

    table_s, table_lat = lane_ops.projection_table(env.geo, state.pos)
    n = behavior.neighbours(
        env.geo, state, state.lane, table_s, table_lat=table_lat
    )
    ego_slot = list(env.ego_slots)[0]
    assert int(np.asarray(n.rear_idx)[ego_slot]) == 1
    assert bool(np.asarray(n.rear_ex)[ego_slot])
