"""Golden-trace parity harness: inject a reference scene into the TPU engine.

Builds a ``VehicleState`` from a live reference env's vehicle list so both
engines can be stepped from the *identical* initial condition and compared
per policy step (SURVEY.md section 4's golden-trace strategy).  This
sidesteps PRNG draw-order differences at reset: parity is judged on the
deterministic dynamics (controllers, IDM/MOBIL, collisions, rewards).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from highwayenv_tpu.vehicle.state import (
    KIND_EGO,
    KIND_IDM,
    KIND_LANDMARK,
    KIND_OBSTACLE,
    KIND_PLAIN,
    empty_state,
)


def ref_to_vehicle_state(ref_env, tpu_env):
    """Copy the reference road's vehicles+objects into a VehicleState.

    Slot order = reference list order (vehicles then objects), which matches
    the engine's layout convention.
    """
    import highway_env.vehicle.behavior as ref_behavior
    import highway_env.vehicle.controller as ref_controller
    import highway_env.vehicle.objects as ref_objects

    road = ref_env.unwrapped.road
    objs = list(road.vehicles) + list(road.objects)
    V = tpu_env.num_slots
    assert len(objs) <= V, (len(objs), V)

    R = getattr(tpu_env, "route_slots", 1)
    st = empty_state(V, route_slots=R)
    # slot assignment: controlled vehicles go to the env's declared ego
    # slots; everything else fills the remaining slots in list order
    ego_slots = list(tpu_env.ego_slots)
    free_slots = [i for i in range(V) if i not in ego_slots]
    controlled_ids = set(id(v) for v in ref_env.unwrapped.controlled_vehicles)
    slot_of = {}
    for v in objs:
        if id(v) in controlled_ids:
            slot_of[id(v)] = ego_slots.pop(0)
        else:
            slot_of[id(v)] = free_slots.pop(0)
    get = lambda arr: np.asarray(arr).copy()
    pos = get(st.pos)
    heading = get(st.heading)
    speed = get(st.speed)
    lane = get(st.lane)
    target_lane = get(st.target_lane)
    target_speed = get(st.target_speed)
    speed_index = get(st.speed_index)
    timer = get(st.timer)
    delta = get(st.delta)
    accel = get(st.accel)
    steering = get(st.steering)
    crashed = get(st.crashed)
    kind = get(st.kind)
    length = get(st.length)
    width = get(st.width)
    check_collisions = get(st.check_collisions)
    enable_lane_change = get(st.enable_lane_change)

    net = tpu_env.net
    controlled = set(id(v) for v in ref_env.unwrapped.controlled_vehicles)
    route_base = get(st.route_base)
    route_n = get(st.route_n)
    route_id = get(st.route_id)
    route_len = get(st.route_len)

    is_yielding = get(st.is_yielding)
    yield_timer = get(st.yield_timer)
    lateral_speed = get(st.lateral_speed)
    yaw_rate = get(st.yaw_rate)

    for v in objs:
        i = slot_of[id(v)]
        if getattr(v, "is_yielding", False):
            is_yielding[i] = True
            yield_timer[i] = int(v.yield_timer)
        lateral_speed[i] = getattr(v, "lateral_speed", 0.0)
        yaw_rate[i] = getattr(v, "yaw_rate", 0.0)
        route = getattr(v, "route", None)
        if route:
            assert len(route) <= R, (len(route), R)
            for j, (f, t, lid) in enumerate(route):
                route_base[i, j] = net.global_lane_index((f, t, 0))
                route_n[i, j] = len(net.lanes_on_edge(f, t))
                route_id[i, j] = -1 if lid is None else int(lid)
            route_len[i] = len(route)
        pos[i] = v.position
        heading[i] = v.heading
        speed[i] = v.speed
        length[i] = v.LENGTH
        width[i] = v.WIDTH
        crashed[i] = getattr(v, "crashed", False)
        check_collisions[i] = getattr(v, "check_collisions", True)
        if v.lane_index is not None:
            lane[i] = net.global_lane_index(v.lane_index)
        if isinstance(v, ref_objects.Obstacle):
            kind[i] = KIND_OBSTACLE
        elif isinstance(v, ref_objects.Landmark):
            kind[i] = KIND_LANDMARK
        elif isinstance(v, ref_behavior.IDMVehicle):
            kind[i] = KIND_EGO if id(v) in controlled else KIND_IDM
            delta[i] = v.DELTA
            timer[i] = v.timer
            enable_lane_change[i] = v.enable_lane_change
        elif id(v) in controlled:
            # includes plain-Vehicle egos (ContinuousAction envs)
            kind[i] = KIND_EGO
        elif isinstance(v, ref_controller.ControlledVehicle):
            kind[i] = KIND_PLAIN
        else:
            kind[i] = KIND_PLAIN
        if hasattr(v, "target_lane_index") and v.target_lane_index is not None:
            target_lane[i] = net.global_lane_index(v.target_lane_index)
        else:
            target_lane[i] = lane[i]
        target_speed[i] = getattr(v, "target_speed", 0.0) or 0.0
        if hasattr(v, "speed_index"):
            speed_index[i] = int(v.speed_index)
        if isinstance(getattr(v, "action", None), dict):
            accel[i] = float(v.action.get("acceleration", 0.0))
            steering[i] = float(v.action.get("steering", 0.0))

    return st.replace(
        pos=jnp.asarray(pos, jnp.float32),
        heading=jnp.asarray(heading, jnp.float32),
        speed=jnp.asarray(speed, jnp.float32),
        lane=jnp.asarray(lane, jnp.int32),
        target_lane=jnp.asarray(target_lane, jnp.int32),
        target_speed=jnp.asarray(target_speed, jnp.float32),
        speed_index=jnp.asarray(speed_index, jnp.int32),
        timer=jnp.asarray(timer, jnp.float32),
        delta=jnp.asarray(delta, jnp.float32),
        accel=jnp.asarray(accel, jnp.float32),
        steering=jnp.asarray(steering, jnp.float32),
        crashed=jnp.asarray(crashed),
        kind=jnp.asarray(kind, jnp.int32),
        length=jnp.asarray(length, jnp.float32),
        width=jnp.asarray(width, jnp.float32),
        check_collisions=jnp.asarray(check_collisions),
        enable_lane_change=jnp.asarray(enable_lane_change),
        route_base=jnp.asarray(route_base),
        route_n=jnp.asarray(route_n),
        route_id=jnp.asarray(route_id),
        route_len=jnp.asarray(route_len),
        is_yielding=jnp.asarray(is_yielding),
        yield_timer=jnp.asarray(yield_timer),
        lateral_speed=jnp.asarray(lateral_speed, jnp.float32),
        yaw_rate=jnp.asarray(yaw_rate, jnp.float32),
    )


def ref_positions(ref_env):
    road = ref_env.unwrapped.road
    objs = list(road.vehicles) + list(road.objects)
    return np.array([v.position for v in objs])


def ref_speeds(ref_env):
    road = ref_env.unwrapped.road
    objs = list(road.vehicles) + list(road.objects)
    return np.array([v.speed for v in objs])
