"""Batched IDM longitudinal + MOBIL lane-change NPC policy.

Vectorized re-design of ``IDMVehicle`` (vehicle/behavior.py:12-347):

  - the per-call ``Road.neighbour_vehicles`` linear scans (road/road.py:483-547)
    become one masked (V, V) projection of every object onto every query lane,
    with front/rear selected by masked argmin/argmax;
  - IDM:   a = a_c [1 - (v/v0)^delta - (d*/d)^2],
           d* = d0 + vT + v dv / (2 sqrt(ab))        (behavior.py:150-217)
  - MOBIL: safety (imposed braking >= -2 m/s^2) + incentive (jerk >= 0.2),
           route-direction override, abort-on-conflict, 1 s timer gating
           seeded (sum(position) pi) mod delay        (behavior.py:219-324)

Known deviation from the reference (documented in PARITY.md): the reference
applies vehicle decisions sequentially in list order inside ``Road.act``, so a
vehicle's MOBIL pass can observe target-lane updates made by earlier vehicles
in the same frame; this kernel evaluates all vehicles against the pre-frame
state (one-frame-stale conflict information).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from highwayenv_tpu.road import lane as lane_ops
from highwayenv_tpu.road.lane import LaneGeometry
from highwayenv_tpu.utils.math import do_every, not_zero
from highwayenv_tpu.vehicle import controller
from highwayenv_tpu.vehicle.state import KIND_IDM, KIND_LANDMARK, VehicleState


@dataclasses.dataclass(frozen=True)
class IDMParams:
    """IDMVehicle class constants (vehicle/behavior.py:20-46)."""

    acc_max: float = 6.0
    comfort_acc_max: float = 3.0
    comfort_acc_min: float = -5.0
    distance_wanted: float = 5.0 + 5.0  # 5.0 + ControlledVehicle.LENGTH
    time_wanted: float = 1.5
    delta: float = 4.0
    politeness: float = 0.0
    lane_change_min_acc_gain: float = 0.2
    lane_change_max_braking_imposed: float = 2.0
    lane_change_delay: float = 1.0


# --------------------------------------------------------------------------- #
# neighbour search
# --------------------------------------------------------------------------- #


def neighbours(
    geo: LaneGeometry, state: VehicleState, query_lane: jnp.ndarray
):
    """Front/rear object of each vehicle projected on its query lane.

    Equivalent to Road.neighbour_vehicles (road/road.py:483-547, base mode):
    objects within on_lane(margin=1) of the query lane, split by longitudinal
    coordinate relative to the querying vehicle.

    Returns (front_idx, front_exists, rear_idx, rear_exists), all (V,).
    """
    V = state.num_slots
    s_self, _ = lane_ops.local_coordinates(geo, query_lane, state.pos)

    # project every object j on every row's query lane: (V, V)
    s, lat = lane_ops.local_coordinates(
        geo, query_lane[..., :, None], state.pos[..., None, :, :]
    )
    on = lane_ops.on_lane(geo, query_lane[..., :, None], s, lat, margin=1.0)
    eye = jnp.eye(V, dtype=bool)
    cand = (
        on
        & state.active[..., None, :]
        & (state.kind != KIND_LANDMARK)[..., None, :]
        & ~eye
    )

    front_ok = cand & (s >= s_self[..., :, None])
    rear_ok = cand & (s < s_self[..., :, None])

    s_front = jnp.where(front_ok, s, jnp.inf)
    front_idx = jnp.argmin(s_front, axis=-1).astype(jnp.int32)
    front_exists = jnp.any(front_ok, axis=-1)

    s_rear = jnp.where(rear_ok, s, -jnp.inf)
    rear_idx = jnp.argmax(s_rear, axis=-1).astype(jnp.int32)
    rear_exists = jnp.any(rear_ok, axis=-1)

    return front_idx, front_exists, rear_idx, rear_exists


# --------------------------------------------------------------------------- #
# IDM acceleration
# --------------------------------------------------------------------------- #


def _accel_pair(
    geo: LaneGeometry,
    p: IDMParams,
    state: VehicleState,
    delta_decider: jnp.ndarray,
    ego_idx: jnp.ndarray,
    ego_exists: jnp.ndarray,
    front_idx: jnp.ndarray,
    front_exists: jnp.ndarray,
):
    """IDM acceleration of vehicle ``ego_idx`` with ``front_idx`` as leader.

    Vectorized IDMVehicle.acceleration (behavior.py:150-190): uses the
    *decider's* delta exponent, the ego's target speed clipped by its current
    lane's speed limit, and the gap measured on the ego's current lane.
    Returns 0 where the ego is absent or not a Vehicle (behavior.py:170-171).
    """

    def take(x, i):
        return jnp.take_along_axis(x, i, axis=-1)

    ego_speed = take(state.speed, ego_idx)
    ego_ts = take(state.target_speed, ego_idx)
    ego_lane = take(state.lane, ego_idx)
    limit = geo.speed_limit[lane_ops._gather(geo, ego_lane)]
    ego_ts = jnp.where(jnp.isinf(limit), ego_ts, jnp.clip(ego_ts, 0.0, limit))

    free = p.comfort_acc_max * (
        1.0
        - jnp.power(
            jnp.maximum(ego_speed, 0.0) / jnp.abs(not_zero(ego_ts)),
            delta_decider,
        )
    )

    # gap on the ego's current lane (objects.py:183-198)
    ego_pos = jnp.take_along_axis(state.pos, ego_idx[..., None], axis=-2)
    front_pos = jnp.take_along_axis(state.pos, front_idx[..., None], axis=-2)
    s_e, _ = lane_ops.local_coordinates(geo, ego_lane, ego_pos)
    s_f, _ = lane_ops.local_coordinates(geo, ego_lane, front_pos)
    d = s_f - s_e

    # desired gap (behavior.py:192-217), projected relative speed
    ego_head = take(state.heading, ego_idx)
    ego_dir = jnp.stack([jnp.cos(ego_head), jnp.sin(ego_head)], axis=-1)
    front_head = take(state.heading, front_idx)
    front_speed = take(state.speed, front_idx)
    front_vel = front_speed[..., None] * jnp.stack(
        [jnp.cos(front_head), jnp.sin(front_head)], axis=-1
    )
    ego_vel = ego_speed[..., None] * ego_dir
    dv = jnp.einsum("...d,...d->...", ego_vel - front_vel, ego_dir)

    ab = -p.comfort_acc_max * p.comfort_acc_min
    d_star = (
        p.distance_wanted
        + ego_speed * p.time_wanted
        + ego_speed * dv / (2 * jnp.sqrt(ab))
    )
    interaction = p.comfort_acc_max * jnp.square(d_star / not_zero(d))

    acc = free - jnp.where(front_exists, interaction, 0.0)
    ego_is_vehicle = take(state.is_vehicle, ego_idx)
    return jnp.where(ego_exists & ego_is_vehicle, acc, 0.0)


# --------------------------------------------------------------------------- #
# MOBIL
# --------------------------------------------------------------------------- #


def _mobil(
    geo: LaneGeometry,
    p: IDMParams,
    state: VehicleState,
    cand_lane: jnp.ndarray,
    neigh_cur,
    self_idx: jnp.ndarray,
):
    """Vectorized IDMVehicle.mobil (behavior.py:265-324). Returns (V,) bool."""
    op_idx, op_ex, of_idx, of_ex = neigh_cur
    np_idx, np_ex, nf_idx, nf_ex = neighbours(geo, state, cand_lane)
    true_mask = jnp.ones_like(np_ex)

    delta_i = state.delta

    a_nf = _accel_pair(geo, p, state, delta_i, nf_idx, nf_ex, np_idx, np_ex)
    a_nf_pred = _accel_pair(geo, p, state, delta_i, nf_idx, nf_ex, self_idx, true_mask)
    safe = a_nf_pred >= -p.lane_change_max_braking_imposed

    a_self_pred = _accel_pair(
        geo, p, state, delta_i, self_idx, true_mask, np_idx, np_ex
    )

    # route-directed branch (behavior.py:287-298)
    R = state.route_base.shape[-1]
    ptr = jnp.clip(state.route_ptr, 0, R - 1)
    head_id = jnp.take_along_axis(state.route_id, ptr[..., None], axis=-1)[..., 0]
    has_route_id = (state.route_ptr < state.route_len) & (head_id >= 0)
    head_base = jnp.take_along_axis(state.route_base, ptr[..., None], axis=-1)[..., 0]
    route_abs_id = head_base + head_id  # not used for sign test; ids are local
    del route_abs_id

    tgt_li = lane_ops._gather(geo, state.target_lane)
    tgt_id = geo.lane_id[tgt_li]
    cand_id = geo.lane_id[lane_ops._gather(geo, cand_lane)]
    sign_ok = jnp.sign(cand_id - tgt_id) == jnp.sign(head_id - tgt_id)
    route_ok = sign_ok & (a_self_pred >= -p.lane_change_max_braking_imposed)

    # incentive branch (behavior.py:300-321)
    a_self = _accel_pair(geo, p, state, delta_i, self_idx, true_mask, op_idx, op_ex)
    a_of = _accel_pair(geo, p, state, delta_i, of_idx, of_ex, self_idx, true_mask)
    a_of_pred = _accel_pair(geo, p, state, delta_i, of_idx, of_ex, op_idx, op_ex)
    jerk = (
        a_self_pred
        - a_self
        + p.politeness * (a_nf_pred - a_nf + a_of_pred - a_of)
    )
    jerk_ok = jerk >= p.lane_change_min_acc_gain

    return safe & jnp.where(has_route_id, route_ok, jerk_ok)


def change_lane_policy(
    geo: LaneGeometry, p: IDMParams, state: VehicleState
) -> VehicleState:
    """Vectorized IDMVehicle.change_lane_policy (behavior.py:219-263).

    Updates target_lane and the MOBIL timer for IDM vehicles.
    """
    V = state.num_slots
    idm = (state.kind == KIND_IDM) & ~state.crashed
    self_idx = jnp.broadcast_to(
        jnp.arange(V, dtype=jnp.int32), state.kind.shape
    )

    li = lane_ops._gather(geo, state.lane)
    tli = lane_ops._gather(geo, state.target_lane)
    mid_change = state.lane != state.target_lane
    same_road = geo.edge_base[li] == geo.edge_base[tli]

    # ---- abort-on-conflict while mid-change (behavior.py:229-243) -------- #
    # another controlled vehicle (not on our target lane) targets our target
    # lane at an unsafe gap ahead of us, measured on our current lane.
    s_pairs, _ = lane_ops.local_coordinates(
        geo, state.lane[..., :, None], state.pos[..., None, :, :]
    )  # s of j on lane_i
    s_self = jnp.take_along_axis(
        s_pairs, self_idx[..., :, None], axis=-1
    )[..., 0]
    d_ij = s_pairs - s_self[..., :, None]

    dv_ij = jnp.einsum(
        "...ijd,...id->...ij",
        state.velocity[..., :, None, :] - state.velocity[..., None, :, :],
        state.direction,
    )
    ab = -p.comfort_acc_max * p.comfort_acc_min
    d_star_ij = (
        p.distance_wanted
        + state.speed[..., :, None] * p.time_wanted
        + state.speed[..., :, None] * dv_ij / (2 * jnp.sqrt(ab))
    )
    eye = jnp.eye(V, dtype=bool)
    conflict = (
        ~eye
        & state.is_controlled[..., None, :]
        & (state.lane[..., None, :] != state.target_lane[..., :, None])
        & (state.target_lane[..., None, :] == state.target_lane[..., :, None])
        & (0.0 < d_ij)
        & (d_ij < d_star_ij)
    )
    abort = idm & mid_change & same_road & jnp.any(conflict, axis=-1)

    # ---- timer-gated side-lane decision (behavior.py:246-263) ------------ #
    tick = do_every(p.lane_change_delay, state.timer)
    deciding = idm & ~mid_change & tick & state.enable_lane_change
    new_timer = jnp.where(deciding, 0.0, state.timer)

    lane_id = geo.lane_id[li]
    edge_base = geo.edge_base[li]
    edge_n = geo.edge_n[li]
    moving = jnp.abs(state.speed) >= 1.0

    neigh_cur = neighbours(geo, state, state.lane)

    target = state.target_lane
    for delta_id in (-1, 1):  # side_lanes order: left then right (road.py:200-211)
        cand_id = lane_id + delta_id
        exists = (cand_id >= 0) & (cand_id < edge_n)
        cand = jnp.clip(edge_base + cand_id, 0, geo.num_lanes - 1)
        ok = (
            deciding
            & exists
            & lane_ops.is_reachable_from(geo, cand, state.pos)
            & moving
            & _mobil(geo, p, state, cand, neigh_cur, self_idx)
        )
        target = jnp.where(ok, cand, target)

    target = jnp.where(abort, state.lane, target)
    return state.replace(target_lane=target, timer=new_timer), neigh_cur


def idm_act(
    geo: LaneGeometry, p: IDMParams, state: VehicleState
) -> tuple[VehicleState, jnp.ndarray, jnp.ndarray]:
    """Full IDM/MOBIL decision pass (IDMVehicle.act, behavior.py:93-137).

    Returns the state with updated target lanes/timers plus the computed
    (steering, accel) for IDM vehicles (callers mask them in).
    """
    state, neigh_cur = change_lane_policy(geo, p, state)

    steering = controller.steering_control(
        geo, state.target_lane, state.pos, state.heading, state.speed, state.length
    )
    steering = jnp.clip(steering, -controller.MAX_STEERING_ANGLE, controller.MAX_STEERING_ANGLE)

    V = state.num_slots
    self_idx = jnp.broadcast_to(jnp.arange(V, dtype=jnp.int32), state.kind.shape)
    true_mask = jnp.ones_like(state.crashed)

    f_idx, f_ex, _r_idx, _r_ex = neigh_cur
    accel = _accel_pair(geo, p, state, state.delta, self_idx, true_mask, f_idx, f_ex)

    # dual-lane IDM while mid-change (behavior.py:121-131)
    mid = state.lane != state.target_lane
    tf_idx, tf_ex, _tr_idx, _tr_ex = neighbours(geo, state, state.target_lane)
    accel_t = _accel_pair(
        geo, p, state, state.delta, self_idx, true_mask, tf_idx, tf_ex
    )
    accel = jnp.where(mid, jnp.minimum(accel, accel_t), accel)
    accel = jnp.clip(accel, -p.acc_max, p.acc_max)

    return state, steering, accel
