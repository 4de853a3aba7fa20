"""Batched IDM longitudinal + MOBIL lane-change NPC policy.

Vectorized re-design of ``IDMVehicle`` (vehicle/behavior.py:12-347), built
around a per-frame **projection table**: (s, lat) of every object on every
lane, computed once per frame (road/lane.py projection_table).  Every
neighbour query — the reference's per-call ``Road.neighbour_vehicles`` linear
scans (road/road.py:483-547) — then becomes a one-hot matmul (MXU) against
the table plus masked argmin/argmax, with zero per-query trigonometry:

  - IDM:   a = a_c [1 - (v/v0)^delta - (d*/d)^2],
           d* = d0 + vT + v dv / (2 sqrt(ab))        (behavior.py:150-217)
  - MOBIL: safety (imposed braking >= -2 m/s^2) + incentive (jerk >= 0.2),
           route-direction override, abort-on-conflict, 1 s timer gating
           seeded (sum(position) pi) mod delay        (behavior.py:219-324)

Known deviation (PARITY.md #1): decisions are evaluated against the
pre-frame state rather than sequentially in list order.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from highwayenv_tpu.road import lane as lane_ops
from highwayenv_tpu.road.lane import VEHICLE_LENGTH, LaneGeometry
from highwayenv_tpu.utils.math import do_every, not_zero
from highwayenv_tpu.vehicle import controller
from highwayenv_tpu.vehicle.state import (
    KIND_IDM,
    KIND_LANDMARK,
    KIND_LINEAR,
    VehicleState,
)


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


class Neighbours(NamedTuple):
    front_idx: jnp.ndarray  # (...,V) i32
    front_ex: jnp.ndarray  # (...,V) bool
    rear_idx: jnp.ndarray  # (...,V) i32
    rear_ex: jnp.ndarray  # (...,V) bool
    s_self: jnp.ndarray  # (...,V) s of i on its query lane


def _self_idx(state: VehicleState) -> jnp.ndarray:
    V = state.num_slots
    return jnp.broadcast_to(jnp.arange(V, dtype=jnp.int32), state.kind.shape)


def neighbours_connected(
    geo: LaneGeometry,
    state: VehicleState,
    query_lane: jnp.ndarray,
    table_s: jnp.ndarray,
    table_lat: jnp.ndarray,
) -> Neighbours:
    """Connected-lane front/rear search (road/road.py:483-547, the
    ``neighbour_vehicles_connected_lanes`` mode).

    Each object is assigned to the FIRST candidate lane (query lane, then
    successor lanes, then predecessor lanes) it is on (margin 1 m); its
    longitudinal coordinate is shifted into the query lane's frame by the
    precompiled offset.  Ties: the front neighbour keeps the *last* matching
    object (reference uses <=), the rear keeps the first (strict >).
    """
    V = state.num_slots
    q = lane_ops._gather(geo, query_lane)
    s_self = lane_ops.row_lookup(table_s, query_lane)

    cand = geo.conn_lanes[q]  # (V, K)
    offs = geo.conn_offsets[q]  # (V, K)
    K = cand.shape[-1]
    L = geo.num_lanes
    cl = jnp.clip(cand, 0, L - 1)

    # per (i, k, j) = table[cand[i, k], j]: one-hot contraction over lanes
    oh = jax.nn.one_hot(cl, L, dtype=table_s.dtype)  # (...,V,K,L)
    s_jk = jnp.einsum("...ikl,...lj->...ikj", oh, table_s, precision="highest")  # (V,K,V)
    lat_jk = jnp.einsum("...ikl,...lj->...ikj", oh, table_lat, precision="highest")
    width_k = geo.width[cl][..., :, :, None]
    len_k = geo.length[cl][..., :, :, None]
    on = (
        (jnp.abs(lat_jk) <= width_k / 2 + 1.0)
        & (-VEHICLE_LENGTH <= s_jk)
        & (s_jk < len_k + VEHICLE_LENGTH)
        & (cand[..., :, :, None] >= 0)
    )  # (V,K,V)
    first_k = jnp.argmax(on, axis=-2)  # (V,V)
    matched = jnp.any(on, axis=-2)
    oh_first = jax.nn.one_hot(first_k, K, dtype=s_jk.dtype)  # (V,V,K)
    s_assigned = jnp.einsum("...ikj,...ijk->...ij", s_jk, oh_first, precision="highest")
    s_assigned = s_assigned + jnp.einsum(
        "...ik,...ijk->...ij", offs, oh_first
    , precision="highest")

    eye = jnp.eye(V, dtype=bool)
    elig = (
        matched
        & ~eye
        & state.active[..., None, :]
        & (state.kind != KIND_LANDMARK)[..., None, :]
    )

    j_idx = jnp.arange(V)
    # front: s_self <= s_v, min; the reference's <= keeps the LAST tied object
    f_ok = elig & (s_self[..., :, None] <= s_assigned)
    f_key = jnp.where(f_ok, s_assigned, jnp.inf)
    f_min = jnp.min(f_key, axis=-1)
    front_idx = jnp.argmax(
        jnp.where(f_ok & (f_key == f_min[..., None]), j_idx, -1), axis=-1
    ).astype(jnp.int32)
    front_ex = jnp.isfinite(f_min)

    # rear: s_v < s_self, max; strict > keeps the FIRST tied object
    r_ok = elig & (s_assigned < s_self[..., :, None])
    r_key = jnp.where(r_ok, s_assigned, -jnp.inf)
    r_max = jnp.max(r_key, axis=-1)
    rear_idx = jnp.argmax(r_ok & (r_key == r_max[..., None]), axis=-1).astype(
        jnp.int32
    )
    rear_ex = jnp.isfinite(r_max) & jnp.any(r_ok, axis=-1)

    return Neighbours(front_idx, front_ex, rear_idx, rear_ex, s_self)


def _eligible_on_lane(geo: LaneGeometry, state: VehicleState, table_s, table_lat):
    """(L, V) mask: object j counts as occupying lane l (margin 1 m),
    matching Road.neighbour_vehicles' on-lane filter (road/road.py:531-538)."""
    L = geo.num_lanes
    lanes = jnp.arange(L, dtype=jnp.int32)
    width = geo.width[lanes][..., :, None]
    length = geo.length[lanes][..., :, None]
    on = (
        (jnp.abs(table_lat) <= width / 2 + 1.0)
        & (-VEHICLE_LENGTH <= table_s)
        & (table_s < length + VEHICLE_LENGTH)
    )
    return (
        on
        & state.active[..., None, :]
        & (state.kind != KIND_LANDMARK)[..., None, :]
    )


def neighbours(
    geo: LaneGeometry,
    state: VehicleState,
    query_lane: jnp.ndarray,
    table_s: jnp.ndarray,
    table_lat: jnp.ndarray | None = None,
    elig: jnp.ndarray | None = None,
) -> Neighbours:
    """Front/rear object of each vehicle projected on its query lane.

    Dense (V, V) formulation: one one-hot matmul projects every object onto
    every query lane (MXU), then masked min/max pick the neighbours.  On TPU
    this beats the sorted-index binary search by a wide margin — gathers
    break fusion and made the frame HBM-bound.  Ties follow the reference's
    scan (road.py:539-545): the front neighbour keeps the LAST equally
    -distant object (its ``<=`` overwrites), the rear keeps the first
    (strict ``>``) — PARITY #3, resolved round 4.
    """
    V = state.num_slots
    s_self = lane_ops.row_lookup(table_s, query_lane)
    if elig is None:
        assert table_lat is not None
        elig = _eligible_on_lane(geo, state, table_s, table_lat)

    s_pairs = lane_ops.pair_project(table_s, query_lane)  # (V,V)
    e_pairs = (
        lane_ops.pair_project(elig.astype(table_s.dtype), query_lane) > 0.5
    )
    eye = jnp.eye(V, dtype=bool)
    ok = e_pairs & ~eye

    j_idx = jnp.arange(V)
    front_ok = ok & (s_self[..., :, None] <= s_pairs)
    f_key = jnp.where(front_ok, s_pairs, jnp.inf)
    f_min = jnp.min(f_key, axis=-1)
    front_idx = jnp.max(
        jnp.where(front_ok & (f_key == f_min[..., None]), j_idx, -1), axis=-1
    ).astype(jnp.int32)
    front_idx = jnp.maximum(front_idx, 0)
    front_ex = jnp.isfinite(f_min)

    rear_ok = ok & (s_pairs < s_self[..., :, None])
    r_key = jnp.where(rear_ok, s_pairs, -jnp.inf)
    r_max = jnp.max(r_key, axis=-1)
    rear_idx = jnp.argmax(
        rear_ok & (r_key == r_max[..., None]), axis=-1
    ).astype(jnp.int32)
    rear_ex = jnp.any(rear_ok, axis=-1)

    return Neighbours(front_idx, front_ex, rear_idx, rear_ex, s_self)


# --------------------------------------------------------------------------- #
# IDM acceleration
# --------------------------------------------------------------------------- #


def _accel_pair(
    geo: LaneGeometry,
    p: IDMParams,
    state: VehicleState,
    table_s: jnp.ndarray,
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

    All index lookups are one-hot contractions (one stacked matmul per index
    array) rather than gathers — gathers break XLA fusion on TPU.
    """
    V = state.num_slots
    dt_ = table_s.dtype

    def fetch(idx, fields):
        """Row fetch as a mask+sum select (VPU-exact, fuses; the MXU
        one-hot matmul costs a 6-pass f32 contraction at precision=highest
        and breaks fusion at these tiny sizes).
        idx (...,K), fields (...,V,F) -> (...,K,F)."""
        oh = idx[..., :, None] == jnp.arange(V, dtype=idx.dtype)  # (...,K,V)
        return jnp.sum(
            jnp.where(oh[..., None], fields[..., None, :, :], 0.0), axis=-2
        )

    ego_fields = jnp.stack(
        [
            state.speed,
            state.target_speed,
            state.lane.astype(dt_),
            jnp.cos(state.heading),
            jnp.sin(state.heading),
            state.is_vehicle.astype(dt_),
        ],
        axis=-1,
    )  # (...,V,6)
    eg = fetch(ego_idx, ego_fields)
    ego_speed, ego_ts = eg[..., 0], eg[..., 1]
    ego_lane = jnp.round(eg[..., 2]).astype(jnp.int32)
    ego_dir_x, ego_dir_y = eg[..., 3], eg[..., 4]
    ego_is_vehicle = eg[..., 5] > 0.5

    front_fields = jnp.stack(
        [
            state.speed * jnp.cos(state.heading),
            state.speed * jnp.sin(state.heading),
            state.speed,
        ],
        axis=-1,
    )
    fr = fetch(front_idx, front_fields)
    front_vx, front_vy = fr[..., 0], fr[..., 1]
    front_speed = fr[..., 2]

    ego_ts_raw = ego_ts
    limit = geo.speed_limit[ego_lane]
    ego_ts = jnp.where(jnp.isinf(limit), ego_ts, jnp.clip(ego_ts, 0.0, limit))

    free = p.comfort_acc_max * (
        1.0
        - jnp.power(
            jnp.maximum(ego_speed, 0.0) / jnp.abs(not_zero(ego_ts)),
            delta_decider,
        )
    )

    # gap on the ego's current lane (objects.py:183-198), via the table
    s_e = lane_ops.table_lookup(table_s, ego_idx, ego_lane)
    s_f = lane_ops.table_lookup(table_s, front_idx, ego_lane)
    d = s_f - s_e

    # desired gap (behavior.py:192-217), projected relative speed
    dvx = ego_speed * ego_dir_x - front_vx
    dvy = ego_speed * ego_dir_y - front_vy
    dv = dvx * ego_dir_x + dvy * ego_dir_y

    ab = -p.comfort_acc_max * p.comfort_acc_min
    d_star = (
        p.distance_wanted
        + ego_speed * p.time_wanted
        + ego_speed * dv / (2 * jnp.sqrt(ab))
    )
    interaction = p.comfort_acc_max * jnp.square(d_star / not_zero(d))

    acc = free - jnp.where(front_exists, interaction, 0.0)

    # LinearVehicle deciders use the linear model instead
    # (vehicle/behavior.py:417-466): theta . [vt, dv, dp] with raw speeds
    # and TIME_WANTED = 2.5
    vt = ego_ts_raw - ego_speed
    d_safe = p.distance_wanted + jnp.maximum(ego_speed, 0.0) * 2.5
    dv_raw = jnp.minimum(front_speed - ego_speed, 0.0)
    dp = jnp.minimum(d - d_safe, 0.0)
    th = state.accel_params  # decider's own parameters (row-aligned)
    acc_lin = (
        th[..., 0] * vt
        + th[..., 1] * jnp.where(front_exists, dv_raw, 0.0)
        + th[..., 2] * jnp.where(front_exists, dp, 0.0)
    )
    acc = jnp.where(state.kind == KIND_LINEAR, acc_lin, acc)

    return jnp.where(ego_exists & ego_is_vehicle, acc, 0.0)


# --------------------------------------------------------------------------- #
# MOBIL
# --------------------------------------------------------------------------- #


def _query_neighbours(
    geo, state, query_lane, table_s, table_lat, elig, connected: bool
) -> Neighbours:
    if connected:
        return neighbours_connected(geo, state, query_lane, table_s, table_lat)
    return neighbours(
        geo, state, query_lane, table_s, table_lat=table_lat, elig=elig
    )


def _mobil(
    geo: LaneGeometry,
    p: IDMParams,
    state: VehicleState,
    cand_lane: jnp.ndarray,
    neigh_cur: Neighbours,
    table_s: jnp.ndarray,
    table_lat: jnp.ndarray,
    elig: jnp.ndarray,
    connected: bool,
):
    """Vectorized IDMVehicle.mobil (behavior.py:265-324). Returns (V,) bool."""
    self_idx = _self_idx(state)
    n_new = _query_neighbours(
        geo, state, cand_lane, table_s, table_lat, elig, connected
    )
    np_idx, np_ex = n_new.front_idx, n_new.front_ex
    nf_idx, nf_ex = n_new.rear_idx, n_new.rear_ex
    op_idx, op_ex = neigh_cur.front_idx, neigh_cur.front_ex
    of_idx, of_ex = neigh_cur.rear_idx, neigh_cur.rear_ex
    true_mask = jnp.ones_like(np_ex)

    delta_i = state.delta

    def acc(ego_idx, ego_ex, front_idx, front_ex):
        return _accel_pair(
            geo, p, state, table_s, delta_i, ego_idx, ego_ex, front_idx, front_ex
        )

    a_nf = acc(nf_idx, nf_ex, np_idx, np_ex)
    a_nf_pred = acc(nf_idx, nf_ex, self_idx, true_mask)
    safe = a_nf_pred >= -state.mobil_max_braking

    a_self_pred = acc(self_idx, true_mask, np_idx, np_ex)

    # route-directed branch (behavior.py:287-298)
    R = state.route_base.shape[-1]
    ptr = jnp.clip(state.route_ptr, 0, R - 1)
    head_id = lane_ops.onehot_take(state.route_id, ptr)
    has_route_id = (state.route_ptr < state.route_len) & (head_id >= 0)

    tgt_id = geo.lane_id[lane_ops._gather(geo, state.target_lane)]
    cand_id = geo.lane_id[lane_ops._gather(geo, cand_lane)]
    sign_ok = jnp.sign(cand_id - tgt_id) == jnp.sign(head_id - tgt_id)
    route_ok = sign_ok & (a_self_pred >= -state.mobil_max_braking)

    # incentive branch (behavior.py:300-321)
    a_self = acc(self_idx, true_mask, op_idx, op_ex)
    a_of = acc(of_idx, of_ex, self_idx, true_mask)
    a_of_pred = acc(of_idx, of_ex, op_idx, op_ex)
    jerk = (
        a_self_pred - a_self + p.politeness * (a_nf_pred - a_nf + a_of_pred - a_of)
    )
    # per-vehicle threshold: 0.2 for IDM, 1.0 for Aggressive/Defensive
    # (behavior.py:45, 563-583)
    jerk_ok = jerk >= state.mobil_gain

    return safe & jnp.where(has_route_id, route_ok, jerk_ok)


def change_lane_policy(
    geo: LaneGeometry,
    p: IDMParams,
    state: VehicleState,
    table_s: jnp.ndarray,
    table_lat: jnp.ndarray,
    elig: jnp.ndarray,
    connected: bool = False,
):
    """Vectorized IDMVehicle.change_lane_policy (behavior.py:219-263).

    Updates target_lane and the MOBIL timer for IDM vehicles.
    """
    idm = (
        (state.kind == KIND_IDM) | (state.kind == KIND_LINEAR)
    ) & ~state.crashed
    self_idx = _self_idx(state)

    li = lane_ops._gather(geo, state.lane)
    tli = lane_ops._gather(geo, state.target_lane)
    mid_change = state.lane != state.target_lane
    same_road = geo.edge_base[li] == geo.edge_base[tli]

    neigh_cur = _query_neighbours(
        geo, state, state.lane, table_s, table_lat, elig, connected
    )

    # ---- abort-on-conflict while mid-change (behavior.py:229-243) -------- #
    # another controlled vehicle (not on our target lane) targets our target
    # lane at an unsafe gap ahead of us, measured on our current lane.
    # (the one remaining O(V^2) interaction in the decision pass; a single
    # one-hot matmul + fused mask chain)
    s_pairs = lane_ops.pair_project(table_s, state.lane)
    d_ij = s_pairs - neigh_cur.s_self[..., :, None]
    dvx = state.velocity[..., 0]
    dvy = state.velocity[..., 1]
    dirx = state.direction[..., 0]
    diry = state.direction[..., 1]
    dv_ij = (dvx[..., :, None] - dvx[..., None, :]) * dirx[..., :, None] + (
        dvy[..., :, None] - dvy[..., None, :]
    ) * diry[..., :, None]
    ab = -p.comfort_acc_max * p.comfort_acc_min
    d_star_ij = (
        p.distance_wanted
        + state.speed[..., :, None] * p.time_wanted
        + state.speed[..., :, None] * dv_ij / (2 * jnp.sqrt(ab))
    )
    V = state.num_slots
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

    target = state.target_lane
    for delta_id in (-1, 1):  # side_lanes order: left then right (road.py:200-211)
        cand_id = lane_id + delta_id
        exists = (cand_id >= 0) & (cand_id < edge_n)
        cand = jnp.clip(edge_base + cand_id, 0, geo.num_lanes - 1)
        # is_reachable_from via the table (road/lane.py:104-118)
        s_c = lane_ops.row_lookup(table_s, cand)
        lat_c = lane_ops.row_lookup(table_lat, cand)
        cli = lane_ops._gather(geo, cand)
        reachable = (
            (jnp.abs(lat_c) <= 2 * geo.width[cli])
            & (0 <= s_c)
            & (s_c < geo.length[cli] + VEHICLE_LENGTH)
            & ~geo.forbidden[cli]
        )
        ok = (
            deciding
            & exists
            & reachable
            & moving
            & _mobil(
                geo, p, state, cand, neigh_cur, table_s, table_lat, elig,
                connected,
            )
        )
        target = jnp.where(ok, cand, target)

    target = jnp.where(abort, state.lane, target)
    return state.replace(target_lane=target, timer=new_timer), neigh_cur


def idm_act(
    geo: LaneGeometry,
    p: IDMParams,
    state: VehicleState,
    table_s: jnp.ndarray,
    table_lat: jnp.ndarray,
    connected: bool = False,
):
    """Full IDM/MOBIL decision pass (IDMVehicle.act, behavior.py:93-137).

    Returns the state with updated target lanes/timers plus the computed
    (steering, accel) for IDM vehicles (callers mask them in).
    """
    elig = _eligible_on_lane(geo, state, table_s, table_lat)
    state, neigh_cur = change_lane_policy(
        geo, p, state, table_s, table_lat, elig, connected
    )
    steering, accel = _idm_controls(
        geo, p, state, table_s, table_lat, elig, neigh_cur, connected
    )
    return state, steering, accel


def idm_act_sequential(
    geo: LaneGeometry,
    p: IDMParams,
    state: VehicleState,
    table_s: jnp.ndarray,
    table_lat: jnp.ndarray,
    max_edge_lanes: int,
    connected: bool = False,
):
    """Reference act()-list-order decision pass (road/road.py:464-467).

    ``lax.scan`` over slots in original index order: each vehicle first
    advances its target lane at lane ends (follow_road, the reference calls
    it at the top of every act, behavior.py:106 / controller.py:98), then
    runs change_lane_policy reading the *current* target-lane array — so
    the abort-on-conflict check (behavior.py:229-243) observes same-frame
    target-lane writes of earlier-indexed vehicles, exactly like the
    reference's sequential vehicle loop.  Steering/accel read only
    positions/speeds and the vehicle's own final target, so they stay
    vectorized after the scan (order-independent by construction).

    Opt-in via ``config["sequential_decisions"]`` — this is the parity
    path (V sequential O(V^2) evaluations per frame); the production path
    evaluates decisions on pre-frame state (PARITY.md #1).
    """
    elig = _eligible_on_lane(geo, state, table_s, table_lat)
    V = state.num_slots
    idx = jnp.arange(V)

    def body(st, i):
        sel = idx == i
        fr = controller.follow_road(geo, st, max_edge_lanes, table_s)
        st = st.replace(
            target_lane=jnp.where(sel, fr.target_lane, st.target_lane),
            route_ptr=jnp.where(sel, fr.route_ptr, st.route_ptr),
        )
        dec, _ = change_lane_policy(
            geo, p, st, table_s, table_lat, elig, connected
        )
        st = st.replace(
            target_lane=jnp.where(sel, dec.target_lane, st.target_lane),
            timer=jnp.where(sel, dec.timer, st.timer),
        )
        return st, None

    state, _ = jax.lax.scan(body, state, idx)
    neigh_cur = _query_neighbours(
        geo, state, state.lane, table_s, table_lat, elig, connected
    )
    steering, accel = _idm_controls(
        geo, p, state, table_s, table_lat, elig, neigh_cur, connected
    )
    return state, steering, accel


def _idm_controls(
    geo: LaneGeometry,
    p: IDMParams,
    state: VehicleState,
    table_s: jnp.ndarray,
    table_lat: jnp.ndarray,
    elig: jnp.ndarray,
    neigh_cur: Neighbours,
    connected: bool,
):
    """Steering + acceleration for the (post-decision) state: P-cascade /
    LinearVehicle lateral law, IDM with dual-lane minimum while mid-change
    (IDMVehicle.act tail, behavior.py:108-137)."""
    steering = controller.steering_control_from_table(
        geo, state.target_lane, state, table_s, table_lat
    )
    # LinearVehicle lateral controller (behavior.py:467-502): linear in the
    # steering parameters, no slip-angle inversion
    V = state.num_slots
    self_i = _self_idx(state)
    s_t = lane_ops.row_lookup(table_s, state.target_lane)
    lat_t = lane_ops.row_lookup(table_lat, state.target_lane)
    future_heading = lane_ops.heading_at(
        geo, state.target_lane, s_t + state.speed * controller.TAU_PURSUIT
    )
    from highwayenv_tpu.utils.math import not_zero as _nz
    from highwayenv_tpu.utils.math import wrap_to_pi as _wrap

    feat_h = (
        _wrap(future_heading - state.heading) * state.length / _nz(state.speed)
    )
    feat_lat = -lat_t * state.length / (_nz(state.speed) ** 2)
    steer_lin = (
        state.steer_params[..., 0] * feat_h + state.steer_params[..., 1] * feat_lat
    )
    steering = jnp.where(state.kind == KIND_LINEAR, steer_lin, steering)
    steering = jnp.clip(
        steering, -controller.MAX_STEERING_ANGLE, controller.MAX_STEERING_ANGLE
    )

    self_idx = _self_idx(state)
    true_mask = jnp.ones_like(state.crashed)

    accel = _accel_pair(
        geo, p, state, table_s, state.delta, self_idx, true_mask,
        neigh_cur.front_idx, neigh_cur.front_ex,
    )

    # dual-lane IDM while mid-change (behavior.py:121-131)
    mid = state.lane != state.target_lane
    n_t = _query_neighbours(
        geo, state, state.target_lane, table_s, table_lat, elig, connected
    )
    accel_t = _accel_pair(
        geo, p, state, table_s, state.delta, self_idx, true_mask,
        n_t.front_idx, n_t.front_ex,
    )
    accel = jnp.where(mid, jnp.minimum(accel, accel_t), accel)
    accel = jnp.clip(accel, -p.acc_max, p.acc_max)

    return steering, accel
