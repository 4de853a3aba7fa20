"""Fast frame kernel for straight parallel-lane networks (highway family).

On a network whose lanes are all straight, parallel, co-linear in arc length
and successor-free (highway-v0/-fast: one edge of N parallel lanes), the
general engine's (L, V) projection tables collapse:

    s_j       = (p_j - origin) . u          (lane-independent!)
    lat_j(l)  = (p_j - origin) . n - off_l
    closest l = argmin_l |lat_j - off_l|    (L-vector, closed form)
    heading_at = theta                      (constant)

so the whole decision/integration frame runs on (V,) vectors and (V, V)
pair matrices with zero trigonometry and no lane tables.  Semantics are
identical to envs/base.py::_frame (validated by tests/test_straight_fast.py
which cross-checks against the general path step-for-step).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from highwayenv_tpu.ops import collision
from highwayenv_tpu.utils.math import do_every, not_zero, wrap_to_pi
from highwayenv_tpu.vehicle import controller
from highwayenv_tpu.vehicle.behavior import IDMParams
from highwayenv_tpu.vehicle.state import (
    KIND_EGO,
    KIND_IDM,
    KIND_LANDMARK,
    KIND_LINEAR,
    MAX_SPEED,
    MIN_SPEED,
    VehicleState,
)

VEHICLE_LENGTH = 5.0


class StraightGeo(NamedTuple):
    """Compile-time constants of a straight parallel-lane network."""

    origin: np.ndarray  # (2,) lane 0 start
    u: np.ndarray  # (2,) unit direction
    n: np.ndarray  # (2,) unit left-normal
    theta: float  # lane heading
    offsets: np.ndarray  # (L,) lateral offset of each lane
    width: float
    length: float
    speed_limit: float  # or inf


def try_compile(net) -> "StraightGeo | None":
    """Return StraightGeo if the network qualifies, else None."""
    from highwayenv_tpu.road.network import StraightLane

    lanes = [lane for ls in net.edges.values() for lane in ls]
    if not lanes:
        return None
    first = lanes[0]
    if type(first) is not StraightLane:
        return None
    u = first.direction
    for lane in lanes:
        if type(lane) is not StraightLane:
            return None
        if not np.allclose(lane.direction, u, atol=1e-9):
            return None
        if abs(lane.length - first.length) > 1e-6:
            return None
        if abs(lane.width - first.width) > 1e-9:
            return None
        sl0 = np.inf if first.speed_limit is None else first.speed_limit
        sl = np.inf if lane.speed_limit is None else lane.speed_limit
        if sl != sl0:
            return None
        if lane.forbidden:
            return None
        # arc-length co-linearity: same start projection on u
        if abs(np.dot(lane.start - first.start, u)) > 1e-6:
            return None
    # successor-free (single edge set)
    if len(net.edges) != 1:
        return None
    n = first.direction_lateral
    offsets = np.array([np.dot(lane.start - first.start, n) for lane in lanes])
    return StraightGeo(
        origin=np.asarray(first.start, np.float32),
        u=np.asarray(u, np.float32),
        n=np.asarray(n, np.float32),
        theta=float(first.heading),
        offsets=np.asarray(offsets, np.float32),
        width=float(first.width),
        length=float(first.length),
        speed_limit=float(np.inf if first.speed_limit is None else first.speed_limit),
    )


def _neigh(s, elig_lane, s_self, eye):
    """Front/rear per query row given (V,V) same-lane mask over columns.

    Ties (road.py:539-545): front keeps the LAST equally-distant column
    (the reference's ``<=`` overwrites), rear keeps the first (strict
    ``>``) — PARITY #3."""
    ok = elig_lane & ~eye
    V = s.shape[-1]
    j_idx = jnp.arange(V)
    front_ok = ok & (s_self[..., :, None] <= s[..., None, :])
    f_key = jnp.where(front_ok, s[..., None, :], jnp.inf)
    f_min = jnp.min(f_key, axis=-1)
    front_idx = jnp.maximum(
        jnp.max(
            jnp.where(front_ok & (f_key == f_min[..., None]), j_idx, -1),
            axis=-1,
        ),
        0,
    )
    front_ex = jnp.isfinite(f_min)
    rear_ok = ok & (s[..., None, :] < s_self[..., :, None])
    r_key = jnp.where(rear_ok, s[..., None, :], -jnp.inf)
    r_max = jnp.max(r_key, axis=-1)
    rear_idx = jnp.argmax(rear_ok & (r_key == r_max[..., None]), axis=-1)
    rear_ex = jnp.any(rear_ok, axis=-1)
    return front_idx, front_ex, rear_idx, rear_ex


def _accel(p, state, fs, s, delta_decider, eg, fr, front_exists):
    """IDM / linear acceleration given prefetched ego/front field rows.

    eg: dict of ego-row values; fr: dict of front-row values.
    """
    ego_speed = eg["speed"]
    ego_ts_raw = eg["target_speed"]
    limit = fs.speed_limit
    ego_ts = (
        ego_ts_raw
        if np.isinf(limit)
        else jnp.clip(ego_ts_raw, 0.0, limit)
    )
    free = p.comfort_acc_max * (
        1.0
        - jnp.power(
            jnp.maximum(ego_speed, 0.0) / jnp.abs(not_zero(ego_ts)),
            delta_decider,
        )
    )
    d = fr["s"] - eg["s"]
    dvx = ego_speed * eg["cos"] - fr["vx"]
    dvy = ego_speed * eg["sin"] - fr["vy"]
    dv = dvx * eg["cos"] + dvy * eg["sin"]
    ab = -p.comfort_acc_max * p.comfort_acc_min
    d_star = (
        p.distance_wanted
        + ego_speed * p.time_wanted
        + ego_speed * dv / (2 * jnp.sqrt(ab))
    )
    interaction = p.comfort_acc_max * jnp.square(d_star / not_zero(d))
    acc = free - jnp.where(front_exists, interaction, 0.0)

    # LinearVehicle deciders (behavior.py:417-466)
    vt = ego_ts_raw - ego_speed
    d_safe = p.distance_wanted + jnp.maximum(ego_speed, 0.0) * 2.5
    dv_raw = jnp.minimum(fr["speed"] - ego_speed, 0.0)
    dp = jnp.minimum(d - d_safe, 0.0)
    th = state.accel_params
    acc_lin = (
        th[..., 0] * vt
        + th[..., 1] * jnp.where(front_exists, dv_raw, 0.0)
        + th[..., 2] * jnp.where(front_exists, dp, 0.0)
    )
    acc = jnp.where(state.kind == KIND_LINEAR, acc_lin, acc)
    return acc


def _rows(idx, fields):
    """One one-hot matmul fetching all fields at rows ``idx``.

    idx (..., V); fields (..., V, F) -> (..., V, F).
    """
    V = fields.shape[-2]
    oh = jax.nn.one_hot(idx, V, dtype=fields.dtype)
    return jnp.einsum("...kv,...vf->...kf", oh, fields, precision="highest")


def straight_frame(
    env,
    fs: StraightGeo,
    veh: VehicleState,
    slot_actions,
    first: jnp.ndarray,
):
    """One simulation frame, semantics of envs/base.py::_frame."""
    p: IDMParams = env.idm_params
    dt = env.dt
    V = veh.num_slots
    L = len(fs.offsets)
    off = jnp.asarray(fs.offsets)
    u = jnp.asarray(fs.u)
    nvec = jnp.asarray(fs.n)
    origin = jnp.asarray(fs.origin)

    s = (veh.pos - origin) @ u  # (V,)
    lat0 = (veh.pos - origin) @ nvec  # (V,) lateral before lane offset

    # ---- ego meta-action (first frame) ----------------------------------- #
    ego_mask = (veh.kind == KIND_EGO) & first
    raw_controls = getattr(env.action_type, "stores_raw_controls", False)
    veh = env.action_type.apply(env.geo, veh, ego_mask, slot_actions)

    # ---- decisions -------------------------------------------------------- #
    idm = ((veh.kind == KIND_IDM) | (veh.kind == KIND_LINEAR)) & ~veh.crashed
    self_idx = jnp.arange(V, dtype=jnp.int32)
    eye = jnp.eye(V, dtype=bool)

    in_range = (-VEHICLE_LENGTH <= s) & (s < fs.length + VEHICLE_LENGTH)
    occupiable = in_range & veh.active & (veh.kind != KIND_LANDMARK)

    def _sel(vec, idx):
        # tiny-constant select (avoids a gather op)
        return jnp.sum(
            jnp.where(idx[..., None] == jnp.arange(L), vec, 0.0), axis=-1
        )

    lane_off = _sel(off, veh.lane)

    def same_lane_mask(query_off):
        # column j occupies the row-i query lane?
        return (
            jnp.abs(lat0[..., None, :] - query_off[..., :, None])
            <= fs.width / 2 + 1.0
        ) & occupiable[..., None, :]

    def neigh(query_off):
        s_self = s
        return _neigh(s, same_lane_mask(query_off), s_self, eye)

    # stacked front/rear queries for [current lane, lane-1, lane+1]: one
    # (3, V, V) masked pass + one reduction set instead of three — the
    # per-op dispatch/HBM overhead of many small (V, V) ops dominates at
    # these sizes
    cand_m = jnp.clip(veh.lane - 1, 0, L - 1)
    cand_p = jnp.clip(veh.lane + 1, 0, L - 1)
    q_off = jnp.stack(
        [lane_off, _sel(off, cand_m), _sel(off, cand_p)], axis=-2
    )  # (..., 3, V)
    m3 = (
        jnp.abs(lat0[..., None, None, :] - q_off[..., :, :, None])
        <= fs.width / 2 + 1.0
    ) & occupiable[..., None, None, :]  # (..., 3, V, V)
    f3_i, f3_ex, r3_i, r3_ex = _neigh(s, m3, s, eye)  # each (..., 3, V)

    op, op_ex = f3_i[..., 0, :], f3_ex[..., 0, :]
    of, of_ex = r3_i[..., 0, :], r3_ex[..., 0, :]

    # stacked field matrix for row fetches
    fields = jnp.stack(
        [
            veh.speed,
            veh.target_speed,
            s,
            veh.speed * jnp.cos(veh.heading),
            veh.speed * jnp.sin(veh.heading),
            jnp.cos(veh.heading),
            jnp.sin(veh.heading),
            veh.is_vehicle.astype(s.dtype),
        ],
        axis=-1,
    )  # (V, 8)

    def fetch(idx):
        r = _rows(idx, fields)
        return {
            "speed": r[..., 0],
            "target_speed": r[..., 1],
            "s": r[..., 2],
            "vx": r[..., 3],
            "vy": r[..., 4],
            "cos": r[..., 5],
            "sin": r[..., 6],
            "is_vehicle": r[..., 7] > 0.5,
        }

    self_row = {
        "speed": veh.speed,
        "target_speed": veh.target_speed,
        "s": s,
        "vx": fields[..., 3],
        "vy": fields[..., 4],
        "cos": fields[..., 5],
        "sin": fields[..., 6],
        "is_vehicle": veh.is_vehicle,
    }

    def accel_pair(eg_row, ego_ex, fr_row, fr_ex):
        a = _accel(p, veh, fs, s, veh.delta, eg_row, fr_row, fr_ex)
        return jnp.where(ego_ex & eg_row["is_vehicle"], a, 0.0)

    T = jnp.ones_like(veh.crashed)
    # one stacked one-hot contraction fetches every queried row at once:
    # [front(lane), rear(lane), front(-1), rear(-1), front(+1), rear(+1)]
    idx_all = jnp.stack(
        [op, of, f3_i[..., 1, :], r3_i[..., 1, :],
         f3_i[..., 2, :], r3_i[..., 2, :]],
        axis=-2,
    )  # (..., 6, V)
    rows_all = fetch(idx_all)  # dict of (..., 6, V)

    def _row(k):
        return {key: v[..., k, :] for key, v in rows_all.items()}

    row_op = _row(0)
    a_self = accel_pair(self_row, T, row_op, op_ex)

    # MOBIL per candidate lane
    lane_idx = veh.lane
    mid_change = veh.lane != veh.target_lane
    tick = do_every(p.lane_change_delay, veh.timer)
    deciding = idm & ~mid_change & tick & veh.enable_lane_change
    new_timer = jnp.where(deciding, 0.0, veh.timer)
    moving = jnp.abs(veh.speed) >= 1.0

    # route override: straight networks have no routes -> incentive only
    row_of = _row(1)
    a_of = accel_pair(row_of, of_ex, self_row, T)
    a_of_pred = accel_pair(row_of, of_ex, row_op, op_ex)

    target = veh.target_lane
    ok_d = {}
    a_self_pred_d = {}
    for d, qi in ((-1, 1), (1, 2)):
        cand = jnp.clip(lane_idx + d, 0, L - 1)
        exists = (lane_idx + d >= 0) & (lane_idx + d < L)
        cand_off = q_off[..., qi, :]
        np_ex = f3_ex[..., qi, :]
        nf_ex = r3_ex[..., qi, :]
        row_np = _row(2 * qi)
        row_nf = _row(2 * qi + 1)
        a_nf = accel_pair(row_nf, nf_ex, row_np, np_ex)
        a_nf_pred = accel_pair(row_nf, nf_ex, self_row, T)
        a_self_pred = accel_pair(self_row, T, row_np, np_ex)
        a_self_pred_d[d] = a_self_pred
        safe = a_nf_pred >= -veh.mobil_max_braking
        jerk = (
            a_self_pred
            - a_self
            + p.politeness * (a_nf_pred - a_nf + a_of_pred - a_of)
        )
        reachable = (
            (jnp.abs(lat0 - cand_off) <= 2 * fs.width)
            & (0 <= s)
            & (s < fs.length + VEHICLE_LENGTH)
        )
        ok = (
            deciding
            & exists
            & reachable
            & moving
            & safe
            & (jerk >= veh.mobil_gain)
        )
        ok_d[d] = ok
        target = jnp.where(ok, cand, target)

    # abort-on-conflict (behavior.py:229-243)
    d_ij = s[..., None, :] - s[..., :, None]
    dvx_ij = (fields[..., 3][..., :, None] - fields[..., 3][..., None, :]) * (
        fields[..., 5][..., :, None]
    )
    dvy_ij = (fields[..., 4][..., :, None] - fields[..., 4][..., None, :]) * (
        fields[..., 6][..., :, None]
    )
    dv_ij = dvx_ij + dvy_ij
    ab = -p.comfort_acc_max * p.comfort_acc_min
    d_star_ij = (
        p.distance_wanted
        + veh.speed[..., :, None] * p.time_wanted
        + veh.speed[..., :, None] * dv_ij / (2 * jnp.sqrt(ab))
    )
    conflict = (
        ~eye
        & veh.is_controlled[..., None, :]
        & (veh.lane[..., None, :] != veh.target_lane[..., :, None])
        & (veh.target_lane[..., None, :] == veh.target_lane[..., :, None])
        & (0.0 < d_ij)
        & (d_ij < d_star_ij)
    )
    # same_road is always true on a single-edge network
    abort = idm & mid_change & jnp.any(conflict, axis=-1)
    target = jnp.where(abort, veh.lane, target)
    veh = veh.replace(target_lane=target, timer=new_timer)

    # ---- low-level controls ----------------------------------------------- #
    new_tgt_off = _sel(off, veh.target_lane)
    lat_t = lat0 - new_tgt_off
    # P-cascade steering (controller.py:145-187); lane heading constant
    lateral_speed_command = -controller.KP_LATERAL * lat_t
    heading_command = jnp.arcsin(
        jnp.clip(lateral_speed_command / not_zero(veh.speed), -1.0, 1.0)
    )
    heading_ref = fs.theta + jnp.clip(
        heading_command, -jnp.pi / 4, jnp.pi / 4
    )
    heading_rate = controller.KP_HEADING * wrap_to_pi(heading_ref - veh.heading)
    slip = jnp.arcsin(
        jnp.clip(veh.length / 2 / not_zero(veh.speed) * heading_rate, -1.0, 1.0)
    )
    steer_pc = jnp.arctan2(2 * jnp.sin(slip), jnp.cos(slip))
    # linear steering (behavior.py:467-502)
    feat_h = (
        wrap_to_pi(fs.theta - veh.heading) * veh.length / not_zero(veh.speed)
    )
    feat_lat = -lat_t * veh.length / (not_zero(veh.speed) ** 2)
    steer_lin = (
        veh.steer_params[..., 0] * feat_h + veh.steer_params[..., 1] * feat_lat
    )
    steering = jnp.where(veh.kind == KIND_LINEAR, steer_lin, steer_pc)
    steering = jnp.clip(
        steering, -controller.MAX_STEERING_ANGLE, controller.MAX_STEERING_ANGLE
    )

    # dual-lane IDM while mid-change
    mid = veh.lane != veh.target_lane
    npt_i, npt_ex, _, _ = neigh(new_tgt_off)
    a_t = accel_pair(self_row, T, fetch(npt_i), npt_ex)
    accel = jnp.where(mid, jnp.minimum(a_self, a_t), a_self)
    accel = jnp.clip(accel, -p.acc_max, p.acc_max)

    # ego P controls
    is_ego = veh.kind == KIND_EGO
    if raw_controls:
        new_steer = jnp.where(idm, steering, veh.steering)
        new_accel = jnp.where(idm, accel, veh.accel)
    else:
        ego_acc = controller.KP_A * (veh.target_speed - veh.speed)
        new_steer = jnp.where(
            is_ego, steer_pc, jnp.where(idm, steering, veh.steering)
        )
        new_accel = jnp.where(
            is_ego, ego_acc, jnp.where(idm, accel, veh.accel)
        )
    veh = veh.replace(steering=new_steer, accel=new_accel)

    # ---- integrate (vehicle/kinematics.py:130-168) ------------------------ #
    moving_v = veh.is_vehicle
    st = jnp.where(veh.crashed, 0.0, veh.steering)
    ac = jnp.where(veh.crashed, -1.0 * veh.speed, veh.accel)
    ac = jnp.where(
        veh.speed > MAX_SPEED,
        jnp.minimum(ac, MAX_SPEED - veh.speed),
        jnp.where(
            veh.speed < MIN_SPEED, jnp.maximum(ac, MIN_SPEED - veh.speed), ac
        ),
    )
    beta = jnp.arctan(0.5 * jnp.tan(st))
    hb = veh.heading + beta
    vel = veh.speed[..., None] * jnp.stack([jnp.cos(hb), jnp.sin(hb)], -1)
    pos = veh.pos + vel * dt
    pos = pos + jnp.where(veh.impact_pending[..., None], veh.impact, 0.0)
    crashed = veh.crashed | (veh.impact_pending & moving_v)
    heading = veh.heading + veh.speed * jnp.sin(beta) / (veh.length / 2) * dt
    speed = veh.speed + ac * dt
    veh = veh.replace(
        pos=jnp.where(moving_v[..., None], pos, veh.pos),
        heading=jnp.where(moving_v, heading, veh.heading),
        speed=jnp.where(moving_v, speed, veh.speed),
        crashed=jnp.where(moving_v, crashed, veh.crashed),
        impact=jnp.where(moving_v[..., None], 0.0, veh.impact),
        impact_pending=jnp.where(moving_v, False, veh.impact_pending),
        timer=jnp.where(moving_v, veh.timer + dt, veh.timer),
    )

    # ---- re-localization: nearest lane offset + heading penalty ----------- #
    lat0_new = (veh.pos - origin) @ nvec
    # distance_with_heading reduces to |lat - off_l| (+ shared terms)
    d_lane = jnp.abs(lat0_new[..., :, None] - off)  # (V, L)
    new_lane = jnp.argmin(d_lane, axis=-1).astype(jnp.int32)
    veh = veh.replace(
        lane=jnp.where(veh.is_vehicle, new_lane, veh.lane)
    )

    # ---- collisions -------------------------------------------------------- #
    veh = collision.handle_collisions(veh, dt)
    return veh
