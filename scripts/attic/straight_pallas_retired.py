"""Pallas megakernel for the straight-network fast path.

One `pallas_call` holds a block of envs' vehicle state in VMEM and runs ALL
``sim_freq // policy_freq`` frames of {IDM/MOBIL decisions, P-controls,
bicycle integration, re-localization, SAT collisions} before writing back —
HBM traffic per policy step drops to two state transfers instead of one per
intermediate per frame.

The frame math (`frame_core`) is a flat-field port of
ops/straight_fast.py::straight_frame (semantics of envs/base.py::_frame),
shared by a pure-XLA reference wrapper used for cross-validation in
tests/test_straight_fast.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from highwayenv_tpu.ops.straight_fast import StraightGeo
from highwayenv_tpu.utils.math import do_every, not_zero, wrap_to_pi
from highwayenv_tpu.vehicle import controller
from highwayenv_tpu.vehicle.behavior import IDMParams
from highwayenv_tpu.vehicle.state import (
    KIND_EGO,
    KIND_IDM,
    KIND_LANDMARK,
    KIND_OBSTACLE,
    KIND_LINEAR,
    KIND_PLAIN,
    MAX_SPEED,
    MIN_SPEED,
    VehicleState,
)

VEHICLE_LENGTH = 5.0


def _atan(x):
    """Branchless cephes atanf: ~1e-7 abs error (mosaic lowers no inverse
    trig, so the kernel carries its own polynomial)."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t3p8 = 2.414213562373095  # tan(3*pi/8)
    tp8 = 0.4142135623730950  # tan(pi/8)
    big = ax > t3p8
    mid = (ax > tp8) & ~big
    safe = jnp.maximum(ax, 1e-30)
    z = jnp.where(
        big, -1.0 / safe, jnp.where(mid, (ax - 1.0) / (ax + 1.0), ax)
    )
    zz = z * z
    y = (
        ((8.05374449538e-2 * zz - 1.38776856032e-1) * zz + 1.99777106478e-1)
        * zz
        - 3.33329491539e-1
    ) * zz * z + z
    y = jnp.where(
        big, jnp.pi / 2 + y, jnp.where(mid, jnp.pi / 4 + y, y)
    )
    return sign * y


def _asin(x):
    """arcsin on [-1, 1] via atan(x / sqrt(1 - x^2))."""
    denom = jnp.sqrt(jnp.maximum(1.0 - x * x, 1e-12))
    return _atan(x / denom)


def _atan2_pos_x(y, x):
    """atan2 restricted to x >= 0 (result in (-pi/2, pi/2))."""
    return _atan(y / jnp.maximum(x, 1e-12))


def _tan(x):
    return jnp.sin(x) / jnp.cos(x)


def _any(x, axis):
    """Bool or-reduce via f32 max (mosaic cannot truncate i8->i1 vectors)."""
    return jnp.max(x.astype(F32), axis=axis) > 0.5

# kernel-resident state fields: name -> (VehicleState accessor, dtype)
F32 = jnp.float32
I32 = jnp.int32
FIELDS = [
    ("px", F32), ("py", F32), ("heading", F32), ("speed", F32),
    ("lane", I32), ("target_lane", I32), ("target_speed", F32),
    ("timer", F32), ("delta", F32), ("kind", I32),
    ("length", F32), ("width", F32),
    ("crashed", I32), ("hit", I32), ("impact_pending", I32),
    ("impact_x", F32), ("impact_y", F32),
    ("check_collisions", I32), ("collidable", I32),
    ("enable_lane_change", I32),
    ("mobil_gain", F32), ("mobil_max_braking", F32),
    ("accel_p0", F32), ("accel_p1", F32), ("accel_p2", F32),
    ("steer_p0", F32), ("steer_p1", F32),
    ("steering", F32), ("accel", F32),
]


def pack(veh: VehicleState) -> dict:
    return {
        "px": veh.pos[..., 0], "py": veh.pos[..., 1],
        "heading": veh.heading, "speed": veh.speed,
        "lane": veh.lane, "target_lane": veh.target_lane,
        "target_speed": veh.target_speed, "timer": veh.timer,
        "delta": veh.delta, "kind": veh.kind,
        "length": veh.length, "width": veh.width,
        "crashed": veh.crashed.astype(I32),
        "hit": veh.hit.astype(I32),
        "impact_pending": veh.impact_pending.astype(I32),
        "impact_x": veh.impact[..., 0], "impact_y": veh.impact[..., 1],
        "check_collisions": veh.check_collisions.astype(I32),
        "collidable": veh.collidable.astype(I32),
        "enable_lane_change": veh.enable_lane_change.astype(I32),
        "mobil_gain": veh.mobil_gain,
        "mobil_max_braking": veh.mobil_max_braking,
        "accel_p0": veh.accel_params[..., 0],
        "accel_p1": veh.accel_params[..., 1],
        "accel_p2": veh.accel_params[..., 2],
        "steer_p0": veh.steer_params[..., 0],
        "steer_p1": veh.steer_params[..., 1],
        "steering": veh.steering, "accel": veh.accel,
    }


def unpack(f: dict, veh: VehicleState) -> VehicleState:
    return veh.replace(
        pos=jnp.stack([f["px"], f["py"]], axis=-1),
        heading=f["heading"], speed=f["speed"],
        lane=f["lane"], target_lane=f["target_lane"],
        target_speed=f["target_speed"], timer=f["timer"],
        crashed=f["crashed"] > 0, hit=f["hit"] > 0,
        impact_pending=f["impact_pending"] > 0,
        impact=jnp.stack([f["impact_x"], f["impact_y"]], axis=-1),
        steering=f["steering"], accel=f["accel"],
    )


def frame_core(fs: StraightGeo, p: IDMParams, dt: float, raw_controls: bool,
               f: dict) -> dict:
    """One frame on flat (..., V) fields.  Port of straight_frame."""
    V = f["px"].shape[-1]
    L = len(fs.offsets)
    # compile-time python floats (pallas kernels cannot capture array consts)
    off = [float(o) for o in fs.offsets]
    ux, uy = float(fs.u[0]), float(fs.u[1])
    nx, ny = float(fs.n[0]), float(fs.n[1])
    ox, oy = float(fs.origin[0]), float(fs.origin[1])

    kind = f["kind"]
    crashed = f["crashed"] > 0
    active = kind != 0
    is_vehicle = (kind >= KIND_EGO) & (kind <= KIND_PLAIN)
    is_controlled = (kind >= KIND_EGO) & (kind <= KIND_LINEAR)
    is_linear = kind == KIND_LINEAR
    idm = ((kind == KIND_IDM) | is_linear) & ~crashed

    s = (f["px"] - ox) * ux + (f["py"] - oy) * uy
    lat0 = (f["px"] - ox) * nx + (f["py"] - oy) * ny

    eye = jnp.eye(V, dtype=bool)
    in_range = (-VEHICLE_LENGTH <= s) & (s < fs.length + VEHICLE_LENGTH)
    occupiable = in_range & active & (kind != KIND_LANDMARK)

    def _sel(vec, idx):
        # lane-unrolled select over compile-time scalars (no gather, no const)
        out = jnp.zeros_like(idx, dtype=F32)
        for l, v in enumerate(vec):
            out = jnp.where(idx == l, v, out)
        return out

    lane_off = _sel(off, f["lane"])

    def neigh(query_off):
        m = (
            jnp.abs(lat0[..., None, :] - query_off[..., :, None])
            <= fs.width / 2 + 1.0
        ) & occupiable[..., None, :] & ~eye
        front_ok = m & (s[..., :, None] <= s[..., None, :])
        f_key = jnp.where(front_ok, s[..., None, :], jnp.inf)
        f_min = jnp.min(f_key, axis=-1)
        front_idx = jnp.argmax(
            (front_ok & (f_key == f_min[..., None])).astype(F32), axis=-1
        )
        front_ex = f_min < jnp.inf
        rear_ok = m & (s[..., None, :] < s[..., :, None])
        r_key = jnp.where(rear_ok, s[..., None, :], -jnp.inf)
        r_max = jnp.max(r_key, axis=-1)
        rear_idx = jnp.argmax(
            (rear_ok & (r_key == r_max[..., None])).astype(F32), axis=-1
        )
        rear_ex = _any(rear_ok, axis=-1)
        return front_idx, front_ex, rear_idx, rear_ex

    cos_h = jnp.cos(f["heading"])
    sin_h = jnp.sin(f["heading"])
    vxv = f["speed"] * cos_h
    vyv = f["speed"] * sin_h
    fields = jnp.stack(
        [f["speed"], f["target_speed"], s, vxv, vyv, cos_h, sin_h,
         is_vehicle.astype(F32)],
        axis=-1,
    )  # (V, 8)

    def fetch(idx):
        oh = jax.nn.one_hot(idx, V, dtype=F32)
        r = jnp.einsum("...kv,...vf->...kf", oh, fields, precision="highest")
        return {
            "speed": r[..., 0], "target_speed": r[..., 1], "s": r[..., 2],
            "vx": r[..., 3], "vy": r[..., 4], "cos": r[..., 5],
            "sin": r[..., 6], "is_vehicle": r[..., 7] > 0.5,
        }

    self_row = {
        "speed": f["speed"], "target_speed": f["target_speed"], "s": s,
        "vx": vxv, "vy": vyv, "cos": cos_h, "sin": sin_h,
        "is_vehicle": is_vehicle,
    }

    accel_params = (f["accel_p0"], f["accel_p1"], f["accel_p2"])

    def accel_pair(eg, ego_ex, fr, fr_ex):
        ego_speed = eg["speed"]
        ego_ts_raw = eg["target_speed"]
        ego_ts = (
            ego_ts_raw
            if np.isinf(fs.speed_limit)
            else jnp.clip(ego_ts_raw, 0.0, fs.speed_limit)
        )
        free = p.comfort_acc_max * (
            1.0
            - jnp.power(
                jnp.maximum(ego_speed, 0.0) / jnp.abs(not_zero(ego_ts)),
                f["delta"],
            )
        )
        d = fr["s"] - eg["s"]
        dv = (ego_speed * eg["cos"] - fr["vx"]) * eg["cos"] + (
            ego_speed * eg["sin"] - fr["vy"]
        ) * eg["sin"]
        ab = -p.comfort_acc_max * p.comfort_acc_min
        d_star = (
            p.distance_wanted
            + ego_speed * p.time_wanted
            + ego_speed * dv / (2 * jnp.sqrt(ab))
        )
        interaction = p.comfort_acc_max * jnp.square(d_star / not_zero(d))
        acc = free - jnp.where(fr_ex, interaction, 0.0)
        # linear deciders
        vt = ego_ts_raw - ego_speed
        d_safe = p.distance_wanted + jnp.maximum(ego_speed, 0.0) * 2.5
        dv_raw = jnp.minimum(fr["speed"] - ego_speed, 0.0)
        dp = jnp.minimum(d - d_safe, 0.0)
        acc_lin = (
            accel_params[0] * vt
            + accel_params[1] * jnp.where(fr_ex, dv_raw, 0.0)
            + accel_params[2] * jnp.where(fr_ex, dp, 0.0)
        )
        acc = jnp.where(is_linear, acc_lin, acc)
        return jnp.where(ego_ex & eg["is_vehicle"], acc, 0.0)

    T = jnp.ones_like(crashed)
    op, op_ex, of, of_ex = neigh(lane_off)
    row_op = fetch(op)
    a_self = accel_pair(self_row, T, row_op, op_ex)

    mid_change = f["lane"] != f["target_lane"]
    tick = do_every(p.lane_change_delay, f["timer"])
    deciding = (
        idm & ~mid_change & tick & (f["enable_lane_change"] > 0)
    )
    new_timer = jnp.where(deciding, 0.0, f["timer"])
    moving = jnp.abs(f["speed"]) >= 1.0

    row_of = fetch(of)
    a_of = accel_pair(row_of, of_ex, self_row, T)
    a_of_pred = accel_pair(row_of, of_ex, row_op, op_ex)

    target = f["target_lane"]
    for d in (-1, 1):
        cand = jnp.clip(f["lane"] + d, 0, L - 1)
        exists = (f["lane"] + d >= 0) & (f["lane"] + d < L)
        cand_off = _sel(off, cand)
        np_i, np_ex, nf_i, nf_ex = neigh(cand_off)
        row_np = fetch(np_i)
        row_nf = fetch(nf_i)
        a_nf = accel_pair(row_nf, nf_ex, row_np, np_ex)
        a_nf_pred = accel_pair(row_nf, nf_ex, self_row, T)
        a_self_pred = accel_pair(self_row, T, row_np, np_ex)
        safe = a_nf_pred >= -f["mobil_max_braking"]
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
            deciding & exists & reachable & moving & safe
            & (jerk >= f["mobil_gain"])
        )
        target = jnp.where(ok, cand, target)

    # abort-on-conflict
    d_ij = s[..., None, :] - s[..., :, None]
    dv_ij = (vxv[..., :, None] - vxv[..., None, :]) * cos_h[..., :, None] + (
        vyv[..., :, None] - vyv[..., None, :]
    ) * sin_h[..., :, None]
    ab = -p.comfort_acc_max * p.comfort_acc_min
    d_star_ij = (
        p.distance_wanted
        + f["speed"][..., :, None] * p.time_wanted
        + f["speed"][..., :, None] * dv_ij / (2 * jnp.sqrt(ab))
    )
    conflict = (
        ~eye
        & is_controlled[..., None, :]
        & (f["lane"][..., None, :] != f["target_lane"][..., :, None])
        & (f["target_lane"][..., None, :] == f["target_lane"][..., :, None])
        & (0.0 < d_ij)
        & (d_ij < d_star_ij)
    )
    abort = idm & mid_change & _any(conflict, axis=-1)
    target = jnp.where(abort, f["lane"], target)

    # ---- low-level controls --------------------------------------------- #
    new_tgt_off = _sel(off, target)
    lat_t = lat0 - new_tgt_off
    lateral_speed_command = -controller.KP_LATERAL * lat_t
    heading_command = _asin(
        jnp.clip(lateral_speed_command / not_zero(f["speed"]), -1.0, 1.0)
    )
    heading_ref = fs.theta + jnp.clip(heading_command, -jnp.pi / 4, jnp.pi / 4)
    heading_rate = controller.KP_HEADING * wrap_to_pi(
        heading_ref - f["heading"]
    )
    sin_slip = jnp.clip(
        f["length"] / 2 / not_zero(f["speed"]) * heading_rate, -1.0, 1.0
    )
    cos_slip = jnp.sqrt(jnp.maximum(1.0 - sin_slip * sin_slip, 0.0))
    # arctan2(2 sin(slip), cos(slip)) with cos(slip) >= 0
    steer_pc = _atan2_pos_x(2 * sin_slip, cos_slip)
    feat_h = (
        wrap_to_pi(fs.theta - f["heading"]) * f["length"] / not_zero(f["speed"])
    )
    feat_lat = -lat_t * f["length"] / (not_zero(f["speed"]) ** 2)
    steer_lin = f["steer_p0"] * feat_h + f["steer_p1"] * feat_lat
    steering = jnp.where(is_linear, steer_lin, steer_pc)
    steering = jnp.clip(
        steering, -controller.MAX_STEERING_ANGLE, controller.MAX_STEERING_ANGLE
    )

    mid = f["lane"] != target
    npt_i, npt_ex, _, _ = neigh(new_tgt_off)
    a_t = accel_pair(self_row, T, fetch(npt_i), npt_ex)
    accel = jnp.where(mid, jnp.minimum(a_self, a_t), a_self)
    accel = jnp.clip(accel, -p.acc_max, p.acc_max)

    is_ego = kind == KIND_EGO
    if raw_controls:
        new_steer = jnp.where(idm, steering, f["steering"])
        new_accel = jnp.where(idm, accel, f["accel"])
    else:
        ego_acc = controller.KP_A * (f["target_speed"] - f["speed"])
        new_steer = jnp.where(
            is_ego, steer_pc, jnp.where(idm, steering, f["steering"])
        )
        new_accel = jnp.where(
            is_ego, ego_acc, jnp.where(idm, accel, f["accel"])
        )

    # ---- integrate -------------------------------------------------------- #
    st = jnp.where(crashed, 0.0, new_steer)
    ac = jnp.where(crashed, -1.0 * f["speed"], new_accel)
    ac = jnp.where(
        f["speed"] > MAX_SPEED,
        jnp.minimum(ac, MAX_SPEED - f["speed"]),
        jnp.where(
            f["speed"] < MIN_SPEED,
            jnp.maximum(ac, MIN_SPEED - f["speed"]),
            ac,
        ),
    )
    beta = _atan(0.5 * _tan(st))
    hb = f["heading"] + beta
    pend = f["impact_pending"] > 0
    px = f["px"] + f["speed"] * jnp.cos(hb) * dt + jnp.where(
        pend, f["impact_x"], 0.0
    )
    py = f["py"] + f["speed"] * jnp.sin(hb) * dt + jnp.where(
        pend, f["impact_y"], 0.0
    )
    new_crashed = crashed | (pend & is_vehicle)
    heading = f["heading"] + f["speed"] * jnp.sin(beta) / (f["length"] / 2) * dt
    speed = f["speed"] + ac * dt

    mv = is_vehicle
    px = jnp.where(mv, px, f["px"])
    py = jnp.where(mv, py, f["py"])
    heading = jnp.where(mv, heading, f["heading"])
    speed = jnp.where(mv, speed, f["speed"])
    # logic ops, not selects: mosaic cannot lower i1-operand selects
    new_crashed = (mv & new_crashed) | (~mv & crashed)
    impact_x = jnp.where(mv, 0.0, f["impact_x"])
    impact_y = jnp.where(mv, 0.0, f["impact_y"])
    impact_pending = pend & ~mv
    timer = jnp.where(mv, new_timer + dt, new_timer)

    # ---- re-localization --------------------------------------------------- #
    lat0_new = (px - ox) * nx + (py - oy) * ny
    # argmin over L unrolled (first-index tie-break like jnp.argmin)
    new_lane = jnp.zeros_like(f["lane"])
    best_d = jnp.abs(lat0_new - off[0])
    for l in range(1, L):
        d_l = jnp.abs(lat0_new - off[l])
        better = d_l < best_d
        new_lane = jnp.where(better, l, new_lane)
        best_d = jnp.where(better, d_l, best_d)
    lane = jnp.where(mv, new_lane, f["lane"])

    # ---- collisions (SAT, port of ops/collision.py) ------------------------ #
    from highwayenv_tpu.utils.math import rects_intersecting

    # expand i32/f32 fields BEFORE boolean ops: mosaic cannot insert a minor
    # dim on i1 vectors
    cx = px
    cy = py
    i_idx = jnp.arange(V)
    upper = i_idx[:, None] < i_idx[None, :]
    kind_i = kind[..., :, None]
    kind_j = kind[..., None, :]
    veh_i = (kind_i >= KIND_EGO) & (kind_i <= KIND_PLAIN)
    veh_j = (kind_j >= KIND_EGO) & (kind_j <= KIND_PLAIN)
    chk_i = f["check_collisions"][..., :, None] > 0
    chk_j = f["check_collisions"][..., None, :] > 0
    coll_i = f["collidable"][..., :, None] > 0
    coll_j = f["collidable"][..., None, :] > 0
    pair_ok = (
        upper
        & (kind_i != 0)
        & (kind_j != 0)
        & (veh_i | veh_j)
        & (chk_i | chk_j)
        & coll_i
        & coll_j
    )
    dx = cx[..., :, None] - cx[..., None, :]
    dy = cy[..., :, None] - cy[..., None, :]
    dist2 = dx * dx + dy * dy
    diag = jnp.sqrt(f["length"] ** 2 + f["width"] ** 2)
    reach = (diag[..., :, None] + diag[..., None, :]) / 2 + (
        speed[..., :, None] * dt
    )
    pair_ok = pair_ok & (dist2 <= reach * reach)

    pos2 = jnp.stack([cx, cy], axis=-1)
    velx = speed * jnp.cos(heading)
    vely = speed * jnp.sin(heading)
    vel2 = jnp.stack([velx, vely], axis=-1)
    inter, will, trans = rects_intersecting(
        pos2[..., :, None, :], f["length"][..., :, None],
        f["width"][..., :, None], heading[..., :, None],
        pos2[..., None, :, :], f["length"][..., None, :],
        f["width"][..., None, :], heading[..., None, :],
        displacement_a=vel2[..., :, None, :] * dt,
        displacement_b=vel2[..., None, :, :] * dt,
    )
    inter = inter & pair_ok
    will = will & pair_ok
    solid_i = (kind_i != 0) & (kind_i != KIND_LANDMARK)
    solid_j = (kind_j != 0) & (kind_j != KIND_LANDMARK)
    both = solid_i & solid_j
    obst_i = kind_i == KIND_OBSTACLE
    obst_j = kind_j == KIND_OBSTACLE
    w = will & both
    neither = ~obst_i & ~obst_j
    coef_i = jnp.where(w & obst_j, 1.0, jnp.where(w & neither, 0.5, 0.0))
    coef_j = jnp.where(w & obst_i, 1.0, jnp.where(w & neither, -0.5, 0.0))
    tx = trans[..., 0]
    ty = trans[..., 1]
    impact_x = impact_x + jnp.sum(coef_i * tx, axis=-1) + jnp.sum(
        coef_j * tx, axis=-2
    )
    impact_y = impact_y + jnp.sum(coef_i * ty, axis=-1) + jnp.sum(
        coef_j * ty, axis=-2
    )
    impact_pending = (
        impact_pending
        | _any(w & ~obst_i, axis=-1)
        | _any(w & ~obst_j, axis=-2)
    )
    crash_pair = inter & both
    new_crashed = (
        new_crashed
        | _any(crash_pair, axis=-1)
        | _any(crash_pair, axis=-2)
    )
    hit_pair_i = inter & ~solid_i
    hit_pair_j = inter & ~solid_j
    hit = (f["hit"] > 0) | _any(hit_pair_i, axis=-1) | _any(hit_pair_j, axis=-2)

    out = dict(f)
    out.update(
        px=px, py=py, heading=heading, speed=speed, lane=lane,
        target_lane=target, timer=timer,
        crashed=new_crashed.astype(I32), hit=hit.astype(I32),
        impact_pending=impact_pending.astype(I32),
        impact_x=impact_x, impact_y=impact_y,
        steering=new_steer, accel=new_accel,
    )
    return out


# --------------------------------------------------------------------------- #
# NOTE (round 2): the batch-major pallas wrapper that lived here
# (`pallas_simulate`, one (block, V) megakernel over all frames) is DELETED —
# mosaic hangs indefinitely on batch-major (block, V, V) pair bodies, which
# was round 1's unlanded-kernel failure.  The production TPU kernel is the
# batch-minor variant in ops/straight_pallas_bm.py.  `frame_core` above is
# kept as the flat-field reference implementation cross-validated against
# the XLA fast path (tests/test_batched_step.py).
