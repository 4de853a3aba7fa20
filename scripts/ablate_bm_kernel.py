"""Ablate sections of the batch-minor straight megakernel on real TPU.

Measures the per-step cost of kernel variants with whole sections disabled
(semantics intentionally broken — timing only):
  full          everything
  no_mobil      skip the of/nf rear queries, jerk, candidate lanes, abort
  no_collide    skip the swept-SAT collision section
  no_decide     own-lane front query + controls + integrate only
  integrate     controls + integrate only (no pair space at all)

Usage: python scripts/ablate_bm_kernel.py [B] [T]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import highwayenv_tpu as ht
from highwayenv_tpu.ops import straight_pallas_bm as bm

ABLATE = {"mode": "full"}

_orig_body = bm._frame_body


def _body(fs, p, dt, raw_controls, lean, has_linear, sorted_mode, f):
    mode = ABLATE["mode"]
    if mode == "full":
        return _orig_body(fs, p, dt, raw_controls, lean, has_linear, sorted_mode, f)
    import numpy as np
    from highwayenv_tpu.ops.mosaic_math import _asin, _atan, _atan2_pos_x, _tan
    from highwayenv_tpu.utils.math import not_zero, wrap_to_pi
    from highwayenv_tpu.vehicle import controller
    from highwayenv_tpu.vehicle.state import (
        KIND_EGO, KIND_LINEAR, MAX_SPEED, MIN_SPEED,
    )

    F32 = jnp.float32
    VEHICLE_LENGTH = 5.0
    V = f["px"].shape[0]
    L = len(fs.offsets)
    off = [float(o) for o in fs.offsets]
    ux, uy = float(fs.u[0]), float(fs.u[1])
    nx, ny = float(fs.n[0]), float(fs.n[1])
    ox, oy = float(fs.origin[0]), float(fs.origin[1])
    blk = f["px"].shape[1]

    kind = f["kind"]
    crashed = f["crashed"] > 0.5
    active = kind > 0.5
    is_controlled = active
    idm = active & (kind > KIND_EGO + 0.5) & ~crashed
    is_vehicle = active

    s = (f["px"] - ox) * ux + (f["py"] - oy) * uy
    lat0 = (f["px"] - ox) * nx + (f["py"] - oy) * ny

    row_i = jax.lax.broadcasted_iota(jnp.int32, (V, V, blk), 0).astype(F32)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (V, V, blk), 1).astype(F32)
    not_eye = jnp.abs(row_i - col_i) > 0.5

    in_range = (-VEHICLE_LENGTH <= s) & (s < fs.length + VEHICLE_LENGTH)
    occupiable = in_range & active

    def sel_off(lane):
        out = jnp.zeros_like(lane)
        for l, v in enumerate(off):
            out = jnp.where(jnp.abs(lane - l) < 0.5, v, out)
        return out

    lane_off = sel_off(f["lane"])
    s_c = s[None, :, :]
    s_q = s[:, None, :]
    occ_c = occupiable[None, :, :]
    lat_c = lat0[None, :, :]
    BIG = 1e9

    def neigh_masks(query_off):
        m = (
            (jnp.abs(lat_c - query_off[:, None, :]) <= fs.width / 2 + 1.0)
            & occ_c & not_eye
        )
        front_ok = m & (s_q <= s_c)
        f_key = jnp.where(front_ok, s_c, BIG)
        f_min = jnp.min(f_key, axis=1)
        f_hit = front_ok & (f_key <= f_min[:, None, :])
        f_col = jnp.min(jnp.where(f_hit, col_i, BIG), axis=1)
        f_hot = (f_hit & (col_i <= f_col[:, None, :])).astype(F32)
        front_ex = f_min < BIG
        return f_hot, front_ex

    cos_h = jnp.cos(f["heading"])
    sin_h = jnp.sin(f["heading"])
    vxv = f["speed"] * cos_h
    vyv = f["speed"] * sin_h

    fetch_fields = {
        "speed": f["speed"], "target_speed": f["target_speed"], "s": s,
        "vx": vxv, "vy": vyv, "cos": cos_h, "sin": sin_h,
        "is_vehicle": is_vehicle.astype(F32),
    }
    FRONT_KEYS = ("s", "vx", "vy")

    def fetch(hot, keys):
        out = {}
        for k in keys:
            out[k] = jnp.sum(hot * fetch_fields[k][None, :, :], axis=1)
        return out

    self_row = dict(fetch_fields)
    self_row["is_vehicle"] = is_vehicle
    T = jnp.ones_like(crashed)

    def accel_pair(eg, ego_ex, fr, fr_ex):
        ego_speed = eg["speed"]
        ego_ts = jnp.clip(eg["target_speed"], 0.0, fs.speed_limit) if not np.isinf(
            fs.speed_limit
        ) else eg["target_speed"]
        free = p.comfort_acc_max * (
            1.0 - jnp.power(
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
            p.distance_wanted + ego_speed * p.time_wanted
            + ego_speed * dv / (2 * jnp.sqrt(ab))
        )
        interaction = p.comfort_acc_max * jnp.square(d_star / not_zero(d))
        acc = free - jnp.where(fr_ex, interaction, 0.0)
        return jnp.where(ego_ex, acc, 0.0)

    target = f["target_lane"]
    new_timer = f["timer"]
    if mode in ("full", "no_mobil", "no_collide"):
        op_hot, op_ex = neigh_masks(lane_off)
        row_op = fetch(op_hot, FRONT_KEYS)
        row_op["speed"] = f["speed"] * 0  # unused
        eg = dict(self_row)
        eg["cos"] = cos_h
        eg["sin"] = sin_h
        a_self = accel_pair(
            {
                "speed": f["speed"], "target_speed": f["target_speed"],
                "s": s, "cos": cos_h, "sin": sin_h,
            },
            T, row_op, op_ex,
        )
        accel = jnp.clip(a_self, -p.acc_max, p.acc_max)
    elif mode == "no_decide":
        op_hot, op_ex = neigh_masks(lane_off)
        row_op = fetch(op_hot, FRONT_KEYS)
        a_self = accel_pair(
            {
                "speed": f["speed"], "target_speed": f["target_speed"],
                "s": s, "cos": cos_h, "sin": sin_h,
            },
            T, row_op, op_ex,
        )
        accel = jnp.clip(a_self, -p.acc_max, p.acc_max)
    else:  # integrate
        accel = jnp.zeros_like(s)

    if mode == "no_collide":
        # keep MOBIL-ish extra queries to isolate collision cost: two
        # candidate-lane front queries + rear-ish second fetch each
        for d in (-1, 1):
            cand = jnp.clip(f["lane"] + d, 0.0, L - 1.0)
            np_hot, np_ex = neigh_masks(sel_off(cand))
            row_np = fetch(np_hot, FRONT_KEYS)
            a2 = accel_pair(
                {
                    "speed": f["speed"], "target_speed": f["target_speed"],
                    "s": s, "cos": cos_h, "sin": sin_h,
                },
                T, row_np, np_ex,
            )
            accel = accel + 0.0 * a2

    # controls + integrate (same in all modes)
    new_tgt_off = sel_off(target)
    lat_t = lat0 - new_tgt_off
    lateral_speed_command = -controller.KP_LATERAL * lat_t
    heading_command = _asin(
        jnp.clip(lateral_speed_command / not_zero(f["speed"]), -1.0, 1.0)
    )
    heading_ref = fs.theta + jnp.clip(heading_command, -jnp.pi / 4, jnp.pi / 4)
    heading_rate = controller.KP_HEADING * wrap_to_pi(heading_ref - f["heading"])
    sin_slip = jnp.clip(
        f["length"] / 2 / not_zero(f["speed"]) * heading_rate, -1.0, 1.0
    )
    cos_slip = jnp.sqrt(jnp.maximum(1.0 - sin_slip * sin_slip, 0.0))
    steering = jnp.clip(
        _atan2_pos_x(2 * sin_slip, cos_slip),
        -controller.MAX_STEERING_ANGLE, controller.MAX_STEERING_ANGLE,
    )
    st = jnp.where(crashed, 0.0, steering)
    ac = jnp.where(crashed, -1.0 * f["speed"], accel)
    beta = _atan(0.5 * _tan(st))
    hb = f["heading"] + beta
    px = f["px"] + f["speed"] * jnp.cos(hb) * dt
    py = f["py"] + f["speed"] * jnp.sin(hb) * dt
    heading = f["heading"] + f["speed"] * jnp.sin(beta) / (f["length"] / 2) * dt
    speed = jnp.clip(f["speed"] + ac * dt, MIN_SPEED, MAX_SPEED)

    lat0_new = (px - ox) * nx + (py - oy) * ny
    new_lane = jnp.zeros_like(f["lane"])
    best_d = jnp.abs(lat0_new - off[0])
    for l in range(1, L):
        d_l = jnp.abs(lat0_new - off[l])
        better = d_l < best_d
        new_lane = jnp.where(better, float(l), new_lane)
        best_d = jnp.where(better, d_l, best_d)

    out = dict(f)
    out.update(px=px, py=py, heading=heading, speed=speed, lane=new_lane,
               target_lane=target, timer=new_timer)

    if mode in ("full", "no_mobil", "no_decide", "integrate"):
        from highwayenv_tpu.utils.math import rects_intersecting_xy_folded

        upper = row_i < col_i
        pair_ok = (
            upper & active[:, None, :] & active[None, :, :]
        )
        dx = px[:, None, :] - px[None, :, :]
        dy = py[:, None, :] - py[None, :, :]
        dist2 = dx * dx + dy * dy
        diag = jnp.sqrt(f["length"] ** 2 + f["width"] ** 2)
        reach = (diag[:, None, :] + diag[None, :, :]) / 2 + speed[:, None, :] * dt
        pair_ok = pair_ok & (dist2 <= reach * reach)
        velx = speed * jnp.cos(heading)
        vely = speed * jnp.sin(heading)
        inter, will, tx, ty = rects_intersecting_xy_folded(
            px[:, None, :], py[:, None, :],
            f["length"][:, None, :], f["width"][:, None, :], heading[:, None, :],
            px[None, :, :], py[None, :, :],
            f["length"][None, :, :], f["width"][None, :, :], heading[None, :, :],
            relx=(velx[:, None, :] - velx[None, :, :]) * dt,
            rely=(vely[:, None, :] - vely[None, :, :]) * dt,
        )
        inter = inter & pair_ok
        will = will & pair_ok
        wf = will.astype(F32)
        out["impact_x"] = 0.5 * (
            jnp.sum(wf * tx, axis=1) - jnp.sum(wf * tx, axis=0)
        )
        out["impact_y"] = 0.5 * (
            jnp.sum(wf * ty, axis=1) - jnp.sum(wf * ty, axis=0)
        )
        out["crashed"] = (
            crashed
            | (jnp.max(inter.astype(F32), axis=1) > 0.5)
            | (jnp.max(inter.astype(F32), axis=0) > 0.5)
        ).astype(F32)
    if mode == "no_mobil" or mode == "no_collide":
        pass
    return out


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    env = ht.make("highway-v0")
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    _, states = jax.jit(jax.vmap(env._reset))(keys)
    veh = states.vehicles
    frames = env.frames_per_step

    def checksum(tree):
        return sum(jnp.sum(x).astype(jnp.float32) for x in jax.tree.leaves(tree))

    for mode in ["full", "no_mobil", "no_collide", "no_decide", "integrate"]:
        ABLATE["mode"] = mode
        bm._frame_body = _body
        frame_fn = bm.build_pallas_frame(env, frames=frames)

        @jax.jit
        def sim(veh):
            arrays = bm.pack_bm(veh)

            def body(arrs, _):
                return frame_fn(arrs), None

            arrays, _ = jax.lax.scan(body, arrays, None, length=T)
            return checksum(arrays)

        float(sim(veh))  # compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(sim(veh))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        ms = ts[1] / T * 1000
        print(f"{mode:12s}: {ms:8.2f} ms/step ({ms/frames:6.3f} ms/frame)")
        bm._frame_body = _orig_body
        # drop the cached kernel for the next mode
        bm._FRAME_CACHE.clear()


if __name__ == "__main__":
    main()
