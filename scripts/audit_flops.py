#!/usr/bin/env python
"""Instrumented FLOP accounting for the headline kernel (VERDICT r3 #2).

Replaces the hand-estimated 37.5 MFLOP/env-step with numbers read off the
compiled executables' own cost analysis:

- the XLA fast path (`ops/straight_fast.straight_frame`) — the logical
  work of the frame semantics as XLA counts it;
- the Pallas megakernel BODY (`ops/straight_pallas_bm._frame_body`) traced
  through XLA outside pallas_call — the op census the kernel actually
  executes (mosaic does not re-fuse, so this is close to真 hardware ops);
- a per-section breakdown of the body (neighbour masks, fetch
  contractions, MOBIL/abort pair work, collision SAT, per-slot tail) so
  perf work targets the dominant share.

Run on any platform (counts are platform-independent):
    python scripts/audit_flops.py            # JSON summary to stdout

The MFU printed by bench.py uses BENCH_FLOPS_PER_STEP; this script is the
source of that constant (see docs/kernels.md "MFU accounting").
"""

from __future__ import annotations

import json
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

# default: the bench platform (the container's axon TPU plugin).  Cost
# analysis reads the OPTIMIZED backend HLO, so counts are backend-specific
# (CPU's optimizer yields ~2.7x different numbers on the same trace);
# record on the platform the headline runs on.  AUDIT_PLATFORM=cpu for a
# fast local approximation.
if _os.environ.get("AUDIT_PLATFORM"):
    jax.config.update("jax_platforms", _os.environ["AUDIT_PLATFORM"])

import highwayenv_tpu as ht  # noqa: E402
from highwayenv_tpu.ops import collision, straight_fast  # noqa: E402
from highwayenv_tpu.ops import straight_pallas_bm as spb  # noqa: E402

B = 128  # one pallas block
ENV_ID = "highway-v0"


def _cost(fn, *args):
    c = jax.jit(fn).lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("transcendentals", 0.0))


def main():
    env = ht.make(ENV_ID)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    _, states = jax.jit(jax.vmap(env._reset))(keys)
    veh = states.vehicles
    arrays = jax.jit(spb.pack_bm)(veh)
    fs, p, dt = env._straight, env.idm_params, env.dt
    raw = getattr(env.action_type, "stores_raw_controls", False)
    npc = env.config.get("other_vehicles_type", "").rsplit(".", 1)[-1]
    has_linear = npc in getattr(env, "_NPC_PRESETS", {})
    frames = env.frames_per_step
    V = arrays[0].shape[0]

    out = {"env": ENV_ID, "V": V, "frames_per_step": frames, "block": B}

    # ---- XLA fast path: one frame ------------------------------------- #
    def xla_frame(veh):
        def one(v):
            sa = env._action_to_slots(jnp.int32(0))
            return straight_fast.straight_frame(
                env, env._straight, v, sa, jnp.asarray(True)
            )

        return jax.vmap(one)(veh)

    fl, tr = _cost(xla_frame, veh)
    out["xla_frame_flops_per_env_frame"] = round(fl / B)
    out["xla_step_mflops"] = round(fl / B * frames / 1e6, 2)

    flc, _ = _cost(
        lambda v: jax.vmap(lambda x: collision.handle_collisions(x, dt))(v),
        veh,
    )
    out["xla_collision_share"] = round(flc / fl, 3)

    # ---- Pallas body: one frame (the kernel's own op census) ----------- #
    names = spb.BM_FIELDS

    def body_fn(arrs):
        f = {n: a for n, a in zip(names, arrs)}
        o = spb._frame_body(fs, p, dt, raw, True, has_linear, False, f)
        return [o[n] for n in spb.BM_MUT_FIELDS]

    flb, trb = _cost(body_fn, arrays)
    out["pallas_body_flops_per_env_frame"] = round(flb / B)
    out["pallas_step_mflops"] = round(flb / B * frames / 1e6, 2)
    out["pallas_transcendentals_per_env_frame"] = round(trb / B, 1)

    # ---- SORTED (banded) body: the census the DEFAULT kernel executes --- #
    # The sorted kernel replaces the dense (V, V, blk) collision SAT with W
    # reach-gated rank diagonals; this census (not the dense one) is what
    # the headline actually runs per frame since round 4.  Excludes the
    # sort/unsort permute kernels (once per policy step, ~O(V^2) compares —
    # amortized over 15 frames they are <2% of a step).
    def body_sorted_fn(arrs):
        f = {n: a for n, a in zip(names, arrs)}
        f["viol"] = jnp.zeros_like(f["px"])
        V_ = f["px"].shape[0]
        f["idx"] = jnp.broadcast_to(
            jnp.arange(V_, dtype=jnp.float32)[:, None], f["px"].shape
        )
        o = spb._frame_body(fs, p, dt, raw, True, has_linear, True, f)
        return [o[n] for n in spb.BM_MUT_FIELDS + ["viol"]]

    flbs, trbs = _cost(body_sorted_fn, arrays)
    out["pallas_sorted_body_flops_per_env_frame"] = round(flbs / B)
    out["pallas_sorted_step_mflops"] = round(flbs / B * frames / 1e6, 2)
    out["pallas_sorted_transcendentals_per_env_frame"] = round(trbs / B, 1)

    # ---- section breakdown of the body --------------------------------- #
    # Reconstructed standalone: each section traced on the same shapes the
    # body uses, so shares are comparable (sum != total exactly — shared
    # subexpressions double-count — but ranking and rough magnitude hold).
    a = {n: x for n, x in zip(names, arrays)}
    ux, uy = float(fs.u[0]), float(fs.u[1])
    nx, ny = float(fs.n[0]), float(fs.n[1])
    ox, oy = float(fs.origin[0]), float(fs.origin[1])
    off = [float(o) for o in fs.offsets]
    L = len(off)

    def sel_off(lane):
        o = jnp.zeros_like(lane)
        for i, v in enumerate(off):
            o = jnp.where(jnp.abs(lane - i) < 0.5, v, o)
        return o

    def neigh3(px, py, lane, kind):
        s = (px - ox) * ux + (py - oy) * uy
        lat0 = (px - ox) * nx + (py - oy) * ny
        active = kind > 0.5
        col_i = jax.lax.broadcasted_iota(jnp.int32, (V, V, B), 1).astype(
            jnp.float32
        )
        row_i = jax.lax.broadcasted_iota(jnp.int32, (V, V, B), 0).astype(
            jnp.float32
        )
        not_eye = jnp.abs(row_i - col_i) > 0.5
        in_range = (-5.0 <= s) & (s < fs.length + 5.0)
        occ = in_range & active
        s_c, s_q = s[None, :, :], s[:, None, :]
        outs = []
        for q_off in (
            sel_off(lane),
            sel_off(jnp.clip(lane - 1, 0.0, L - 1.0)),
            sel_off(jnp.clip(lane + 1, 0.0, L - 1.0)),
        ):
            m = (
                jnp.abs(lat0[None, :, :] - q_off[:, None, :])
                <= fs.width / 2 + 1.0
            ) & occ[None, :, :] & not_eye
            front_ok = m & (s_q <= s_c)
            f_key = jnp.where(front_ok, s_c, 1e9)
            f_min = jnp.min(f_key, axis=1)
            f_hit = front_ok & (f_key <= f_min[:, None, :])
            f_col = jnp.min(jnp.where(f_hit, col_i, 1e9), axis=1)
            f_hot = (f_hit & (col_i <= f_col[:, None, :])).astype(jnp.float32)
            rear_ok = m & (s_c < s_q)
            r_key = jnp.where(rear_ok, s_c, -1e9)
            r_max = jnp.max(r_key, axis=1)
            r_hit = rear_ok & (r_key >= r_max[:, None, :])
            r_col = jnp.min(jnp.where(r_hit, col_i, 1e9), axis=1)
            r_hot = (r_hit & (col_i <= r_col[:, None, :])).astype(jnp.float32)
            outs.append((f_hot, r_hot))
        return outs

    fl_n, _ = _cost(neigh3, a["px"], a["py"], a["lane"], a["kind"])
    out["section_neigh_masks_x3"] = round(fl_n / B)

    n_fetch_fields = 4 + 6 + 2 * (4 + 6) + 4  # FRONT/EGO key sets, 6 rows
    def fetches(hot, fields):
        # rotate through distinct fields so XLA cannot CSE the contractions
        outs = []
        for i in range(n_fetch_fields):
            f = fields[i % len(fields)]
            outs.append(jnp.sum(hot * f[None, :, :], axis=1) + float(i))
        return outs

    hot0 = jnp.ones((V, V, B), jnp.float32)
    fl_f, _ = _cost(
        fetches, hot0,
        [a["speed"], a["target_speed"], a["px"], a["py"], a["heading"],
         a["length"], a["width"], a["timer"]],
    )
    out["section_fetch_contractions"] = round(fl_f / B)

    def abort_pairs(px, py, speed, heading, lane, target_lane):
        s = (px - ox) * ux + (py - oy) * uy
        cos_h, sin_h = jnp.cos(heading), jnp.sin(heading)
        vxv, vyv = speed * cos_h, speed * sin_h
        d_ij = s[None, :, :] - s[:, None, :]
        dv_ij = (vxv[:, None, :] - vxv[None, :, :]) * cos_h[:, None, :] + (
            vyv[:, None, :] - vyv[None, :, :]
        ) * sin_h[:, None, :]
        d_star = 10.0 + speed[:, None, :] * 1.5 + speed[:, None, :] * dv_ij / 4.0
        conflict = (
            (jnp.abs(lane[None, :, :] - target_lane[:, None, :]) > 0.5)
            & (0.0 < d_ij)
            & (d_ij < d_star)
        )
        return jnp.max(conflict.astype(jnp.float32), axis=1)

    fl_a, _ = _cost(
        abort_pairs, a["px"], a["py"], a["speed"], a["heading"], a["lane"],
        a["target_lane"],
    )
    out["section_abort_conflict"] = round(fl_a / B)

    from highwayenv_tpu.utils.math import rects_intersecting_xy_folded

    def coll(px, py, ln, wd, hd, speed, chk, colld, kind):
        active = kind > 0.5
        row_i = jax.lax.broadcasted_iota(jnp.int32, (V, V, B), 0)
        col_i = jax.lax.broadcasted_iota(jnp.int32, (V, V, B), 1)
        upper = row_i < col_i
        pair_ok = (
            upper
            & active[:, None, :] & active[None, :, :]
            & ((chk[:, None, :] > 0.5) | (chk[None, :, :] > 0.5))
            & (colld[:, None, :] > 0.5) & (colld[None, :, :] > 0.5)
        )
        dx = px[:, None, :] - px[None, :, :]
        dy = py[:, None, :] - py[None, :, :]
        dist2 = dx * dx + dy * dy
        diag = jnp.sqrt(ln**2 + wd**2)
        reach = (diag[:, None, :] + diag[None, :, :]) / 2 + speed[
            :, None, :
        ] * (1.0 / 15)
        pair_ok = pair_ok & (dist2 <= reach * reach)
        velx, vely = speed * jnp.cos(hd), speed * jnp.sin(hd)
        inter, will, tx, ty = rects_intersecting_xy_folded(
            px[:, None, :], py[:, None, :], ln[:, None, :], wd[:, None, :],
            hd[:, None, :], px[None, :, :], py[None, :, :], ln[None, :, :],
            wd[None, :, :], hd[None, :, :],
            relx=(velx[:, None, :] - velx[None, :, :]) * (1.0 / 15),
            rely=(vely[:, None, :] - vely[None, :, :]) * (1.0 / 15),
        )
        inter = inter & pair_ok
        w = (will & pair_ok).astype(jnp.float32)
        ix = 0.5 * (jnp.sum(w * tx, axis=1) - jnp.sum(w * tx, axis=0))
        iy = 0.5 * (jnp.sum(w * ty, axis=1) - jnp.sum(w * ty, axis=0))
        crash = jnp.max(inter.astype(jnp.float32), axis=1)
        return ix, iy, crash

    fl_c, _ = _cost(
        coll, a["px"], a["py"], a["length"], a["width"], a["heading"],
        a["speed"], a["check_collisions"], a["collidable"], a["kind"],
    )
    out["section_collision_full"] = round(fl_c / B)

    total_sections = fl_n + fl_f + fl_a + fl_c
    out["sections_sum"] = round(total_sections / B)
    out["sections_coverage_of_body"] = round(total_sections / flb, 3)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
