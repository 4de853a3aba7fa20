"""Batch-minor Pallas frame kernel for the straight-network fast path.

One ``pallas_call`` per simulation frame; the env batch is tiled into
``block``-wide VMEM blocks that ride the 128-lane axis, so every per-slot
field is a (V, block) vector and every pair tensor is (Vq, Vc, block) —
the layout mosaic compiles (round 1's batch-major (block, V, V) body hangs
the compiler; see BASELINE.md lever 2).

Semantics: ops/straight_fast.py::straight_frame minus the ego meta-action
(applied once per policy step outside the kernel — cheap XLA (V, B) work),
which itself matches envs/base.py::_frame on straight parallel-lane
networks.  Mosaic-specific rewrites:

- no inverse trig: cephes atan polynomial (straight_pallas._atan family)
- no integer broadcast-compares in pair space (hangs mosaic): all pair
  masks are built from f32 compares; neighbour row *fetches* use the
  one-hot hit mask (key == rowmin, first-column tie-break via a f32 iota
  min) contracted against the field vector — no integer indices at all
- bool reductions via f32 max (no i1 vector truncations)

HBM traffic per frame = 2 state transfers (the round-1 XLA path writes
one (V, V, B) intermediate per op).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from highwayenv_tpu.ops.straight_fast import StraightGeo
from highwayenv_tpu.ops.mosaic_math import _asin, _atan, _atan2_pos_x, _tan
from highwayenv_tpu.utils.math import not_zero, wrap_to_pi
from highwayenv_tpu.vehicle import controller
from highwayenv_tpu.vehicle.behavior import IDMParams
from highwayenv_tpu.vehicle.state import (
    KIND_EGO,
    KIND_IDM,
    KIND_LANDMARK,
    KIND_LINEAR,
    KIND_OBSTACLE,
    KIND_PLAIN,
    MAX_SPEED,
    MIN_SPEED,
    VehicleState,
)

F32 = jnp.float32
VEHICLE_LENGTH = 5.0

# kernel-resident fields, all (V, block); f32 throughout (flags as 0/1,
# lanes as small exact floats) so the kernel never touches int vectors.
# MUT fields change inside the frame loop; CONST fields are per-episode
# attributes the kernel only reads — they get no output refs (quarter less
# HBM/VMEM staging per call).
BM_MUT_FIELDS = [
    "px", "py", "heading", "speed", "lane", "target_lane", "target_speed",
    "timer", "crashed", "hit", "impact_pending", "impact_x", "impact_y",
    "steering", "accel",
]
BM_CONST_FIELDS = [
    "delta", "kind", "length", "width", "check_collisions", "collidable",
    "enable_lane_change", "mobil_gain", "mobil_max_braking",
    "accel_p0", "accel_p1", "accel_p2", "steer_p0", "steer_p1",
]
BM_FIELDS = BM_MUT_FIELDS + BM_CONST_FIELDS


def pack_bm(veh: VehicleState) -> list:
    """VehicleState (B, V) -> list of (V, B) f32 arrays in BM_FIELDS order."""
    f = {
        "px": veh.pos[..., 0], "py": veh.pos[..., 1],
        "heading": veh.heading, "speed": veh.speed,
        "lane": veh.lane, "target_lane": veh.target_lane,
        "target_speed": veh.target_speed, "timer": veh.timer,
        "delta": veh.delta, "kind": veh.kind,
        "length": veh.length, "width": veh.width,
        "crashed": veh.crashed, "hit": veh.hit,
        "impact_pending": veh.impact_pending,
        "impact_x": veh.impact[..., 0], "impact_y": veh.impact[..., 1],
        "check_collisions": veh.check_collisions,
        "collidable": veh.collidable,
        "enable_lane_change": veh.enable_lane_change,
        "mobil_gain": veh.mobil_gain,
        "mobil_max_braking": veh.mobil_max_braking,
        "accel_p0": veh.accel_params[..., 0],
        "accel_p1": veh.accel_params[..., 1],
        "accel_p2": veh.accel_params[..., 2],
        "steer_p0": veh.steer_params[..., 0],
        "steer_p1": veh.steer_params[..., 1],
        "steering": veh.steering, "accel": veh.accel,
    }
    return [jnp.asarray(f[n], F32).T for n in BM_FIELDS]


def unpack_bm(arrays: list, veh: VehicleState) -> VehicleState:
    f = {n: a.T for n, a in zip(BM_FIELDS, arrays)}
    return veh.replace(
        pos=jnp.stack([f["px"], f["py"]], axis=-1),
        heading=f["heading"], speed=f["speed"],
        lane=f["lane"].astype(jnp.int32),
        target_lane=f["target_lane"].astype(jnp.int32),
        target_speed=f["target_speed"], timer=f["timer"],
        crashed=f["crashed"] > 0.5, hit=f["hit"] > 0.5,
        impact_pending=f["impact_pending"] > 0.5,
        impact=jnp.stack([f["impact_x"], f["impact_y"]], axis=-1),
        steering=f["steering"], accel=f["accel"],
    )


#: rank window for the sorted banded collision pass: pairs further apart
#: than this many ranks in the per-step s-sorted layout are only checked by
#: the (cheap, conservative-exact) suffix-scan violation test, which falls
#: back to the dense SAT when any such pair could be within collision reach.
#: Sizing: the fallback is PER ENV since round 5 — an env whose flag fires
#: is gathered into a (<=128)-env patch buffer and re-run through the dense
#: kernel; only >128 simultaneously-firing envs trigger the whole-batch
#: dense re-run (round 4's behavior, which made one pile-up env cost
#: sorted + full dense for everyone).  Post-crash pile-ups pack far more
#: than 12 vehicles into the ~10 m reach window, which is why round 3's
#: W=12 whole-batch exact mode measured BELOW dense (94k vs 104k) while
#: its banded-only ceiling ran 165k; larger W trades per-diagonal work for
#: a rarer fallback.  Override with HT_SORT_W for A/B sweeps.
SORT_WINDOW = int(__import__("os").environ.get("HT_SORT_W", 12))


def _collisions_sorted_lean(f, dt, px, py, heading, speed,
                            crashed_f, pend_left, impact_x0, impact_y0,
                            ux, uy, ox, oy, W=None):
    """Banded swept-SAT collision pass for the s-sorted vehicle layout.

    The caller (``pallas_simulate_bm_sorted``) sorts the slot axis by
    longitudinal position once per policy step, so colliding pairs are
    rank-local: SAT runs only on the W nearest rank diagonals (via
    ``pltpu.roll``), each masked by the exact sphere pre-check.
    Exactness is guaranteed by construction:

    - the sphere pre-check (dist^2 <= reach^2) is the SAME gate the dense
      pass applies (road collision protocol, ops/collision.py), so a pair
      outside it contributes nothing in either formulation;
    - pairs beyond the rank window are covered by a conservative suffix
      -scan violation test returned as the 5th output (an f32 flag field):
      if ANY far-rank pair could be within the global max reach, the
      caller re-runs the whole policy step through the DENSE kernel (an
      XLA-level lax.cond in ``pallas_simulate_bm_sorted``).  The test
      over-flags but never under-flags, so banded results are exact
      whenever accepted.  Round 4 moved the fallback OUT of this kernel:
      an in-kernel `scf.if` dense branch cost ~-45% even though the flag
      NEVER fired at the headline (measured 0.0 rate over 4096 envs x 256
      steps) — mosaic allocates the VMEM union of both branches.

    Per-pair math and role assignment match the dense pass: SAT roles
    follow the lower *original* index (the ``idx`` const field carries it
    through the sort), impact contributions are +0.5t toward self /
    -0.5t toward partner (orientation is role-symmetric, see the dense
    accumulation in ``_frame_body``), and reach uses the lower-index
    member's speed exactly as road.py:477-481's list order implies.
    """
    from jax.experimental.pallas import tpu as pltpu
    from highwayenv_tpu.utils.math import rects_intersecting_xy_folded

    V, blk = px.shape
    if W is None:
        W = int(__import__("os").environ.get("HT_SORT_W", SORT_WINDOW))
    W = min(W, V - 1)
    idx = f["idx"]
    # mosaic cannot pass i1 vectors across scf.if boundaries (operands or
    # results), so everything a lax.cond branch closes over or returns is
    # kept f32 (0/1 flags); bool temporaries live only inside one branch
    act_f = jnp.where(f["kind"] > 0.5, 1.0, 0.0)
    chk_f = jnp.where(f["check_collisions"] > 0.5, 1.0, 0.0)
    coll_f = jnp.where(f["collidable"] > 0.5, 1.0, 0.0)
    pend_f = jnp.where(pend_left, 1.0, 0.0)
    length, width = f["length"], f["width"]
    diag = jnp.sqrt(length * length + width * width)
    velx = speed * jnp.cos(heading)
    vely = speed * jnp.sin(heading)
    row2 = jax.lax.broadcasted_iota(jnp.int32, (V, blk), 0).astype(F32)
    INF = jnp.float32(1e9)

    def roll_up(x, k):
        """out[r] = x[(r + k) mod V] — pltpu.roll takes only non-negative
        shifts, so the upward shift is expressed as V - k."""
        return pltpu.roll(x, V - k, 0)

    # --- conservative exact window-violation test (suffix scans) -------- #
    # flags every far-rank pair that could pass the sphere pre-check:
    # exists r' > r + W with |s_r' - s_r| <= R_max.  Uses suffix min/max of
    # s (log-doubling rolls), so a true violation always raises the flag;
    # straddling far values may over-flag (costs a dense frame, never
    # correctness).
    s_new = (px - ox) * ux + (py - oy) * uy
    is_act = act_f > 0.5
    R = jnp.max(jnp.where(is_act, diag, 0.0)) + jnp.max(
        jnp.where(is_act, speed, 0.0)
    ) * dt
    smin = jnp.where(is_act, s_new, INF)
    smax = jnp.where(is_act, s_new, -INF)
    k = 1
    while k < V:
        ok_k = row2 < float(V - k)
        smin = jnp.where(
            ok_k, jnp.minimum(smin, roll_up(smin, k)), smin
        )
        smax = jnp.where(
            ok_k, jnp.maximum(smax, roll_up(smax, k)), smax
        )
        k *= 2
    off = W + 1
    in_rng = row2 < float(V - off)
    sm = jnp.where(in_rng, roll_up(smin, off), INF)
    sx = jnp.where(in_rng, roll_up(smax, off), -INF)
    flag = is_act & (sm <= s_new + R) & (sx >= s_new - R)

    # last-written impact (PARITY #2) as a running max-key selection
    # over the diagonals: row-side = the slot writes as the reference
    # pair's `self` (lower ORIGINAL index), column-side = as `other`;
    # keys are the partner's original index, largest key wins; the
    # row side beats the column side at the end (road.py:477-481
    # write order).
    crashed = crashed_f
    pend = pend_f
    NEG = jnp.full_like(s_new, -1.0)
    best_rk, imp_rx, imp_ry = NEG, jnp.zeros_like(s_new), jnp.zeros_like(s_new)
    best_ck, imp_cx, imp_cy = NEG, jnp.zeros_like(s_new), jnp.zeros_like(s_new)
    for d in range(1, W + 1):
        px_p = roll_up(px, d)
        py_p = roll_up(py, d)
        h_p = roll_up(heading, d)
        sp_p = roll_up(speed, d)
        vx_p = roll_up(velx, d)
        vy_p = roll_up(vely, d)
        l_p = roll_up(length, d)
        w_p = roll_up(width, d)
        dg_p = roll_up(diag, d)
        chk_p = roll_up(chk_f, d)
        coll_p = roll_up(coll_f, d)
        act_p2 = roll_up(act_f, d)
        idx_p = roll_up(idx, d)
        # reach uses the lower-original-index member's speed (the
        # dense pass's q row); booleans and the toward-self MTV
        # are role-symmetric so no other swap is needed
        speed_a = jnp.where(idx > idx_p, sp_p, speed)
        reach = (diag + dg_p) / 2 + speed_a * dt
        dx = px - px_p
        dy = py - py_p
        ok = (
            (row2 < float(V - d))
            & (act_f > 0.5) & (act_p2 > 0.5)
            & ((chk_f > 0.5) | (chk_p > 0.5))
            & (coll_f > 0.5) & (coll_p > 0.5)
            & (dx * dx + dy * dy <= reach * reach)
        )
        inter, will, tx, ty = rects_intersecting_xy_folded(
            px, py, length, width, heading,
            px_p, py_p, l_p, w_p, h_p,
            relx=(velx - vx_p) * dt,
            rely=(vely - vy_p) * dt,
        )
        inter_f = jnp.where(inter & ok, 1.0, 0.0)
        wf = jnp.where(will & ok, 1.0, 0.0)
        cx = 0.5 * wf * tx
        cy = 0.5 * wf * ty
        # partner-side contributions land d ranks ahead; rows wrapped
        # by the roll carry zeros (masked by ok above)
        crashed = jnp.maximum(
            crashed, jnp.maximum(inter_f, pltpu.roll(inter_f, d, 0))
        )
        pend = jnp.maximum(pend, jnp.maximum(wf, pltpu.roll(wf, d, 0)))
        # running last-write selection (4 candidate writes per rank):
        w_r = wf > 0.5
        self_r = idx < idx_p
        m = w_r & self_r & (idx_p > best_rk)
        imp_rx = jnp.where(m, cx, imp_rx)
        imp_ry = jnp.where(m, cy, imp_ry)
        best_rk = jnp.where(m, idx_p, best_rk)
        m2 = w_r & ~self_r & (idx_p > best_ck)
        imp_cx = jnp.where(m2, cx, imp_cx)
        imp_cy = jnp.where(m2, cy, imp_cy)
        best_ck = jnp.where(m2, idx_p, best_ck)
        wf_s = pltpu.roll(wf, d, 0)
        cx_s = pltpu.roll(cx, d, 0)
        cy_s = pltpu.roll(cy, d, 0)
        idx_s = pltpu.roll(idx, d, 0)  # partner's (r row's) orig index
        w_p2 = wf_s > 0.5
        self_p = idx < idx_s
        m3 = w_p2 & self_p & (idx_s > best_rk)
        imp_rx = jnp.where(m3, -cx_s, imp_rx)
        imp_ry = jnp.where(m3, -cy_s, imp_ry)
        best_rk = jnp.where(m3, idx_s, best_rk)
        m4 = w_p2 & ~self_p & (idx_s > best_ck)
        imp_cx = jnp.where(m4, -cx_s, imp_cx)
        imp_cy = jnp.where(m4, -cy_s, imp_cy)
        best_ck = jnp.where(m4, idx_s, best_ck)
    any_row = best_rk >= 0.0
    any_col = best_ck >= 0.0
    ix = jnp.where(any_row, imp_rx, jnp.where(any_col, imp_cx, impact_x0))
    iy = jnp.where(any_row, imp_ry, jnp.where(any_col, imp_cy, impact_y0))
    viol_f = jnp.where(flag, 1.0, 0.0)
    return crashed > 0.5, pend > 0.5, ix, iy, viol_f


#: rank window for the banded NEIGHBOUR search in the sorted kernel (round
#: 5; the collision analogue is SORT_WINDOW).  The front/rear neighbour on
#: a lane is NOT distance-local, so unlike collisions the band alone can't
#: be exact — exactness comes from per-lane suffix-argmin / prefix-argmax
#: structures that answer the beyond-band part of each query in O(log V)
#: rolls, with the SAME key/tie semantics as the dense one-hot pass.  The
#: band absorbs local sort-order decay (vehicles crossing in s mid-step);
#: a query-vs-member crossing of more than this many ranks raises the
#: per-env violation flag and rides the existing dense fallback.
NEIGH_WINDOW = int(__import__("os").environ.get("HT_SORT_WN", 6))


def _neigh_banded(fs, f, s, lat0, occupiable, cos_h, sin_h, vxv, vyv,
                  lane_off, sel_off, idm, deciding, mid_change, has_linear):
    """Banded + beyond-band-exact neighbour queries for the s-sorted layout.

    Replaces the three dense ``neigh_masks`` + ``fetch`` passes (six (V,V,
    blk) mask/min/contraction pipelines — measured ~47% of the sorted
    kernel's end-to-end step time, scripts/ablate_bm_kernel.py) with
    O(W + L log V) work on (V, blk) vectors:

    - **in-band**: ranks r-W..r+W searched with the FULL dense predicates
      (lane match, occupiable, s-ordering vs the query's own s), ascending
      rank so the reference tie-breaks fall out of the update rule (front:
      non-strict min — last/largest rank wins ties, matching road.py:539's
      ``<=`` overwrite in the sorted column order; rear: strict max —
      first/smallest rank wins, road.py:543-545);
    - **beyond band**: per-lane log-doubling suffix-ARGMIN (tie -> larger
      rank) / prefix-ARGMAX (tie -> smaller rank) structures over member
      s keys carry the winner's payload directly — no order assumption on
      the decayed sort; each query selects its lane's structure shifted by
      W.  The beyond-ahead argmin is the exact front winner iff its key
      >= the query's s; the beyond-behind argmax the exact rear winner iff
      its key < s.  The remaining cases (a member more than W ranks away
      that CROSSED the query in s since the step's sort) raise the per-env
      violation flag — same exactness contract as the collision band's
      suffix-scan test, same dense-fallback consumer.
    - **flags are gated to consuming rows** (front results feed every
      uncrashed NPC's IDM via a_self; rear/candidate results only
      deciding/mid-change rows — behavior.py:229-343), so a crossing next
      to a crashed or non-deciding row costs nothing.

    Returns ``({d: (front_row, front_ex, rear_row, rear_ex)}, viol_f)``
    for d in (-1, 0, +1) query lanes, rows keyed like ``fetch``'s output
    (zero fields when absent, bitwise-matching the dense zero-row
    contract).
    """
    from jax.experimental.pallas import tpu as pltpu

    V, blk = s.shape
    Wn = min(NEIGH_WINDOW, V - 1)
    off = [float(o) for o in fs.offsets]
    L = len(off)
    tol = fs.width / 2 + 1.0
    INF = jnp.float32(1e9)
    row2 = jax.lax.broadcasted_iota(jnp.int32, (V, blk), 0).astype(F32)

    def up(x, k):
        return pltpu.roll(x, V - k, 0)

    def down(x, k):
        return pltpu.roll(x, k, 0)

    front_pl = {"s": s, "vx": vxv, "vy": vyv}
    if has_linear:
        front_pl["speed"] = f["speed"]
    rear_pl = {
        "s": s, "speed": f["speed"], "target_speed": f["target_speed"],
        "cos": cos_h, "sin": sin_h,
    }
    occ_f = jnp.where(occupiable, 1.0, 0.0)

    # --- per-lane beyond-band structures, shifted by Wn ------------------ #
    far_a, far_b = [], []
    for l in range(L):
        mem_f = occ_f * jnp.where(jnp.abs(lat0 - off[l]) <= tol, 1.0, 0.0)
        # suffix argmin over ranks > j (tie -> larger rank)
        has = jnp.where(row2 < float(V - 1), up(mem_f, 1), 0.0)
        key = jnp.where(has > 0.5, up(s, 1), INF)
        pl = {k2: up(v, 1) for k2, v in front_pl.items()}
        k = 1
        while k < V:
            vk = row2 < float(V - k)
            r_has = jnp.where(vk, up(has, k), 0.0)
            r_key = jnp.where(r_has > 0.5, up(key, k), INF)
            take = (r_has > 0.5) & (r_key <= key)
            for k2 in pl:
                pl[k2] = jnp.where(take, up(pl[k2], k), pl[k2])
            key = jnp.where(take, r_key, key)
            has = jnp.maximum(has, r_has)
            k *= 2
        vW = row2 < float(V - Wn)
        far_a.append((
            jnp.where(vW, up(has, Wn), 0.0),
            jnp.where(vW, up(key, Wn), INF),
            {k2: up(v, Wn) for k2, v in pl.items()},
        ))
        # prefix argmax over ranks < j (tie -> smaller rank)
        bhas = jnp.where(row2 >= 1.0, down(mem_f, 1), 0.0)
        bkey = jnp.where(bhas > 0.5, down(s, 1), -INF)
        bpl = {k2: down(v, 1) for k2, v in rear_pl.items()}
        k = 1
        while k < V:
            vk = row2 >= float(k)
            l_has = jnp.where(vk, down(bhas, k), 0.0)
            l_key = jnp.where(l_has > 0.5, down(bkey, k), -INF)
            take = (l_has > 0.5) & (l_key >= bkey)
            for k2 in bpl:
                bpl[k2] = jnp.where(take, down(bpl[k2], k), bpl[k2])
            bkey = jnp.where(take, l_key, bkey)
            bhas = jnp.maximum(bhas, l_has)
            k *= 2
        vWb = row2 >= float(Wn)
        far_b.append((
            jnp.where(vWb, down(bhas, Wn), 0.0),
            jnp.where(vWb, down(bkey, Wn), -INF),
            {k2: down(v, Wn) for k2, v in bpl.items()},
        ))

    # --- queries: offsets, flag gates, far selection, registers ---------- #
    lane = f["lane"]
    g_idm = jnp.where(idm, 1.0, 0.0)
    g_dm = jnp.where(deciding | mid_change, 1.0, 0.0)
    viol = jnp.zeros_like(s)
    reg = {}
    for d in (-1, 0, 1):
        if d == 0:
            q_off = lane_off
            gf = g_idm
        else:
            q_off = sel_off(jnp.clip(lane + d, 0.0, L - 1.0))
            gf = g_dm
        fa_has = jnp.zeros_like(s)
        fa_key = jnp.full_like(s, INF)
        fa_pl = {k2: jnp.zeros_like(s) for k2 in front_pl}
        fb_has = jnp.zeros_like(s)
        fb_key = jnp.full_like(s, -INF)
        fb_pl = {k2: jnp.zeros_like(s) for k2 in rear_pl}
        for l in range(L):
            m = jnp.abs(q_off - off[l]) < 0.5  # offsets are exact floats
            ah, ak, apl = far_a[l]
            fa_has = jnp.where(m, ah, fa_has)
            fa_key = jnp.where(m, ak, fa_key)
            for k2 in fa_pl:
                fa_pl[k2] = jnp.where(m, apl[k2], fa_pl[k2])
            bh, bk, bpl2 = far_b[l]
            fb_has = jnp.where(m, bh, fb_has)
            fb_key = jnp.where(m, bk, fb_key)
            for k2 in fb_pl:
                fb_pl[k2] = jnp.where(m, bpl2[k2], fb_pl[k2])
        # violation: a beyond-band member crossed the query in s — the
        # beyond-ahead argmin fell below s (it or another far member may
        # be an eligible candidate this pass can't rank), or the beyond-
        # behind argmax reached s (ditto).  Both front and rear answers
        # of this query are then unsafe; gf covers both consumers
        # (rear consumers are a subset of front consumers per query).
        crossed = ((fa_has > 0.5) & (fa_key < s)) | (
            (fb_has > 0.5) & (fb_key >= s)
        )
        viol = jnp.maximum(viol, gf * jnp.where(crossed, 1.0, 0.0))
        # rear register starts from the far-behind winner (smallest ranks;
        # in-band strict > updates preserve its tie priority)
        cond_fb = (fb_has > 0.5) & (fb_key < s)
        reg[d] = {
            "q_off": q_off,
            "fr_found": jnp.zeros_like(s),
            "fr_key": jnp.full_like(s, INF),
            "fr_pl": {k2: jnp.zeros_like(s) for k2 in front_pl},
            "rr_found": jnp.where(cond_fb, 1.0, 0.0),
            "rr_key": jnp.where(cond_fb, fb_key, -INF),
            "rr_pl": {
                k2: jnp.where(cond_fb, fb_pl[k2], 0.0) for k2 in rear_pl
            },
            "fa": (fa_has, fa_key, fa_pl),
        }

    # --- in-band search, ascending rank ---------------------------------- #
    for dd in list(range(-Wn, 0)) + list(range(1, Wn + 1)):
        if dd < 0:
            shift, valid = (
                lambda x, k=-dd: down(x, k),
                row2 >= float(-dd),
            )
        else:
            shift, valid = (
                lambda x, k=dd: up(x, k),
                row2 < float(V - dd),
            )
        base = jnp.where(valid, shift(occ_f), 0.0) > 0.5
        lat_p = shift(lat0)
        s_p = shift(s)
        sp_p = shift(f["speed"])
        ts_p = shift(f["target_speed"])
        cos_p = shift(cos_h)
        sin_p = shift(sin_h)
        vx_p = shift(vxv)
        vy_p = shift(vyv)
        pl_front = {"s": s_p, "vx": vx_p, "vy": vy_p}
        if has_linear:
            pl_front["speed"] = sp_p
        pl_rear = {
            "s": s_p, "speed": sp_p, "target_speed": ts_p,
            "cos": cos_p, "sin": sin_p,
        }
        for d in (-1, 0, 1):
            r = reg[d]
            mm = base & (jnp.abs(lat_p - r["q_off"]) <= tol)
            fcond = mm & (s_p >= s) & (s_p <= r["fr_key"])
            for k2 in r["fr_pl"]:
                r["fr_pl"][k2] = jnp.where(fcond, pl_front[k2], r["fr_pl"][k2])
            r["fr_key"] = jnp.where(fcond, s_p, r["fr_key"])
            r["fr_found"] = jnp.maximum(
                r["fr_found"], jnp.where(fcond, 1.0, 0.0)
            )
            rcond = mm & (s_p < s) & (s_p > r["rr_key"])
            for k2 in r["rr_pl"]:
                r["rr_pl"][k2] = jnp.where(rcond, pl_rear[k2], r["rr_pl"][k2])
            r["rr_key"] = jnp.where(rcond, s_p, r["rr_key"])
            r["rr_found"] = jnp.maximum(
                r["rr_found"], jnp.where(rcond, 1.0, 0.0)
            )

    # --- merge far-ahead (largest ranks last: non-strict <= wins ties) --- #
    rows = {}
    for d in (-1, 0, 1):
        r = reg[d]
        fa_has, fa_key, fa_pl = r["fa"]
        cond_fa = (fa_has > 0.5) & (fa_key >= s) & (fa_key <= r["fr_key"])
        for k2 in r["fr_pl"]:
            r["fr_pl"][k2] = jnp.where(cond_fa, fa_pl[k2], r["fr_pl"][k2])
        r["fr_found"] = jnp.maximum(r["fr_found"], jnp.where(cond_fa, 1.0, 0.0))
        front_row = dict(r["fr_pl"])
        front_ex = r["fr_found"] > 0.5
        rear_row = dict(r["rr_pl"])
        rear_ex = r["rr_found"] > 0.5
        rear_row["is_vehicle"] = rear_ex  # lean: every member is a vehicle
        rows[d] = (front_row, front_ex, rear_row, rear_ex)
    return rows, viol


def _frame_body(fs: StraightGeo, p: IDMParams, dt: float, raw_controls: bool,
                lean: bool, has_linear: bool, sorted_mode: bool,
                f: dict) -> dict:
    """One frame on (V, blk) f32 fields.  Pair tensors are (Vq, Vc, blk).

    ``lean``: scene statically contains only vehicles (no obstacles or
    landmarks — true for the straight highway family, whose resets spawn
    vehicles exclusively), eliding the solidity/landmark pair logic.
    ``has_linear``: LinearVehicle NPCs possible (config
    other_vehicles_type); else the linear accel/steer branches and the
    front-speed fetch are elided."""
    V = f["px"].shape[0]
    L = len(fs.offsets)
    off = [float(o) for o in fs.offsets]
    ux, uy = float(fs.u[0]), float(fs.u[1])
    nx, ny = float(fs.n[0]), float(fs.n[1])
    ox, oy = float(fs.origin[0]), float(fs.origin[1])
    blk = f["px"].shape[1]

    kind = f["kind"]  # f32 enum
    crashed = f["crashed"] > 0.5
    active = kind > 0.5
    if lean:
        is_controlled = active
        is_linear = (
            jnp.abs(kind - KIND_LINEAR) < 0.5
            if has_linear
            else jnp.zeros_like(active)
        )
        idm = active & (kind > KIND_EGO + 0.5) & ~crashed
    else:
        is_vehicle = (kind > KIND_EGO - 0.5) & (kind < KIND_PLAIN + 0.5)
        is_controlled = (kind > KIND_EGO - 0.5) & (kind < KIND_LINEAR + 0.5)
        is_linear = jnp.abs(kind - KIND_LINEAR) < 0.5
        idm = ((jnp.abs(kind - KIND_IDM) < 0.5) | is_linear) & ~crashed

    s = (f["px"] - ox) * ux + (f["py"] - oy) * uy        # (V, blk)
    lat0 = (f["px"] - ox) * nx + (f["py"] - oy) * ny

    # f32 row/col ids for eye masks and tie-breaks (mosaic: int iota only,
    # convert immediately)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (V, V, blk), 0).astype(F32)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (V, V, blk), 1).astype(F32)
    not_eye = jnp.abs(row_i - col_i) > 0.5

    in_range = (-VEHICLE_LENGTH <= s) & (s < fs.length + VEHICLE_LENGTH)
    if lean:
        is_vehicle = active
        occupiable = in_range & active
    else:
        occupiable = in_range & active & (jnp.abs(kind - KIND_LANDMARK) > 0.5)

    def sel_off(lane):
        out = jnp.zeros_like(lane)
        for l, v in enumerate(off):
            out = jnp.where(jnp.abs(lane - l) < 0.5, v, out)
        return out

    lane_off = sel_off(f["lane"])

    # --- pair machinery ---------------------------------------------------- #
    s_c = s[None, :, :]          # column vehicle longitudinal
    s_q = s[:, None, :]          # query row longitudinal
    occ_c = occupiable[None, :, :]
    lat_c = lat0[None, :, :]

    BIG = 1e9

    def neigh_masks(query_off):
        """front/rear one-hot pair masks + existence for a (V, blk) query
        lane offset.  Ties (road.py:539-545, PARITY #3): front keeps the
        LAST equally-distant column (the reference's ``<=`` overwrites),
        rear the first (strict ``>``) — matching the XLA paths."""
        m = (
            (jnp.abs(lat_c - query_off[:, None, :]) <= fs.width / 2 + 1.0)
            & occ_c & not_eye
        )
        front_ok = m & (s_q <= s_c)
        f_key = jnp.where(front_ok, s_c, BIG)
        f_min = jnp.min(f_key, axis=1)                     # (V, blk)
        f_hit = front_ok & (f_key <= f_min[:, None, :])
        # last column among ties
        f_col = jnp.max(jnp.where(f_hit, col_i, -BIG), axis=1)
        f_hot = (f_hit & (col_i >= f_col[:, None, :])).astype(F32)
        front_ex = f_min < BIG

        rear_ok = m & (s_c < s_q)
        r_key = jnp.where(rear_ok, s_c, -BIG)
        r_max = jnp.max(r_key, axis=1)
        r_hit = rear_ok & (r_key >= r_max[:, None, :])
        r_col = jnp.min(jnp.where(r_hit, col_i, BIG), axis=1)
        r_hot = (r_hit & (col_i <= r_col[:, None, :])).astype(F32)
        rear_ex = r_max > -BIG
        return f_hot, front_ex, r_hot, rear_ex

    cos_h = jnp.cos(f["heading"])
    sin_h = jnp.sin(f["heading"])
    vxv = f["speed"] * cos_h
    vyv = f["speed"] * sin_h

    fetch_fields = {
        "speed": f["speed"], "target_speed": f["target_speed"], "s": s,
        "vx": vxv, "vy": vyv, "cos": cos_h, "sin": sin_h,
        "is_vehicle": is_vehicle.astype(F32),
    }

    # accel_pair reads only these fields per role: the "ego" row of a pair
    # uses its speed/target/cos/sin/s/is_vehicle, the "front" row only
    # s/vx/vy/speed — fetching the minimal set saves one (V,V,blk)
    # mul+reduce contraction per skipped field
    EGO_KEYS = ("speed", "target_speed", "s", "cos", "sin", "is_vehicle")
    FRONT_KEYS = ("speed", "s", "vx", "vy") if has_linear else ("s", "vx", "vy")

    def fetch(hot, keys=None):
        """Contract a one-hot (Vq, Vc, blk) mask against selected fields."""
        out = {}
        for k in keys or fetch_fields.keys():
            out[k] = jnp.sum(hot * fetch_fields[k][None, :, :], axis=1)
        if "is_vehicle" in out:
            out["is_vehicle"] = out["is_vehicle"] > 0.5
        return out

    self_row = dict(fetch_fields)
    self_row["is_vehicle"] = is_vehicle

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
        if has_linear:
            vt = ego_ts_raw - ego_speed
            d_safe = p.distance_wanted + jnp.maximum(ego_speed, 0.0) * 2.5
            dv_raw = jnp.minimum(fr["speed"] - ego_speed, 0.0)
            dp = jnp.minimum(d - d_safe, 0.0)
            acc_lin = (
                f["accel_p0"] * vt
                + f["accel_p1"] * jnp.where(fr_ex, dv_raw, 0.0)
                + f["accel_p2"] * jnp.where(fr_ex, dp, 0.0)
            )
            acc = jnp.where(is_linear, acc_lin, acc)
        return jnp.where(ego_ex & eg["is_vehicle"], acc, 0.0)

    T = jnp.ones_like(crashed)

    # HT_ABLATE_UNSAFE: timing-only section ablation for
    # scripts/ablate_bm_kernel.py — BREAKS SEMANTICS, never set in
    # production.  "neigh": zero out the neighbour mask/fetch machinery;
    # "abort": skip the abort-on-conflict pair pass; comma-combinable.
    _ablate = __import__("os").environ.get("HT_ABLATE_UNSAFE", "").split(",")
    if "neigh" in _ablate:
        zrow = {
            k: (jnp.zeros_like(s) > 0.5 if k == "is_vehicle"
                else jnp.zeros_like(s))
            for k in fetch_fields
        }
        zex = jnp.zeros_like(s) > 0.5

        def neigh_masks(query_off):  # noqa: F811 — deliberate shadow
            zhot = jnp.zeros_like(s)[:, None, :] * jnp.zeros_like(s)[None, :, :]
            return zhot, zex, zhot, zex

        def fetch(hot, keys=None):  # noqa: F811 — deliberate shadow
            return {k: zrow[k] for k in (keys or fetch_fields.keys())}

    mid_change = jnp.abs(f["lane"] - f["target_lane"]) > 0.5
    # do_every(delay, timer): delay < timer (utils/math.py:42-43)
    tick = f["timer"] > p.lane_change_delay
    deciding = idm & ~mid_change & tick & (f["enable_lane_change"] > 0.5)
    new_timer = jnp.where(deciding, 0.0, f["timer"])
    moving = jnp.abs(f["speed"]) >= 1.0

    # banded neighbour pass (round 5): default on the sorted lean path,
    # HT_SORT_DENSE_NEIGH=1 restores the dense (V,V,blk) mask machinery
    _banded = (
        sorted_mode and lean and "neigh" not in _ablate
        and __import__("os").environ.get("HT_SORT_DENSE_NEIGH", "0") != "1"
    )
    viol_neigh = None
    if _banded:
        nrows, viol_neigh = _neigh_banded(
            fs, f, s, lat0, occupiable, cos_h, sin_h, vxv, vyv,
            lane_off, sel_off, idm, deciding, mid_change, has_linear,
        )
        row_op, op_ex, row_of, of_ex = nrows[0]
    else:
        op_hot, op_ex, of_hot, of_ex = neigh_masks(lane_off)
        row_op = fetch(op_hot, FRONT_KEYS)
        row_of = fetch(of_hot, EGO_KEYS)
    a_self = accel_pair(self_row, T, row_op, op_ex)

    a_of = accel_pair(row_of, of_ex, self_row, T)
    a_of_pred = accel_pair(row_of, of_ex, row_op, op_ex)

    target = f["target_lane"]
    np_front = {}  # d -> (hot|row, ex) of the candidate-lane front neighbour
    for d in (-1, 1):
        cand = jnp.clip(f["lane"] + d, 0.0, L - 1.0)
        exists = (f["lane"] + d >= -0.5) & (f["lane"] + d < L - 0.5)
        cand_off = sel_off(cand)
        if _banded:
            row_np, np_ex, row_nf, nf_ex = nrows[d]
            np_front[d] = (row_np, np_ex)
        else:
            np_hot, np_ex, nf_hot, nf_ex = neigh_masks(cand_off)
            np_front[d] = (np_hot, np_ex)
            row_np = fetch(np_hot, FRONT_KEYS)
            row_nf = fetch(nf_hot, EGO_KEYS)
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

    # abort-on-conflict (behavior.py:229-243)
    if "abort" in _ablate:  # timing-only, see HT_ABLATE_UNSAFE above
        pass
    else:
        d_ij = s_c - s_q
        dv_ij = (vxv[:, None, :] - vxv[None, :, :]) * cos_h[:, None, :] + (
            vyv[:, None, :] - vyv[None, :, :]
        ) * sin_h[:, None, :]
        ab = -p.comfort_acc_max * p.comfort_acc_min
        d_star_ij = (
            p.distance_wanted
            + f["speed"][:, None, :] * p.time_wanted
            + f["speed"][:, None, :] * dv_ij / (2 * jnp.sqrt(ab))
        )
        conflict = (
            not_eye
            & (is_controlled.astype(F32)[None, :, :] > 0.5)
            & (
                jnp.abs(f["lane"][None, :, :] - f["target_lane"][:, None, :])
                > 0.5
            )
            & (
                jnp.abs(
                    f["target_lane"][None, :, :] - f["target_lane"][:, None, :]
                )
                < 0.5
            )
            & (0.0 < d_ij)
            & (d_ij < d_star_ij)
        )
        abort = idm & mid_change & (
            jnp.max(conflict.astype(F32), axis=1) > 0.5
        )
        target = jnp.where(abort, f["lane"], target)

    # --- low-level controls ------------------------------------------------ #
    new_tgt_off = sel_off(target)
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
    steer_pc = _atan2_pos_x(2 * sin_slip, cos_slip)
    # steering_from_coords clips at the source (controller.py:145-187),
    # so the ego branch below must see the CLIPPED value too — the ego
    # saturates this bound when turning onto a new edge at low speed
    steer_pc = jnp.clip(
        steer_pc, -controller.MAX_STEERING_ANGLE,
        controller.MAX_STEERING_ANGLE,
    )
    feat_h = (
        wrap_to_pi(fs.theta - f["heading"]) * f["length"] / not_zero(f["speed"])
    )
    feat_lat = -lat_t * f["length"] / (not_zero(f["speed"]) ** 2)
    if has_linear:
        steer_lin = f["steer_p0"] * feat_h + f["steer_p1"] * feat_lat
        steering = jnp.where(is_linear, steer_lin, steer_pc)
    else:
        steering = steer_pc
    steering = jnp.clip(
        steering, -controller.MAX_STEERING_ANGLE, controller.MAX_STEERING_ANGLE
    )

    # dual-lane IDM while mid-change.  target is always within one lane of
    # the current lane (MOBIL moves one lane at a time and re-localization
    # tracks it), so the target-lane front neighbour is one of the three
    # already-computed queries — select per row instead of a 4th mask pass.
    mid = jnp.abs(f["lane"] - target) > 0.5
    d_t = target - f["lane"]  # in {-1, 0, +1}
    # bool select via logic ops (mosaic cannot lower i1-operand selects)
    is0 = jnp.abs(d_t) < 0.5
    ism = d_t < -0.5
    npt_ex = (
        (is0 & op_ex)
        | (ism & np_front[-1][1])
        | (~is0 & ~ism & np_front[1][1])
    )
    if _banded:
        # np_front holds fetched rows — select per row, no pair select
        row_npt = {
            k: jnp.where(
                is0, row_op[k],
                jnp.where(ism, np_front[-1][0][k], np_front[1][0][k]),
            )
            for k in FRONT_KEYS
        }
    else:
        d_t3 = d_t[:, None, :]
        npt_hot = jnp.where(
            jnp.abs(d_t3) < 0.5,
            op_hot,
            jnp.where(d_t3 < 0, np_front[-1][0], np_front[1][0]),
        )
        row_npt = fetch(npt_hot, FRONT_KEYS)
    a_t = accel_pair(self_row, T, row_npt, npt_ex)
    accel = jnp.where(mid, jnp.minimum(a_self, a_t), a_self)
    accel = jnp.clip(accel, -p.acc_max, p.acc_max)

    is_ego = jnp.abs(kind - KIND_EGO) < 0.5
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

    # --- integrate (vehicle/kinematics.py:130-168) ------------------------- #
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
    pend = f["impact_pending"] > 0.5
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
    # logic ops, not a select: mosaic cannot lower i1-operand selects
    crashed_f = ((mv & new_crashed) | (~mv & crashed)).astype(F32)
    impact_x = jnp.where(mv, 0.0, f["impact_x"])
    impact_y = jnp.where(mv, 0.0, f["impact_y"])
    pend_left = pend & ~mv
    timer = jnp.where(mv, new_timer + dt, new_timer)

    # --- re-localization --------------------------------------------------- #
    lat0_new = (px - ox) * nx + (py - oy) * ny
    new_lane = jnp.zeros_like(f["lane"])
    best_d = jnp.abs(lat0_new - off[0])
    for l in range(1, L):
        d_l = jnp.abs(lat0_new - off[l])
        better = d_l < best_d
        new_lane = jnp.where(better, float(l), new_lane)
        best_d = jnp.where(better, d_l, best_d)
    lane = jnp.where(mv, new_lane, f["lane"])

    # --- collisions (sphere pre-check + swept SAT, ops/collision.py) ------- #
    from highwayenv_tpu.utils.math import rects_intersecting_xy_folded

    if lean and sorted_mode:
        crashed_b, pend_b, impact_x, impact_y, viol_f = (
            _collisions_sorted_lean(
                f, dt, px, py, heading, speed,
                crashed_f, pend_left, impact_x, impact_y, ux, uy, ox, oy,
            )
        )
        out = dict(f)
        out.update(
            px=px, py=py, heading=heading, speed=speed, lane=lane,
            target_lane=target, timer=timer,
            crashed=crashed_b.astype(F32), hit=f["hit"],
            impact_pending=pend_b.astype(F32),
            impact_x=impact_x, impact_y=impact_y,
            steering=new_steer, accel=new_accel,
            # sticky window-violation flag across the step's frames: any
            # flagged frame invalidates the banded step (the caller then
            # re-runs it densely).  Since round 5 the neighbour band's
            # crossing flag feeds the same field.
            viol=jnp.maximum(
                f["viol"],
                viol_f if viol_neigh is None
                else jnp.maximum(viol_f, viol_neigh),
            ),
        )
        return out

    upper = row_i < col_i
    if lean:
        chk_q = f["check_collisions"][:, None, :] > 0.5
        chk_c = f["check_collisions"][None, :, :] > 0.5
        pair_ok = (
            upper
            & active[:, None, :] & active[None, :, :]
            & (chk_q | chk_c)
            & (f["collidable"][:, None, :] > 0.5)
            & (f["collidable"][None, :, :] > 0.5)
        )
    else:
        kind_q = kind[:, None, :]
        kind_c = kind[None, :, :]
        veh_q = (kind_q > KIND_EGO - 0.5) & (kind_q < KIND_PLAIN + 0.5)
        veh_c = (kind_c > KIND_EGO - 0.5) & (kind_c < KIND_PLAIN + 0.5)
        chk_q = f["check_collisions"][:, None, :] > 0.5
        chk_c = f["check_collisions"][None, :, :] > 0.5
        pair_ok = (
            upper
            & (kind_q > 0.5) & (kind_c > 0.5)
            & (veh_q | veh_c)
            & (chk_q | chk_c)
            & (f["collidable"][:, None, :] > 0.5)
            & (f["collidable"][None, :, :] > 0.5)
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

    def anyf(x, axis):
        return jnp.max(x.astype(F32), axis=axis) > 0.5

    if lean:
        # vehicle-vehicle only: both solid, impact +/-0.5 of the LAST
        # -written pair (objects.py:104-111 assigns; loop order
        # road.py:477-481 makes that the max-index row-side partner if the
        # slot writes as `self`, else the max-index column-side partner —
        # PARITY #2, resolved round 4)
        w = will
        last_c = jnp.max(jnp.where(w, col_i, -1.0), axis=1)  # (V, blk)
        last_q = jnp.max(jnp.where(w, row_i, -1.0), axis=0)
        sel_row = w & (col_i >= last_c[:, None, :])
        sel_col = w & (row_i >= last_q[None, :, :])
        imp_row_x = jnp.sum(jnp.where(sel_row, 0.5 * tx, 0.0), axis=1)
        imp_row_y = jnp.sum(jnp.where(sel_row, 0.5 * ty, 0.0), axis=1)
        imp_col_x = jnp.sum(jnp.where(sel_col, -0.5 * tx, 0.0), axis=0)
        imp_col_y = jnp.sum(jnp.where(sel_col, -0.5 * ty, 0.0), axis=0)
        any_row = last_c >= 0.0
        any_col = last_q >= 0.0
        impact_x = jnp.where(
            any_row, imp_row_x, jnp.where(any_col, imp_col_x, impact_x)
        )
        impact_y = jnp.where(
            any_row, imp_row_y, jnp.where(any_col, imp_col_y, impact_y)
        )
        impact_pending = pend_left | any_row | any_col
        crashed_out = (
            (crashed_f > 0.5) | anyf(inter, 1) | anyf(inter, 0)
        )
        hit = f["hit"] > 0.5
    else:
        solid_q = (kind_q > 0.5) & (jnp.abs(kind_q - KIND_LANDMARK) > 0.5)
        solid_c = (kind_c > 0.5) & (jnp.abs(kind_c - KIND_LANDMARK) > 0.5)
        both = solid_q & solid_c
        obst_q = jnp.abs(kind_q - KIND_OBSTACLE) < 0.5
        obst_c = jnp.abs(kind_c - KIND_OBSTACLE) < 0.5
        w = will & both
        neither = ~obst_q & ~obst_c
        coef_q = jnp.where(w & obst_c, 1.0, jnp.where(w & neither, 0.5, 0.0))
        coef_c = jnp.where(w & obst_q, 1.0, jnp.where(w & neither, -0.5, 0.0))
        # last-written impact (PARITY #2): max-index row-side writing pair
        # wins, else max-index column-side, else the carried value
        write_q = w & ~obst_q
        write_c = w & ~obst_c
        last_c = jnp.max(jnp.where(write_q, col_i, -1.0), axis=1)
        last_q = jnp.max(jnp.where(write_c, row_i, -1.0), axis=0)
        sel_row = write_q & (col_i >= last_c[:, None, :])
        sel_col = write_c & (row_i >= last_q[None, :, :])
        imp_row_x = jnp.sum(jnp.where(sel_row, coef_q * tx, 0.0), axis=1)
        imp_row_y = jnp.sum(jnp.where(sel_row, coef_q * ty, 0.0), axis=1)
        imp_col_x = jnp.sum(jnp.where(sel_col, coef_c * tx, 0.0), axis=0)
        imp_col_y = jnp.sum(jnp.where(sel_col, coef_c * ty, 0.0), axis=0)
        any_row = last_c >= 0.0
        any_col = last_q >= 0.0
        impact_x = jnp.where(
            any_row, imp_row_x, jnp.where(any_col, imp_col_x, impact_x)
        )
        impact_y = jnp.where(
            any_row, imp_row_y, jnp.where(any_col, imp_col_y, impact_y)
        )
        impact_pending = pend_left | any_row | any_col
        crash_pair = inter & both
        crashed_out = (
            (crashed_f > 0.5) | anyf(crash_pair, 1) | anyf(crash_pair, 0)
        )
        hit_pair_q = inter & ~solid_q
        hit_pair_c = inter & ~solid_c
        hit = (f["hit"] > 0.5) | anyf(hit_pair_q, 1) | anyf(hit_pair_c, 0)

    out = dict(f)
    out.update(
        px=px, py=py, heading=heading, speed=speed, lane=lane,
        target_lane=target, timer=timer,
        crashed=crashed_out.astype(F32), hit=hit.astype(F32),
        impact_pending=impact_pending.astype(F32),
        impact_x=impact_x, impact_y=impact_y,
        steering=new_steer, accel=new_accel,
    )
    return out


def build_pallas_frame(
    env,
    block: int = 128,
    interpret: bool = False,
    vmem_limit_mb: int = int(__import__("os").environ.get("HT_PALLAS_VMEM_MB", 100)),
    frames: int = 1,
    sorted_mode: bool = False,
):
    """Returns frame(arrays) -> arrays running ONE frame as a pallas_call
    over (V, B) f32 state arrays (BM_FIELDS order).

    ``vmem_limit_mb`` raises mosaic's scoped-VMEM cap (default 16 MB): the
    kernel's (V, V, block) pair working set is ~50 MB at block=128 and the
    whole point is keeping it VMEM-resident.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    fs = env._straight
    p = env.idm_params
    dt = env.dt
    raw = getattr(env.action_type, "stores_raw_controls", False)
    # straight-network resets spawn vehicles only (highway family):
    # obstacle/landmark logic elides; linear branches only when the NPC
    # type is a Linear preset (BaseEnv._NPC_PRESETS)
    lean = bool(getattr(env, "pallas_lean", True))
    npc = env.config.get("other_vehicles_type", "").rsplit(".", 1)[-1]
    has_linear = npc in getattr(env, "_NPC_PRESETS", {})
    body = functools.partial(
        _frame_body, fs, p, dt, raw, lean, has_linear, sorted_mode
    )
    # sorted mode threads two extras: the window-violation flag as an
    # additional MUT field (sticky-OR across frames, zero-initialized by
    # the caller) and the original-index const `idx`.  Mut fields stay a
    # prefix of `fields` so the in-place aliasing map stays {i: i}.
    mut_fields = BM_MUT_FIELDS + (["viol"] if sorted_mode else [])
    fields = (
        mut_fields + BM_CONST_FIELDS + (["idx"] if sorted_mode else [])
    )
    const_fields = BM_CONST_FIELDS + (["idx"] if sorted_mode else [])
    n = len(fields)

    n_mut = len(mut_fields)

    def kernel(*refs):
        f = {name: r[:] for name, r in zip(fields, refs[:n])}
        if frames == 1:
            out = body(f)
        else:
            # whole policy step VMEM-resident: no HBM round trip per frame.
            # the loop carry holds only the mutated fields
            consts = {name: f[name] for name in const_fields}

            def step(_i, mut):
                return {
                    name: body({**mut, **consts})[name]
                    for name in mut_fields
                }

            mut0 = {name: f[name] for name in mut_fields}
            out = jax.lax.fori_loop(0, frames, step, mut0)
        for name, r in zip(mut_fields, refs[n:]):
            r[:] = out[name]

    def frame(arrays):
        V, B = arrays[0].shape
        grid = (B // block,)
        spec = lambda: pl.BlockSpec(
            (V, block), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        mut_out = pl.pallas_call(
            kernel,
            out_shape=[
                jax.ShapeDtypeStruct((V, B), F32) for _ in range(n_mut)
            ],
            grid=grid,
            in_specs=[spec() for _ in range(n)],
            out_specs=[spec() for _ in range(n_mut)],
            # in-place state update: halves the HBM footprint and keeps the
            # scan carry out of scoped VMEM
            input_output_aliases={i: i for i in range(n_mut)},
            compiler_params=None
            if interpret
            else pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_mb * 1024 * 1024
            ),
            interpret=interpret,
        )(*arrays)
        return list(mut_out) + list(arrays[n_mut:])

    return frame


def build_sort_kernels(env, block: int = 128, interpret: bool = False):
    """Two small pallas_calls bracketing the sorted frames kernel:

    - ``sort_fn(arrays)``: stable s-rank permute of all BM_FIELDS to the
      sorted layout + the original-index ``idx`` field (appended last);
    - ``unsort_fn(mut_arrays, idx)``: inverse permute of the mutated
      fields back to the original slot order.

    They replace round 3's XLA-side one-hot einsums over ~30 stacked
    (B, V) fields — the measured overhead that made the sorted kernel a
    net -10% — with VPU mask-reduce contractions.  They are SEPARATE
    pallas_calls (not fused into the frames kernel) because mosaic's
    VMEM accounting sums the sort products, the banded frame set AND the
    dense-fallback cond branch when they share one kernel: measured
    220 MB of the 128 MB capacity.  The extra HBM round trip is ~75 MB/s
    of traffic per step at B=4096 — noise against the 15-frame kernel.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    fs = env._straight
    ux, uy = float(fs.u[0]), float(fs.u[1])
    ox, oy = float(fs.origin[0]), float(fs.origin[1])
    n = len(BM_FIELDS)
    n_mut = len(BM_MUT_FIELDS)
    ipx = BM_FIELDS.index("px")
    ipy = BM_FIELDS.index("py")

    def sort_kernel(*refs):
        ins, outs = refs[:n], refs[n:]
        px, py = ins[ipx][:], ins[ipy][:]
        V, blk = px.shape
        s = (px - ox) * ux + (py - oy) * uy
        row3 = jax.lax.broadcasted_iota(jnp.int32, (V, V, blk), 0).astype(F32)
        col3 = jax.lax.broadcasted_iota(jnp.int32, (V, V, blk), 1).astype(F32)
        s_q, s_c = s[:, None, :], s[None, :, :]
        # stable ascending rank: count of strictly-smaller s, ties by index
        before = (s_c < s_q) | ((s_c == s_q) & (col3 < row3))
        rank = jnp.sum(jnp.where(before, 1.0, 0.0), axis=1)  # (V, blk)
        P = jnp.where(row3 == rank[None, :, :], 1.0, 0.0)  # (rank, slot)
        for k in range(n):
            outs[k][:] = jnp.sum(P * ins[k][:][None, :, :], axis=1)
        outs[n][:] = jnp.sum(P * col3, axis=1)  # original index per rank

    def unsort_kernel(*refs):
        ins, outs = refs[: n_mut + 1], refs[n_mut + 1:]
        idx_sorted = ins[n_mut][:]
        V, blk = idx_sorted.shape
        row3 = jax.lax.broadcasted_iota(jnp.int32, (V, V, blk), 0).astype(F32)
        inv_hot = jnp.where(idx_sorted[None, :, :] == row3, 1.0, 0.0)
        for k in range(n_mut):
            outs[k][:] = jnp.sum(inv_hot * ins[k][:][None, :, :], axis=1)

    def _call(kernel, n_in, n_out, arrays):
        V, B = arrays[0].shape
        grid = (B // block,)
        spec = lambda: pl.BlockSpec(
            (V, block), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            kernel,
            out_shape=[
                jax.ShapeDtypeStruct((V, B), F32) for _ in range(n_out)
            ],
            grid=grid,
            in_specs=[spec() for _ in range(n_in)],
            out_specs=[spec() for _ in range(n_out)],
            # ~30 (V, block) ins+outs plus the (V, V, block) permute
            # products exceed the 16 MB default scoped-VMEM (measured
            # 20.2 MB at V=51, block=128)
            compiler_params=None
            if interpret
            else pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
            interpret=interpret,
        )(*arrays)

    def sort_fn(arrays):
        return _call(sort_kernel, n, n + 1, list(arrays))

    def unsort_fn(mut_arrays, idx):
        return _call(
            unsort_kernel, n_mut + 1, n_mut, list(mut_arrays) + [idx]
        )

    return sort_fn, unsort_fn


def pallas_simulate_bm_sorted(
    env, veh: VehicleState, slot_actions, frames: int,
    block: int = 128, interpret: bool = False, return_viol: bool = False,
) -> VehicleState:
    """Policy-step simulation with the s-sorted slot layout: ego meta-action
    in XLA, then a Pallas sort kernel, all frames in the VMEM-resident
    megakernel — whose collision pass is banded over rank diagonals
    (``_collisions_sorted_lean``), collapsing the dense (V, V, blk) SAT to
    W reach-gated (V, blk) diagonals — and a Pallas unsort kernel.

    Round-4 rebuild vs the round-3 -10% version: permutes are VPU
    mask-reduce pallas kernels instead of XLA one-hot einsums, the W
    per-diagonal `scf.if`s are gone (all diagonals always compute), and
    the exactness fallback moved OUT of the kernel: the kernel emits a
    sticky per-env window-violation flag and an XLA-level ``lax.cond``
    re-runs ONLY the firing envs through the dense kernel (gather/patch/
    scatter, one 128-env buffer; whole-batch re-run only past 128
    simultaneous violations) — measured 0.0 rate under random policy, and
    the per-env patch bounds the crash-heavy-policy cost (round 5); an
    in-kernel fallback branch would cost ~-45% just by existing (mosaic
    allocates the VMEM union of cond branches)."""
    ego_mask = veh.kind == KIND_EGO
    veh = env.action_type.apply(env.geo, veh, ego_mask, slot_actions)

    key = (id(env), block, interpret, frames, "sorted")
    cache = _FRAME_CACHE
    if key not in cache:
        sort_fn, unsort_fn = build_sort_kernels(
            env, block=block, interpret=interpret
        )
        frame_fn = build_pallas_frame(
            env, block=block, interpret=interpret, frames=frames,
            sorted_mode=True,
        )
        cache[key] = (sort_fn, frame_fn, unsort_fn)
    sort_fn, frame_fn, unsort_fn = cache[key]
    srt = sort_fn(pack_bm(veh))
    n_mut = len(BM_MUT_FIELDS)
    # kernel field order: mut | viol (zero-init) | const | idx
    viol0 = jnp.zeros_like(srt[0])
    ins = (
        list(srt[:n_mut]) + [viol0]
        + list(srt[n_mut:len(BM_FIELDS)]) + [srt[-1]]
    )
    out = frame_fn(ins)
    # per-ENV sticky violation flags: the (V, B) flag field columns are
    # independent (env b's flag only ever reads env b's state), so a
    # firing env can be re-run dense in isolation
    env_viol = jnp.max(out[n_mut], axis=0) > 0.5  # (B,)
    n_viol = jnp.sum(env_viol.astype(jnp.int32))
    mut = unsort_fn(out[:n_mut], srt[-1])
    # unpack_bm reads only the mutated fields; the const tail (still in
    # sorted layout) is ignored — veh.replace keeps the originals
    banded_veh = unpack_bm(
        list(mut) + list(out[n_mut + 1: n_mut + 1 + len(BM_CONST_FIELDS)]),
        veh,
    )
    # Exactness fallback, de-cliffed (round 5): instead of re-running the
    # ENTIRE batch dense when any env fires (round 4's whole-batch cliff:
    # one pile-up cost sorted + full dense every step), gather up to one
    # 128-env block of firing envs, run ONLY those through the dense
    # kernel, and scatter the exact results over the banded output.  The
    # whole-batch re-run survives solely as the >1-block overflow path.
    B = veh.timer.shape[0]
    K = min(block, B)

    def _no_viol(_v):
        return banded_veh

    def _patch(v):
        idx = jnp.where(env_viol, size=K, fill_value=0)[0]
        sub = jax.tree_util.tree_map(lambda a: a[idx], v)
        sub_out = _simulate_bm_core(env, sub, frames, block, interpret)
        # fill slots alias env 0; scattering its dense result is exact
        # (dense == banded bitwise for non-violating envs), and duplicate
        # scatter indices write identical values
        return jax.tree_util.tree_map(
            lambda b, s: b.at[idx].set(s), banded_veh, sub_out
        )

    def _full(v):
        return _simulate_bm_core(env, v, frames, block, interpret)

    out_veh = jax.lax.cond(
        n_viol == 0,
        _no_viol,
        lambda v: jax.lax.cond(n_viol <= K, _patch, _full, v),
        veh,
    )
    if return_viol:  # diagnostics: how many envs fired the dense fallback
        return out_veh, n_viol
    return out_veh


def pallas_simulate_bm(
    env, veh: VehicleState, slot_actions, frames: int,
    block: int = 128, interpret: bool = False,
) -> VehicleState:
    """Policy-step simulation: ego meta-action applied in XLA (frame 0),
    then all ``frames`` frames in ONE VMEM-resident pallas megakernel
    (fori_loop inside the kernel — compiles fine in the batch-minor
    layout; round 1's batch-major megakernel hung mosaic)."""
    ego_mask = veh.kind == KIND_EGO
    veh = env.action_type.apply(env.geo, veh, ego_mask, slot_actions)
    return _simulate_bm_core(env, veh, frames, block, interpret)


def _simulate_bm_core(
    env, veh: VehicleState, frames: int, block: int, interpret: bool
) -> VehicleState:
    """Dense megakernel step WITHOUT the ego meta-action (already applied)
    — shared by :func:`pallas_simulate_bm` and the sorted path's
    window-violation fallback."""
    key = (id(env), block, interpret, frames)
    cache = _FRAME_CACHE
    if key not in cache:
        cache[key] = build_pallas_frame(
            env, block=block, interpret=interpret, frames=frames
        )
    arrays = cache[key](pack_bm(veh))
    return unpack_bm(list(arrays), veh)


_FRAME_CACHE: dict = {}
