"""Masked pairwise collision kernel.

Replaces the O(V^2) Python loop in Road.step (road/road.py:469-481) +
RoadObject.handle_collisions (vehicle/objects.py:92-138) with one vectorized
(V, V) pass: spherical pre-check (pairwise distances via one MXU matmul),
then a rectangle-specialized separating-axis test with velocity sweep
(axis-unrolled, so temporaries stay (V, V)-sized), then masked
crash/hit/impact aggregation with scalar impact coefficients (no (V, V, 2)
intermediates).

Pair semantics mirror the reference loops: a pair (i, j), i < j, is tested iff
at least one side is a stepping vehicle (vehicles pair with later vehicles and
with all static objects), with ``self`` being the lower index (the state
layout guarantees vehicles occupy the low indices).
"""

from __future__ import annotations

import jax.numpy as jnp

from highwayenv_tpu.utils.math import rects_intersecting
from highwayenv_tpu.vehicle.state import KIND_OBSTACLE, VehicleState


def handle_collisions(state: VehicleState, dt: float) -> VehicleState:
    V = state.num_slots

    pos = state.pos
    pos_i = pos[..., :, None, :]
    pos_j = pos[..., None, :, :]

    i_idx = jnp.arange(V)
    upper = i_idx[:, None] < i_idx[None, :]  # i < j

    pair_ok = (
        upper
        & state.active[..., :, None]
        & state.active[..., None, :]
        & (state.is_vehicle[..., :, None] | state.is_vehicle[..., None, :])
        & (state.check_collisions[..., :, None] | state.check_collisions[..., None, :])
        & state.collidable[..., :, None]
        & state.collidable[..., None, :]
    )

    # spherical pre-check (objects.py:122-134); `self` = lower index i.
    # |pi-pj|^2 via one batched matmul (MXU) instead of a (V,V,2) subtract.
    sq = jnp.sum(pos * pos, axis=-1)
    cross = jnp.einsum("...id,...jd->...ij", pos, pos, precision="highest")
    dist2 = jnp.maximum(sq[..., :, None] + sq[..., None, :] - 2.0 * cross, 0.0)
    reach = (state.diagonal[..., :, None] + state.diagonal[..., None, :]) / 2 + (
        state.speed[..., :, None] * dt
    )
    pair_ok = pair_ok & (dist2 <= reach * reach)

    vel = state.velocity
    intersecting, will_intersect, translation = rects_intersecting(
        pos_i,
        state.length[..., :, None],
        state.width[..., :, None],
        state.heading[..., :, None],
        pos_j,
        state.length[..., None, :],
        state.width[..., None, :],
        state.heading[..., None, :],
        displacement_a=vel[..., :, None, :] * dt,
        displacement_b=vel[..., None, :, :] * dt,
    )
    intersecting = intersecting & pair_ok
    will_intersect = will_intersect & pair_ok

    solid_i = state.solid[..., :, None]
    solid_j = state.solid[..., None, :]
    both_solid = solid_i & solid_j

    # impact coefficients (objects.py:104-111): the full translation against
    # an obstacle, half each between two vehicles
    obst = state.kind == KIND_OBSTACLE
    obst_i = obst[..., :, None]
    obst_j = obst[..., None, :]
    w = will_intersect & both_solid
    neither = ~obst_i & ~obst_j
    coef_i = jnp.where(
        w & obst_j, 1.0, jnp.where(w & neither, 0.5, 0.0)
    )  # (V,V) scalar weights for slot i (the pair's `self`)
    coef_j = jnp.where(
        w & obst_i, 1.0, jnp.where(w & neither, -0.5, 0.0)
    )

    # ---- last-written impact (objects.py:104-111 ASSIGNS, it never sums;
    # loop order road.py:477-481).  For slot v the reference's writes arrive
    # as: pairs (k, v), k ascending (during iterations k < v), THEN pairs
    # (v, m), m ascending + objects (during iteration v; objects occupy the
    # top slots, so "max partner index" covers both sub-phases).  The final
    # value is therefore the max-index row-side pair if v writes as `self`,
    # else the max-index column-side pair, else the previous impact.
    tx = translation[..., 0]
    ty = translation[..., 1]
    write_i = w & ~obst_i  # v = pair's `self` (lower index) receives
    write_j = w & ~obst_j  # v = pair's `other` (higher index) receives
    col_iota = i_idx[None, :]
    row_iota = i_idx[:, None]
    last_j = jnp.max(jnp.where(write_i, col_iota, -1), axis=-1)  # (...,V)
    last_i = jnp.max(jnp.where(write_j, row_iota, -1), axis=-2)
    sel_row = write_i & (col_iota == last_j[..., :, None])
    sel_col = write_j & (row_iota == last_i[..., None, :])
    imp_row_x = jnp.sum(jnp.where(sel_row, coef_i * tx, 0.0), axis=-1)
    imp_row_y = jnp.sum(jnp.where(sel_row, coef_i * ty, 0.0), axis=-1)
    imp_col_x = jnp.sum(jnp.where(sel_col, coef_j * tx, 0.0), axis=-2)
    imp_col_y = jnp.sum(jnp.where(sel_col, coef_j * ty, 0.0), axis=-2)
    any_row = last_j >= 0
    any_col = last_i >= 0
    imp_x = jnp.where(
        any_row, imp_row_x, jnp.where(any_col, imp_col_x, state.impact[..., 0])
    )
    imp_y = jnp.where(
        any_row, imp_row_y, jnp.where(any_col, imp_col_y, state.impact[..., 1])
    )
    impact = jnp.stack([imp_x, imp_y], axis=-1)
    impact_pending = state.impact_pending | any_row | any_col

    # crash / hit flags (objects.py:113-120)
    crash_pair = intersecting & both_solid
    crashed = state.crashed | jnp.any(crash_pair, axis=-1) | jnp.any(crash_pair, axis=-2)
    hit_i = intersecting & ~solid_i
    hit_j = intersecting & ~solid_j
    hit = state.hit | jnp.any(hit_i, axis=-1) | jnp.any(hit_j, axis=-2)

    return state.replace(
        crashed=crashed, hit=hit, impact=impact, impact_pending=impact_pending
    )
