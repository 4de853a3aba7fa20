"""Masked pairwise collision kernel.

Replaces the O(V^2) Python loop in Road.step (road/road.py:469-481) +
RoadObject.handle_collisions (vehicle/objects.py:92-138) with one vectorized
(V, V) pass: spherical pre-check, then a rectangle-specialized separating-axis
test with velocity sweep, then masked crash/hit/impact aggregation.

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

    pos_i = state.pos[..., :, None, :]
    pos_j = state.pos[..., None, :, :]

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

    # spherical pre-check (objects.py:122-134); `self` = lower index i
    dist = jnp.linalg.norm(pos_j - pos_i, axis=-1)
    reach = (state.diagonal[..., :, None] + state.diagonal[..., None, :]) / 2 + (
        state.speed[..., :, None] * dt
    )
    near = dist <= reach
    pair_ok = pair_ok & near

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

    # impact transitions (objects.py:104-111): full transition against an
    # obstacle, half each between two vehicles
    obst = state.kind == KIND_OBSTACLE
    obst_i = obst[..., :, None]
    obst_j = obst[..., None, :]
    w = will_intersect & both_solid
    imp_i = jnp.where(
        (w & obst_j)[..., None],
        translation,
        jnp.where((w & ~obst_j & ~obst_i)[..., None], translation / 2, 0.0),
    )
    imp_j = jnp.where(
        (w & obst_i)[..., None],
        translation,
        jnp.where((w & ~obst_j & ~obst_i)[..., None], -translation / 2, 0.0),
    )
    imp_i_mask = w & ~obst_i
    imp_j_mask = w & ~obst_j

    impact = (
        state.impact
        + jnp.sum(imp_i, axis=-2)  # contributions where this slot is `self`
        + jnp.sum(imp_j, axis=-3)  # contributions where this slot is `other`
    )
    impact_pending = (
        state.impact_pending
        | jnp.any(imp_i_mask, axis=-1)
        | jnp.any(imp_j_mask, axis=-2)
    )

    # crash / hit flags (objects.py:113-120)
    crash_pair = intersecting & both_solid
    crashed = state.crashed | jnp.any(crash_pair, axis=-1) | jnp.any(crash_pair, axis=-2)
    hit_i = intersecting & ~solid_i
    hit_j = intersecting & ~solid_j
    hit = state.hit | jnp.any(hit_i, axis=-1) | jnp.any(hit_j, axis=-2)

    return state.replace(
        crashed=crashed, hit=hit, impact=impact, impact_pending=impact_pending
    )
