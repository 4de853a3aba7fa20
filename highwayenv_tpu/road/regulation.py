"""RegulatedRoad: intersection right-of-way as a batched conflict kernel.

Rebuild of highway_env/road/regulation.py:12-112: every
1/REGULATION_FREQUENCY of simulated time, (1) unfreeze yielding vehicles
whose timer expired, (2) predict constant-speed trajectories along each
vehicle's route (controller.py:236-253, road.py:323-362), (3) detect future
rectangle overlaps per pair (1.5x length, 0.9x width probes), (4) make the
lower-priority (or trailing) vehicle of each conflicting pair yield with
target_speed = 0.

Everything is one fused (V, V, T) masked pass instead of the reference's
Python pair loop.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from highwayenv_tpu.road import lane as lane_ops
from highwayenv_tpu.road.lane import LaneGeometry
from highwayenv_tpu.utils.math import rotated_rectangles_intersect
from highwayenv_tpu.vehicle.state import KIND_IDM, KIND_LINEAR, VehicleState

REGULATION_FREQUENCY = 2
YIELD_DURATION = 0.0
CONFLICT_HORIZON = 3.0
CONFLICT_STEP = 0.25


def predict_route_positions(
    geo: LaneGeometry, state: VehicleState, times: np.ndarray
):
    """Constant-speed positions/headings along each vehicle's route.

    Vectorization of predict_trajectory_constant_speed
    (vehicle/controller.py:236-253) + position_heading_along_route
    (road/road.py:323-362).  Returns pos (..., V, T, 2) and heading
    (..., V, T).
    """
    R = state.route_base.shape[-1]
    T = len(times)
    seg = jnp.arange(R)

    s0, _ = lane_ops.local_coordinates(geo, state.lane, state.pos)
    target = s0[..., None] + state.speed[..., None] * jnp.asarray(
        times, jnp.float32
    )  # (V, T)

    # remaining route segments [ptr, len); vehicles without a route fall back
    # to a single segment = current lane (controller.py:247 `route or [...]`)
    ptr = state.route_ptr[..., None]
    has_route = (state.route_ptr < state.route_len)[..., None]
    valid = has_route & (seg >= ptr) & (seg < state.route_len[..., None])
    # explicit segment lane id, else keep the current lane id clamped to the
    # segment's lane count (road.py:340-352)
    cur_id = geo.lane_id[lane_ops._gather(geo, state.lane)][..., None]
    fallback = jnp.where(cur_id < state.route_n, cur_id, 0)
    seg_id = jnp.where(state.route_id >= 0, state.route_id, fallback)
    seg_lane = jnp.clip(
        state.route_base + seg_id, 0, geo.num_lanes - 1
    )  # (V, R)
    seg_lane = jnp.where(valid, seg_lane, state.lane[..., None])

    # walk: subtract completed segment lengths while more segments remain
    # (the final valid segment extrapolates)
    seg_len = jnp.where(valid, geo.length[seg_lane], 0.0)
    n_valid = jnp.sum(valid, axis=-1)  # (V,)
    first = jnp.argmax(valid, axis=-1)  # index of first valid segment (or 0)
    first = jnp.where(n_valid > 0, first, 0)
    last = jnp.where(n_valid > 0, first + n_valid - 1, 0)

    cum = jnp.cumsum(seg_len, axis=-1)  # (V, R)
    # k = number of fully-traversed segments before the target, bounded so the
    # last valid segment absorbs the remainder
    passed = (target[..., None, :] > cum[..., :, None]) & (
        seg[..., :, None] < last[..., None, None]
    )  # (V, R, T)
    k = first[..., None] + jnp.sum(
        passed & valid[..., None], axis=-2
    )  # (V, T)
    k = jnp.minimum(k, last[..., None])

    lane_k = jnp.take_along_axis(seg_lane, k, axis=-1)  # (V, T)
    base = jnp.where(
        k > first[..., None],
        jnp.take_along_axis(cum, jnp.maximum(k - 1, 0), axis=-1),
        0.0,
    )
    s_local = target - base
    pos = lane_ops.position(geo, lane_k, s_local, jnp.zeros_like(s_local))
    heading = lane_ops.heading_at(geo, lane_k, s_local)
    return pos, heading


def enforce_road_rules(
    geo: LaneGeometry, state: VehicleState
) -> VehicleState:
    """One regulation pass (regulation.py:42-71)."""
    V = state.num_slots
    can_yield = (state.kind == KIND_IDM) | (state.kind == KIND_LINEAR)

    # 1. unfreeze expired yielders: restore the current lane's speed limit
    expired = state.is_yielding & (
        state.yield_timer >= YIELD_DURATION * REGULATION_FREQUENCY
    )
    limit = geo.speed_limit[lane_ops._gather(geo, state.lane)]
    target_speed = jnp.where(expired, limit, state.target_speed)
    yield_timer = jnp.where(
        state.is_yielding & ~expired, state.yield_timer + 1, state.yield_timer
    )
    is_yielding = state.is_yielding & ~expired

    # 2. pairwise conflict prediction.  The hit test scans over the T
    # prediction times so temporaries stay (V, V, 9) rather than
    # (V, V, T, 9) — at batch 1024 the fused version materializes
    # multi-GB intermediates and becomes HBM-bound.
    times = np.arange(CONFLICT_STEP, CONFLICT_HORIZON, CONFLICT_STEP)
    pos, heading = predict_route_positions(geo, state, times)  # (V,T,2)

    l1 = state.length[..., :, None]
    w1 = state.width[..., :, None]
    l2 = state.length[..., None, :]
    w2 = state.width[..., None, :]

    def hit_at(carry, pt):
        p_t, h_t = pt  # (V,2), (V,)
        p1 = p_t[..., :, None, :]
        p2 = p_t[..., None, :, :]
        close = jnp.linalg.norm(p2 - p1, axis=-1) <= l1
        hit_t = close & rotated_rectangles_intersect(
            p1, 1.5 * l1, 0.9 * w1, h_t[..., :, None],
            p2, 1.5 * l2, 0.9 * w2, h_t[..., None, :],
        )
        return carry | hit_t, None

    pos_t = jnp.moveaxis(pos, -2, 0)  # (T, ..., V, 2)
    heading_t = jnp.moveaxis(heading, -1, 0)  # (T, ..., V)
    any_hit, _ = jax.lax.scan(
        hit_at,
        jnp.zeros(state.kind.shape + (V,), bool),
        (pos_t, heading_t),
    )

    i_idx = jnp.arange(V)
    upper = i_idx[:, None] < i_idx[None, :]
    pair_ok = (
        upper & state.is_vehicle[..., :, None] & state.is_vehicle[..., None, :]
    )
    conflict = pair_ok & any_hit  # (V,V)

    # 3. who yields: lower current-lane priority; tie -> the trailing vehicle
    # (regulation.py:73-88)
    prio = geo.priority[lane_ops._gather(geo, state.lane)]
    p_i = prio[..., :, None]
    p_j = prio[..., None, :]
    d = state.pos[..., None, :, :] - state.pos[..., :, None, :]  # j - i
    front_ij = jnp.einsum("...ijd,...id->...ij", d, state.direction)
    front_ji = jnp.einsum("...ijd,...jd->...ij", -d, state.direction)
    i_yields = jnp.where(
        p_i > p_j, False, jnp.where(p_i < p_j, True, front_ij > front_ji)
    )
    yield_i = conflict & i_yields
    yield_j = conflict & ~i_yields

    new_yield = (
        jnp.any(yield_i, axis=-1) | jnp.any(yield_j, axis=-2)
    ) & can_yield
    target_speed = jnp.where(new_yield, 0.0, target_speed)
    yield_timer = jnp.where(new_yield, 0, yield_timer)
    is_yielding = is_yielding | new_yield

    return state.replace(
        target_speed=target_speed,
        yield_timer=yield_timer,
        is_yielding=is_yielding,
    )
