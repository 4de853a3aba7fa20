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

    s0, _ = lane_ops.local_coordinates_select(geo, state.lane, state.pos)
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
    cur_id = lane_ops.select_table(geo.lane_id, state.lane, geo.num_lanes)[
        ..., None
    ]
    fallback = jnp.where(cur_id < state.route_n, cur_id, 0)
    seg_id = jnp.where(state.route_id >= 0, state.route_id, fallback)
    seg_lane = jnp.clip(
        state.route_base + seg_id, 0, geo.num_lanes - 1
    )  # (V, R)
    seg_lane = jnp.where(valid, seg_lane, state.lane[..., None])

    # walk: subtract completed segment lengths while more segments remain
    # (the final valid segment extrapolates)
    seg_len = jnp.where(
        valid, lane_ops.select_table(geo.length, seg_lane, geo.num_lanes), 0.0
    )
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

    # R is tiny (route_slots); one-hot selects instead of take_along_axis —
    # gathers break XLA fusion inside the frame scan
    oh_k = (k[..., None, :] == seg[..., :, None]).astype(
        jnp.float32
    )  # (V, R, T)
    lane_k = jnp.sum(
        seg_lane[..., :, None].astype(jnp.float32) * oh_k, axis=-2
    ).astype(jnp.int32)  # (V, T)
    km1 = jnp.maximum(k - 1, 0)
    oh_km1 = (km1[..., None, :] == seg[..., :, None]).astype(jnp.float32)
    base = jnp.where(
        k > first[..., None],
        jnp.sum(cum[..., :, None] * oh_km1, axis=-2),
        0.0,
    )
    s_local = target - base
    pos = lane_ops.position_select(geo, lane_k, s_local, jnp.zeros_like(s_local))
    heading = lane_ops.heading_at_select(geo, lane_k, s_local)
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
    limit = lane_ops.select_table(geo.speed_limit, state.lane, geo.num_lanes)
    target_speed = jnp.where(expired, limit, state.target_speed)
    yield_timer = jnp.where(
        state.is_yielding & ~expired, state.yield_timer + 1, state.yield_timer
    )
    is_yielding = state.is_yielding & ~expired

    # 2. pairwise conflict prediction, vectorized over the T prediction
    # times with the 9 probe points unrolled in Python.  Temporaries stay
    # (V, V, T) — T minor for lane tiling — instead of either (V, V, T, 9)
    # pair-probe tensors (multi-GB at batch 1024) or a T-step lax.scan of
    # tiny (V, V) ops (op-dispatch bound at V=25: the scan version made
    # regulation 74% of the intersection step).
    times = np.arange(CONFLICT_STEP, CONFLICT_HORIZON, CONFLICT_STEP)
    pos, heading = predict_route_positions(geo, state, times)  # (V,T,2)

    px = pos[..., 0]  # (V, T)
    py = pos[..., 1]
    cos_h = jnp.cos(heading)
    sin_h = jnp.sin(heading)

    def pij(x):
        return x[..., :, None, :], x[..., None, :, :]

    px_i, px_j = pij(px)
    py_i, py_j = pij(py)
    c_i, c_j = pij(cos_h)
    s_i, s_j = pij(sin_h)
    l_i = state.length[..., :, None, None]
    w_i = state.width[..., :, None, None]
    l_j = state.length[..., None, :, None]
    w_j = state.width[..., None, :, None]

    dx = px_j - px_i
    dy = py_j - py_i
    close = dx * dx + dy * dy <= l_i * l_i  # (V,V,T)

    # probe offsets of rect_corners(include_midpoints, include_center)
    # (utils.py:129-157), as (length, width) fractions
    probes = (
        (-0.5, -0.5), (-0.5, 0.5), (0.5, 0.5), (0.5, -0.5), (0.0, 0.0),
        (-0.5, 0.0), (0.5, 0.0), (0.0, -0.5), (0.0, 0.5),
    )

    def one_way(ax, ay, la, wa, ca, sa, bx, by, lb, wb, cb, sb):
        """Any probe point of rect a inside rect b (utils.py:115-174
        semantics: containment test rotated by +angle)."""
        out = None
        for fx, fy in probes:
            lx = fx * la
            ly = fy * wa
            ppx = ax + ca * lx - sa * ly
            ppy = ay + sa * lx + ca * ly
            dxp = ppx - bx
            dyp = ppy - by
            rx = cb * dxp - sb * dyp
            ry = sb * dxp + cb * dyp
            ins = (
                (-lb / 2 <= rx) & (rx <= lb / 2)
                & (-wb / 2 <= ry) & (ry <= wb / 2)
            )
            out = ins if out is None else out | ins
        return out

    la_i, wa_i = 1.5 * l_i, 0.9 * w_i
    la_j, wa_j = 1.5 * l_j, 0.9 * w_j
    hit = close & (
        one_way(px_i, py_i, la_i, wa_i, c_i, s_i,
                px_j, py_j, la_j, wa_j, c_j, s_j)
        | one_way(px_j, py_j, la_j, wa_j, c_j, s_j,
                  px_i, py_i, la_i, wa_i, c_i, s_i)
    )
    any_hit = jnp.any(hit, axis=-1)  # (V,V)

    i_idx = jnp.arange(V)
    upper = i_idx[:, None] < i_idx[None, :]
    pair_ok = (
        upper & state.is_vehicle[..., :, None] & state.is_vehicle[..., None, :]
    )
    conflict = pair_ok & any_hit  # (V,V)

    # 3. who yields: lower current-lane priority; tie -> the trailing vehicle
    # (regulation.py:73-88)
    prio = lane_ops.select_table(geo.priority, state.lane, geo.num_lanes)
    p_i = prio[..., :, None]
    p_j = prio[..., None, :]
    d = state.pos[..., None, :, :] - state.pos[..., :, None, :]  # j - i
    front_ij = jnp.einsum("...ijd,...id->...ij", d, state.direction, precision="highest")
    front_ji = jnp.einsum("...ijd,...jd->...ij", -d, state.direction, precision="highest")
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
