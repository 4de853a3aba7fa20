"""Batched low-level controllers + lane-following graph logic.

Vectorized equivalents of ``ControlledVehicle``/``MDPVehicle``
(vehicle/controller.py:12-400): the steering P-cascade, the speed P
controller, the end-of-lane ``follow_road``/``next_lane`` advance on the
compiled adjacency tables, and the discrete meta-action handling.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from highwayenv_tpu.road import lane as lane_ops
from highwayenv_tpu.road.lane import LaneGeometry
from highwayenv_tpu.utils.math import not_zero, wrap_to_pi
from highwayenv_tpu.vehicle.state import VehicleState

# ControlledVehicle constants (vehicle/controller.py:23-33)
TAU_ACC = 0.6
TAU_HEADING = 0.2
TAU_LATERAL = 0.6
TAU_PURSUIT = 0.5 * TAU_HEADING
KP_A = 1 / TAU_ACC
KP_HEADING = 1 / TAU_HEADING
KP_LATERAL = 1 / TAU_LATERAL
MAX_STEERING_ANGLE = np.pi / 3
DELTA_SPEED = 5.0

DEFAULT_TARGET_SPEEDS = np.linspace(20, 30, 3)

# DiscreteMetaAction indices (envs/common/action.py:204)
LANE_LEFT, IDLE, LANE_RIGHT, FASTER, SLOWER = 0, 1, 2, 3, 4


def steering_control(
    geo: LaneGeometry,
    target_lane: jnp.ndarray,
    pos: jnp.ndarray,
    heading: jnp.ndarray,
    speed: jnp.ndarray,
    vehicle_length: jnp.ndarray,
) -> jnp.ndarray:
    """P-cascade lateral controller (vehicle/controller.py:145-187)."""
    s, lat = lane_ops.local_coordinates(geo, target_lane, pos)
    return steering_from_coords(
        geo, target_lane, s, lat, heading, speed, vehicle_length
    )


def steering_control_from_table(
    geo: LaneGeometry,
    target_lane: jnp.ndarray,
    state,
    table_s: jnp.ndarray,
    table_lat: jnp.ndarray,
) -> jnp.ndarray:
    """steering_control with (s, lat) read from the projection table."""
    s = lane_ops.row_lookup(table_s, target_lane)
    lat = lane_ops.row_lookup(table_lat, target_lane)
    return steering_from_coords(
        geo, target_lane, s, lat, state.heading, state.speed, state.length
    )


def steering_from_coords(
    geo: LaneGeometry,
    target_lane: jnp.ndarray,
    s: jnp.ndarray,
    lat: jnp.ndarray,
    heading: jnp.ndarray,
    speed: jnp.ndarray,
    vehicle_length: jnp.ndarray,
) -> jnp.ndarray:
    s_next = s + speed * TAU_PURSUIT
    lane_future_heading = lane_ops.heading_at(geo, target_lane, s_next)

    lateral_speed_command = -KP_LATERAL * lat
    heading_command = jnp.arcsin(
        jnp.clip(lateral_speed_command / not_zero(speed), -1.0, 1.0)
    )
    heading_ref = lane_future_heading + jnp.clip(
        heading_command, -jnp.pi / 4, jnp.pi / 4
    )
    heading_rate_command = KP_HEADING * wrap_to_pi(heading_ref - heading)
    slip_angle = jnp.arcsin(
        jnp.clip(
            vehicle_length / 2 / not_zero(speed) * heading_rate_command, -1.0, 1.0
        )
    )
    if slip_angle.dtype == jnp.float64:
        # bitwise-identical to the reference chain (controller.py:177) —
        # the x64 parity path must not add even 1 ulp: near-critical IDM
        # interactions amplify rounding ~30x per policy step (u-turn
        # seeds 0/3)
        steering_angle = jnp.arctan(2 * jnp.tan(slip_angle))
    else:
        # arctan(2 tan(slip)) rewritten as arctan2(2 sin, cos): identical
        # on (-pi/2, pi/2) but safe at slip = +/- pi/2, where float32
        # tan() flips sign (the f32 nearest to pi/2 is slightly above it)
        # and would steer hard the wrong way; the float64 reference never
        # hits this.
        steering_angle = jnp.arctan2(
            2 * jnp.sin(slip_angle), jnp.cos(slip_angle)
        )
    return jnp.clip(steering_angle, -MAX_STEERING_ANGLE, MAX_STEERING_ANGLE)


def speed_control(target_speed: jnp.ndarray, speed: jnp.ndarray) -> jnp.ndarray:
    """vehicle/controller.py:189-198."""
    return KP_A * (target_speed - speed)


# --------------------------------------------------------------------------- #
# lane-graph following
# --------------------------------------------------------------------------- #


def _next_lane_given_next_edge(
    geo: LaneGeometry,
    cur_lane: jnp.ndarray,
    cand_base: jnp.ndarray,
    cand_n: jnp.ndarray,
    next_id: jnp.ndarray,
    projected_pos: jnp.ndarray,
    max_edge_lanes: int,
):
    """Choose the lane on a given successor edge (road/road.py:138-157).

    cand_base/cand_n: (...,) successor edge tables; next_id: (...,) explicit
    lane id or -1.  Returns (chosen_lane_global, distance).
    """
    cur_n = geo.edge_n[lane_ops._gather(geo, cur_lane)]
    cur_id = geo.lane_id[lane_ops._gather(geo, cur_lane)]

    # distance of each candidate lane on the edge to the projected position
    ids = jnp.arange(max_edge_lanes, dtype=jnp.int32)  # (M,)
    cand_lanes = cand_base[..., None] + ids  # (...,M)
    d = lane_ops.distance(geo, cand_lanes, projected_pos[..., None, :])
    d = jnp.where(ids < cand_n[..., None], d, jnp.inf)
    closest_id = jnp.argmin(d, axis=-1).astype(jnp.int32)

    # reference semantics (road.py:147-157): when lane counts match, an
    # explicit id is honoured (else keep the current id); when they differ,
    # the closest lane always wins, even over an explicit id.
    same_count = cur_n == cand_n
    chosen_id = jnp.where(
        same_count, jnp.where(next_id >= 0, next_id, cur_id), closest_id
    )
    chosen_id = jnp.clip(chosen_id, 0, jnp.maximum(cand_n - 1, 0))
    chosen_lane = cand_base + chosen_id
    dist = lane_ops.onehot_take(
        jnp.where(ids < cand_n[..., None], d, jnp.inf), chosen_id
    )
    return chosen_lane, dist


def next_lane(
    geo: LaneGeometry,
    state: VehicleState,
    cur_lane: jnp.ndarray,
    max_edge_lanes: int,
    s: jnp.ndarray | None = None,
):
    """Index of the lane to follow after the current one ends.

    Vectorized road/road.py:73-136 over all vehicles:
      - if the route continues from the current edge, follow it;
      - else pick, among edges leaving the end node, the one whose chosen
        lane minimizes distance to the projected position;
      - with no successor, stay on the current lane.
    Also returns the advanced route cursor (the reference pops the route head
    when it matches the finishing road).
    """
    li = lane_ops._gather(geo, cur_lane)
    if s is None:
        s, _lat = lane_ops.local_coordinates(geo, cur_lane, state.pos)
    projected = lane_ops.position(geo, cur_lane, s, jnp.zeros_like(s))

    # --- route handling -------------------------------------------------- #
    R = state.route_base.shape[-1]
    ptr = state.route_ptr
    has_route = ptr < state.route_len

    def route_entry(field, p):
        return lane_ops.onehot_take(field, jnp.clip(p, 0, R - 1))

    cur_edge_base = geo.edge_base[li]
    head_base = route_entry(state.route_base, ptr)
    # pop the head if it refers to the road we are finishing (road.py:96-99)
    pop = has_route & (head_base == cur_edge_base)
    new_ptr = jnp.where(pop, ptr + 1, ptr)
    has_route2 = new_ptr < state.route_len
    head_base2 = route_entry(state.route_base, new_ptr)
    head_n2 = route_entry(state.route_n, new_ptr)
    head_id2 = route_entry(state.route_id, new_ptr)
    # the route head must start at the end of the current road: its edge's
    # from-node equals our to-node (road.py:101-104)
    head_from = geo.from_node[lane_ops._gather(geo, head_base2)]
    follow_route = has_route2 & (head_from == geo.to_node[li])

    route_lane, _ = _next_lane_given_next_edge(
        geo, cur_lane, head_base2, head_n2, head_id2, projected, max_edge_lanes
    )

    # --- free choice among successor edges ------------------------------- #
    succ_base = geo.succ_edge_base[li]  # (...,S)
    succ_n = geo.succ_edge_n[li]
    no_id = jnp.full_like(succ_base, -1)
    cand_lane, cand_dist = _next_lane_given_next_edge(
        geo,
        cur_lane[..., None],
        succ_base,
        succ_n,
        no_id,
        projected[..., None, :],
        max_edge_lanes,
    )
    cand_dist = jnp.where(succ_base >= 0, cand_dist, jnp.inf)
    best = jnp.argmin(cand_dist, axis=-1)
    best_lane = lane_ops.onehot_take(cand_lane, best.astype(jnp.int32))
    any_succ = jnp.any(succ_base >= 0, axis=-1)

    chosen = jnp.where(
        follow_route, route_lane, jnp.where(any_succ, best_lane, cur_lane)
    )
    return chosen.astype(jnp.int32), new_ptr


def follow_road(
    geo: LaneGeometry,
    state: VehicleState,
    max_edge_lanes: int,
    table_s: jnp.ndarray | None = None,
) -> VehicleState:
    """Advance target_lane at the end of a lane (vehicle/controller.py:135-143)."""
    if table_s is not None:
        s = lane_ops.row_lookup(table_s, state.target_lane)
    else:
        s, _ = lane_ops.local_coordinates(geo, state.target_lane, state.pos)
    ended = lane_ops.after_end(geo, state.target_lane, s)
    nxt, new_ptr = next_lane(geo, state, state.target_lane, max_edge_lanes, s)
    apply = ended & state.is_controlled
    return state.replace(
        target_lane=jnp.where(apply, nxt, state.target_lane),
        route_ptr=jnp.where(apply, new_ptr, state.route_ptr),
    )


# --------------------------------------------------------------------------- #
# MDP (discrete meta-action) ego control
# --------------------------------------------------------------------------- #


def speed_to_index(speed: jnp.ndarray, target_speeds: np.ndarray) -> jnp.ndarray:
    """vehicle/controller.py:326-344 (uniform grid, banker's rounding)."""
    ts = np.asarray(target_speeds)
    x = (speed - ts[0]) / (ts[-1] - ts[0])
    return jnp.clip(jnp.round(x * (len(ts) - 1)), 0, len(ts) - 1).astype(jnp.int32)


def ego_speed_init(action_type, speed):
    """Ego target-speed initialisation by action family: meta-action egos
    are MDPVehicles and snap to the nearest ``target_speeds`` index
    (vehicle/controller.py:276-285); raw-control egos (Continuous/Discrete
    actions) are plain/Bicycle vehicles that keep their spawn speed and
    carry no speed index (action.py:129-135 picks the vehicle class).

    Returns ``(speed_index_i32, target_speed)`` with ``speed``'s shape.
    """
    import numpy as _np

    ts = getattr(action_type, "target_speeds", None)
    if ts is None:
        return jnp.zeros(jnp.shape(speed), jnp.int32), speed
    idx = speed_to_index(speed, ts)
    return idx, jnp.asarray(_np.asarray(ts, _np.float32))[idx]


def apply_meta_action(
    geo: LaneGeometry,
    state: VehicleState,
    ego_mask: jnp.ndarray,
    action: jnp.ndarray,
    target_speeds: np.ndarray,
    longitudinal: bool = True,
    lateral: bool = True,
) -> VehicleState:
    """Apply a DiscreteMetaAction to the masked controlled vehicles.

    action: (...,) int32 broadcast against the ego mask (...,V).
    Updates target_lane / speed_index / target_speed
    (vehicle/controller.py:89-133, 295-315; action table action.py:204-210).
    """
    ts = jnp.asarray(np.asarray(target_speeds, dtype=np.float32))
    n_speeds = ts.shape[0]

    if longitudinal and lateral:
        lane_left = action == LANE_LEFT
        lane_right = action == LANE_RIGHT
        faster = action == FASTER
        slower = action == SLOWER
    elif longitudinal:
        # ACTIONS_LONGI = {0: SLOWER, 1: IDLE, 2: FASTER}
        lane_left = jnp.zeros_like(action, dtype=bool)
        lane_right = jnp.zeros_like(action, dtype=bool)
        faster = action == 2
        slower = action == 0
    else:
        # ACTIONS_LAT = {0: LANE_LEFT, 1: IDLE, 2: LANE_RIGHT}
        lane_left = action == 0
        lane_right = action == 2
        faster = jnp.zeros_like(action, dtype=bool)
        slower = jnp.zeros_like(action, dtype=bool)

    lane_left = lane_left & ego_mask
    lane_right = lane_right & ego_mask
    faster = faster & ego_mask
    slower = slower & ego_mask

    # speed index update uses the *current* speed (controller.py:304-307)
    cur_index = speed_to_index(state.speed, np.asarray(target_speeds))
    new_index = jnp.where(
        faster,
        cur_index + 1,
        jnp.where(slower, cur_index - 1, state.speed_index),
    )
    new_index = jnp.clip(new_index, 0, n_speeds - 1)
    speed_changed = faster | slower
    new_target_speed = jnp.where(speed_changed, ts[new_index], state.target_speed)

    # lane change on the *target* lane's edge (controller.py:103-124)
    li = lane_ops._gather(geo, state.target_lane)
    cur_id = geo.lane_id[li]
    n = geo.edge_n[li]
    base = geo.edge_base[li]
    delta_id = jnp.where(lane_right, 1, jnp.where(lane_left, -1, 0))
    cand_id = jnp.clip(cur_id + delta_id, 0, n - 1)
    cand_lane = base + cand_id
    reachable = lane_ops.is_reachable_from(geo, cand_lane, state.pos)
    new_target_lane = jnp.where(
        (lane_left | lane_right) & reachable, cand_lane, state.target_lane
    )

    return state.replace(
        speed_index=jnp.where(ego_mask, new_index, state.speed_index),
        target_speed=jnp.where(ego_mask, new_target_speed, state.target_speed),
        target_lane=jnp.where(ego_mask, new_target_lane, state.target_lane),
    )


def controlled_vehicle_controls(
    geo: LaneGeometry,
    state: VehicleState,
    table_s: jnp.ndarray | None = None,
    table_lat: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Low-level controls for externally-actioned vehicles
    (vehicle/controller.py:126-133)."""
    if table_s is not None:
        steering = steering_control_from_table(
            geo, state.target_lane, state, table_s, table_lat
        )
    else:
        steering = steering_control(
            geo, state.target_lane, state.pos, state.heading, state.speed, state.length
        )
    accel = speed_control(state.target_speed, state.speed)
    return steering, accel
