"""Interval-membership observers for vehicles under parameter uncertainty.

Rebuild of highway_env/vehicle/uncertainty/prediction.py:33-503
(IntervalVehicle): propagate [min, max] bounds on a LinearVehicle's
position/speed/heading given box uncertainty on its acceleration/steering
parameters.  Host-side numpy analysis tooling (robust planning), operating on
scene snapshots pulled from the device state.

Modes (prediction.py:108-118):
  - "partial": split the interval into lower/upper halves, propagate each
    through the nonlinear observer, merge (partial_observer_step, 401-448).
  - "predictor": linear-parameter-varying predictors in the lane frame
    (predictor_step, 221-328) built from LinearVehicle's longitudinal /
    lateral structures.
"""

from __future__ import annotations

import copy
from dataclasses import dataclass, field

import numpy as np

from highwayenv_tpu.ops.interval import (
    LPV,
    integrator_interval,
    interval_absolute_to_local,
    interval_local_to_absolute,
    interval_negative_part,
    intervals_diff,
    intervals_product,
    polytope,
    vector_interval_section,
)
from highwayenv_tpu.road import lane as lane_ops

# LinearVehicle class constants (vehicle/behavior.py:350-373)
ACCELERATION_PARAMETERS = np.array([0.3, 0.3, 2.0])
STEERING_PARAMETERS = np.array([5.0, 5.0 / 0.6])
ACCELERATION_RANGE = np.array(
    [0.5 * ACCELERATION_PARAMETERS, 1.5 * ACCELERATION_PARAMETERS]
)
STEERING_RANGE = np.array(
    [
        STEERING_PARAMETERS - np.array([0.07, 1.5]),
        STEERING_PARAMETERS + np.array([0.07, 1.5]),
    ]
)
DISTANCE_WANTED = 10.0
TIME_WANTED = 2.5
ACC_MAX = 6.0
TAU_PURSUIT = 0.1
NOISE_PARTIAL = 0.3


@dataclass
class VehicleInterval:
    """prediction.py:498-503."""

    position: np.ndarray  # (2, 2)
    speed: np.ndarray  # (2,)
    heading: np.ndarray  # (2,)

    @classmethod
    def degenerate(cls, position, speed, heading):
        return cls(
            position=np.array([position, position], float),
            speed=np.array([speed, speed], float),
            heading=np.array([heading, heading], float),
        )


@dataclass
class IntervalObserver:
    """Interval observer for one vehicle slot of a scene snapshot."""

    geo: object  # compiled LaneGeometry
    target_lane: int
    target_speed: float
    theta_a_i: np.ndarray = field(default_factory=lambda: ACCELERATION_RANGE)
    theta_b_i: np.ndarray = field(default_factory=lambda: STEERING_RANGE)
    interval: VehicleInterval | None = None
    longitudinal_lpv: LPV | None = None
    lateral_lpv: LPV | None = None

    # ------------------------------------------------------------------ #
    def _lane_heading_at_position(self, position):
        import jax.numpy as jnp

        s, _ = lane_ops.local_coordinates(
            self.geo, jnp.int32(self.target_lane), jnp.asarray(position, jnp.float32)
        )
        return float(
            np.asarray(
                lane_ops.heading_at(self.geo, jnp.int32(self.target_lane), s)
            )
        )

    def observer_step(
        self,
        dt: float,
        position: np.ndarray,
        speed: float,
        front: VehicleInterval | None = None,
    ) -> None:
        """One step of the nonlinear interval observer
        (prediction.py:118-219), in place on self.interval."""
        o = self.interval
        position_i = o.position
        v_i = o.speed
        psi_i = o.heading

        phi_a_i = np.zeros((2, 3))
        lane_psi = self._lane_heading_at_position(position)
        if front is not None:
            phi_a_i[:, 1] = interval_negative_part(
                intervals_diff(front.speed, v_i)
            )
            lane_direction = [np.cos(lane_psi), np.sin(lane_psi)]
            diff_i = intervals_diff(front.position, position_i)
            d_i = vector_interval_section(diff_i, lane_direction)
            d_safe_i = DISTANCE_WANTED + TIME_WANTED * v_i
            phi_a_i[:, 2] = interval_negative_part(
                intervals_diff(d_i, d_safe_i)
            )

        # steering features on the followed (target) lane
        _, lateral_i = interval_absolute_to_local(
            position_i, self.geo, self.target_lane
        )
        lateral_i = -np.flip(lateral_i)
        i_v_i = 1 / np.flip(v_i, 0)
        phi_b_i = np.transpose(
            np.array([[0, 0], intervals_product(lateral_i, i_v_i)])
        )

        a_i = intervals_product(self.theta_a_i, phi_a_i)
        b_i = intervals_product(self.theta_b_i, phi_b_i)

        dv_i = intervals_product(
            self.theta_a_i[:, 0], self.target_speed - np.flip(v_i, 0)
        )
        dv_i += a_i
        dv_i = np.clip(dv_i, -ACC_MAX, ACC_MAX)

        from highwayenv_tpu.utils.math import wrap_to_pi as _w

        delta_psi = [float(np.asarray(_w(x - lane_psi))) for x in psi_i]
        d_psi_i = integrator_interval(delta_psi, self.theta_b_i[:, 0])
        d_psi_i += b_i

        cos_i = [
            -1 if psi_i[0] <= np.pi <= psi_i[1] else min(map(np.cos, psi_i)),
            1 if psi_i[0] <= 0 <= psi_i[1] else max(map(np.cos, psi_i)),
        ]
        sin_i = [
            -1 if psi_i[0] <= -np.pi / 2 <= psi_i[1] else min(map(np.sin, psi_i)),
            1 if psi_i[0] <= np.pi / 2 <= psi_i[1] else max(map(np.sin, psi_i)),
        ]
        dx_i = intervals_product(v_i, cos_i)
        dy_i = intervals_product(v_i, sin_i)

        o.speed = o.speed + dv_i * dt
        o.heading = o.heading + d_psi_i * dt
        o.position[:, 0] += dx_i * dt + NOISE_PARTIAL * dt * np.array([-1, 1])
        o.position[:, 1] += dy_i * dt + NOISE_PARTIAL * dt * np.array([-1, 1])
        o.heading = o.heading + NOISE_PARTIAL * dt * np.array([-1, 1])

    def partial_step(
        self,
        dt: float,
        position,
        speed: float,
        front: VehicleInterval | None = None,
        alpha: float = 0.0,
    ) -> None:
        """Split / propagate / merge (prediction.py:401-448)."""
        o = self.interval
        minus = copy.deepcopy(self)
        minus.interval = copy.deepcopy(o)
        minus.interval.position[1, :] = (
            (1 - alpha) * o.position[0, :] + alpha * o.position[1, :]
        )
        minus.interval.speed[1] = (1 - alpha) * o.speed[0] + alpha * o.speed[1]
        minus.interval.heading[1] = (
            (1 - alpha) * o.heading[0] + alpha * o.heading[1]
        )
        plus = copy.deepcopy(self)
        plus.interval = copy.deepcopy(o)
        plus.interval.position[0, :] = (
            alpha * o.position[0, :] + (1 - alpha) * o.position[1, :]
        )
        plus.interval.speed[0] = alpha * o.speed[0] + (1 - alpha) * o.speed[1]
        plus.interval.heading[0] = (
            alpha * o.heading[0] + (1 - alpha) * o.heading[1]
        )
        minus.observer_step(dt, position, speed, front)
        plus.observer_step(dt, position, speed, front)
        self.interval = VehicleInterval(
            position=np.array(
                [minus.interval.position[0], plus.interval.position[1]]
            ),
            speed=np.array([minus.interval.speed[0], plus.interval.speed[1]]),
            heading=np.array(
                [
                    min(minus.interval.heading[0], plus.interval.heading[0]),
                    max(minus.interval.heading[1], plus.interval.heading[1]),
                ]
            ),
        )

    # -- LPV predictor (prediction.py:221-348) --------------------------- #
    def _longitudinal_structure(self, front_exists: bool, at_safe_gap: bool):
        """LinearVehicle.longitudinal_structure (behavior.py:504-529)."""
        A = np.array(
            [[0, 0, 1, 0], [0, 0, 0, 1], [0, 0, 0, 0], [0, 0, 0, 0]], float
        )
        phi0 = np.array(
            [[0, 0, 0, 0], [0, 0, 0, 0], [0, 0, -1, 0], [0, 0, 0, -1]], float
        )
        phi1 = np.array(
            [[0, 0, 0, 0], [0, 0, 0, 0], [0, 0, -1, 1], [0, 0, 0, 0]], float
        )
        phi2 = np.array(
            [[0, 0, 0, 0], [0, 0, 0, 0], [-1, 1, -TIME_WANTED, 0], [0, 0, 0, 0]],
            float,
        )
        if not front_exists:
            phi1 = phi1 * 0
        if not (front_exists and at_safe_gap):
            phi2 = phi2 * 0
        return A, np.array([phi0, phi1, phi2])

    @staticmethod
    def _lateral_structure():
        """behavior.py:531-537."""
        A = np.array([[0, 1], [0, 0]], float)
        phi0 = np.array([[0, 0], [0, -1]], float)
        phi1 = np.array([[0, 0], [-1, 0]], float)
        return A, np.array([phi0, phi1])

    def predictor_init(
        self, position, speed, front: VehicleInterval | None = None
    ) -> None:
        """prediction.py:282-328."""
        o = self.interval
        longi_i, lat_i = interval_absolute_to_local(
            o.position, self.geo, self.target_lane
        )
        v_i = o.speed
        psi_i = o.heading - self._lane_heading_at_position(position)

        if self.longitudinal_lpv is None:
            if front is not None:
                f_longi_i, _ = interval_absolute_to_local(
                    front.position, self.geo, self.target_lane
                )
                f_pos, f_vel = f_longi_i[0], front.speed[0]
            else:
                f_pos, f_vel = 0.0, 0.0
            x0 = [longi_i[0], f_pos, v_i[0], f_vel]
            center = [
                -DISTANCE_WANTED - self.target_speed * TIME_WANTED,
                0,
                self.target_speed,
                self.target_speed,
            ]
            a, phi = self._longitudinal_structure(
                front_exists=front is not None, at_safe_gap=False
            )
            a0, da = polytope(
                lambda p: a + np.tensordot(phi, p, axes=[0, 0]), self.theta_a_i
            )
            self.longitudinal_lpv = LPV(
                x0, a0, da,
                b=np.eye(4),
                d=np.array([[1], [0], [0], [0]]),
                omega_i=np.array([[-1], [1]]) * 1.0,
                u=[[self.target_speed], [self.target_speed], [0], [0]],
                center=center,
            )
        if self.lateral_lpv is None:
            a, phi = self._lateral_structure()
            a0, da = polytope(
                lambda p: a + np.tensordot(phi, p, axes=[0, 0]), self.theta_b_i
            )
            self.lateral_lpv = LPV(
                [lat_i[0], psi_i[0]], a0, da,
                b=np.identity(2),
                d=np.array([[1], [0]]),
                omega_i=np.array([[-1], [1]]) * 0.5,
                u=[[0], [0]],
                center=[0, 0],
            )

    def predictor_step(self, dt: float, position, speed, front=None) -> None:
        """prediction.py:221-280 (without mid-episode lane-change rebase)."""
        self.predictor_init(position, speed, front)
        self.longitudinal_lpv.step(dt)
        self.lateral_lpv.step(dt)
        x_i_long = self.longitudinal_lpv.change_coordinates(
            self.longitudinal_lpv.x_i_t, back=True, interval=True
        )
        x_i_lat = self.lateral_lpv.change_coordinates(
            self.lateral_lpv.x_i_t, back=True, interval=True
        )
        self.interval = VehicleInterval(
            position=interval_local_to_absolute(
                x_i_long[:, 0], x_i_lat[:, 0], self.geo, self.target_lane
            ),
            speed=x_i_long[:, 2],
            heading=x_i_lat[:, 1],
        )


def worst_case_collision(
    interval: VehicleInterval,
    self_heading: float,
    other_position,
    other_length: float,
    other_width: float,
    other_heading: float,
    self_length: float = 5.0,
    self_width: float = 2.0,
):
    """Robust-planning collision test against the uncertainty box
    (IntervalVehicle.handle_collisions, prediction.py:459-496): a planned
    ego pose collides if the OBSERVED vehicle could be anywhere in its
    interval that intersects it.  Returns (collides, projection) where
    projection is the worst-case position inside the box (None when the
    fast rectangular pre-check already rules a collision out)."""
    import jax.numpy as jnp

    from highwayenv_tpu.utils.math import rects_intersecting

    lo, hi = interval.position[0], interval.position[1]
    p = np.asarray(other_position, float)
    # fast rectangular pre-check (utils.point_in_rectangle)
    if not np.all((lo - self_length <= p) & (p <= hi + self_length)):
        return False, None
    # worst-case position: the box point closest to the ego
    projection = np.minimum(np.maximum(p, lo), hi)
    hit, _will, _imp = rects_intersecting(
        jnp.asarray(projection, jnp.float32),
        jnp.float32(self_length),
        jnp.float32(self_width),
        jnp.float32(self_heading),
        jnp.asarray(p, jnp.float32),
        jnp.float32(0.9 * other_length),
        jnp.float32(0.9 * other_width),
        jnp.float32(other_heading),
    )
    return bool(np.asarray(hit)), projection


def polytope_from_estimation(data: dict, parameter_box, structure):
    """RegressionVehicle.polytope_from_estimation
    (vehicle/uncertainty/estimation.py:26-38): replace the prior parameter
    box with a data-driven confidence polytope when observations exist."""
    from highwayenv_tpu.utils.estimation import confidence_polytope

    a, phi = structure()
    if not data:
        a_theta = lambda p: a + np.tensordot(phi, p, axes=[0, 0])
        return polytope(a_theta, parameter_box)
    theta, d_theta, _, _ = confidence_polytope(data, parameter_box=parameter_box)
    a0 = a + np.tensordot(theta, phi, axes=[0, 0])
    da = [np.tensordot(dt, phi, axes=[0, 0]) for dt in d_theta]
    return a0, da


def observer_for_slot(env, state, slot: int) -> IntervalObserver:
    """Build an observer from a device-state snapshot."""
    veh = state.vehicles
    obs = IntervalObserver(
        geo=env.geo,
        target_lane=int(np.asarray(veh.target_lane[slot])),
        target_speed=float(np.asarray(veh.target_speed[slot])),
    )
    obs.interval = VehicleInterval.degenerate(
        np.asarray(veh.pos[slot], float),
        float(np.asarray(veh.speed[slot])),
        float(np.asarray(veh.heading[slot])),
    )
    return obs


# --------------------------------------------------------------------------- #
# Multiple-model route-hypothesis tracking
# (vehicle/uncertainty/estimation.py:40-140)
# --------------------------------------------------------------------------- #

_VEHICLE_LENGTH = 5.0
_KIND_LANDMARK = 7  # vehicle/state.py enum


def route_of_slot(env, state, slot: int):
    """Decode a slot's compiled route arrays back into reference-style
    (from, to, lane_id | None) tuples (layout: network.py::route_arrays;
    cursor semantics: the reference pops the route head as lanes finish)."""
    veh = state.vehicles
    n = int(np.asarray(veh.route_len[slot]))
    ptr = int(np.asarray(veh.route_ptr[slot]))
    out = []
    for i in range(ptr, n):
        base = int(np.asarray(veh.route_base[slot, i]))
        if base < 0:
            break
        f, t, _ = env.net.lane_index_from_global(base)
        rid = int(np.asarray(veh.route_id[slot, i]))
        out.append((f, t, rid if rid >= 0 else None))
    return out


def routes_at_intersection(net, route):
    """All routes followable at the next intersection
    (vehicle/controller.py:200-219).  ``route`` is a list of reference-style
    (from, to, lane_id) index tuples."""
    if not route:
        return []
    graph: dict[str, list[str]] = {}
    for (f, t) in net.edges:
        graph.setdefault(f, [])
        if t not in graph[f]:
            graph[f].append(t)
    index = None
    for i in range(min(len(route), 3)):
        dests = graph.get(route[i][1])
        if dests is None:
            continue
        if len(dests) >= 2:
            index = i
            break
    if index is None:
        return [list(route)]
    return [
        list(route[: index + 1])
        + [(route[index][1], destination, route[index][2])]
        for destination in graph[route[index][1]]
    ]


def _on_lane(lane, s, lat, margin=1.0):
    """AbstractLane.on_lane (road/lane.py:96-113) with default margin 1."""
    half = lane.width / 2 + margin
    return (
        abs(lat) <= half
        and -_VEHICLE_LENGTH <= s < lane.length + _VEHICLE_LENGTH
    )


def neighbour_slots(env, state, slot: int, lane_index):
    """Front/rear neighbour slots of ``slot`` projected on ``lane_index``
    (road/road.py:483-547, single-lane path) on a host state snapshot.
    Returns (front_slot | None, rear_slot | None)."""
    veh = state.vehicles
    pos = np.asarray(veh.pos, float)
    kind = np.asarray(veh.kind, int)
    lane = env.net.get_lane(lane_index)
    s = float(np.asarray(lane.local_coordinates(pos[slot])[0]))
    s_front = s_rear = None
    front = rear = None
    for j in range(pos.shape[0]):
        if j == slot or kind[j] == 0 or kind[j] == _KIND_LANDMARK:
            continue
        s_v, lat_v = (float(x) for x in lane.local_coordinates(pos[j]))
        if not _on_lane(lane, s_v, lat_v):
            continue
        if s <= s_v and (s_front is None or s_v <= s_front):
            s_front, front = s_v, j
        if s_v < s and (s_rear is None or s_v > s_rear):
            s_rear, rear = s_v, j
    return front, rear


def acceleration_features(env, state, slot: int, self_lane_index):
    """LinearVehicle.acceleration_features (vehicle/behavior.py:445-465)."""
    veh = state.vehicles
    speed = float(np.asarray(veh.speed[slot]))
    target_speed = float(np.asarray(veh.target_speed[slot]))
    vt = target_speed - speed
    dv = dp = 0.0
    front, _ = neighbour_slots(env, state, slot, self_lane_index)
    if front is not None:
        lane = env.net.get_lane(self_lane_index)
        pos = np.asarray(veh.pos, float)
        d = float(np.asarray(lane.local_coordinates(pos[front])[0])) - float(
            np.asarray(lane.local_coordinates(pos[slot])[0])
        )
        d_safe = DISTANCE_WANTED + max(speed, 0.0) * TIME_WANTED
        dv = min(float(np.asarray(veh.speed[front])) - speed, 0.0)
        dp = min(d - d_safe, 0.0)
    return np.array([vt, dv, dp])


def steering_features(env, state, slot: int, lane_index):
    """LinearVehicle.steering_features (vehicle/behavior.py:483-502)."""
    from highwayenv_tpu.utils.math import not_zero, wrap_to_pi

    veh = state.vehicles
    pos = np.asarray(veh.pos[slot], float)
    speed = float(np.asarray(veh.speed[slot]))
    heading = float(np.asarray(veh.heading[slot]))
    lane = env.net.get_lane(lane_index)
    s, lat = (float(np.asarray(x)) for x in lane.local_coordinates(pos))
    s_next = s + speed * 0.1  # TAU_PURSUIT = 0.5 * TAU_HEADING
    future_heading = float(np.asarray(lane.heading_at(s_next)))
    nz = float(np.asarray(not_zero(np.float32(speed))))
    return np.array(
        [
            float(np.asarray(wrap_to_pi(np.float32(future_heading - heading))))
            * _VEHICLE_LENGTH
            / nz,
            -lat * _VEHICLE_LENGTH / (nz**2),
        ]
    )


class MultipleModelTracker:
    """Host-side port of MultipleModelVehicle
    (vehicle/uncertainty/estimation.py:40-140): maintain a set of route
    hypotheses for an observed vehicle slot, collect (features, output)
    regression data under each hypothesis, reject hypotheses whose lateral
    data is inconsistent with the LinearVehicle steering parameter box, and
    instantiate a data-driven interval observer assuming one hypothesis.

    The reference embeds this in the vehicle object graph; here it is an
    analysis-side tracker over device state snapshots — the simulation loop
    stays pure/jitted, the tracker runs between steps on the host.
    """

    def __init__(self, env, slot: int, route=None):
        self.env = env
        self.slot = slot
        self.route = [tuple(r) for r in (route or [])]
        self.data: list[tuple[list, dict]] = []  # (route, data) hypotheses
        self.collecting_data = True

    # -- reference act() hook (estimation.py:68-72) ---------------------- #
    def act(self, state) -> None:
        if self.collecting_data:
            self.update_possible_routes(state)
            self.collect_data(state)

    def collect_data(self, state) -> None:
        """estimation.py:74-77: features under each route hypothesis, true
        outputs from the actually-followed target lane."""
        output_lane = self.env.net.lane_index_from_global(
            int(np.asarray(state.vehicles.target_lane[self.slot]))
        )
        for route, data in self.data:
            self.add_features(state, data, route[0], output_lane=output_lane)

    def add_features(self, state, data, lane_index, output_lane=None):
        """LinearVehicle.add_features (vehicle/behavior.py:542-559)."""
        self_lane = self.env.net.lane_index_from_global(
            int(np.asarray(state.vehicles.lane[self.slot]))
        )
        features = acceleration_features(self.env, state, self.slot, self_lane)
        output = float(np.dot(ACCELERATION_PARAMETERS, features))
        data.setdefault("longitudinal", {"features": [], "outputs": []})
        data["longitudinal"]["features"].append(features)
        data["longitudinal"]["outputs"].append(output)

        if output_lane is None:
            output_lane = lane_index
        features = steering_features(self.env, state, self.slot, lane_index)
        out_features = steering_features(
            self.env, state, self.slot, output_lane
        )
        output = float(np.dot(STEERING_PARAMETERS, out_features))
        data.setdefault("lateral", {"features": [], "outputs": []})
        data["lateral"]["features"].append(features)
        data["lateral"]["outputs"].append(output)

    def update_possible_routes(self, state) -> None:
        """estimation.py:79-117: add candidate routes at the next
        intersection, advance each hypothesis past finished lanes, reject
        laterally-inconsistent hypotheses."""
        from highwayenv_tpu.utils.estimation import is_consistent_dataset

        position = np.asarray(state.vehicles.pos[self.slot], float)

        # mirror the tracked vehicle's own route advancement: the reference
        # pops route[0] when its lane finishes (road/road.py:96-100 via
        # follow_road); without this, stale candidates re-enter every update
        while len(self.route) > 1:
            lane0 = self.env.net.get_lane(self.route[0])
            s0 = float(np.asarray(lane0.local_coordinates(position)[0]))
            if s0 > lane0.length - _VEHICLE_LENGTH / 2:
                self.route.pop(0)
            else:
                break

        for route in routes_at_intersection(self.env.net, self.route):
            # unknown lane -> first lane (estimation.py:88-93; -1 is the
            # compiled-array encoding of the reference's None)
            route = [
                idx
                if idx[2] is not None and idx[2] >= 0
                else (idx[0], idx[1], 0)
                for idx in route
            ]
            for known_route, _ in self.data:
                if known_route == route:
                    break
                if (
                    len(known_route) < len(route)
                    and route[: len(known_route)] == known_route
                ):
                    self.data = [
                        (r, d) if r != known_route else (route, d)
                        for r, d in self.data
                    ]
                    break
            else:
                self.data.append((list(route), {}))

        for route, _ in self.data:
            lane = self.env.net.get_lane(route[0])
            s = float(np.asarray(lane.local_coordinates(position)[0]))
            if len(route) > 1 and s > lane.length - _VEHICLE_LENGTH / 2:
                route.pop(0)

        for route, data in list(self.data):
            if data and not is_consistent_dataset(
                data["lateral"], parameter_box=STEERING_RANGE
            ):
                self.data.remove((route, data))

    def assume_model_is_valid(self, state, index: int):
        """estimation.py:119-140: an observer configured as if hypothesis
        ``index`` were the true route.  Returns (observer, route, data);
        the observer's matrix polytopes come from the hypothesis data via
        polytope_from_estimation (RegressionVehicle semantics)."""
        obs = observer_for_slot(self.env, state, self.slot)
        if not self.data:
            return obs, list(self.route), {}
        index = min(index, len(self.data) - 1)
        route, data = self.data[index]
        obs.target_lane = self.env.net.global_lane_index(route[0])
        return obs, list(route), data


# --------------------------------------------------------------------------- #
# batched device kernel: nonlinear interval observer over a fleet
# --------------------------------------------------------------------------- #
def observer_step_batch(
    geo,
    target_lane,
    target_speed,
    theta_a_i,
    theta_b_i,
    position_i,
    speed_i,
    heading_i,
    position,
    dt,
    front_position_i=None,
    front_speed_i=None,
    front_mask=None,
):
    """One nonlinear interval-observer step for a BATCH of observers
    (jittable; leading batch dims everywhere).

    The per-vehicle host path (IntervalObserver.observer_step) mirrors this
    math one observer at a time; here the whole fleet propagates in one
    fused kernel.  ``front_mask`` (bool (...,)) enables the leader-coupling
    features per row.

    Shapes: target_lane (...,) i32; target_speed (...,); theta_a_i
    (..., 2, 3); theta_b_i (..., 2, 2); position_i (..., 2, 2) [min/max of
    x,y]; speed_i/heading_i (..., 2); position (..., 2).
    Returns (position_i, speed_i, heading_i).
    """
    import jax.numpy as jnp

    from highwayenv_tpu.ops.interval import (
        box_integrator,
        box_section,
    )
    from highwayenv_tpu.utils.math import wrap_to_pi

    f32 = jnp.float32
    position_i = jnp.asarray(position_i, f32)
    v_i = jnp.asarray(speed_i, f32)
    psi_i = jnp.asarray(heading_i, f32)
    theta_a_i = jnp.asarray(theta_a_i, f32)
    theta_b_i = jnp.asarray(theta_b_i, f32)
    if front_mask is None:
        front_mask = jnp.zeros(v_i.shape[:-1], bool)
        front_position_i = jnp.zeros_like(position_i)
        front_speed_i = jnp.zeros_like(v_i)

    # lane frame at the measured position
    s0, _ = lane_ops.local_coordinates(geo, target_lane, jnp.asarray(position, f32))
    lane_psi = lane_ops.heading_at(geo, target_lane, s0)

    def iprod_scalar(a_i, b_i):
        """Interval product of scalar intervals (..., 2) x (..., 2)."""
        cands = jnp.stack(
            [
                a_i[..., 0] * b_i[..., 0], a_i[..., 0] * b_i[..., 1],
                a_i[..., 1] * b_i[..., 0], a_i[..., 1] * b_i[..., 1],
            ],
            axis=-1,
        )
        return jnp.stack(
            [cands.min(axis=-1), cands.max(axis=-1)], axis=-1
        )

    # IDM-like features phi_a (..., 2, 3): [target-speed err, dv-, gap-]
    zero = jnp.zeros_like(v_i)
    dvf = jnp.stack(
        [front_speed_i[..., 0] - v_i[..., 1], front_speed_i[..., 1] - v_i[..., 0]],
        axis=-1,
    )
    phi_a1 = jnp.where(front_mask[..., None], jnp.minimum(dvf, 0.0), zero)
    lane_dir = jnp.stack([jnp.cos(lane_psi), jnp.sin(lane_psi)], axis=-1)
    diff_box = jnp.stack(
        [
            front_position_i[..., 0, :] - position_i[..., 1, :],
            front_position_i[..., 1, :] - position_i[..., 0, :],
        ],
        axis=-2,
    )
    d_i = box_section(diff_box, lane_dir)
    d_safe_i = DISTANCE_WANTED + TIME_WANTED * v_i
    gap = jnp.stack(
        [d_i[..., 0] - d_safe_i[..., 1], d_i[..., 1] - d_safe_i[..., 0]],
        axis=-1,
    )
    phi_a2 = jnp.where(front_mask[..., None], jnp.minimum(gap, 0.0), zero)
    phi_a = jnp.stack([jnp.zeros_like(phi_a1), phi_a1, phi_a2], axis=-1)

    # steering feature phi_b (..., 2, 2) from the lateral interval
    from highwayenv_tpu.ops.interval import box_absolute_to_local

    _, lat_i = box_absolute_to_local(geo, target_lane, position_i)
    lateral_i = -jnp.flip(lat_i, axis=-1)
    i_v_i = 1.0 / jnp.flip(v_i, axis=-1)
    phi_b1 = iprod_scalar(lateral_i, i_v_i)
    phi_b = jnp.stack(
        [jnp.zeros_like(phi_b1), phi_b1], axis=-1
    )

    def iprod_rowvec(theta, phi):
        """Interval product of a (..., 2, K) theta with (..., 2, K) phi,
        contracted over K with interval semantics per term."""
        terms = iprod_scalar(
            jnp.moveaxis(theta, -1, 0).reshape((-1,) + theta.shape[:-2] + (2,)),
            jnp.moveaxis(phi, -1, 0).reshape((-1,) + phi.shape[:-2] + (2,)),
        )
        return jnp.sum(terms, axis=0)

    a_i = iprod_rowvec(theta_a_i, phi_a)
    b_i = iprod_rowvec(theta_b_i, phi_b)

    dv_err = jnp.stack(
        [target_speed - v_i[..., 1], target_speed - v_i[..., 0]], axis=-1
    )
    dv_i = iprod_scalar(
        jnp.stack([theta_a_i[..., 0, 0], theta_a_i[..., 1, 0]], axis=-1), dv_err
    )
    dv_i = jnp.clip(dv_i + a_i, -ACC_MAX, ACC_MAX)

    delta_psi = wrap_to_pi(psi_i - lane_psi[..., None])
    d_psi_i = box_integrator(
        delta_psi,
        jnp.stack([theta_b_i[..., 0, 0], theta_b_i[..., 1, 0]], axis=-1),
    )
    d_psi_i = d_psi_i + b_i

    # cos/sin interval bounds (branch-free version of the host logic)
    lo, hi = psi_i[..., 0], psi_i[..., 1]
    cos_lo = jnp.where(
        (lo <= jnp.pi) & (jnp.pi <= hi),
        -1.0,
        jnp.minimum(jnp.cos(lo), jnp.cos(hi)),
    )
    cos_hi = jnp.where(
        (lo <= 0.0) & (0.0 <= hi),
        1.0,
        jnp.maximum(jnp.cos(lo), jnp.cos(hi)),
    )
    sin_lo = jnp.where(
        (lo <= -jnp.pi / 2) & (-jnp.pi / 2 <= hi),
        -1.0,
        jnp.minimum(jnp.sin(lo), jnp.sin(hi)),
    )
    sin_hi = jnp.where(
        (lo <= jnp.pi / 2) & (jnp.pi / 2 <= hi),
        1.0,
        jnp.maximum(jnp.sin(lo), jnp.sin(hi)),
    )
    dx_i = iprod_scalar(v_i, jnp.stack([cos_lo, cos_hi], axis=-1))
    dy_i = iprod_scalar(v_i, jnp.stack([sin_lo, sin_hi], axis=-1))

    noise = NOISE_PARTIAL * dt * jnp.asarray([-1.0, 1.0])
    new_speed = v_i + dv_i * dt
    new_heading = psi_i + d_psi_i * dt + noise
    new_pos = position_i.at[..., 0].add(dx_i * dt + noise)
    new_pos = new_pos.at[..., 1].add(dy_i * dt + noise)
    return new_pos, new_speed, new_heading
