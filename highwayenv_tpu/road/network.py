"""Host-side road-network builder: lane specs -> compiled LaneGeometry table.

The reference keeps a string-keyed graph of lane objects
(highway_env/road/road.py:21-39) that is traversed at runtime.  Here the
network is *compiled once at build time* into the static ``LaneGeometry``
arrays consumed by the jitted kernels: node names become integer ids, lanes
of one edge get contiguous global indices, and successor/predecessor edges
are flattened into fixed-width padded tables.

Construction mirrors the reference builder API (``add_lane(from, to, lane)``,
``straight_road_network`` road/road.py:291-321) so scenario code reads the
same, and ``to_config``/``from_config`` round-trips reproduce the reference's
serialization contract (road/road.py:370-389).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import numpy as np
import jax.numpy as jnp

from highwayenv_tpu.road.lane import (
    CIRCULAR,
    DEFAULT_WIDTH,
    LINE_CONTINUOUS,
    LINE_CONTINUOUS_LINE,
    LINE_NONE,
    LINE_STRIPED,
    POLY,
    SINE,
    STRAIGHT,
    LaneGeometry,
)


class LineType:
    """Lane side line types (road/lane.py:150-156)."""

    NONE = LINE_NONE
    STRIPED = LINE_STRIPED
    CONTINUOUS = LINE_CONTINUOUS
    CONTINUOUS_LINE = LINE_CONTINUOUS_LINE


@dataclasses.dataclass
class StraightLane:
    """Spec of a straight lane (road/lane.py:159-233)."""

    start: Sequence[float]
    end: Sequence[float]
    width: float = DEFAULT_WIDTH
    line_types: Optional[Sequence[int]] = None
    forbidden: bool = False
    speed_limit: Optional[float] = 20.0
    priority: int = 0

    kind = STRAIGHT

    def __post_init__(self):
        self.start = np.asarray(self.start, dtype=np.float64)
        self.end = np.asarray(self.end, dtype=np.float64)
        delta = self.end - self.start
        self.length = float(np.linalg.norm(delta))
        self.heading = float(math.atan2(delta[1], delta[0]))
        self.direction = delta / self.length
        self.direction_lateral = np.array([-self.direction[1], self.direction[0]])
        if self.line_types is None:
            self.line_types = [LineType.STRIPED, LineType.STRIPED]

    # host-side geometry (used by reset/spawn logic before device handoff)
    def position(self, s, lat):
        return self.start + s * self.direction + lat * self.direction_lateral

    def heading_at(self, s):
        return self.heading

    def local_coordinates(self, pos):
        delta = np.asarray(pos) - self.start
        return float(delta @ self.direction), float(delta @ self.direction_lateral)


@dataclasses.dataclass
class SineLane(StraightLane):
    """Spec of a sinusoidal lane (road/lane.py:236-308).

    Positional layout matches the reference: (start, end, amplitude,
    pulsation, phase, ...).
    """

    amplitude: float = 0.0
    pulsation: float = 0.0
    phase: float = 0.0

    kind = SINE

    def __init__(
        self,
        start,
        end,
        amplitude,
        pulsation,
        phase,
        width=DEFAULT_WIDTH,
        line_types=None,
        forbidden=False,
        speed_limit=20.0,
        priority=0,
    ):
        super().__init__(start, end, width, line_types, forbidden, speed_limit, priority)
        self.amplitude = amplitude
        self.pulsation = pulsation
        self.phase = phase

    def position(self, s, lat):
        return super().position(
            s, lat + self.amplitude * np.sin(self.pulsation * s + self.phase)
        )

    def heading_at(self, s):
        return super().heading_at(s) + math.atan(
            self.amplitude * self.pulsation * np.cos(self.pulsation * s + self.phase)
        )

    def local_coordinates(self, pos):
        s, lat = super().local_coordinates(pos)
        return s, lat - self.amplitude * np.sin(self.pulsation * s + self.phase)


@dataclasses.dataclass
class CircularLane:
    """Spec of a circular-arc lane (road/lane.py:311-384)."""

    center: Sequence[float]
    radius: float
    start_phase: float
    end_phase: float
    clockwise: bool = True
    width: float = DEFAULT_WIDTH
    line_types: Optional[Sequence[int]] = None
    forbidden: bool = False
    speed_limit: Optional[float] = 20.0
    priority: int = 0

    kind = CIRCULAR

    def __post_init__(self):
        self.center = np.asarray(self.center, dtype=np.float64)
        self.direction = 1 if self.clockwise else -1
        self.length = self.radius * (self.end_phase - self.start_phase) * self.direction
        if self.line_types is None:
            self.line_types = [LineType.STRIPED, LineType.STRIPED]

    def position(self, s, lat):
        phi = self.direction * np.asarray(s, np.float64) / self.radius + self.start_phase
        # stack on the LAST axis so vector s broadcasts ((n, 1) -> (n, 1, 2));
        # scalar s keeps the original (2,) result
        pts = np.stack([np.cos(phi), np.sin(phi)], axis=-1)
        return self.center + (self.radius - lat * self.direction) * pts

    def heading_at(self, s):
        phi = self.direction * s / self.radius + self.start_phase
        return phi + np.pi / 2 * self.direction

    def local_coordinates(self, pos):
        delta = np.asarray(pos) - self.center
        phi = math.atan2(delta[1], delta[0])
        phi = self.start_phase + ((phi - self.start_phase + np.pi) % (2 * np.pi) - np.pi)
        r = float(np.linalg.norm(delta))
        s = self.direction * (phi - self.start_phase) * self.radius
        lat = self.direction * (self.radius - r)
        return s, lat


def _interp_extrap(s, xs, ys):
    """Linear interpolation with linear extrapolation at both ends
    (road/spline.py:6-33 numpy_interp1d semantics)."""
    s = np.asarray(s, float)
    out = np.interp(s, xs, ys)
    left = s < xs[0]
    if np.any(left):
        slope = (ys[1] - ys[0]) / (xs[1] - xs[0])
        out = np.where(left, ys[0] + slope * (s - xs[0]), out)
    right = s > xs[-1]
    if np.any(right):
        slope = (ys[-1] - ys[-2]) / (xs[-1] - xs[-2])
        out = np.where(right, ys[-1] + slope * (s - xs[-1]), out)
    return out


class _Spline2D:
    """Piece-wise linear curve with 1 m pose samples
    (road/spline.py:36-141 LinearSpline2D)."""

    SAMPLE_DISTANCE = 1.0

    def __init__(self, points):
        pts = np.asarray(points, float)
        d = np.diff(pts, axis=0)
        d = np.vstack([d, d[-1]])
        arc = np.hstack([0.0, np.cumsum(np.linalg.norm(d[:-1], axis=1))])
        self.cp_s, self.cp_x, self.cp_y = arc, pts[:, 0], pts[:, 1]
        self.length = float(arc[-1])
        n = int(np.floor(self.length / self.SAMPLE_DISTANCE))
        self.s_samples = self.SAMPLE_DISTANCE * np.arange(n + 1)
        x = _interp_extrap(self.s_samples, arc, pts[:, 0])
        y = _interp_extrap(self.s_samples, arc, pts[:, 1])
        dx = np.diff(x)
        dx = np.hstack([dx, dx[-1]])
        dy = np.diff(y)
        dy = np.hstack([dy, dy[-1]])
        norm = np.sqrt(dx**2 + dy**2)
        self.pose_pos = np.stack([x, y], axis=1)
        self.pose_normal = np.stack([dx / norm, dy / norm], axis=1)

    def __call__(self, lon):
        return (
            float(_interp_extrap(lon, self.cp_s, self.cp_x)),
            float(_interp_extrap(lon, self.cp_s, self.cp_y)),
        )

    def _segment(self, lon):
        """road/spline.py:108-117 (first sample above lon, minus one)."""
        if lon >= self.s_samples[-1]:
            return len(self.s_samples) - 1
        if lon < self.s_samples[0]:
            return 0
        smaller = np.argwhere(lon < self.s_samples)
        if int(smaller[0].item()) == 0:
            return 0
        return int(smaller[0].item()) - 1

    def cartesian_to_frenet(self, position):
        """road/spline.py:73-97 (scan poses from the end)."""
        p = np.asarray(position, float)
        ortho = np.stack(
            [-self.pose_normal[:, 1], self.pose_normal[:, 0]], axis=1
        )
        proj = np.einsum("sd,sd->s", self.pose_normal, p - self.pose_pos)
        for idx in range(len(self.s_samples) - 1, 0, -1):
            if proj[idx] >= 0:
                return (
                    float(self.s_samples[idx] + proj[idx]),
                    float(ortho[idx] @ (p - self.pose_pos[idx])),
                )
        return float(proj[0]), float(ortho[0] @ (p - self.pose_pos[0]))


class PolyLaneFixedWidth:
    """Fixed-width piecewise-linear lane (road/lane.py:387-443)."""

    kind = POLY

    def __init__(
        self,
        lane_points,
        width: float = DEFAULT_WIDTH,
        line_types=None,
        forbidden: bool = False,
        speed_limit: float = 20,
        priority: int = 0,
    ):
        self.curve = _Spline2D(lane_points)
        self.lane_points = [list(map(float, p)) for p in lane_points]
        self.length = self.curve.length
        self.width = width
        self.line_types = list(line_types) if line_types else [1, 1]
        self.forbidden = forbidden
        self.speed_limit = speed_limit
        self.priority = priority

    # width samples: constant for the fixed-width variant
    def width_samples(self):
        n = len(self.curve.s_samples)
        return np.full(n, self.width, float)

    def heading_at(self, s):
        n = self.curve.pose_normal[self.curve._segment(s)]
        return float(np.arctan2(n[1], n[0]))

    def position(self, s, lat):
        x, y = self.curve(s)
        yaw = self.heading_at(s)
        return np.array([x - np.sin(yaw) * lat, y + np.cos(yaw) * lat])

    def local_coordinates(self, pos):
        return self.curve.cartesian_to_frenet(pos)


class PolyLane(PolyLaneFixedWidth):
    """Variable-width poly lane bounded by two boundary curves
    (road/lane.py:446-529)."""

    def __init__(
        self,
        lane_points,
        left_boundary_points,
        right_boundary_points,
        line_types=None,
        forbidden: bool = False,
        speed_limit: float = 20,
        priority: int = 0,
    ):
        super().__init__(
            lane_points,
            line_types=line_types,
            forbidden=forbidden,
            speed_limit=speed_limit,
            priority=priority,
        )
        self.left_boundary = _Spline2D(left_boundary_points)
        self.right_boundary = _Spline2D(right_boundary_points)
        # sampled widths every ~1 m (lane.py:503-529)
        s_samples = np.linspace(
            0, self.curve.length, num=int(np.ceil(self.curve.length)) + 1
        )
        self._width_samples = np.array(
            [self._width_at_s(s) for s in s_samples]
        )
        self.width = float(self._width_samples[0])

    def _width_at_s(self, s):
        cx, cy = self.position(s, 0)
        r_lon, _ = self.right_boundary.cartesian_to_frenet([cx, cy])
        rx, ry = self.right_boundary(r_lon)
        l_lon, _ = self.left_boundary.cartesian_to_frenet([cx, cy])
        lx, ly = self.left_boundary(l_lon)
        d_r = np.hypot(rx - cx, ry - cy)
        d_l = np.hypot(lx - cx, ly - cy)
        return max(min(d_r, d_l) * 2, DEFAULT_WIDTH)

    def width_samples(self):
        # indexed by int(s) at runtime (lane.py:473-480)
        return np.asarray(self._width_samples, float)


LaneSpec = object  # StraightLane | SineLane | CircularLane | PolyLane*


def lane_from_config(cfg: dict):
    """Instantiate a lane spec from a serialized config
    (road/lane.py:538-539; poly lanes use "class_name", others "class_path")."""
    path = cfg.get("class_path") or cfg.get("class_name")
    name = path.rsplit(".", 1)[-1]
    kwargs = dict(cfg["config"])
    if name == "StraightLane":
        return StraightLane(**kwargs)
    if name == "SineLane":
        return SineLane(**kwargs)
    if name == "CircularLane":
        return CircularLane(**kwargs)
    if name == "PolyLaneFixedWidth":
        return PolyLaneFixedWidth(**kwargs)
    if name == "PolyLane":
        pts = kwargs.pop("ordered_boundary_points")
        half = len(pts) // 2
        left = list(reversed(pts[:half]))
        right = pts[half:]
        return PolyLane(
            left_boundary_points=left, right_boundary_points=right, **kwargs
        )
    raise ValueError(f"Unknown lane class {path}")


class RoadNetworkBuilder:
    """Accumulates lanes per (from,to) edge, then compiles to LaneGeometry."""

    def __init__(self):
        # edge order = first-appearance order; lanes within an edge keep
        # insertion order, matching the reference graph semantics.
        self._edges: dict[tuple[str, str], list] = {}
        self._node_ids: dict[str, int] = {}

    def add_lane(self, _from: str, _to: str, lane) -> None:
        key = (_from, _to)
        if key not in self._edges:
            self._edges[key] = []
        self._edges[key].append(lane)
        for node in (_from, _to):
            if node not in self._node_ids:
                self._node_ids[node] = len(self._node_ids)

    # ------------------------------------------------------------------ #
    # host-side queries used by scenario reset code
    # ------------------------------------------------------------------ #
    @property
    def edges(self):
        return self._edges

    def edge_list(self):
        return list(self._edges.keys())

    def get_lane(self, index):
        _from, _to, _id = index
        lanes = self._edges[(_from, _to)]
        if _id is None and len(lanes) == 1:
            _id = 0
        return lanes[_id]

    def lanes_on_edge(self, _from: str, _to: str):
        return self._edges[(_from, _to)]

    def global_lane_index(self, index) -> int:
        """Global lane id of a (from, to, id) reference-style index."""
        _from, _to, _id = index
        base = 0
        for (f, t), lanes in self._edges.items():
            if (f, t) == (_from, _to):
                if _id is None:
                    _id = 0
                return base + _id
            base += len(lanes)
        raise KeyError(index)

    def node_id(self, name: str) -> int:
        return self._node_ids[name]

    def lane_index_from_global(self, g: int) -> tuple[str, str, int]:
        """Inverse of global_lane_index: (from, to, id) of global lane g."""
        base = 0
        for (f, t), lanes in self._edges.items():
            if g < base + len(lanes):
                return (f, t, g - base)
            base += len(lanes)
        raise KeyError(g)

    def connectivity_matrix(self, depth: int = 3, same_lane: bool = False):
        """Static (L, L) bool matrix: is_connected_road(l1, l2, depth)
        (road/road.py:231-276, route=None path).  Precomputed host-side since
        the graph is fixed at build time; consumed by the TTC grid kernel.
        """
        import numpy as np

        indices = []
        for (f, t), lanes in self._edges.items():
            for i in range(len(lanes)):
                indices.append((f, t, i))
        L = len(indices)

        def is_connected(i1, i2, depth):
            f1, t1, id1 = i1
            f2, t2, id2 = i2
            same_road = (f1, t1) == (f2, t2) and (not same_lane or id1 == id2)
            leading = t2 == f1 and (not same_lane or id1 == id2)
            if same_road or leading:
                return True
            if depth > 0:
                return any(
                    is_connected((t1, nt, id1), i2, depth - 1)
                    for (nf, nt) in self._edges
                    if nf == t1
                )
            return False

        mat = np.zeros((L, L), dtype=bool)
        for a, i1 in enumerate(indices):
            for b, i2 in enumerate(indices):
                mat[a, b] = is_connected(i1, i2, depth)
        return mat

    def bfs_shortest_path(self, start: str, goal: str) -> list[str]:
        """Breadth-first shortest node path (road/road.py:159-188)."""
        graph: dict[str, list[str]] = {}
        for (f, t) in self._edges:
            graph.setdefault(f, [])
            if t not in graph[f]:
                graph[f].append(t)
        if start not in graph:
            return []
        queue = [(start, [start])]
        while queue:
            node, path = queue.pop(0)
            for nxt in sorted(k for k in graph.get(node, []) if k not in path):
                if nxt == goal:
                    return path + [nxt]
                if nxt in graph:
                    queue.append((nxt, path + [nxt]))
        return []

    # ------------------------------------------------------------------ #
    # serialization (road/road.py:370-389, road/lane.py to_config family)
    # ------------------------------------------------------------------ #
    _CLASS_PATHS = {
        "StraightLane": "highway_env.road.lane.StraightLane",
        "SineLane": "highway_env.road.lane.SineLane",
        "CircularLane": "highway_env.road.lane.CircularLane",
    }

    def to_config(self) -> dict:
        """Nested {from: {to: [lane_config]}} dict, drop-in compatible with
        the reference's serialization (same class paths and keys)."""
        graph: dict = {}
        for (f, t), lanes in self._edges.items():
            graph.setdefault(f, {})
            graph[f][t] = [self._lane_to_config(lane) for lane in lanes]
        return graph

    def _lane_to_config(self, lane) -> dict:
        common = {
            "width": float(lane.width),
            "line_types": [int(x) for x in lane.line_types],
            "forbidden": bool(lane.forbidden),
            "speed_limit": lane.speed_limit,
            "priority": int(lane.priority),
        }
        if isinstance(lane, PolyLane):
            # the reference poly to_config uses "class_name" (road/lane.py:430)
            bnd = [list(p) for p in reversed(self._spline_points(lane.left_boundary))]
            bnd += [list(p) for p in self._spline_points(lane.right_boundary)]
            cfg = {
                "lane_points": lane.lane_points,
                "ordered_boundary_points": bnd,
                **{k: v for k, v in common.items() if k != "width"},
            }
            return {"class_name": "PolyLane", "config": cfg}
        if isinstance(lane, PolyLaneFixedWidth):
            cfg = {"lane_points": lane.lane_points, **common}
            return {"class_name": "PolyLaneFixedWidth", "config": cfg}
        if isinstance(lane, SineLane):
            cfg = {
                "start": [float(x) for x in lane.start],
                "end": [float(x) for x in lane.end],
                "amplitude": float(lane.amplitude),
                "pulsation": float(lane.pulsation),
                "phase": float(lane.phase),
                **common,
            }
            path = self._CLASS_PATHS["SineLane"]
        elif isinstance(lane, StraightLane):
            cfg = {
                "start": [float(x) for x in lane.start],
                "end": [float(x) for x in lane.end],
                **common,
            }
            path = self._CLASS_PATHS["StraightLane"]
        elif isinstance(lane, CircularLane):
            cfg = {
                "center": [float(x) for x in lane.center],
                "radius": float(lane.radius),
                "start_phase": float(lane.start_phase),
                "end_phase": float(lane.end_phase),
                "clockwise": bool(lane.clockwise),
                **common,
            }
            path = self._CLASS_PATHS["CircularLane"]
        else:
            raise TypeError(type(lane))
        return {"class_path": path, "config": cfg}

    @staticmethod
    def _spline_points(spline: "_Spline2D"):
        return list(zip(spline.cp_x.tolist(), spline.cp_y.tolist()))

    @classmethod
    def from_config(cls, config: dict) -> "RoadNetworkBuilder":
        net = cls()
        for _from, to_dict in config.items():
            for _to, lanes in to_dict.items():
                for lane_cfg in lanes:
                    net.add_lane(_from, _to, lane_from_config(lane_cfg))
        return net

    def route_arrays(self, start_index, destination: str, route_slots: int):
        """Compile ControlledVehicle.plan_route_to (vehicle/controller.py:71-87)
        into fixed-width route arrays.

        The reference route is ``[lane_index] + [(path[i], path[i+1], None)]``
        over the BFS node path from the current lane's end node.  Returns
        (route_base, route_n, route_id, route_len) numpy arrays where each
        segment stores its edge's global base lane id, lane count, and the
        explicit lane id (-1 = reference ``None``).
        """
        _from, _to, _id = start_index
        path = self.bfs_shortest_path(_to, destination)
        route = [start_index]
        if path:
            route += [(path[i], path[i + 1], None) for i in range(len(path) - 1)]
        base = np.full(route_slots, -1, np.int32)
        n = np.zeros(route_slots, np.int32)
        rid = np.full(route_slots, -1, np.int32)
        for i, (f, t, lid) in enumerate(route[:route_slots]):
            lanes = self._edges[(f, t)]
            base[i] = self.global_lane_index((f, t, 0))
            n[i] = len(lanes)
            rid[i] = -1 if lid is None else int(lid)
        return base, n, rid, min(len(route), route_slots)

    @staticmethod
    def straight_road_network(
        lanes: int = 4,
        start: float = 0.0,
        length: float = 10000.0,
        angle: float = 0.0,
        speed_limit: float = 30.0,
        nodes_str=None,
        net: "RoadNetworkBuilder | None" = None,
    ) -> "RoadNetworkBuilder":
        """road/road.py:291-321."""
        net = net or RoadNetworkBuilder()
        nodes_str = nodes_str or ("0", "1")
        for lane in range(lanes):
            origin = np.array([start, lane * DEFAULT_WIDTH])
            end = np.array([start + length, lane * DEFAULT_WIDTH])
            rotation = np.array(
                [
                    [np.cos(angle), np.sin(angle)],
                    [-np.sin(angle), np.cos(angle)],
                ]
            )
            origin = rotation @ origin
            end = rotation @ end
            line_types = [
                LineType.CONTINUOUS_LINE if lane == 0 else LineType.STRIPED,
                LineType.CONTINUOUS_LINE if lane == lanes - 1 else LineType.NONE,
            ]
            net.add_lane(
                *nodes_str,
                StraightLane(origin, end, line_types=line_types, speed_limit=speed_limit),
            )
        return net

    # ------------------------------------------------------------------ #
    # compilation
    # ------------------------------------------------------------------ #
    def build(self, dtype=np.float32) -> LaneGeometry:
        L = sum(len(v) for v in self._edges.values())
        assert L > 0, "empty road network"

        f32 = dtype
        kind = np.zeros(L, np.int32)
        start = np.zeros((L, 2), f32)
        end = np.zeros((L, 2), f32)
        direction = np.zeros((L, 2), f32)
        direction_lateral = np.zeros((L, 2), f32)
        heading0 = np.zeros(L, f32)
        amplitude = np.zeros(L, f32)
        pulsation = np.zeros(L, f32)
        phase = np.zeros(L, f32)
        center = np.zeros((L, 2), f32)
        radius = np.ones(L, f32)
        start_phase = np.zeros(L, f32)
        cw = np.ones(L, f32)
        width = np.full(L, DEFAULT_WIDTH, f32)
        length = np.zeros(L, f32)
        speed_limit = np.full(L, np.inf, f32)
        forbidden = np.zeros(L, bool)
        priority = np.zeros(L, np.int32)
        line_types = np.zeros((L, 2), np.int32)
        from_node = np.zeros(L, np.int32)
        to_node = np.zeros(L, np.int32)
        lane_id = np.zeros(L, np.int32)
        edge_id = np.zeros(L, np.int32)
        edge_base = np.zeros(L, np.int32)
        edge_n = np.zeros(L, np.int32)

        edge_keys = list(self._edges.keys())
        edge_bases = {}
        g = 0
        for e, key in enumerate(edge_keys):
            edge_bases[key] = g
            for i, lane in enumerate(self._edges[key]):
                kind[g] = lane.kind
                width[g] = lane.width
                length[g] = lane.length
                speed_limit[g] = (
                    np.inf if lane.speed_limit is None else lane.speed_limit
                )
                forbidden[g] = lane.forbidden
                priority[g] = lane.priority
                lt = list(lane.line_types)[:2]
                line_types[g] = [int(x) for x in lt] if len(lt) == 2 else [1, 1]
                from_node[g] = self._node_ids[key[0]]
                to_node[g] = self._node_ids[key[1]]
                lane_id[g] = i
                edge_id[g] = e
                edge_n[g] = len(self._edges[key])
                if lane.kind in (STRAIGHT, SINE):
                    start[g] = lane.start
                    end[g] = lane.end
                    direction[g] = lane.direction
                    direction_lateral[g] = lane.direction_lateral
                    heading0[g] = lane.heading
                    if lane.kind == SINE:
                        amplitude[g] = lane.amplitude
                        pulsation[g] = lane.pulsation
                        phase[g] = lane.phase
                elif lane.kind == CIRCULAR:
                    center[g] = lane.center
                    radius[g] = lane.radius
                    start_phase[g] = lane.start_phase
                    cw[g] = lane.direction
                # POLY lanes are stored via the sample bank below
                g += 1
        for e, key in enumerate(edge_keys):
            base = edge_bases[key]
            n = len(self._edges[key])
            edge_base[base : base + n] = base

        # successor / predecessor edge tables.  Successors follow per-node
        # edge insertion (reference: graph[_to].values(), road.py:505-510);
        # predecessors follow the FROM-node's first appearance as an outer
        # graph key (reference: `for to_dict in graph.values()`,
        # road.py:520-529) — PARITY #10, resolved round 4: the orders
        # differ whenever a later-inserted predecessor edge originates from
        # an earlier-seen node.
        from_rank: dict[int, int] = {}
        for key in edge_keys:
            from_rank.setdefault(self._node_ids[key[0]], len(from_rank))
        succ_of_node: dict[int, list[tuple[int, int]]] = {}
        pred_raw: dict[int, list[tuple[int, int, int]]] = {}
        for key in edge_keys:
            b = edge_bases[key]
            n = len(self._edges[key])
            fn, tn = self._node_ids[key[0]], self._node_ids[key[1]]
            succ_of_node.setdefault(fn, []).append((b, n))
            pred_raw.setdefault(tn, []).append((from_rank[fn], b, n))
        pred_of_node: dict[int, list[tuple[int, int]]] = {
            tn: [(b, n) for _, b, n in sorted(entries)]
            for tn, entries in pred_raw.items()
        }

        S = max(1, max((len(v) for v in succ_of_node.values()), default=1))
        P = max(1, max((len(v) for v in pred_of_node.values()), default=1))
        succ_edge_base = np.full((L, S), -1, np.int32)
        succ_edge_n = np.zeros((L, S), np.int32)
        pred_edge_base = np.full((L, P), -1, np.int32)
        pred_edge_n = np.zeros((L, P), np.int32)
        for g_idx in range(L):
            for j, (b, n) in enumerate(succ_of_node.get(int(to_node[g_idx]), [])):
                succ_edge_base[g_idx, j] = b
                succ_edge_n[g_idx, j] = n
            for j, (b, n) in enumerate(pred_of_node.get(int(from_node[g_idx]), [])):
                pred_edge_base[g_idx, j] = b
                pred_edge_n[g_idx, j] = n

        # connected-lane neighbour-search candidates (road/road.py:505-529):
        # per lane: itself (offset 0), each successor edge's lane of the same
        # id (or lane 0) at offset +own_length, each predecessor edge's lane
        # (same rule) at offset -pred_length
        K = 1 + S + P
        conn_lanes = np.full((L, K), -1, np.int32)
        conn_offsets = np.zeros((L, K), dtype)
        for g_idx in range(L):
            conn_lanes[g_idx, 0] = g_idx
            lid = lane_id[g_idx]
            col = 1
            for j in range(S):
                b, n = succ_edge_base[g_idx, j], succ_edge_n[g_idx, j]
                if b < 0 or n == 0:
                    continue
                conn_lanes[g_idx, col] = b + (lid if lid < n else 0)
                conn_offsets[g_idx, col] = length[g_idx]
                col += 1
            for j in range(P):
                b, n = pred_edge_base[g_idx, j], pred_edge_n[g_idx, j]
                if b < 0 or n == 0:
                    continue
                prev = b + (lid if lid < n else 0)
                conn_lanes[g_idx, col] = prev
                conn_offsets[g_idx, col] = -length[prev]
                col += 1

        # poly-lane sample bank (dummy 1-entry bank when absent)
        poly_lanes = [
            (g_idx, lane)
            for g_idx, lane in enumerate(
                lane for lanes_ in self._edges.values() for lane in lanes_
            )
            if lane.kind == POLY
        ]
        poly_slot = np.full(L, -1, np.int32)
        if poly_lanes:
            P = len(poly_lanes)
            S = max(len(lane.curve.s_samples) for _, lane in poly_lanes)
            C = max(len(lane.curve.cp_s) for _, lane in poly_lanes)
            Sw = max(max(len(lane.width_samples()) for _, lane in poly_lanes), S)
            poly_pos = np.zeros((P, S, 2), f32)
            poly_normal = np.zeros((P, S, 2), f32)
            poly_n = np.zeros(P, np.int32)
            poly_cp_s = np.full((P, C), np.inf, f32)
            poly_cp_x = np.zeros((P, C), f32)
            poly_cp_y = np.zeros((P, C), f32)
            poly_cp_n = np.zeros(P, np.int32)
            poly_width = np.zeros((P, Sw), f32)
            for p, (g_idx, lane) in enumerate(poly_lanes):
                poly_slot[g_idx] = p
                n = len(lane.curve.s_samples)
                poly_pos[p, :n] = lane.curve.pose_pos
                poly_pos[p, n:] = lane.curve.pose_pos[-1]
                poly_normal[p, :n] = lane.curve.pose_normal
                poly_normal[p, n:] = lane.curve.pose_normal[-1]
                poly_n[p] = n
                c_n = len(lane.curve.cp_s)
                poly_cp_s[p, :c_n] = lane.curve.cp_s
                poly_cp_x[p, :c_n] = lane.curve.cp_x
                poly_cp_x[p, c_n:] = lane.curve.cp_x[-1]
                poly_cp_y[p, :c_n] = lane.curve.cp_y
                poly_cp_y[p, c_n:] = lane.curve.cp_y[-1]
                poly_cp_n[p] = c_n
                ws = lane.width_samples()
                poly_width[p, : len(ws)] = ws
                poly_width[p, len(ws):] = ws[-1]
        else:
            poly_pos = np.zeros((1, 1, 2), f32)
            poly_normal = np.tile(np.asarray([[1.0, 0.0]], f32), (1, 1)).reshape(
                1, 1, 2
            )
            poly_n = np.ones(1, np.int32)
            poly_cp_s = np.zeros((1, 2), f32)
            poly_cp_s[0, 1] = 1.0
            poly_cp_x = np.zeros((1, 2), f32)
            poly_cp_y = np.zeros((1, 2), f32)
            poly_cp_n = np.full(1, 2, np.int32)
            poly_width = np.full((1, 1), DEFAULT_WIDTH, f32)

        # NOTE: tables stay in host numpy (see lane.Table): lane kernels
        # consume them as trace-time constants, so jit embeds the small
        # tables directly in the program with no device transfers at
        # lowering time.
        from highwayenv_tpu.road.lane import Table

        return LaneGeometry(
            kind=Table(kind),
            start=Table(start),
            end=Table(end),
            direction=Table(direction.astype(f32)),
            direction_lateral=Table(direction_lateral.astype(f32)),
            heading0=Table(heading0),
            amplitude=Table(amplitude),
            pulsation=Table(pulsation),
            phase=Table(phase),
            center=Table(center),
            radius=Table(radius),
            start_phase=Table(start_phase),
            cw=Table(cw),
            width=Table(width),
            length=Table(length),
            speed_limit=Table(speed_limit),
            forbidden=Table(forbidden),
            priority=Table(priority),
            line_types=Table(line_types),
            from_node=Table(from_node),
            to_node=Table(to_node),
            lane_id=Table(lane_id),
            edge_id=Table(edge_id),
            edge_base=Table(edge_base),
            edge_n=Table(edge_n),
            succ_edge_base=Table(succ_edge_base),
            succ_edge_n=Table(succ_edge_n),
            pred_edge_base=Table(pred_edge_base),
            pred_edge_n=Table(pred_edge_n),
            conn_lanes=Table(conn_lanes),
            conn_offsets=Table(conn_offsets),
            poly_slot=Table(poly_slot),
            poly_pos=Table(poly_pos),
            poly_normal=Table(poly_normal),
            poly_n=Table(poly_n),
            poly_cp_s=Table(poly_cp_s),
            poly_cp_x=Table(poly_cp_x),
            poly_cp_y=Table(poly_cp_y),
            poly_cp_n=Table(poly_cp_n),
            poly_width=Table(poly_width),
        )
