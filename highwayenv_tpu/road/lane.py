"""Lane geometry as a structure-of-arrays table + branch-free vectorized kernels.

The reference (highway_env/road/lane.py) models each lane as a Python object
with virtual methods ``position``/``local_coordinates``/``heading_at``.  The
TPU-native design compiles the whole road network at build time into a single
``LaneGeometry`` table of arrays; every lane op is then a gather + elementwise
computation switched on the lane-type enum, safe under jit/vmap and trivially
batched over (vehicles x lanes) products.

Geometry math reproduced from the reference:
  - StraightLane   road/lane.py:159-233
  - SineLane       road/lane.py:236-308
  - CircularLane   road/lane.py:311-384
  - on_lane / is_reachable_from / after_end / distance_with_heading
                   road/lane.py:80-147
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from highwayenv_tpu.utils.math import wrap_to_pi

# Lane type enum
STRAIGHT = 0
SINE = 1
CIRCULAR = 2
POLY = 3  # piecewise-linear spline lane (road/lane.py:387-529)

# AbstractLane constants (road/lane.py:16-17)
DEFAULT_WIDTH = 4.0
VEHICLE_LENGTH = 5.0

# LineType enum (road/lane.py:150-156)
LINE_NONE = 0
LINE_STRIPED = 1
LINE_CONTINUOUS = 2
LINE_CONTINUOUS_LINE = 3


class Table:
    """A host-numpy lane-attribute table indexable by traced arrays.

    Under jit, ``table[traced_idx]`` lowers to a gather whose operand is a
    host-numpy constant — embedded in the program at compile time with no
    device round trip (critical when the chip sits behind a high-latency
    tunnel; fetching per-constant device values during MLIR lowering cost
    ~40 s each).  Indices are clipped (callers pre-clip padding ids).
    """

    __slots__ = ("a",)

    def __init__(self, a):
        import numpy as _np

        self.a = _np.asarray(a)

    def __getitem__(self, idx):
        if isinstance(idx, (int, slice)) or (
            isinstance(idx, tuple) and all(isinstance(i, (int, slice)) for i in idx)
        ):
            return self.a[idx]
        import numpy as _np

        if isinstance(idx, _np.ndarray):
            return self.a[_np.clip(idx, 0, self.a.shape[0] - 1)]
        # Traced indices: select-reduce over the (small) table instead of a
        # gather — gathers break XLA fusion on TPU and dominated HBM traffic.
        # where/sum (not one-hot multiply) so rows containing inf stay exact.
        L = self.a.shape[0]
        if L > 64:  # large banks: a real gather is cheaper
            return jnp.take(self.a, idx, axis=0, mode="clip")
        oh = idx[..., None] == jnp.arange(L)  # (..., L)
        tab = jnp.asarray(self.a)
        if tab.ndim > 1:
            oh = oh.reshape(oh.shape + (1,) * (tab.ndim - 1))
        if tab.dtype == jnp.bool_:
            return jnp.any(oh & tab, axis=-tab.ndim)
        return jnp.sum(
            jnp.where(oh, tab, jnp.zeros((), tab.dtype)), axis=-tab.ndim
        )

    def __array__(self, dtype=None):
        return self.a if dtype is None else self.a.astype(dtype)

    @property
    def shape(self):
        return self.a.shape

    @property
    def dtype(self):
        return self.a.dtype


class LaneGeometry(NamedTuple):
    """Static per-lane geometry + graph tables. All arrays have leading dim L.

    Fields are ``Table``-wrapped host arrays (see Table).  Lanes belonging to
    the same edge (same (from,to) road) occupy contiguous global indices;
    ``edge_base`` is the global index of the edge's lane 0 so
    ``global_id = edge_base + local_id``.
    """

    kind: jnp.ndarray  # (L,) int32: STRAIGHT / SINE / CIRCULAR
    # straight / sine parameters
    start: jnp.ndarray  # (L,2)
    end: jnp.ndarray  # (L,2)
    direction: jnp.ndarray  # (L,2) unit vector along the (straight) axis
    direction_lateral: jnp.ndarray  # (L,2) left-normal
    heading0: jnp.ndarray  # (L,) heading of the straight axis
    amplitude: jnp.ndarray  # (L,) sine amplitude
    pulsation: jnp.ndarray  # (L,) sine pulsation [rad/m]
    phase: jnp.ndarray  # (L,) sine phase [rad]
    # circular parameters
    center: jnp.ndarray  # (L,2)
    radius: jnp.ndarray  # (L,)
    start_phase: jnp.ndarray  # (L,)
    cw: jnp.ndarray  # (L,) +1 clockwise / -1 counter-clockwise
    # common attributes
    width: jnp.ndarray  # (L,)
    length: jnp.ndarray  # (L,)
    speed_limit: jnp.ndarray  # (L,) +inf when unlimited
    forbidden: jnp.ndarray  # (L,) bool
    priority: jnp.ndarray  # (L,) int32
    line_types: jnp.ndarray  # (L,2) int32, for rendering parity
    # graph structure
    from_node: jnp.ndarray  # (L,) int32
    to_node: jnp.ndarray  # (L,) int32
    lane_id: jnp.ndarray  # (L,) int32 local id within its edge
    edge_id: jnp.ndarray  # (L,) int32
    edge_base: jnp.ndarray  # (L,) int32 global index of edge's lane 0
    edge_n: jnp.ndarray  # (L,) int32 number of lanes on this edge
    # successor edges (edges departing from to_node), padded with -1
    succ_edge_base: jnp.ndarray  # (L,S) int32 global base lane of successor edge
    succ_edge_n: jnp.ndarray  # (L,S) int32 lane count of successor edge
    # predecessor edges (edges arriving at from_node), padded with -1
    pred_edge_base: jnp.ndarray  # (L,P) int32
    pred_edge_n: jnp.ndarray  # (L,P) int32
    # connected-lane neighbour-search candidates (road/road.py:505-529):
    # per lane, [self, successor lanes (same id or 0), predecessor lanes]
    # with longitudinal offsets into the query lane's frame
    conn_lanes: jnp.ndarray  # (L,K) int32, -1 pad
    conn_offsets: jnp.ndarray  # (L,K) f32
    # poly-lane sample bank (dummy 1-entry bank when no poly lanes exist):
    # per lane an index into (P, S) pose tables and (P, C) control points
    poly_slot: jnp.ndarray  # (L,) int32, -1 = not a poly lane
    poly_pos: jnp.ndarray  # (P,S,2) 1 m pose samples
    poly_normal: jnp.ndarray  # (P,S,2) unit tangents
    poly_n: jnp.ndarray  # (P,) valid sample counts
    poly_cp_s: jnp.ndarray  # (P,C) control-point arc lengths (pad: +inf)
    poly_cp_x: jnp.ndarray  # (P,C)
    poly_cp_y: jnp.ndarray  # (P,C)
    poly_cp_n: jnp.ndarray  # (P,) control-point counts
    poly_width: jnp.ndarray  # (P,S) per-sample widths (PolyLane variable width)

    @property
    def num_lanes(self) -> int:
        return self.kind.shape[0]


def _gather(geo: LaneGeometry, lane: jnp.ndarray):
    """Clip lane indices into range (callers mask invalid lanes themselves)."""
    return jnp.clip(lane, 0, geo.kind.shape[0] - 1)


class LaneParams(NamedTuple):
    """Per-query analytic lane parameters (straight/sine/circular kernels).

    Fetched either by gather (:func:`gather_params`) or by a gather-free
    one-hot mask+sum select (:func:`select_params`); the two are exactly
    equal element-wise, so the geometry cores below produce bitwise-equal
    results from either fetch.
    """

    kind: jnp.ndarray
    start: jnp.ndarray
    direction: jnp.ndarray
    direction_lateral: jnp.ndarray
    heading0: jnp.ndarray
    amplitude: jnp.ndarray
    pulsation: jnp.ndarray
    phase: jnp.ndarray
    center: jnp.ndarray
    radius: jnp.ndarray
    start_phase: jnp.ndarray
    cw: jnp.ndarray


def gather_params(geo: LaneGeometry, li: jnp.ndarray) -> LaneParams:
    """Param fetch by table gather (li pre-clipped by _gather)."""
    return LaneParams(
        *(getattr(geo, f)[li] for f in LaneParams._fields)
    )


def select_table(tab, lane: jnp.ndarray, L: int):
    """Gather-free ``tab[lane]``: one-hot mask+sum over the static L axis.

    Exact (the one-hot picks a single addend; jnp.where keeps inf/NaN table
    entries out of the masked-off lanes).  Use inside fused frame / tick
    kernels where a real gather would break XLA elementwise fusion on TPU —
    the same op-form finding as the (V,V) row fetches in
    vehicle/behavior.py (BASELINE.md, general-path lookup rewrite).
    """
    li = jnp.clip(lane, 0, L - 1)
    oh = li[..., None] == jnp.arange(L, dtype=li.dtype)  # (..., L)
    a = jnp.asarray(tab.a if isinstance(tab, Table) else tab)
    if a.ndim == 1:
        return jnp.sum(jnp.where(oh, a, jnp.zeros((), a.dtype)), axis=-1)
    return jnp.sum(jnp.where(oh[..., None], a, jnp.zeros((), a.dtype)), axis=-2)


def select_params(geo: LaneGeometry, lane: jnp.ndarray) -> LaneParams:
    """Gather-free LaneParams fetch (see select_table).  One one-hot mask is
    shared by all fields so the whole fetch is a single fused mask+sum pass."""
    L = geo.num_lanes
    li = jnp.clip(lane, 0, L - 1)
    oh = li[..., None] == jnp.arange(L, dtype=li.dtype)  # (..., L)

    def sel(tab):
        a = jnp.asarray(tab.a)
        if a.ndim == 1:
            return jnp.sum(jnp.where(oh, a, jnp.zeros((), a.dtype)), axis=-1)
        return jnp.sum(
            jnp.where(oh[..., None], a, jnp.zeros((), a.dtype)), axis=-2
        )

    return LaneParams(*(sel(getattr(geo, f)) for f in LaneParams._fields))


# --------------------------------------------------------------------------- #
# analytic geometry cores (shared by the gather- and select-fetched paths)
# --------------------------------------------------------------------------- #


def _position_core(p: LaneParams, s: jnp.ndarray, lat: jnp.ndarray):
    lat_eff = jnp.where(
        p.kind == SINE,
        lat + p.amplitude * jnp.sin(p.pulsation * s + p.phase),
        lat,
    )
    p_str = (
        p.start
        + s[..., None] * p.direction
        + lat_eff[..., None] * p.direction_lateral
    )
    phi = p.cw * s / p.radius + p.start_phase
    p_cir = p.center + (p.radius - lat * p.cw)[..., None] * jnp.stack(
        [jnp.cos(phi), jnp.sin(phi)], axis=-1
    )
    return jnp.where((p.kind == CIRCULAR)[..., None], p_cir, p_str)


def _heading_core(p: LaneParams, s: jnp.ndarray):
    h_sin = p.heading0 + jnp.arctan(
        p.amplitude * p.pulsation * jnp.cos(p.pulsation * s + p.phase)
    )
    phi = p.cw * s / p.radius + p.start_phase
    h_cir = phi + jnp.pi / 2 * p.cw
    return jnp.where(
        p.kind == CIRCULAR, h_cir, jnp.where(p.kind == SINE, h_sin, p.heading0)
    )


def _local_core(p: LaneParams, pos: jnp.ndarray):
    delta = pos - p.start
    if pos.dtype == jnp.float64:
        # f64 parity path: bitwise-match the reference's np.dot (BLAS ddot
        # fma accumulation) — see utils/math.py::dot2_ref.  lateral on
        # circular lanes cancels catastrophically, so the last ulp of the
        # dot decides the trace.
        from highwayenv_tpu.utils.math import dot2_ref

        s_str = dot2_ref(
            delta[..., 0], delta[..., 1],
            p.direction[..., 0], p.direction[..., 1],
        )
        r_str = dot2_ref(
            delta[..., 0], delta[..., 1],
            p.direction_lateral[..., 0], p.direction_lateral[..., 1],
        )
    else:
        s_str = jnp.einsum(
            "...d,...d->...", delta, p.direction, precision="highest"
        )
        r_str = jnp.einsum(
            "...d,...d->...", delta, p.direction_lateral, precision="highest"
        )
    r_sin = r_str - p.amplitude * jnp.sin(p.pulsation * s_str + p.phase)
    dc = pos - p.center
    phi = jnp.arctan2(dc[..., 1], dc[..., 0])
    sp = p.start_phase
    phi = sp + wrap_to_pi(phi - sp)
    if pos.dtype == jnp.float64:
        from highwayenv_tpu.utils.math import dot2_ref

        r = jnp.sqrt(dot2_ref(dc[..., 0], dc[..., 1], dc[..., 0], dc[..., 1]))
    else:
        r = jnp.linalg.norm(dc, axis=-1)
    s_cir = p.cw * (phi - sp) * p.radius
    r_cir = p.cw * (p.radius - r)
    s = jnp.where(p.kind == CIRCULAR, s_cir, s_str)
    lat = jnp.where(
        p.kind == CIRCULAR, r_cir, jnp.where(p.kind == SINE, r_sin, r_str)
    )
    return s, lat


def has_poly(geo: LaneGeometry) -> bool:
    """Static: does this network contain any POLY lanes?"""
    return geo.poly_pos.shape[0] > 1 or bool(np.any(np.asarray(geo.poly_slot) >= 0))


def position_select(geo: LaneGeometry, lane, s, lat):
    """Gather-free :func:`position` for analytic-only networks; falls back
    to the gather form when POLY lanes exist (their sample banks need real
    gathers anyway)."""
    if has_poly(geo):
        return position(geo, lane, s, lat)
    return _position_core(select_params(geo, lane), s, lat)


def heading_at_select(geo: LaneGeometry, lane, s):
    if has_poly(geo):
        return heading_at(geo, lane, s)
    return _heading_core(select_params(geo, lane), s)


def local_coordinates_select(geo: LaneGeometry, lane, pos):
    if has_poly(geo):
        return local_coordinates(geo, lane, pos)
    return _local_core(select_params(geo, lane), pos)


def _poly_slot(geo: LaneGeometry, li):
    return jnp.clip(geo.poly_slot[li], 0, geo.poly_pos.shape[0] - 1)


def _poly_interp(geo: LaneGeometry, p, s):
    """Linear interp + end extrapolation over control points
    (road/spline.py:6-33).  p: (...,) bank slots; s: (...,).  Returns x, y."""
    cp_s = geo.poly_cp_s[p]  # (...,C) padded +inf
    cp_n = geo.poly_cp_n[p]
    C = cp_s.shape[-1]
    cols = jnp.arange(C)
    count = jnp.sum(
        (cp_s <= s[..., None]) & (cols < cp_n[..., None]), axis=-1
    )
    k = jnp.clip(count - 1, 0, jnp.maximum(cp_n - 2, 0))

    def take(tab, idx):
        return jnp.take_along_axis(tab, idx[..., None], axis=-1)[..., 0]

    s0 = take(cp_s, k)
    s1 = take(cp_s, k + 1)
    t = (s - s0) / jnp.where(s1 == s0, 1.0, s1 - s0)
    x = take(geo.poly_cp_x[p], k) + t * (
        take(geo.poly_cp_x[p], k + 1) - take(geo.poly_cp_x[p], k)
    )
    y = take(geo.poly_cp_y[p], k) + t * (
        take(geo.poly_cp_y[p], k + 1) - take(geo.poly_cp_y[p], k)
    )
    return x, y


def _poly_segment_normal(geo: LaneGeometry, p, s):
    """Unit tangent of the 1 m pose segment for s (road/spline.py:108-117)."""
    n = geo.poly_n[p]
    seg = jnp.clip(jnp.floor(s).astype(jnp.int32), 0, n - 1)
    normal = jnp.take_along_axis(
        geo.poly_normal[p], seg[..., None, None], axis=-2
    )[..., 0, :]
    return normal


def _poly_frenet(geo: LaneGeometry, p, pos):
    """cartesian_to_frenet (road/spline.py:73-97): last pose (highest index
    >= 1) with non-negative normal projection wins; pose 0 is the fallback."""
    samples = geo.poly_pos[p]  # (...,S,2)
    normals = geo.poly_normal[p]
    S = samples.shape[-2]
    idxs = jnp.arange(S)
    delta = pos[..., None, :] - samples
    proj = jnp.einsum("...sd,...sd->...s", normals, delta, precision="highest")
    ortho_x, ortho_y = -normals[..., 1], normals[..., 0]
    lat_all = ortho_x * delta[..., 0] + ortho_y * delta[..., 1]
    valid = (idxs >= 1) & (idxs < geo.poly_n[p][..., None]) & (proj >= 0)
    idx = jnp.max(jnp.where(valid, idxs, 0), axis=-1)  # 0 = fallback pose

    def take(tab):
        return jnp.take_along_axis(tab, idx[..., None], axis=-1)[..., 0]

    s = idx.astype(proj.dtype) + take(proj)  # s_samples are 1 m apart
    return s, take(lat_all)


def local_coordinates(geo: LaneGeometry, lane: jnp.ndarray, pos: jnp.ndarray):
    """(longitudinal, lateral) lane coordinates of world positions.

    lane: (...,) int32; pos: (...,2). Returns two (...,) arrays.
    Straight: road/lane.py:209-213; Sine: 282-286; Circular: 355-362;
    Poly: 414-417 (sampled Frenet).
    """
    li = _gather(geo, lane)
    s, lat = _local_core(gather_params(geo, li), pos)

    if has_poly(geo):
        kind = geo.kind[li]
        s_pol, lat_pol = _poly_frenet(geo, _poly_slot(geo, li), pos)
        s = jnp.where(kind == POLY, s_pol, s)
        lat = jnp.where(kind == POLY, lat_pol, lat)
    return s, lat


def position(geo: LaneGeometry, lane: jnp.ndarray, s: jnp.ndarray, lat: jnp.ndarray):
    """World position at local lane coordinates. Returns (...,2)."""
    li = _gather(geo, lane)
    kind = geo.kind[li]
    out = _position_core(gather_params(geo, li), s, lat)

    if has_poly(geo):
        # PolyLaneFixedWidth.position (road/lane.py:409-412): control-point
        # interpolation + lateral offset along the pose orthonormal
        p = _poly_slot(geo, li)
        x, y = _poly_interp(geo, p, s)
        nrm = _poly_segment_normal(geo, p, s)
        p_pol = jnp.stack(
            [x - nrm[..., 1] * lat, y + nrm[..., 0] * lat], axis=-1
        )
        out = jnp.where((kind == POLY)[..., None], p_pol, out)
    return out


def heading_at(geo: LaneGeometry, lane: jnp.ndarray, s: jnp.ndarray):
    li = _gather(geo, lane)
    out = _heading_core(gather_params(geo, li), s)
    if has_poly(geo):
        kind = geo.kind[li]
        nrm = _poly_segment_normal(geo, _poly_slot(geo, li), s)
        out = jnp.where(
            kind == POLY, jnp.arctan2(nrm[..., 1], nrm[..., 0]), out
        )
    return out


def width_at(geo: LaneGeometry, lane: jnp.ndarray, s: jnp.ndarray):
    li = _gather(geo, lane)
    out = geo.width[li]
    if geo.poly_pos.shape[0] > 1 or bool(np.any(np.asarray(geo.poly_slot) >= 0)):
        # PolyLane variable width: sample at int(s) (road/lane.py:473-480)
        p = _poly_slot(geo, li)
        n = geo.poly_n[p]
        idx = jnp.clip(jnp.floor(s).astype(jnp.int32), 0, n - 1)
        w_pol = jnp.take_along_axis(
            geo.poly_width[p], idx[..., None], axis=-1
        )[..., 0]
        out = jnp.where(geo.kind[li] == POLY, w_pol, out)
    return out


def on_lane(
    geo: LaneGeometry,
    lane: jnp.ndarray,
    s: jnp.ndarray,
    lat: jnp.ndarray,
    margin: float = 0.0,
):
    """road/lane.py:80-102 with precomputed local coordinates."""
    li = _gather(geo, lane)
    return (
        (jnp.abs(lat) <= width_at(geo, lane, s) / 2 + margin)
        & (-VEHICLE_LENGTH <= s)
        & (s < geo.length[li] + VEHICLE_LENGTH)
    )


def is_reachable_from(geo: LaneGeometry, lane: jnp.ndarray, pos: jnp.ndarray):
    """road/lane.py:104-118."""
    li = _gather(geo, lane)
    s, lat = local_coordinates(geo, lane, pos)
    close = (
        (jnp.abs(lat) <= 2 * geo.width[li])
        & (0 <= s)
        & (s < geo.length[li] + VEHICLE_LENGTH)
    )
    return close & ~geo.forbidden[li]


def after_end(geo: LaneGeometry, lane: jnp.ndarray, s: jnp.ndarray):
    """road/lane.py:120-125."""
    li = _gather(geo, lane)
    return s > geo.length[li] - VEHICLE_LENGTH / 2


def distance(geo: LaneGeometry, lane: jnp.ndarray, pos: jnp.ndarray):
    """L1-ish distance from a position to the lane (road/lane.py:127-130)."""
    li = _gather(geo, lane)
    s, r = local_coordinates(geo, lane, pos)
    return (
        jnp.abs(r)
        + jnp.maximum(s - geo.length[li], 0.0)
        + jnp.maximum(0.0 - s, 0.0)
    )


def local_angle(geo: LaneGeometry, lane: jnp.ndarray, heading, s):
    """road/lane.py:145-147."""
    return wrap_to_pi(heading - heading_at(geo, lane, s))


def distance_with_heading(
    geo: LaneGeometry,
    lane: jnp.ndarray,
    pos: jnp.ndarray,
    heading: jnp.ndarray,
    heading_weight: float = 1.0,
):
    """road/lane.py:132-143."""
    li = _gather(geo, lane)
    s, r = local_coordinates(geo, lane, pos)
    angle = jnp.abs(local_angle(geo, lane, heading, s))
    return (
        jnp.abs(r)
        + jnp.maximum(s - geo.length[li], 0.0)
        + jnp.maximum(0.0 - s, 0.0)
        + heading_weight * angle
    )


def closest_lane(geo: LaneGeometry, pos: jnp.ndarray, heading: jnp.ndarray):
    """Global index of the lane minimizing distance_with_heading.

    Vectorized replacement of RoadNetwork.get_closest_lane_index
    (road/road.py:55-71): the O(lanes) scan becomes one broadcast over the
    (..., L) product with an argmin (first-minimum tie-break like np.argmin).
    """
    L = geo.num_lanes
    all_lanes = jnp.arange(L, dtype=jnp.int32)
    d = distance_with_heading(geo, all_lanes, pos[..., None, :], heading[..., None])
    return jnp.argmin(d, axis=-1).astype(jnp.int32)


# --------------------------------------------------------------------------- #
# per-frame projection table
# --------------------------------------------------------------------------- #


def projection_table(geo: LaneGeometry, pos: jnp.ndarray):
    """(s, lat) of every object on every lane: pos (...,V,2) -> two (...,L,V).

    The engine computes this once per simulation frame; every subsequent
    lane-projection query (neighbour search, IDM gaps, MOBIL conflicts, lane
    re-localization) becomes a one-hot contraction against the table instead
    of an independent O(V^2) trigonometric pass.

    Layout note: lanes-major (L, V) so the minormost axis is the (large)
    vehicle axis — TPU tiles pad the last dim to 128 and a trailing L=4 axis
    wasted ~30x HBM traffic.
    """
    L = geo.num_lanes
    all_lanes = jnp.arange(L, dtype=jnp.int32)
    return local_coordinates(
        geo, all_lanes[..., :, None], pos[..., None, :, :]
    )


def heading_table(geo: LaneGeometry, s_table: jnp.ndarray):
    """Lane heading at the table's longitudinal coordinates: (...,L,V)."""
    L = geo.num_lanes
    all_lanes = jnp.arange(L, dtype=jnp.int32)
    return heading_at(geo, all_lanes[..., :, None], s_table)


def closest_lane_from_table(
    geo: LaneGeometry,
    s_table: jnp.ndarray,
    lat_table: jnp.ndarray,
    heading: jnp.ndarray,
    heading_weight: float = 1.0,
):
    """closest_lane reusing a precomputed (L, V) projection table."""
    L = geo.num_lanes
    all_lanes = jnp.arange(L, dtype=jnp.int32)
    lane_len = geo.length[all_lanes][..., :, None]
    angle = jnp.abs(
        wrap_to_pi(heading[..., None, :] - heading_table(geo, s_table))
    )
    d = (
        jnp.abs(lat_table)
        + jnp.maximum(s_table - lane_len, 0.0)
        + jnp.maximum(-s_table, 0.0)
        + heading_weight * angle
    )
    return jnp.argmin(d, axis=-2).astype(jnp.int32)


def lane_onehot(lane_idx: jnp.ndarray, L: int, dtype=jnp.float32):
    """(..., K) lane ids -> (..., L, K) one-hot (lanes-major)."""
    return (
        lane_idx[..., None, :] == jnp.arange(L, dtype=lane_idx.dtype)[:, None]
    ).astype(dtype)


def onehot_take(tab: jnp.ndarray, idx: jnp.ndarray):
    """take_along_axis over a SMALL trailing axis as a one-hot select:
    tab (..., K), idx (...,) -> (...,).

    Gathers break XLA fusion on TPU; inside the frame scan a single stray
    take_along_axis measurably serializes the whole step (regulation's
    route-prediction gathers alone cost ~45% of the intersection step)."""
    K = tab.shape[-1]
    oh = idx[..., None] == jnp.arange(K, dtype=idx.dtype)
    return jnp.sum(jnp.where(oh, tab, 0), axis=-1)


def row_lookup(table: jnp.ndarray, lane_idx: jnp.ndarray):
    """Row-aligned lane select: table (...,L,V), lane_idx (...,V) -> (...,V).

    One-hot multiply-reduce instead of a gather: fuses into neighbouring
    elementwise ops (TPU gathers break fusion and dominated the frame's HBM
    traffic)."""
    L = table.shape[-2]
    oh = lane_onehot(lane_idx, L, table.dtype)  # (...,L,V)
    return jnp.sum(table * oh, axis=-2)


def table_lookup(table: jnp.ndarray, vehicle_idx: jnp.ndarray, lane_idx: jnp.ndarray):
    """table (...,L,V) -> values at (vehicle_idx, lane_idx), both (...,K).

    Mask+sum select (VPU, exact f32, fuses with neighbours) — an MXU
    one-hot einsum at these degenerate sizes costs a 6-pass f32 matmul
    under precision=highest and breaks fusion."""
    V = table.shape[-1]
    ohv = (
        vehicle_idx[..., :, None] == jnp.arange(V, dtype=vehicle_idx.dtype)
    )  # (...,K,V)
    # rows[k, l] = table[l, vehicle_idx[k]]
    rows = jnp.sum(
        jnp.where(ohv[..., :, None, :], table[..., None, :, :], 0.0),
        axis=-1,
    )  # (...,K,L)
    return onehot_take(rows, lane_idx)


def pair_project(table: jnp.ndarray, query_lane: jnp.ndarray):
    """All-pairs projection: out[i, j] = table[query_lane[i], j].

    table (...,L,V), query_lane (...,V) -> (...,V,V).  Mask+sum over the
    (small) lane axis: exact f32 on the VPU and fusable, unlike the MXU
    one-hot matmul it replaces."""
    L = table.shape[-2]
    oh = query_lane[..., :, None] == jnp.arange(L, dtype=query_lane.dtype)
    return jnp.sum(
        jnp.where(oh[..., None], table[..., None, :, :], 0.0), axis=-2
    )
