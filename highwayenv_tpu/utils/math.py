"""Vectorized geometry / math kernels (L1 of the stack).

These are the TPU-native equivalents of the reference's scalar helpers
(``highway_env/utils.py``): every function here is pure jax.numpy, shape
polymorphic over leading batch dimensions, and safe under ``jit``/``vmap``.

Reference behaviors reproduced (file:line cites refer to the mounted
Farama-Foundation/HighwayEnv checkout):
  - ``wrap_to_pi``              utils.py:59-60
  - ``lmap``                    utils.py:31-33
  - ``not_zero``                utils.py:50-56
  - ``do_every``                utils.py:27-28
  - rotated-rect corner layout  utils.py:128-157, vehicle/objects.py:169-181
  - SAT polygon intersection    utils.py:177-241 (specialised to rectangles)
  - ray-rectangle distance      utils.py:388-416
"""

from __future__ import annotations

import jax.numpy as jnp


def wrap_to_pi(x: jnp.ndarray) -> jnp.ndarray:
    """Wrap angles to (-pi, pi]."""
    return ((x + jnp.pi) % (2 * jnp.pi)) - jnp.pi


def lmap(v, x, y):
    """Linear map of value v from range x=[x0,x1] to range y=[y0,y1]."""
    return y[0] + (v - x[0]) * (y[1] - y[0]) / (x[1] - x[0])


def not_zero(x: jnp.ndarray, eps: float = 1e-2) -> jnp.ndarray:
    """Replace near-zero values with +/-eps, keeping the sign (0 -> +eps)."""
    return jnp.where(
        jnp.abs(x) > eps,
        x,
        jnp.where(x >= 0, eps, -eps),
    )


def fma64(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Correctly-rounded float64 fused multiply-add ``round(a*b + c)``
    emulated with error-free transforms (Veltkamp two-prod + two-sum).

    The reference's ``np.dot`` on 2-vectors lowers to BLAS ddot whose FMA
    accumulation rounds differently from plain ``a*b + c``; on circular
    lanes ``lateral = radius - norm(delta)`` catastrophically cancels, so
    that single ulp is structurally amplified (u-turn x64 traces diverge
    30x per policy step from it).  This emulation is bitwise-equal to
    hardware fma (validated vs libm over 2M samples incl. near-total
    cancellation).  f64 parity path only — f32 throughput paths never call
    it.  Requires the backend not to re-associate the transforms: the x64
    parity harness pins ``--xla_backend_optimization_level=0``.
    """
    C = 134217729.0  # 2**27 + 1 (Veltkamp split)
    ca = C * a
    ah = ca - (ca - a)
    al = a - ah
    cb = C * b
    bh = cb - (cb - b)
    bl = b - bh
    p = a * b
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    s = p + c
    bb = s - p
    err = (p - (s - bb)) + (c - bb)
    return s + (e + err)


def dot2_ref(ax, ay, bx, by):
    """2-vector dot product with the reference's BLAS ddot rounding:
    ``fma(ay, by, ax*bx)`` (accumulator order x then y).  Use on the f64
    parity path wherever the reference calls ``np.dot``/``np.linalg.norm``
    on 2-vectors (lane local_coordinates, road/lane.py)."""
    return fma64(ay, by, ax * bx)


def do_every(duration: float, timer: jnp.ndarray) -> jnp.ndarray:
    return duration < timer


def constrain(x, a, b):
    return jnp.clip(x, a, b)


def direction(heading: jnp.ndarray) -> jnp.ndarray:
    """Unit heading vector(s); output shape heading.shape + (2,)."""
    return jnp.stack([jnp.cos(heading), jnp.sin(heading)], axis=-1)


def rect_corners(
    center: jnp.ndarray,
    length: jnp.ndarray,
    width: jnp.ndarray,
    angle: jnp.ndarray,
) -> jnp.ndarray:
    """Corners of rotated rectangles.

    center: (..., 2); length/width/angle: (...,).
    Returns (..., 4, 2) in the order used by the reference polygon()
    (vehicle/objects.py:169-181): (-l,-w), (-l,+w), (+l,+w), (+l,-w) halves.
    """
    hl = length[..., None] / 2.0
    hw = width[..., None] / 2.0
    # local corner offsets, (...,4,2)
    lx = jnp.concatenate([-hl, -hl, hl, hl], axis=-1)
    ly = jnp.concatenate([-hw, hw, hw, -hw], axis=-1)
    c = jnp.cos(angle)[..., None]
    s = jnp.sin(angle)[..., None]
    wx = c * lx - s * ly
    wy = s * lx + c * ly
    return center[..., None, :] + jnp.stack([wx, wy], axis=-1)


def point_in_rotated_rectangle(point, center, length, width, angle):
    """Is point inside the rotated rectangle? Broadcasts elementwise.

    Mirrors utils.py:77-93 (note the reference rotates by +angle rather
    than -angle; for the symmetric containment test this is equivalent to
    testing in a frame rotated the other way, and we reproduce it exactly).
    """
    c, s = jnp.cos(angle), jnp.sin(angle)
    d = point - center
    # reference applies R(angle) @ (p - c) with R = [[c,-s],[s,c]]
    rx = c * d[..., 0] - s * d[..., 1]
    ry = s * d[..., 0] + c * d[..., 1]
    return (
        (-length / 2 <= rx)
        & (rx <= length / 2)
        & (-width / 2 <= ry)
        & (ry <= width / 2)
    )


def _rect_probe_points(center, length, width, angle) -> jnp.ndarray:
    """Corners + edge midpoints + center of rotated rectangles: (..., 9, 2).

    The point set of rect_corners(include_midpoints=True, include_center=True)
    (utils.py:129-157).
    """
    hl = length[..., None] / 2.0
    hw = width[..., None] / 2.0
    z = jnp.zeros_like(hl)
    lx = jnp.concatenate([-hl, -hl, hl, hl, z, -hl, hl, z, z], axis=-1)
    ly = jnp.concatenate([-hw, hw, hw, -hw, z, z, z, -hw, hw], axis=-1)
    c = jnp.cos(angle)[..., None]
    s = jnp.sin(angle)[..., None]
    wx = c * lx - s * ly
    wy = s * lx + c * ly
    return center[..., None, :] + jnp.stack([wx, wy], axis=-1)


def rotated_rectangles_intersect(
    center_a, length_a, width_a, angle_a,
    center_b, length_b, width_b, angle_b,
) -> jnp.ndarray:
    """Corner/midpoint-containment intersection test (utils.py:115-174).

    Deliberately NOT a full SAT: the reference checks whether any of one
    rectangle's 9 probe points lies inside the other (both ways), and the
    RegulatedRoad conflict pass depends on these exact semantics.
    """

    def one_way(ca, la, wa, aa, cb, lb, wb, ab):
        pts = _rect_probe_points(ca, la, wa, aa)  # (...,9,2)
        inside = point_in_rotated_rectangle(
            pts, cb[..., None, :], lb[..., None], wb[..., None], ab[..., None]
        )
        return jnp.any(inside, axis=-1)

    return one_way(
        center_a, length_a, width_a, angle_a,
        center_b, length_b, width_b, angle_b,
    ) | one_way(
        center_b, length_b, width_b, angle_b,
        center_a, length_a, width_a, angle_a,
    )


def _rect_axes(angle: jnp.ndarray) -> jnp.ndarray:
    """The four signed edge-normal axes of a rectangle at `angle`: (...,4,2).

    Matches the reference's edge winding exactly (polygon corner order
    (-l,-w), (-l,+w), (+l,+w), (+l,-w) and normal (p1y-p2y, p2x-p1x),
    utils.py:213-215): [-u_len, +u_wid, +u_len, -u_wid].  The sign and order
    matter because interval_distance is asymmetric under axis negation for
    overlapping intervals and ties are broken by first minimum.
    """
    c, s = jnp.cos(angle), jnp.sin(angle)
    ux = jnp.stack([c, s], axis=-1)  # along length
    uy = jnp.stack([-s, c], axis=-1)  # along width
    return jnp.stack([-ux, uy, ux, -uy], axis=-2)


def _interval_distance(min_a, max_a, min_b, max_b):
    """Distance between intervals [minA,maxA], [minB,maxB]; negative if overlapping.

    utils.py:188-193.
    """
    return jnp.where(min_a < min_b, min_b - max_a, min_a - max_b)


def rects_intersecting(
    center_a,
    length_a,
    width_a,
    angle_a,
    center_b,
    length_b,
    width_b,
    angle_b,
    displacement_a=None,
    displacement_b=None,
):
    """Separating-axis test between two rotated rectangles, with velocity sweep.

    Vectorized equivalent of ``utils.are_polygons_intersecting`` (utils.py:196-241)
    specialised to rectangles: the 8 signed edge normals (reference winding
    order — duplicates and signs matter, see _rect_axes) with analytic
    half-extent projections.  The axis loop is unrolled in Python so no
    (..., 8, 2) broadcast tensor is ever materialized — peak temporaries stay
    at the (...,) pair-grid size, which is what lets the (B, V, V) collision
    pass fit in HBM at large batch.

    Returns (intersecting, will_intersect, translation) where translation is
    the minimum-translation vector applied as post-collision impact, valid
    where will_intersect is True.  All inputs broadcast over leading dims.
    """
    if displacement_a is None:
        displacement_a = jnp.zeros_like(center_a)
    if displacement_b is None:
        displacement_b = jnp.zeros_like(center_b)
    inter, will, tx, ty = rects_intersecting_xy(
        center_a[..., 0], center_a[..., 1], length_a, width_a, angle_a,
        center_b[..., 0], center_b[..., 1], length_b, width_b, angle_b,
        displacement_a[..., 0] - displacement_b[..., 0],
        displacement_a[..., 1] - displacement_b[..., 1],
    )
    return inter, will, jnp.stack([tx, ty], axis=-1)


def rects_intersecting_xy(
    dax, day, length_a, width_a, angle_a,
    dbx, dby, length_b, width_b, angle_b,
    relx=None, rely=None,
):
    """Component-wise core of :func:`rects_intersecting` — no trailing
    (..., 2) vector axes anywhere, so it is usable inside Pallas TPU kernels
    (a minor dim of 2 tiles catastrophically on the VPU).  ``relx/rely`` is
    the relative displacement (a - b) for the velocity sweep.  Returns
    (intersecting, will_intersect, tx, ty).

    This is the straight 8-signed-axis loop in the reference's winding
    order (utils.py:196-241).  Under XLA this form fuses best: the folded
    4-axis variant below, despite doing ~half the arithmetic, compiles
    ~2x SLOWER on the XLA general path (measured: intersection-v0 25.9k ->
    12.8k env-steps/s; merge/roundabout/parking -8-10%) — the longer-lived
    neg_d/pos_d temporaries break XLA's elementwise fusion of the collision
    pass.  Inside mosaic (Pallas) the trade inverts: no fusion heuristics,
    arithmetic count wins, and the folded form is +20% end-to-end.  Keep
    both; they are boolean-bitwise-identical (tests/test_math.py)."""
    if relx is None:
        relx = jnp.zeros_like(dax)
    if rely is None:
        rely = jnp.zeros_like(day)

    ca, sa = jnp.cos(angle_a), jnp.sin(angle_a)
    cb, sb = jnp.cos(angle_b), jnp.sin(angle_b)
    # signed axes in the reference's edge-winding order:
    # rect A: [-uA_len, +uA_wid, +uA_len, -uA_wid], then same for rect B
    axes = [
        (-ca, -sa), (-sa, ca), (ca, sa), (sa, -ca),
        (-cb, -sb), (-sb, cb), (cb, sb), (sb, -cb),
    ]

    intersecting = None
    will_intersect = None
    min_dist = None
    best_ax = best_ay = None

    for ax, ay in axes:
        cp_a = ax * dax + ay * day
        cp_b = ax * dbx + ay * dby
        ext_a = length_a / 2 * jnp.abs(ax * ca + ay * sa) + width_a / 2 * jnp.abs(
            -ax * sa + ay * ca
        )
        ext_b = length_b / 2 * jnp.abs(ax * cb + ay * sb) + width_b / 2 * jnp.abs(
            -ax * sb + ay * cb
        )
        min_a, max_a = cp_a - ext_a, cp_a + ext_a
        min_b, max_b = cp_b - ext_b, cp_b + ext_b

        d_now = _interval_distance(min_a, max_a, min_b, max_b)
        sep_now = d_now <= 0
        intersecting = sep_now if intersecting is None else intersecting & sep_now

        vp = ax * relx + ay * rely
        d_swept = _interval_distance(
            min_a + jnp.minimum(vp, 0.0), max_a + jnp.maximum(vp, 0.0), min_b, max_b
        )
        ok_swept = d_swept <= 0
        will_intersect = (
            ok_swept if will_intersect is None else will_intersect & ok_swept
        )

        ad = jnp.abs(d_swept)
        if min_dist is None:
            min_dist = ad
            best_ax = jnp.broadcast_to(ax, ad.shape)
            best_ay = jnp.broadcast_to(ay, ad.shape)
        else:
            better = ad < min_dist  # strict: first minimum wins (utils.py:234)
            min_dist = jnp.where(better, ad, min_dist)
            best_ax = jnp.where(better, ax, best_ax)
            best_ay = jnp.where(better, ay, best_ay)

    # orient from b towards a (utils.py:236-237)
    dcx = dax - dbx
    dcy = day - dby
    sign = jnp.where(dcx * best_ax + dcy * best_ay > 0, 1.0, -1.0)
    return (
        intersecting,
        will_intersect,
        min_dist * sign * best_ax,
        min_dist * sign * best_ay,
    )


def rects_intersecting_xy_folded(
    dax, day, length_a, width_a, angle_a,
    dbx, dby, length_b, width_b, angle_b,
    relx=None, rely=None,
):
    """4-unique-axis fold of :func:`rects_intersecting_xy` — same contract,
    ~half the pair-space arithmetic.  Use inside Pallas/mosaic kernels ONLY:
    on the XLA path this form compiles ~2x slower (see the note on
    rects_intersecting_xy).

    The reference winding order lists 8 signed edge normals per pair
    (rect A: [-uA_len, +uA_wid, +uA_len, -uA_wid], then rect B), but the
    +/- versions of an axis share ALL projection/extent/interval work:
    projections negate exactly, so intervals negate-and-reverse exactly,
    and the overlap booleans coincide.  Only the signed penetration depth
    differs — and both signed depths are the same two interval values
    (v1 = min_b - max_a, v2 = min_a - max_b) under mirrored selection.
    So: 4 unique axes of heavy work + 8 cheap MTV candidates.  Every
    expression below is arranged to stay bitwise identical to the 8-axis
    loop in exact-rounding form (commutative float adds, exact negations,
    and the exactly-zero cross terms ca*sa - sa*ca); squared norms are
    kept as computed, not folded to 1.  In compiled form the booleans
    measure bitwise equal on all platforms and the MTV components to
    ~1 ulp (XLA:CPU FMA-contracts the folded extents differently; on TPU
    all outputs measured bitwise equal — tests/test_math.py)."""
    if relx is None:
        relx = jnp.zeros_like(dax)
    if rely is None:
        rely = jnp.zeros_like(day)

    ca, sa = jnp.cos(angle_a), jnp.sin(angle_a)
    cb, sb = jnp.cos(angle_b), jnp.sin(angle_b)
    norm_a = ca * ca + sa * sa
    norm_b = cb * cb + sb * sb
    adcc = jnp.abs(ca * cb + sa * sb)  # |cos(angle_a - angle_b)| form
    adcs = jnp.abs(ca * sb - sa * cb)  # |sin(angle_a - angle_b)| form
    ha_l, ha_w = length_a / 2, width_a / 2
    hb_l, hb_w = length_b / 2, width_b / 2

    # (ax, ay, cp_a, cp_b, vp, ext_a, ext_b) for the listed negative-sign
    # version of each unique axis
    axes = [
        (-ca, -sa,
         -(ca * dax + sa * day), -(ca * dbx + sa * dby),
         -(ca * relx + sa * rely),
         ha_l * norm_a, hb_l * adcc + hb_w * adcs),
        (-sa, ca,
         ca * day - sa * dax, ca * dby - sa * dbx,
         ca * rely - sa * relx,
         ha_w * norm_a, hb_l * adcs + hb_w * adcc),
        (-cb, -sb,
         -(cb * dax + sb * day), -(cb * dbx + sb * dby),
         -(cb * relx + sb * rely),
         ha_l * adcc + ha_w * adcs, hb_l * norm_b),
        (-sb, cb,
         cb * day - sb * dax, cb * dby - sb * dbx,
         cb * rely - sb * relx,
         ha_l * adcs + ha_w * adcc, hb_w * norm_b),
    ]

    intersecting = None
    will_intersect = None
    neg_d = []  # signed swept depth for the listed (negative) axis version
    pos_d = []  # ... and for the flipped (positive) version

    for ax, ay, cp_a, cp_b, vp, ext_a, ext_b in axes:
        min_a, max_a = cp_a - ext_a, cp_a + ext_a
        min_b, max_b = cp_b - ext_b, cp_b + ext_b

        # axis-overlap now: (v1 <= 0) & (v2 <= 0) selects exactly the sign
        # of _interval_distance for BOTH signed versions (the positive gap
        # is always the selected branch when disjoint)
        now_ok = (min_b - max_a <= 0) & (min_a - max_b <= 0)
        intersecting = now_ok if intersecting is None else intersecting & now_ok

        as_lo = min_a + jnp.minimum(vp, 0.0)
        as_hi = max_a + jnp.maximum(vp, 0.0)
        v1 = min_b - as_hi
        v2 = as_lo - max_b
        swept_ok = (v1 <= 0) & (v2 <= 0)
        will_intersect = (
            swept_ok if will_intersect is None else will_intersect & swept_ok
        )

        neg_d.append(jnp.where(as_lo < min_b, v1, v2))
        pos_d.append(jnp.where(max_b < as_hi, v2, v1))

    # MTV scan over the 8 signed candidates in the reference's original
    # order (ties must resolve identically: first minimum wins, utils.py:234)
    (nca, nsa), (nsa2, pca) = (-ca, -sa), (-sa, ca)
    (ncb, nsb), (nsb2, pcb) = (-cb, -sb), (-sb, cb)
    candidates = [
        (neg_d[0], nca, nsa), (neg_d[1], nsa2, pca),
        (pos_d[0], ca, sa), (pos_d[1], sa, -ca),
        (neg_d[2], ncb, nsb), (neg_d[3], nsb2, pcb),
        (pos_d[2], cb, sb), (pos_d[3], sb, -cb),
    ]
    min_dist = None
    best_ax = best_ay = None
    for d_swept, ax, ay in candidates:
        ad = jnp.abs(d_swept)
        if min_dist is None:
            min_dist = ad
            best_ax = jnp.broadcast_to(ax, ad.shape)
            best_ay = jnp.broadcast_to(ay, ad.shape)
        else:
            better = ad < min_dist  # strict: first minimum wins (utils.py:234)
            min_dist = jnp.where(better, ad, min_dist)
            best_ax = jnp.where(better, ax, best_ax)
            best_ay = jnp.where(better, ay, best_ay)

    # orient from b towards a (utils.py:236-237)
    dcx = dax - dbx
    dcy = day - dby
    sign = jnp.where(dcx * best_ax + dcy * best_ay > 0, 1.0, -1.0)
    return (
        intersecting,
        will_intersect,
        min_dist * sign * best_ax,
        min_dist * sign * best_ay,
    )


def distance_to_rect(ray_origin, ray_end, corners):
    """Distance from ray_origin to its segment's intersection with a rectangle.

    Vectorized port of the slab method in utils.py:388-416. ``corners`` is
    (..., 4, 2) ordered (A, B, C, D) where AB and AD are perpendicular edges.
    Returns +inf where the segment misses the rectangle.
    """
    r, q = ray_origin, ray_end
    a = corners[..., 0, :]
    b = corners[..., 1, :]
    d = corners[..., 3, :]
    u = b - a
    v = d - a
    u = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    rq = q - r
    rqu = jnp.einsum("...d,...d->...", rq, u, precision="highest")
    rqv = jnp.einsum("...d,...d->...", rq, v, precision="highest")
    eps = 1e-12
    rqu = jnp.where(jnp.abs(rqu) < eps, eps, rqu)
    rqv = jnp.where(jnp.abs(rqv) < eps, eps, rqv)
    i1_lo = jnp.einsum("...d,...d->...", a - r, u, precision="highest") / rqu
    i1_hi = jnp.einsum("...d,...d->...", b - r, u, precision="highest") / rqu
    i2_lo = jnp.einsum("...d,...d->...", a - r, v, precision="highest") / rqv
    i2_hi = jnp.einsum("...d,...d->...", d - r, v, precision="highest") / rqv
    lo1 = jnp.minimum(i1_lo, i1_hi)
    hi1 = jnp.maximum(i1_lo, i1_hi)
    lo2 = jnp.minimum(i2_lo, i2_hi)
    hi2 = jnp.maximum(i2_lo, i2_hi)
    hit = (
        (_interval_distance(lo1, hi1, lo2, hi2) <= 0)
        & (_interval_distance(0.0, 1.0, lo1, hi1) <= 0)
        & (_interval_distance(0.0, 1.0, lo2, hi2) <= 0)
    )
    dist = jnp.maximum(lo1, lo2) * jnp.linalg.norm(q - r, axis=-1)
    return jnp.where(hit, dist, jnp.inf)
