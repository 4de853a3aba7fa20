"""L1 math kernels vs the reference's scalar implementations."""

import numpy as np
import jax.numpy as jnp
import pytest

from highwayenv_tpu.utils import math as m

ref_utils = pytest.importorskip("highway_env.utils")


def test_wrap_to_pi():
    x = np.linspace(-10, 10, 101)
    np.testing.assert_allclose(
        np.asarray(m.wrap_to_pi(jnp.asarray(x))),
        ref_utils.wrap_to_pi(x),
        atol=1e-6,
    )


def test_lmap():
    v = np.linspace(-5, 5, 21)
    np.testing.assert_allclose(
        np.asarray(m.lmap(jnp.asarray(v), (20, 30), (0, 1))),
        ref_utils.lmap(v, [20, 30], [0, 1]),
        rtol=1e-6,
    )


def test_not_zero():
    for x in [-1.0, -1e-3, 0.0, 1e-3, 1.0]:
        assert float(m.not_zero(jnp.float32(x))) == pytest.approx(
            ref_utils.not_zero(x)
        )


def _ref_polygon(center, length, width, angle):
    pts = np.array(
        [
            [-length / 2, -width / 2],
            [-length / 2, +width / 2],
            [+length / 2, +width / 2],
            [+length / 2, -width / 2],
        ]
    ).T
    c, s = np.cos(angle), np.sin(angle)
    rot = np.array([[c, -s], [s, c]])
    pts = (rot @ pts).T + np.tile(center, (4, 1))
    return np.vstack([pts, pts[0:1]])


def test_rect_corners_match_reference_polygon():
    rng = np.random.default_rng(0)
    for _ in range(20):
        c = rng.uniform(-10, 10, 2)
        l, w = rng.uniform(1, 6), rng.uniform(1, 3)
        a = rng.uniform(-np.pi, np.pi)
        ours = np.asarray(
            m.rect_corners(jnp.asarray(c), jnp.float32(l), jnp.float32(w), jnp.float32(a))
        )
        theirs = _ref_polygon(c, l, w, a)[:4]
        np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_sat_vs_reference():
    """Random rectangle pairs: intersecting / will_intersect flags and the
    translation vector must match utils.are_polygons_intersecting."""
    import jax

    N = 600
    rng = np.random.default_rng(0)
    c1 = rng.uniform(-5, 5, (N, 2))
    c2 = c1 + rng.uniform(-8, 8, (N, 2))
    a1, a2 = rng.uniform(-np.pi, np.pi, (2, N))
    d1 = rng.uniform(-2, 2, (N, 2))
    d2 = rng.uniform(-2, 2, (N, 2))
    l = np.full(N, 5.0)
    w = np.full(N, 2.0)

    inter, will, trans = jax.jit(m.rects_intersecting)(
        jnp.asarray(c1), jnp.asarray(l), jnp.asarray(w), jnp.asarray(a1),
        jnp.asarray(c2), jnp.asarray(l), jnp.asarray(w), jnp.asarray(a2),
        jnp.asarray(d1), jnp.asarray(d2),
    )
    inter, will, trans = map(np.asarray, (inter, will, trans))

    n_checked = 0
    for k in range(N):
        ref_inter, ref_will, ref_trans = ref_utils.are_polygons_intersecting(
            _ref_polygon(c1[k], 5.0, 2.0, a1[k]),
            _ref_polygon(c2[k], 5.0, 2.0, a2[k]),
            d1[k], d2[k],
        )
        assert bool(inter[k]) == ref_inter, k
        assert bool(will[k]) == ref_will, k
        if ref_will and ref_trans is not None:
            np.testing.assert_allclose(
                trans[k], ref_trans, rtol=1e-3, atol=1e-4
            )
            n_checked += 1
    assert n_checked > 10


def test_distance_to_rect():
    import jax

    rng = np.random.default_rng(3)
    N = 100
    r = rng.uniform(-10, 10, (N, 2))
    q = r + rng.uniform(-30, 30, (N, 2))
    c = rng.uniform(-10, 10, (N, 2))
    ang = rng.uniform(-np.pi, np.pi, N)
    corners = np.stack([_ref_polygon(c[k], 5.0, 2.0, ang[k])[:4] for k in range(N)])
    ours = np.asarray(
        jax.jit(m.distance_to_rect)(jnp.asarray(r), jnp.asarray(q), jnp.asarray(corners))
    )
    for k in range(N):
        ref = ref_utils.distance_to_rect((r[k], q[k]), list(corners[k]))
        if np.isinf(ref):
            assert np.isinf(ours[k]), k
        else:
            np.testing.assert_allclose(ours[k], ref, rtol=1e-3, atol=1e-3)


def test_sat_folded_bitwise_matches_8axis():
    """rects_intersecting_xy_folded (the mosaic/Pallas variant) must match
    rects_intersecting_xy (the 8-signed-axis XLA-path loop): booleans
    bitwise on every platform, MTV components to ~1 ulp (XLA's FMA
    contraction may associate the folded extent expressions differently
    between the two compiled programs; on TPU all four outputs measure
    bitwise equal).  Degenerate cases covered: identical rects,
    axis-aligned, zero displacement, exact ties."""
    import jax

    rng = np.random.default_rng(7)
    N = 4096
    dax = rng.uniform(-10, 10, N).astype(np.float32)
    day = rng.uniform(-10, 10, N).astype(np.float32)
    dbx = (dax + rng.uniform(-8, 8, N)).astype(np.float32)
    dby = (day + rng.uniform(-8, 8, N)).astype(np.float32)
    aa = rng.uniform(-np.pi, np.pi, N).astype(np.float32)
    ab = rng.uniform(-np.pi, np.pi, N).astype(np.float32)
    relx = rng.uniform(-2, 2, N).astype(np.float32)
    rely = rng.uniform(-2, 2, N).astype(np.float32)
    # degenerate slices: identical rects / axis-aligned / zero sweep / ties
    dbx[:64] = dax[:64]
    dby[:64] = day[:64]
    ab[:128] = aa[:128]
    aa[64:192] = 0.0
    ab[64:160] = 0.0
    relx[:256] = 0.0
    rely[:256] = 0.0
    la = np.full(N, 5.0, np.float32)
    wa = np.full(N, 2.0, np.float32)

    args = tuple(
        jnp.asarray(x)
        for x in (dax, day, la, wa, aa, dbx, dby, la, wa, ab, relx, rely)
    )
    ours = jax.jit(m.rects_intersecting_xy_folded)(*args)
    ref = jax.jit(m.rects_intersecting_xy)(*args)
    for o, r in zip(ours[:2], ref[:2]):
        np.testing.assert_array_equal(np.asarray(o), np.asarray(r))
    # identical-pose pairs have an exactly-tied MTV whose direction the
    # 8-axis loop resolved by rounding noise between its +/- axis copies;
    # the folded form resolves ties deterministically (first listed axis).
    # Direction is arbitrary there (dc = 0) — compare magnitudes only.
    ident = (dax == dbx) & (day == dby) & (aa == ab)
    for o, r in zip(ours[2:], ref[2:]):
        o, r = np.asarray(o), np.asarray(r)
        np.testing.assert_allclose(
            o[~ident], r[~ident], rtol=0, atol=1e-5
        )
        np.testing.assert_allclose(
            np.abs(o[ident]), np.abs(r[ident]), rtol=0, atol=1e-5
        )
