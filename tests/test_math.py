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
