"""Interval arithmetic / LPV parity against the reference implementation."""

import numpy as np
import pytest

from highwayenv_tpu.ops import interval as iv

pytest.importorskip("highway_env")


def test_intervals_product_matches():
    from highway_env import interval as ref

    rng = np.random.default_rng(0)
    for _ in range(20):
        a = np.sort(rng.normal(size=(2, 3)), axis=0)
        b = np.sort(rng.normal(size=(2, 3)), axis=0)
        np.testing.assert_allclose(
            iv.intervals_product(a, b), ref.intervals_product(a, b)
        )


def test_intervals_scaling_matches():
    from highway_env import interval as ref

    rng = np.random.default_rng(1)
    a = rng.normal(size=(3, 3))
    b = np.sort(rng.normal(size=(2, 3)), axis=0)
    np.testing.assert_allclose(
        iv.intervals_scaling(a, b), ref.intervals_scaling(a, b)
    )


def test_polytope_and_metzler_match():
    from highway_env import interval as ref

    f = lambda p: np.array([[-1.0, p[0]], [p[1], -2.0]])
    box = np.array([[0.0, -1.0], [1.0, 1.0]])
    a0, da = iv.polytope(f, box)
    ra0, rda = ref.polytope(f, box)
    np.testing.assert_allclose(a0, ra0)
    assert len(da) == len(rda)
    assert iv.is_metzler(np.array([[-1, 0.5], [0.2, -2]]))
    assert not iv.is_metzler(np.array([[-1, -0.5], [0.2, -2]]))


def test_lpv_interval_predictor_contains_true_state():
    """Mirrors tests/vehicle/test_uncertainty.py's inclusion property."""
    from highway_env import interval as ref

    a0 = np.array([[-1.0, 1.0], [0.0, -2.0]])
    da = [np.array([[0.1, 0.0], [0.0, 0.1]])]
    x0 = np.array([1.0, -0.5])
    x_i = np.array([x0 - 0.1, x0 + 0.1])
    u = np.zeros((1, 1))  # the LPV API expects a column-vector control
    ours = iv.LPV(x0, a0, da, x_i=x_i, u=u)
    theirs = ref.LPV(x0, a0, da, x_i=x_i, u=u)
    for _ in range(30):
        ours.step(0.05)
        theirs.step(0.05)
    np.testing.assert_allclose(ours.x_t, theirs.x_t, atol=1e-9)
    np.testing.assert_allclose(ours.x_i_t, theirs.x_i_t, atol=1e-9)
    lo, hi = ours.change_coordinates(ours.x_i_t, back=True, interval=True)
    assert np.all(lo <= ours.x_t + 1e-6) and np.all(ours.x_t <= hi + 1e-6)
