"""Pin confidence-region estimation against the live reference.

The advisor flagged (round 4) that the polytope vertex construction used
COLUMNS of the eigenvector matrix where the reference's
``inv(pp) @ diag`` construction (utils.py:290-292) uses ROWS.  These tests
compare our outputs against ``highway_env.utils`` directly so any future
transpose/order/sign slip is caught.
"""

import numpy as np
import pytest

ref_utils = pytest.importorskip("highway_env.utils")

from highwayenv_tpu.utils import estimation


def _dataset(rng, n=40, d=3):
    theta_true = rng.uniform(-1, 1, size=(d,))
    phi = rng.normal(size=(n, d))
    y = phi @ theta_true + 0.05 * rng.normal(size=(n,))
    return {"features": [p for p in phi], "outputs": [v for v in y]}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_confidence_ellipsoid_matches_reference(seed):
    data = _dataset(np.random.default_rng(seed))
    theta, gramian, beta = estimation.confidence_ellipsoid(data)
    theta_r, gramian_r, beta_r = ref_utils.confidence_ellipsoid(data)
    np.testing.assert_allclose(theta, theta_r, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(gramian, gramian_r, rtol=1e-9)
    np.testing.assert_allclose(beta, beta_r, rtol=1e-9)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_confidence_polytope_vertex_set_matches_reference(seed):
    """The 2^d vertex SET must equal the reference's.  Ordering may differ
    (eigh sorts eigenvalues ascending, the reference's eig does not), so
    compare as sorted point sets."""
    rng = np.random.default_rng(seed)
    data = _dataset(rng)
    box = np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]])
    theta, d_theta, gramian, beta = estimation.confidence_polytope(data, box)
    theta_r, d_theta_r, gramian_r, beta_r = ref_utils.confidence_polytope(
        data, parameter_box=box
    )
    np.testing.assert_allclose(theta, theta_r, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(beta, beta_r, rtol=1e-9)
    assert d_theta.shape == d_theta_r.shape == (8, 3)
    # canonicalize both vertex clouds by lexicographic sort
    ours = np.array(sorted(map(tuple, np.round(d_theta, 9))))
    refs = np.array(sorted(map(tuple, np.round(d_theta_r, 9))))
    np.testing.assert_allclose(ours, refs, rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("seed", [0, 1, 5])
def test_is_consistent_dataset_matches_reference(seed):
    rng = np.random.default_rng(seed)
    data = _dataset(rng)
    box = np.array([[-1.5] * 3, [1.5] * 3])
    assert estimation.is_consistent_dataset(
        data, box
    ) == ref_utils.is_consistent_dataset(data, parameter_box=box)
    # an outlier appended to the dataset must flip consistency identically
    bad = dict(
        features=list(data["features"]) + [np.ones(3)],
        outputs=list(data["outputs"]) + [50.0],
    )
    assert estimation.is_consistent_dataset(
        bad, box
    ) == ref_utils.is_consistent_dataset(
        {k: list(v) for k, v in bad.items()}, parameter_box=box
    )
