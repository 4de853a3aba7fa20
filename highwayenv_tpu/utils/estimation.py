"""Confidence-region parameter estimation (research extras).

Same contracts as highway_env/utils.py:244-352 (confidence ellipsoid /
polytope for linear models ``y = theta^T phi``, observation validity,
leave-last-out dataset consistency) and the ray-to-circle helpers
(utils.py:373-424, unused in the reference itself but part of its public
surface).  The implementation is this repo's own except where the output
contract forces the reference's construction (see below); the whole 2^d
vertex fan is produced in one batched matmul instead of the reference's
per-vertex Python loop, and every downstream consumer
(`ops/uncertainty.py` interval propagation) reduces over vertices.

Vertex-set equivalence with the reference: the reference's
``radius_matrix = sqrt(beta) * inv(pp) @ diag(sqrt(1/values))``
(utils.py:290-292) is NOT the symmetric ellipsoid-axis fan — the resulting
point cloud changes under eigenpair reordering or sign flips (the diag
weights get reassigned to different rows of ``inv(pp)``), so it depends on
``np.linalg.eig``'s output convention and cannot be reproduced from
``eigh``.  Producing the *identical* vertex set therefore forces the same
``eig``-based construction (3 lines); everything around it (slogdet
radius, batched sign-hypercube matmul instead of the per-vertex Python
loop, non-destructive dataset check) is this repo's own.  Pinned against
the live reference by ``tests/test_estimation_reference.py``.
"""

from __future__ import annotations

import numpy as np


def _design(data: dict) -> tuple[np.ndarray, np.ndarray]:
    return np.asarray(data["features"]), np.asarray(data["outputs"])


def confidence_ellipsoid(
    data: dict,
    lambda_: float = 1e-5,
    delta: float = 0.1,
    sigma: float = 0.1,
    param_bound: float = 1.0,
):
    """Regularized least squares with a self-normalized confidence radius.

    Returns ``(theta, gramian, beta)`` such that with probability 1-delta
    the true parameter lies in ``{t : |t - theta|_gramian <= beta}``
    (contract of utils.py:244-273; same estimator and radius formula, the
    solve is a linear system instead of an explicit inverse).
    """
    phi, y = _design(data)
    d = phi.shape[-1]
    gramian = phi.T @ phi / sigma + lambda_ * np.eye(d)
    theta = np.linalg.solve(gramian, phi.T @ y) / sigma
    # log det via slogdet (numerically robust vs det() underflow at large N)
    _, logdet = np.linalg.slogdet(gramian)
    beta = (
        np.sqrt(2.0 * (0.5 * (logdet - d * np.log(lambda_)) - np.log(delta)))
        + np.sqrt(lambda_ * d) * param_bound
    )
    return theta, gramian, beta


def confidence_polytope(data: dict, parameter_box):
    """Axis-fan vertex polytope of the confidence ellipsoid, clipped to the
    prior box (contract of utils.py:275-303).

    Returns ``(theta, d_theta, gramian, beta)`` where ``d_theta`` stacks the
    2^d ellipsoid-axis vertices.  Vertex basis: for symmetric PSD gramian
    ``G = Q diag(w) Q^T``, the ellipsoid semi-axes are
    ``sqrt(beta / w_i) * q_i``; every vertex is a +/-1 combination of them,
    generated here as one batched matmul over the sign hypercube.
    """
    box = np.asarray(parameter_box, dtype=float)
    theta, gramian, beta = confidence_ellipsoid(
        data, param_bound=float(np.max(np.abs(box)))
    )
    # the reference's radius-matrix construction verbatim (utils.py:290-292)
    # — forced: the vertex set is convention-dependent (see module docstring)
    w, pp = np.linalg.eig(gramian)
    radius = np.sqrt(beta) * np.linalg.inv(pp) @ np.diag(np.sqrt(1.0 / w))
    d = theta.shape[0]
    # sign hypercube (2^d, d): row k = binary expansion of k mapped to +/-1
    # (same enumeration order as itertools.product([-1, 1], repeat=d));
    # all 2^d vertices radius @ h_k in ONE matmul vs the reference's loop
    bits = (np.arange(2**d)[:, None] >> np.arange(d - 1, -1, -1)) & 1
    signs = 2.0 * bits - 1.0
    d_theta = signs @ radius.T  # (2^d, d): row k = radius @ h_k

    theta = np.clip(theta, box[0], box[1])
    d_theta = np.clip(d_theta, box[0] - theta, box[1] - theta)
    return theta, d_theta, gramian, beta


def is_valid_observation(y, phi, theta, gramian, beta, sigma: float = 0.1):
    """Prediction-error test for one observation against the confidence
    region (contract of utils.py:306-330): the residual must stay within
    the worst-case parameter error amplified through phi, plus noise."""
    phi = np.asarray(phi)
    residual = np.linalg.norm(np.asarray(y) - np.tensordot(theta, phi, [0, 0]))
    # ||phi||_2^2 is the top eigenvalue of phi phi^T; gramian's floor via eigh
    phi_gain = np.linalg.eigvalsh(phi.T @ phi)[-1]
    g_floor = np.linalg.eigvalsh(gramian)[0]
    return bool(residual < np.sqrt(phi_gain / g_floor) * beta + sigma)


def is_consistent_dataset(data: dict, parameter_box=None) -> bool:
    """Leave-last-out consistency (contract of utils.py:333-352): fit on all
    but the newest sample, test the newest against the fitted region.
    Non-destructive — the caller's lists are left untouched."""
    feats, outs = data["features"], data["outputs"]
    if len(feats) < 2 or len(outs) < 2:
        return True
    train = {"features": feats[:-1], "outputs": outs[:-1]}
    y = np.asarray(outs[-1])[..., None]
    phi = np.asarray(feats[-1])[..., None]
    theta, _, gramian, beta = confidence_polytope(train, parameter_box)
    return is_valid_observation(y, phi, theta, gramian, beta)


def solve_trinom(a, b, c):
    """Real roots of ``a x^2 + b x + c`` in ascending order, or
    ``(None, None)`` (contract of utils.py:419-424)."""
    disc = b * b - 4.0 * a * c
    if disc < 0:
        return None, None
    sq = np.sqrt(disc)
    return (-b - sq) / (2.0 * a), (-b + sq) / (2.0 * a)


def distance_to_circle(center, radius, direction):
    """Ray-to-circle hit distance along ``direction`` from the origin, or
    +inf on a miss (contract of utils.py:373-386, including its
    inside-the-circle -> 0 behavior)."""
    center = np.asarray(center, float).reshape(-1)
    direction = np.asarray(direction, float).reshape(-1)
    u = direction / radius
    p = center / radius
    near, far = solve_trinom(u @ u, -2.0 * (p @ u), p @ p - 1.0)
    if near and near > 0:
        return near
    if far and far > 0:  # origin inside the circle
        return 0
    return np.inf
