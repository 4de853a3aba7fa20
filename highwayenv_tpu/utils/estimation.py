"""Confidence-region parameter estimation (research extras).

Rebuild of highway_env/utils.py:244-352 (confidence ellipsoid / polytope for
linear models y = theta^T phi, observation validity, dataset consistency) and
the ray-to-circle helper (utils.py:373-429).  Host-side numpy tooling used by
the regression/interval vehicles.
"""

from __future__ import annotations

import copy
import itertools

import numpy as np


def confidence_ellipsoid(
    data: dict,
    lambda_: float = 1e-5,
    delta: float = 0.1,
    sigma: float = 0.1,
    param_bound: float = 1.0,
):
    """Regularized least squares + self-normalized bound (utils.py:244-273)."""
    phi = np.array(data["features"])
    y = np.array(data["outputs"])
    g = phi.T @ phi / sigma + lambda_ * np.identity(phi.shape[-1])
    theta = np.linalg.inv(g) @ phi.T @ y / sigma
    d = theta.shape[0]
    beta = (
        np.sqrt(2 * np.log(np.sqrt(np.linalg.det(g) / lambda_**d) / delta))
        + np.sqrt(lambda_ * d) * param_bound
    )
    return theta, g, beta


def confidence_polytope(data: dict, parameter_box: np.ndarray):
    """Ellipsoid -> vertex polytope, clipped to the prior box
    (utils.py:275-303)."""
    parameter_box = np.asarray(parameter_box)
    param_bound = np.amax(np.abs(parameter_box))
    theta, g, beta = confidence_ellipsoid(data, param_bound=param_bound)

    values, pp = np.linalg.eig(g)
    radius_matrix = np.sqrt(beta) * np.linalg.inv(pp) @ np.diag(
        np.sqrt(1 / values)
    )
    h = np.array(
        list(itertools.product([-1, 1], repeat=theta.shape[0]))
    )
    d_theta = np.array([radius_matrix @ h_k for h_k in h])

    theta = np.clip(theta, parameter_box[0], parameter_box[1])
    for k in range(len(d_theta)):
        d_theta[k] = np.clip(
            d_theta[k], parameter_box[0] - theta, parameter_box[1] - theta
        )
    return theta, d_theta, g, beta


def is_valid_observation(y, phi, theta, gramian, beta, sigma: float = 0.1):
    """utils.py:306-330."""
    y_hat = np.tensordot(theta, phi, axes=[0, 0])
    error = np.linalg.norm(y - y_hat)
    eig_phi, _ = np.linalg.eig(phi.T @ phi)
    eig_g, _ = np.linalg.eig(gramian)
    error_bound = np.sqrt(np.amax(eig_phi) / np.amin(eig_g)) * beta + sigma
    return bool(error < error_bound)


def is_consistent_dataset(data: dict, parameter_box=None) -> bool:
    """Leave-last-out consistency check (utils.py:333-352)."""
    train = copy.deepcopy(data)
    y = np.array(train["outputs"].pop(-1))[..., np.newaxis]
    phi = np.array(train["features"].pop(-1))[..., np.newaxis]
    if train["outputs"] and train["features"]:
        theta, _, gramian, beta = confidence_polytope(
            train, parameter_box=parameter_box
        )
        return is_valid_observation(y, phi, theta, gramian, beta)
    return True


def solve_trinom(a, b, c):
    """utils.py:419-424."""
    delta = b**2 - 4 * a * c
    if delta >= 0:
        return (-b - np.sqrt(delta)) / (2 * a), (-b + np.sqrt(delta)) / (2 * a)
    return None, None


def distance_to_circle(center, radius, direction):
    """Ray-to-circle hit distance (utils.py:373-386)."""
    scaling = radius * np.ones((2, 1))
    a = np.linalg.norm(direction / scaling) ** 2
    b = -2 * np.dot(np.transpose(center), direction / np.square(scaling))
    c = np.linalg.norm(center / scaling) ** 2 - 1
    root_inf, root_sup = solve_trinom(a, b, c)
    if root_inf and root_inf > 0:
        return root_inf
    if root_sup and root_sup > 0:
        return 0
    return np.inf
