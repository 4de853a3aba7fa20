"""Interval arithmetic + LPV interval observers (research extras).

Rebuild of highway_env/interval.py:13-385: box/polytopic interval
propagation for linear parameter-varying systems, used by the
interval-observer vehicles and the lane-keeping research tooling.  Host-side
numpy (planner/analysis tooling, not on the RL hot path).
"""

from __future__ import annotations

import itertools
from typing import Callable, Sequence

import numpy as np

from highwayenv_tpu.road import lane as lane_ops


def _pos(x):
    return np.maximum(x, 0)


def _neg(x):
    return np.maximum(-x, 0)


def intervals_product(a, b) -> np.ndarray:
    """Interval of the product ab (interval.py:13-34)."""
    a, b = np.asarray(a), np.asarray(b)
    return np.array(
        [
            np.dot(_pos(a[0]), _pos(b[0]))
            - np.dot(_pos(a[1]), _neg(b[0]))
            - np.dot(_neg(a[0]), _pos(b[1]))
            + np.dot(_neg(a[1]), _neg(b[1])),
            np.dot(_pos(a[1]), _pos(b[1]))
            - np.dot(_pos(a[0]), _neg(b[1]))
            - np.dot(_neg(a[1]), _pos(b[0]))
            + np.dot(_neg(a[0]), _neg(b[0])),
        ]
    )


def intervals_scaling(a, b) -> np.ndarray:
    """Interval of a known matrix times an interval (interval.py:37-52)."""
    a, b = np.asarray(a), np.asarray(b)
    return np.array(
        [
            np.dot(_pos(a), b[0]) - np.dot(_neg(a), b[1]),
            np.dot(_pos(a), b[1]) - np.dot(_neg(a), b[0]),
        ]
    )


def intervals_diff(a, b) -> np.ndarray:
    """interval.py:55-63."""
    a, b = np.asarray(a), np.asarray(b)
    return np.array([a[0] - b[1], a[1] - b[0]])


def interval_negative_part(a) -> np.ndarray:
    """interval.py:66-73."""
    return np.minimum(np.asarray(a), 0)


def integrator_interval(x, k) -> np.ndarray:
    """Interval of dx = -k x for positive gain interval k
    (interval.py:76-93)."""
    x, k = np.asarray(x), np.asarray(k)
    if x[0] >= 0:
        interval_gain = np.flip(-k, 0)
    elif x[1] <= 0:
        interval_gain = -k
    else:
        interval_gain = -np.array([k[0], k[0]])
    return interval_gain * x


def vector_interval_section(v_i, direction) -> np.ndarray:
    """interval.py:96-104."""
    v_i = np.asarray(v_i)
    corners = [
        [v_i[0, 0], v_i[0, 1]],
        [v_i[0, 0], v_i[1, 1]],
        [v_i[1, 0], v_i[0, 1]],
        [v_i[1, 0], v_i[1, 1]],
    ]
    dists = [np.dot(c, direction) for c in corners]
    return np.array([min(dists), max(dists)])


def interval_absolute_to_local(position_i, geo, lane: int):
    """Absolute box -> (longitudinal, lateral) intervals on a lane
    (interval.py:107-128), via the compiled geometry table."""
    position_i = np.asarray(position_i)
    corners = np.array(
        [
            [position_i[0, 0], position_i[0, 1]],
            [position_i[0, 0], position_i[1, 1]],
            [position_i[1, 0], position_i[0, 1]],
            [position_i[1, 0], position_i[1, 1]],
        ]
    )
    import jax.numpy as jnp

    s, lat = lane_ops.local_coordinates(
        geo, jnp.full((4,), lane, jnp.int32), jnp.asarray(corners, jnp.float32)
    )
    s, lat = np.asarray(s), np.asarray(lat)
    return (
        np.array([s.min(), s.max()]),
        np.array([lat.min(), lat.max()]),
    )


def interval_local_to_absolute(longitudinal_i, lateral_i, geo, lane: int):
    """interval.py:131-152."""
    import jax.numpy as jnp

    corners = np.array(
        [
            [longitudinal_i[0], lateral_i[0]],
            [longitudinal_i[0], lateral_i[1]],
            [longitudinal_i[1], lateral_i[0]],
            [longitudinal_i[1], lateral_i[1]],
        ]
    )
    pos = np.asarray(
        lane_ops.position(
            geo,
            jnp.full((4,), lane, jnp.int32),
            jnp.asarray(corners[:, 0], jnp.float32),
            jnp.asarray(corners[:, 1], jnp.float32),
        )
    )
    return np.array([pos.min(axis=0), pos.max(axis=0)])


def polytope(
    parametrized_f: Callable[[np.ndarray], np.ndarray], params_intervals
):
    """Matrix polytope of a parametrized matrix over a parameter box
    (interval.py:155-173)."""
    params_intervals = np.asarray(params_intervals)
    params_means = params_intervals.mean(axis=0)
    a0 = parametrized_f(params_means)
    d_a = []
    for vertex_id in itertools.product(
        [0, 1], repeat=params_intervals.shape[1]
    ):
        params_vertex = params_intervals[
            vertex_id, np.arange(len(vertex_id))
        ]
        d_a.append(parametrized_f(params_vertex) - parametrized_f(params_means))
    d_a = list({str(m): m for m in d_a}.values())
    return a0, d_a


def is_metzler(matrix, eps: float = 1e-9) -> bool:
    """interval.py:176-177."""
    matrix = np.asarray(matrix)
    return bool((matrix - np.diag(np.diag(matrix)) >= -eps).all())


class LPV:
    """Linear Parameter-Varying system with interval predictors
    (interval.py:180-385): dx = (a0 + sum(da))(x - center) + b u + d omega."""

    def __init__(
        self,
        x0,
        a0,
        da: Sequence,
        b=None,
        d=None,
        omega_i=None,
        u=None,
        k=None,
        center=None,
        x_i=None,
    ):
        self.x0 = np.array(x0, dtype=float)
        self.a0 = np.array(a0, dtype=float)
        self.da = [np.array(m) for m in da]
        self.b = np.array(b) if b is not None else np.zeros((*self.x0.shape, 1))
        self.d = np.array(d) if d is not None else np.zeros((*self.x0.shape, 1))
        self.omega_i = (
            np.array(omega_i) if omega_i is not None else np.zeros((2, 1))
        )
        self.u = np.array(u) if u is not None else np.zeros((1,))
        self.k = (
            np.array(k)
            if k is not None
            else np.zeros((self.b.shape[1], self.b.shape[0]))
        )
        self.center = (
            np.array(center) if center is not None else np.zeros(self.x0.shape)
        )
        self.a0 += self.b @ self.k  # closed loop
        self.coordinates = None
        self.x_t = self.x0
        self.x_i = np.array(x_i) if x_i is not None else np.array([self.x0, self.x0])
        self.x_i_t = None
        self.update_coordinates_frame(self.a0)

    # -- coordinate frame (interval.py:237-262) -------------------------- #
    def update_coordinates_frame(self, a0) -> None:
        self.coordinates = None
        if not is_metzler(a0):
            eig_v, transformation = np.linalg.eig(a0)
            if np.isreal(eig_v).all():
                try:
                    self.coordinates = (
                        transformation, np.linalg.inv(transformation)
                    )
                except np.linalg.LinAlgError:
                    pass
        else:
            eye = np.eye(a0.shape[0])
            self.coordinates = (eye, eye)
        self.a0 = self.change_coordinates(self.a0, matrix=True)
        self.da = self.change_coordinates(self.da, matrix=True)
        self.b = self.change_coordinates(self.b, offset=False)
        self.x_i_t = np.array(self.change_coordinates([x for x in self.x_i]))

    def set_control(self, control, state=None) -> None:
        if state is not None:
            control = control - self.k @ state
        self.u = control

    def change_coordinates(
        self, value, matrix=False, back=False, interval=False, offset=True
    ):
        """interval.py:271-321."""
        if self.coordinates is None:
            return value
        transformation, transformation_inv = self.coordinates
        if interval:
            if back:
                return intervals_scaling(
                    transformation, value[:, :, np.newaxis]
                ).squeeze() + offset * np.array([self.center, self.center])
            value = value - offset * np.array([self.center, self.center])
            return intervals_scaling(
                transformation_inv, value[:, :, np.newaxis]
            ).squeeze()
        if matrix:
            if isinstance(value, list):
                return [
                    self.change_coordinates(m, matrix=True, back=back)
                    for m in value
                ]
            if back:
                return transformation @ value @ transformation_inv
            return transformation_inv @ value @ transformation
        if isinstance(value, list):
            return [self.change_coordinates(v, back=back) for v in value]
        if back:
            value = transformation @ value
            if offset:
                value = value + self.center
            return value
        if offset:
            value = value - self.center
        return transformation_inv @ value

    # -- stepping (interval.py:323-385) ----------------------------------- #
    def step(self, dt: float) -> None:
        if is_metzler(self.a0):
            self.x_i_t = self.step_interval_predictor(self.x_i_t, dt)
        else:
            self.x_i_t = self.step_naive_predictor(self.x_i_t, dt)
        dx = self.a0 @ self.x_t + self.b @ self.u.squeeze(-1)
        self.x_t = self.x_t + dx * dt

    def step_naive_predictor(self, x_i, dt: float) -> np.ndarray:
        a_i = self.a0 + sum(
            intervals_product([0, 1], [m, m]) for m in self.da
        )
        bu = (self.b @ self.u).squeeze(-1)
        dx_i = (
            intervals_product(a_i, x_i)
            + intervals_product([self.d, self.d], self.omega_i)
            + np.array([bu, bu])
        )
        return x_i + dx_i * dt

    def step_interval_predictor(self, x_i, dt: float) -> np.ndarray:
        a0, da, d, omega_i, b, u = (
            self.a0, self.da, self.d, self.omega_i, self.b, self.u,
        )
        da_p = sum(_pos(m) for m in da)
        da_n = sum(_neg(m) for m in da)
        x_m, x_M = x_i[0, :, np.newaxis], x_i[1, :, np.newaxis]
        o_m, o_M = omega_i[0, :, np.newaxis], omega_i[1, :, np.newaxis]
        dx_m = (
            a0 @ x_m - da_p @ _neg(x_m) - da_n @ _pos(x_M)
            + _pos(d) @ o_m - _neg(d) @ o_M + b @ u
        )
        dx_M = (
            a0 @ x_M + da_p @ _pos(x_M) + da_n @ _neg(x_m)
            + _pos(d) @ o_M - _neg(d) @ o_m + b @ u
        )
        dx_i = np.array([dx_m.squeeze(axis=-1), dx_M.squeeze(axis=-1)])
        return x_i + dx_i * dt
