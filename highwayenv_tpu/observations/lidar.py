"""Lidar observation: (cells, 2) ray distances + radial velocities.

Vectorized rebuild of ``LidarObservation`` (envs/common/observation.py:678-769)
and ``utils.distance_to_rect`` (utils.py:388-416): the reference's sequential
per-obstacle grid writes become one (V_obstacles, cells) candidate matrix
reduced with min-distance / last-writer-tie semantics (each write fires when
``distance <= grid``, so the final cell holds the minimum distance and, on
ties, the latest obstacle's velocity).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from highwayenv_tpu.utils.math import rect_corners
from highwayenv_tpu.vehicle.state import VehicleState


class LidarObservation:
    DISTANCE = 0
    SPEED = 1

    def __init__(
        self,
        cells: int = 16,
        maximum_range: float = 60.0,
        normalize: bool = True,
        **kwargs,
    ):
        self.cells = cells
        self.maximum_range = float(maximum_range)
        self.normalize = normalize
        self.angle = 2 * np.pi / cells

    @property
    def shape(self):
        return (self.cells, 2)

    def space(self):
        from gymnasium import spaces

        high = 1.0 if self.normalize else self.maximum_range
        return spaces.Box(
            shape=self.shape, low=-high, high=high, dtype=np.float32
        )

    def observe(self, geo, state: VehicleState, ego: int) -> jnp.ndarray:
        K = self.cells
        rng = self.maximum_range
        origin = state.pos[..., ego, :]
        origin_vel = state.velocity[..., ego, :]

        k = jnp.arange(K)
        dirs = jnp.stack(
            [jnp.cos(k * self.angle), jnp.sin(k * self.angle)], axis=-1
        )  # (K, 2)

        # eligible obstacles (observation.py:713-718)
        V = state.num_slots
        idx = jnp.arange(V)
        delta = state.pos - origin[..., None, :]  # (V, 2)
        center_dist = jnp.linalg.norm(delta, axis=-1)
        elig = (
            state.solid & (idx != ego) & (center_dist <= rng)
        )

        rel_vel = state.velocity - origin_vel[..., None, :]  # (V, 2)
        vel_k = jnp.einsum("...vd,kd->...vk", rel_vel, dirs, precision="highest")  # (V, K)

        # center write (observation.py:720-726)
        center_angle = (
            jnp.arctan2(delta[..., 1], delta[..., 0]) + self.angle / 2
        )
        center_index = jnp.mod(
            jnp.floor(center_angle / self.angle).astype(jnp.int32), K
        )
        d_center = jnp.where(
            (k[None, :] == center_index[..., None]) & elig[..., None],
            (center_dist - state.width / 2)[..., None],
            jnp.inf,
        )  # (V, K)

        # angular sector covered by the rectangle corners
        # (observation.py:728-744)
        corners = rect_corners(
            state.pos, state.length, state.width, state.heading
        )  # (V, 4, 2)
        dc = corners - origin[..., None, None, :]
        ang = (
            jnp.arctan2(dc[..., 1], dc[..., 0]) + self.angle / 2
        )  # (V, 4)
        amin = jnp.min(ang, axis=-1)
        amax = jnp.max(ang, axis=-1)
        wrap = (amin < -jnp.pi / 2) & (jnp.pi / 2 < amax)
        lo = jnp.where(wrap, amax, amin)
        hi = jnp.where(wrap, amin + 2 * jnp.pi, amax)
        start = jnp.mod(jnp.floor(lo / self.angle).astype(jnp.int32), K)
        end = jnp.mod(jnp.floor(hi / self.angle).astype(jnp.int32), K)
        in_seq = (k[None, :] >= start[..., None]) & (
            k[None, :] <= end[..., None]
        )
        in_wrap = (k[None, :] >= start[..., None]) | (
            k[None, :] <= end[..., None]
        )
        in_sector = jnp.where(
            (start <= end)[..., None], in_seq, in_wrap
        ) & elig[..., None]

        # ray-rectangle distances (utils.py:388-416), batched over (V, K)
        a = corners[..., 0, :]
        b = corners[..., 1, :]
        d4 = corners[..., 3, :]
        u = b - a
        v = d4 - a
        u = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        q_minus_r = rng * dirs  # (K, 2)
        rqu = jnp.einsum("kd,...vd->...vk", q_minus_r, u, precision="highest")
        rqv = jnp.einsum("kd,...vd->...vk", q_minus_r, v, precision="highest")
        ar = a - origin[..., None, :]
        br = b - origin[..., None, :]
        dr = d4 - origin[..., None, :]

        def div(x, y):
            return x / jnp.where(y == 0.0, 1e-12, y)

        i1_a = div(jnp.einsum("...vd,...vd->...v", ar, u, precision="highest")[..., None], rqu)
        i1_b = div(jnp.einsum("...vd,...vd->...v", br, u, precision="highest")[..., None], rqu)
        i2_a = div(jnp.einsum("...vd,...vd->...v", ar, v, precision="highest")[..., None], rqv)
        i2_b = div(jnp.einsum("...vd,...vd->...v", dr, v, precision="highest")[..., None], rqv)
        lo1 = jnp.where(rqu >= 0, i1_a, i1_b)
        hi1 = jnp.where(rqu >= 0, i1_b, i1_a)
        lo2 = jnp.where(rqv >= 0, i2_a, i2_b)
        hi2 = jnp.where(rqv >= 0, i2_b, i2_a)

        def interval_distance(la, ha, lb, hb):
            return jnp.where(la < lb, lb - ha, la - hb)

        hit = (
            (interval_distance(lo1, hi1, lo2, hi2) <= 0)
            & (interval_distance(0.0, 1.0, lo1, hi1) <= 0)
            & (interval_distance(0.0, 1.0, lo2, hi2) <= 0)
        )
        d_ray = jnp.where(
            hit & in_sector, jnp.maximum(lo1, lo2) * rng, jnp.inf
        )  # (V, K)

        # per-obstacle candidate = min(center, ray); reduce over obstacles
        # with min distance, ties -> last obstacle (sequential `<=` writes)
        d_cand = jnp.minimum(d_center, d_ray)
        d_cand = jnp.where(d_cand <= rng, d_cand, jnp.inf)
        d_min = jnp.min(d_cand, axis=-2)  # (K,)
        tied = d_cand == d_min[..., None, :]
        winner = jnp.argmax(
            jnp.where(tied, jnp.arange(V)[..., :, None], -1), axis=-2
        )
        any_write = jnp.isfinite(d_min)
        vel_out = jnp.where(
            any_write,
            jnp.take_along_axis(vel_k, winner[..., None, :], axis=-2)[..., 0, :],
            rng,  # untouched cells keep the init value in BOTH columns
        )
        dist_out = jnp.where(any_write, d_min, rng)

        obs = jnp.stack([dist_out, vel_out], axis=-1)
        if self.normalize:
            obs = obs / rng
        return obs.astype(jnp.float32)
