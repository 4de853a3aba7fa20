"""Time-to-collision grid observation + the underlying TTC-grid kernel.

Vectorized rebuild of ``compute_ttc_grid`` (envs/common/finite_mdp.py:104-163)
and ``TimeToCollisionObservation`` (envs/common/observation.py:115-152): for
each candidate ego speed, each other vehicle's projected time-to-collision is
quantized into a SPEED x LANE x TIME grid (max-scatter over floor/ceil time
cells and over candidate lanes), then the observation clamps a 3x3
(speed, lane) window around the ego with edge padding.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from highwayenv_tpu.road import lane as lane_ops
from highwayenv_tpu.road.lane import LaneGeometry
from highwayenv_tpu.utils.math import not_zero
from highwayenv_tpu.vehicle.state import VehicleState


def compute_ttc_grid(
    geo: LaneGeometry,
    state: VehicleState,
    ego: int,
    target_speeds: np.ndarray,
    connected3: np.ndarray,
    n_grid_lanes: int,
    time_quantization: float,
    horizon: float,
):
    """TTC grid (S, Lg, T) for controlled slot ``ego``.

    connected3: static (L, L) is_connected_road(depth=3) matrix from
    RoadNetworkBuilder.connectivity_matrix.
    """
    S = len(target_speeds)
    T = int(horizon / time_quantization)
    Lg = n_grid_lanes
    V = state.num_slots

    ego_lane = state.lane[..., ego]
    ego_head = state.heading[..., ego]
    ego_dir = jnp.stack([jnp.cos(ego_head), jnp.sin(ego_head)], axis=-1)

    # signed gaps on the ego's current lane (vehicle.lane_distance_to)
    s_all, _ = lane_ops.local_coordinates(geo, ego_lane[..., None], state.pos)
    dist0 = s_all - s_all[..., ego][..., None]  # (V,)

    other_dir = state.direction
    proj_speed = state.speed * jnp.einsum("...vd,...d->...v", other_dir, ego_dir, precision="highest")

    # candidate lanes of each other vehicle: its own lane id if its edge has
    # the same lane count as the ego's, else "all lanes" (finite_mdp.py:145-152)
    li = lane_ops._gather(geo, state.lane)
    eli = lane_ops._gather(geo, ego_lane)
    same_count = geo.edge_n[li] == geo.edge_n[eli][..., None]
    other_id = geo.lane_id[li]
    lane_onehot = jax.nn.one_hot(other_id, Lg, dtype=jnp.float32)
    lane_mask = jnp.where(same_count[..., None], lane_onehot, 1.0)  # (V, Lg)

    # connectivity gate (static matrix gathered at traced lane ids)
    conn = jnp.asarray(connected3)
    connected = conn[
        jnp.clip(ego_lane, 0, conn.shape[0] - 1)[..., None],
        jnp.clip(state.lane, 0, conn.shape[0] - 1),
    ]  # (V,)

    idx = jnp.arange(V)
    valid_vehicle = (
        state.is_vehicle
        & (idx != ego)
        & connected
    )

    ego_speeds = jnp.asarray(np.asarray(target_speeds, np.float32))  # (S,)
    margin = state.length[..., ego] / 2 + state.length / 2  # (V,)

    grid = jnp.zeros(state.speed.shape[:-1] + (S, Lg, T), jnp.float32)
    for m_sign, cost in ((0.0, 1.0), (-1.0, 0.5), (1.0, 0.5)):
        distance = dist0 + m_sign * margin  # (V,)
        rel = ego_speeds[..., :, None] - proj_speed[..., None, :]  # (S, V)
        # reference skips exactly-equal speeds (finite_mdp.py:128)
        speed_ok = rel != 0.0
        ttc = distance[..., None, :] / not_zero(rel)  # (S, V)
        ok = valid_vehicle[..., None, :] & speed_ok & (ttc >= 0.0)
        q = ttc / time_quantization
        for t_idx in (jnp.floor(q), jnp.ceil(q)):
            t_int = t_idx.astype(jnp.int32)
            t_ok = ok & (t_int >= 0) & (t_int < T)
            t_onehot = jax.nn.one_hot(jnp.clip(t_int, 0, T - 1), T, dtype=jnp.float32)
            cell = (
                t_ok[..., None].astype(jnp.float32)
                * t_onehot
            )  # (S, V, T)
            contrib = cost * jnp.einsum("...svt,...vl->...slt", cell, lane_mask, precision="highest")
            # einsum sums duplicate scatters; the reference takes max per cell
            grid = jnp.maximum(grid, jnp.minimum(contrib, cost))
    return grid


class TimeToCollisionObservation:
    """Config-compatible with the reference TimeToCollisionObservation."""

    def __init__(self, env, horizon: int = 10, **kwargs):
        self.env = env
        self.horizon = horizon

    @property
    def shape(self):
        T = int(self.horizon * self.env.config["policy_frequency"])
        return (3, 3, T)

    def space(self):
        from gymnasium import spaces

        return spaces.Box(shape=self.shape, low=0, high=1, dtype=np.float32)

    def observe(self, geo: LaneGeometry, state: VehicleState, ego: int):
        env = self.env
        ts = env.action_type.target_speeds
        S = len(ts)
        # jitted hot path: lane axis must be static — envs whose ego edge
        # width is provably constant pin it (two_way/u_turn); otherwise
        # the widest edge (PARITY #13; to_finite_mdp's host export sizes
        # per the ego's live edge like the reference)
        Lg = getattr(env, "ttc_grid_lanes", env.max_edge_lanes)
        grid = compute_ttc_grid(
            geo,
            state,
            ego,
            ts,
            env.connected3,
            Lg,
            time_quantization=1.0 / env.config["policy_frequency"],
            horizon=float(self.horizon),
        )  # (S, Lg, T)
        T = grid.shape[-1]

        # lane-axis clamp with all-ones padding (observation.py:139-144)
        pad = jnp.ones_like(grid)
        padded = jnp.concatenate([pad, grid, pad], axis=-2)  # (S, 3Lg, T)
        lane_id = geo.lane_id[lane_ops._gather(geo, state.lane[..., ego])]
        l0 = Lg + lane_id - 1
        lanes3 = _dyn_slice(padded, l0, 3, axis=-2)

        # speed-axis clamp with edge replication (observation.py:145-151)
        first = jnp.repeat(lanes3[..., :1, :, :], S, axis=-3)
        last = jnp.repeat(lanes3[..., -1:, :, :], S, axis=-3)
        padded_v = jnp.concatenate([first, lanes3, last], axis=-3)  # (3S, 3, T)
        v0 = S + state.speed_index[..., ego] - 1
        out = _dyn_slice(padded_v, v0, 3, axis=-3)
        return out.astype(jnp.float32)


def _dyn_slice(x, start, size, axis):
    axis = axis % x.ndim
    starts = [jnp.zeros_like(start)] * x.ndim
    starts[axis] = start
    sizes = list(x.shape)
    sizes[axis] = size
    return jax.lax.dynamic_slice(x, starts, sizes)
