"""Finite-MDP (TTC-grid) export of the scene state.

Rebuild of envs/common/finite_mdp.py:17-203: the SPEED x LANE x TIME
time-to-collision grid (computed by the batched kernel in
observations/ttc.py) plus the deterministic transition / reward / terminal
tensors.  Returns plain arrays (the reference wraps them in the optional
``finite_mdp.mdp.DeterministicMDP``; pass them to any planner).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from highwayenv_tpu.observations.ttc import compute_ttc_grid
from highwayenv_tpu.road import lane as lane_ops


class FiniteMDP(NamedTuple):
    transition: jnp.ndarray  # (S, A) i32 next-state table
    reward: jnp.ndarray  # (S, A) f32
    terminal: jnp.ndarray  # (S,) bool
    state: jnp.ndarray  # () i32 current raveled state
    original_shape: tuple  # (speeds, lanes, times)


def clip_position(h, i, j, shape):
    """finite_mdp.py:188-203 (raveled clipped index)."""
    h = np.clip(h, 0, shape[0] - 1)
    i = np.clip(i, 0, shape[1] - 1)
    j = np.clip(j, 0, shape[2] - 1)
    return np.ravel_multi_index((h, i, j), shape)


def transition_tensor(shape, n_actions: int = 5) -> np.ndarray:
    """Deterministic (S, A) next-state table (finite_mdp.py:165-186).

    Static given the grid shape; FASTER/SLOWER only act at time index 0.
    """
    V, L, T = shape
    h, i, j, a = np.meshgrid(
        np.arange(V), np.arange(L), np.arange(T), np.arange(n_actions),
        indexing="ij",
    )
    nxt = clip_position(h, i, j + 1, shape)
    nxt = np.where(a == 0, clip_position(h, i - 1, j + 1, shape), nxt)
    nxt = np.where(a == 2, clip_position(h, i + 1, j + 1, shape), nxt)
    nxt = np.where(
        (a == 3) & (j == 0), clip_position(h + 1, i, j + 1, shape), nxt
    )
    nxt = np.where(
        (a == 4) & (j == 0), clip_position(h - 1, i, j + 1, shape), nxt
    )
    return nxt.reshape(V * L * T, n_actions)


def finite_mdp(
    env, state, time_quantization: float = 1.0, horizon: float = 10.0,
    grid_lanes: int | None = None,
) -> FiniteMDP:
    """finite_mdp.py:17-103, for controlled slot 0.  Jittable.

    ``grid_lanes`` sizes the grid's lane axis (the caller passes the ego's
    current-edge lane count for reference-exact sizing, finite_mdp.py:120);
    None falls back to ``env.ttc_grid_lanes`` (widest edge)."""
    cfg = env.config
    ego = env.ego_slots[0]
    ts = env.action_type.target_speeds
    grid = compute_ttc_grid(
        env.geo,
        state.vehicles,
        ego,
        ts,
        env.connected3,
        getattr(env, "ttc_grid_lanes", env.max_edge_lanes)
        if grid_lanes is None else grid_lanes,
        time_quantization,
        horizon,
    )
    V, L, T = grid.shape[-3:]

    lane_id = env.geo.lane_id[
        lane_ops._gather(env.geo, state.vehicles.lane[..., ego])
    ]
    s0 = (
        state.vehicles.speed_index[..., ego] * (L * T) + lane_id * T
    ).astype(jnp.int32)

    transition = jnp.asarray(transition_tensor((V, L, T)))

    lanes = jnp.arange(L) / max(L - 1, 1)
    speeds = jnp.arange(V) / max(V - 1, 1)
    state_reward = (
        cfg["collision_reward"] * grid
        + cfg["right_lane_reward"] * lanes[None, :, None]
        + cfg["high_speed_reward"] * speeds[:, None, None]
    ).reshape(grid.shape[:-3] + (V * L * T,))
    action_reward = jnp.asarray(
        [cfg.get("lane_change_reward", 0), 0,
         cfg.get("lane_change_reward", 0), 0, 0],
        jnp.float32,
    )
    reward = state_reward[..., :, None] + action_reward

    end_of_horizon = (
        jnp.arange(T)[None, None, :] == T - 1
    ) & jnp.ones((V, L, 1), bool)
    terminal = ((grid == 1.0) | end_of_horizon).reshape(
        grid.shape[:-3] + (V * L * T,)
    )
    return FiniteMDP(transition, reward, terminal, s0, (V, L, T))
