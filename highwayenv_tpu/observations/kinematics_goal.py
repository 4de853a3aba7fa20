"""KinematicsGoal observation: Dict(observation, achieved_goal, desired_goal).

Rebuild of ``KinematicsGoalObservation`` (envs/common/observation.py:502-560)
for goal-reaching tasks (parking / HER): the ego's feature vector and its
goal landmark's feature vector, divided by per-feature scales.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from highwayenv_tpu.vehicle.state import VehicleState


class KinematicsGoalObservation:
    def __init__(
        self,
        env,
        scales,
        features=("x", "y", "vx", "vy", "cos_h", "sin_h"),
        **kwargs,
    ):
        self.env = env
        self.scales = np.asarray(scales, np.float32)
        self.features = tuple(features)

    def space(self):
        from gymnasium import spaces

        F = len(self.features)
        box = lambda: spaces.Box(-np.inf, np.inf, shape=(F,), dtype=np.float32)
        return spaces.Dict(
            dict(
                desired_goal=box(), achieved_goal=box(), observation=box()
            )
        )

    def _row(self, state: VehicleState, slot) -> jnp.ndarray:
        """Vehicle.to_dict feature row (vehicle/kinematics.py:237-261)."""
        pos = state.pos[..., slot, :]
        heading = state.heading[..., slot]
        # static objects report zero velocity (objects.py:141-159)
        moving = state.is_vehicle[..., slot]
        speed = jnp.where(moving, state.speed[..., slot], 0.0)
        cols = {
            "presence": jnp.ones_like(heading),
            "x": pos[..., 0],
            "y": pos[..., 1],
            "vx": speed * jnp.cos(heading),
            "vy": speed * jnp.sin(heading),
            "heading": heading,
            "cos_h": jnp.cos(heading),
            "sin_h": jnp.sin(heading),
        }
        return jnp.stack([cols[f] for f in self.features], axis=-1)

    def observe(self, geo, state: VehicleState, ego: int):
        goal = self.env.goal_slot_of(ego)
        scales = jnp.asarray(self.scales)
        obs = self._row(state, ego) / scales
        goal_row = self._row(state, goal) / scales
        return {
            "observation": obs.astype(jnp.float32),
            "achieved_goal": obs.astype(jnp.float32),
            "desired_goal": goal_row.astype(jnp.float32),
        }
