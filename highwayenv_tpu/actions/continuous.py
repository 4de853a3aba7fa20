"""Continuous (and uniformly-quantized discrete) throttle/steering actions.

Rebuild of ``ContinuousAction``/``DiscreteAction``
(envs/common/action.py:73-196): the agent's [-1, 1] action is lmapped onto
acceleration_range / steering_range and stored directly as the controlled
vehicle's low-level command (no P-cascade).  ``dynamical=True`` selects the
BicycleVehicle tire-slip integrator for the ego.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from highwayenv_tpu.utils.math import lmap
from highwayenv_tpu.vehicle.state import VehicleState


class ContinuousAction:
    ACCELERATION_RANGE = (-5.0, 5.0)
    STEERING_RANGE = (-np.pi / 4, np.pi / 4)

    # egos keep their stored raw (steering, accel) commands; the frame kernel
    # must not overwrite them with the ControlledVehicle P-cascade
    stores_raw_controls = True

    def __init__(
        self,
        acceleration_range=None,
        steering_range=None,
        speed_range=None,
        longitudinal: bool = True,
        lateral: bool = True,
        dynamical: bool = False,
        clip: bool = True,
        **kwargs,
    ):
        self.acceleration_range = tuple(
            acceleration_range or self.ACCELERATION_RANGE
        )
        self.steering_range = tuple(steering_range or self.STEERING_RANGE)
        self.speed_range = tuple(speed_range) if speed_range else None
        self.longitudinal = longitudinal
        self.lateral = lateral
        if not self.lateral and not self.longitudinal:
            raise ValueError(
                "Either longitudinal and/or lateral control must be enabled"
            )
        self.dynamical = dynamical
        self.clip = clip
        self.size = 2 if self.lateral and self.longitudinal else 1

    @property
    def action_shape(self):
        return (self.size,)

    def space(self):
        from gymnasium import spaces

        return spaces.Box(-1.0, 1.0, shape=(self.size,), dtype=np.float32)

    def controls_from_action(self, action: jnp.ndarray):
        """action (..., size) in [-1,1] -> (acceleration, steering)."""
        if self.clip:
            action = jnp.clip(action, -1.0, 1.0)
        if self.longitudinal and self.lateral:
            acc = lmap(action[..., 0], (-1.0, 1.0), self.acceleration_range)
            steer = lmap(action[..., 1], (-1.0, 1.0), self.steering_range)
        elif self.longitudinal:
            acc = lmap(action[..., 0], (-1.0, 1.0), self.acceleration_range)
            steer = jnp.zeros_like(acc)
        else:
            steer = lmap(action[..., 0], (-1.0, 1.0), self.steering_range)
            acc = jnp.zeros_like(steer)
        return acc, steer

    def apply(
        self, geo, state: VehicleState, ego_mask, slot_actions: jnp.ndarray
    ) -> VehicleState:
        """Store lmapped low-level commands on the masked vehicles.

        slot_actions: (..., V, size) float32.
        """
        acc, steer = self.controls_from_action(slot_actions)
        return state.replace(
            accel=jnp.where(ego_mask, acc, state.accel),
            steering=jnp.where(ego_mask, steer, state.steering),
        )


class DiscreteAction(ContinuousAction):
    """Uniform quantization of ContinuousAction (action.py:165-196)."""

    stores_raw_controls = True

    def __init__(self, actions_per_axis: int = 3, **kwargs):
        super().__init__(**kwargs)
        self.actions_per_axis = actions_per_axis

    @property
    def action_shape(self):
        return ()

    def space(self):
        from gymnasium import spaces

        return spaces.Discrete(self.actions_per_axis**self.size)

    def apply(self, geo, state, ego_mask, slot_actions):
        """Integer action -> per-axis linspace grid point (action.py:186-196).

        The reference materializes itertools.product over per-axis linspaces;
        index decomposition row-major matches that ordering.
        """
        n = self.actions_per_axis
        grid = jnp.linspace(-1.0, 1.0, n)
        a = jnp.asarray(slot_actions, jnp.int32)
        if self.size == 2:
            cont = jnp.stack([grid[a // n], grid[a % n]], axis=-1)
        else:
            cont = grid[a][..., None]
        acc, steer = self.controls_from_action(cont)
        return state.replace(
            accel=jnp.where(ego_mask, acc, state.accel),
            steering=jnp.where(ego_mask, steer, state.steering),
        )
