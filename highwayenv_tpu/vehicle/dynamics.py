"""Dynamical bicycle model: tire slip + RK4, vectorized over masked slots.

Rebuild of ``BicycleVehicle`` (vehicle/dynamics.py:13-257, Rajamani ch. 2):
6-state [x, y, psi, v, v_lat, r] with front/rear tire lateral forces, a
low-speed damping branch, RK4 integration (dynamics.py:13-29), and the
extra action clips (steering +-pi/2, yaw rate +-2pi, dynamics.py:153-163).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from highwayenv_tpu.vehicle import kinematics
from highwayenv_tpu.vehicle.state import VEHICLE_LENGTH, VEHICLE_WIDTH, VehicleState

MASS = 1.0
LENGTH_A = VEHICLE_LENGTH / 2
LENGTH_B = VEHICLE_LENGTH / 2
INERTIA_Z = 1 / 12 * MASS * (VEHICLE_LENGTH**2 + VEHICLE_WIDTH**2)
FRICTION_FRONT = 15.0 * MASS
FRICTION_REAR = 15.0 * MASS
MAX_ANGULAR_SPEED = 2 * np.pi


def _derivative(state6, steering, accel):
    """dynamics.py:74-111.  state6: (..., 6) = [x, y, psi, v, v_lat, r]."""
    heading = state6[..., 2]
    speed = state6[..., 3]
    lateral_speed = state6[..., 4]
    yaw_rate = state6[..., 5]

    theta_vf = jnp.arctan2(lateral_speed + LENGTH_A * yaw_rate, speed)  # (2.27)
    theta_vr = jnp.arctan2(lateral_speed - LENGTH_B * yaw_rate, speed)  # (2.28)
    f_yf = 2 * FRICTION_FRONT * (steering - theta_vf)  # (2.25)
    f_yr = 2 * FRICTION_REAR * (0.0 - theta_vr)  # (2.26)
    # low-speed damping branch (dynamics.py:89-96)
    slow = jnp.abs(speed) < 1.0
    f_yf = jnp.where(
        slow, -MASS * lateral_speed - INERTIA_Z / LENGTH_A * yaw_rate, f_yf
    )
    f_yr = jnp.where(
        slow, -MASS * lateral_speed + INERTIA_Z / LENGTH_A * yaw_rate, f_yr
    )
    d_lat = (f_yf + f_yr) / MASS - yaw_rate * speed  # (2.21)
    d_yaw = (LENGTH_A * f_yf - LENGTH_B * f_yr) / INERTIA_Z  # (2.22)
    c, s = jnp.cos(heading), jnp.sin(heading)
    dx = c * speed - s * lateral_speed
    dy = s * speed + c * lateral_speed
    return jnp.stack([dx, dy, yaw_rate, accel, d_lat, d_yaw], axis=-1)


def derivative(state: VehicleState) -> jnp.ndarray:
    """State derivative at the stored actions (for AttributesObservation)."""
    s6 = jnp.stack(
        [
            state.pos[..., 0],
            state.pos[..., 1],
            state.heading,
            state.speed,
            state.lateral_speed,
            state.yaw_rate,
        ],
        axis=-1,
    )
    return _derivative(s6, state.steering, state.accel)


def integrate_dynamic(
    state: VehicleState, dt: float, mask: jnp.ndarray
) -> VehicleState:
    """RK4 step of the tire-slip model for ``mask`` slots (dynamics.py:142-151).

    Other slots are untouched; callers run the kinematic integrator on them.
    """
    steering, accel = kinematics.clip_actions(state)
    steering = jnp.clip(steering, -jnp.pi / 2, jnp.pi / 2)
    yaw_rate = jnp.clip(state.yaw_rate, -MAX_ANGULAR_SPEED, MAX_ANGULAR_SPEED)

    s6 = jnp.stack(
        [
            state.pos[..., 0],
            state.pos[..., 1],
            state.heading,
            state.speed,
            state.lateral_speed,
            yaw_rate,
        ],
        axis=-1,
    )
    f1 = _derivative(s6, steering, accel)
    f2 = _derivative(s6 + f1 * (dt / 2), steering, accel)
    f3 = _derivative(s6 + f2 * (dt / 2), steering, accel)
    f4 = _derivative(s6 + f3 * dt, steering, accel)
    new = s6 + (dt / 6) * (f1 + 2 * f2 + 2 * f3 + f4)

    m = mask
    m2 = mask[..., None]
    return state.replace(
        pos=jnp.where(m2, new[..., 0:2], state.pos),
        heading=jnp.where(m, new[..., 2], state.heading),
        speed=jnp.where(m, new[..., 3], state.speed),
        lateral_speed=jnp.where(m, new[..., 4], state.lateral_speed),
        yaw_rate=jnp.where(m, new[..., 5], state.yaw_rate),
    )
