"""Kinematic bicycle integrator, vectorized over all objects.

Reproduces ``Vehicle.step``/``clip_actions`` (vehicle/kinematics.py:130-168):
    beta = arctan(0.5 tan(delta_f))
    pos += speed * [cos(h+beta), sin(h+beta)] * dt   (+ pending impact)
    heading += speed * sin(beta) / (LENGTH/2) * dt
    speed += accel * dt
Crashed vehicles get steering=0, accel=-speed; speed is clamped to
[MIN_SPEED, MAX_SPEED] through the acceleration.
"""

from __future__ import annotations

import jax.numpy as jnp

from highwayenv_tpu.vehicle.state import MAX_SPEED, MIN_SPEED, VehicleState


def clip_actions(state: VehicleState) -> tuple[jnp.ndarray, jnp.ndarray]:
    """vehicle/kinematics.py:155-168."""
    steering = jnp.where(state.crashed, 0.0, state.steering)
    accel = jnp.where(state.crashed, -1.0 * state.speed, state.accel)
    accel = jnp.where(
        state.speed > MAX_SPEED,
        jnp.minimum(accel, MAX_SPEED - state.speed),
        jnp.where(
            state.speed < MIN_SPEED,
            jnp.maximum(accel, MIN_SPEED - state.speed),
            accel,
        ),
    )
    return steering, accel


def integrate(state: VehicleState, dt: float) -> VehicleState:
    """One integration frame for all stepping vehicles (masked on is_vehicle).

    IDM vehicles also advance their MOBIL timer (vehicle/behavior.py:139-148).
    Lane re-localization (on_state_update) is done separately as a batched
    closest-lane pass by the env frame kernel.
    """
    moving = state.is_vehicle
    steering, accel = clip_actions(state)

    beta = jnp.arctan(0.5 * jnp.tan(steering))
    heading_beta = state.heading + beta
    vel = state.speed[..., None] * jnp.stack(
        [jnp.cos(heading_beta), jnp.sin(heading_beta)], axis=-1
    )
    pos = state.pos + vel * dt
    # pending impact from last frame's collision pass (kinematics.py:147-150)
    pos = pos + jnp.where(state.impact_pending[..., None], state.impact, 0.0)
    crashed = state.crashed | (state.impact_pending & moving)
    heading = state.heading + state.speed * jnp.sin(beta) / (state.length / 2) * dt
    speed = state.speed + accel * dt

    return state.replace(
        pos=jnp.where(moving[..., None], pos, state.pos),
        heading=jnp.where(moving, heading, state.heading),
        speed=jnp.where(moving, speed, state.speed),
        crashed=jnp.where(moving, crashed, state.crashed),
        impact=jnp.where(moving[..., None], 0.0, state.impact),
        impact_pending=jnp.where(moving, False, state.impact_pending),
        timer=jnp.where(moving, state.timer + dt, state.timer),
    )
