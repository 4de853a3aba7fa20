"""Vehicle / road-object state as a structure-of-arrays pytree.

The reference keeps a ``list[Vehicle]`` of heterogeneous Python objects with
dynamic dispatch (highway_env/road/road.py:464-481).  The TPU-native engine
keeps one fixed-size padded SoA: every array has leading dim V (max objects
per env), behaviors dispatch on the ``kind`` enum with masked/branch-free
updates, and the whole struct is a pytree (vmap over the env batch, shard the
batch axis over the device mesh).

Layout convention: stepping vehicles occupy the low indices, static objects
(obstacles/landmarks) the high indices, padding last.  This mirrors the
reference collision loop ordering where ``self`` is always the vehicle (or
the lower-index vehicle) of a pair (road/road.py:477-481).
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp

# kind enum
KIND_PAD = 0  # inactive slot
KIND_EGO = 1  # ControlledVehicle / MDPVehicle (externally actioned)
KIND_IDM = 2  # IDMVehicle NPC (vehicle/behavior.py:12-347)
KIND_LINEAR = 3  # LinearVehicle NPC (vehicle/behavior.py:350-583)
KIND_PLAIN = 4  # plain Vehicle (constant stored action)
KIND_OBSTACLE = 5  # vehicle/objects.py:215-222
KIND_LANDMARK = 6  # vehicle/objects.py:225-233 (non-solid)

# Vehicle constants (vehicle/kinematics.py:21-31)
VEHICLE_LENGTH = 5.0
VEHICLE_WIDTH = 2.0
MAX_SPEED = 40.0
MIN_SPEED = -40.0
DEFAULT_INITIAL_SPEEDS = (23.0, 25.0)

# RoadObject constants (vehicle/objects.py:25-26)
OBJECT_LENGTH = 2.0
OBJECT_WIDTH = 2.0


@flax.struct.dataclass
class VehicleState:
    """All arrays share leading dims (..., V)."""

    pos: jnp.ndarray  # (...,V,2) f32
    heading: jnp.ndarray  # (...,V) f32
    speed: jnp.ndarray  # (...,V) f32
    lane: jnp.ndarray  # (...,V) i32  current closest lane (global id)
    target_lane: jnp.ndarray  # (...,V) i32
    target_speed: jnp.ndarray  # (...,V) f32
    speed_index: jnp.ndarray  # (...,V) i32  (MDP ego)
    timer: jnp.ndarray  # (...,V) f32  MOBIL gating timer
    delta: jnp.ndarray  # (...,V) f32  per-vehicle IDM exponent
    accel: jnp.ndarray  # (...,V) f32  stored longitudinal action
    steering: jnp.ndarray  # (...,V) f32  stored steering action
    crashed: jnp.ndarray  # (...,V) bool
    hit: jnp.ndarray  # (...,V) bool
    impact: jnp.ndarray  # (...,V,2) f32  pending post-collision translation
    impact_pending: jnp.ndarray  # (...,V) bool
    kind: jnp.ndarray  # (...,V) i32 enum above
    length: jnp.ndarray  # (...,V) f32
    width: jnp.ndarray  # (...,V) f32
    check_collisions: jnp.ndarray  # (...,V) bool
    collidable: jnp.ndarray  # (...,V) bool
    enable_lane_change: jnp.ndarray  # (...,V) bool
    # RegulatedRoad yielding state (road/regulation.py:46-71)
    is_yielding: jnp.ndarray  # (...,V) bool
    yield_timer: jnp.ndarray  # (...,V) i32
    # BicycleVehicle extra state (vehicle/dynamics.py:50-56)
    lateral_speed: jnp.ndarray  # (...,V) f32
    yaw_rate: jnp.ndarray  # (...,V) f32
    # LinearVehicle parameters (vehicle/behavior.py:350-371) + per-vehicle
    # MOBIL incentive threshold (0.2 IDM / 1.0 Aggressive & Defensive)
    accel_params: jnp.ndarray  # (...,V,3) f32
    steer_params: jnp.ndarray  # (...,V,2) f32
    mobil_gain: jnp.ndarray  # (...,V) f32
    mobil_max_braking: jnp.ndarray  # (...,V) f32 (set_preferred_lane -> 1000)
    # fixed-width route: per segment the edge (base lane id + lane count) and
    # an explicit lane id (-1 = unspecified, reference `None`)
    route_base: jnp.ndarray  # (...,V,R) i32, -1 pad
    route_n: jnp.ndarray  # (...,V,R) i32
    route_id: jnp.ndarray  # (...,V,R) i32
    route_ptr: jnp.ndarray  # (...,V) i32  cursor (reference pops the list head)
    route_len: jnp.ndarray  # (...,V) i32

    @property
    def num_slots(self) -> int:
        return self.kind.shape[-1]

    @property
    def active(self) -> jnp.ndarray:
        return self.kind != KIND_PAD

    @property
    def is_vehicle(self) -> jnp.ndarray:
        return (self.kind >= KIND_EGO) & (self.kind <= KIND_PLAIN)

    @property
    def is_controlled(self) -> jnp.ndarray:
        """ControlledVehicle subclasses (used by MOBIL's conflict check,
        vehicle/behavior.py:229-243)."""
        return (self.kind >= KIND_EGO) & (self.kind <= KIND_LINEAR)

    @property
    def solid(self) -> jnp.ndarray:
        return self.active & (self.kind != KIND_LANDMARK)

    @property
    def direction(self) -> jnp.ndarray:
        return jnp.stack([jnp.cos(self.heading), jnp.sin(self.heading)], axis=-1)

    @property
    def velocity(self) -> jnp.ndarray:
        return self.speed[..., None] * self.direction

    @property
    def diagonal(self) -> jnp.ndarray:
        return jnp.sqrt(self.length**2 + self.width**2)


def empty_state(num_slots: int, route_slots: int = 1) -> VehicleState:
    """An all-padding state with V slots (host-callable, jit-safe)."""
    V, R = num_slots, route_slots
    f = jnp.zeros
    return VehicleState(
        pos=f((V, 2), jnp.float32),
        heading=f((V,), jnp.float32),
        speed=f((V,), jnp.float32),
        lane=f((V,), jnp.int32),
        target_lane=f((V,), jnp.int32),
        target_speed=f((V,), jnp.float32),
        speed_index=f((V,), jnp.int32),
        timer=f((V,), jnp.float32),
        delta=jnp.full((V,), 4.0, jnp.float32),
        accel=f((V,), jnp.float32),
        steering=f((V,), jnp.float32),
        crashed=f((V,), bool),
        hit=f((V,), bool),
        impact=f((V, 2), jnp.float32),
        impact_pending=f((V,), bool),
        kind=f((V,), jnp.int32),
        length=jnp.full((V,), VEHICLE_LENGTH, jnp.float32),
        width=jnp.full((V,), VEHICLE_WIDTH, jnp.float32),
        check_collisions=jnp.ones((V,), bool),
        collidable=jnp.ones((V,), bool),
        enable_lane_change=jnp.ones((V,), bool),
        is_yielding=f((V,), bool),
        yield_timer=f((V,), jnp.int32),
        lateral_speed=f((V,), jnp.float32),
        yaw_rate=f((V,), jnp.float32),
        accel_params=jnp.broadcast_to(
            jnp.asarray([0.3, 0.3, 2.0], jnp.float32), (V, 3)
        ),
        steer_params=jnp.broadcast_to(
            jnp.asarray([5.0, 5.0 / 0.6], jnp.float32), (V, 2)
        ),
        mobil_gain=jnp.full((V,), 0.2, jnp.float32),
        mobil_max_braking=jnp.full((V,), 2.0, jnp.float32),
        route_base=jnp.full((V, R), -1, jnp.int32),
        route_n=f((V, R), jnp.int32),
        route_id=jnp.full((V, R), -1, jnp.int32),
        route_ptr=f((V,), jnp.int32),
        route_len=f((V,), jnp.int32),
    )
