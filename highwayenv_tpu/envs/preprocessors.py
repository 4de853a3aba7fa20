"""Planner-helper state preprocessors.

Functional equivalents of the reference's env-copy helpers
(envs/common/abstract.py:376-453): each takes (env, EnvState) and returns a
new EnvState (the env object itself is immutable config, so there is nothing
else to copy — the reference's ``deepcopy`` becomes a pytree transform).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from highwayenv_tpu.envs.base import EnvState
from highwayenv_tpu.vehicle.state import (
    KIND_IDM,
    KIND_LINEAR,
    KIND_PAD,
    KIND_PLAIN,
)

PERCEPTION_DISTANCE = 200.0  # AbstractEnv.PERCEPTION_DISTANCE


def simplify(env, state: EnvState) -> EnvState:
    """Deactivate vehicles beyond perception range (abstract.py:376-393)."""
    veh = state.vehicles
    ego = env.ego_slots[0]
    d = jnp.linalg.norm(veh.pos - veh.pos[..., ego, :][..., None, :], axis=-1)
    keep = (d < PERCEPTION_DISTANCE) | (jnp.arange(veh.num_slots) == ego)
    keep = keep | ~veh.is_vehicle  # objects are kept (road.objects)
    return state.replace(
        vehicles=veh.replace(
            kind=jnp.where(keep, veh.kind, KIND_PAD)
        )
    )


_KIND_OF_CLASS = {
    "IDMVehicle": KIND_IDM,
    "LinearVehicle": KIND_LINEAR,
    "AggressiveVehicle": KIND_LINEAR,
    "DefensiveVehicle": KIND_LINEAR,
    "Vehicle": KIND_PLAIN,
}


def change_vehicles(env, state: EnvState, vehicle_class_path: str) -> EnvState:
    """Swap all NPC behavior classes (abstract.py:395-410)."""
    name = vehicle_class_path.rsplit(".", 1)[-1]
    kind = _KIND_OF_CLASS[name]
    veh = state.vehicles
    is_npc = veh.is_vehicle & (veh.kind != 1)  # KIND_EGO
    new = veh.replace(kind=jnp.where(is_npc, kind, veh.kind))
    presets = env._NPC_PRESETS.get(name)
    if presets:
        accel_params, gain = presets
        new = new.replace(
            accel_params=jnp.where(
                is_npc[..., None],
                jnp.asarray(accel_params, jnp.float32),
                new.accel_params,
            ),
            mobil_gain=jnp.where(is_npc, gain, new.mobil_gain),
        )
    return state.replace(vehicles=new)


def set_preferred_lane(env, state: EnvState, preferred_lane: int) -> EnvState:
    """Pin IDM routes to a lane id and disable caution (abstract.py:412-421)."""
    veh = state.vehicles
    is_idm = (veh.kind == KIND_IDM) | (veh.kind == KIND_LINEAR)
    has_route = veh.route_base >= 0
    new_route_id = jnp.where(
        has_route & is_idm[..., None], preferred_lane, veh.route_id
    )
    return state.replace(
        vehicles=veh.replace(
            route_id=new_route_id,
            mobil_max_braking=jnp.where(
                is_idm, 1000.0, veh.mobil_max_braking
            ),
        )
    )


def set_vehicle_field(env, state: EnvState, field: str, value) -> EnvState:
    """abstract.py:430-436 for SoA fields (e.g. "enable_lane_change")."""
    veh = state.vehicles
    ego = env.ego_slots[0]
    not_ego = jnp.arange(veh.num_slots) != ego
    arr = getattr(veh, field)
    new = jnp.where(
        jnp.reshape(not_ego, not_ego.shape + (1,) * (arr.ndim - not_ego.ndim)),
        value,
        arr,
    )
    return state.replace(vehicles=veh.replace(**{field: new}))


def randomize_behavior(env, state: EnvState, key) -> EnvState:
    """Redraw per-vehicle behavior parameters (abstract.py:446-451,
    behavior.py:66-69, 405-416)."""
    veh = state.vehicles
    V = veh.num_slots
    k_delta, k_a, k_s = jax.random.split(key, 3)
    is_idm = veh.kind == KIND_IDM
    is_lin = veh.kind == KIND_LINEAR
    delta = jax.random.uniform(k_delta, (V,), minval=3.5, maxval=4.5)
    ua = jax.random.uniform(k_a, (V, 3))
    base = jnp.asarray([0.3, 0.3, 2.0])
    accel_params = 0.5 * base + ua * (1.5 * base - 0.5 * base)
    ub = jax.random.uniform(k_s, (V, 2))
    sp = jnp.asarray([5.0, 5.0 / 0.6])
    lo = sp - jnp.asarray([0.07, 1.5])
    hi = sp + jnp.asarray([0.07, 1.5])
    steer_params = lo + ub * (hi - lo)
    return state.replace(
        vehicles=veh.replace(
            delta=jnp.where(is_idm | is_lin, delta, veh.delta),
            accel_params=jnp.where(
                is_lin[..., None], accel_params, veh.accel_params
            ),
            steer_params=jnp.where(
                is_lin[..., None], steer_params, veh.steer_params
            ),
        )
    )


def set_route_at_intersection(env, state: EnvState, slot: int, _to) -> EnvState:
    """Pick the road followed at the next intersection and rewrite the slot's
    compiled route arrays (vehicle/controller.py:221-234).

    Host-side helper (routes are host-compiled structures); ``_to`` is an
    int index or "random".
    """
    import numpy as np

    from highwayenv_tpu.ops.uncertainty import (
        route_of_slot,
        routes_at_intersection,
    )

    route = route_of_slot(env, state, slot)
    routes = routes_at_intersection(env.net, route)
    if not routes:
        return state
    if _to == "random":
        _to = int(np.random.default_rng().integers(len(routes)))
    chosen = routes[_to % len(routes)]

    veh = state.vehicles
    R = veh.route_base.shape[-1]
    base = np.full(R, -1, np.int32)
    n = np.zeros(R, np.int32)
    rid = np.full(R, -1, np.int32)
    for i, (f, t, lid) in enumerate(chosen[:R]):
        lanes = env.net.lanes_on_edge(f, t)
        base[i] = env.net.global_lane_index((f, t, 0))
        n[i] = len(lanes)
        rid[i] = -1 if lid is None else int(lid)
    return state.replace(
        vehicles=veh.replace(
            route_base=veh.route_base.at[..., slot, :].set(jnp.asarray(base)),
            route_n=veh.route_n.at[..., slot, :].set(jnp.asarray(n)),
            route_id=veh.route_id.at[..., slot, :].set(jnp.asarray(rid)),
            route_ptr=veh.route_ptr.at[..., slot].set(0),
            route_len=veh.route_len.at[..., slot].set(
                min(len(chosen), R)
            ),
        )
    )
