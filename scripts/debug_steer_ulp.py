"""Bitwise-compare every intermediate of the steering chain for one slot
against the reference formulas (numpy f64), to locate the op whose
rounding differs.

Usage: python scripts/debug_steer_ulp.py <env_id> <seed> <slot>
"""

from __future__ import annotations

import os
import sys

os.environ["JAX_ENABLE_X64"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")


def main(env_id, seed, slot):
    import gymnasium as gym
    import highway_env  # noqa: F401
    from highway_env import utils as ref_utils

    import highwayenv_tpu as ht
    from highwayenv_tpu import seeding
    from highwayenv_tpu.road import lane as lane_ops
    from highwayenv_tpu.vehicle import controller

    ref = gym.make(env_id)
    ref.reset(seed=seed)

    env = ht.make(env_id, {"sequential_decisions": True})
    env.geo = env.net.build(dtype=np.float64)
    geo = env.geo

    rng = seeding.np_random(seed)
    builder = seeding._builder_for(env)
    veh = seeding.scene_to_state(env, builder(env, rng), dtype=jnp.float64)

    def up(x):
        if x.dtype == jnp.float32:
            return x.astype(jnp.float64)
        if x.dtype == jnp.int32:
            return x.astype(jnp.int64)
        return x

    veh = jax.tree.map(up, veh)

    ego_slots = list(env.ego_slots)
    free = [i for i in range(env.num_slots) if i not in set(env.ego_slots)]
    controlled = set(id(v) for v in ref.unwrapped.controlled_vehicles)
    slot_of, v_of = {}, {}
    for v in ref.unwrapped.road.vehicles:
        s = ego_slots.pop(0) if id(v) in controlled else free.pop(0)
        slot_of[id(v)] = s
        v_of[s] = v

    rv = v_of[slot]
    print("ref vehicle:", type(rv).__name__, "lane", rv.lane_index,
          "target", rv.target_lane_index, "pos", rv.position, "speed", rv.speed)

    # --- reference chain (exact formulas, vehicle/controller.py) --------- #
    lane = ref.unwrapped.road.network.get_lane(rv.target_lane_index)
    lane_coords = lane.local_coordinates(rv.position)
    TAU_PURSUIT = 0.5 * 0.2  # controller.py: 2*TAU_LATERAL? use engine const
    from highwayenv_tpu.vehicle.controller import (
        TAU_PURSUIT as ENG_TAU,
        KP_LATERAL,
        KP_HEADING,
    )
    lane_next = lane_coords[0] + rv.speed * ENG_TAU
    fut_heading = lane.heading_at(lane_next)
    lat_cmd = -KP_LATERAL * lane_coords[1]
    head_cmd = np.arcsin(np.clip(lat_cmd / ref_utils.not_zero(rv.speed), -1, 1))
    head_ref = fut_heading + np.clip(head_cmd, -np.pi / 4, np.pi / 4)
    rate_cmd = KP_HEADING * ref_utils.wrap_to_pi(head_ref - rv.heading)
    slip = np.arcsin(
        np.clip(rv.LENGTH / 2 / ref_utils.not_zero(rv.speed) * rate_cmd, -1, 1)
    )
    steer = np.arctan(2 * np.tan(slip))

    # --- engine chain ------------------------------------------------------ #
    table_s, table_lat = lane_ops.projection_table(geo, veh.pos)
    s_e = np.asarray(lane_ops.row_lookup(table_s, veh.target_lane))[slot]
    lat_e = np.asarray(lane_ops.row_lookup(table_lat, veh.target_lane))[slot]
    spd = np.asarray(veh.speed)[slot]
    fut_e = np.asarray(
        lane_ops.heading_at(
            geo, veh.target_lane, jnp.asarray(table_s[0] * 0 + 0)
            if False
            else lane_ops.row_lookup(table_s, veh.target_lane)
            + veh.speed * ENG_TAU,
        )
    )[slot]
    steer_eng = np.asarray(
        controller.steering_control_from_table(
            geo, veh.target_lane, veh, table_s, table_lat
        )
    )[slot]

    def cmp(name, a, b):
        print(f"{name:18s} ref={a!r:26} eng={b!r:26} diff={abs(a - b):.3e}")

    cmp("s (longitudinal)", lane_coords[0], s_e)
    cmp("lat", lane_coords[1], lat_e)
    cmp("future_heading", fut_heading, fut_e)
    cmp("steering", float(np.clip(steer, -0.7853981633974483, 0.7853981633974483)), steer_eng)

    # circular-lane internals if applicable
    if hasattr(lane, "center"):
        delta = rv.position - lane.center
        phi = np.arctan2(delta[1], delta[0])
        r = np.linalg.norm(delta)
        print("circ: phi", phi.hex() if hasattr(phi, 'hex') else phi, "r", r)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
