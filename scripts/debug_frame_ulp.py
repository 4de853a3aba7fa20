"""Find the first field/slot where one simulation frame differs from the
reference at the ulp level (f64).  Steps exactly ONE frame (road.act +
road.step) with no ego action on both sides and prints per-slot diffs.

Usage: python scripts/debug_frame_ulp.py <env_id> <seed> [n_frames]
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


def main(env_id, seed, n_frames=5):
    import gymnasium as gym
    import highway_env  # noqa: F401

    import highwayenv_tpu as ht
    from highwayenv_tpu import seeding
    from highwayenv_tpu.road import lane as lane_ops

    ref = gym.make(env_id)
    ref.reset(seed=seed)

    env = ht.make(env_id, {"sequential_decisions": True})
    env.geo = env.net.build(dtype=np.float64)

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
    slot_of = {}
    for v in ref.unwrapped.road.vehicles:
        slot_of[id(v)] = (
            ego_slots.pop(0) if id(v) in controlled else free.pop(0)
        )

    V = env.num_slots
    slot_actions = jnp.zeros((V,), jnp.int64)
    dt = 1.0 / env.config["simulation_frequency"]

    frame = jax.jit(
        lambda veh, tables: env._frame(
            veh, tables, slot_actions, jnp.asarray(False)
        )
    )
    tables = lane_ops.projection_table(env.geo, veh.pos)

    for f in range(n_frames):
        ref.unwrapped.road.act()
        ref.unwrapped.road.step(dt)
        veh, tables = frame(veh, tables)
        pos = np.asarray(veh.pos)
        spd = np.asarray(veh.speed)
        hd = np.asarray(veh.heading)
        acc = np.asarray(veh.accel)
        st = np.asarray(veh.steering)
        print(f"--- frame {f} ---")
        for v in ref.unwrapped.road.vehicles:
            s = slot_of[id(v)]
            dp = np.max(np.abs(pos[s] - v.position))
            ds = abs(spd[s] - v.speed)
            dh = abs(hd[s] - v.heading)
            da = abs(acc[s] - v.action["acceleration"])
            dst = abs(st[s] - v.action["steering"])
            if max(dp, ds, dh, da, dst) > 0:
                print(
                    f"  slot{s}: dpos={dp:.3e} dspd={ds:.3e} dhd={dh:.3e}"
                    f" dacc={da:.3e} dsteer={dst:.3e}"
                )


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]) if len(sys.argv) > 3 else 5)
