"""Per-policy-step decision diff vs the reference for the sequential mode.

Steps engine (sequential_decisions) and reference together and prints, at
each policy step, any per-slot mismatch in target_lane plus the max
position diff — to locate the exact first divergence frame/vehicle.

Usage: python scripts/debug_seq_trace.py <env_id> <seed> [steps]
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


def main(env_id, seed, steps=30):
    import gymnasium as gym
    import highway_env  # noqa: F401

    import highwayenv_tpu as ht
    from highwayenv_tpu import seeding
    from highwayenv_tpu.envs.base import EnvState

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
    state = EnvState(
        vehicles=veh,
        time=jnp.zeros((), jnp.float64),
        steps=jnp.full((), env._initial_steps, jnp.int32),
        key=jax.random.PRNGKey(seed),
    )

    r = np.random.default_rng(12345)
    actions = r.integers(0, env.action_type.n, steps)

    objs0 = list(ref.unwrapped.road.vehicles)
    ego_slots = list(env.ego_slots)
    free = [i for i in range(env.num_slots) if i not in set(env.ego_slots)]
    controlled = set(id(v) for v in ref.unwrapped.controlled_vehicles)
    slot_of = {}
    for v in objs0:
        slot_of[id(v)] = (
            ego_slots.pop(0) if id(v) in controlled else free.pop(0)
        )

    net = env.net

    def ref_lane_id(v, attr):
        tup = getattr(v, attr)
        try:
            return net.global_lane_index(tup)
        except Exception:
            return f"?{tup}"

    for t in range(steps):
        a = int(actions[t])
        ref.step(a)
        _, state, *_ = env.step(state, jnp.int32(a))
        ours_pos = np.asarray(state.vehicles.pos)
        ours_tl = np.asarray(state.vehicles.target_lane)
        ours_lane = np.asarray(state.vehicles.lane)
        msgs = []
        worst = 0.0
        for v in list(ref.unwrapped.road.vehicles):
            slot = slot_of.get(id(v))
            if slot is None:
                continue
            d = float(np.max(np.abs(ours_pos[slot] - v.position)))
            worst = max(worst, d)
            rtl = ref_lane_id(v, "target_lane_index") if hasattr(v, "target_lane_index") else None
            rln = ref_lane_id(v, "lane_index")
            if rtl is not None and rtl != ours_tl[slot]:
                msgs.append(
                    f"slot{slot}: tgt ref={rtl} ours={ours_tl[slot]}"
                )
            if rln != ours_lane[slot]:
                msgs.append(
                    f"slot{slot}: lane ref={rln} ours={ours_lane[slot]}"
                )
            if d > 1e-9:
                msgs.append(f"slot{slot}: pos diff {d:.2e}")
        print(f"t={t:2d} a={a} worst={worst:.2e} " + ("; ".join(msgs) if msgs else "ok"))
        if worst > float(os.environ.get("HT_DEBUG_BREAK", "1e-3")):
            break


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]) if len(sys.argv) > 3 else 30)
