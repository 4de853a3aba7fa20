"""Full-precision (float64) long-horizon trace parity vs the reference.

Run in its OWN process (JAX_ENABLE_X64 must be set before jax initializes):

    python tests/parity/x64_trace_check.py <env_id> <steps> <seed> [atol_per_t]

Builds the seeded scene via the host draw replay at float64, rebuilds the
lane geometry tables at float64, and steps engine + reference with the same
action sequence, asserting every vehicle position within ``atol_per_t * t``.
Exit code 0 = parity held.  The pytest wrapper (test_x64_traces.py) runs a
matrix of scenarios.
"""

from __future__ import annotations

import os
import sys

os.environ["JAX_ENABLE_X64"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

REFERENCE = "/root/reference"
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)


def main(env_id: str, steps: int, seed: int, atol_per_t: float) -> int:
    import gymnasium as gym
    import highway_env  # noqa: F401

    import highwayenv_tpu as ht
    from highwayenv_tpu import seeding
    from highwayenv_tpu.envs.base import EnvState

    cfg = {"spawn_probability": 0.0} if "intersection" in env_id else None
    ref = gym.make(env_id, config=cfg) if cfg else gym.make(env_id)
    ref.reset(seed=seed)

    if os.environ.get("HT_SEQUENTIAL"):
        # exact act()-list-order decision pass (PARITY.md #1 removed):
        # required for seeds whose traces hit a same-frame lane-change
        # interaction (e.g. u-turn seeds 0/3)
        cfg = dict(cfg or {}, sequential_decisions=True)
    env = ht.make(env_id, cfg) if cfg else ht.make(env_id)
    # float64 lane tables (the build is float64 host math throughout;
    # only the final cast changes)
    env.geo = env.net.build(dtype=np.float64)

    rng = seeding.np_random(seed)
    is_intersection = any(
        cls.__name__ == "IntersectionEnv" for cls in type(env).__mro__
    )
    if is_intersection:
        # float64 device warm-up against the reference's float64 Python
        # warm-up: the regulated path's full step math under test
        veh = seeding._seeded_intersection_vehicles(
            env, rng, dtype=jnp.float64
        )
    else:
        builder = seeding._builder_for(env)
        veh = seeding.scene_to_state(env, builder(env, rng), dtype=jnp.float64)

    # x64-canonical state: all floats f64, ints i64 (ops promote under x64)
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
    if hasattr(env.action_type, "n"):
        actions = r.integers(0, env.action_type.n, steps)
        to_act = lambda a: jnp.int32(a)
    else:
        actions = r.uniform(-0.6, 0.6, (steps, env.action_type.size))
        to_act = lambda a: jnp.asarray(a, jnp.float64)

    # slot mapping established once at t=0.  Default: scene order == list
    # order with egos at ego_slots.  Intersection: slot-recycled spawns and
    # near-collision drops reorder slots, so map by nearest initial position.
    slot_of: dict[int, int] = {}
    objs0 = list(ref.unwrapped.road.vehicles) + list(ref.unwrapped.road.objects)
    pos0 = np.asarray(state.vehicles.pos)
    if is_intersection:
        kind0 = np.asarray(state.vehicles.kind)
        live = [i for i in range(env.num_slots) if kind0[i] != 0]
        for v in objs0:
            d = np.linalg.norm(pos0[live] - np.asarray(v.position), axis=-1)
            j = int(np.argmin(d))
            if d[j] > 1e-3:
                print(f"FAIL {env_id} seed={seed} t=init unmatched spawn d={d[j]:.3e}")
                return 1
            slot_of[id(v)] = live.pop(j)
    else:
        ego_slots = list(env.ego_slots)
        free = [i for i in range(env.num_slots) if i not in set(env.ego_slots)]
        controlled = set(id(v) for v in ref.unwrapped.controlled_vehicles)
        for v in objs0:
            slot_of[id(v)] = (
                ego_slots.pop(0) if id(v) in controlled else free.pop(0)
            )

    worst = 0.0
    for t in range(steps):
        a = actions[t]
        ref.step(a if np.ndim(a) else int(a))
        _, state, *_ = env.step(state, to_act(a))
        objs = list(ref.unwrapped.road.vehicles) + list(
            ref.unwrapped.road.objects
        )
        ours = np.asarray(state.vehicles.pos)
        tol = atol_per_t * (t + 1)
        for v in objs:
            slot = slot_of.get(id(v))
            if slot is None:
                continue  # spawned mid-episode (frozen configs: unreachable)
            d = float(np.max(np.abs(ours[slot] - v.position)))
            worst = max(worst, d)
            if d > tol:
                print(
                    f"FAIL {env_id} seed={seed} t={t} slot={slot} "
                    f"diff={d:.3e} > {tol:.3e}"
                )
                return 1
    print(f"PASS {env_id} seed={seed} steps={steps} worst={worst:.3e}")
    return 0


if __name__ == "__main__":
    env_id = sys.argv[1]
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    atol = float(sys.argv[4]) if len(sys.argv) > 4 else 1e-6
    sys.exit(main(env_id, steps, seed, atol))
