"""Per-scenario throughput table on TPU (honest host-materialized timing)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import jax
import jax.numpy as jnp

import highwayenv_tpu as ht
from highwayenv_tpu.parallel.sharding import (
    make_mesh,
    shard_batch,
    sharded_rollout_fn,
)

ENV_IDS = sys.argv[1:] or [
    "highway-v0", "highway-fast-v0", "merge-v0", "roundabout-v0",
    "two-way-v0", "u-turn-v0", "exit-v0", "parking-v0", "racetrack-v0",
    "intersection-v0", "lane-keeping-v0",
]
B = int(__import__("os").environ.get("BENCH_ENVS", 1024))
HORIZON = 16

# envs with expensive resets get extra lines: the in-step autoreset pays a
# full per-env _reset every step (both select branches).
#   +pool    fresh_pool=B//4 — distribution-exact prefix-assigned scenes
#   +compact compact_reset=B//8 — BITWISE-exact gather/scatter of the done
#            rows' own resets (parallel/sharding.py::sharded_rollout_fn)
POOLED_VARIANTS = {"intersection-v0"}
COMPACT_VARIANTS = {"intersection-v0", "racetrack-v0", "highway-v0"}


def bench_one(env_id, mesh, mode):
    label = env_id + {"pool": " +pool", "compact": " +compact"}.get(mode, "")
    try:
        env = ht.make(env_id)
        keys = jax.random.split(jax.random.PRNGKey(0), B)
        _, states = jax.jit(jax.vmap(env._reset))(keys)
        states = shard_batch(states, mesh)
        rollout = sharded_rollout_fn(
            env, mesh, horizon=HORIZON,
            fresh_pool=(B // 4 if mode == "pool" else None),
            compact_reset=(B // 8 if mode == "compact" else None),
        )
        t0 = time.time()
        states, m = rollout(states, jax.random.PRNGKey(1))
        _ = float(m["mean_reward"]) + float(m["obs_checksum"])
        compile_s = time.time() - t0
        t0 = time.time()
        n = 2
        for i in range(n):
            states, m = rollout(states, jax.random.PRNGKey(2 + i))
            _ = float(m["mean_reward"]) + float(m["obs_checksum"])
        dt = time.time() - t0
        print(
            f"{label:22s} {B*HORIZON*n/dt:>10,.0f} env-steps/s   "
            f"(compile {compile_s:.0f}s, done_rate {float(m['done_rate']):.3f})",
            flush=True,
        )
    except Exception as e:  # keep the table going
        print(f"{label:22s} FAILED: {type(e).__name__}: {e}", flush=True)


def main():
    mesh = make_mesh(jax.devices())
    for env_id in ENV_IDS:
        modes = [None]
        if env_id in COMPACT_VARIANTS:
            modes.append("compact")
        if env_id in POOLED_VARIANTS:
            modes.append("pool")
        for mode in modes:
            bench_one(env_id, mesh, mode)


if __name__ == "__main__":
    main()
