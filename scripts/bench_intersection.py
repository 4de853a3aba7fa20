"""TPU A/B: pooled-reset rollout vs in-step autoreset on intersection-v0."""

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
    pooled_rollout_fn,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
HORIZON = 20
ROUNDS = 3

env = ht.make("intersection-v0")
mesh = make_mesh(jax.devices())
keys = jax.random.split(jax.random.PRNGKey(0), B)
_, states0 = jax.jit(jax.vmap(env._reset))(keys)
print(f"B={B} dev={jax.devices()[0].platform}")

which = sys.argv[2] if len(sys.argv) > 2 else "both"

if which in ("both", "autoreset"):
    states = shard_batch(states0, mesh)
    rollout = sharded_rollout_fn(env, mesh, horizon=HORIZON)
    t0 = time.time()
    states, m = rollout(states, jax.random.PRNGKey(1))
    _ = float(m["mean_reward"]) + float(m["obs_checksum"])
    print(f"autoreset: compile+1 {time.time()-t0:.1f}s")
    t0 = time.time()
    for i in range(ROUNDS):
        states, m = rollout(states, jax.random.PRNGKey(2 + i))
        _ = float(m["mean_reward"]) + float(m["obs_checksum"])
    dt = time.time() - t0
    print(f"autoreset: {B*HORIZON*ROUNDS/dt:,.0f} env-steps/s")

if which in ("both", "pooled"):
    states = shard_batch(states0, mesh)
    rollout, init_pool = pooled_rollout_fn(env, mesh, horizon=HORIZON)
    pool = init_pool(jax.random.PRNGKey(7))
    t0 = time.time()
    states, pool, m = rollout(states, pool, jax.random.PRNGKey(1))
    _ = float(m["mean_reward"]) + float(m["obs_checksum"])
    print(f"pooled: compile+1 {time.time()-t0:.1f}s")
    t0 = time.time()
    for i in range(ROUNDS):
        states, pool, m = rollout(states, pool, jax.random.PRNGKey(2 + i))
        _ = float(m["mean_reward"]) + float(m["obs_checksum"])
    dt = time.time() - t0
    print(f"pooled: {B*HORIZON*ROUNDS/dt:,.0f} env-steps/s  "
          f"done_rate={float(m['done_rate']):.3f}")
