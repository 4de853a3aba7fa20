"""Sorted-kernel fallback under a crash-heavy policy (VERDICT r4 #2).

The s-sorted banded kernel is exact via a per-env dense fallback (round 5:
gather <=128 firing envs, patch only those).  Random policy measures a 0.0
firing rate; a crash-prone policy (constant FASTER) piles vehicles into the
reach window — this script records, at the headline batch:

  1. e2e env-steps/s, random policy (reference point = headline)
  2. e2e env-steps/s, constant-FASTER policy (autoreset on)
  3. sim-only throughput + fallback firing stats under constant FASTER
     with NO autoreset — crashes accumulate for the whole horizon, the
     worst case for pile-ups (pallas_simulate_bm_sorted(return_viol=True))

Prints one JSON line per row.
"""

import json
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

import highwayenv_tpu as ht
from highwayenv_tpu.ops.straight_pallas_bm import pallas_simulate_bm_sorted

B = int(_os.environ.get("BENCH_ENVS", 4096))
T = 16
CHUNKS = 3
FASTER = 3  # DiscreteMetaAction index

env = ht.make("highway-v0")
keys = jax.random.split(jax.random.PRNGKey(0), B)
_, states0 = jax.jit(jax.vmap(env._reset))(keys)
jax.block_until_ready(states0.time)
print(f"dev={jax.devices()[0].platform} B={B}", flush=True)


def run_e2e(label, sample):
    def chunk(states, key):
        def body(c, k):
            obs, st, r, term, trunc, _ = env.step_autoreset_batched(
                c, sample(k)
            )
            return st, (jnp.mean(r), jnp.sum(obs))

        st, (rs, os_) = jax.lax.scan(body, states, jax.random.split(key, T))
        return st, jnp.mean(rs) + jnp.sum(os_) * 0.0

    g = jax.jit(chunk)  # no donation: states0 is reused across rows
    st, m = g(states0, jax.random.PRNGKey(1))
    float(m)
    t0 = time.perf_counter()
    for c in range(CHUNKS):
        st, m = g(st, jax.random.PRNGKey(2 + c))
    float(m)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "row": label, "env_steps_per_sec": round(B * T * CHUNKS / dt, 1),
    }), flush=True)


run_e2e("highway e2e random policy",
        lambda k: jax.random.randint(k, (B,), 0, env.action_type.n))
run_e2e("highway e2e constant-FASTER",
        lambda k: jnp.full((B,), FASTER, jnp.int32))

# sim-only, no autoreset: crashes persist -> maximal pile-ups
sa_const = jax.vmap(env._action_to_slots)(jnp.full((B,), FASTER, jnp.int32))
frames = env.frames_per_step


def sim_chunk(veh):
    def body(v, _):
        v2, n_viol = pallas_simulate_bm_sorted(
            env, v, sa_const, frames, return_viol=True
        )
        return v2, n_viol

    return jax.lax.scan(body, veh, None, length=T)


g = jax.jit(sim_chunk)
veh, viols = g(states0.vehicles)
jax.block_until_ready(viols)
t0 = time.perf_counter()
all_viols = []
crashed_frac = 0.0
for c in range(CHUNKS):
    veh, viols = g(veh)
    all_viols.append(viols)
    jax.block_until_ready(viols)
dt = time.perf_counter() - t0
import numpy as np

v = np.concatenate([np.asarray(x) for x in all_viols])
crashed = float(jnp.mean(veh.crashed.astype(jnp.float32)))
print(json.dumps({
    "row": "sim-only constant-FASTER no-autoreset (pile-up worst case)",
    "env_steps_per_sec": round(B * T * CHUNKS / dt, 1),
    "fallback_steps_fired_frac": round(float((v > 0).mean()), 4),
    "fallback_envs_mean": round(float(v.mean()), 2),
    "fallback_envs_max": int(v.max()),
    "patch_budget": 128,
    "crashed_slot_frac_end": round(crashed, 3),
}), flush=True)
