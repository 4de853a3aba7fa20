"""Decompose intersection-v0 regulated-path costs on TPU (round 5).

Times, at B envs (dispatch-amortized via an in-jit scan over SCAN steps):
  1. default env._step (XLA tick-scheduled regulation)         [exact]
  2. general Pallas kernel, NON-regulated build (no enforcement — timing
     floor for the megakernel on this scene)
  3. general Pallas kernel, regulated build (enforcement computed every
     frame, masked to per-env tick phase)                      [exact]
  4. one XLA enforce_road_rules evaluation (vmapped)

Decides where the round-5 static-slot schedule should place enforcement.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

import highwayenv_tpu as ht
from highwayenv_tpu.ops.general_pallas_bm import pallas_simulate_general
from highwayenv_tpu.road import regulation

B = int(_sys.argv[1]) if len(_sys.argv) > 1 else 1024
SCAN = 8

env = ht.make("intersection-v0")
keys = jax.random.split(jax.random.PRNGKey(0), B)
_, states = jax.jit(jax.vmap(env._reset))(keys)
jax.block_until_ready(states.time)
veh = states.vehicles
F = env.frames_per_step
print(
    f"dev={jax.devices()[0].platform} B={B} V={veh.timer.shape[1]} "
    f"L={env.geo.num_lanes} frames={F} period={env._regulation_period}"
)


def bench(label, fn, arg):
    g = jax.jit(
        lambda v: jax.lax.scan(lambda c, _: (fn(c), None), v, None, length=SCAN)[0]
    )
    t0 = time.perf_counter()
    out = g(arg)
    jax.block_until_ready(out.timer if hasattr(out, "timer") else out)
    print(f"{label}: compile+1 {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        out = g(arg)
        jax.block_until_ready(out.timer if hasattr(out, "timer") else out)
    dt = (time.perf_counter() - t0) / n / SCAN
    print(f"{label}: {dt*1000:7.2f} ms/policy-step  "
          f"({B/dt:,.0f} env-steps/s)", flush=True)
    return dt


acts = jnp.zeros((B,), jnp.int32)
sa = jax.vmap(env._action_to_slots)(acts)

LEGS = set((_sys.argv[2] if len(_sys.argv) > 2 else "1234"))

# 1. default exact step (XLA tick scheduler), batched entry point
def default_step(s):
    return env.step_batched(s, acts)[1]

g = jax.jit(
    lambda s: jax.lax.scan(lambda c, _: (default_step(c), None), s, None, length=SCAN)[0]
) if "1" in LEGS else None
t0 = time.perf_counter()
if g is not None:
    out = g(states)
    jax.block_until_ready(out.time)
    print(f"default _step (XLA sched): compile+1 {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(3):
        out = g(states)
        jax.block_until_ready(out.time)
    dt = (time.perf_counter() - t0) / 3 / SCAN
    print(f"default _step (XLA sched): {dt*1000:7.2f} ms/policy-step  ({B/dt:,.0f} env-steps/s)", flush=True)

import traceback

def leg(label, fn, arg):
    try:
        bench(label, fn, arg)
    except Exception:
        print(f"{label}: FAILED"); traceback.print_exc()

# 2. non-regulated kernel (timing floor)
if "2" in LEGS: leg("general kernel, no reg   ",
    lambda v: pallas_simulate_general(env, v, sa, F), veh)

# 3. regulated kernel (enforcement every frame, masked)
steps0 = jnp.zeros((B,), jnp.int32)
if "3" in LEGS: leg("general kernel, reg/frame",
    lambda v: pallas_simulate_general(env, v, sa, F, steps0=steps0), veh)

# 4. one XLA enforcement eval
if "4" in LEGS: leg("XLA enforce x1           ",
    lambda v: jax.vmap(lambda s: regulation.enforce_road_rules(env.geo, s))(v),
    veh)
