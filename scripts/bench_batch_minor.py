"""TPU A/B: batch-minor (V, B) state layout vs batch-major for the XLA fast
path.  vmap(in_axes=-1) makes every sim op carry the batch on the minor
(lane) axis, so (V, V, B) pair matrices waste no lanes (B >= 128) instead of
padding V=51 -> 128 (60% waste batch-major)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import sys

import jax
import jax.numpy as jnp

import highwayenv_tpu as ht
from highwayenv_tpu.ops import straight_fast

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
STEPS = 30

env = ht.make("highway-v0")
frames = env.config["simulation_frequency"] // env.config["policy_frequency"]
print(f"B={B} frames={frames} dev={jax.devices()[0].platform}")

keys = jax.random.split(jax.random.PRNGKey(0), B)
_, states = jax.vmap(env.reset)(keys)
veh0 = states.vehicles


def one(v, a):
    sa = env._action_to_slots(a)
    for i in range(frames):
        v = straight_fast.straight_frame(
            env, env._straight, v, sa, jnp.asarray(i == 0)
        )
    return v


def major_step(veh, actions):
    return jax.vmap(one)(veh, actions)


def _t(x):
    return jnp.moveaxis(x, 0, -1)


def _ut(x):
    return jnp.moveaxis(x, -1, 0)


def minor_step(veh, actions):
    vt = jax.tree.map(_t, veh)
    out = jax.vmap(one, in_axes=-1, out_axes=-1)(vt, _t(actions))
    return jax.tree.map(_ut, out)


def bench(step, name):
    f = jax.jit(step)
    veh = veh0
    acts = jnp.ones((B,), jnp.int32)
    t0 = time.time()
    veh = f(veh, acts)
    _ = float(jnp.sum(veh.pos))
    print(f"{name}: compile+1 {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(STEPS):
        veh = f(veh, acts)
    checksum = float(jnp.sum(veh.pos)) + float(jnp.sum(veh.speed))
    dt = time.time() - t0
    print(
        f"{name}: {dt/STEPS*1e3:.2f} ms/step  {B*STEPS/dt:,.0f} env-steps/s"
        f"  sum={checksum:.3f}"
    )


which = sys.argv[2] if len(sys.argv) > 2 else "both"
if which in ("both", "major"):
    bench(major_step, "major")
if which in ("both", "minor"):
    bench(minor_step, "minor")
