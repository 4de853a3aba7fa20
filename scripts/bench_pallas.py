"""TPU A/B: pallas megakernel vs XLA fast path on highway-v0 simulate core."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

import highwayenv_tpu as ht
from highwayenv_tpu.ops import straight_fast, straight_pallas

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
BLOCK = int(sys.argv[2]) if len(sys.argv) > 2 else 128
STEPS = 30

env = ht.make("highway-v0")
frames = env.config["simulation_frequency"] // env.config["policy_frequency"]
print(f"B={B} block={BLOCK} frames={frames} dev={jax.devices()[0].platform}")

keys = jax.random.split(jax.random.PRNGKey(0), B)
_, states = jax.vmap(env.reset)(keys)
veh0 = states.vehicles


def xla_step(veh, actions):
    def one(v, a):
        sa = env._action_to_slots(a)
        for i in range(frames):
            v = straight_fast.straight_frame(
                env, env._straight, v, sa, jnp.asarray(i == 0)
            )
        return v

    return jax.vmap(one)(veh, actions)


def pal_step(veh, actions):
    sa = jax.vmap(env._action_to_slots)(actions)
    ego = veh.kind == straight_pallas.KIND_EGO
    veh = jax.vmap(lambda v, m, s: env.action_type.apply(env.geo, v, m, s))(
        veh, ego, sa
    )
    return straight_pallas.pallas_simulate(env, veh, frames, block=BLOCK)


def bench(step, name):
    f = jax.jit(step)
    veh = veh0
    acts = jnp.ones((B,), jnp.int32)
    t0 = time.time()
    veh = f(veh, acts)
    _ = float(jnp.sum(veh.pos))  # host materialization
    print(f"{name}: compile+1 {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(STEPS):
        veh = f(veh, acts)
    checksum = float(jnp.sum(veh.pos)) + float(jnp.sum(veh.speed))
    dt = time.time() - t0
    sps = B * STEPS / dt
    print(f"{name}: {dt/STEPS*1e3:.2f} ms/step  {sps:,.0f} env-steps/s  sum={checksum:.3f}")
    return sps, checksum


which = sys.argv[3] if len(sys.argv) > 3 else "both"
if which in ("both", "xla"):
    bench(xla_step, "xla ")
if which in ("both", "pallas"):
    bench(pal_step, "pallas")
