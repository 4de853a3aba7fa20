"""Component timing for highway-v0 at B=4096 on TPU: XLA sim vs pallas sim
vs observation vs full autoreset step."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import highwayenv_tpu as ht
from highwayenv_tpu.ops.straight_fast import straight_frame
from highwayenv_tpu.ops.straight_pallas_bm import (
    build_pallas_frame, pack_bm, unpack_bm,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
env = ht.make("highway-v0")
keys = jax.random.split(jax.random.PRNGKey(0), B)
_, states = jax.jit(jax.vmap(env._reset))(keys)
acts = jnp.ones((B,), jnp.int32)
print(f"B={B}", flush=True)


def timed(label, fn, *args):
    out = fn(*args)
    _ = float(np.sum(np.asarray(jax.tree.leaves(out)[0], np.float64)))
    t0 = time.perf_counter()
    n = 5
    for _i in range(n):
        out = fn(*args)
        _ = float(np.sum(np.asarray(jax.tree.leaves(out)[0], np.float64)))
    dt = (time.perf_counter() - t0) / n
    print(f"{label:28s} {dt*1e3:8.2f} ms  ({B/dt:,.0f} env-steps/s)", flush=True)
    return out


# (a) XLA batch-minor sim (the step_autoreset_batched inner loop)
def t(x):
    return jnp.moveaxis(x, 0, -1)


def ut(x):
    return jnp.moveaxis(x, -1, 0)


slot_actions = jax.vmap(env._action_to_slots)(acts)


@jax.jit
def xla_sim(veh, sa):
    veh_t = jax.tree.map(t, veh)
    sa_t = jax.tree.map(t, sa)
    frame = jax.vmap(
        lambda v, s, first: straight_frame(env, env._straight, v, s, first),
        in_axes=(-1, -1, None), out_axes=-1,
    )

    def body(v, i):
        return frame(v, sa_t, i == 0), None

    veh_t, _ = jax.lax.scan(body, veh_t, jnp.arange(15))
    return jax.tree.map(ut, veh_t)


veh = states.vehicles
timed("XLA sim (batch-minor)", xla_sim, veh, slot_actions)

# (b) pallas sim
frame = build_pallas_frame(env, block=128)


@jax.jit
def pallas_sim(veh, sa):
    ego_mask = veh.kind == 1
    v = env.action_type.apply(env.geo, veh, ego_mask, sa)
    arrays = pack_bm(v)

    def body(a, _):
        return list(frame(a)), None

    arrays, _ = jax.lax.scan(body, list(arrays), None, length=15)
    return unpack_bm(arrays, v)


timed("pallas sim (block=128)", pallas_sim, veh, slot_actions)

# (c) observation only
@jax.jit
def obs_only(states):
    return jax.vmap(lambda s: env._observe(s))(states)


timed("observe", obs_only, states)

# (d) reset only
@jax.jit
def reset_only(keys):
    return jax.vmap(env._reset)(keys)


timed("reset (vmapped)", reset_only, keys)

# (e) full current pipeline
step = jax.jit(env.step_autoreset_batched)
timed("step_autoreset_batched", step, states, acts)
