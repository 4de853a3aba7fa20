"""Ablation timings for intersection-v0 on TPU (host-materialized)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

import highwayenv_tpu as ht
import highwayenv_tpu.envs.intersection as ienv

B = 1024
T = 8


def timed(label, fn, states, key):
    out = fn(states, key)
    _ = float(out[1])
    t0 = time.perf_counter()
    n = 3
    for i in range(n):
        out = fn(states, jax.random.fold_in(key, i))
        _ = float(out[1])
    dt = (time.perf_counter() - t0) / n / T * 1000
    print(f"{label}: {dt:.2f} ms/step  ({B*1000/dt:,.0f} env-steps/s)")


def scanned(step_fn):
    def run(states, key):
        def body(s, k):
            a = jax.random.randint(k, (B,), 0, 3)
            out = jax.vmap(step_fn)(s, a)
            return out[1], jnp.sum(out[2])

        s, rs = jax.lax.scan(body, states, jax.random.split(key, T))
        return s, jnp.sum(rs)

    return jax.jit(run)


class NoReg(ienv.IntersectionEnv):
    regulated = False


class NoRegFast(ienv.IntersectionEnv):
    regulated = False
    fast_straight = False  # (already None; explicit)


env = ht.make("intersection-v0")
keys = jax.random.split(jax.random.PRNGKey(0), B)
_, states = jax.jit(jax.vmap(env._reset))(keys)
_ = float(jnp.sum(states.time))
print(f"dev={jax.devices()[0].platform} B={B} V={states.vehicles.num_slots}")

# full step
timed("full _step          ", scanned(env._step), states, jax.random.PRNGKey(1))

# sim only (skip obs/reward/termination)
def sim_only(state, action):
    sa = env._action_to_slots(action)
    s2 = env._simulate(state, sa)
    return None, s2, s2.vehicles.speed.sum(), None


timed("simulate only       ", scanned(sim_only), states, jax.random.PRNGKey(2))

# no regulation
nr = NoReg()
timed("no regulation       ", scanned(nr._step), states, jax.random.PRNGKey(3))


def finish_only(state, action):
    out = env._finish_step(state, action)
    return None, state, out[2], None


timed("obs/reward only     ", scanned(finish_only), states, jax.random.PRNGKey(4))


def reset_only(state, action):
    _, s = env._reset(jax.random.fold_in(state.key, 0))
    return None, s, s.vehicles.speed.sum(), None


timed("reset only          ", scanned(reset_only), states, jax.random.PRNGKey(5))
