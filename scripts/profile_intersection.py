import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
#!/usr/bin/env python
"""Component timing for intersection-v0 (dispatch-amortized via in-jit scan)."""

import time

import jax
import jax.numpy as jnp

import highwayenv_tpu as ht


def timed(label, fn, *args, n=3, block):
    out = fn(*args)
    jax.block_until_ready(block(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(block(out))
    dt = (time.perf_counter() - t0) / n
    print(f"{label}: {dt*1000:.1f} ms")
    return out, dt


def main():
    B = 1024
    T = 8

    env = ht.make("intersection-v0")
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    _, states = jax.jit(jax.vmap(env._reset))(keys)
    jax.block_until_ready(states.time)

    def scanned(step_fn):
        def run(states, key):
            def body(carry, k):
                s = carry
                a = jax.random.randint(k, (B,), 0, 3)
                out = jax.vmap(step_fn)(s, a)
                return out[1], jnp.sum(out[2])
            return jax.lax.scan(body, states, jax.random.split(key, T))
        return jax.jit(run)

    # 1. plain regulated step
    f = scanned(env._step)
    _, dt = timed("plain step x%d" % T, f, states, jax.random.PRNGKey(1),
                  block=lambda o: o[0].time)
    print(f"  -> per-step {dt/T*1000:.1f} ms, {B*T/dt:,.0f} env-steps/s")

    # 2. no regulation
    env2 = ht.make("intersection-v0")
    env2.regulated = False
    env2._build()
    f2 = scanned(env2._step)
    _, dt2 = timed("no-regulation step x%d" % T, f2, states,
                   jax.random.PRNGKey(1), block=lambda o: o[0].time)
    print(f"  -> per-step {dt2/T*1000:.1f} ms, {B*T/dt2:,.0f} env-steps/s")

    # 3. autoreset (includes the in-step reset branch)
    f3 = scanned(env.step_autoreset)
    _, dt3 = timed("autoreset step x%d" % T, f3, states,
                   jax.random.PRNGKey(1), block=lambda o: o[0].time)
    print(f"  -> per-step {dt3/T*1000:.1f} ms, {B*T/dt3:,.0f} env-steps/s")

    # 4. reset alone
    r = jax.jit(jax.vmap(env._reset))
    _, dt4 = timed("reset", r, keys, block=lambda o: o[1].time)
    print(f"  -> reset {dt4*1000:.1f} ms")


if __name__ == "__main__":
    main()
