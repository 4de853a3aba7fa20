"""Decompose the per-policy-step cost of the batched autoreset pipeline
on the real chip: sim kernel alone vs heads (obs/reward/reset) alone vs
the full step, amortized over an in-executable scan (>=8 reps) so tunnel
RTT is out of the measurement (BASELINE.md measurement note).

Usage: python scripts/decompose_step.py [env_id] [B] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import highwayenv_tpu as ht


def timed(fn, states, reps, label):
    out = fn(states)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    # host-materialize a scalar through the tunnel for honest timing
    t0 = time.perf_counter()
    out = fn(states)
    chk = float(jax.tree.leaves(out)[0].ravel()[0])
    dt = time.perf_counter() - t0
    assert chk == chk
    per = dt / reps * 1e3
    print(f"{label:28s} {per:8.2f} ms/step")
    return per


def main():
    env_id = sys.argv[1] if len(sys.argv) > 1 else "highway-v0"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    env = ht.make(env_id)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    _, states0 = jax.jit(jax.vmap(env._reset))(keys)

    acts = jnp.zeros((B,), jnp.int32) + 1

    @jax.jit
    def full(states):
        def body(s, _):
            obs, s, r, te, tr, info = env.step_autoreset_batched(s, acts)
            return s, (jnp.sum(r), jnp.sum(obs))
        s, out = jax.lax.scan(body, states, None, length=reps)
        return out

    @jax.jit
    def sim_only(states):
        def body(s, _):
            s2 = env._simulate_batched(s, acts)
            if s2 is None:
                raise SystemExit("no batched sim path for this env")
            return s2, jnp.sum(s2.vehicles.pos)
        s, out = jax.lax.scan(body, states, None, length=reps)
        return out

    @jax.jit
    def heads_only(states):
        def body(s, _):
            obs, s2, r, te, tr, info = jax.vmap(env._finish_autoreset)(
                s, acts
            )
            return s2, (jnp.sum(r), jnp.sum(obs))
        s, out = jax.lax.scan(body, states, None, length=reps)
        return out

    print(f"{env_id} B={B} reps={reps} platform={jax.devices()[0].platform}")
    t_full = timed(full, states0, reps, "full step")
    t_sim = timed(sim_only, states0, reps, "sim only")
    t_heads = timed(heads_only, states0, reps, "heads only (obs+rew+reset)")
    print(
        f"sim+heads={t_sim + t_heads:.2f} vs full={t_full:.2f} "
        f"(boundary/fusion delta {t_full - t_sim - t_heads:+.2f})"
    )
    print(f"implied env-steps/s at full: {B / t_full * 1e3:,.0f}")


if __name__ == "__main__":
    main()
