"""Break the highway-v0 headline step (B=4096) into its cost components.

Decides where the next perf lever is by measuring, per policy step:
  A. full pipeline       (sharded_rollout_fn: sim + pack/unpack + head)
  B. sim, persistent BM  (pallas kernel scanned on packed (V, B) arrays —
                          the kernel floor, no per-step transposes)
  C. sim via VehicleState (pallas + per-step pack/unpack transposes)
  D. head only           (_finish_autoreset scanned on a fixed state)

A - C      ~= head cost in situ
C - B      ~= per-step pack/unpack transpose cost
A - B - D  ~= interaction / scheduling slack

Usage:  python scripts/profile_headline_breakdown.py [B] [T]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import highwayenv_tpu as ht
from highwayenv_tpu.ops.straight_pallas_bm import (
    build_pallas_frame,
    pack_bm,
    unpack_bm,
    pallas_simulate_bm,
)
from highwayenv_tpu.parallel.sharding import (
    make_mesh,
    shard_batch,
    sharded_rollout_fn,
)


def timed(fn, carry, n=3):
    """Median of n host-materialized timings (tunnel-safe: float() forces
    the transfer inside the region).

    ``fn(carry) -> (carry, outs)`` and the new carry is threaded into the
    next call — the rollouts donate their state argument, so the input
    buffer of call k is dead by call k+1 and must not be reused.
    """
    carry, outs = fn(carry)  # compile
    s = sum(
        float(jnp.sum(x).astype(jnp.float32))
        for x in jax.tree.leaves(outs)
        if hasattr(x, "dtype")
    )
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        carry, outs = fn(carry)
        s = sum(
            float(jnp.sum(x).astype(jnp.float32))
            for x in jax.tree.leaves(outs)
            if hasattr(x, "dtype")
        )
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2], s


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    env = ht.make("highway-v0")
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    _, states = jax.jit(jax.vmap(env._reset))(keys)
    mesh = make_mesh()
    states = shard_batch(states, mesh)
    n_act = env.action_type.n

    # ---- A: full pipeline -------------------------------------------- #
    rollout = sharded_rollout_fn(env, mesh, horizon=T)
    tA, _ = timed(lambda s: rollout(s, jax.random.PRNGKey(1)), states)
    states = shard_batch(
        jax.jit(jax.vmap(env._reset))(keys)[1], mesh
    )  # rollout donated the original

    # ---- B: sim only, persistent batch-minor ------------------------- #
    frames = env.frames_per_step
    frame_fn = build_pallas_frame(env, frames=frames)
    veh = states.vehicles

    def _checksum(tree):
        # one scalar keeps everything live and costs ONE host round trip
        # (per-leaf float() would pay ~30 tunnel RTTs and dominate)
        return sum(
            jnp.sum(x).astype(jnp.float32) for x in jax.tree.leaves(tree)
        )

    @jax.jit
    def sim_bm(veh, key):
        arrays = pack_bm(veh)

        def body(arrs, k):
            # ego action applied in XLA on the BM arrays' owner state is
            # skipped here: measuring the kernel floor only
            return frame_fn(arrs), jnp.float32(0)

        arrays, _ = jax.lax.scan(body, arrays, jax.random.split(key, T))
        return _checksum(arrays)

    tB, _ = timed(lambda v: (v, sim_bm(v, jax.random.PRNGKey(2))), veh)

    # ---- C: sim via VehicleState (per-step pack/unpack) --------------- #
    @jax.jit
    def sim_state(veh, key):
        def body(v, k):
            acts = jax.random.randint(k, (B,), 0, n_act)
            sa = jax.vmap(env._action_to_slots)(acts)
            return pallas_simulate_bm(env, v, sa, frames), jnp.float32(0)

        veh, _ = jax.lax.scan(body, veh, jax.random.split(key, T))
        return _checksum(veh)

    tC, _ = timed(lambda v: (v, sim_state(v, jax.random.PRNGKey(3))), veh)

    # ---- D: head only -------------------------------------------------- #
    @jax.jit
    def head_only(states, key):
        def body(s, k):
            acts = jax.random.randint(k, (B,), 0, n_act)
            obs, s2, r, te, tr, _ = jax.vmap(env._finish_autoreset)(s, acts)
            return s2, (jnp.mean(r), sum(jnp.sum(x) for x in jax.tree.leaves(obs)))

        s, out = jax.lax.scan(body, states, jax.random.split(key, T))
        return _checksum(out)

    tD, _ = timed(
        lambda s: (s, head_only(s, jax.random.PRNGKey(4))), states
    )

    ms = lambda t: 1e3 * t / T
    print(f"B={B} T={T} frames/step={frames}")
    print(f"A full pipeline        : {ms(tA):8.2f} ms/step  ({B/(tA/T):,.0f} env-steps/s)")
    print(f"B sim persistent-BM    : {ms(tB):8.2f} ms/step")
    print(f"C sim + pack/unpack    : {ms(tC):8.2f} ms/step")
    print(f"D head only            : {ms(tD):8.2f} ms/step")
    print(f"  head in situ (A-C)   : {ms(tA - tC):8.2f} ms/step")
    print(f"  transposes (C-B)     : {ms(tC - tB):8.2f} ms/step")
    print(f"  slack (A-B-D)        : {ms(tA - tB - tD):8.2f} ms/step")


if __name__ == "__main__":
    main()
