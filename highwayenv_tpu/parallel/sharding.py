"""Multi-device scaling: shard the env batch over a device mesh.

The reference's only parallelism is Gymnasium subprocess vectorization
(SURVEY.md section 5.8).  The TPU-native equivalent: env state is a pytree
with a leading batch axis, sharded over a 1-D ``Mesh(("env",))`` with
``NamedSharding``; the jitted vmapped step runs SPMD, and learner-style
reductions ride ICI collectives (psum/all_gather) with no host round trips.
Multi-host: the same code under ``jax.distributed.initialize`` — the env axis
spans all chips of the pod slice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "env") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(tree, mesh: Mesh, axis_name: str = "env"):
    """Place a batched pytree with its leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(tree, sharding)


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def _action_sampler(env, B):
    """Random-policy action batch: Discrete -> randint, Continuous -> U(-1,1)
    (DiscreteAction subclasses ContinuousAction but exposes ``n``)."""
    at = env.action_type
    if hasattr(at, "n"):
        return lambda k: jax.random.randint(k, (B,), 0, at.n)
    size = at.size
    return lambda k: jax.random.uniform(k, (B, size), minval=-1.0, maxval=1.0)


def sharded_rollout_fn(
    env,
    mesh: Mesh,
    horizon: int,
    axis_name: str = "env",
    fresh_pool: int | None = None,
    compact_reset: int | None = None,
):
    """Build a jitted sharded rollout: ``(states, key) -> (states, metrics)``.

    Random policy rollout with per-env auto-reset; returns the running state
    (donated) plus mean reward / done-rate reduced across the whole mesh —
    the collective pattern a learner would use.

    ``fresh_pool=P`` amortizes expensive resets while staying exact in
    distribution: each step computes P fresh ``_reset`` scenes (unique keys)
    and assigns them to the step's done envs in prefix order, so every reset
    still gets its own fresh random scene — unlike ``pooled_rollout_fn``,
    whose rotating bank can hand the same scene to two resets.  The in-step
    autoreset evaluates ``_reset`` for ALL B envs every step (XLA computes
    both select branches); with P = B/4 the reset work drops 4x while the
    P-bound sits ~15 sigma above the done-count mean (binomial B=1024,
    p~0.1: mean ~102, sigma ~10; P=B/8 is only ~3 sigma — too tight) —
    overflow envs would reuse the last pool entry, which never observably
    happens at B/4.  Row-level determinism (env i's next scene independent
    of other rows) does NOT hold in this mode; use the default for the
    invariance suite.  Measured (intersection-v0, B=1024, TPU v5e):
    26.1k -> 34.8k env-steps/s.

    ``compact_reset=P`` amortizes resets EXACTLY: the autoreset gathers the
    done rows' own reset keys into P slots, resets only those, and scatters
    back (``BaseEnv._compact_autoreset``) — bitwise the per-row full
    evaluation, with overflow handled by extra while_loop passes.  Prefer
    this over ``fresh_pool`` unless profiling shows the gather/scatter
    itself is the limiter.  Mutually exclusive with ``fresh_pool``.
    """
    assert not (fresh_pool and compact_reset), (
        "fresh_pool and compact_reset are alternative reset-amortization "
        "strategies; pass one"
    )
    batch_spec = NamedSharding(mesh, P(axis_name))

    def rollout(states, key):
        B = states.time.shape[0]
        sample = _action_sampler(env, B)

        def body(carry, k):
            states = carry
            acts = sample(k)
            if fresh_pool is None:
                obs, states, r, term, trunc, _ = env.step_autoreset_batched(
                    states, acts, reset_slots=compact_reset
                )
            else:
                # step_batched, NOT jax.vmap(env._step): the batched entry
                # keeps the pallas fast paths (vmapped _step is 4.7x slower
                # on highway-v0 @ B=4096)
                obs, new_states, r, term, trunc, _ = env.step_batched(
                    states, acts
                )
                done = term | trunc
                k_pool = jax.random.fold_in(k, 0x5EED)
                p_obs, p_states = jax.vmap(env._reset)(
                    jax.random.split(k_pool, fresh_pool)
                )
                rank = jnp.clip(
                    jnp.cumsum(done.astype(jnp.int32)) - 1, 0, fresh_pool - 1
                )
                draw_obs = jax.tree.map(lambda x: x[rank], p_obs)
                draw_states = jax.tree.map(lambda x: x[rank], p_states)

                def where_done(x, y):
                    d = jnp.reshape(done, done.shape + (1,) * (x.ndim - 1))
                    return jnp.where(d, x, y)

                states = jax.tree.map(where_done, draw_states, new_states)
                obs = jax.tree.map(where_done, draw_obs, obs)
            # fold the observation into the metrics so the observation
            # pipeline is part of the measured work (a policy would consume
            # it; without this XLA dead-code-eliminates it entirely)
            obs_sum = sum(jnp.sum(x) for x in jax.tree.leaves(obs))
            return states, (
                jnp.mean(r),
                jnp.mean((term | trunc).astype(jnp.float32)),
                obs_sum,
            )

        states, (rews, dones, obs_sums) = jax.lax.scan(
            body, states, jax.random.split(key, horizon)
        )
        return states, {
            "mean_reward": jnp.mean(rews),
            "done_rate": jnp.mean(dones),
            "obs_checksum": jnp.sum(obs_sums),
        }

    return jax.jit(
        rollout,
        in_shardings=(batch_spec, NamedSharding(mesh, P())),
        out_shardings=(batch_spec, NamedSharding(mesh, P())),
        donate_argnums=(0,),
    )


def pooled_rollout_fn(
    env,
    mesh: Mesh,
    horizon: int,
    pool_size: int = 64,
    axis_name: str = "env",
):
    """Rollout with a reset pool: done envs draw a pre-computed reset state
    instead of computing one in-step.

    ``step_autoreset`` evaluates a full ``_reset`` every step for every env
    (XLA computes both select branches), which dominates on scenarios with
    expensive resets — IntersectionEnv replays a 45-frame RegulatedRoad
    warm-up at reset (intersection_env.py spawn loop), making in-step resets
    ~30x the step itself.  The pool amortizes this to ONE fresh reset per
    step: a bank of ``pool_size`` (obs, state) resets is kept as rollout
    carry, one rotating entry is regenerated each step, and done envs draw a
    random entry (re-keyed per env so subsequent episodes diverge).

    Trade-off (documented in PARITY.md): two envs finishing on the same step
    can draw the same pool entry, so initial scene layouts repeat across the
    batch within ~pool_size steps; per-env RNG keys still decouple all
    subsequent randomness.  Use sharded_rollout_fn for exact per-env reset
    semantics.
    """
    batch_spec = NamedSharding(mesh, P(axis_name))

    def init_pool(key):
        keys = jax.random.split(key, pool_size)
        return jax.vmap(env._reset)(keys)

    def rollout(states, pool, key):
        B = states.time.shape[0]

        def body(carry, k):
            states, pool = carry
            k_act, k_draw, k_fresh, k_rekey = jax.random.split(k, 4)
            acts = _action_sampler(env, B)(k_act)
            obs, new_states, r, term, trunc, _ = jax.vmap(env._step)(
                states, acts
            )
            done = term | trunc

            # draw pooled resets for done envs, re-keyed per env
            idx = jax.random.randint(k_draw, (B,), 0, pool_size)
            pool_obs, pool_states = pool
            draw_obs = jax.tree.map(lambda x: x[idx], pool_obs)
            draw_states = jax.tree.map(lambda x: x[idx], pool_states)
            draw_states = draw_states.replace(
                key=jax.random.split(k_rekey, B)
            )

            def where_done(x, y):
                d = jnp.reshape(done, done.shape + (1,) * (x.ndim - 1))
                return jnp.where(d, x, y)

            states = jax.tree.map(where_done, draw_states, new_states)
            obs = jax.tree.map(where_done, draw_obs, obs)

            # regenerate one rotating pool entry (amortized fresh resets)
            slot = jax.random.randint(k_fresh, (), 0, pool_size)
            f_obs, f_state = env._reset(jax.random.fold_in(k_fresh, 1))
            pool_obs = jax.tree.map(
                lambda p, f: p.at[slot].set(f), pool_obs, f_obs
            )
            pool_states = jax.tree.map(
                lambda p, f: p.at[slot].set(f), pool_states, f_state
            )

            obs_sum = sum(jnp.sum(x) for x in jax.tree.leaves(obs))
            return (states, (pool_obs, pool_states)), (
                jnp.mean(r),
                jnp.mean(done.astype(jnp.float32)),
                obs_sum,
            )

        (states, pool), (rews, dones, obs_sums) = jax.lax.scan(
            body, (states, pool), jax.random.split(key, horizon)
        )
        return states, pool, {
            "mean_reward": jnp.mean(rews),
            "done_rate": jnp.mean(dones),
            "obs_checksum": jnp.sum(obs_sums),
        }

    jit_rollout = jax.jit(
        rollout,
        in_shardings=(
            batch_spec,
            NamedSharding(mesh, P()),
            NamedSharding(mesh, P()),
        ),
        out_shardings=(
            batch_spec,
            NamedSharding(mesh, P()),
            NamedSharding(mesh, P()),
        ),
        donate_argnums=(0, 1),
    )
    return jit_rollout, jax.jit(init_pool)
