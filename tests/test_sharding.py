"""Mesh-sharded rollouts: standard autoreset and the pooled-reset variant."""

import numpy as np
import jax
import jax.numpy as jnp

import highwayenv_tpu as ht
from highwayenv_tpu.parallel.sharding import (
    make_mesh,
    pooled_rollout_fn,
    shard_batch,
    sharded_rollout_fn,
)


def test_sharded_rollout_runs_on_mesh():
    env = ht.make("highway-fast-v0", {"vehicles_count": 6})
    mesh = make_mesh(jax.devices())
    B = 2 * len(jax.devices())
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    _, states = jax.jit(jax.vmap(env._reset))(keys)
    states = shard_batch(states, mesh)
    rollout = sharded_rollout_fn(env, mesh, horizon=4)
    states, metrics = rollout(states, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["mean_reward"]))
    assert 0.0 <= float(metrics["done_rate"]) <= 1.0
    assert float(metrics["obs_checksum"]) != 0.0


def test_pooled_rollout_amortizes_resets():
    env = ht.make("intersection-v0")
    mesh = make_mesh(jax.devices())
    B = 2 * len(jax.devices())
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    _, states = jax.jit(jax.vmap(env._reset))(keys)
    states = shard_batch(states, mesh)
    rollout, init_pool = pooled_rollout_fn(env, mesh, horizon=6, pool_size=4)
    pool = init_pool(jax.random.PRNGKey(7))
    states, pool, metrics = rollout(states, pool, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["mean_reward"]))
    assert float(metrics["obs_checksum"]) != 0.0
    # carry is donated: a second call continues cleanly
    states, pool, metrics = rollout(states, pool, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["mean_reward"]))
    # pooled reset states look like fresh episodes: time restarts
    t = np.asarray(states.time)
    assert t.min() >= 0.0


def test_sharded_rollout_continuous_actions():
    env = ht.make("parking-v0")
    mesh = make_mesh(jax.devices())
    B = 2 * len(jax.devices())
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    _, states = jax.jit(jax.vmap(env._reset))(keys)
    states = shard_batch(states, mesh)
    rollout = sharded_rollout_fn(env, mesh, horizon=3)
    states, metrics = rollout(states, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["mean_reward"]))
    assert float(metrics["obs_checksum"]) != 0.0


def test_fresh_pool_rollout_assigns_unique_fresh_scenes():
    """fresh_pool mode: done envs draw prefix-assigned fresh resets — every
    reset in a step gets a DISTINCT fresh scene (unlike pooled_rollout_fn's
    rotating bank), so the episode-start distribution matches the exact
    in-step autoreset."""
    env = ht.make(
        "highway-fast-v0",
        {"vehicles_count": 5, "lanes_count": 2, "duration": 2},
    )
    mesh = make_mesh(jax.devices())
    B = 4 * len(jax.devices())
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    _, states = jax.jit(jax.vmap(env._reset))(keys)
    states = shard_batch(states, mesh)
    rollout = sharded_rollout_fn(env, mesh, horizon=10, fresh_pool=B)
    states, metrics = rollout(states, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["mean_reward"]))
    assert float(metrics["done_rate"]) > 0.0, "duration=2 must force resets"
    # a second call continues from the donated carry
    states, metrics = rollout(states, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["mean_reward"]))

    # prefix assignment: in a single batched autoreset step, done envs'
    # replacement scenes are pairwise distinct
    env2 = ht.make("highway-fast-v0", {"vehicles_count": 8})
    keys2 = jax.random.split(jax.random.PRNGKey(3), 6)
    _, pool = jax.jit(jax.vmap(env2._reset))(keys2)
    pos = np.asarray(pool.vehicles.pos).reshape(6, -1)
    d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    assert (d + np.eye(6) * 1e9 > 1e-3).all(), "fresh resets must differ"


def test_pallas_megakernel_under_shard_map():
    """Pin the driver entry's leg 3: the interpret-mode Pallas megakernel
    under jax.shard_map, compared against the XLA fast path.  This is the
    exact combination whose JAX-0.9 `check_vma` breakage shipped unnoticed
    in round 3 (MULTICHIP_r03 rc=1) because no CPU test exercised it."""
    import __graft_entry__ as graft

    devices = jax.devices()
    mesh = make_mesh(devices)
    graft.pallas_shard_map_leg(mesh, len(devices))
