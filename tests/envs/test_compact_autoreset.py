"""Compact (gather/scatter) autoreset must be BITWISE the full evaluation.

The full in-step autoreset evaluates ``_reset`` for every env every step;
``step_autoreset_batched(..., reset_slots=P)`` evaluates it only for the
done rows, P at a time (``BaseEnv._compact_autoreset``).  Because each done
row's scene is ``_reset`` of the row's own key split and a row's reset
program is row-local, the results must match bit for bit — including when
the done count overflows P and the while_loop takes multiple passes.

Reference behavior being amortized: in-place episode re-initialization of
the Gymnasium vector autoreset contract (terminal obs replaced by reset
obs), cf. /root/reference/highway_env/envs/common/abstract.py:287-317.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import highwayenv_tpu as ht


def _assert_trees_equal(a, b, what):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y), err_msg=what)


def _run_pair(env_id, cfg, B, P, steps):
    env = ht.make(env_id, cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    _, states = jax.jit(jax.vmap(env._reset))(keys)

    full = jax.jit(env.step_autoreset_batched)
    comp = jax.jit(
        lambda s, a: env.step_autoreset_batched(s, a, reset_slots=P)
    )

    sf = sc = states
    saw_done = False
    for t in range(steps):
        a = jnp.full((B,), t % env.action_type.n, jnp.int32)
        of, sf, rf, tf, uf, _ = full(sf, a)
        oc, sc, rc, tc, uc, _ = comp(sc, a)
        saw_done = saw_done or bool(jnp.any(tf | uf))
        _assert_trees_equal(of, oc, f"obs step {t}")
        _assert_trees_equal((rf, tf, uf), (rc, tc, uc), f"heads step {t}")
        _assert_trees_equal(sf, sc, f"state step {t}")
    assert saw_done, "test never exercised the reset branch"


def test_compact_matches_full_base_path():
    # highway-fast: base-step env (the _finish_head/_observe compact path).
    # duration=1 policy step => every env done every step: done count B=8
    # overflows P=3, forcing >=3 while_loop passes.
    _run_pair(
        "highway-fast-v0",
        {"duration": 1, "vehicles_count": 8, "lanes_count": 3},
        B=8,
        P=3,
        steps=3,
    )


def test_compact_matches_full_step_override_path():
    # intersection overrides _step (post-step spawn/despawn) -> the obs
    # scatter variant of the compact path, on the regulated env whose
    # 45-frame warm-up reset is the thing being amortized.
    _run_pair("intersection-v0", {"duration": 2}, B=6, P=2, steps=4)


def test_compact_no_done_rows_is_identity():
    # long episode, 1 step: no row done -> loop body must be skipped and
    # the state untouched relative to the full path.
    env = ht.make("highway-fast-v0", {"vehicles_count": 6, "lanes_count": 2})
    B = 4
    keys = jax.random.split(jax.random.PRNGKey(3), B)
    _, states = jax.jit(jax.vmap(env._reset))(keys)
    a = jnp.zeros((B,), jnp.int32)
    of, sf, *_ = jax.jit(env.step_autoreset_batched)(states, a)
    oc, sc, *_ = jax.jit(
        lambda s, a: env.step_autoreset_batched(s, a, reset_slots=2)
    )(states, a)
    _assert_trees_equal(of, oc, "obs")
    _assert_trees_equal(sf, sc, "state")


def test_sharded_rollout_compact_reset_matches_default():
    # end-to-end through the rollout driver: compact_reset=P rollout metrics
    # and final states bitwise-match the default rollout.
    from highwayenv_tpu.parallel.sharding import (
        make_mesh,
        shard_batch,
        sharded_rollout_fn,
    )

    env = ht.make("intersection-v0", {"duration": 2})
    mesh = make_mesh(jax.devices()[:1])
    B = 8
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    _, states = jax.jit(jax.vmap(env._reset))(keys)

    r_full = sharded_rollout_fn(env, mesh, horizon=5)
    r_comp = sharded_rollout_fn(env, mesh, horizon=5, compact_reset=3)
    # the rollout donates its input buffer: give each call its own copy
    states2 = jax.tree.map(jnp.copy, states)
    sf, mf = r_full(shard_batch(states, mesh), jax.random.PRNGKey(2))
    sc, mc = r_comp(shard_batch(states2, mesh), jax.random.PRNGKey(2))
    _assert_trees_equal(mf, mc, "metrics")
    _assert_trees_equal(sf, sc, "states")


def test_fresh_pool_and_compact_mutually_exclusive():
    from highwayenv_tpu.parallel.sharding import make_mesh, sharded_rollout_fn

    env = ht.make("highway-fast-v0")
    mesh = make_mesh(jax.devices()[:1])
    with pytest.raises(AssertionError):
        sharded_rollout_fn(env, mesh, horizon=1, fresh_pool=4, compact_reset=4)
