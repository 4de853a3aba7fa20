"""Sharding / vmap invariance: the batch axis must be semantically inert.

SURVEY.md section 4(c): (a) stepping a batch sharded over an N-device mesh
must produce bitwise-identical per-env results to the same batch unsharded
on one device; (b) each row of a vmapped batch must equal the same env
stepped alone.  A silent cross-device or cross-row indexing bug fails
these even when means/checksums look sane.

Runs on the 8-virtual-device CPU mesh (conftest.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import highwayenv_tpu as ht
from highwayenv_tpu.parallel.sharding import make_mesh, shard_batch

ENVS = ["highway-v0", "merge-v0"]
STEPS = 3


def _tree_equal(a, b, ctx="", float_atol=0.0):
    """Exact equality; with float_atol, float leaves get a tiny tolerance
    (different XLA executables — sharded vs not — may reassociate fp math)
    while integer/bool leaves (lanes, kinds, crashes: where an indexing bug
    would surface) stay bitwise-exact."""
    for la, lb, path in zip(
        jax.tree.leaves(a),
        jax.tree.leaves(b),
        [str(p) for p, _ in jax.tree_util.tree_leaves_with_path(a)],
    ):
        la, lb = np.asarray(la), np.asarray(lb)
        if float_atol and np.issubdtype(la.dtype, np.floating):
            np.testing.assert_allclose(
                la, lb, atol=float_atol, rtol=0, err_msg=f"{ctx} leaf {path}"
            )
        else:
            np.testing.assert_array_equal(la, lb, err_msg=f"{ctx} leaf {path}")


def _batch(env, B, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), B)
    _, states = jax.jit(jax.vmap(env._reset))(keys)
    return states


def _actions(env, B, seed=1):
    at = env.action_type
    k = jax.random.PRNGKey(seed)
    if hasattr(at, "n"):
        return jax.random.randint(k, (STEPS, B), 0, at.n)
    return jax.random.uniform(k, (STEPS, B, at.size), minval=-1, maxval=1)


@pytest.mark.parametrize("env_id", ENVS)
def test_sharded_equals_unsharded(env_id):
    env = ht.make(env_id)
    B = 16
    states = _batch(env, B)
    acts = _actions(env, B)

    mesh = make_mesh(jax.devices()[:8])
    step = jax.jit(env.step_autoreset_batched)

    sh_states = shard_batch(states, mesh)
    un_states = jax.device_put(states, jax.devices()[0])
    for t in range(STEPS):
        sh_obs, sh_states, sh_r, *_ = step(sh_states, acts[t])
        un_obs, un_states, un_r, *_ = step(un_states, acts[t])
    _tree_equal(sh_obs, un_obs, f"{env_id} obs", float_atol=1e-5)
    _tree_equal(
        sh_states.vehicles, un_states.vehicles, f"{env_id} state",
        float_atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(sh_r), np.asarray(un_r), atol=1e-5, rtol=0
    )


@pytest.mark.parametrize("env_id", ENVS)
def test_vmap_row_identity(env_id):
    """Row i of the batched step == the same env stepped alone (covers the
    straight fast path's batch-minor transposed pipeline on highway)."""
    env = ht.make(env_id)
    B = 4
    states = _batch(env, B)
    acts = _actions(env, B)

    step_b = jax.jit(env.step_autoreset_batched)
    bat_states = states
    for t in range(STEPS):
        bat_obs, bat_states, bat_r, bat_term, bat_trunc, _ = step_b(
            bat_states, acts[t]
        )

    step_1 = jax.jit(env.step_autoreset)
    for i in range(B):
        row = jax.tree.map(lambda x: x[i], states)
        for t in range(STEPS):
            obs, row, r, term, trunc, _ = step_1(row, acts[t][i])
        _tree_equal(
            obs, jax.tree.map(lambda x: x[i], bat_obs), f"{env_id} row {i} obs"
        )
        _tree_equal(
            row.vehicles,
            jax.tree.map(lambda x: x[i], bat_states.vehicles),
            f"{env_id} row {i} state",
        )
        np.testing.assert_array_equal(np.asarray(r), np.asarray(bat_r)[i])


def test_vmap_row_identity_wide():
    """B=1 vs B=64 row equality on the fast path (padding-sensitive)."""
    env = ht.make("highway-fast-v0")
    B = 64
    states = _batch(env, B, seed=7)
    acts = _actions(env, B, seed=8)
    step_b = jax.jit(env.step_autoreset_batched)
    bat_states = states
    for t in range(STEPS):
        bat_obs, bat_states, *_ = step_b(bat_states, acts[t])

    i = B - 1  # last row exercises padding edges
    row = jax.tree.map(lambda x: x[i][None], states)
    row_states = row
    for t in range(STEPS):
        row_obs, row_states, *_ = step_b(row_states, acts[t][i][None])
    _tree_equal(row_obs, jax.tree.map(lambda x: x[i][None], bat_obs), "obs")
    _tree_equal(
        row_states.vehicles,
        jax.tree.map(lambda x: x[i][None], bat_states.vehicles),
        "state",
    )
