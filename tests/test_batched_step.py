"""step_autoreset_batched (batch-minor sim layout) must match vmapped
step_autoreset exactly, and the pallas megakernel core must match the XLA
fast path (interpret mode; real-TPU compile is exercised by bench scripts)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import highwayenv_tpu as ht


@pytest.mark.parametrize("env_id", ["highway-fast-v0", "merge-v0"])
def test_batched_step_matches_vmapped(env_id):
    env = ht.make(env_id)
    B = 8
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    _, states = jax.vmap(env._reset)(keys)
    acts = jnp.arange(B, dtype=jnp.int32) % env.action_type.n
    a = jax.jit(env.step_autoreset_batched)(states, acts)
    b = jax.jit(jax.vmap(env.step_autoreset))(states, acts)
    for xa, xb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(
            np.asarray(xa), np.asarray(xb), atol=1e-5
        )


@pytest.mark.parametrize("env_id", ["highway-fast-v0"])
def test_step_batched_matches_vmapped_step(env_id):
    """step_batched (no autoreset — the fresh-pool rollout's building
    block) must match vmapped _step exactly on the batch-minor path."""
    env = ht.make(env_id)
    B = 8
    keys = jax.random.split(jax.random.PRNGKey(3), B)
    _, states = jax.vmap(env._reset)(keys)
    acts = jnp.arange(B, dtype=jnp.int32) % env.action_type.n
    a = jax.jit(env.step_batched)(states, acts)
    b = jax.jit(jax.vmap(env._step))(states, acts)
    for xa, xb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb), atol=1e-5)


def test_pallas_core_matches_fast_path():
    from highwayenv_tpu.ops import straight_fast
    from highwayenv_tpu.ops.straight_pallas_bm import pallas_simulate_bm

    env = ht.make("highway-fast-v0")
    frames = (
        env.config["simulation_frequency"] // env.config["policy_frequency"]
    )
    B = 8
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    _, states = jax.vmap(env.reset)(keys)
    veh_a = veh_b = states.vehicles

    def pal_step(veh, actions):
        sa = jax.vmap(env._action_to_slots)(actions)
        return pallas_simulate_bm(
            env, veh, sa, frames, block=8, interpret=True
        )

    def ref_step(veh, actions):
        def one(v, a):
            sa = env._action_to_slots(a)
            for i in range(frames):
                v = straight_fast.straight_frame(
                    env, env._straight, v, sa, jnp.asarray(i == 0)
                )
            return v

        return jax.vmap(one)(veh, actions)

    pal = jax.jit(pal_step)
    ref = jax.jit(ref_step)
    key = jax.random.PRNGKey(2)
    for t in range(3):
        key, k = jax.random.split(key)
        acts = jax.random.randint(k, (B,), 0, env.action_type.n)
        veh_a = pal(veh_a, acts)
        veh_b = ref(veh_b, acts)
        np.testing.assert_allclose(
            np.asarray(veh_a.pos), np.asarray(veh_b.pos), atol=2e-4,
            err_msg=f"step {t}",
        )
        np.testing.assert_array_equal(
            np.asarray(veh_a.lane), np.asarray(veh_b.lane)
        )
        np.testing.assert_array_equal(
            np.asarray(veh_a.crashed), np.asarray(veh_b.crashed)
        )


def test_sorted_banded_collisions_match_dense():
    """The s-sorted banded collision kernel is bitwise-equal to the dense
    pair SAT — including on 20-vehicle pile-ups that exercise the far-rank
    violation check and BOTH fallback paths: the per-env gather/patch
    (round 5: one firing env among 16, patch buffer K=block=8 < B) and
    the whole-batch overflow re-run (all 16 envs firing > K)."""
    from highwayenv_tpu.ops.straight_pallas_bm import (
        pallas_simulate_bm,
        pallas_simulate_bm_sorted,
    )

    env = ht.make("highway-v0")
    frames = env.frames_per_step
    B, block = 16, 8  # K = block < B so the patch path is reachable
    keys = jax.random.split(jax.random.PRNGKey(3), B)
    _, states = jax.vmap(env.reset)(keys)
    veh = states.vehicles

    dense = jax.jit(
        lambda v, sa: pallas_simulate_bm(
            env, v, sa, frames, block=block, interpret=True
        )
    )
    srt = jax.jit(
        lambda v, sa: pallas_simulate_bm_sorted(
            env, v, sa, frames, block=block, interpret=True
        )
    )

    # compressed spacing -> immediate collisions; pile-up -> >SORT_WINDOW
    # vehicles within reach -> dense fallback fires
    pos = np.asarray(veh.pos).copy()
    pos[..., 0] *= 0.2
    veh_compressed = veh.replace(pos=jnp.asarray(pos))
    pos2 = np.asarray(veh.pos).copy()
    pos2[0, :20, 0] = 100.0 + np.linspace(0, 6, 20)
    veh_pileup = veh.replace(pos=jnp.asarray(pos2))
    pos3 = np.asarray(veh.pos).copy()
    pos3[:, :20, 0] = 100.0 + np.linspace(0, 6, 20)  # every env fires
    veh_pileup_all = veh.replace(pos=jnp.asarray(pos3))

    acts = jax.random.randint(jax.random.PRNGKey(4), (B,), 0, 5)
    sa = jax.vmap(env._action_to_slots)(acts)
    fields = [
        "pos", "heading", "speed", "crashed", "impact_pending", "impact",
        "lane", "target_lane", "timer", "steering", "accel", "hit",
        "target_speed",
    ]
    # Discrete fields must match exactly everywhere.  Continuous fields:
    # the sorted kernel's banded NEIGHBOUR pass (round 5) produces rows
    # that are exact selects of the same values the dense one-hot fetch
    # contracts, but XLA:CPU FMA-contracts the downstream IDM arithmetic
    # differently for the two program shapes — a 1-2 ulp artifact of the
    # interpret-mode HOST compiler only (the same artifact the SAT fold
    # hit, utils/math.py:350-354).  On the real TPU the compiled kernels
    # measure bitwise equal (tests/tpu/test_on_tpu.py::
    # test_sorted_matches_dense_compiled, HT_TPU gate).
    exact_fields = [
        "crashed", "impact_pending", "lane", "target_lane", "hit",
    ]
    for name, v in [
        ("normal", veh),
        ("compressed", veh_compressed),
        ("pileup", veh_pileup),
        ("pileup_all", veh_pileup_all),
    ]:
        d, s = dense(v, sa), srt(v, sa)
        for fld in fields:
            a = np.asarray(getattr(d, fld))
            b = np.asarray(getattr(s, fld))
            if fld in exact_fields:
                np.testing.assert_array_equal(a, b, err_msg=f"{name}:{fld}")
            else:
                a64 = a.astype(np.float64)
                b64 = b.astype(np.float64)
                # few-ulp at the FIELD's magnitude: the divergence enters
                # as 1-2 ulp of speed-scale operands; differences like
                # accel = free - interaction keep that ABSOLUTE size but
                # can sit near zero, so a per-element relative bound is
                # the wrong shape
                tol = 32.0 * np.finfo(np.float32).eps * max(
                    1.0, float(np.abs(a64).max())
                )
                np.testing.assert_allclose(
                    a64, b64, rtol=0, atol=tol, err_msg=f"{name}:{fld}"
                )
        if name == "compressed":
            assert np.asarray(d.crashed).sum() > 0  # collisions exercised
