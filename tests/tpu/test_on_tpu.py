"""On-hardware verification gate: `HT_TPU=1 python -m pytest tests/tpu -q`.

Runs the COMPILED (non-interpret) Pallas megakernels on the real TPU chip
and cross-validates them against the XLA paths, plus a bench smoke.  The
default CPU suite exercises the same kernels only in interpret mode, which
cannot catch Mosaic lowering / MXU precision bugs (round 1 shipped a bf16
MXU default that silently corrupted every on-chip number until a manual
session found it).  This profile is the per-round re-verification; capture
its output as the round artifact:

    HT_TPU=1 python -m pytest tests/tpu -q | tee TPU_CHECK_r<N>.txt

Skipped entirely unless HT_TPU=1 (the suite otherwise pins jax to the
host platform — see conftest.py).
"""

from __future__ import annotations

import os
import time

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("HT_TPU"),
    reason="on-hardware profile: set HT_TPU=1 (runs on the real TPU chip)",
)

if os.environ.get("HT_TPU"):
    import jax
    import jax.numpy as jnp

    import highwayenv_tpu as ht


@pytest.fixture(scope="module")
def tpu_device():
    dev = jax.devices()[0]
    if dev.platform not in ("tpu", "axon"):
        pytest.skip(f"no TPU backend (platform={dev.platform})")
    return dev


def _fetch(tree):
    """Host-materialize every leaf (tunnel-safe: np.asarray blocks)."""
    return jax.tree.map(np.asarray, tree)


def test_straight_megakernel_matches_xla_on_tpu(tpu_device):
    """Compiled sorted + dense straight kernels vs the XLA batch-minor
    fast path on identical states, 2 policy steps: integer decisions and
    crash flags exact; positions within the cephes-trig bound
    (PARITY.md #17: ~6e-5/step real-chip divergence, amplified to ~2e-3
    over 2 steps of feedback)."""
    from highwayenv_tpu.ops import straight_fast
    from highwayenv_tpu.ops.straight_pallas_bm import (
        pallas_simulate_bm,
        pallas_simulate_bm_sorted,
    )

    env = ht.make("highway-v0")
    frames = env.frames_per_step
    B = 128  # one kernel block
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    _, states = jax.jit(jax.vmap(env._reset))(keys)

    def xla_step(veh, actions):
        def one(v, a):
            sa = env._action_to_slots(a)
            for i in range(frames):
                v = straight_fast.straight_frame(
                    env, env._straight, v, sa, jnp.asarray(i == 0)
                )
            return v

        return jax.vmap(one)(veh, actions)

    dense = jax.jit(
        lambda v, a: pallas_simulate_bm(
            env, v, jax.vmap(env._action_to_slots)(a), frames
        )
    )
    srt = jax.jit(
        lambda v, a: pallas_simulate_bm_sorted(
            env, v, jax.vmap(env._action_to_slots)(a), frames
        )
    )
    xla = jax.jit(xla_step)

    veh_d = veh_s = veh_x = states.vehicles
    key = jax.random.PRNGKey(1)
    for t in range(2):
        key, k = jax.random.split(key)
        acts = jax.random.randint(k, (B,), 0, env.action_type.n)
        veh_d, veh_s, veh_x = (
            _fetch(dense(veh_d, acts)),
            _fetch(srt(veh_s, acts)),
            _fetch(xla(veh_x, acts)),
        )
        for name, veh_p in [("dense", veh_d), ("sorted", veh_s)]:
            np.testing.assert_allclose(
                veh_p.pos, veh_x.pos, atol=2e-3,
                err_msg=f"{name} step {t}",
            )
            np.testing.assert_array_equal(
                veh_p.lane, veh_x.lane, err_msg=f"{name} step {t}"
            )
            np.testing.assert_array_equal(
                veh_p.target_lane, veh_x.target_lane,
                err_msg=f"{name} step {t}",
            )
            np.testing.assert_array_equal(
                veh_p.crashed, veh_x.crashed, err_msg=f"{name} step {t}"
            )
        # sorted vs dense: same kernel math, banded collisions must be
        # bitwise-equal to the dense pair SAT on hardware too
        np.testing.assert_array_equal(veh_s.crashed, veh_d.crashed)
        np.testing.assert_allclose(veh_s.pos, veh_d.pos, atol=0, rtol=0)


def test_sorted_matches_dense_compiled(tpu_device):
    """Compiled sorted (banded collisions + banded neighbours, round 5)
    vs dense kernel: ALL mutated fields bitwise on hardware, including a
    pile-up state that fires the per-env dense fallback.  The CPU variant
    (tests/test_batched_step.py) tolerates 1-2 ulp on continuous fields —
    an interpret-mode HOST FMA-contraction artifact this test proves
    absent on the TPU."""
    from highwayenv_tpu.ops.straight_pallas_bm import (
        pallas_simulate_bm,
        pallas_simulate_bm_sorted,
    )

    env = ht.make("highway-v0")
    frames = env.frames_per_step
    B, block = 256, 128
    keys = jax.random.split(jax.random.PRNGKey(3), B)
    _, states = jax.jit(jax.vmap(env._reset))(keys)
    veh = states.vehicles
    acts = jax.random.randint(jax.random.PRNGKey(4), (B,), 0, 5)
    sa = jax.vmap(env._action_to_slots)(acts)

    pos2 = np.asarray(veh.pos).copy()
    pos2[0, :20, 0] = 100.0 + np.linspace(0, 6, 20)  # env-0 pile-up
    veh_pileup = veh.replace(pos=jnp.asarray(pos2))

    dense = jax.jit(
        lambda v, a: pallas_simulate_bm(env, v, a, frames, block=block)
    )
    srt = jax.jit(
        lambda v, a: pallas_simulate_bm_sorted(env, v, a, frames, block=block)
    )
    fields = [
        "pos", "heading", "speed", "crashed", "impact_pending", "impact",
        "lane", "target_lane", "timer", "steering", "accel", "hit",
        "target_speed",
    ]
    for name, v in [("normal", veh), ("pileup", veh_pileup)]:
        d, s = _fetch(dense(v, sa)), _fetch(srt(v, sa))
        for fld in fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(d, fld)),
                np.asarray(getattr(s, fld)),
                err_msg=f"{name}:{fld}",
            )


def test_general_megakernel_matches_xla_on_tpu(tpu_device):
    """Compiled general-path megakernel (roundabout-v0) vs the XLA general
    frame, 2 policy steps."""
    from highwayenv_tpu.ops.general_pallas_bm import pallas_simulate_general

    env = ht.make("roundabout-v0")
    assert env._general is not None
    frames = env.frames_per_step
    B = 128
    keys = jax.random.split(jax.random.PRNGKey(2), B)
    _, states = jax.jit(jax.vmap(env._reset))(keys)
    states_proto = jax.tree.map(lambda x: x[0], states)

    def xla_step(veh, actions):
        def one(v, a):
            sa = env._action_to_slots(a)
            st = states_proto.replace(vehicles=v)
            return env._simulate(st, sa).vehicles

        return jax.vmap(one)(veh, actions)

    pal = jax.jit(
        lambda v, a: pallas_simulate_general(
            env, v, jax.vmap(env._action_to_slots)(a), frames
        )
    )
    xla = jax.jit(xla_step)

    veh_p = veh_x = states.vehicles
    key = jax.random.PRNGKey(3)
    for t in range(2):
        key, k = jax.random.split(key)
        acts = jax.random.randint(k, (B,), 0, env.action_type.n)
        veh_p, veh_x = _fetch(pal(veh_p, acts)), _fetch(xla(veh_x, acts))
        np.testing.assert_allclose(
            veh_p.pos, veh_x.pos, atol=5e-3, err_msg=f"step {t}"
        )
        np.testing.assert_array_equal(
            veh_p.lane, veh_x.lane, err_msg=f"step {t}"
        )
        np.testing.assert_array_equal(
            veh_p.crashed, veh_x.crashed, err_msg=f"step {t}"
        )


def test_bench_smoke_on_tpu(tpu_device):
    """Short end-to-end rollout through the full sharded pipeline: metrics
    finite, throughput above an order-of-magnitude floor (catches 'kernel
    silently fell back to a 100x-slower path' regressions)."""
    from highwayenv_tpu.parallel.sharding import (
        make_mesh,
        shard_batch,
        sharded_rollout_fn,
    )

    env = ht.make("highway-v0")
    B, T = 1024, 8
    mesh = make_mesh()
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    _, states = jax.jit(jax.vmap(env._reset))(keys)
    states = shard_batch(states, mesh)
    rollout = sharded_rollout_fn(env, mesh, horizon=T)

    states, metrics = rollout(states, jax.random.PRNGKey(1))
    float(metrics["mean_reward"])  # compile + materialize

    t0 = time.perf_counter()
    states, metrics = rollout(states, jax.random.PRNGKey(2))
    mr = float(metrics["mean_reward"])
    dt = time.perf_counter() - t0

    assert np.isfinite(mr)
    sps = B * T / dt
    print(f"\nbench smoke: {sps:,.0f} env-steps/s (B={B}, T={T})")
    assert sps > 10_000, f"throughput collapsed: {sps:,.0f} env-steps/s"
