"""The general-path pallas megakernel (ops/general_pallas_bm.py) must match
the XLA general frame (envs/base.py::_frame) step-for-step (interpret mode;
real-TPU compile + throughput are exercised by the bench scripts).

Tolerances mirror tests/test_batched_step.py: the kernel's cephes inverse
trig (PARITY.md #17) gives ~1e-4 positional divergence per policy step;
integer decisions (lane, target lane, route cursor) and booleans must be
exactly equal.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import highwayenv_tpu as ht
from highwayenv_tpu.ops.general_pallas_bm import (
    pallas_simulate_general,
    try_general,
)

GENERAL_IDS = [
    "merge-v0",
    "roundabout-v0",
    "u-turn-v0",
    "exit-v0",
    "two-way-v0",
    "racetrack-v0",
]


def test_gate_covers_expected_envs():
    for env_id in GENERAL_IDS:
        env = ht.make(env_id)
        assert env._general is not None, env_id
    # regulated envs are DEFAULT since round 5 (the static-slot schedule
    # beats the XLA tick scheduler; HT_NO_REG_PALLAS=1 opts out)
    assert ht.make("intersection-v0")._general is not None
    assert ht.make("intersection-multi-agent-v0")._general is not None
    # out of scope: straight (own kernel), custom _step, dynamical egos
    # (intersection-v1 continuous), connected-lanes (intersection-v2)
    assert ht.make("highway-v0")._general is None
    assert ht.make("lane-keeping-v0")._general is None
    assert ht.make("intersection-v1")._general is None
    assert ht.make("intersection-v2")._general is None


def _rand_actions(env, key, B):
    if hasattr(env.action_type, "n"):
        return jax.random.randint(key, (B,), 0, env.action_type.n)
    return jax.random.uniform(
        key, (B,) + env.action_type.action_shape, minval=-1.0, maxval=1.0
    )


@pytest.mark.slow  # interpret-mode kernel x 6 envs x 3 steps: ~20 min total
@pytest.mark.parametrize("env_id", GENERAL_IDS)
def test_general_kernel_matches_xla_frame(env_id):
    env = ht.make(env_id)
    assert env._general is not None
    frames = env.frames_per_step
    B = 8
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    _, states = jax.jit(jax.vmap(env._reset))(keys)
    veh_a = veh_b = states.vehicles

    def pal_step(veh, actions):
        sa = jax.vmap(env._action_to_slots)(actions)
        return pallas_simulate_general(
            env, veh, sa, frames, block=B, interpret=True
        )

    def ref_step(veh, actions):
        def one(v, a):
            sa = env._action_to_slots(a)
            st = states_proto.replace(vehicles=v)
            return env._simulate(st, sa).vehicles

        # _simulate needs an EnvState shell; reuse row 0's aux fields
        states_proto = jax.tree.map(lambda x: x[0], states)
        return jax.vmap(one)(veh, actions)

    pal = jax.jit(pal_step)
    ref = jax.jit(ref_step)
    key = jax.random.PRNGKey(2)
    for t in range(3):
        key, k = jax.random.split(key)
        acts = _rand_actions(env, k, B)
        veh_a = pal(veh_b, acts)  # resync: both paths step the SAME state
        veh_b = ref(veh_b, acts)
        # (free-running accumulation is chaotic: the cephes-vs-XLA 1e-7 trig
        # noise can flip a control branch sitting exactly on a discontinuity
        # — e.g. not_zero(speed) near 0 — after a few policy steps.  The
        # per-step resync checks every frame's math on a real trajectory
        # without compounding; PARITY.md #17 covers the numerics.)
        np.testing.assert_allclose(
            np.asarray(veh_a.pos), np.asarray(veh_b.pos), atol=5e-4,
            err_msg=f"{env_id} step {t}",
        )
        np.testing.assert_allclose(
            np.asarray(veh_a.speed), np.asarray(veh_b.speed), atol=5e-4
        )
        np.testing.assert_allclose(
            np.asarray(veh_a.heading), np.asarray(veh_b.heading), atol=5e-4
        )
        np.testing.assert_array_equal(
            np.asarray(veh_a.lane), np.asarray(veh_b.lane),
            err_msg=f"{env_id} step {t} lane",
        )
        np.testing.assert_array_equal(
            np.asarray(veh_a.target_lane), np.asarray(veh_b.target_lane),
            err_msg=f"{env_id} step {t} target_lane",
        )
        np.testing.assert_array_equal(
            np.asarray(veh_a.route_ptr), np.asarray(veh_b.route_ptr)
        )
        np.testing.assert_array_equal(
            np.asarray(veh_a.crashed), np.asarray(veh_b.crashed)
        )
        np.testing.assert_array_equal(
            np.asarray(veh_a.speed_index), np.asarray(veh_b.speed_index)
        )


@pytest.mark.slow  # interpret-mode regulated kernel: heavy compile
def test_general_kernel_regulated_intersection_matches_xla():
    """Round 4: the RegulatedRoad right-of-way pass runs INSIDE the kernel,
    masked to each env's own tick phase.  Rows start at DIFFERENT episode
    ages (distinct phases), which is exactly the case the XLA scheduler
    handles with masked slots and a batched kernel cannot chunk — integer
    decisions AND the yielding state must match the XLA path exactly."""
    import os

    # fresh instance (bypassing the test-session make() memoization) with
    # the opt-in flag set so the gate admits the regulated build
    os.environ["HT_REG_PALLAS"] = "1"
    try:
        cls, kw = ht._REGISTRY["intersection-v0"]
        env = cls(config=dict(kw.get("config", {})) or None)
    finally:
        os.environ.pop("HT_REG_PALLAS", None)
    assert env._general is not None
    frames = env.frames_per_step
    B = 8
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    _, states = jax.jit(jax.vmap(env._reset))(keys)
    veh_b = states.vehicles
    steps = states.steps + jnp.arange(B) * frames  # distinct tick phases

    def pal_step(veh, actions, st):
        sa = jax.vmap(env._action_to_slots)(actions)
        return pallas_simulate_general(
            env, veh, sa, frames, block=B, interpret=True, steps0=st
        )

    states_proto = jax.tree.map(lambda x: x[0], states)

    def ref_step(veh, actions, st):
        def one(v, a, s0):
            sa = env._action_to_slots(a)
            s = states_proto.replace(vehicles=v, steps=s0)
            return env._simulate(s, sa).vehicles

        return jax.vmap(one)(veh, actions, st)

    pal = jax.jit(pal_step)
    ref = jax.jit(ref_step)
    key = jax.random.PRNGKey(2)
    for t in range(3):
        key, k = jax.random.split(key)
        acts = jax.random.randint(k, (B,), 0, env.action_type.n)
        veh_a = pal(veh_b, acts, steps)
        veh_b = ref(veh_b, acts, steps)
        steps = steps + frames
        np.testing.assert_allclose(
            np.asarray(veh_a.pos), np.asarray(veh_b.pos), atol=5e-4,
            err_msg=f"step {t}",
        )
        np.testing.assert_allclose(
            np.asarray(veh_a.speed), np.asarray(veh_b.speed), atol=5e-4
        )
        np.testing.assert_allclose(
            np.asarray(veh_a.target_speed),
            np.asarray(veh_b.target_speed), atol=5e-4,
        )
        np.testing.assert_array_equal(
            np.asarray(veh_a.lane), np.asarray(veh_b.lane)
        )
        np.testing.assert_array_equal(
            np.asarray(veh_a.target_lane), np.asarray(veh_b.target_lane)
        )
        np.testing.assert_array_equal(
            np.asarray(veh_a.route_ptr), np.asarray(veh_b.route_ptr)
        )
        np.testing.assert_array_equal(
            np.asarray(veh_a.is_yielding), np.asarray(veh_b.is_yielding),
            err_msg=f"step {t} is_yielding",
        )
        np.testing.assert_array_equal(
            np.asarray(veh_a.yield_timer), np.asarray(veh_b.yield_timer)
        )
