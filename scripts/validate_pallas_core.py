"""Cross-validate straight_pallas.frame_core (XLA interpretation) against
straight_fast.straight_frame over real highway rollouts."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

import highwayenv_tpu as ht
from highwayenv_tpu.ops import straight_fast, straight_pallas


def core_step(env, veh, action):
    """frame_core loop, semantics of the fast-path _simulate."""
    fs = env._straight
    raw = getattr(env.action_type, "stores_raw_controls", False)
    frames = env.config["simulation_frequency"] // env.config["policy_frequency"]
    slot_actions = env._action_to_slots(action)
    ego_mask = (veh.kind == straight_pallas.KIND_EGO)
    veh = env.action_type.apply(env.geo, veh, ego_mask, slot_actions)
    f = straight_pallas.pack(veh)
    for _ in range(frames):
        f = straight_pallas.frame_core(fs, env.idm_params, env.dt, raw, f)
    return straight_pallas.unpack(f, veh)


def fast_step(env, veh, action):
    fs = env._straight
    frames = env.config["simulation_frequency"] // env.config["policy_frequency"]
    slot_actions = env._action_to_slots(action)
    for i in range(frames):
        veh = straight_fast.straight_frame(
            env, fs, veh, slot_actions, jnp.asarray(i == 0)
        )
    return veh


def main():
    env = ht.make("highway-v0")
    key = jax.random.PRNGKey(0)
    _, state = env.reset(key)
    veh_a = state.vehicles
    veh_b = state.vehicles
    cs = jax.jit(lambda v, a: core_step(env, v, a))
    fsn = jax.jit(lambda v, a: fast_step(env, v, a))
    for t in range(15):
        key, k = jax.random.split(key)
        a = jax.random.randint(k, (), 0, 5)
        veh_a = cs(veh_a, a)
        veh_b = fsn(veh_b, a)
        np.testing.assert_allclose(
            np.asarray(veh_a.pos), np.asarray(veh_b.pos), atol=1e-4,
            err_msg=f"pos step {t}",
        )
        np.testing.assert_allclose(
            np.asarray(veh_a.speed), np.asarray(veh_b.speed), atol=1e-4,
            err_msg=f"speed step {t}",
        )
        np.testing.assert_array_equal(
            np.asarray(veh_a.lane), np.asarray(veh_b.lane), err_msg=f"lane {t}"
        )
        np.testing.assert_array_equal(
            np.asarray(veh_a.target_lane), np.asarray(veh_b.target_lane),
            err_msg=f"tl {t}",
        )
        np.testing.assert_array_equal(
            np.asarray(veh_a.crashed), np.asarray(veh_b.crashed),
            err_msg=f"crashed {t}",
        )
        np.testing.assert_allclose(
            np.asarray(veh_a.timer), np.asarray(veh_b.timer), atol=1e-5,
            err_msg=f"timer {t}",
        )
    print("frame_core == straight_frame over 15 policy steps: OK")


def main_pallas(interpret=True, block=8, batch=16, steps=6):
    env = ht.make("highway-v0")
    frames = env.config["simulation_frequency"] // env.config["policy_frequency"]
    keys = jax.random.split(jax.random.PRNGKey(1), batch)
    _, states = jax.vmap(env.reset)(keys)
    veh_a = states.vehicles  # pallas
    veh_b = states.vehicles  # reference (vmapped fast path)

    def pal_step(veh, actions):
        ego_mask = veh.kind == straight_pallas.KIND_EGO
        slot_actions = jax.vmap(env._action_to_slots)(actions)
        veh = jax.vmap(
            lambda v, m, sa: env.action_type.apply(env.geo, v, m, sa)
        )(veh, ego_mask, slot_actions)
        return straight_pallas.pallas_simulate(
            env, veh, frames, block=block, interpret=interpret
        )

    ref_step = jax.jit(jax.vmap(lambda v, a: fast_step(env, v, a)))
    pal_step = jax.jit(pal_step)

    key = jax.random.PRNGKey(2)
    for t in range(steps):
        key, k = jax.random.split(key)
        acts = jax.random.randint(k, (batch,), 0, 5)
        veh_a = pal_step(veh_a, acts)
        veh_b = ref_step(veh_b, acts)
        np.testing.assert_allclose(
            np.asarray(veh_a.pos), np.asarray(veh_b.pos), atol=2e-4,
            err_msg=f"pallas pos step {t}",
        )
        np.testing.assert_allclose(
            np.asarray(veh_a.speed), np.asarray(veh_b.speed), atol=2e-4,
            err_msg=f"pallas speed step {t}",
        )
        np.testing.assert_array_equal(
            np.asarray(veh_a.lane), np.asarray(veh_b.lane),
            err_msg=f"pallas lane {t}",
        )
        np.testing.assert_array_equal(
            np.asarray(veh_a.crashed), np.asarray(veh_b.crashed),
            err_msg=f"pallas crashed {t}",
        )
    print(f"pallas_simulate(interpret={interpret}) == vmapped fast path: OK")


if __name__ == "__main__":
    import sys

    if "--pallas" in sys.argv:
        main_pallas()
    else:
        main()
