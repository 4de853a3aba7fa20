#!/usr/bin/env python
"""Learner-in-the-loop throughput (VERDICT r4 #4).

Random-policy rollout numbers say nothing about what a user actually buys
— env-steps/s WITH a learner consuming the observations and updating a
policy between rollouts.  This script measures, on the bench platform:

  1. PPO (scripts/train_ppo.py's jitted update: T-step rollout + GAE +
     K epochs of minibatched updates, MLP policy on Kinematics obs):
     env-steps/s of the FULL update loop, and the rollout-only number on
     the same shapes, so the learner+boundary share is explicit.
  2. The same at a second batch size.

Usage:
    python scripts/bench_training.py [--batch 1024] [--updates 6] ...

Appends nothing; prints one JSON line per configuration.
"""

import argparse
import json
import os as _os
import sys as _sys
import time

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

from train_ppo import build_update  # noqa: E402  (scripts/ on path)


def bench_config(env_id, B, horizon, updates, platform=None):
    import jax
    import jax.numpy as jnp

    if platform:
        jax.config.update("jax_platforms", platform)
    import numpy as np

    import highwayenv_tpu as ht

    env = ht.make(env_id)
    n_actions = env.action_type.n
    obs_shape = env.observation_type.shape
    obs_dim = int(np.prod(obs_shape))

    args = argparse.Namespace(
        horizon=horizon, hidden=128, lr=3e-4, gamma=0.99, lam=0.95,
        clip=0.2, vf_coef=0.5, ent_coef=0.01, epochs=4, minibatches=8,
    )
    init_params, opt, update = build_update(env, args, n_actions, obs_dim, B)

    keys = jax.random.split(jax.random.PRNGKey(0), B)
    _, states = jax.jit(jax.vmap(env._reset))(keys)
    params = init_params(jax.random.PRNGKey(1))
    opt_state = opt.init(params)
    upd = jax.jit(update, donate_argnums=(0, 1, 2))

    # warmup/compile
    t0 = time.perf_counter()
    params, opt_state, states, loss, r = upd(
        params, opt_state, states, jax.random.PRNGKey(2)
    )
    float(loss)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for u in range(updates):
        params, opt_state, states, loss, r = upd(
            params, opt_state, states, jax.random.PRNGKey(3 + u)
        )
    float(loss), float(r)
    dt_full = time.perf_counter() - t0
    sps_full = B * horizon * updates / dt_full

    # rollout-only on the same shapes (policy inference included, no
    # learner update) — isolates the learner+minibatch share
    def net_rollout(params, states, key):
        def body(states, k):
            obs = jax.vmap(env._observe)(states)
            # same MLP forward as the learner's policy
            x = obs.reshape(obs.shape[:-2] + (-1,))
            h = jnp.tanh(x @ params["w1"] + params["b1"])
            h = jnp.tanh(h @ params["w2"] + params["b2"])
            logits = h @ params["wp"] + params["bp"]
            a = jax.random.categorical(k, logits)
            _, states2, r, term, trunc, _ = env.step_autoreset_batched(
                states, a
            )
            return states2, jnp.mean(r)

        states, rs = jax.lax.scan(
            body, states, jax.random.split(key, horizon)
        )
        return states, jnp.mean(rs)

    ro = jax.jit(net_rollout, donate_argnums=(1,))
    states2, m = ro(params, states, jax.random.PRNGKey(100))
    float(m)
    t0 = time.perf_counter()
    for u in range(updates):
        states2, m = ro(params, states2, jax.random.PRNGKey(101 + u))
    float(m)
    dt_roll = time.perf_counter() - t0
    sps_roll = B * horizon * updates / dt_roll

    print(json.dumps({
        "config": f"PPO {env_id} B={B} T={horizon} (epochs=4, mb=8, MLP-128)",
        "train_env_steps_per_sec": round(sps_full, 1),
        "rollout_policy_env_steps_per_sec": round(sps_roll, 1),
        "learner_share_of_step": round(1.0 - dt_roll / dt_full, 3),
        "compile_s": round(compile_s, 1),
    }), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="highway-v0")
    p.add_argument("--batches", default="1024,4096")
    p.add_argument("--horizon", type=int, default=16)
    p.add_argument("--updates", type=int, default=6)
    p.add_argument("--platform", default=None)
    a = p.parse_args()
    for B in [int(x) for x in a.batches.split(",")]:
        bench_config(a.env, B, a.horizon, a.updates, a.platform)


if __name__ == "__main__":
    main()
