#!/usr/bin/env python
"""End-to-end on-device RL example: REINFORCE on highway-fast-v0.

Demonstrates the intended TPU training pattern (the reference's counterpart
is the SB3 example scripts): thousands of env instances stepped in lockstep
inside one jitted update, the env-batch axis sharded over the device mesh,
gradients reduced with on-device collectives — zero host round-trips in the
training loop.

Run (CPU smoke): JAX_PLATFORMS=cpu python scripts/train_reinforce.py --steps 3
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="highway-fast-v0")
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--horizon", type=int, default=8)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    import highwayenv_tpu as ht
    from highwayenv_tpu.parallel.sharding import make_mesh, shard_batch

    env = ht.make(args.env)
    n_actions = env.action_type.n
    obs_dim = int(np.prod(env.observation_type.shape))

    def policy(params, obs):
        x = obs.reshape(obs.shape[:-2] + (-1,))
        h = jnp.tanh(x @ params["w1"] + params["b1"])
        return h @ params["w2"] + params["b2"]  # logits

    key = jax.random.PRNGKey(0)
    k1, k2, key = jax.random.split(key, 3)
    params = {
        "w1": jax.random.normal(k1, (obs_dim, 64)) * 0.1,
        "b1": jnp.zeros(64),
        "w2": jax.random.normal(k2, (64, n_actions)) * 0.1,
        "b2": jnp.zeros(n_actions),
    }

    mesh = make_mesh()
    B = (args.batch // len(jax.devices())) * len(jax.devices()) or len(
        jax.devices()
    )
    keys = jax.random.split(key, B)
    obs, states = env.reset_batch(keys)
    states = shard_batch(states, mesh)

    def rollout_loss(params, states, key):
        def body(carry, k):
            states, logp_sum, ret = carry
            obs = jax.vmap(env._observe)(states)
            logits = policy(params, obs)
            a = jax.random.categorical(k, logits)
            logp = jax.nn.log_softmax(logits)[jnp.arange(B), a]
            _, states, r, term, trunc, _ = jax.vmap(env.step_autoreset)(
                states, a
            )
            return (states, logp_sum + logp, ret + r), None

        (states, logp, ret), _ = jax.lax.scan(
            body,
            (states, jnp.zeros(B), jnp.zeros(B)),
            jax.random.split(key, args.horizon),
        )
        advantage = ret - jnp.mean(ret)
        return -jnp.mean(logp * jax.lax.stop_gradient(advantage)), (
            states,
            jnp.mean(ret),
        )

    @jax.jit
    def update(params, states, key):
        (loss, (states, mean_ret)), grads = jax.value_and_grad(
            rollout_loss, has_aux=True
        )(params, states, key)
        params = jax.tree.map(lambda p, g: p - args.lr * g, params, grads)
        return params, states, loss, mean_ret

    t0 = time.time()
    for i in range(args.steps):
        key, k = jax.random.split(key)
        params, states, loss, mean_ret = update(params, states, k)
        if i % max(args.steps // 10, 1) == 0:
            print(
                f"step {i:4d} loss {float(loss):+.4f} "
                f"return/horizon {float(mean_ret):.3f}"
            )
    jax.block_until_ready(params["w1"])
    sps = args.steps * args.horizon * B / (time.time() - t0)
    print(f"throughput: {sps:,.0f} env-steps/s (incl. compile)")


if __name__ == "__main__":
    main()
