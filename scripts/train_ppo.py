#!/usr/bin/env python
"""Fully-jitted PPO on a sharded env batch — the production training shape.

The reference trains through stable-baselines3 (docs/: SB3 PPO/DQN scripts)
with envs stepping on the host; here the ENTIRE update — T-step rollout,
GAE, K epochs of minibatched clipped-surrogate updates — is one jitted
function over a `jax.sharding.Mesh`-sharded batch of envs.  Zero host
round-trips inside the training loop; gradients are reduced across devices
by XLA collectives inserted for the sharded mean.

Run (CPU smoke; --platform cpu is required, env vars are overridden by the
container's sitecustomize):
  python scripts/train_ppo.py --updates 2 --batch 64 --horizon 8 \
      --platform cpu
"""

import argparse
import os as _os
import sys as _sys
import time

import numpy as np

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)


def build_update(env, args, n_actions, obs_dim, B):
    """Returns (init_params, opt, update); update is jittable end-to-end."""
    import jax
    import jax.numpy as jnp
    import optax

    def net(params, obs):
        """Shared-trunk actor-critic MLP: obs -> (logits, value)."""
        x = obs.reshape(obs.shape[:-2] + (-1,))
        h = jnp.tanh(x @ params["w1"] + params["b1"])
        h = jnp.tanh(h @ params["w2"] + params["b2"])
        return h @ params["wp"] + params["bp"], (h @ params["wv"] + params["bv"])[
            ..., 0
        ]

    def init_params(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        d = args.hidden
        s = lambda k, shp: jax.random.normal(k, shp) * (1.0 / np.sqrt(shp[0]))
        return {
            "w1": s(k1, (obs_dim, d)), "b1": jnp.zeros(d),
            "w2": s(k2, (d, d)), "b2": jnp.zeros(d),
            "wp": s(k3, (d, n_actions)) * 0.01, "bp": jnp.zeros(n_actions),
            "wv": s(k4, (d, 1)), "bv": jnp.zeros(1),
        }

    opt = optax.chain(
        optax.clip_by_global_norm(0.5), optax.adam(args.lr)
    )

    def rollout(params, states, key):
        """T steps with autoreset; returns trajectory batch (T, B, ...)."""

        def body(states, k):
            obs = jax.vmap(env._observe)(states)
            logits, value = net(params, obs)
            a = jax.random.categorical(k, logits)
            logp = jnp.take_along_axis(
                jax.nn.log_softmax(logits), a[:, None], axis=-1
            )[:, 0]
            # batched step: batch-minor / pallas fast path on straight
            # networks, vmap fallback elsewhere (envs/base.py:783)
            _, states2, r, term, trunc, _ = env.step_autoreset_batched(
                states, a
            )
            return states2, (obs, a, logp, value, r, term, trunc)

        states, traj = jax.lax.scan(
            body, states, jax.random.split(key, args.horizon)
        )
        final_obs = jax.vmap(env._observe)(states)
        _, final_value = net(params, final_obs)
        return states, traj, final_value

    def gae(values, rewards, terms, truncs, final_value):
        """Generalised advantage estimation, reverse scan over T.

        Timeout handling (SB3's handle_timeout_termination analogue): a
        TRUNCATED episode still has value past the cut, but the next
        state in the buffer belongs to a new episode (autoreset), so the
        GAE recursion is cut at every done and the bootstrap for
        truncated steps uses V(s_t) — the env does not expose the
        pre-reset final observation, and V(s_{t+1}) ~= V(s_t) is far
        less biased than the 0 a termination would use."""

        def body(carry, xs):
            v, r, term, trunc = xs
            done = jnp.logical_or(term, trunc).astype(jnp.float32)
            boot = jnp.where(trunc & ~term, v, carry["next_v"] * (1.0 - done))
            delta = r + args.gamma * boot - v
            adv = delta + args.gamma * args.lam * (1.0 - done) * carry["adv"]
            return {"next_v": v, "adv": adv}, adv

        init = {"adv": jnp.zeros_like(final_value), "next_v": final_value}
        _, advs = jax.lax.scan(
            body, init, (values, rewards, terms, truncs), reverse=True
        )
        return advs

    def loss_fn(params, batch):
        obs, a, logp_old, adv, ret = batch
        logits, value = net(params, obs)
        logp = jnp.take_along_axis(
            jax.nn.log_softmax(logits), a[..., None], axis=-1
        )[..., 0]
        ratio = jnp.exp(logp - logp_old)
        adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
        pg = -jnp.minimum(
            ratio * adv_n,
            jnp.clip(ratio, 1 - args.clip, 1 + args.clip) * adv_n,
        ).mean()
        vf = 0.5 * jnp.mean((value - ret) ** 2)
        ent = -jnp.mean(
            jnp.sum(jax.nn.softmax(logits) * jax.nn.log_softmax(logits), -1)
        )
        return pg + args.vf_coef * vf - args.ent_coef * ent, (pg, vf, ent)

    def update(params, opt_state, states, key):
        k_roll, k_perm = jax.random.split(key)
        states, traj, final_value = rollout(params, states, k_roll)
        obs, a, logp, value, r, term, trunc = traj
        adv = gae(value, r, term, trunc, final_value)
        ret = adv + value

        # flatten (T, B) -> (T*B,) and run K epochs of minibatches
        N = args.horizon * B
        flat = jax.tree.map(
            lambda x: x.reshape((N,) + x.shape[2:]), (obs, a, logp, adv, ret)
        )
        n_mb = args.minibatches
        mb = N // n_mb

        def epoch(carry, k):
            params, opt_state = carry
            perm = jax.random.permutation(k, N)

            def minibatch(carry, idx):
                params, opt_state = carry
                batch = jax.tree.map(lambda x: x[idx], flat)
                (l, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, batch
                )
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), l

            (params, opt_state), losses = jax.lax.scan(
                minibatch,
                (params, opt_state),
                perm[: n_mb * mb].reshape(n_mb, mb),
            )
            return (params, opt_state), losses.mean()

        (params, opt_state), losses = jax.lax.scan(
            epoch, (params, opt_state), jax.random.split(k_perm, args.epochs)
        )
        return params, opt_state, states, losses.mean(), r.mean()

    return init_params, opt, update


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="highway-fast-v0")
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--horizon", type=int, default=32)
    p.add_argument("--updates", type=int, default=20)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--minibatches", type=int, default=8)
    p.add_argument("--hidden", type=int, default=128)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--gamma", type=float, default=0.99)
    p.add_argument("--lam", type=float, default=0.95)
    p.add_argument("--clip", type=float, default=0.2)
    p.add_argument("--vf-coef", type=float, default=0.5)
    p.add_argument("--ent-coef", type=float, default=0.01)
    p.add_argument("--platform", default=None)
    p.add_argument(
        "--checkpoint-dir",
        default=None,
        help="orbax checkpoint dir: save every --checkpoint-every updates "
        "and auto-resume from the latest step on restart (params, opt "
        "state, PRNG key, and the full sharded EnvState pytree)",
    )
    p.add_argument("--checkpoint-every", type=int, default=10)
    args = p.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    import highwayenv_tpu as ht
    from highwayenv_tpu.parallel.sharding import (
        make_mesh,
        replicate,
        shard_batch,
    )

    env = ht.make(args.env)
    n_actions = env.action_type.n
    obs_dim = int(np.prod(env.observation_type.shape))

    mesh = make_mesh()
    B = (args.batch // len(jax.devices())) * len(jax.devices()) or len(
        jax.devices()
    )
    key = jax.random.PRNGKey(0)
    key, k_init, k_reset = jax.random.split(key, 3)

    init_params, opt, update = build_update(env, args, n_actions, obs_dim, B)
    params = init_params(k_init)
    opt_state = opt.init(params)

    _, states = env.reset_batch(jax.random.split(k_reset, B))
    states = shard_batch(states, mesh)

    # checkpoint/resume: EnvState is a plain pytree of arrays, so the whole
    # training state (params + opt + envs + PRNG) round-trips through orbax
    mngr = None
    start = 0
    if args.checkpoint_dir:
        import orbax.checkpoint as ocp

        mngr = ocp.CheckpointManager(
            _os.path.abspath(args.checkpoint_dir),
            options=ocp.CheckpointManagerOptions(max_to_keep=2),
        )
        latest = mngr.latest_step()
        if latest is not None:
            target = {
                "params": params, "opt_state": opt_state,
                "states": states, "key": key,
            }
            restored = mngr.restore(
                latest, args=ocp.args.StandardRestore(target)
            )
            # restored arrays come back committed to single devices;
            # re-replicate the dense training state over the mesh (env
            # states keep their batch sharding from the restore target)
            params = replicate(restored["params"], mesh)
            opt_state = replicate(restored["opt_state"], mesh)
            states, key = restored["states"], replicate(restored["key"], mesh)
            start = latest + 1
            print(f"resumed from checkpoint step {latest}")

    update = jax.jit(update, donate_argnums=(0, 1, 2))
    t0 = time.time()
    mean_r = float("nan")
    for i in range(start, args.updates):
        key, k = jax.random.split(key)
        params, opt_state, states, loss, mean_r = update(
            params, opt_state, states, k
        )
        if i % max(args.updates // 10, 1) == 0:
            print(
                f"update {i:4d} loss {float(loss):+.4f} "
                f"mean step reward {float(mean_r):.3f}"
            )
        if mngr and (i + 1) % args.checkpoint_every == 0:
            mngr.save(
                i,
                args=ocp.args.StandardSave(
                    {"params": params, "opt_state": opt_state,
                     "states": states, "key": key}
                ),
            )
    if mngr:
        mngr.wait_until_finished()
    jax.block_until_ready(params["w1"])
    sps = (args.updates - start) * args.horizon * B / (time.time() - t0)
    print(f"throughput: {sps:,.0f} env-steps/s (incl. compile)")
    return float(mean_r)


if __name__ == "__main__":
    main()
