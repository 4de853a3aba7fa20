#!/usr/bin/env python
"""Torch DQN on the Gymnasium VectorEnv adapter.

The reference's headline training workflow is a torch DQN on
``highway-v0`` kinematics observations (reference README quick-start /
SB3 examples).  This example reproduces that workflow against the
TPU-batched engine through the STANDARD vector API: the env batch steps
as one jitted device program (``vector_env.py``), the agent stays plain
torch on the host — i.e. an existing torch training stack migrates by
swapping the env constructor only.

Run (CPU smoke): python scripts/train_dqn_torch.py --updates 5 --batch 8
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="highway-fast-v0")
    p.add_argument("--batch", type=int, default=64, help="parallel envs")
    p.add_argument("--updates", type=int, default=200)
    p.add_argument("--replay", type=int, default=20_000)
    p.add_argument("--train-batch", type=int, default=256)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--gamma", type=float, default=0.9)
    p.add_argument("--eps", type=float, default=0.2, help="exploration")
    p.add_argument("--target-every", type=int, default=50)
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import torch
    import torch.nn as nn

    import highwayenv_tpu as ht

    envs = ht.make_vec(
        args.env, num_envs=args.batch, config={"vehicles_count": 10}
    )
    obs_dim = int(np.prod(envs.single_observation_space.shape))
    n_act = int(envs.single_action_space.n)

    def net():
        return nn.Sequential(
            nn.Flatten(), nn.Linear(obs_dim, 256), nn.ReLU(),
            nn.Linear(256, 256), nn.ReLU(), nn.Linear(256, n_act),
        )

    q, q_tgt = net(), net()
    q_tgt.load_state_dict(q.state_dict())
    opt = torch.optim.Adam(q.parameters(), lr=args.lr)
    rng = np.random.default_rng(0)

    # flat ring-buffer replay over the vector batch
    cap = args.replay
    buf_o = np.zeros((cap, *envs.single_observation_space.shape), np.float32)
    buf_o2, buf_a, buf_r, buf_d = (
        np.zeros_like(buf_o),
        np.zeros(cap, np.int64),
        np.zeros(cap, np.float32),
        np.zeros(cap, np.float32),
    )
    ptr, size = 0, 0

    obs, _ = envs.reset(seed=0)
    t0 = time.time()
    losses, rewards = [], []
    for i in range(args.updates):
        # epsilon-greedy on the whole batch
        with torch.no_grad():
            qv = q(torch.as_tensor(obs)).numpy()
        acts = qv.argmax(-1)
        explore = rng.random(args.batch) < args.eps
        acts[explore] = rng.integers(0, n_act, explore.sum())

        obs2, r, term, trunc, _ = envs.step(acts)
        rewards.append(float(r.mean()))
        # SAME_STEP autoreset: obs2 for done envs is already the next
        # episode's first obs — the stored bootstrap target is masked by
        # `term` anyway (truncations bootstrap, matching DQN practice)
        n = args.batch
        idx = (ptr + np.arange(n)) % cap
        buf_o[idx], buf_o2[idx] = obs, obs2
        buf_a[idx], buf_r[idx] = acts, r
        buf_d[idx] = term.astype(np.float32)
        ptr, size = (ptr + n) % cap, min(size + n, cap)
        obs = obs2

        if size >= args.train_batch:
            j = rng.integers(0, size, args.train_batch)
            o = torch.as_tensor(buf_o[j])
            o2 = torch.as_tensor(buf_o2[j])
            a = torch.as_tensor(buf_a[j])
            rr = torch.as_tensor(buf_r[j])
            d = torch.as_tensor(buf_d[j])
            with torch.no_grad():
                tgt = rr + args.gamma * (1 - d) * q_tgt(o2).max(-1).values
            loss = nn.functional.smooth_l1_loss(
                q(o).gather(1, a[:, None]).squeeze(1), tgt
            )
            opt.zero_grad()
            loss.backward()
            opt.step()
            losses.append(float(loss))
        if (i + 1) % args.target_every == 0:
            q_tgt.load_state_dict(q.state_dict())
        if (i + 1) % 50 == 0:
            print(
                f"update {i + 1:4d} mean step reward "
                f"{np.mean(rewards[-50:]):.3f} loss "
                f"{np.mean(losses[-50:] or [float('nan')]):.4f}"
            )

    sps = args.updates * args.batch / (time.time() - t0)
    print(f"throughput: {sps:,.0f} env-steps/s (incl. torch training)")
    envs.close()
    return float(np.mean(rewards[-10:]))


if __name__ == "__main__":
    main()
