"""DDPG + Hindsight Experience Replay on parking-v0, end-to-end on device.

Counterpart of the reference's SB3 HER example (scripts/sb3_highway* family,
parking_her notebook): parking-v0 is a GoalEnv whose
``compute_reward(achieved, desired)`` (parking_env.py:231-269 in the
reference, envs/parking.py:219-231 here) supports relabeling.

Episodes are collected as fixed-length device tensors from B parallel envs;
HER relabels each transition against a future achieved goal of the same
episode ("future" strategy, k=4-equivalent via uniform future sampling).

Usage: python scripts/train_her_parking.py [iters] [batch_envs]
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

# the container sitecustomize force-sets JAX_PLATFORMS=axon; honor an
# explicit platform request (e.g. HWT_PLATFORM=cpu for local smoke)
if _os.environ.get("HWT_PLATFORM"):
    jax.config.update("jax_platforms", _os.environ["HWT_PLATFORM"])

import highwayenv_tpu as ht

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 150
B = int(sys.argv[2]) if len(sys.argv) > 2 else 32
T = 20  # rollout segment length
BATCH = 128
GAMMA = 0.95
TAU = 0.005
LR = 1e-3
NOISE = 0.2

env = ht.make("parking-v0")
A = env.action_type.size
GOAL = 6  # features of KinematicsGoal


def flat_obs(obs):
    return jnp.concatenate(
        [obs["observation"], obs["desired_goal"]], axis=-1
    )


class Actor(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(256)(x))
        x = nn.relu(nn.Dense(256)(x))
        return nn.tanh(nn.Dense(A)(x))


class Critic(nn.Module):
    @nn.compact
    def __call__(self, x, a):
        h = jnp.concatenate([x, a], axis=-1)
        h = nn.relu(nn.Dense(256)(h))
        h = nn.relu(nn.Dense(256)(h))
        return nn.Dense(1)(h)[..., 0]


def main():
    key = jax.random.PRNGKey(0)
    actor, critic = Actor(), Critic()
    key, k1, k2, k3 = jax.random.split(key, 4)
    dummy = jnp.zeros((1, GOAL * 2))
    pi = actor.init(k1, dummy)
    q = critic.init(k2, dummy, jnp.zeros((1, A)))
    pi_t, q_t = pi, q
    opt_pi, opt_q = optax.adam(LR), optax.adam(LR)
    st_pi, st_q = opt_pi.init(pi), opt_q.init(q)

    keys = jax.random.split(k3, B)
    obs, states = jax.jit(jax.vmap(env._reset))(keys)

    @jax.jit
    def collect(pi, states, obs, key):
        """Roll T steps; returns per-step tensors (T, B, ...)."""

        def body(carry, k):
            states, obs = carry
            x = flat_obs(obs)
            a = actor.apply(pi, x)
            a = jnp.clip(
                a + NOISE * jax.random.normal(k, a.shape), -1.0, 1.0
            )
            nobs, nstates, r, term, trunc, _ = jax.vmap(env.step_autoreset)(
                states, a
            )
            out = (
                obs["observation"], obs["achieved_goal"], obs["desired_goal"],
                a, r, (term | trunc).astype(jnp.float32),
                nobs["observation"], nobs["achieved_goal"],
            )
            return (nstates, nobs), out

        (states, obs), traj = jax.lax.scan(
            body, (states, obs), jax.random.split(key, T)
        )
        return states, obs, traj

    @jax.jit
    def train_step(pi, q, pi_t, q_t, st_pi, st_q, traj, key):
        o, ag, dg, a, r, done, no, nag = traj  # (T, B, ...)
        TB = T * B
        flat = lambda x: x.reshape((TB,) + x.shape[2:])
        o, ag, dg, a, r, done, no, nag = map(
            flat, (o, ag, dg, a, r, done, no, nag)
        )
        k_idx, k_fut, k_rel = jax.random.split(key, 3)
        idx = jax.random.randint(k_idx, (BATCH,), 0, TB)

        # HER 'future': relabel half the batch with a future achieved goal
        # from the same env's segment
        t_of = idx // B
        b_of = idx % B
        fut_t = jax.random.randint(k_fut, (BATCH,), 0, T)
        fut_t = jnp.maximum(t_of, fut_t)  # >= current step
        fut_idx = fut_t * B + b_of
        relabel = jax.random.uniform(k_rel, (BATCH,)) < 0.5
        goal = jnp.where(relabel[:, None], nag[fut_idx], dg[idx])
        reward = jnp.where(
            relabel,
            env.compute_reward(nag[idx], goal),
            r[idx],
        )
        x = jnp.concatenate([o[idx], goal], axis=-1)
        nx = jnp.concatenate([no[idx], goal], axis=-1)

        # critic
        a_next = actor.apply(pi_t, nx)
        y = reward + GAMMA * (1.0 - done[idx]) * critic.apply(q_t, nx, a_next)

        def q_loss(q):
            return jnp.mean(
                jnp.square(critic.apply(q, x, a[idx]) - jax.lax.stop_gradient(y))
            )

        ql, gq = jax.value_and_grad(q_loss)(q)
        uq, st_q = opt_q.update(gq, st_q)
        q = optax.apply_updates(q, uq)

        # actor
        def pi_loss(pi):
            return -jnp.mean(critic.apply(q, x, actor.apply(pi, x)))

        pl, gp = jax.value_and_grad(pi_loss)(pi)
        up, st_pi = opt_pi.update(gp, st_pi)
        pi = optax.apply_updates(pi, up)

        soft = lambda t, s: jax.tree.map(
            lambda a, b: (1 - TAU) * a + TAU * b, t, s
        )
        return pi, q, soft(pi_t, pi), soft(q_t, q), st_pi, st_q, ql

    t0 = time.time()
    for it in range(ITERS):
        key, kc, kt = jax.random.split(key, 3)
        states, obs, traj = collect(pi, states, obs, kc)
        pi, q, pi_t, q_t, st_pi, st_q, ql = train_step(
            pi, q, pi_t, q_t, st_pi, st_q, traj, kt
        )
        if it % 25 == 0 or it == ITERS - 1:
            sr = float(jnp.mean(traj[4].max(axis=0) > -0.12))
            print(
                f"iter {it:4d}  q_loss {float(ql):.4f}  "
                f"success~ {sr:.2f}  "
                f"{B*T*(it+1)/(time.time()-t0):,.0f} env-steps/s"
            )
    return pi


if __name__ == "__main__":
    main()
