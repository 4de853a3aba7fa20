"""DQN on grayscale pixel observations, end-to-end on TPU.

Counterpart of the reference's SB3 CnnPolicy example (scripts/sb3_highway_dqn*):
the whole loop — vectorized envs, replay buffer, CNN Q-network, target
network — lives on device; only logging touches the host.

Usage: python scripts/train_dqn_pixels.py [iters] [batch_envs]
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

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 200
B = int(sys.argv[2]) if len(sys.argv) > 2 else 32
STACK, W, H = 4, 84, 84
BUFFER = 4096  # device replay slots
BATCH = 64
GAMMA = 0.95
LR = 5e-4
TARGET_EVERY = 50
EPS0, EPS1, EPS_STEPS = 1.0, 0.05, max(ITERS // 2, 1)

CFG = {
    "observation": {
        "type": "GrayscaleObservation",
        "observation_shape": (W, H),
        "stack_size": STACK,
        "weights": [0.2989, 0.5870, 0.1140],
        "scaling": 1.75,
    },
}


class QNet(nn.Module):
    n_actions: int

    @nn.compact
    def __call__(self, x):  # (B, S, W, H) uint8
        x = x.astype(jnp.float32) / 255.0
        x = jnp.moveaxis(x, -3, -1)  # channels-last for conv
        x = nn.Conv(16, (8, 8), strides=(4, 4))(x)
        x = nn.relu(x)
        x = nn.Conv(32, (4, 4), strides=(2, 2))(x)
        x = nn.relu(x)
        x = x.reshape(x.shape[:-3] + (-1,))
        x = nn.relu(nn.Dense(256)(x))
        return nn.Dense(self.n_actions)(x)


def main():
    env = ht.make("highway-fast-v0", CFG)
    n_actions = env.action_type.n
    net = QNet(n_actions)
    key = jax.random.PRNGKey(0)
    key, k1, k2 = jax.random.split(key, 3)
    params = net.init(k1, jnp.zeros((1, STACK, W, H), jnp.uint8))
    target = params
    opt = optax.adam(LR)
    opt_state = opt.init(params)

    keys = jax.random.split(k2, B)
    obs, states = jax.jit(jax.vmap(env._reset))(keys)

    buf = {
        "obs": jnp.zeros((BUFFER, STACK, W, H), jnp.uint8),
        "next_obs": jnp.zeros((BUFFER, STACK, W, H), jnp.uint8),
        "action": jnp.zeros((BUFFER,), jnp.int32),
        "reward": jnp.zeros((BUFFER,), jnp.float32),
        "done": jnp.zeros((BUFFER,), jnp.float32),
    }

    def policy_step(params, states, obs, key, eps):
        q = net.apply(params, obs)
        k_eps, k_rand, k_step = jax.random.split(key, 3)
        greedy = jnp.argmax(q, axis=-1).astype(jnp.int32)
        rand = jax.random.randint(k_rand, (B,), 0, n_actions)
        act = jnp.where(jax.random.uniform(k_eps, (B,)) < eps, rand, greedy)
        next_obs, states, r, term, trunc, _ = env.step_autoreset_batched(
            states, act
        )
        done = (term | trunc).astype(jnp.float32)
        return states, next_obs, act, r, done

    def write_buffer(buf, ptr, obs, next_obs, act, r, done):
        idx = (ptr + jnp.arange(B)) % BUFFER
        buf = dict(buf)
        buf["obs"] = buf["obs"].at[idx].set(obs)
        buf["next_obs"] = buf["next_obs"].at[idx].set(next_obs)
        buf["action"] = buf["action"].at[idx].set(act)
        buf["reward"] = buf["reward"].at[idx].set(r)
        buf["done"] = buf["done"].at[idx].set(done)
        return buf, ptr + B

    def td_loss(params, target, batch):
        q = net.apply(params, batch["obs"])
        qa = jnp.take_along_axis(q, batch["action"][:, None], axis=-1)[:, 0]
        q_next = net.apply(target, batch["next_obs"]).max(axis=-1)
        y = batch["reward"] + GAMMA * (1.0 - batch["done"]) * q_next
        return jnp.mean(jnp.square(qa - jax.lax.stop_gradient(y)))

    @jax.jit
    def train_iter(carry, key, eps):
        params, target, opt_state, states, obs, buf, ptr, filled = carry
        k_act, k_samp = jax.random.split(key)
        states, next_obs, act, r, done = policy_step(
            params, states, obs, k_act, eps
        )
        buf, ptr = write_buffer(buf, ptr, obs, next_obs, act, r, done)
        filled = jnp.minimum(filled + B, BUFFER)
        idx = jax.random.randint(k_samp, (BATCH,), 0, filled)
        batch = {k: v[idx] for k, v in buf.items()}
        loss, grads = jax.value_and_grad(td_loss)(params, target, batch)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return (
            params, target, opt_state, states, next_obs, buf, ptr, filled,
        ), (loss, jnp.mean(r))

    carry = (params, target, opt_state, states, obs, buf,
             jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    t0 = time.time()
    t_mark, it_mark = t0, 0  # steady-state window start (reset after compile)
    for it in range(ITERS):
        eps = EPS0 + (EPS1 - EPS0) * min(it / EPS_STEPS, 1.0)
        key, k = jax.random.split(key)
        carry, (loss, mr) = train_iter(carry, k, eps)
        if it == 0:
            # first iter pays the full compile; exclude it from the
            # steady-state rate (host-materialize so the timer is honest)
            float(loss)
            print(f"compile+first-iter {time.time() - t0:.1f}s")
            t_mark, it_mark = time.time(), 1
        if it % TARGET_EVERY == TARGET_EVERY - 1:
            carry = (carry[0], carry[0]) + carry[2:]  # sync target
        if (it % 50 == 0 and it > 0) or it == ITERS - 1:
            float(loss)  # drain the dispatch queue before reading the clock
            rate = B * (it + 1 - it_mark) / (time.time() - t_mark)
            print(
                f"iter {it:5d}  eps {eps:.2f}  loss {float(loss):.4f}  "
                f"mean_r {float(mr):.3f}  {rate:,.0f} env-steps/s (steady)"
            )
    return carry


if __name__ == "__main__":
    main()
