"""Multi-device scaling: shard the env batch over a device mesh.

The reference's only parallelism is Gymnasium subprocess vectorization
(SURVEY.md section 5.8).  The TPU-native equivalent: env state is a pytree
with a leading batch axis, sharded over a 1-D ``Mesh(("env",))`` with
``NamedSharding``; the jitted vmapped step runs SPMD, and learner-style
reductions ride ICI collectives (psum/all_gather) with no host round trips.
Multi-host: the same code under ``jax.distributed.initialize`` — the env axis
spans all chips of the pod slice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "env") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(tree, mesh: Mesh, axis_name: str = "env"):
    """Place a batched pytree with its leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(tree, sharding)


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def sharded_rollout_fn(env, mesh: Mesh, horizon: int, axis_name: str = "env"):
    """Build a jitted sharded rollout: ``(states, key) -> (states, metrics)``.

    Random policy rollout with per-env auto-reset; returns the running state
    (donated) plus mean reward / done-rate reduced across the whole mesh —
    the collective pattern a learner would use.
    """
    n_actions = env.action_type.n
    batch_spec = NamedSharding(mesh, P(axis_name))

    def rollout(states, key):
        B = states.time.shape[0]

        def body(carry, k):
            states = carry
            acts = jax.random.randint(k, (B,), 0, n_actions)
            obs, states, r, term, trunc, _ = env.step_autoreset_batched(
                states, acts
            )
            # fold the observation into the metrics so the observation
            # pipeline is part of the measured work (a policy would consume
            # it; without this XLA dead-code-eliminates it entirely)
            obs_sum = sum(jnp.sum(x) for x in jax.tree.leaves(obs))
            return states, (
                jnp.mean(r),
                jnp.mean((term | trunc).astype(jnp.float32)),
                obs_sum,
            )

        states, (rews, dones, obs_sums) = jax.lax.scan(
            body, states, jax.random.split(key, horizon)
        )
        return states, {
            "mean_reward": jnp.mean(rews),
            "done_rate": jnp.mean(dones),
            "obs_checksum": jnp.sum(obs_sums),
        }

    return jax.jit(
        rollout,
        in_shardings=(batch_spec, NamedSharding(mesh, P())),
        out_shardings=(batch_spec, NamedSharding(mesh, P())),
        donate_argnums=(0,),
    )
