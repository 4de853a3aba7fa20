"""Native Gymnasium VectorEnv over the batched JAX core.

The reference parallelizes with one Python env per process
(``gymnasium.vector.AsyncVectorEnv`` / SB3 ``SubprocVecEnv`` — see the
reference's multiprocessing test, tests/envs/test_multiprocessing.py:35-59).
Here the whole batch is ONE jitted program on the accelerator:
``step(actions)`` runs ``step_autoreset_batched`` (envs/base.py) over a
(num_envs, ...) state pytree — batch-minor pallas/XLA sim frames, fused
observation/reward heads, and exact in-step autoreset — so a
vector-env-based trainer (cleanrl, SB3-style loops) gets TPU-batch
throughput through the standard API:

    import gymnasium
    import highwayenv_tpu as ht
    ht.register_gymnasium_envs()
    envs = gymnasium.make_vec("highwayenv_tpu/highway-fast-v0", num_envs=4096)
    obs, info = envs.reset(seed=0)
    obs, r, term, trunc, info = envs.step(envs.action_space.sample())

Autoreset follows Gymnasium's SAME_STEP mode: when an episode ends, the
returned observation is already the first observation of the next episode
(the terminal observation is dropped — computing it would double the
observation-head cost at batch scale; set ``final_obs=True`` to pay that
cost and receive it in ``info["final_obs"]``).

Under a multi-device mesh the state batch is sharded over the "env" axis
(parallel/sharding.py) and every step runs SPMD; numpy in/out happens once
per ``step`` call at the host boundary.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

import gymnasium
from gymnasium.vector import AutoresetMode, VectorEnv
from gymnasium.vector.utils import batch_space


def _to_numpy(x):
    return jax.tree.map(lambda a: np.asarray(a), x)


class GymVectorEnv(VectorEnv):
    """One jitted program for the whole env batch.

    Parameters
    ----------
    env_id:
        A registered highwayenv_tpu id (e.g. ``"highway-v0"``).
    num_envs:
        Batch size.  On a multi-device mesh it is rounded down to a
        multiple of the device count (a ValueError if that would be 0).
    config:
        Env config overrides (same surface as the reference's
        ``env.configure``).
    shard:
        Shard the batch over the default device mesh.  ``None`` (default)
        auto-enables when more than one device is visible AND ``num_envs``
        divides evenly over them; ``True`` raises on a non-divisible batch.
    final_obs:
        Also compute the terminal observation for envs that finished this
        step and return it as ``info["final_obs"]`` (SAME_STEP contract).
        Off by default: it doubles the observation-head work.
    """

    metadata = {
        "autoreset_mode": AutoresetMode.SAME_STEP,
        "render_modes": ["rgb_array"],
    }

    def __init__(
        self,
        env_id: str,
        num_envs: int,
        config: dict | None = None,
        render_mode: str | None = None,
        shard: bool | None = None,
        final_obs: bool = False,
    ):
        import highwayenv_tpu as ht

        self.env = ht.make(env_id, dict(config) if config else None)
        if getattr(self.env.observation_type, "host_side", False):
            raise ValueError(
                "GymVectorEnv requires a device-side observation pipeline; "
                f"{type(self.env.observation_type).__name__} is host-side "
                "under this config (e.g. render_backend='pygame' grayscale)."
            )
        self.render_mode = render_mode
        self._final_obs = bool(final_obs)

        self._mesh = None
        n_dev = jax.device_count()
        if shard is None:
            shard = n_dev > 1 and num_envs % n_dev == 0
        if shard:
            if num_envs % n_dev:
                raise ValueError(
                    f"num_envs={num_envs} is not divisible by the "
                    f"device count ({n_dev}); pass a multiple or shard=False"
                )
            from highwayenv_tpu.parallel.sharding import make_mesh

            self._mesh = make_mesh()
        self.num_envs = int(num_envs)

        self.single_action_space = self.env.action_space
        self.single_observation_space = self.env.observation_space
        self.action_space = batch_space(self.single_action_space, num_envs)
        self.observation_space = batch_space(
            self.single_observation_space, num_envs
        )

        env = self.env

        def _step(states, actions):
            if not self._final_obs:
                return env.step_autoreset_batched(states, actions)
            # final_obs path: compose step + autoreset explicitly so the
            # terminal observation exists before the reset-select.  This
            # runs the sim once but on the generic vmapped path (the
            # batch-minor fast path folds the select into its fused head),
            # so prefer final_obs=False when throughput matters.
            fin = jax.vmap(env.step)(states, actions)
            obs, new_states, r, term, trunc, info = jax.vmap(env._autoreset)(
                *fin
            )
            info = dict(info)
            info["final_obs"] = fin[0]
            return obs, new_states, r, term, trunc, info

        self._step_fn = jax.jit(_step, donate_argnums=(0,))
        self._reset_fn = jax.jit(env.reset_batch)
        self._states = None

    # -- gymnasium VectorEnv surface ------------------------------------ #

    def reset(self, *, seed=None, options=None):
        if options and "config" in options:
            raise ValueError(
                "reconfiguring a compiled vector env is not supported; "
                "pass config= to the constructor"
            )
        if seed is None:
            seed = np.random.SeedSequence().entropy % (2**31)
        if np.ndim(seed) == 0:
            keys = jax.random.split(
                jax.random.PRNGKey(int(seed)), self.num_envs
            )
        else:
            if len(seed) != self.num_envs:
                raise ValueError(
                    f"got {len(seed)} seeds for {self.num_envs} envs"
                )
            keys = jnp.stack([jax.random.PRNGKey(int(s)) for s in seed])
        obs, states = self._reset_fn(keys)
        if self._mesh is not None:
            from highwayenv_tpu.parallel.sharding import shard_batch

            states = shard_batch(states, self._mesh)
        self._states = states
        return _to_numpy(obs), {}

    def step(self, actions):
        if self._states is None:
            raise RuntimeError("reset() must be called before step()")
        actions = jax.tree.map(jnp.asarray, actions)
        obs, self._states, reward, term, trunc, info = self._step_fn(
            self._states, actions
        )
        info = _to_numpy(info)
        # gymnasium vector-info convention: per-key presence masks
        for k in list(info):
            if not k.startswith("_"):
                info[f"_{k}"] = np.ones(self.num_envs, dtype=bool)
        return (
            _to_numpy(obs),
            np.asarray(reward, dtype=np.float64),
            np.asarray(term, dtype=bool),
            np.asarray(trunc, dtype=bool),
            info,
        )

    def render(self):
        if self.render_mode != "rgb_array" or self._states is None:
            return None
        from highwayenv_tpu.render import render_rgb

        state0 = jax.tree.map(lambda x: x[0], self._states)
        return render_rgb(self.env, state0)

    def close_extras(self, **kwargs):
        self._states = None

    @property
    def states(self):
        """The sharded EnvState batch pytree (orbax-checkpointable)."""
        return self._states
