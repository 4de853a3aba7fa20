"""Stateful Gymnasium adapter over the functional JAX core.

A drop-in replacement for the reference's env objects
(envs/common/abstract.py:40-465): ``reset(seed=..., options=...)`` /
``step(action)`` with numpy in/out, spaces, config surface, and the
MultiAgentWrapper contract (abstract.py:468-478).

The functional core stays pure and jitted; this class only threads the
EnvState and PRNG key.  Batched/TPU users should use the functional API
directly (``ht.make(id)`` -> ``env.reset(key)`` / ``env.step(state, a)``).

Call ``highwayenv_tpu.register_gymnasium_envs()`` once to register every id
with Gymnasium (e.g. ``gym.make("highwayenv_tpu/highway-v0")``).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

import gymnasium


def _to_numpy(x):
    return jax.tree.map(lambda a: np.asarray(a), x)


class GymEnv(gymnasium.Env):
    metadata = {"render_modes": ["rgb_array", "human"], "render_fps": 15}

    def __init__(
        self,
        env_id: str,
        config: dict | None = None,
        render_mode: str | None = None,
    ):
        import highwayenv_tpu as ht

        self._env_id = env_id
        self._user_config = dict(config or {})
        self.env = ht.make(env_id, self._user_config or None)
        self.render_mode = render_mode
        self._state = None
        self._key = jax.random.PRNGKey(0)
        self._viewer = None

    # -- config surface (abstract.py:127-144) --------------------------- #
    @property
    def config(self) -> dict:
        return self.env.config

    def configure(self, config: dict) -> None:
        import highwayenv_tpu as ht

        self._user_config.update(config or {})
        self.env = ht.make(self._env_id, self._user_config)

    @property
    def action_space(self):
        return self.env.action_space

    @property
    def observation_space(self):
        return self.env.observation_space

    @property
    def unwrapped(self):
        return self

    @property
    def _host_obs(self):
        return getattr(self.env.observation_type, "host_side", False)

    def reset(self, *, seed: int | None = None, options: dict | None = None):
        from highwayenv_tpu import seeding

        super().reset(seed=seed)  # seeds self.np_random (gymnasium chain)
        if options and "config" in options:
            self.configure(options["config"])
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        if seeding.supports_seeded_reset(self.env):
            # host replay of the reference's draw schedule: seeded scenes are
            # byte-identical to the reference's reset(seed)
            obs, self._state = self.env.reset_seeded(rng=self.np_random)
        else:
            self._key, k = jax.random.split(self._key)
            obs, self._state = self.env.reset(k)
        if self._host_obs:
            self.env.observation_type.reset_stack()
            obs = self.env.observation_type.observe_host(self.env, self._state)
        # reset info contract (abstract.py:245-246): _info with a sampled
        # action placeholder
        info = self.env._info(self._state, self.action_space.sample())
        return _to_numpy(obs), _to_numpy(info)

    def step(self, action):
        if self._state is None:
            raise RuntimeError("reset() must be called before step()")
        if self.config.get("manual_control", False) and self._viewer is not None:
            # keyboard overrides the agent (action/action_factory pattern,
            # envs/common/action.py manual branch + graphics EventHandler)
            action = self._viewer.get_manual_action()
        obs, self._state, reward, terminated, truncated, info = self.env.step(
            self._state, jnp.asarray(action)
        )
        if self._host_obs:
            obs = self.env.observation_type.observe_host(self.env, self._state)
        return (
            _to_numpy(obs),
            float(np.asarray(reward)),
            bool(np.asarray(terminated)),
            bool(np.asarray(truncated)),
            _to_numpy(info),
        )

    def render_frame(self) -> np.ndarray:
        from highwayenv_tpu.render import render_rgb

        if self._state is None:
            raise RuntimeError("reset() must be called before render()")
        if self.config.get("render_backend") == "pygame":
            # pixel-exact reference pipeline (pygame_render.py); the numpy
            # rasterizer below stays the dependency-light default
            from highwayenv_tpu.pygame_render import PygameFrameRenderer

            if getattr(self, "_pygame_renderer", None) is None:
                self._pygame_renderer = PygameFrameRenderer(
                    self.env,
                    self.config["screen_width"],
                    self.config["screen_height"],
                )
            self._pygame_renderer.display(self._state)
            return self._pygame_renderer.get_image()
        if self.config.get("show_trajectories"):
            # per-slot pose history for trajectory ghosts
            # (vehicle/graphics.py:146-171; Vehicle.history deque(30))
            import collections

            if not hasattr(self, "_history"):
                self._history = {}
            veh = self._state.vehicles
            import numpy as _np

            kind = _np.asarray(veh.kind)
            pos = _np.asarray(veh.pos)
            heading = _np.asarray(veh.heading)
            length = _np.asarray(veh.length)
            width = _np.asarray(veh.width)
            for i in range(self.env.num_slots):
                if kind[i] == 0:
                    continue
                dq = self._history.setdefault(
                    i, collections.deque(maxlen=30)
                )
                dq.appendleft(
                    (pos[i].copy(), float(heading[i]), float(length[i]),
                     float(width[i]))
                )
            return render_rgb(self.env, self._state, history=self._history)
        return render_rgb(self.env, self._state)

    def render(self):
        if self._state is None:
            return None
        if self.render_mode == "rgb_array":
            return self.render_frame()
        if self.render_mode == "human":
            from highwayenv_tpu.viewer import EnvViewer

            if self._viewer is None:
                self._viewer = EnvViewer(self)
            return self._viewer.display()
        return None

    def close(self):
        if self._viewer is not None:
            self._viewer.close()
            self._viewer = None

    @property
    def state(self):
        return self._state


class MultiAgentWrapper(gymnasium.Wrapper):
    """Per-agent step returns from the aggregated env
    (envs/common/abstract.py:468-478)."""

    def step(self, action):
        obs, _reward, _terminated, truncated, info = self.env.step(action)
        reward = info["agents_rewards"]
        terminated = info["agents_terminated"]
        return obs, reward, terminated, truncated, info


_GYM_REGISTERED = False


def register_gymnasium_envs(namespace: str = "highwayenv_tpu") -> None:
    """Register every env id with Gymnasium under ``namespace/<id>``."""
    global _GYM_REGISTERED
    if _GYM_REGISTERED:
        return
    import highwayenv_tpu as ht

    # ids the reference registers with MultiAgentWrapper applied
    # (highway_env/__init__.py:75-84)
    _WRAPPED = {"intersection-multi-agent-v1", "intersection-multi-agent-v2"}
    for env_id in ht.registered_ids():
        extra = {}
        if env_id in _WRAPPED:
            extra["additional_wrappers"] = (MultiAgentWrapper.wrapper_spec(),)
        gymnasium.register(
            id=f"{namespace}/{env_id}",
            entry_point="highwayenv_tpu.gym_env:GymEnv",
            # one jitted program for the whole batch (vector_env.py):
            # gymnasium.make_vec("highwayenv_tpu/<id>", num_envs=N)
            vector_entry_point="highwayenv_tpu.vector_env:GymVectorEnv",
            kwargs={"env_id": env_id},
            **extra,
        )
    _GYM_REGISTERED = True
