"""Grayscale frame-stack observation (envs/common/observation.py:50-112).

Renders the scene with the numpy rasterizer (highwayenv_tpu/render.py) at the
configured observation resolution, converts RGB -> gray with the configured
weights, and stacks frames DQN-style.

Host-side only: rendering cannot run inside the jitted step, so this
observation is served through the stateful Gymnasium adapter
(highwayenv_tpu/gym_env.py), which detects it and maintains the frame stack
across steps.  The pure functional API raises if asked to observe it.
"""

from __future__ import annotations

import numpy as np


class GrayscaleObservation:
    host_side = True

    def __init__(
        self,
        env,
        observation_shape,
        stack_size: int,
        weights,
        scaling: float | None = None,
        centering_position=None,
        **kwargs,
    ):
        self.env = env
        self.observation_shape = tuple(observation_shape)
        self.stack_size = stack_size
        self.shape = (stack_size,) + self.observation_shape
        self.weights = np.asarray(weights, np.float64)
        self.obs = np.zeros(self.shape, np.uint8)
        # dedicated viewer config (typically smaller than env render)
        self.viewer_config = dict(env.config)
        self.viewer_config.update(
            {
                "screen_width": self.observation_shape[0],
                "screen_height": self.observation_shape[1],
                "scaling": scaling or env.config["scaling"],
                "centering_position": centering_position
                or env.config["centering_position"],
            }
        )

    def space(self):
        from gymnasium import spaces

        return spaces.Box(shape=self.shape, low=0, high=255, dtype=np.uint8)

    def reset_stack(self):
        self.obs = np.zeros(self.shape, np.uint8)

    def observe_host(self, env, state) -> np.ndarray:
        """Render + grayscale + roll the stack (observation.py:101-112)."""
        from highwayenv_tpu.render import render_rgb

        class _Cfg:  # env proxy with the viewer-sized config
            config = self.viewer_config
            geo = env.geo
            ego_slots = env.ego_slots

        frame = render_rgb(_Cfg, state)  # (H, W, 3)
        raw = np.moveaxis(frame, 0, 1)  # W x H x C like the reference
        gray = np.dot(raw[..., :3], self.weights).clip(0, 255).astype(np.uint8)
        self.obs = np.roll(self.obs, -1, axis=0)
        self.obs[-1] = gray
        return self.obs.copy()

    def observe(self, geo, state, ego):
        raise TypeError(
            "GrayscaleObservation renders host-side; use the Gymnasium "
            "adapter (highwayenv_tpu.make_gym) for pixel observations"
        )
