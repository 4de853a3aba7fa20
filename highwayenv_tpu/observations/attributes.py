"""AttributesObservation: a Dict of env-computed arrays
(envs/common/observation.py:563-585).

Each attribute name maps to an ``attr_<name>(state)`` method on the env
(pure functions of the full EnvState, so observation noise and derived
quantities stay jittable).
"""

from __future__ import annotations

import numpy as np


class AttributesObservation:
    observes_env = True

    def __init__(self, env, attributes, **kwargs):
        self.env = env
        self.attributes = tuple(attributes)

    def space(self):
        from gymnasium import spaces

        import jax

        # shapes from an abstract evaluation of a reset state
        obs, _ = jax.eval_shape(self.env._reset, jax.random.PRNGKey(0))
        return spaces.Dict(
            {
                a: spaces.Box(-np.inf, np.inf, shape=obs[a].shape, dtype=np.float32)
                for a in self.attributes
            }
        )

    def observe_env(self, env, state):
        return {a: getattr(env, f"attr_{a}")(state) for a in self.attributes}

    def observe(self, geo, vehicles, ego):
        raise TypeError(
            "AttributesObservation reads the full EnvState; the env must "
            "override _observe to call observe_env"
        )
