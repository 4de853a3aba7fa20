"""MultiAgentObservation / TupleObservation wrappers
(envs/common/observation.py:588-621)."""

from __future__ import annotations


class MultiAgentObservation:
    multi_agent = True

    def __init__(self, env, observation_config: dict, **kwargs):
        from highwayenv_tpu.factories import observation_factory

        self.env = env
        self.observation_config = dict(observation_config)
        self.sub = observation_factory(env, self.observation_config)

    def space(self):
        from gymnasium import spaces

        return spaces.Tuple(
            [self.sub.space() for _ in self.env.ego_slots]
        )

    def observe(self, geo, state, ego):
        return self.sub.observe(geo, state, ego)


class TupleObservation:
    def __init__(self, env, observation_configs, **kwargs):
        from highwayenv_tpu.factories import observation_factory

        self.env = env
        self.subs = [
            observation_factory(env, cfg) for cfg in observation_configs
        ]

    def space(self):
        from gymnasium import spaces

        return spaces.Tuple([s.space() for s in self.subs])

    def observe(self, geo, state, ego):
        return tuple(s.observe(geo, state, ego) for s in self.subs)
