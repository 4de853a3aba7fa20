"""MultiAgentAction: per-controlled-vehicle sub-actions
(envs/common/action.py:301-333).

The engine applies one shared sub-action type to every controlled slot; the
agent-facing space is a Tuple of the sub-spaces and the incoming action is a
stacked (n_agents, ...) array (BaseEnv scatters per ego slot).
"""

from __future__ import annotations


class MultiAgentAction:
    def __init__(self, env, action_config: dict, **kwargs):
        from highwayenv_tpu.factories import action_factory

        self.env = env
        self.action_config = dict(action_config)
        self.sub = action_factory(self.action_config, env)

    @property
    def stores_raw_controls(self):
        return getattr(self.sub, "stores_raw_controls", False)

    @property
    def dynamical(self):
        return getattr(self.sub, "dynamical", False)

    @property
    def action_shape(self):
        return getattr(self.sub, "action_shape", ())

    @property
    def target_speeds(self):
        return self.sub.target_speeds

    @property
    def n_agents(self) -> int:
        return len(self.env.ego_slots)

    def space(self):
        from gymnasium import spaces

        return spaces.Tuple([self.sub.space() for _ in range(self.n_agents)])

    def apply(self, geo, state, ego_mask, slot_actions):
        return self.sub.apply(geo, state, ego_mask, slot_actions)

    def available_actions_mask(self, geo, state, ego):
        return self.sub.available_actions_mask(geo, state, ego)
