"""DiscreteMetaAction: lane-change / cruise set-point meta actions.

envs/common/action.py:199-298. The action mechanics (target updates +
P-cascade controls) are implemented in vehicle/controller.py; this module
carries the config surface, the action table, and the available-action mask.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from highwayenv_tpu.road import lane as lane_ops
from highwayenv_tpu.vehicle import controller
from highwayenv_tpu.vehicle.state import VehicleState

ACTIONS_ALL = {0: "LANE_LEFT", 1: "IDLE", 2: "LANE_RIGHT", 3: "FASTER", 4: "SLOWER"}
ACTIONS_LONGI = {0: "SLOWER", 1: "IDLE", 2: "FASTER"}
ACTIONS_LAT = {0: "LANE_LEFT", 1: "IDLE", 2: "LANE_RIGHT"}


class DiscreteMetaAction:
    stores_raw_controls = False  # egos run the ControlledVehicle P-cascade
    action_shape = ()

    def __init__(
        self,
        longitudinal: bool = True,
        lateral: bool = True,
        target_speeds=None,
        **kwargs,
    ):
        self.longitudinal = longitudinal
        self.lateral = lateral
        self.target_speeds = (
            np.asarray(target_speeds)
            if target_speeds is not None
            else controller.DEFAULT_TARGET_SPEEDS
        )
        if longitudinal and lateral:
            self.actions = ACTIONS_ALL
        elif longitudinal:
            self.actions = ACTIONS_LONGI
        elif lateral:
            self.actions = ACTIONS_LAT
        else:
            raise ValueError("At least longitudinal or lateral actions must be included")
        self.actions_indexes = {v: k for k, v in self.actions.items()}

    @property
    def n(self) -> int:
        return len(self.actions)

    def space(self):
        from gymnasium import spaces

        return spaces.Discrete(self.n)

    def apply(self, geo, state: VehicleState, ego_mask, action):
        """Update the masked controlled vehicles' targets from the action."""
        return controller.apply_meta_action(
            geo,
            state,
            ego_mask,
            action,
            self.target_speeds,
            longitudinal=self.longitudinal,
            lateral=self.lateral,
        )

    def available_actions_mask(self, geo, state: VehicleState, ego: int):
        """Boolean (n,) mask of currently-available actions
        (envs/common/action.py:262-298)."""
        li = lane_ops._gather(geo, state.lane[..., ego])
        lane_id = geo.lane_id[li]
        base = geo.edge_base[li]
        n_edge = geo.edge_n[li]
        pos = state.pos[..., ego, :]
        mask = [jnp.zeros((), bool)] * 5

        def reachable(cand_id):
            ok = (cand_id >= 0) & (cand_id < n_edge)
            cand = jnp.clip(base + cand_id, 0, geo.num_lanes - 1)
            return ok & lane_ops.is_reachable_from(geo, cand, pos)

        idle = jnp.ones((), bool)
        left = reachable(lane_id - 1) & bool(self.lateral)
        right = reachable(lane_id + 1) & bool(self.lateral)
        n_speeds = len(self.target_speeds)
        faster = (state.speed_index[..., ego] < n_speeds - 1) & bool(self.longitudinal)
        slower = (state.speed_index[..., ego] > 0) & bool(self.longitudinal)
        if self.longitudinal and self.lateral:
            mask = jnp.stack([left, idle, right, faster, slower], axis=-1)
        elif self.longitudinal:
            mask = jnp.stack([slower, idle, faster], axis=-1)
        else:
            mask = jnp.stack([left, idle, right], axis=-1)
        return mask
