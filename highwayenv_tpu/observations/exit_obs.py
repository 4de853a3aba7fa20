"""ExitObservation: Kinematics with the ego x replaced by the exit-lane
longitudinal coordinate (envs/common/observation.py:624-675).

Other vehicles' relative features still subtract the ego's *world* position
(the reference's ``to_dict(origin)`` reads the unmodified observer state).
"""

from __future__ import annotations

import jax.numpy as jnp

from highwayenv_tpu.observations.kinematics import KinematicsObservation
from highwayenv_tpu.road import lane as lane_ops


class ExitObservation(KinematicsObservation):
    def __init__(self, exit_lane: int, **kwargs):
        super().__init__(**kwargs)
        self.exit_lane = int(exit_lane)

    def _ego_row(self, geo, state, ego, ego_row):
        s, _lat = lane_ops.local_coordinates(
            geo, jnp.int32(self.exit_lane), state.pos[..., ego, :]
        )
        xi = self.features.index("x")
        return ego_row.at[..., xi].set(s)
