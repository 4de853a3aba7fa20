"""Two-way road with oncoming traffic (risk-management task).

TPU-native rebuild of highway_env/envs/two_way_env.py:11-158 (two-way-v0).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from highwayenv_tpu.envs.base import BaseEnv, EnvState
from highwayenv_tpu.road import lane as lane_ops
from highwayenv_tpu.road.network import LineType, RoadNetworkBuilder, StraightLane
from highwayenv_tpu.utils.config import update_config
from highwayenv_tpu.vehicle import controller
from highwayenv_tpu.vehicle.state import KIND_EGO, KIND_IDM, empty_state


class TwoWayEnv(BaseEnv):
    @classmethod
    def default_config(cls) -> dict:
        config = super().default_config()
        update_config(
            config,
            {
                "observation": {"type": "TimeToCollision", "horizon": 5},
                "action": {"type": "DiscreteMetaAction"},
                "collision_reward": 0,
                "left_lane_constraint": 1,
                "left_lane_reward": 0.2,
                "high_speed_reward": 0.8,
                "max_episode_steps": 15,  # registration TimeLimit
            },
        )
        return config

    def _build_scene(self):
        """two_way_env.py:72-115."""
        length = 800
        net = RoadNetworkBuilder()
        net.add_lane(
            "a", "b",
            StraightLane(
                [0, 0], [length, 0],
                line_types=(LineType.CONTINUOUS_LINE, LineType.STRIPED),
            ),
        )
        net.add_lane(
            "a", "b",
            StraightLane(
                [0, 4.0], [length, 4.0],
                line_types=(LineType.NONE, LineType.CONTINUOUS_LINE),
            ),
        )
        net.add_lane(
            "b", "a",
            StraightLane(
                [length, 0], [0, 0], line_types=(LineType.NONE, LineType.NONE)
            ),
        )
        self.net = net
        self.geo = net.build()
        self.max_edge_lanes = 2
        self.num_slots = 6  # ego + 3 same-direction + 2 oncoming
        self.ttc_grid_lanes = 2  # lanes on the ego's (a,b) edge
        self.connected3 = net.connectivity_matrix(depth=3)

    def _reset_vehicles(self, key):
        """two_way_env.py:117-158."""
        V = self.num_slots
        k1, k2, k3, k4 = jax.random.split(key, 4)
        veh = empty_state(V)

        lane_ab1 = self.net.global_lane_index(("a", "b", 1))
        lane_ba0 = self.net.global_lane_index(("b", "a", 0))

        pos = jnp.zeros((V, 2), jnp.float32)
        heading = jnp.zeros((V,), jnp.float32)
        speed = jnp.zeros((V,), jnp.float32)
        lane = jnp.zeros((V,), jnp.int32)

        # ego on ("a","b",1) at s=30, speed 30
        ego_s = jnp.float32(30.0)
        pos = pos.at[0].set(
            lane_ops.position(self.geo, jnp.int32(lane_ab1), ego_s, jnp.float32(0.0))
        )
        speed = speed.at[0].set(30.0)
        lane = lane.at[0].set(lane_ab1)

        # 3 same-direction NPCs, lane changes disabled
        s_fwd = 70.0 + 40.0 * jnp.arange(3) + 10.0 * jax.random.normal(k1, (3,))
        v_fwd = 24.0 + 2.0 * jax.random.normal(k2, (3,))
        l_fwd = jnp.full((3,), lane_ab1, jnp.int32)
        pos = pos.at[1:4].set(
            lane_ops.position(self.geo, l_fwd, s_fwd, jnp.zeros(3)).astype(jnp.float32)
        )
        heading = heading.at[1:4].set(
            lane_ops.heading_at(self.geo, l_fwd, 70.0 + 40.0 * jnp.arange(3)).astype(
                jnp.float32
            )
        )
        speed = speed.at[1:4].set(v_fwd)
        lane = lane.at[1:4].set(l_fwd)

        # 2 oncoming NPCs on ("b","a",0)
        s_bwd = 200.0 + 100.0 * jnp.arange(2) + 10.0 * jax.random.normal(k3, (2,))
        v_bwd = 20.0 + 5.0 * jax.random.normal(k4, (2,))
        l_bwd = jnp.full((2,), lane_ba0, jnp.int32)
        pos = pos.at[4:6].set(
            lane_ops.position(self.geo, l_bwd, s_bwd, jnp.zeros(2)).astype(jnp.float32)
        )
        heading = heading.at[4:6].set(
            lane_ops.heading_at(self.geo, l_bwd, 200.0 + 100.0 * jnp.arange(2)).astype(
                jnp.float32
            )
        )
        speed = speed.at[4:6].set(v_bwd)
        lane = lane.at[4:6].set(l_bwd)

        kind = jnp.asarray([KIND_EGO] + [KIND_IDM] * 5, jnp.int32)
        is_ego = kind == KIND_EGO

        # RoadObject.__init__ localizes by closest lane; NPC target lane = own
        # lane (the oncoming ones get it set explicitly, two_way_env.py:157)
        loc = lane_ops.closest_lane(self.geo, pos, heading)
        lane = jnp.where(is_ego, loc, lane)
        target_lane = lane.at[4:6].set(lane_ba0)
        # meta-action egos index target_speeds; raw-control egos
        # keep spawn speed (plain Vehicle, action.py:129-135)
        ego_index, ego_ts = controller.ego_speed_init(self.action_type, speed)

        return veh.replace(
            pos=pos,
            heading=heading,
            speed=speed,
            lane=loc,
            target_lane=jnp.where(is_ego, loc, target_lane),
            target_speed=jnp.where(is_ego, ego_ts, speed).astype(jnp.float32),
            speed_index=jnp.where(is_ego, ego_index, 0).astype(jnp.int32),
            timer=jnp.mod((pos[:, 0] + pos[:, 1]) * jnp.pi, 1.0).astype(jnp.float32),
            kind=kind,
            enable_lane_change=is_ego,  # NPCs: enable_lane_change=False
        )

    def _rewards(self, state: EnvState, action):
        """two_way_env.py:50-59."""
        veh = state.vehicles
        n_speeds = len(self.action_type.target_speeds)
        li = lane_ops._gather(self.geo, veh.lane[..., 0])
        n_neighbours = self.geo.edge_n[li]
        tgt_id = self.geo.lane_id[lane_ops._gather(self.geo, veh.target_lane[..., 0])]
        return {
            "high_speed_reward": veh.speed_index[..., 0] / (n_speeds - 1),
            "left_lane_reward": (n_neighbours - 1 - tgt_id)
            / jnp.maximum(n_neighbours - 1, 1),
        }

    def _reward(self, state: EnvState, action):
        rewards = self._rewards(state, action)
        return sum(self.config.get(k, 0) * v for k, v in rewards.items())

    def _is_terminated(self, state: EnvState):
        return state.vehicles.crashed[..., 0]

    def _is_truncated(self, state: EnvState):
        return jnp.zeros_like(state.time, dtype=bool)
