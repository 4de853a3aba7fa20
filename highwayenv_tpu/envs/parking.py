"""Parking: continuous-control goal-reaching with HER-compatible reward.

TPU-native rebuild of highway_env/envs/parking_env.py:22-301 (parking-v0,
parking-ActionRepeat-v0, parking-parked-v0): 2x14 perpendicular spots, a goal
Landmark on a random empty spot, optional parked vehicles, 4 wall Obstacles,
and the weighted-p-norm goal reward ``-(|dg| . w)^0.5``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from highwayenv_tpu.envs.base import BaseEnv, EnvState
from highwayenv_tpu.road import lane as lane_ops
from highwayenv_tpu.road.network import LineType, RoadNetworkBuilder, StraightLane
from highwayenv_tpu.utils.config import update_config
from highwayenv_tpu.vehicle.state import (
    KIND_EGO,
    KIND_LANDMARK,
    KIND_OBSTACLE,
    KIND_PLAIN,
    empty_state,
)


class ParkingEnv(BaseEnv):
    # reference sets an explicit ego color attribute (parking_env.py:193)
    ego_color = (50, 200, 0)

    @classmethod
    def default_config(cls) -> dict:
        config = super().default_config()
        update_config(
            config,
            {
                "observation": {
                    "type": "KinematicsGoal",
                    "features": ["x", "y", "vx", "vy", "cos_h", "sin_h"],
                    "scales": [100, 100, 5, 5, 1, 1],
                    "normalize": False,
                },
                "action": {"type": "ContinuousAction"},
                "reward_weights": [1, 0.3, 0, 0, 0.02, 0.02],
                "success_goal_reward": 0.12,
                "collision_reward": -5,
                "steering_range": float(np.deg2rad(45)),
                "simulation_frequency": 15,
                "policy_frequency": 5,
                "duration": 100,
                "screen_width": 600,
                "screen_height": 300,
                "centering_position": [0.5, 0.5],
                "scaling": 7,
                "controlled_vehicles": 1,
                "vehicles_count": 0,
                "add_walls": True,
            },
        )
        return config

    def _build_scene(self):
        """parking_env.py:146-229."""
        cfg = self.config
        spots = 14
        net = RoadNetworkBuilder()
        width = 4.0
        lt = (LineType.CONTINUOUS, LineType.CONTINUOUS)
        y_offset, length = 10.0, 8.0
        for k in range(spots):
            x = (k + 1 - spots // 2) * width - width / 2
            net.add_lane(
                "a", "b",
                StraightLane(
                    [x, y_offset], [x, y_offset + length],
                    width=width, line_types=lt,
                ),
            )
            net.add_lane(
                "b", "c",
                StraightLane(
                    [x, -y_offset], [x, -y_offset - length],
                    width=width, line_types=lt,
                ),
            )
        self.net = net
        self.geo = net.build()
        self.max_edge_lanes = spots
        self.n_spots = 2 * spots

        n_ctrl = cfg["controlled_vehicles"]
        n_parked = cfg["vehicles_count"]
        n_walls = 4 if cfg["add_walls"] else 0
        # layout: egos | parked | goals (landmarks) | walls
        self.num_slots = n_ctrl + n_parked + n_ctrl + n_walls
        self._ego_slots = list(range(n_ctrl))
        self._goal_base = n_ctrl + n_parked
        self._wall_base = self._goal_base + n_ctrl
        self._n_parked = n_parked

    @property
    def ego_slots(self):
        return tuple(self._ego_slots)

    def goal_slot_of(self, ego: int) -> int:
        return self._goal_base + self._ego_slots.index(ego)

    def _reset_vehicles(self, key):
        """parking_env.py:181-229."""
        cfg = self.config
        V = self.num_slots
        n_ctrl = cfg["controlled_vehicles"]
        n_parked = self._n_parked
        veh = empty_state(V)

        k_head, k_perm = jax.random.split(key)

        pos = jnp.zeros((V, 2), jnp.float32)
        heading = jnp.zeros((V,), jnp.float32)
        kind = jnp.zeros((V,), jnp.int32)
        length = jnp.full((V,), 5.0, jnp.float32)
        width = jnp.full((V,), 2.0, jnp.float32)
        collidable = jnp.ones((V,), bool)

        # controlled vehicles at [10(i - n//2), 0], random heading
        i = jnp.arange(n_ctrl, dtype=jnp.float32)
        ego_x = 10.0 * (i - n_ctrl // 2)
        ego_heading = 2 * jnp.pi * jax.random.uniform(k_head, (n_ctrl,))
        pos = pos.at[:n_ctrl, 0].set(ego_x)
        heading = heading.at[:n_ctrl].set(ego_heading)
        kind = kind.at[:n_ctrl].set(KIND_EGO)

        # spot assignment without replacement: permute all spots, then push
        # the ego-occupied spots to the back (the reference removes the egos'
        # closest lanes from the pool, parking_env.py:184-198)
        ego_pos = pos[:n_ctrl]
        ego_lane = lane_ops.closest_lane(self.geo, ego_pos, heading[:n_ctrl])
        perm = jax.random.permutation(k_perm, self.n_spots)
        taken = jnp.isin(perm, ego_lane)
        order = perm[jnp.argsort(taken, stable=True)]

        # goals: one landmark per controlled vehicle at the spot center
        goal_lane = order[:n_ctrl]
        mid = self.geo.length[goal_lane] / 2
        gpos = lane_ops.position(self.geo, goal_lane, mid, jnp.zeros_like(mid))
        ghead = lane_ops.heading_at(self.geo, goal_lane, jnp.zeros_like(mid))
        gb = self._goal_base
        pos = pos.at[gb : gb + n_ctrl].set(gpos)
        heading = heading.at[gb : gb + n_ctrl].set(ghead)
        kind = kind.at[gb : gb + n_ctrl].set(KIND_LANDMARK)
        length = length.at[gb : gb + n_ctrl].set(2.0)  # Landmark 2x2
        width = width.at[gb : gb + n_ctrl].set(2.0)
        # Landmarks stay in the collision pass (non-solid -> sets `hit`,
        # never `crashed`; objects.py:113-120)

        # parked vehicles at longitudinal 4.0 of further spots
        if n_parked:
            plane = order[n_ctrl : n_ctrl + n_parked]
            ppos = lane_ops.position(
                self.geo, plane, jnp.full((n_parked,), 4.0), jnp.zeros(n_parked)
            )
            phead = lane_ops.heading_at(
                self.geo, plane, jnp.full((n_parked,), 4.0)
            )
            pos = pos.at[n_ctrl : n_ctrl + n_parked].set(ppos)
            heading = heading.at[n_ctrl : n_ctrl + n_parked].set(phead)
            kind = kind.at[n_ctrl : n_ctrl + n_parked].set(KIND_PLAIN)

        # walls (parking_env.py:218-229)
        if self.config["add_walls"]:
            W, H = 70.0, 42.0
            wb = self._wall_base
            wall_pos = jnp.asarray(
                [[0.0, -H / 2], [0.0, H / 2], [-W / 2, 0.0], [W / 2, 0.0]]
            )
            wall_head = jnp.asarray([0.0, 0.0, jnp.pi / 2, jnp.pi / 2])
            wall_len = jnp.asarray([W, W, H, H])
            pos = pos.at[wb : wb + 4].set(wall_pos)
            heading = heading.at[wb : wb + 4].set(wall_head)
            kind = kind.at[wb : wb + 4].set(KIND_OBSTACLE)
            length = length.at[wb : wb + 4].set(wall_len)
            width = width.at[wb : wb + 4].set(1.0)

        lane = lane_ops.closest_lane(self.geo, pos, heading)
        return veh.replace(
            pos=pos,
            heading=heading,
            lane=lane,
            target_lane=lane,
            kind=kind,
            length=length,
            width=width,
            collidable=collidable,
        )

    # ------------------------------------------------------------------ #
    PARKING_OBS = {
        "observation": {
            "type": "KinematicsGoal",
            "features": ["x", "y", "vx", "vy", "cos_h", "sin_h"],
            "scales": [100, 100, 5, 5, 1, 1],
            "normalize": False,
        }
    }

    def _build_spaces(self):
        """Rewards always use PARKING_OBS even under a different configured
        observation (parking_env.py:74-82, 121-127)."""
        super()._build_spaces()
        from highwayenv_tpu.factories import observation_factory

        self.observation_type_parking = observation_factory(
            self, self.PARKING_OBS["observation"]
        )

    def _goal_features(self, state: EnvState, slot):
        obs = self.observation_type_parking
        row = obs._row(state.vehicles, slot) / jnp.asarray(obs.scales)
        return row

    def compute_reward(self, achieved, desired, p: float = 0.5):
        """Weighted p-norm goal reward (parking_env.py:231-256)."""
        w = jnp.asarray(self.config["reward_weights"], jnp.float32)
        return -jnp.power(
            jnp.sum(jnp.abs(achieved - desired) * w, axis=-1), p
        )

    def _agent_goal_rewards(self, state: EnvState):
        vals = []
        for ego in self.ego_slots:
            achieved = self._goal_features(state, ego)
            desired = self._goal_features(state, self.goal_slot_of(ego))
            vals.append(self.compute_reward(achieved, desired))
        return jnp.stack(vals, axis=-1)

    def _reward(self, state: EnvState, action):
        """parking_env.py:257-269."""
        goal_r = jnp.sum(self._agent_goal_rewards(state), axis=-1)
        crashes = sum(
            state.vehicles.crashed[..., e].astype(jnp.float32)
            for e in self.ego_slots
        )
        return goal_r + self.config["collision_reward"] * crashes

    def _rewards(self, state: EnvState, action):
        raise NotImplementedError

    def _success(self, state: EnvState):
        return jnp.all(
            self._agent_goal_rewards(state)
            > -self.config["success_goal_reward"],
            axis=-1,
        )

    def _is_terminated(self, state: EnvState):
        """parking_env.py:277-285."""
        crashed = jnp.zeros((), bool)
        for e in self.ego_slots:
            crashed = crashed | state.vehicles.crashed[..., e]
        return crashed | self._success(state)

    def _is_truncated(self, state: EnvState):
        return state.time >= self.config["duration"]

    def _info(self, state: EnvState, action):
        info = super()._info(state, action)
        info["is_success"] = self._success(state)
        return info


class ParkingEnvActionRepeat(ParkingEnv):
    """parking-ActionRepeat-v0 (parking_env.py:293-295)."""

    @classmethod
    def default_config(cls) -> dict:
        cfg = super().default_config()
        cfg.update({"policy_frequency": 1, "duration": 20})
        return cfg


class ParkingEnvParkedVehicles(ParkingEnv):
    """parking-parked-v0 (parking_env.py:298-300)."""

    @classmethod
    def default_config(cls) -> dict:
        cfg = super().default_config()
        cfg.update({"vehicles_count": 10})
        return cfg
