"""U-Turn risk-analysis task: overtake blockers through a 180-degree turn.

TPU-native rebuild of highway_env/envs/u_turn_env.py:12-278 (u-turn-v0).
Two straight double-lane segments joined by counter-clockwise circular turn
lanes; six IDM blockers spawned at fixed stations with Gaussian jitter; all
vehicles route to node "d".

Note: the reference assigns ``ego_vehicle.PURSUIT_TAU`` (u_turn_env.py:196)
but the controller reads ``TAU_PURSUIT`` (controller.py:28,159), so the
assignment is dead code and is deliberately not reproduced.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from highwayenv_tpu.envs.base import BaseEnv, EnvState
from highwayenv_tpu.road import lane as lane_ops
from highwayenv_tpu.road.network import (
    CircularLane,
    LineType,
    RoadNetworkBuilder,
    StraightLane,
)
from highwayenv_tpu.utils.config import update_config
from highwayenv_tpu.utils.math import lmap
from highwayenv_tpu.vehicle import controller
from highwayenv_tpu.vehicle.state import KIND_EGO, KIND_IDM, empty_state


class UTurnEnv(BaseEnv):
    @classmethod
    def default_config(cls) -> dict:
        config = super().default_config()
        update_config(
            config,
            {
                "observation": {"type": "TimeToCollision", "horizon": 16},
                "action": {
                    "type": "DiscreteMetaAction",
                    "target_speeds": [8, 16, 24],
                },
                "screen_width": 789,
                "screen_height": 289,
                "duration": 10,
                "collision_reward": -1.0,
                "left_lane_reward": 0.1,
                "high_speed_reward": 0.4,
                "reward_speed_range": [8, 24],
                "normalize_reward": True,
                "offroad_terminal": False,
            },
        )
        return config

    def _build_scene(self):
        """u_turn_env.py:84-177."""
        length = 128.0
        W = 4.0  # StraightLane.DEFAULT_WIDTH
        net = RoadNetworkBuilder()
        # upper lanes after the turn, defined from x=length back to 0
        net.add_lane(
            "c", "d",
            StraightLane(
                [length, W], [0, W],
                line_types=(LineType.CONTINUOUS_LINE, LineType.STRIPED),
            ),
        )
        net.add_lane(
            "c", "d",
            StraightLane(
                [length, 0], [0, 0],
                line_types=(LineType.NONE, LineType.CONTINUOUS_LINE),
            ),
        )
        # counter-clockwise circular U-turn lanes
        center = [length, W + 20.0]
        radius = 20.0
        radii = [radius, radius + W]
        n, c, s = LineType.NONE, LineType.CONTINUOUS, LineType.STRIPED
        line = [[c, s], [n, c]]
        for lane in (0, 1):
            net.add_lane(
                "b", "c",
                CircularLane(
                    center,
                    radii[lane],
                    np.deg2rad(90),
                    np.deg2rad(-90),
                    clockwise=False,
                    line_types=line[lane],
                ),
            )
        offset = 2 * radius
        # lower lanes before the turn
        net.add_lane(
            "a", "b",
            StraightLane(
                [0, 2 * W + offset - W], [length, 2 * W + offset - W],
                line_types=(LineType.CONTINUOUS_LINE, LineType.STRIPED),
            ),
        )
        net.add_lane(
            "a", "b",
            StraightLane(
                [0, 2 * W + offset], [length, 2 * W + offset],
                line_types=(LineType.NONE, LineType.CONTINUOUS_LINE),
            ),
        )
        self.net = net
        self.geo = net.build()
        self.max_edge_lanes = 2
        self.num_slots = 7  # ego + 6 blockers
        self.ttc_grid_lanes = 2
        self.connected3 = net.connectivity_matrix(depth=3)
        self.route_slots = 3

        # spawn table (u_turn_env.py:179-274): (edge from,to,id), station, speed
        self._spawns = [
            (("a", "b", 0), 0.0, 16.0),  # ego (no jitter)
            (("a", "b", 0), 25.0, 13.5),
            (("a", "b", 1), 56.0, 14.5),
            (("b", "c", 1), 0.5, 4.5),
            (("b", "c", 0), 17.5, 5.5),
            (("c", "d", 0), 1.0, 3.5),
            (("c", "d", 1), 30.0, 5.5),
        ]
        # precompiled per-slot routes to "d"
        R = self.route_slots
        rb = np.full((self.num_slots, R), -1, np.int32)
        rn = np.zeros((self.num_slots, R), np.int32)
        rid = np.full((self.num_slots, R), -1, np.int32)
        rlen = np.zeros(self.num_slots, np.int32)
        for i, (idx, _s, _v) in enumerate(self._spawns):
            rb[i], rn[i], rid[i], rlen[i] = net.route_arrays(idx, "d", R)
        self._route = (rb, rn, rid, rlen)
        self._spawn_lane = np.array(
            [net.global_lane_index(idx) for idx, _s, _v in self._spawns], np.int32
        )
        self._spawn_s = np.array([s for _i, s, _v in self._spawns], np.float32)
        self._spawn_v = np.array([v for _i, _s, v in self._spawns], np.float32)

    def _reset_vehicles(self, key):
        V = self.num_slots
        k_pos, k_speed, k_delta = jax.random.split(key, 3)
        veh = empty_state(V, route_slots=self.route_slots)

        lane = jnp.asarray(self._spawn_lane)
        is_ego = jnp.arange(V) == 0
        # position/speed deviation 2.0 each, ego exact (u_turn_env.py:187-189)
        s = jnp.asarray(self._spawn_s) + jnp.where(
            is_ego, 0.0, 2.0 * jax.random.normal(k_pos, (V,))
        )
        speed = jnp.asarray(self._spawn_v) + jnp.where(
            is_ego, 0.0, 2.0 * jax.random.normal(k_speed, (V,))
        )
        pos = lane_ops.position(self.geo, lane, s, jnp.zeros_like(s))
        # ego heading defaults to 0 (vehicle ctor default), NPCs use
        # make_on_lane's lane heading (objects.py:69-91)
        heading = jnp.where(
            is_ego, 0.0, lane_ops.heading_at(self.geo, lane, s)
        )

        # meta-action egos index target_speeds; raw-control egos
        # keep spawn speed (plain Vehicle, action.py:129-135)
        ego_index, ego_ts = controller.ego_speed_init(self.action_type, speed)
        # only vehicle 1 calls randomize_behavior (u_turn_env.py:218)
        delta = jnp.full((V,), 4.0).at[1].set(
            jax.random.uniform(k_delta, (), minval=3.5, maxval=4.5)
        )

        rb, rn, rid, rlen = self._route
        return veh.replace(
            pos=pos.astype(jnp.float32),
            heading=heading.astype(jnp.float32),
            speed=speed.astype(jnp.float32),
            lane=lane,
            target_lane=lane,
            target_speed=jnp.where(is_ego, ego_ts, speed).astype(jnp.float32),
            speed_index=jnp.where(is_ego, ego_index, 0).astype(jnp.int32),
            timer=jnp.mod((pos[:, 0] + pos[:, 1]) * jnp.pi, 1.0).astype(jnp.float32),
            delta=delta.astype(jnp.float32),
            kind=jnp.where(is_ego, KIND_EGO, KIND_IDM).astype(jnp.int32),
            route_base=jnp.asarray(rb),
            route_n=jnp.asarray(rn),
            route_id=jnp.asarray(rid),
            route_len=jnp.asarray(rlen),
        )

    def _rewards(self, state: EnvState, action):
        """u_turn_env.py:61-72."""
        cfg = self.config
        veh = state.vehicles
        li = lane_ops._gather(self.geo, veh.lane[..., 0])
        n_neighbours = self.geo.edge_n[li]
        lane_id = self.geo.lane_id[li]
        scaled_speed = lmap(
            veh.speed[..., 0], cfg["reward_speed_range"], (0.0, 1.0)
        )
        return {
            "collision_reward": veh.crashed[..., 0].astype(jnp.float32),
            "left_lane_reward": lane_id / jnp.maximum(n_neighbours - 1, 1),
            "high_speed_reward": jnp.clip(scaled_speed, 0.0, 1.0),
            "on_road_reward": self.ego_on_road(state).astype(jnp.float32),
        }

    def _reward(self, state: EnvState, action):
        """u_turn_env.py:39-59."""
        cfg = self.config
        rewards = self._rewards(state, action)
        reward = sum(cfg.get(k, 0) * v for k, v in rewards.items())
        if cfg["normalize_reward"]:
            reward = lmap(
                reward,
                (
                    cfg["collision_reward"],
                    cfg["high_speed_reward"] + cfg["left_lane_reward"],
                ),
                (0.0, 1.0),
            )
        return reward * rewards["on_road_reward"]

    def _is_terminated(self, state: EnvState):
        return state.vehicles.crashed[..., 0]

    def _is_truncated(self, state: EnvState):
        return state.time >= self.config["duration"]
