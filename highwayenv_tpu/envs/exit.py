"""Exit scenario: reach the motorway off-ramp at high speed.

TPU-native rebuild of highway_env/envs/exit_env.py:15-203 (exit-v0):
6 straight lanes -> +1 exit-approach lane segment -> circular off-ramp with
per-lane speed limits 26 - 3.4*id; NPCs spawn on lane ids drawn with
p proportional to the id, route to node "3", lane changes disabled.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from highwayenv_tpu.envs.base import EnvState
from highwayenv_tpu.envs.highway import HighwayEnv
from highwayenv_tpu.road import lane as lane_ops
from highwayenv_tpu.road.network import CircularLane, RoadNetworkBuilder
from highwayenv_tpu.utils.config import update_config
from highwayenv_tpu.utils.math import lmap
from highwayenv_tpu.vehicle import controller
from highwayenv_tpu.vehicle.state import KIND_EGO, KIND_IDM, empty_state


class ExitEnv(HighwayEnv):
    @classmethod
    def default_config(cls) -> dict:
        config = super().default_config()
        update_config(
            config,
            {
                "observation": {
                    "type": "ExitObservation",
                    "vehicles_count": 15,
                    "features": ["presence", "x", "y", "vx", "vy", "cos_h", "sin_h"],
                    "clip": False,
                },
                "action": {
                    "type": "DiscreteMetaAction",
                    "target_speeds": [18, 24, 30],
                },
                "lanes_count": 6,
                "collision_reward": 0,
                "high_speed_reward": 0.1,
                "right_lane_reward": 0,
                "normalize_reward": True,
                "goal_reward": 1,
                "vehicles_count": 20,
                "vehicles_density": 1.5,
                "controlled_vehicles": 1,
                "duration": 18,
                "simulation_frequency": 5,
                "scaling": 5,
            },
        )
        return config

    def _build_scene(self):
        """exit_env.py:56-107."""
        cfg = self.config
        n_lanes = cfg["lanes_count"]
        road_length, exit_position, exit_length = 1000.0, 400.0, 100.0
        net = RoadNetworkBuilder.straight_road_network(
            n_lanes, start=0, length=exit_position, nodes_str=("0", "1")
        )
        net = RoadNetworkBuilder.straight_road_network(
            n_lanes + 1,
            start=exit_position,
            length=exit_length,
            nodes_str=("1", "2"),
            net=net,
        )
        net = RoadNetworkBuilder.straight_road_network(
            n_lanes,
            start=exit_position + exit_length,
            length=road_length - exit_position - exit_length,
            nodes_str=("2", "3"),
            net=net,
        )
        # per-lane speed limits 26 - 3.4*id (exit_env.py:79-82)
        for lanes in net.edges.values():
            for _id, lane in enumerate(lanes):
                lane.speed_limit = 26 - 3.4 * _id
        exit_pos = np.array(
            [exit_position + exit_length, n_lanes * 4.0]
        )
        radius = 150.0
        exit_center = exit_pos + np.array([0.0, radius])
        net.add_lane(
            "2",
            "exit",
            CircularLane(
                center=exit_center,
                radius=radius,
                start_phase=3 * np.pi / 2,
                end_phase=2 * np.pi,
                forbidden=True,
                speed_limit=26 - 3.4 * 0,
            ),
        )
        self.net = net
        self.geo = net.build()
        self.max_edge_lanes = n_lanes + 1
        self.obs_edge_lanes = n_lanes  # ego spawns on ("0","1") (PARITY #5)
        self.num_slots = cfg["controlled_vehicles"] + cfg["vehicles_count"]
        self._ego_slots = [0]
        self.route_slots = 3
        # goal lanes for _is_success (exit_env.py:180-191)
        self.goal_lane_approach = net.global_lane_index(("1", "2", n_lanes))
        self.goal_lane_exit = net.global_lane_index(("2", "exit", 0))
        self.exit_obs_lane = net.global_lane_index(("1", "2", n_lanes))
        # NPC route to "3" from edge ("0","1") — same for all spawn lane ids
        self._npc_route = self.net.route_arrays(("0", "1", 0), "3", self.route_slots)

    def _build_spaces(self):
        from highwayenv_tpu.factories import action_factory, observation_factory

        self.action_type = action_factory(self.config["action"])
        obs_cfg = dict(self.config["observation"])
        if obs_cfg.get("type") == "ExitObservation":
            obs_cfg["exit_lane"] = self.exit_obs_lane
        self.observation_type = observation_factory(self, obs_cfg)

    def _reset_vehicles(self, key):
        """exit_env.py:109-143."""
        cfg = self.config
        V = self.num_slots
        n_lanes = cfg["lanes_count"]
        is_ego = jnp.arange(V) == 0

        k_lane, k_u = jax.random.split(key)

        # NPC lane ids ~ p proportional to the id (exit_env.py:129-132)
        lanes = np.arange(n_lanes)
        p = lanes / lanes.sum()
        lane_id = jax.random.choice(
            k_lane, jnp.asarray(lanes), (V,), p=jnp.asarray(p)
        ).astype(jnp.int32)
        lane_id = jnp.where(is_ego, 0, lane_id)
        lane = lane_id  # edge ("0","1") occupies global ids [0, n_lanes)

        speed_limit = self.geo.speed_limit[lane]
        speed = jnp.where(is_ego, 25.0, speed_limit)

        # create_random spawn chain (kinematics.py:91-103); all spawns share
        # the ("0","1") longitudinal axis so the chain is a cumulative sum
        spacing = jnp.where(is_ego, cfg["ego_spacing"], 1.0 / cfg["vehicles_density"])
        default_spacing = 12.0 + 1.0 * speed
        offset = spacing * default_spacing * jnp.exp(-5.0 / 40.0 * n_lanes)
        u = jax.random.uniform(k_u, (V,), minval=0.9, maxval=1.1)
        delta_x = offset * u
        delta_x = delta_x.at[0].add(3.0 * offset[0])
        x0 = jnp.cumsum(delta_x)

        pos = lane_ops.position(self.geo, lane, x0, jnp.zeros_like(x0))
        heading = lane_ops.heading_at(self.geo, lane, x0)
        # RoadObject.__init__ localizes by closest lane — spawns past the
        # ("0","1") end land on the ("1","2") edge (objects.py:46)
        lane = lane_ops.closest_lane(self.geo, pos, heading)

        veh = empty_state(V, route_slots=self.route_slots)
        # meta-action egos index target_speeds; raw-control egos
        # keep spawn speed (plain Vehicle, action.py:129-135)
        ego_index, ego_ts = controller.ego_speed_init(self.action_type, speed)

        rb, rn, rid, rlen = self._npc_route
        route_base = jnp.broadcast_to(jnp.asarray(rb), (V, self.route_slots))
        route_n = jnp.broadcast_to(jnp.asarray(rn), (V, self.route_slots))
        # first route entry carries the spawn lane's explicit id
        route_id = jnp.broadcast_to(jnp.asarray(rid), (V, self.route_slots))
        route_id = route_id.at[:, 0].set(lane_id)
        route_len = jnp.where(is_ego, 0, rlen).astype(jnp.int32)

        return veh.replace(
            pos=pos.astype(jnp.float32),
            heading=heading.astype(jnp.float32),
            speed=speed.astype(jnp.float32),
            lane=lane,
            target_lane=lane,
            target_speed=jnp.where(is_ego, ego_ts, speed).astype(jnp.float32),
            speed_index=jnp.where(is_ego, ego_index, 0).astype(jnp.int32),
            timer=jnp.mod((pos[:, 0] + pos[:, 1]) * jnp.pi, 1.0).astype(jnp.float32),
            kind=jnp.where(is_ego, KIND_EGO, KIND_IDM).astype(jnp.int32),
            enable_lane_change=is_ego,  # NPCs frozen (exit_env.py:142)
            route_base=route_base,
            route_n=route_n,
            route_id=route_id,
            route_len=route_len,
        )

    def _is_success(self, state: EnvState):
        """exit_env.py:180-191 (on the ego's target lane)."""
        tgt = state.vehicles.target_lane[..., 0]
        return (tgt == self.goal_lane_approach) | (tgt == self.goal_lane_exit)

    def _rewards(self, state: EnvState, action):
        """exit_env.py:164-178."""
        cfg = self.config
        veh = state.vehicles
        tgt = lane_ops._gather(self.geo, veh.target_lane[..., 0])
        scaled_speed = lmap(
            veh.speed[..., 0], cfg["reward_speed_range"], (0.0, 1.0)
        )
        return {
            "collision_reward": veh.crashed[..., 0].astype(jnp.float32),
            "goal_reward": self._is_success(state).astype(jnp.float32),
            "high_speed_reward": jnp.clip(scaled_speed, 0.0, 1.0),
            "right_lane_reward": self.geo.lane_id[tgt].astype(jnp.float32),
        }

    def _reward(self, state: EnvState, action):
        """exit_env.py:145-162."""
        cfg = self.config
        reward = sum(
            cfg.get(k, 0) * v for k, v in self._rewards(state, action).items()
        )
        if cfg["normalize_reward"]:
            reward = lmap(
                reward, (cfg["collision_reward"], cfg["goal_reward"]), (0.0, 1.0)
            )
            reward = jnp.clip(reward, 0.0, 1.0)
        return reward

    def _info(self, state: EnvState, action):
        info = super()._info(state, action)
        info["is_success"] = self._is_success(state)
        return info

    def _is_terminated(self, state: EnvState):
        return state.vehicles.crashed[..., 0]

    def _is_truncated(self, state: EnvState):
        return state.time >= self.config["duration"]
