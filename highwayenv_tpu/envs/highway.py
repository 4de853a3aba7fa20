"""Highway scenario: straight multi-lane road, IDM traffic, speed reward.

TPU-native rebuild of highway_env/envs/highway_env.py:17-183 (highway-v0 and
highway-fast-v0).  The reference's sequential ``create_random`` spawn chain
(vehicle/kinematics.py:50-104) — each vehicle placed ahead of the current
front-most — becomes a closed-form cumulative sum over per-slot random
offsets, valid because all lanes of the straight network share a common
longitudinal axis.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from highwayenv_tpu.envs.base import BaseEnv, EnvState
from highwayenv_tpu.road import lane as lane_ops
from highwayenv_tpu.road.network import RoadNetworkBuilder
from highwayenv_tpu.utils.config import update_config
from highwayenv_tpu.utils.math import lmap
from highwayenv_tpu.vehicle import controller
from highwayenv_tpu.vehicle.state import KIND_EGO, KIND_IDM, empty_state


def near_split(x, num_bins):
    """utils.py:355-370."""
    quotient, remainder = divmod(x, num_bins)
    return [quotient + 1] * remainder + [quotient] * (num_bins - remainder)


class HighwayEnv(BaseEnv):
    @classmethod
    def default_config(cls) -> dict:
        config = super().default_config()
        update_config(
            config,
            {
                "observation": {"type": "Kinematics"},
                "action": {"type": "DiscreteMetaAction"},
                "lanes_count": 4,
                "vehicles_count": 50,
                "controlled_vehicles": 1,
                "initial_lane_id": None,
                "duration": 40,
                "ego_spacing": 2,
                "vehicles_density": 1,
                "collision_reward": -1,
                "right_lane_reward": 0.1,
                "high_speed_reward": 0.4,
                "lane_change_reward": 0,
                "reward_speed_range": [20, 30],
                "normalize_reward": True,
                "offroad_terminal": False,
            },
        )
        return config

    # ------------------------------------------------------------------ #
    def _build_scene(self):
        cfg = self.config
        self.net = RoadNetworkBuilder.straight_road_network(
            cfg["lanes_count"], speed_limit=30
        )
        self.geo = self.net.build()
        self.max_edge_lanes = cfg["lanes_count"]
        self.obs_edge_lanes = cfg["lanes_count"]  # ego reset edge (PARITY #5)
        n_ctrl = cfg["controlled_vehicles"]
        self.others_per_controlled = near_split(cfg["vehicles_count"], n_ctrl)
        self.num_slots = n_ctrl + cfg["vehicles_count"]
        # creation order: [ego_0, npcs..., ego_1, npcs...] (highway_env.py:79-98)
        slots = []
        self._ego_slots = []
        for others in self.others_per_controlled:
            self._ego_slots.append(len(slots))
            slots.append("ego")
            slots.extend(["npc"] * others)
        self._is_ego_slot = np.array([s == "ego" for s in slots])
        self._npc_check_collisions = True

    @property
    def ego_slots(self):
        return tuple(self._ego_slots)

    def _reset_vehicles(self, key):
        cfg = self.config
        V = self.num_slots
        lanes = cfg["lanes_count"]
        is_ego = jnp.asarray(self._is_ego_slot)

        k_lane, k_speed, k_u, k_delta = jax.random.split(key, 4)

        lane_id = jax.random.randint(k_lane, (V,), 0, lanes)
        if cfg["initial_lane_id"] is not None:
            lane_id = jnp.where(is_ego, cfg["initial_lane_id"], lane_id)
        lane = lane_id.astype(jnp.int32)  # straight network: global id == lane id

        speed_limit = self.geo.speed_limit[lane]
        npc_speed = jax.random.uniform(
            k_speed, (V,), minval=0.7 * speed_limit, maxval=0.8 * speed_limit
        )
        speed = jnp.where(is_ego, 25.0, npc_speed)

        # create_random spawn chain (kinematics.py:91-103)
        spacing = jnp.where(is_ego, cfg["ego_spacing"], 1.0 / cfg["vehicles_density"])
        default_spacing = 12.0 + 1.0 * speed
        offset = spacing * default_spacing * jnp.exp(-5.0 / 40.0 * lanes)
        u = jax.random.uniform(k_u, (V,), minval=0.9, maxval=1.1)
        delta_x = offset * u
        delta_x = delta_x.at[0].add(3.0 * offset[0])  # empty-road head start
        x0 = jnp.cumsum(delta_x)

        pos = lane_ops.position(self.geo, lane, x0, jnp.zeros_like(x0))
        heading = lane_ops.heading_at(self.geo, lane, x0)

        veh = empty_state(V)
        # meta-action egos index target_speeds; raw-control egos
        # keep spawn speed (plain Vehicle, action.py:129-135)
        ego_index, ego_target_speed = controller.ego_speed_init(self.action_type, speed)

        veh = veh.replace(
            pos=pos.astype(jnp.float32),
            heading=heading.astype(jnp.float32),
            speed=speed.astype(jnp.float32),
            lane=lane,
            target_lane=lane,
            target_speed=jnp.where(is_ego, ego_target_speed, speed).astype(
                jnp.float32
            ),
            speed_index=jnp.where(is_ego, ego_index, 0).astype(jnp.int32),
            timer=jnp.mod(
                (pos[..., 0] + pos[..., 1]) * jnp.pi, 1.0
            ).astype(jnp.float32),
            delta=jnp.where(
                is_ego,
                4.0,
                jax.random.uniform(k_delta, (V,), minval=3.5, maxval=4.5),
            ).astype(jnp.float32),
            kind=jnp.where(is_ego, KIND_EGO, KIND_IDM).astype(jnp.int32),
            check_collisions=jnp.where(
                is_ego, True, bool(self._npc_check_collisions)
            ),
        )
        return veh

    # ------------------------------------------------------------------ #
    def _rewards(self, state: EnvState, action):
        """highway_env.py:122-139."""
        cfg = self.config
        veh = state.vehicles
        ego = self.ego_slots[0]
        li = lane_ops._gather(self.geo, veh.lane[..., ego])
        n_neighbours = self.geo.edge_n[li]
        lane = self.geo.lane_id[
            lane_ops._gather(self.geo, veh.target_lane[..., ego])
        ]
        forward_speed = veh.speed[..., ego] * jnp.cos(veh.heading[..., ego])
        scaled_speed = lmap(forward_speed, cfg["reward_speed_range"], (0.0, 1.0))
        return {
            "collision_reward": veh.crashed[..., ego].astype(jnp.float32),
            "right_lane_reward": lane / jnp.maximum(n_neighbours - 1, 1),
            "high_speed_reward": jnp.clip(scaled_speed, 0.0, 1.0),
            "on_road_reward": self.ego_on_road(state).astype(jnp.float32),
        }

    def _reward(self, state: EnvState, action):
        """highway_env.py:100-120."""
        cfg = self.config
        rewards = self._rewards(state, action)
        reward = sum(
            cfg.get(name, 0) * value for name, value in rewards.items()
        )
        if cfg["normalize_reward"]:
            reward = lmap(
                reward,
                (
                    cfg["collision_reward"],
                    cfg["high_speed_reward"] + cfg["right_lane_reward"],
                ),
                (0.0, 1.0),
            )
        reward = reward * rewards["on_road_reward"]
        return reward

    def _is_terminated(self, state: EnvState):
        veh = state.vehicles
        ego = self.ego_slots[0]
        crashed = veh.crashed[..., ego]
        if self.config["offroad_terminal"]:
            return crashed | ~self.ego_on_road(state)
        return crashed

    def _is_truncated(self, state: EnvState):
        return state.time >= self.config["duration"]


class HighwayEnvFast(HighwayEnv):
    """highway-fast-v0 (highway_env.py:154-183)."""

    @classmethod
    def default_config(cls) -> dict:
        cfg = super().default_config()
        update_config(
            cfg,
            {
                "simulation_frequency": 5,
                "lanes_count": 3,
                "vehicles_count": 20,
                "duration": 30,
                "ego_spacing": 1.5,
            },
        )
        return cfg

    def _build_scene(self):
        super()._build_scene()
        self._npc_check_collisions = False
