"""Roundabout scenario: 2-lane 8-arc circle with four sine-lane accesses.

TPU-native rebuild of highway_env/envs/roundabout_env.py:12-395
(roundabout-v0).  NPC destinations are sampled at reset among
{"exr","sxr","nxr"}; the three candidate routes per spawn are compiled
host-side and gathered by the sampled index inside the jitted reset.
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
    SineLane,
    StraightLane,
)
from highwayenv_tpu.utils.config import update_config
from highwayenv_tpu.utils.math import lmap
from highwayenv_tpu.vehicle import controller
from highwayenv_tpu.vehicle.state import KIND_EGO, KIND_IDM, empty_state


class RoundaboutEnv(BaseEnv):
    @classmethod
    def default_config(cls) -> dict:
        config = super().default_config()
        update_config(
            config,
            {
                "observation": {
                    "type": "Kinematics",
                    "absolute": True,
                    "features_range": {
                        "x": [-100, 100],
                        "y": [-100, 100],
                        "vx": [-15, 15],
                        "vy": [-15, 15],
                    },
                },
                "action": {
                    "type": "DiscreteMetaAction",
                    "target_speeds": [0, 8, 16],
                },
                "incoming_vehicle_destination": None,
                "collision_reward": -1,
                "high_speed_reward": 0.2,
                "right_lane_reward": 0,
                "lane_change_reward": -0.05,
                "screen_width": 600,
                "screen_height": 600,
                "centering_position": [0.5, 0.6],
                "duration": 11,
                "normalize_reward": True,
            },
        )
        return config

    def _build_scene(self):
        """roundabout_env.py:77-325."""
        center = [0.0, 0.0]
        radius = 20.0
        alpha = 24.0
        net = RoadNetworkBuilder()
        radii = [radius, radius + 4.0]
        n, c, s = LineType.NONE, LineType.CONTINUOUS, LineType.STRIPED
        line = [[c, s], [n, c]]
        # 8 arcs x 2 lanes; node ring se->ex->ee->nx->ne->wx->we->sx->se with
        # the reference's exact phase pairs (note the +/-180 wrap on we->sx)
        arcs = [
            ("se", "ex", 90 - alpha, alpha),
            ("ex", "ee", alpha, -alpha),
            ("ee", "nx", -alpha, -90 + alpha),
            ("nx", "ne", -90 + alpha, -90 - alpha),
            ("ne", "wx", -90 - alpha, -180 + alpha),
            ("wx", "we", -180 + alpha, -180 - alpha),
            ("we", "sx", 180 - alpha, 90 + alpha),
            ("sx", "se", 90 + alpha, 90 - alpha),
        ]
        # the reference interleaves per-lane; edge grouping here keeps both
        # lanes of an arc contiguous (global-id layout differs, graph matches)
        for f, t, p0, p1 in arcs:
            for lane in (0, 1):
                net.add_lane(
                    f, t,
                    CircularLane(
                        center,
                        radii[lane],
                        np.deg2rad(p0),
                        np.deg2rad(p1),
                        clockwise=False,
                        line_types=line[lane],
                    ),
                )

        # access roads (roundabout_env.py:182-315)
        access = 170.0
        dev = 85.0
        a = 5.0
        delta_st = 0.2 * dev
        delta_en = dev - delta_st
        w = 2 * np.pi / dev
        net.add_lane("ser", "ses",
                     StraightLane([2, access], [2, dev / 2], line_types=(s, c)))
        net.add_lane("ses", "se",
                     SineLane([2 + a, dev / 2], [2 + a, dev / 2 - delta_st],
                              a, w, -np.pi / 2, line_types=(c, c)))
        net.add_lane("sx", "sxs",
                     SineLane([-2 - a, -dev / 2 + delta_en], [-2 - a, dev / 2],
                              a, w, -np.pi / 2 + w * delta_en, line_types=(c, c)))
        net.add_lane("sxs", "sxr",
                     StraightLane([-2, dev / 2], [-2, access], line_types=(n, c)))

        net.add_lane("eer", "ees",
                     StraightLane([access, -2], [dev / 2, -2], line_types=(s, c)))
        net.add_lane("ees", "ee",
                     SineLane([dev / 2, -2 - a], [dev / 2 - delta_st, -2 - a],
                              a, w, -np.pi / 2, line_types=(c, c)))
        net.add_lane("ex", "exs",
                     SineLane([-dev / 2 + delta_en, 2 + a], [dev / 2, 2 + a],
                              a, w, -np.pi / 2 + w * delta_en, line_types=(c, c)))
        net.add_lane("exs", "exr",
                     StraightLane([dev / 2, 2], [access, 2], line_types=(n, c)))

        net.add_lane("ner", "nes",
                     StraightLane([-2, -access], [-2, -dev / 2], line_types=(s, c)))
        net.add_lane("nes", "ne",
                     SineLane([-2 - a, -dev / 2], [-2 - a, -dev / 2 + delta_st],
                              a, w, -np.pi / 2, line_types=(c, c)))
        net.add_lane("nx", "nxs",
                     SineLane([2 + a, dev / 2 - delta_en], [2 + a, -dev / 2],
                              a, w, -np.pi / 2 + w * delta_en, line_types=(c, c)))
        net.add_lane("nxs", "nxr",
                     StraightLane([2, -dev / 2], [2, -access], line_types=(n, c)))

        net.add_lane("wer", "wes",
                     StraightLane([-access, 2], [-dev / 2, 2], line_types=(s, c)))
        net.add_lane("wes", "we",
                     SineLane([-dev / 2, 2 + a], [-dev / 2 + delta_st, 2 + a],
                              a, w, -np.pi / 2, line_types=(c, c)))
        net.add_lane("wx", "wxs",
                     SineLane([dev / 2 - delta_en, -2 - a], [-dev / 2, -2 - a],
                              a, w, -np.pi / 2 + w * delta_en, line_types=(c, c)))
        net.add_lane("wxs", "wxr",
                     StraightLane([-dev / 2, -2], [-access, -2], line_types=(n, c)))

        self.net = net
        self.geo = net.build()
        self.max_edge_lanes = 2
        self.num_slots = 5
        # longest route: ("eer","ees") around the ring to "exr" = 11 segments
        self.route_slots = 11

        # spawn stations (roundabout_env.py:327-395)
        self._spawns = [
            (("we", "sx", 1), 5.0, 16.0),
            (("we", "sx", 0), 20.0, 16.0),
            (("we", "sx", 0), -20.0, 16.0),
            (("eer", "ees", 0), 50.0, 16.0),
        ]
        self._destinations = ["exr", "sxr", "nxr"]
        R = self.route_slots
        # candidate routes per NPC x destination
        n_npc = len(self._spawns)
        rb = np.full((n_npc, 3, R), -1, np.int32)
        rn = np.zeros((n_npc, 3, R), np.int32)
        rid = np.full((n_npc, 3, R), -1, np.int32)
        rlen = np.zeros((n_npc, 3), np.int32)
        for i, (idx, _s, _v) in enumerate(self._spawns):
            for d, dest in enumerate(self._destinations):
                rb[i, d], rn[i, d], rid[i, d], rlen[i, d] = net.route_arrays(
                    idx, dest, R
                )
        self._npc_routes = (rb, rn, rid, rlen)
        # ego route to "nxs" from its spawn lane
        self._ego_route = net.route_arrays(("ser", "ses", 0), "nxs", R)
        self._spawn_lane = np.array(
            [net.global_lane_index(i) for i, _s, _v in self._spawns], np.int32
        )
        self._spawn_s = np.array([s for _i, s, _v in self._spawns], np.float32)
        self._ego_lane = net.global_lane_index(("ser", "ses", 0))

    def _reset_vehicles(self, key):
        V = self.num_slots
        k_pos, k_speed, k_dest, k_delta = jax.random.split(key, 4)
        veh = empty_state(V, route_slots=self.route_slots)
        is_ego = jnp.arange(V) == 0

        # ego (roundabout_env.py:334-349)
        ego_lane = jnp.int32(self._ego_lane)
        ego_pos = lane_ops.position(
            self.geo, ego_lane, jnp.float32(125.0), jnp.float32(0.0)
        )
        ego_heading = lane_ops.heading_at(self.geo, ego_lane, jnp.float32(140.0))

        # NPCs: make_on_lane with gaussian jitter (roundabout_env.py:352-395)
        npc_s = jnp.asarray(self._spawn_s) + 2.0 * jax.random.normal(k_pos, (4,))
        npc_speed = 16.0 + 2.0 * jax.random.normal(k_speed, (4,))
        npc_lane = jnp.asarray(self._spawn_lane)
        npc_pos = lane_ops.position(self.geo, npc_lane, npc_s, jnp.zeros(4))
        npc_heading = lane_ops.heading_at(self.geo, npc_lane, npc_s)

        pos = jnp.concatenate([ego_pos[None], npc_pos], axis=0)
        heading = jnp.concatenate([ego_heading[None], npc_heading])
        speed = jnp.concatenate([jnp.float32(8.0)[None], npc_speed])
        lane = lane_ops.closest_lane(self.geo, pos, heading)

        # destination choice: NPC0 honours incoming_vehicle_destination
        dest = jax.random.randint(k_dest, (4,), 0, 3)
        ivd = self.config["incoming_vehicle_destination"]
        if ivd is not None:
            dest = dest.at[0].set(int(ivd))

        rb, rn, rid, rlen = self._npc_routes
        npc_i = jnp.arange(4)
        route_base = jnp.asarray(rb)[npc_i, dest]  # (4, R)
        route_n = jnp.asarray(rn)[npc_i, dest]
        route_id = jnp.asarray(rid)[npc_i, dest]
        route_len = jnp.asarray(rlen)[npc_i, dest]

        erb, ern, erid, erlen = self._ego_route
        route_base = jnp.concatenate([jnp.asarray(erb)[None], route_base])
        route_n = jnp.concatenate([jnp.asarray(ern)[None], route_n])
        route_id = jnp.concatenate([jnp.asarray(erid)[None], route_id])
        route_len = jnp.concatenate(
            [jnp.asarray(erlen, jnp.int32)[None], route_len]
        )

        # meta-action egos index target_speeds; raw-control egos
        # keep spawn speed (plain Vehicle, action.py:129-135)
        ego_index, ego_ts = controller.ego_speed_init(self.action_type, speed)
        delta = jnp.where(
            is_ego, 4.0, jax.random.uniform(k_delta, (V,), minval=3.5, maxval=4.5)
        )

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
            route_base=route_base,
            route_n=route_n,
            route_id=route_id,
            route_len=route_len,
        )

    def _rewards(self, state: EnvState, action):
        """roundabout_env.py:57-65: speed index over the DEFAULT 3-speed grid."""
        veh = state.vehicles
        return {
            "collision_reward": veh.crashed[..., 0].astype(jnp.float32),
            "high_speed_reward": veh.speed_index[..., 0]
            / (len(controller.DEFAULT_TARGET_SPEEDS) - 1),
            "lane_change_reward": ((action == 0) | (action == 2)).astype(
                jnp.float32
            ),
            "on_road_reward": self.ego_on_road(state).astype(jnp.float32),
        }

    def _reward(self, state: EnvState, action):
        """roundabout_env.py:44-55."""
        cfg = self.config
        rewards = self._rewards(state, action)
        reward = sum(cfg.get(k, 0) * v for k, v in rewards.items())
        if cfg["normalize_reward"]:
            reward = lmap(
                reward,
                (cfg["collision_reward"], cfg["high_speed_reward"]),
                (0.0, 1.0),
            )
        return reward * rewards["on_road_reward"]

    def _is_terminated(self, state: EnvState):
        return state.vehicles.crashed[..., 0]

    def _is_truncated(self, state: EnvState):
        return state.time >= self.config["duration"]
