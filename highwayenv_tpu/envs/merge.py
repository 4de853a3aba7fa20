"""Merge scenario: highway + sine-curved access ramp with an end obstacle.

TPU-native rebuild of highway_env/envs/merge_env.py:15-190 (merge-v0/v1).
Fixed spawn layout with small uniform jitter; the altruistic
merging-speed penalty sums over controlled-type vehicles on the ramp's
continuation lane.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from highwayenv_tpu.envs.base import BaseEnv, EnvState
from highwayenv_tpu.road import lane as lane_ops
from highwayenv_tpu.road.network import (
    LineType,
    RoadNetworkBuilder,
    SineLane,
    StraightLane,
)
from highwayenv_tpu.utils.config import update_config
from highwayenv_tpu.utils.math import lmap
from highwayenv_tpu.vehicle import controller
from highwayenv_tpu.vehicle.state import (
    KIND_EGO,
    KIND_IDM,
    KIND_OBSTACLE,
    OBJECT_LENGTH,
    OBJECT_WIDTH,
    empty_state,
)


class MergeEnv(BaseEnv):
    @classmethod
    def default_config(cls) -> dict:
        cfg = super().default_config()
        update_config(
            cfg,
            {
                "collision_reward": -1,
                "right_lane_reward": 0.1,
                "high_speed_reward": 0.2,
                "reward_speed_range": [20, 30],
                "merging_speed_reward": -0.5,
                "lane_change_reward": -0.05,
            },
        )
        return cfg

    def _build_scene(self):
        """Road layout of merge_env.py:90-159."""
        net = RoadNetworkBuilder()
        ends = [150, 80, 80, 150]  # before, converging, merge, after
        c, s, n = LineType.CONTINUOUS_LINE, LineType.STRIPED, LineType.NONE
        y = [0, 4.0]
        line_type = [[c, s], [n, c]]
        line_type_merge = [[c, s], [n, s]]
        for i in range(2):
            net.add_lane(
                "a", "b",
                StraightLane([0, y[i]], [sum(ends[:2]), y[i]], line_types=line_type[i]),
            )
            net.add_lane(
                "b", "c",
                StraightLane(
                    [sum(ends[:2]), y[i]], [sum(ends[:3]), y[i]],
                    line_types=line_type_merge[i],
                ),
            )
            net.add_lane(
                "c", "d",
                StraightLane([sum(ends[:3]), y[i]], [sum(ends), y[i]], line_types=line_type[i]),
            )

        amplitude = 3.25
        ljk = StraightLane(
            [0, 6.5 + 4 + 4], [ends[0], 6.5 + 4 + 4], line_types=[c, c], forbidden=True
        )
        lkb = SineLane(
            ljk.position(ends[0], -amplitude),
            ljk.position(sum(ends[:2]), -amplitude),
            amplitude,
            2 * np.pi / (2 * ends[1]),
            np.pi / 2,
            line_types=[c, c],
            forbidden=True,
        )
        lbc = StraightLane(
            lkb.position(ends[1], 0),
            lkb.position(ends[1], 0) + np.array([ends[2], 0]),
            line_types=[n, c],
            forbidden=True,
        )
        net.add_lane("j", "k", ljk)
        net.add_lane("k", "b", lkb)
        net.add_lane("b", "c", lbc)
        self.net = net
        self.geo = net.build()
        self.max_edge_lanes = 3
        self.obs_edge_lanes = 2  # ego spawns on ("a","b"), 2 lanes (PARITY #5)
        self._obstacle_pos = np.asarray(lbc.position(ends[2], 0), np.float32)
        self._merge_lane = net.global_lane_index(("b", "c", 2))
        self._ego_spawn = net.get_lane(("a", "b", 1))
        # slots: ego, 3 highway NPCs, merging NPC, end-of-ramp obstacle
        self.num_slots = 6

    def _reset_vehicles(self, key):
        """merge_env.py:161-186."""
        V = self.num_slots
        k_lane, k_pos, k_speed = jax.random.split(key, 3)
        veh = empty_state(V)

        pos = jnp.zeros((V, 2), jnp.float32)
        heading = jnp.zeros((V,), jnp.float32)
        speed = jnp.zeros((V,), jnp.float32)

        # ego on ("a","b",1) at s=30, speed 30
        ego_lane_global = self.net.global_lane_index(("a", "b", 1))
        pos = pos.at[0].set(
            jnp.asarray(self._ego_spawn.position(30.0, 0.0), jnp.float32)
        )
        speed = speed.at[0].set(30.0)

        # three highway NPCs at s in {90,70,5}+U(-5,5) on random lane of (a,b)
        base_s = jnp.asarray([90.0, 70.0, 5.0])
        base_v = jnp.asarray([29.0, 31.0, 31.5])
        lanes = jax.random.randint(k_lane, (3,), 0, 2)  # global ids 0/1 == (a,b,0/1)
        s_npc = base_s + jax.random.uniform(k_pos, (3,), minval=-5.0, maxval=5.0)
        v_npc = base_v + jax.random.uniform(k_speed, (3,), minval=-1.0, maxval=1.0)
        npc_pos = lane_ops.position(self.geo, lanes, s_npc, jnp.zeros(3))
        npc_heading = lane_ops.heading_at(self.geo, lanes, s_npc)
        pos = pos.at[1:4].set(npc_pos.astype(jnp.float32))
        heading = heading.at[1:4].set(npc_heading.astype(jnp.float32))
        speed = speed.at[1:4].set(v_npc)

        # merging NPC on ("j","k",0) at s=110, speed 20, target_speed 30
        jk = self.net.global_lane_index(("j", "k", 0))
        merge_lane_arr = jnp.int32(jk)
        mpos = lane_ops.position(
            self.geo, merge_lane_arr, jnp.float32(110.0), jnp.float32(0.0)
        )
        mheading = lane_ops.heading_at(self.geo, merge_lane_arr, jnp.float32(110.0))
        pos = pos.at[4].set(mpos.astype(jnp.float32))
        heading = heading.at[4].set(mheading.astype(jnp.float32))
        speed = speed.at[4].set(20.0)

        # end-of-ramp obstacle (merge_env.py:158)
        pos = pos.at[5].set(jnp.asarray(self._obstacle_pos))

        kind = jnp.asarray(
            [KIND_EGO, KIND_IDM, KIND_IDM, KIND_IDM, KIND_IDM, KIND_OBSTACLE],
            jnp.int32,
        )
        lane = lane_ops.closest_lane(self.geo, pos, heading)
        # meta-action egos index target_speeds; raw-control egos
        # keep spawn speed (plain Vehicle, action.py:129-135)
        ego_index, ego_ts = controller.ego_speed_init(self.action_type, speed)
        is_ego = kind == KIND_EGO
        target_speed = jnp.where(is_ego, ego_ts, speed)
        target_speed = target_speed.at[4].set(30.0)  # merging_v.target_speed = 30

        length = jnp.where(kind == KIND_OBSTACLE, OBJECT_LENGTH, 5.0)
        width = jnp.where(kind == KIND_OBSTACLE, OBJECT_WIDTH, 2.0)

        del ego_lane_global
        return veh.replace(
            pos=pos,
            heading=heading,
            speed=speed,
            lane=lane,
            target_lane=lane,
            target_speed=target_speed.astype(jnp.float32),
            speed_index=jnp.where(is_ego, ego_index, 0).astype(jnp.int32),
            timer=jnp.mod((pos[:, 0] + pos[:, 1]) * jnp.pi, 1.0).astype(jnp.float32),
            kind=kind,
            length=length.astype(jnp.float32),
            width=width.astype(jnp.float32),
        )

    # ------------------------------------------------------------------ #
    def _rewards(self, state: EnvState, action):
        """merge_env.py:62-77."""
        veh = state.vehicles
        ego = 0
        scaled_speed = lmap(
            veh.speed[..., ego], self.config["reward_speed_range"], (0.0, 1.0)
        )
        lane_id = self.geo.lane_id[lane_ops._gather(self.geo, veh.lane[..., ego])]
        on_merge = (
            (veh.lane == self._merge_lane) & veh.is_controlled & veh.active
        )
        penalty_terms = jnp.where(
            on_merge & (veh.target_speed != 0.0),
            (veh.target_speed - veh.speed) / jnp.where(
                veh.target_speed != 0.0, veh.target_speed, 1.0
            ),
            0.0,
        )
        action = jnp.asarray(action)
        return {
            "collision_reward": veh.crashed[..., ego].astype(jnp.float32),
            "right_lane_reward": lane_id.astype(jnp.float32) / 1.0,
            "high_speed_reward": scaled_speed,
            "lane_change_reward": ((action == 0) | (action == 2)).astype(jnp.float32),
            "merging_speed_reward": jnp.sum(penalty_terms, axis=-1),
        }

    def _reward(self, state: EnvState, action):
        cfg = self.config
        rewards = self._rewards(state, action)
        reward = sum(cfg.get(name, 0) * v for name, v in rewards.items())
        return lmap(
            reward,
            (
                cfg["collision_reward"] + cfg["merging_speed_reward"],
                cfg["high_speed_reward"] + cfg["right_lane_reward"],
            ),
            (0.0, 1.0),
        )

    def _is_terminated(self, state: EnvState):
        veh = state.vehicles
        return veh.crashed[..., 0] | (veh.pos[..., 0, 0] > 370.0)

    def _is_truncated(self, state: EnvState):
        return jnp.zeros_like(state.time, dtype=bool)
