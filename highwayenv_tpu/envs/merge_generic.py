"""Parameterized merge scenario with rejection-sampled spawns.

TPU-native rebuild of highway_env/envs/merge_env.py:193-379
(merge-generic-v0/v1): configurable lane count, segment lengths, and vehicle
count; NPC spawns rejection-sampled (10 masked tries per vehicle against a
15 m per-lane clearance).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from highwayenv_tpu.envs.merge import MergeEnv
from highwayenv_tpu.envs.base import EnvState
from highwayenv_tpu.road import lane as lane_ops
from highwayenv_tpu.road.network import (
    LineType,
    RoadNetworkBuilder,
    SineLane,
    StraightLane,
)
from highwayenv_tpu.utils.config import update_config
from highwayenv_tpu.vehicle import controller
from highwayenv_tpu.vehicle.state import (
    KIND_EGO,
    KIND_IDM,
    KIND_OBSTACLE,
    OBJECT_LENGTH,
    OBJECT_WIDTH,
    empty_state,
)


class MergeGenericEnv(MergeEnv):
    @classmethod
    def default_config(cls) -> dict:
        cfg = super().default_config()
        update_config(
            cfg,
            {
                "lanes_count": 2,
                "vehicles_count": 3,
                "before_merge_length": 150,
                "converge_merge_length": 80,
                "parallel_merge_length": 80,
                "after_merge_length": 150,
            },
        )
        return cfg

    def _build_scene(self):
        """merge_env.py:237-316."""
        cfg = self.config
        lanes = cfg["lanes_count"]
        pre = cfg["before_merge_length"]
        conv = cfg["converge_merge_length"]
        par = cfg["parallel_merge_length"]
        after = cfg["after_merge_length"]
        assert all(x > 0 for x in (pre, conv, par))
        assert after >= 90
        self.end_position = pre + conv + par + after - 90

        net = RoadNetworkBuilder.straight_road_network(
            lanes, start=0, length=pre + conv, nodes_str=("a", "b"),
            speed_limit=30,
        )
        net = RoadNetworkBuilder.straight_road_network(
            lanes, start=pre + conv, length=par, nodes_str=("b", "c"),
            speed_limit=30, net=net,
        )
        net = RoadNetworkBuilder.straight_road_network(
            lanes, start=pre + conv + par, length=after, nodes_str=("c", "d"),
            speed_limit=30, net=net,
        )

        amplitude = 3.25
        c, n = LineType.CONTINUOUS_LINE, LineType.NONE
        y_parallel = lanes * 4.0
        y_approach = y_parallel + 2 * amplitude
        ljk = StraightLane(
            [0, y_approach], [pre, y_approach],
            line_types=[c, c], forbidden=True, speed_limit=30,
        )
        lkb = SineLane(
            [pre, y_parallel + amplitude],
            [pre + conv, y_parallel + amplitude],
            amplitude, 2 * np.pi / (2 * conv), np.pi / 2,
            line_types=[c, c], forbidden=True, speed_limit=30,
        )
        lbc = StraightLane(
            [pre + conv, y_parallel],
            [pre + conv + par, y_parallel],
            line_types=[LineType.STRIPED, c], forbidden=True, speed_limit=30,
        )
        net.add_lane("j", "k", ljk)
        net.add_lane("k", "b", lkb)
        net.add_lane("b", "c", lbc)
        self.net = net
        self.geo = net.build()
        self.max_edge_lanes = lanes + 1
        self.obs_edge_lanes = lanes  # ego spawns on ("a","b") (PARITY #5)
        self._obstacle_pos = np.asarray(lbc.position(par, 0), np.float32)
        self._merge_lane = net.global_lane_index(("b", "c", lanes))
        # slots: ego + sampled NPCs + merging vehicle + obstacle
        self.num_slots = 1 + cfg["vehicles_count"] + 1 + 1
        self._ab_base = net.global_lane_index(("a", "b", 0))
        self._jk = net.global_lane_index(("j", "k", 0))
        self._max_pos = pre + conv + par

    def _reset_vehicles(self, key):
        """merge_env.py:318-369."""
        cfg = self.config
        lanes = cfg["lanes_count"]
        n_npc = cfg["vehicles_count"]
        V = self.num_slots
        veh = empty_state(V)

        pos = jnp.zeros((V, 2), jnp.float32)
        heading = jnp.zeros((V,), jnp.float32)
        speed = jnp.zeros((V,), jnp.float32)
        kind = jnp.zeros((V,), jnp.int32)

        # ego on ("a","b", lanes-1) at s=30, speed 30
        ego_long = 30.0
        ego_lane = jnp.int32(self._ab_base + lanes - 1)
        pos = pos.at[0].set(
            lane_ops.position(
                self.geo, ego_lane, jnp.float32(ego_long), jnp.float32(0.0)
            )
        )
        speed = speed.at[0].set(30.0)
        kind = kind.at[0].set(KIND_EGO)

        # rejection-sampled NPC spawns: per-lane 15 m clearance, 10 tries
        # (merge_env.py:338-358); tracked as (slot, lane, s) of placed ones
        placed_lane = jnp.full((V,), -1, jnp.int32)
        placed_s = jnp.zeros((V,), jnp.float32)
        placed_lane = placed_lane.at[0].set(lanes - 1)
        placed_s = placed_s.at[0].set(ego_long)

        keys = jax.random.split(key, n_npc * 10 + 1)
        ki = 0
        for v_i in range(n_npc):
            slot = 1 + v_i
            done = jnp.bool_(False)
            for _try in range(10):
                k_l, k_s, k_v = jax.random.split(keys[ki], 3)
                ki += 1
                lane_id = jax.random.randint(k_l, (), 0, lanes)
                s = jax.random.uniform(k_s, (), maxval=self._max_pos)
                clear = ~jnp.any(
                    (placed_lane == lane_id) & (jnp.abs(placed_s - s) <= 15.0)
                )
                ok = clear & ~done
                g = self._ab_base + lane_id
                p = lane_ops.position(self.geo, g, s, jnp.float32(0.0))
                spd = 30.0 + jax.random.uniform(k_v, (), minval=-2.0, maxval=2.0)
                pos = pos.at[slot].set(jnp.where(ok, p, pos[slot]))
                speed = speed.at[slot].set(jnp.where(ok, spd, speed[slot]))
                kind = kind.at[slot].set(
                    jnp.where(ok, KIND_IDM, kind[slot])
                )
                placed_lane = placed_lane.at[slot].set(
                    jnp.where(ok, lane_id, placed_lane[slot])
                )
                placed_s = placed_s.at[slot].set(
                    jnp.where(ok, s, placed_s[slot])
                )
                done = done | ok

        # merging vehicle on ("j","k") at ego_long+30, speed 20, target 30
        mslot = 1 + n_npc
        jk = jnp.int32(self._jk)
        pos = pos.at[mslot].set(
            lane_ops.position(
                self.geo, jk, jnp.float32(ego_long + 30.0), jnp.float32(0.0)
            )
        )
        speed = speed.at[mslot].set(20.0)
        kind = kind.at[mslot].set(KIND_IDM)

        # end-of-ramp obstacle
        pos = pos.at[mslot + 1].set(jnp.asarray(self._obstacle_pos))
        kind = kind.at[mslot + 1].set(KIND_OBSTACLE)

        lane = lane_ops.closest_lane(self.geo, pos, heading)
        # meta-action egos index target_speeds; raw-control egos
        # keep spawn speed (plain Vehicle, action.py:129-135)
        ego_index, ego_ts = controller.ego_speed_init(self.action_type, speed)
        is_ego = kind == KIND_EGO
        target_speed = jnp.where(is_ego, ego_ts, speed)
        target_speed = target_speed.at[mslot].set(30.0)
        length = jnp.where(kind == KIND_OBSTACLE, OBJECT_LENGTH, 5.0)
        width = jnp.where(kind == KIND_OBSTACLE, OBJECT_WIDTH, 2.0)

        return veh.replace(
            pos=pos,
            heading=heading,
            speed=speed,
            lane=lane,
            target_lane=lane,
            target_speed=target_speed.astype(jnp.float32),
            speed_index=jnp.where(is_ego, ego_index, 0).astype(jnp.int32),
            timer=jnp.mod((pos[:, 0] + pos[:, 1]) * jnp.pi, 1.0).astype(
                jnp.float32
            ),
            kind=kind,
            length=length.astype(jnp.float32),
            width=width.astype(jnp.float32),
        )

    def _is_terminated(self, state: EnvState):
        """merge_env.py:371-374."""
        veh = state.vehicles
        return veh.crashed[..., 0] | (
            veh.pos[..., 0, 0] > self.end_position
        )

    def _is_truncated(self, state: EnvState):
        return jnp.zeros_like(state.time, dtype=bool)
