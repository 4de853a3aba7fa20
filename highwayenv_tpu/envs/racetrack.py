"""Racetrack: closed loop of 2-lane straight+circular segments, lateral-only
continuous control, occupancy-grid observation.

TPU-native rebuild of highway_env/envs/racetrack_env.py:15-437
(racetrack-v0).  The hand-built track geometry (racetrack_env.py:97-372) is
reproduced segment by segment.
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
from highwayenv_tpu.vehicle.state import KIND_EGO, KIND_IDM, KIND_PAD, empty_state


def _racetrack_network() -> RoadNetworkBuilder:
    """The 8-section track (racetrack_env.py:97-372)."""
    net = RoadNetworkBuilder()
    c, s, n = LineType.CONTINUOUS, LineType.STRIPED, LineType.NONE
    sl = 10.0
    # 1 - straight
    net.add_lane("a", "b", StraightLane([42, 0], [100, 0], width=5,
                                        line_types=(c, s), speed_limit=sl))
    net.add_lane("a", "b", StraightLane([42, 5], [100, 5], width=5,
                                        line_types=(s, c), speed_limit=sl))
    # 2 - arc 1
    net.add_lane("b", "c", CircularLane([100, -20], 20, np.deg2rad(90),
                                        np.deg2rad(-1), width=5, clockwise=False,
                                        line_types=(c, n), speed_limit=sl))
    net.add_lane("b", "c", CircularLane([100, -20], 25, np.deg2rad(90),
                                        np.deg2rad(-1), width=5, clockwise=False,
                                        line_types=(s, c), speed_limit=sl))
    # 3 - vertical straight
    net.add_lane("c", "d", StraightLane([120, -20], [120, -30], width=5,
                                        line_types=(c, n), speed_limit=sl))
    net.add_lane("c", "d", StraightLane([125, -20], [125, -30], width=5,
                                        line_types=(s, c), speed_limit=sl))
    # 4 - arc 2
    net.add_lane("d", "e", CircularLane([105, -30], 15, np.deg2rad(0),
                                        np.deg2rad(-181), width=5, clockwise=False,
                                        line_types=(c, n), speed_limit=sl))
    net.add_lane("d", "e", CircularLane([105, -30], 20, np.deg2rad(0),
                                        np.deg2rad(-181), width=5, clockwise=False,
                                        line_types=(s, c), speed_limit=sl))
    # 5 - arc 3 (clockwise)
    net.add_lane("e", "f", CircularLane([70, -30], 20, np.deg2rad(0),
                                        np.deg2rad(136), width=5, clockwise=True,
                                        line_types=(c, s), speed_limit=sl))
    net.add_lane("e", "f", CircularLane([70, -30], 15, np.deg2rad(0),
                                        np.deg2rad(137), width=5, clockwise=True,
                                        line_types=(n, c), speed_limit=sl))
    # 6 - slant
    net.add_lane("f", "g", StraightLane([55.7, -15.7], [35.7, -35.7], width=5,
                                        line_types=(c, n), speed_limit=sl))
    net.add_lane("f", "g", StraightLane([59.3934, -19.2], [39.3934, -39.2],
                                        width=5, line_types=(s, c), speed_limit=sl))
    # 7 - arc 4 (two sections)
    net.add_lane("g", "h", CircularLane([18.1, -18.1], 25, np.deg2rad(315),
                                        np.deg2rad(170), width=5, clockwise=False,
                                        line_types=(c, n), speed_limit=sl))
    net.add_lane("g", "h", CircularLane([18.1, -18.1], 30, np.deg2rad(315),
                                        np.deg2rad(165), width=5, clockwise=False,
                                        line_types=(s, c), speed_limit=sl))
    net.add_lane("h", "i", CircularLane([18.1, -18.1], 25, np.deg2rad(170),
                                        np.deg2rad(56), width=5, clockwise=False,
                                        line_types=(c, n), speed_limit=sl))
    net.add_lane("h", "i", CircularLane([18.1, -18.1], 30, np.deg2rad(170),
                                        np.deg2rad(58), width=5, clockwise=False,
                                        line_types=(s, c), speed_limit=sl))
    # 8 - arc 5, reconnects to start (clockwise)
    net.add_lane("i", "a", CircularLane([43.2, 23.4], 23.5, np.deg2rad(240),
                                        np.deg2rad(270), width=5, clockwise=True,
                                        line_types=(c, s), speed_limit=sl))
    net.add_lane("i", "a", CircularLane([43.2, 23.4], 18.5, np.deg2rad(238),
                                        np.deg2rad(268), width=5, clockwise=True,
                                        line_types=(n, c), speed_limit=sl))
    return net


class RacetrackEnv(BaseEnv):
    @classmethod
    def default_config(cls) -> dict:
        config = super().default_config()
        update_config(
            config,
            {
                "observation": {
                    "type": "OccupancyGrid",
                    "features": ["presence", "on_road"],
                    "grid_size": [[-18, 18], [-18, 18]],
                    "grid_step": [3, 3],
                    "as_image": False,
                    "align_to_vehicle_axes": True,
                },
                "action": {
                    "type": "ContinuousAction",
                    "longitudinal": False,
                    "lateral": True,
                    "target_speeds": [0, 5, 10],
                },
                "simulation_frequency": 15,
                "policy_frequency": 5,
                "duration": 300,
                "collision_reward": -1,
                "lane_centering_cost": 4,
                "lane_centering_reward": 1,
                "action_reward": -0.3,
                "controlled_vehicles": 1,
                "other_vehicles": 1,
                "screen_width": 600,
                "screen_height": 600,
                "centering_position": [0.5, 0.5],
                "speed_limit": 10.0,
                "terminate_off_road": True,
            },
        )
        return config

    def _make_network(self) -> RoadNetworkBuilder:
        return _racetrack_network()

    def _build_scene(self):
        cfg = self.config
        self.net = self._make_network()
        self.geo = self.net.build()
        self.max_edge_lanes = max(
            len(v) for v in self.net.edges.values()
        )
        n_ctrl = cfg["controlled_vehicles"]
        self.num_slots = n_ctrl + max(cfg["other_vehicles"], 1)
        self._ego_slots = list(range(n_ctrl))
        # lane ids of the ("a","b") and ("b","c") edges for spawning
        self._ab_base = self.net.global_lane_index(("a", "b", 0))
        self._ab_lanes = len(self.net.lanes_on_edge("a", "b"))
        self._bc_base = self.net.global_lane_index(("b", "c", 0))

    @property
    def ego_slots(self):
        return tuple(self._ego_slots)

    def _reset_vehicles(self, key):
        """racetrack_env.py:374-437."""
        cfg = self.config
        V = self.num_slots
        n_ctrl = cfg["controlled_vehicles"]
        n_other = cfg["other_vehicles"]
        L = self.geo.num_lanes
        veh = empty_state(V)

        keys = jax.random.split(key, 6)

        # controlled vehicles: first on a random ("a","b") lane, rest anywhere
        ego_lane = jnp.where(
            jnp.arange(n_ctrl) == 0,
            self._ab_base
            + jax.random.randint(keys[0], (n_ctrl,), 0, self._ab_lanes),
            jax.random.randint(keys[0], (n_ctrl,), 0, L),
        ).astype(jnp.int32)
        ego_s = jax.random.uniform(keys[1], (n_ctrl,), minval=20.0, maxval=50.0)
        # make_on_lane(speed=None) -> lane speed_limit (objects.py:69-91)
        ego_speed = self.geo.speed_limit[ego_lane]

        # front NPC on ("b","c", ego lane id), s ~ U(0, len(bc0))
        front_lane = self._bc_base + (ego_lane[0] - self._ab_base)
        bc_len = float(self.net.get_lane(("b", "c", 0)).length)
        front_s = jax.random.uniform(keys[2], (), maxval=bc_len)
        front_speed = 6.0 + jax.random.uniform(keys[3], (), maxval=3.0)

        # extra NPCs: count ~ randint(other_vehicles), random lanes
        n_extra = max(n_other - 1, 0)
        extra_count = jax.random.randint(keys[4], (), 0, max(n_other, 1))
        if n_extra:
            ke1, ke2, ke3 = jax.random.split(keys[5], 3)
            extra_lane = jax.random.randint(ke1, (n_extra,), 0, L)
            extra_len = self.geo.length[extra_lane]
            extra_s = jax.random.uniform(ke2, (n_extra,)) * extra_len
            extra_speed = 6.0 + jax.random.uniform(ke3, (n_extra,), maxval=3.0)
            extra_on = jnp.arange(n_extra) < extra_count
        else:
            extra_lane = jnp.zeros((0,), jnp.int32)
            extra_s = jnp.zeros((0,))
            extra_speed = jnp.zeros((0,))
            extra_on = jnp.zeros((0,), bool)

        lane = jnp.concatenate(
            [ego_lane, front_lane[None], extra_lane]
        ).astype(jnp.int32)
        s = jnp.concatenate([ego_s, front_s[None], extra_s])
        speed = jnp.concatenate([ego_speed, front_speed[None], extra_speed])
        pos = lane_ops.position(self.geo, lane, s, jnp.zeros_like(s))
        heading = lane_ops.heading_at(self.geo, lane, s)

        n_veh = n_ctrl + 1 + n_extra  # may be < V (e.g. oval roadblock slots)
        kind = jnp.concatenate(
            [
                jnp.full((n_ctrl,), KIND_EGO, jnp.int32),
                jnp.full((1,), KIND_IDM, jnp.int32),
                jnp.where(extra_on, KIND_IDM, KIND_PAD).astype(jnp.int32),
            ]
        )
        # "prevent early collisions": drop extras within 20 m of anyone
        # earlier (racetrack_env.py:429-434)
        d = jnp.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
        earlier = (jnp.arange(n_veh)[None, :] < jnp.arange(n_veh)[:, None]) & (
            kind[None, :] != KIND_PAD
        )
        too_close = jnp.any(earlier & (d < 20.0), axis=-1)
        is_extra = jnp.arange(n_veh) >= n_ctrl + 1
        kind = jnp.where(is_extra & too_close, KIND_PAD, kind)

        i = slice(0, n_veh)
        return veh.replace(
            pos=veh.pos.at[i].set(pos.astype(jnp.float32)),
            heading=veh.heading.at[i].set(heading.astype(jnp.float32)),
            speed=veh.speed.at[i].set(speed.astype(jnp.float32)),
            lane=veh.lane.at[i].set(lane),
            target_lane=veh.target_lane.at[i].set(lane),
            target_speed=veh.target_speed.at[i].set(speed.astype(jnp.float32)),
            timer=veh.timer.at[i].set(
                jnp.mod((pos[:, 0] + pos[:, 1]) * jnp.pi, 1.0).astype(jnp.float32)
            ),
            kind=veh.kind.at[i].set(kind),
        )

    def _rewards(self, state: EnvState, action):
        """racetrack_env.py:75-84."""
        veh = state.vehicles
        ego = self.ego_slots[0]
        _, lat = lane_ops.local_coordinates(
            self.geo, veh.lane[..., ego], veh.pos[..., ego, :]
        )
        return {
            "lane_centering_reward": 1.0
            / (1.0 + self.config["lane_centering_cost"] * lat**2),
            "action_reward": jnp.linalg.norm(
                jnp.atleast_1d(jnp.asarray(action, jnp.float32)), axis=-1
            ),
            "collision_reward": veh.crashed[..., ego].astype(jnp.float32),
            "on_road_reward": self.ego_on_road(state).astype(jnp.float32),
        }

    def _reward(self, state: EnvState, action):
        """racetrack_env.py:66-73."""
        cfg = self.config
        rewards = self._rewards(state, action)
        reward = sum(cfg.get(k, 0) * v for k, v in rewards.items())
        reward = lmap(reward, (cfg["collision_reward"], 1.0), (0.0, 1.0))
        return reward * rewards["on_road_reward"]

    def _is_terminated(self, state: EnvState):
        crashed = state.vehicles.crashed[..., self.ego_slots[0]]
        if self.config["terminate_off_road"]:
            return crashed | ~self.ego_on_road(state)
        return crashed

    def _is_truncated(self, state: EnvState):
        return state.time >= self.config["duration"]


class RacetrackEnvLarge(RacetrackEnv):
    """racetrack-large: 3-lane map (racetrack_env.py:432-877), built from the
    extracted geometry table (see scripts/extract_racetrack_large.py)."""

    def _make_network(self) -> RoadNetworkBuilder:
        from highwayenv_tpu.envs._racetrack_large_data import (
            RACETRACK_LARGE_LANES,
        )

        net = RoadNetworkBuilder()
        for f, t, kind, params, lt, sl, width in RACETRACK_LARGE_LANES:
            if kind == "straight":
                start, end = params
                net.add_lane(
                    f, t,
                    StraightLane(start, end, width=width, line_types=lt,
                                 speed_limit=sl),
                )
            else:
                center, radius, p0, p1, cw = params
                net.add_lane(
                    f, t,
                    CircularLane(center, radius, p0, p1, clockwise=cw,
                                 width=width, line_types=lt, speed_limit=sl),
                )
        return net


class RacetrackEnvOval(RacetrackEnv):
    """Oval racetrack with parametric length / lane count / roadblocks
    (racetrack_env.py:880-1338)."""

    @classmethod
    def default_config(cls) -> dict:
        config = super().default_config()
        update_config(
            config,
            {
                "length": 100,  # 0: random in [100, 200) (host-side RNG)
                "no_lanes": 3,  # 0: random in [2, 7)
                "block_lane": False,
                "force_decision": False,
            },
        )
        return config

    def _make_network(self) -> RoadNetworkBuilder:
        import numpy as _np

        cfg = self.config
        rng = _np.random.default_rng()  # reference uses a fresh rng here too
        length = cfg["length"] or int(rng.integers(100, 200))
        no_lanes = cfg["no_lanes"] or int(rng.integers(2, 7))
        self._oval_length = length
        self._oval_lanes = no_lanes

        net = RoadNetworkBuilder()
        c, s, n = LineType.CONTINUOUS, LineType.STRIPED, LineType.NONE
        sl = 10.0
        # the reference's per-segment inner/mid/outer line types differ
        # slightly per segment; reproduced per segment below
        for i in range(no_lanes):
            first, last = i == 0, i == no_lanes - 1
            # horizontal straight 1 (racetrack_env.py:974-993)
            net.add_lane("a", "b", StraightLane(
                [0, i * 5], [length + 1, i * 5], width=5, speed_limit=sl,
                line_types=(c, s) if first else ((s, c) if last else (s, n)),
            ))
        for i in range(no_lanes):
            first, last = i == 0, i == no_lanes - 1
            net.add_lane("b", "c", CircularLane(
                [length, -20], 20 + i * 5, np.deg2rad(90), np.deg2rad(0),
                width=5, clockwise=False, speed_limit=sl,
                line_types=(c, n) if first else ((s, c) if last else (s, n)),
            ))
        for i in range(no_lanes):
            first, last = i == 0, i == no_lanes - 1
            net.add_lane("c", "d", StraightLane(
                [length + 20 + i * 5, -20], [length + 20 + i * 5, -50],
                width=5, speed_limit=sl,
                line_types=(c, n) if first else ((s, c) if last else (s, n)),
            ))
        for i in range(no_lanes):
            first, last = i == 0, i == no_lanes - 1
            net.add_lane("d", "e", CircularLane(
                [length + 5, -50], 15 + i * 5, np.deg2rad(0), np.deg2rad(-90),
                width=5, clockwise=False, speed_limit=sl,
                line_types=(c, n) if first else ((s, c) if last else (s, n)),
            ))
        for i in range(no_lanes):
            first, last = i == 0, i == no_lanes - 1
            net.add_lane("e", "f", StraightLane(
                [length + 5, -(65 + i * 5)], [-5, -(65 + i * 5)],
                width=5, speed_limit=sl,
                line_types=(c, n) if first else ((s, c) if last else (s, n)),
            ))
        for i in range(no_lanes):
            first, last = i == 0, i == no_lanes - 1
            net.add_lane("f", "g", CircularLane(
                [-5, -50], 15 + i * 5, np.deg2rad(-90), np.deg2rad(-180),
                width=5, clockwise=False, speed_limit=sl,
                line_types=(c, n) if first else ((s, c) if last else (s, n)),
            ))
        for i in range(no_lanes):
            first, last = i == 0, i == no_lanes - 1
            net.add_lane("g", "h", StraightLane(
                [-20 - i * 5, -50], [-20 - i * 5, -20],
                width=5, speed_limit=sl,
                line_types=(c, n) if first else ((s, c) if last else (s, n)),
            ))
        for i in range(no_lanes):
            first = i == 0
            net.add_lane("h", "a", CircularLane(
                [0, -20], 20 + i * 5, np.deg2rad(180), np.deg2rad(90),
                width=5, clockwise=False, speed_limit=sl,
                line_types=(c, n) if first else (s, c),
            ))
        return net

    def _build_scene(self):
        super()._build_scene()
        cfg = self.config
        # roadblocks (racetrack_env.py:1322-1334)
        blocks = []
        length = self._oval_length
        if cfg["block_lane"]:
            for i in (40.0, 43.0, 46.0, 49.0):
                blocks.append([length - i, 3.75])
                blocks.append([length - i, 6.25])
        if cfg["force_decision"]:
            for i in (-1.25, 1.25, 8.85, 11.25):
                blocks.append([length - 90.0, i])
        self._blocks = np.asarray(blocks, np.float32).reshape(-1, 2)
        self.num_slots += len(blocks)

    def _reset_vehicles(self, key):
        veh = super()._reset_vehicles(key)
        nb = len(self._blocks)
        if nb:
            from highwayenv_tpu.vehicle.state import (
                KIND_OBSTACLE,
                OBJECT_LENGTH,
                OBJECT_WIDTH,
            )

            sl = slice(self.num_slots - nb, self.num_slots)
            veh = veh.replace(
                pos=veh.pos.at[sl].set(jnp.asarray(self._blocks)),
                kind=veh.kind.at[sl].set(KIND_OBSTACLE),
                length=veh.length.at[sl].set(OBJECT_LENGTH),
                width=veh.width.at[sl].set(OBJECT_WIDTH),
                heading=veh.heading.at[sl].set(0.0),
                speed=veh.speed.at[sl].set(0.0),
            )
        return veh
