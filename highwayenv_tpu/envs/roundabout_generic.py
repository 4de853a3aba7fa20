"""Parameterized roundabout with rejection-sampled spawns.

TPU-native rebuild of highway_env/envs/roundabout_env.py:398-757
(roundabout-generic-v0/v1): parametric radius / ring lane count / vehicle
count, dynamically-placed sine accesses, NPC spawns rejection-sampled on 7
candidate edges (10 masked tries each, 7 m clearance), random destination
among 4 exits with precompiled candidate routes.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from highwayenv_tpu.envs.base import EnvState
from highwayenv_tpu.envs.roundabout import RoundaboutEnv
from highwayenv_tpu.road import lane as lane_ops
from highwayenv_tpu.road.network import (
    CircularLane,
    LineType,
    RoadNetworkBuilder,
    SineLane,
    StraightLane,
)
from highwayenv_tpu.utils.config import update_config
from highwayenv_tpu.vehicle import controller
from highwayenv_tpu.vehicle.state import KIND_EGO, KIND_IDM, empty_state


class RoundaboutGenericEnv(RoundaboutEnv):
    @classmethod
    def default_config(cls) -> dict:
        config = super().default_config()
        update_config(
            config,
            {
                "roundabout_radius": 20,
                "roundabout_lanes": 2,
                "vehicles_count": 5,
                "duration": 17,
            },
        )
        return config

    def _build_scene(self):
        """roundabout_env.py:421-663."""
        cfg = self.config
        radius = cfg["roundabout_radius"]
        num_lanes = cfg["roundabout_lanes"]
        alpha = 24.0
        net = RoadNetworkBuilder()
        radii = [radius + 4 * i for i in range(num_lanes)]
        n, c, s = LineType.NONE, LineType.CONTINUOUS, LineType.STRIPED
        nodes = ["se", "ex", "ee", "nx", "ne", "wx", "we", "sx", "se"]
        angles = [
            (90 - alpha, alpha), (alpha, -alpha), (-alpha, -90 + alpha),
            (-90 + alpha, -90 - alpha), (-90 - alpha, -180 + alpha),
            (-180 + alpha, -180 - alpha), (180 - alpha, 90 + alpha),
            (90 + alpha, 90 - alpha),
        ]
        for lane in range(num_lanes):
            if num_lanes == 1:
                lt = [c, c]
            elif lane == 0:
                lt = [c, s]
            elif lane == num_lanes - 1:
                lt = [n, c]
            else:
                lt = [n, s]
            for i in range(8):
                net.add_lane(
                    nodes[i], nodes[i + 1],
                    CircularLane(
                        [0, 0], radii[lane],
                        np.deg2rad(angles[i][0]), np.deg2rad(angles[i][1]),
                        clockwise=False, line_types=lt,
                    ),
                )

        outer = radii[-1]

        def pt(deg):
            rad = np.deg2rad(deg)
            return [outer * np.cos(rad), outer * np.sin(rad)]

        p_se, p_ex, p_ee, p_nx = pt(90 - alpha), pt(alpha), pt(-alpha), pt(-90 + alpha)
        p_ne, p_wx, p_we, p_sx = (
            pt(-90 - alpha), pt(-180 + alpha), pt(180 - alpha), pt(90 + alpha)
        )
        dev = max(100.0, 2 * outer + 40.0)
        access = dev + 40.0

        # south entry / exit (roundabout_env.py:487-524)
        dy = dev / 2 - p_se[1]
        a = (p_se[0] - 2) / 2
        w = np.pi / dy
        net.add_lane("ser", "ses",
                     StraightLane([2, access], [2, dev / 2], line_types=(s, c)))
        net.add_lane("ses", "se",
                     SineLane([2 + a, dev / 2], [2 + a, p_se[1]], a, w,
                              -np.pi / 2, line_types=(c, c)))
        dy = dev / 2 - p_sx[1]
        a = (p_sx[0] + 2) / 2
        w = np.pi / dy
        net.add_lane("sx", "sxs",
                     SineLane([p_sx[0] - a, p_sx[1]], [p_sx[0] - a, dev / 2],
                              a, w, -np.pi / 2, line_types=(c, c)))
        net.add_lane("sxs", "sxr",
                     StraightLane([-2, dev / 2], [-2, access], line_types=(n, c)))

        # east entry / exit (roundabout_env.py:526-569)
        dx = dev / 2 - p_ee[0]
        a = (-2 - p_ee[1]) / 2
        w = np.pi / dx
        net.add_lane("eer", "ees",
                     StraightLane([access, -2], [dev / 2, -2], line_types=(s, c)))
        net.add_lane("ees", "ee",
                     SineLane([dev / 2, -2 - a], [p_ee[0], -2 - a], a, w,
                              -np.pi / 2, line_types=(c, c)))
        dx = dev / 2 - p_ex[0]
        a = (2 - p_ex[1]) / 2
        w = np.pi / dx
        net.add_lane("ex", "exs",
                     SineLane([p_ex[0], p_ex[1] + a], [dev / 2, p_ex[1] + a],
                              a, w, -np.pi / 2, line_types=(c, c)))
        net.add_lane("exs", "exr",
                     StraightLane([dev / 2, 2], [access, 2], line_types=(n, c)))

        # north entry / exit (roundabout_env.py:571-613)
        dy = p_ne[1] - (-dev / 2)
        a = (-2 - p_ne[0]) / 2
        w = np.pi / dy
        net.add_lane("ner", "nes",
                     StraightLane([-2, -access], [-2, -dev / 2], line_types=(s, c)))
        net.add_lane("nes", "ne",
                     SineLane([-2 - a, -dev / 2], [-2 - a, p_ne[1]], a, w,
                              -np.pi / 2, line_types=(c, c)))
        dy = p_nx[1] - (-dev / 2)
        a = (2 - p_nx[0]) / 2
        w = np.pi / dy
        net.add_lane("nx", "nxs",
                     SineLane([p_nx[0] + a, p_nx[1]], [p_nx[0] + a, -dev / 2],
                              a, w, -np.pi / 2, line_types=(c, c)))
        net.add_lane("nxs", "nxr",
                     StraightLane([2, -dev / 2], [2, -access], line_types=(n, c)))

        # west entry / exit (roundabout_env.py:615-651)
        dx = p_we[0] - (-dev / 2)
        a = (p_we[1] - 2) / 2
        w = np.pi / dx
        net.add_lane("wer", "wes",
                     StraightLane([-access, 2], [-dev / 2, 2], line_types=(s, c)))
        net.add_lane("wes", "we",
                     SineLane([-dev / 2, 2 + a], [p_we[0], 2 + a], a, w,
                              -np.pi / 2, line_types=(c, c)))
        dx = p_wx[0] - (-dev / 2)
        a = (p_wx[1] + 2) / 2
        w = np.pi / dx
        net.add_lane("wx", "wxs",
                     SineLane([p_wx[0], p_wx[1] - a], [-dev / 2, p_wx[1] - a],
                              a, w, -np.pi / 2, line_types=(c, c)))
        net.add_lane("wxs", "wxr",
                     StraightLane([-dev / 2, -2], [-access, -2], line_types=(n, c)))

        self.net = net
        self.geo = net.build()
        self.max_edge_lanes = num_lanes
        self.num_slots = 1 + cfg["vehicles_count"]

        # candidate spawn lanes (roundabout_env.py:692-700) x destinations
        self._destinations = ["exr", "sxr", "nxr", "wxr"]
        spawn_edges = [
            ("we", "sx"), ("sx", "se"), ("ee", "nx"), ("nx", "ne"),
            ("eer", "ees"), ("ner", "nes"), ("wer", "wes"),
        ]
        spawn_lane_indices = []
        for f, t in spawn_edges:
            for lid in range(len(net.lanes_on_edge(f, t))):
                spawn_lane_indices.append((f, t, lid))
        self._spawn_edges = spawn_edges
        self._spawn_lane_count = np.array(
            [len(net.lanes_on_edge(f, t)) for f, t in spawn_edges], np.int32
        )
        self._spawn_lane_base = np.array(
            [net.global_lane_index((f, t, 0)) for f, t in spawn_edges], np.int32
        )

        # route table: (spawn_edge, lane_id, destination) -> arrays
        trial = [
            net.route_arrays(idx, d, 32)
            for idx in spawn_lane_indices for d in self._destinations
        ]
        self.route_slots = max(int(x[3]) for x in trial)
        R = self.route_slots
        E, Lmax, D = len(spawn_edges), int(self._spawn_lane_count.max()), 4
        rb = np.full((E, Lmax, D, R), -1, np.int32)
        rn = np.zeros((E, Lmax, D, R), np.int32)
        rid = np.full((E, Lmax, D, R), -1, np.int32)
        rlen = np.zeros((E, Lmax, D), np.int32)
        for e, (f, t) in enumerate(spawn_edges):
            for lid in range(len(net.lanes_on_edge(f, t))):
                for d, dest in enumerate(self._destinations):
                    rb[e, lid, d], rn[e, lid, d], rid[e, lid, d], rlen[e, lid, d] = (
                        net.route_arrays((f, t, lid), dest, R)
                    )
        self._npc_routes = tuple(jnp.asarray(x) for x in (rb, rn, rid, rlen))
        self._ego_lane = net.global_lane_index(("ser", "ses", 0))
        self._ego_route = net.route_arrays(("ser", "ses", 0), "nxs", R)

    def _reset_vehicles(self, key):
        """roundabout_env.py:665-757."""
        cfg = self.config
        V = self.num_slots
        n_npc = cfg["vehicles_count"]
        veh = empty_state(V, route_slots=self.route_slots)

        pos = jnp.zeros((V, 2), jnp.float32)
        heading = jnp.zeros((V,), jnp.float32)
        speed = jnp.zeros((V,), jnp.float32)
        kind = jnp.zeros((V,), jnp.int32)
        R = self.route_slots
        route_base = jnp.full((V, R), -1, jnp.int32)
        route_n = jnp.zeros((V, R), jnp.int32)
        route_id = jnp.full((V, R), -1, jnp.int32)
        route_len = jnp.zeros((V,), jnp.int32)

        # ego at the end of ("ser","ses",0), route to "nxs"
        ego_lane = jnp.int32(self._ego_lane)
        ego_s = self.geo.length[self._ego_lane] - 2.5
        pos = pos.at[0].set(
            lane_ops.position(self.geo, ego_lane, jnp.float32(ego_s), jnp.float32(0.0))
        )
        heading = heading.at[0].set(
            lane_ops.heading_at(self.geo, ego_lane, jnp.float32(ego_s))
        )
        speed = speed.at[0].set(8.0)
        kind = kind.at[0].set(KIND_EGO)
        erb, ern, erid, erlen = self._ego_route
        route_base = route_base.at[0].set(jnp.asarray(erb))
        route_n = route_n.at[0].set(jnp.asarray(ern))
        route_id = route_id.at[0].set(jnp.asarray(erid))
        route_len = route_len.at[0].set(erlen)

        rb, rn, rid, rlen = self._npc_routes
        edge_count = jnp.asarray(self._spawn_lane_count)
        edge_base = jnp.asarray(self._spawn_lane_base)
        E = len(self._spawn_edges)
        ivd = cfg.get("incoming_vehicle_destination")

        keys = jax.random.split(key, n_npc * 10)
        ki = 0
        for v_i in range(n_npc):
            slot = 1 + v_i
            done = jnp.bool_(False)
            for _try in range(10):
                k_e, k_l, k_s, k_v, k_d, k_delta = jax.random.split(keys[ki], 6)
                ki += 1
                e = jax.random.randint(k_e, (), 0, E)
                lid = jax.random.randint(k_l, (), 0, 10000) % edge_count[e]
                g = edge_base[e] + lid
                llen = self.geo.length[g]
                s = jax.random.uniform(
                    k_s, (), minval=5.0, maxval=jnp.maximum(5.0, llen - 5.0)
                )
                p = lane_ops.position(self.geo, g, s, jnp.float32(0.0))
                # 7 m clearance against all previously placed vehicles
                d = jnp.linalg.norm(pos - p[None, :], axis=-1)
                clear = ~jnp.any((kind != 0) & (d < 7.0))
                ok = clear & ~done
                spd = 14.0 + 2.0 * jax.random.normal(k_v)
                dest = (
                    jnp.int32(min(int(ivd), 3))
                    if ivd is not None
                    else jax.random.randint(k_d, (), 0, 4)
                )
                pos = pos.at[slot].set(jnp.where(ok, p, pos[slot]))
                heading = heading.at[slot].set(
                    jnp.where(
                        ok,
                        lane_ops.heading_at(self.geo, g, s),
                        heading[slot],
                    )
                )
                speed = speed.at[slot].set(jnp.where(ok, spd, speed[slot]))
                kind = kind.at[slot].set(jnp.where(ok, KIND_IDM, kind[slot]))
                route_base = route_base.at[slot].set(
                    jnp.where(ok, rb[e, lid, dest], route_base[slot])
                )
                route_n = route_n.at[slot].set(
                    jnp.where(ok, rn[e, lid, dest], route_n[slot])
                )
                route_id = route_id.at[slot].set(
                    jnp.where(ok, rid[e, lid, dest], route_id[slot])
                )
                route_len = route_len.at[slot].set(
                    jnp.where(ok, rlen[e, lid, dest], route_len[slot])
                )
                done = done | ok

        k_delta = jax.random.fold_in(key, 999)
        lane = lane_ops.closest_lane(self.geo, pos, heading)
        # meta-action egos index target_speeds; raw-control egos
        # keep spawn speed (plain Vehicle, action.py:129-135)
        ego_index, ego_ts = controller.ego_speed_init(self.action_type, speed)
        is_ego = kind == KIND_EGO
        delta = jnp.where(
            is_ego, 4.0, jax.random.uniform(k_delta, (V,), minval=3.5, maxval=4.5)
        )
        return veh.replace(
            pos=pos,
            heading=heading,
            speed=speed,
            lane=lane,
            target_lane=lane,
            target_speed=jnp.where(is_ego, ego_ts, speed).astype(jnp.float32),
            speed_index=jnp.where(is_ego, ego_index, 0).astype(jnp.int32),
            timer=jnp.mod((pos[:, 0] + pos[:, 1]) * jnp.pi, 1.0).astype(jnp.float32),
            delta=delta.astype(jnp.float32),
            kind=kind,
            route_base=route_base,
            route_n=route_n,
            route_id=route_id,
            route_len=route_len,
        )

    def _is_truncated(self, state: EnvState):
        return state.time >= self.config["duration"]
