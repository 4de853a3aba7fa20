"""4-way regulated intersection with dynamic vehicle population.

TPU-native rebuild of highway_env/envs/intersection_env.py:13-473
(intersection-v0, intersection-multi-agent-v0).  The reference's
spawn/despawn list mutation becomes slot recycling in the fixed-size padded
state: `_clear_vehicles` frees slots (kind -> PAD), `_spawn_vehicle` claims
the first free slot, and the initial population is built by 9 masked spawn
attempts plus 3 seconds of warm-up simulation inside the jitted reset.
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
from highwayenv_tpu.vehicle.behavior import IDMParams
from highwayenv_tpu.vehicle.state import (
    KIND_EGO,
    KIND_IDM,
    KIND_PAD,
    empty_state,
)


def _intersection_network() -> RoadNetworkBuilder:
    """intersection_env.py:142-253 (priorities: horizontal 3, vertical 1,
    horizontal left-turn 2, vertical left-turn 0)."""
    lane_width = 4.0
    right_turn_radius = lane_width + 5.0
    left_turn_radius = right_turn_radius + lane_width
    outer_distance = right_turn_radius + lane_width / 2
    access_length = 100.0

    net = RoadNetworkBuilder()
    n, c, s = LineType.NONE, LineType.CONTINUOUS, LineType.STRIPED
    for corner in range(4):
        angle = np.radians(90 * corner)
        is_horizontal = corner % 2
        priority = 3 if is_horizontal else 1
        rotation = np.array(
            [[np.cos(angle), -np.sin(angle)], [np.sin(angle), np.cos(angle)]]
        )
        # incoming
        start = rotation @ np.array([lane_width / 2, access_length + outer_distance])
        end = rotation @ np.array([lane_width / 2, outer_distance])
        net.add_lane(
            f"o{corner}", f"ir{corner}",
            StraightLane(start, end, line_types=[s, c], priority=priority,
                         speed_limit=10.0),
        )
        # right turn
        r_center = rotation @ np.array([outer_distance, outer_distance])
        net.add_lane(
            f"ir{corner}", f"il{(corner - 1) % 4}",
            CircularLane(r_center, right_turn_radius,
                         angle + np.radians(180), angle + np.radians(270),
                         line_types=[n, c], priority=priority, speed_limit=10.0),
        )
        # left turn
        l_center = rotation @ np.array(
            [-left_turn_radius + lane_width / 2, left_turn_radius - lane_width / 2]
        )
        net.add_lane(
            f"ir{corner}", f"il{(corner + 1) % 4}",
            CircularLane(l_center, left_turn_radius,
                         angle + np.radians(0), angle + np.radians(-90),
                         clockwise=False, line_types=[n, n],
                         priority=priority - 1, speed_limit=10.0),
        )
        # straight
        start = rotation @ np.array([lane_width / 2, outer_distance])
        end = rotation @ np.array([lane_width / 2, -outer_distance])
        net.add_lane(
            f"ir{corner}", f"il{(corner + 2) % 4}",
            StraightLane(start, end, line_types=[s, n], priority=priority,
                         speed_limit=10.0),
        )
        # exit
        start = rotation @ np.flip(
            [lane_width / 2, access_length + outer_distance], axis=0
        )
        end = rotation @ np.flip([lane_width / 2, outer_distance], axis=0)
        net.add_lane(
            f"il{(corner - 1) % 4}", f"o{(corner - 1) % 4}",
            StraightLane(end, start, line_types=[n, c], priority=priority,
                         speed_limit=10.0),
        )
    return net


class IntersectionEnv(BaseEnv):
    regulated = True

    @classmethod
    def default_config(cls) -> dict:
        config = super().default_config()
        update_config(
            config,
            {
                "observation": {
                    "type": "Kinematics",
                    "vehicles_count": 15,
                    "features": ["presence", "x", "y", "vx", "vy", "cos_h", "sin_h"],
                    "features_range": {
                        "x": [-100, 100],
                        "y": [-100, 100],
                        "vx": [-20, 20],
                        "vy": [-20, 20],
                    },
                    "absolute": True,
                    "flatten": False,
                    "observe_intentions": False,
                },
                "action": {
                    "type": "DiscreteMetaAction",
                    "longitudinal": True,
                    "lateral": False,
                    "target_speeds": [0, 4.5, 9],
                },
                "duration": 13,
                "destination": "o1",
                "controlled_vehicles": 1,
                "initial_vehicle_count": 10,
                "spawn_probability": 0.6,
                "screen_width": 600,
                "screen_height": 600,
                "centering_position": [0.5, 0.6],
                "scaling": 5.5 * 1.3,
                "collision_reward": -5,
                "high_speed_reward": 1,
                "arrived_reward": 1,
                "reward_speed_range": [7.0, 9.0],
                "normalize_reward": False,
                "offroad_terminal": False,
            },
        )
        return config

    def _idm_params(self):
        """Low jam distance NPC tuning (intersection_env.py:262-265)."""
        return IDMParams(
            distance_wanted=7.0, comfort_acc_max=6.0, comfort_acc_min=-3.0
        )

    def _build_scene(self):
        cfg = self.config
        self.net = _intersection_network()
        self.geo = self.net.build()
        self.max_edge_lanes = 1
        self.route_slots = 3
        # RegulatedRoad counts the 3 s of warm-up frames (road.steps persists
        # from _make_vehicles into the episode)
        self._initial_steps = 3 * cfg["simulation_frequency"]

        n_ctrl = cfg["controlled_vehicles"]
        n_init = cfg["initial_vehicle_count"]
        # max runtime spawns: one attempt per policy step
        n_spawn = int(cfg["duration"] * cfg["policy_frequency"]) + 1
        self._n_npc = (n_init - 1) + 1 + n_spawn
        self.num_slots = self._n_npc + n_ctrl
        self._ego_slots = list(range(self._n_npc, self.num_slots))

        # (4, 4, R) candidate routes: spawn corner i -> destination corner j
        R = self.route_slots
        rb = np.full((4, 4, R), -1, np.int32)
        rn = np.zeros((4, 4, R), np.int32)
        rid = np.full((4, 4, R), -1, np.int32)
        rlen = np.zeros((4, 4), np.int32)
        for i in range(4):
            for j in range(4):
                if i == j:
                    continue
                rb[i, j], rn[i, j], rid[i, j], rlen[i, j] = self.net.route_arrays(
                    (f"o{i}", f"ir{i}", 0), f"o{j}", R
                )
        self._routes = tuple(jnp.asarray(x) for x in (rb, rn, rid, rlen))
        self._spawn_lane = jnp.asarray(
            [self.net.global_lane_index((f"o{i}", f"ir{i}", 0)) for i in range(4)],
            jnp.int32,
        )
        # per-lane masks for has_arrived / clearing (lane names are static)
        exit_mask = np.zeros(self.geo.num_lanes, bool)
        g = 0
        for (f, t), lanes in self.net.edges.items():
            for _ in lanes:
                exit_mask[g] = f.startswith("il") and t.startswith("o")
                g += 1
        self._exit_lane_mask = jnp.asarray(exit_mask)

    @property
    def ego_slots(self):
        return tuple(self._ego_slots)

    # ------------------------------------------------------------------ #
    # spawning
    # ------------------------------------------------------------------ #
    def _spawn_into_slot(
        self,
        veh,
        slot,
        key,
        longitudinal,
        position_deviation=1.0,
        speed_deviation=1.0,
        spawn_probability=0.6,
        go_straight=False,
    ):
        """Masked _spawn_vehicle (intersection_env.py:324-352) into ``slot``.

        slot may be traced (runtime spawn claims the first PAD slot).
        """
        k_p, k_r0, k_r1, k_pos, k_speed, k_delta = jax.random.split(key, 6)
        ok = jax.random.uniform(k_p) <= spawn_probability

        r0 = jax.random.randint(k_r0, (), 0, 4)
        off = jax.random.randint(k_r1, (), 1, 4)
        r1 = jnp.where(go_straight, (r0 + 2) % 4, (r0 + off) % 4)

        lane = self._spawn_lane[r0]
        s = (
            longitudinal
            + 5.0
            + jax.random.normal(k_pos) * position_deviation
        )
        speed = 8.0 + jax.random.normal(k_speed) * speed_deviation
        pos = lane_ops.position(self.geo, lane, s, jnp.float32(0.0))
        heading = lane_ops.heading_at(self.geo, lane, s)

        # clearance: no active object within 15 m (intersection_env.py:345-347)
        d = jnp.linalg.norm(veh.pos - pos[None, :], axis=-1)
        clear = ~jnp.any(veh.active & (d < 15.0))
        ok = ok & clear & (veh.kind[slot] == KIND_PAD)

        rb, rn, rid, rlen = self._routes
        delta = jax.random.uniform(k_delta, (), minval=3.5, maxval=4.5)

        # masked one-hot write instead of 14 dynamic-index scatters: the
        # elementwise selects fuse into one pass over the state (the scatter
        # chain alone cost ~30 ms/step at B=1024 on TPU)
        hot = (jnp.arange(veh.num_slots) == slot) & ok  # (V,)

        def set1(field, value):
            return jnp.where(hot, value, field)

        return veh.replace(
            pos=jnp.where(hot[:, None], pos[None, :], veh.pos),
            heading=set1(veh.heading, heading.astype(jnp.float32)),
            speed=set1(veh.speed, speed.astype(jnp.float32)),
            lane=set1(veh.lane, lane),
            target_lane=set1(veh.target_lane, lane),
            target_speed=set1(veh.target_speed, speed.astype(jnp.float32)),
            timer=set1(
                veh.timer, jnp.mod((pos[0] + pos[1]) * jnp.pi, 1.0)
            ),
            delta=set1(veh.delta, delta),
            kind=set1(veh.kind, KIND_IDM),
            crashed=set1(veh.crashed, False),
            is_yielding=set1(veh.is_yielding, False),
            yield_timer=set1(veh.yield_timer, 0),
            route_base=jnp.where(hot[:, None], rb[r0, r1][None, :], veh.route_base),
            route_n=jnp.where(hot[:, None], rn[r0, r1][None, :], veh.route_n),
            route_id=jnp.where(hot[:, None], rid[r0, r1][None, :], veh.route_id),
            route_ptr=set1(veh.route_ptr, 0),
            route_len=set1(veh.route_len, rlen[r0, r1]),
        )

    def _spawn_initial(self, key):
        """Phase A of the reset: initial random NPCs at stations
        linspace(0, 80) (intersection_env.py:255-268).  Returns the
        pre-warm-up state plus the split key array the later phases
        consume (the key schedule is shared with the batched reset so
        both paths draw identically)."""
        cfg = self.config
        V = self.num_slots
        n_ctrl = cfg["controlled_vehicles"]
        n_init = cfg["initial_vehicle_count"]
        veh = empty_state(V, route_slots=self.route_slots)
        veh = veh.replace(kind=jnp.zeros((V,), jnp.int32))  # all PAD

        keys = jax.random.split(key, n_init + n_ctrl + 2)

        stations = np.linspace(0, 80, n_init)
        for t in range(n_init - 1):
            veh = self._spawn_into_slot(
                veh, t, keys[t], jnp.float32(stations[t]),
                # the reference's initial population uses _spawn_vehicle's
                # DEFAULT spawn_probability=0.6 (intersection_env.py:269-270,
                # :324-332); config["spawn_probability"] gates only the
                # in-episode spawns (:139)
                spawn_probability=0.6,
            )
        return veh, keys

    @property
    def _warmup_frames(self) -> int:
        return 3 * self.config["simulation_frequency"]

    @property
    def _warmup_slots(self) -> int:
        """Only slots 0..n_init-2 can be occupied during warm-up (the
        challenger and egos spawn afterwards), so the O(V^2) pair kernels
        run on a truncated, 8-padded slot array."""
        n_init = self.config["initial_vehicle_count"]
        return min(self.num_slots, -(-(n_init - 1) // 8) * 8)

    def _reset_vehicles(self, key):
        """intersection_env.py:255-322."""
        veh, keys = self._spawn_initial(key)

        # three seconds of warm-up traffic simulation
        # (intersection_env.py:270-277).  The frame counter starts at 0 so
        # the tick phase is static.
        W = self._warmup_slots
        zero_actions = jnp.zeros(
            (W,) + tuple(getattr(self.action_type, "action_shape", ())),
            jnp.float32 if getattr(self.action_type, "action_shape", ()) else jnp.int32,
        )
        sub = jax.tree.map(lambda x: x[:W], veh)
        sub = self._run_frames_static(
            sub, zero_actions, self._warmup_frames, steps0=0
        )
        veh = jax.tree.map(
            lambda s, f: jnp.concatenate([s, f[W:]], axis=0), sub, veh
        )
        return self._finish_reset_vehicles(veh, keys)

    def _reset_batched(self, keys):
        """Batched reset with the 45-frame warm-up routed through the
        regulated general Pallas kernel (envs/base.py hook).

        The default ``vmap(_reset)`` runs the warm-up as 45 sequential XLA
        frames per env — ~35 ms per 128-env reset batch, which dominated
        the compact-autoreset step once the step kernel landed (round 5).
        Here phase A (spawns) and phase B (challenger + egos) stay vmapped
        while the warm-up runs as ONE pallas call over the whole
        (P, warmup_slots) sub-batch with a uniform zero phase.  Positions
        differ from the XLA warm-up only by the kernel's cephes-trig
        precision (PARITY #17), exactly like the step path itself; on
        non-TPU backends (or off-block batch sizes) this falls back to the
        default."""
        P = keys.shape[0]
        if not self._use_pallas_general(P):
            return super()._reset_batched(keys)
        from highwayenv_tpu.ops.general_pallas_bm import (
            pallas_simulate_general,
        )

        kv, ks = jnp.moveaxis(jax.vmap(jax.random.split)(keys), 1, 0)
        veh, spawn_keys = jax.vmap(self._spawn_initial)(kv)

        W = self._warmup_slots
        sub = jax.tree.map(lambda x: x[:, :W], veh)
        # interpret=True only ever fires under tests that monkeypatch the
        # gate on a CPU backend; real use reaches here on TPU only
        sub = pallas_simulate_general(
            self, sub, jnp.zeros((P, W), jnp.float32), self._warmup_frames,
            steps0=jnp.zeros((P,), jnp.int32) if self.regulated else None,
            block=min(self.pallas_block, P),
            interpret=jax.default_backend() not in ("tpu", "axon"),
        )
        veh = jax.tree.map(
            lambda s, f: jnp.concatenate([s, f[:, W:]], axis=1), sub, veh
        )

        veh = jax.vmap(self._finish_reset_vehicles)(veh, spawn_keys)
        veh = jax.vmap(self._apply_npc_type)(veh)
        states = EnvState(
            vehicles=veh,
            time=jnp.zeros((P,), jnp.float32),
            steps=jnp.full((P,), self._initial_steps, jnp.int32),
            key=ks,
        )
        states = jax.vmap(self._push_frame)(states)
        return jax.vmap(self._observe)(states), states

    def _finish_reset_vehicles(self, veh, keys):
        """Phase B of the reset: challenger + controlled vehicles
        (intersection_env.py:279-322)."""
        cfg = self.config
        n_init = cfg["initial_vehicle_count"]

        # 3. challenger (straight crossing, spawn_probability 1)
        veh = self._spawn_into_slot(
            veh, n_init - 1, keys[n_init - 1], jnp.float32(60.0),
            position_deviation=0.1, speed_deviation=0.0,
            spawn_probability=1.0, go_straight=True,
        )

        # 4. controlled vehicles
        rb, rn, rid, rlen = self._routes
        for k, slot in enumerate(self._ego_slots):
            kk = keys[n_init + k]
            k_dest, k_pos = jax.random.split(kk)
            corner = k % 4
            lane = self._spawn_lane[corner]
            dest_cfg = cfg["destination"]
            if dest_cfg is not None:
                dest = jnp.int32(int(dest_cfg[1:]))
            else:
                dest = jax.random.randint(k_dest, (), 1, 4)
            s = 60.0 + 5.0 * (1.0 + jax.random.normal(k_pos))
            pos = lane_ops.position(self.geo, lane, s, jnp.float32(0.0))
            heading = lane_ops.heading_at(self.geo, lane, jnp.float32(60.0))
            speed = jnp.float32(10.0)

            veh = veh.replace(
                pos=veh.pos.at[slot].set(pos),
                heading=veh.heading.at[slot].set(heading.astype(jnp.float32)),
                speed=veh.speed.at[slot].set(speed),
                lane=veh.lane.at[slot].set(lane),
                target_lane=veh.target_lane.at[slot].set(lane),
                kind=veh.kind.at[slot].set(KIND_EGO),
            )
            # plan_route_to / speed indexing exist only on MDP-style egos:
            # the reference's try/except AttributeError skips the whole block
            # for plain-Vehicle (ContinuousAction) egos
            # (intersection_env.py:304-313)
            if hasattr(self.action_type, "target_speeds"):
                ts = self.action_type.target_speeds
                si = controller.speed_to_index(speed, ts)
                tsv = jnp.asarray(np.asarray(ts, np.float32))[si]
                veh = veh.replace(
                    target_speed=veh.target_speed.at[slot].set(tsv),
                    speed_index=veh.speed_index.at[slot].set(si),
                    route_base=veh.route_base.at[slot].set(rb[corner, dest]),
                    route_n=veh.route_n.at[slot].set(rn[corner, dest]),
                    route_id=veh.route_id.at[slot].set(rid[corner, dest]),
                    route_len=veh.route_len.at[slot].set(rlen[corner, dest]),
                )

            # prevent early collisions: free NPC slots within 20 m of the ego
            # (intersection_env.py:316-322)
            d = jnp.linalg.norm(veh.pos - pos[None, :], axis=-1)
            drop = (
                (veh.kind != KIND_PAD)
                & (veh.kind != KIND_EGO)
                & (d < 20.0)
            )
            veh = veh.replace(
                kind=jnp.where(drop, KIND_PAD, veh.kind)
            )
        return veh

    # ------------------------------------------------------------------ #
    # per-step population dynamics
    # ------------------------------------------------------------------ #
    def _has_arrived(self, state: EnvState, slot, exit_distance: float = 25.0):
        """intersection_env.py:372-378."""
        veh = state.vehicles
        lane = veh.lane[..., slot]
        s, _ = lane_ops.local_coordinates(self.geo, lane, veh.pos[..., slot, :])
        return self._exit_lane_mask[lane] & (s >= exit_distance)

    def _clear_vehicles(self, veh):
        """intersection_env.py:354-366: free slots of leaving NPCs."""
        s, _ = lane_ops.local_coordinates(self.geo, veh.lane, veh.pos)
        lane_len = self.geo.length[lane_ops._gather(self.geo, veh.lane)]
        leaving = self._exit_lane_mask[veh.lane] & (
            s >= lane_len - 4 * veh.length
        )
        is_ego = veh.kind == KIND_EGO
        drop = ~is_ego & (veh.kind != KIND_PAD) & leaving
        return veh.replace(kind=jnp.where(drop, KIND_PAD, veh.kind))

    def _post_step_population(self, state: EnvState) -> EnvState:
        """Post-step population update (intersection_env.py:136-140);
        affects only the *next* step's observation, as in the reference.
        A hook (not a ``_step`` override) so the batched sim kernels of
        ``_simulate_batched`` stay eligible (round 4)."""
        k_spawn, k_next = jax.random.split(state.key)
        veh = self._clear_vehicles(state.vehicles)
        free_slot = jnp.argmax(veh.kind[: self._n_npc] == KIND_PAD)
        veh = self._spawn_into_slot(
            veh, free_slot, k_spawn, jnp.float32(0.0),
            spawn_probability=self.config["spawn_probability"],
        )
        return state.replace(vehicles=veh, key=k_next)

    # ------------------------------------------------------------------ #
    # rewards / termination
    # ------------------------------------------------------------------ #
    def _agent_rewards(self, state: EnvState, action, slot):
        """intersection_env.py:96-107."""
        veh = state.vehicles
        scaled_speed = lmap(
            veh.speed[..., slot], self.config["reward_speed_range"], (0.0, 1.0)
        )
        return {
            "collision_reward": veh.crashed[..., slot].astype(jnp.float32),
            "high_speed_reward": jnp.clip(scaled_speed, 0.0, 1.0),
            "arrived_reward": self._has_arrived(state, slot).astype(jnp.float32),
            "on_road_reward": self.ego_on_road(state, slot).astype(jnp.float32),
        }

    def _agent_reward(self, state: EnvState, action, slot):
        """intersection_env.py:80-94."""
        cfg = self.config
        rewards = self._agent_rewards(state, action, slot)
        reward = sum(cfg.get(k, 0) * v for k, v in rewards.items())
        reward = jnp.where(
            rewards["arrived_reward"] > 0, cfg["arrived_reward"], reward
        )
        reward = reward * rewards["on_road_reward"]
        if cfg["normalize_reward"]:
            reward = lmap(
                reward, (cfg["collision_reward"], cfg["arrived_reward"]), (0.0, 1.0)
            )
        return reward

    def _reward(self, state: EnvState, action):
        vals = [self._agent_reward(state, action, s) for s in self.ego_slots]
        return sum(vals) / len(vals)

    def _rewards(self, state: EnvState, action):
        per_agent = [
            self._agent_rewards(state, action, s) for s in self.ego_slots
        ]
        return {
            name: sum(r[name] for r in per_agent) / len(per_agent)
            for name in per_agent[0]
        }

    def _is_terminated(self, state: EnvState):
        veh = state.vehicles
        crashed = jnp.zeros((), bool)
        arrived = jnp.ones((), bool)
        for s in self.ego_slots:
            crashed = crashed | veh.crashed[..., s]
            arrived = arrived & self._has_arrived(state, s)
        out = crashed | arrived
        if self.config["offroad_terminal"]:
            out = out | ~self.ego_on_road(state)
        return out

    def _is_truncated(self, state: EnvState):
        return state.time >= self.config["duration"]

    def _info(self, state: EnvState, action):
        info = super()._info(state, action)
        info["agents_rewards"] = tuple(
            self._agent_reward(state, action, s) for s in self.ego_slots
        )
        info["agents_terminated"] = tuple(
            state.vehicles.crashed[..., s] | self._has_arrived(state, s)
            for s in self.ego_slots
        )
        return info


class ContinuousIntersectionEnv(IntersectionEnv):
    """intersection-v1: continuous control + BicycleVehicle ego
    (intersection_env.py:433-473)."""

    @classmethod
    def default_config(cls) -> dict:
        config = super().default_config()
        update_config(
            config,
            {
                "observation": {
                    "type": "Kinematics",
                    "vehicles_count": 5,
                    "features": [
                        "presence", "x", "y", "vx", "vy",
                        "long_off", "lat_off", "ang_off",
                    ],
                    "features_range": {
                        "x": [-100, 100],
                        "y": [-100, 100],
                        "vx": [-20, 20],
                        "vy": [-20, 20],
                    },
                    "absolute": True,
                    "flatten": False,
                    "observe_intentions": False,
                },
                "action": {
                    "type": "ContinuousAction",
                    "steering_range": [-np.pi / 3, np.pi / 3],
                    "longitudinal": True,
                    "lateral": True,
                    "dynamical": True,
                    "target_speeds": [0, 4.5, 9],
                },
            },
        )
        return config


class MultiAgentIntersectionEnv(IntersectionEnv):
    """intersection-multi-agent-v0 (intersection_env.py:380-433)."""

    @classmethod
    def default_config(cls) -> dict:
        config = super().default_config()
        update_config(
            config,
            {
                "action": {
                    "type": "MultiAgentAction",
                    "action_config": {
                        "type": "DiscreteMetaAction",
                        "lateral": False,
                        "longitudinal": True,
                        "target_speeds": [0, 4.5, 9],
                    },
                },
                "observation": {
                    "type": "MultiAgentObservation",
                    "observation_config": {
                        "type": "Kinematics",
                        "vehicles_count": 15,
                        "features": ["presence", "x", "y", "vx", "vy", "cos_h", "sin_h"],
                        "features_range": {
                            "x": [-100, 100],
                            "y": [-100, 100],
                            "vx": [-20, 20],
                            "vy": [-20, 20],
                        },
                        "absolute": True,
                        "flatten": False,
                        "observe_intentions": False,
                    },
                },
                "controlled_vehicles": 2,
            },
        )
        return config
