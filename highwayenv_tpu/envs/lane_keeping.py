"""Lane-keeping control task with dynamical (tire-slip) ego.

TPU-native rebuild of highway_env/envs/lane_keeping_env.py:14-186
(lane-keeping-v0): SineLane + StraightLane sequence, lateral-only continuous
control on a BicycleVehicle, AttributesObservation of the noisy lateral
state/derivative and lane reference.

Reference quirks reproduced: the observation is computed *before* the
simulation frame (lane_keeping_env.py:54-72), and the tracked reward lane
advances from the straight lane to the sine lane once the ego leaves it.
The LPV interval-observer side channel (self.lpv) is a research extra and is
not part of the env contract (always None unless set externally); see
highwayenv_tpu/ops/interval.py for the LPV tooling.
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
from highwayenv_tpu.vehicle import dynamics
from highwayenv_tpu.vehicle.state import KIND_EGO, empty_state


class LaneKeepingEnv(BaseEnv):
    @classmethod
    def default_config(cls) -> dict:
        config = super().default_config()
        update_config(
            config,
            {
                "observation": {
                    "type": "AttributesObservation",
                    "attributes": ["state", "derivative", "reference_state"],
                },
                "action": {
                    "type": "ContinuousAction",
                    "steering_range": [-np.pi / 3, np.pi / 3],
                    "longitudinal": False,
                    "lateral": True,
                    "dynamical": True,
                },
                "simulation_frequency": 10,
                "policy_frequency": 10,
                "state_noise": 0.05,
                "derivative_noise": 0.05,
                "screen_width": 600,
                "screen_height": 250,
                "scaling": 7,
                "centering_position": [0.4, 0.5],
                "max_episode_steps": 200,  # registration TimeLimit
            },
        )
        return config

    def _build_scene(self):
        """lane_keeping_env.py:89-126."""
        net = RoadNetworkBuilder()
        net.add_lane(
            "a", "b",
            SineLane(
                [0, 0], [500, 0], 5, 2 * np.pi / 100, 0,
                width=10,
                line_types=[LineType.STRIPED, LineType.STRIPED],
            ),
        )
        net.add_lane(
            "c", "d",
            StraightLane(
                [50, 50], [115, 15],
                line_types=(LineType.STRIPED, LineType.STRIPED), width=10,
            ),
        )
        net.add_lane(
            "d", "a",
            StraightLane(
                [115, 15],
                [115 + 20, 15 + 20 * (15 - 50) / (115 - 50)],
                line_types=(LineType.NONE, LineType.STRIPED), width=10,
            ),
        )
        self.net = net
        self.geo = net.build()
        self.max_edge_lanes = 1
        self.num_slots = 1
        # tracked reward-lane sequence (lane_keeping_env.py:55-56, 105-106):
        # start on ("c","d"), advance to the sine ("a","b") once off it; the
        # cursor lives in the ego's route_ptr
        self._tracked_lanes = jnp.asarray(
            [
                self.net.global_lane_index(("c", "d", 0)),
                self.net.global_lane_index(("a", "b", 0)),
            ],
            jnp.int32,
        )

    def _reset_vehicles(self, key):
        """lane_keeping_env.py:128-137."""
        veh = empty_state(1)
        lane_cd = jnp.int32(self._tracked_lanes[0])
        pos = lane_ops.position(
            self.geo, lane_cd, jnp.float32(50.0), jnp.float32(-4.0)
        )
        heading = lane_ops.heading_at(self.geo, lane_cd, jnp.float32(0.0))
        return veh.replace(
            pos=pos[None].astype(jnp.float32),
            heading=heading[None].astype(jnp.float32),
            speed=jnp.asarray([8.3], jnp.float32),
            lane=lane_cd[None],
            target_lane=lane_cd[None],
            kind=jnp.asarray([KIND_EGO], jnp.int32),
            route_ptr=jnp.zeros((1,), jnp.int32),  # tracked-lane cursor
        )

    # ------------------------------------------------------------------ #
    # AttributesObservation sources (lane_keeping_env.py:139-168)
    # ------------------------------------------------------------------ #
    def _lateral_state(self, state: EnvState) -> jnp.ndarray:
        """Full 6-state rows [y, psi, v_lat, r] of the ego, (4, 1)."""
        v = state.vehicles
        return jnp.stack(
            [
                v.pos[..., 0, 1],
                v.heading[..., 0],
                v.lateral_speed[..., 0],
                v.yaw_rate[..., 0],
            ],
            axis=-1,
        )[..., None]

    def _noise_key(self, state: EnvState, salt: int):
        # per-step observation noise (the reference draws from np_random)
        return jax.random.fold_in(
            jax.random.fold_in(state.key, salt), state.steps
        )

    def attr_state(self, state: EnvState) -> jnp.ndarray:
        noise = jax.random.uniform(
            self._noise_key(state, 1),
            (4, 1),
            minval=-self.config["state_noise"],
            maxval=self.config["state_noise"],
        )
        return self._lateral_state(state) + noise

    def attr_derivative(self, state: EnvState) -> jnp.ndarray:
        d = dynamics.derivative(state.vehicles)  # (V, 6)
        d4 = jnp.stack(
            [d[..., 0, 1], d[..., 0, 2], d[..., 0, 4], d[..., 0, 5]], axis=-1
        )[..., None]
        noise = jax.random.uniform(
            self._noise_key(state, 2),
            (4, 1),
            minval=-self.config["derivative_noise"],
            maxval=self.config["derivative_noise"],
        )
        return d4 + noise

    def _tracked_lane(self, state: EnvState) -> jnp.ndarray:
        ptr = jnp.clip(state.vehicles.route_ptr[..., 0], 0, 1)
        return self._tracked_lanes[ptr]

    def attr_reference_state(self, state: EnvState) -> jnp.ndarray:
        lane = self._tracked_lane(state)
        pos = state.vehicles.pos[..., 0, :]
        s, lat = lane_ops.local_coordinates(self.geo, lane, pos)
        psi_l = lane_ops.heading_at(self.geo, lane, s)
        y_ref = self._lateral_state(state)[..., 0, 0] - lat
        z = jnp.zeros_like(psi_l)
        return jnp.stack([y_ref, psi_l, z, z], axis=-1)[..., None]

    def _observe(self, state: EnvState):
        return self.observation_type.observe_env(self, state)

    # ------------------------------------------------------------------ #
    def _step(self, state: EnvState, action):
        """Reference step order (lane_keeping_env.py:54-72): advance the
        tracked lane, observe the PRE-step state, then simulate."""
        veh = state.vehicles
        lane = self._tracked_lane(state)
        s, lat = lane_ops.local_coordinates(self.geo, lane, veh.pos[..., 0, :])
        on = lane_ops.on_lane(self.geo, lane, s, lat)
        ptr = veh.route_ptr[..., 0]
        new_ptr = jnp.where((ptr < 1) & ~on, ptr + 1, ptr)
        state = state.replace(
            vehicles=veh.replace(
                route_ptr=veh.route_ptr.at[..., 0].set(new_ptr)
            )
        )

        obs = self._observe(state)
        slot_actions = self._action_to_slots(action)
        state = state.replace(
            time=state.time + 1.0 / self.config["policy_frequency"]
        )
        state = self._simulate(state, slot_actions)
        reward = self._reward(state, action)
        terminated = self._is_terminated(state)
        truncated = self._is_truncated(state)
        mes = self.config.get("max_episode_steps")
        if mes:
            policy_steps = state.steps // self.frames_per_step
            truncated = truncated | (policy_steps >= mes)
        info: dict = {}
        return obs, state, reward, terminated, truncated, info

    def _reward(self, state: EnvState, action):
        """lane_keeping_env.py:74-76."""
        lane = self._tracked_lane(state)
        pos = state.vehicles.pos[..., 0, :]
        _, lat = lane_ops.local_coordinates(self.geo, lane, pos)
        width = self.geo.width[lane_ops._gather(self.geo, lane)]
        return 1.0 - (lat / width) ** 2

    def _is_terminated(self, state: EnvState):
        return jnp.zeros_like(state.time, dtype=bool)

    def _is_truncated(self, state: EnvState):
        return jnp.zeros_like(state.time, dtype=bool)
