"""Controller convergence tests (mirror tests/vehicle/test_control.py):
lane change settles within width/4 in 3 s; FASTER converges +5 m/s in 3 tau."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from highwayenv_tpu.envs.base import BaseEnv
from highwayenv_tpu.road.network import RoadNetworkBuilder
from highwayenv_tpu.road import lane as lane_ops
from highwayenv_tpu.vehicle.state import KIND_EGO, empty_state

FPS = 15


class _EgoEnv(BaseEnv):
    lanes = 2

    @classmethod
    def default_config(cls):
        cfg = super().default_config()
        cfg.update(
            {
                "action": {
                    "type": "DiscreteMetaAction",
                    "target_speeds": [20, 25, 30],
                },
                "simulation_frequency": FPS,
                "policy_frequency": 1,
            }
        )
        return cfg

    def _build_scene(self):
        self.net = RoadNetworkBuilder.straight_road_network(self.lanes)
        self.geo = self.net.build()
        self.max_edge_lanes = self.lanes
        self.num_slots = 1

    def _reset_vehicles(self, key):
        veh = empty_state(1)
        return veh.replace(
            pos=jnp.asarray([[0.0, 0.0]], jnp.float32),
            speed=jnp.asarray([20.0], jnp.float32),
            target_speed=jnp.asarray([20.0], jnp.float32),
            kind=jnp.asarray([KIND_EGO], jnp.int32),
        )

    def _reward(self, state, action):
        return jnp.zeros(())

    def _is_terminated(self, state):
        return jnp.zeros((), bool)

    def _is_truncated(self, state):
        return jnp.zeros((), bool)

    def _info(self, state, action):
        return {}


def test_idle_straight():
    env = _EgoEnv()
    obs, state = env.reset(jax.random.PRNGKey(0))
    for _ in range(2):
        _, state, *_ = env.step(state, jnp.int32(1))  # IDLE
    veh = state.vehicles
    assert abs(float(veh.pos[0, 0]) - 40.0) < 1e-3
    assert abs(float(veh.pos[0, 1])) < 1e-3
    assert abs(float(veh.speed[0]) - 20.0) < 1e-3
    assert abs(float(veh.heading[0])) < 1e-3


def test_lane_change_converges():
    env = _EgoEnv()
    obs, state = env.reset(jax.random.PRNGKey(0))
    _, state, *_ = env.step(state, jnp.int32(2))  # LANE_RIGHT
    for _ in range(2):
        _, state, *_ = env.step(state, jnp.int32(1))
    veh = state.vehicles
    assert abs(float(veh.speed[0]) - 20.0) < 0.01
    assert abs(float(veh.pos[0, 1]) - 4.0) < 1.0  # within width/4 of lane 1
    assert int(veh.lane[0]) == 1


def test_faster_converges():
    env = _EgoEnv()
    obs, state = env.reset(jax.random.PRNGKey(0))
    _, state, *_ = env.step(state, jnp.int32(3))  # FASTER -> target 25
    # 3 * TAU_ACC = 1.8 s; the first policy step covers 1 s
    _, state, *_ = env.step(state, jnp.int32(1))
    veh = state.vehicles
    assert abs(float(veh.speed[0]) - 25.0) < 0.5
    assert abs(float(veh.pos[0, 1])) < 1e-3
    assert int(veh.lane[0]) == 0
