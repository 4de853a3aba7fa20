"""MultipleModelVehicle parity: route-hypothesis tracking
(reference vehicle/uncertainty/estimation.py:40-140)."""

import sys

import numpy as np
import jax
import pytest

import highwayenv_tpu as ht
from highwayenv_tpu.ops.uncertainty import (
    MultipleModelTracker,
    route_of_slot,
    routes_at_intersection,
    steering_features,
    acceleration_features,
)

sys.path.insert(0, "/root/reference")


def _ref_env(env_id, seed=3):
    import gymnasium as gym
    import highway_env  # noqa: F401

    env = gym.make(env_id).unwrapped
    env.reset(seed=seed)
    return env


def test_routes_at_intersection_matches_reference():
    ref = _ref_env("intersection-v0")
    ours = ht.make("intersection-v0")
    from highway_env.vehicle.controller import ControlledVehicle

    checked = 0
    for v in ref.road.vehicles:
        if not isinstance(v, ControlledVehicle) or not v.route:
            continue
        ref_routes = v.get_routes_at_intersection()
        our_routes = routes_at_intersection(
            ours.net, [tuple(idx) for idx in v.route]
        )
        assert sorted(map(tuple, (map(tuple, r) for r in ref_routes))) == sorted(
            map(tuple, (map(tuple, r) for r in our_routes))
        )
        checked += 1
    assert checked > 0


def test_tracker_accumulates_and_prunes_hypotheses():
    env = ht.make("intersection-v0")
    key = jax.random.PRNGKey(0)
    _, state = env.reset(key)
    veh = state.vehicles
    kinds = np.asarray(veh.kind)
    # pick an IDM NPC slot with a route
    route_len = np.asarray(veh.route_len)
    slots = np.nonzero((kinds == 2) & (route_len > 1))[0]
    assert len(slots) > 0
    slot = int(slots[0])
    route = route_of_slot(env, state, slot)
    assert len(route) > 1 and all(len(idx) == 3 for idx in route)

    tracker = MultipleModelTracker(env, slot, route=route)
    step = jax.jit(env.step)
    import jax.numpy as jnp

    for t in range(6):
        tracker.act(state)
        _, state, *_ = step(state, jnp.int32(1))

    assert len(tracker.data) >= 1
    for r, data in tracker.data:
        assert data["longitudinal"]["features"]
        assert data["lateral"]["features"]
        assert all(len(f) == 3 for f in data["longitudinal"]["features"])
        assert all(len(f) == 2 for f in data["lateral"]["features"])

    obs, r, data = tracker.assume_model_is_valid(state, 0)
    assert obs.interval is not None
    # data-driven polytope is computable from the collected hypothesis data
    from highwayenv_tpu.ops.uncertainty import (
        polytope_from_estimation,
        STEERING_RANGE,
    )

    a0, da = polytope_from_estimation(
        data.get("lateral", {}),
        STEERING_RANGE,
        lambda: (np.array([[0, 1], [0, 0]]), np.array(
            [[[0, 0], [0, -1]], [[0, 0], [-1, 0]]]
        )),
    )
    assert np.all(np.isfinite(a0))


def test_features_match_reference_formulas():
    """Feature extractors agree with the reference on an injected scene."""
    from tests.parity.util import ref_to_vehicle_state
    from highwayenv_tpu.envs.base import EnvState
    import jax.numpy as jnp

    ref = _ref_env("highway-v0", seed=1)
    ours = ht.make("highway-v0")
    veh = ref_to_vehicle_state(ref, ours)
    state = EnvState(
        vehicles=veh,
        time=jnp.zeros(()),
        steps=jnp.zeros((), jnp.int32),
        key=jax.random.PRNGKey(0),
    )
    from highway_env.vehicle.behavior import LinearVehicle

    # reference formula on the ego's scene
    ego = ref.vehicle
    front, rear = ref.road.neighbour_vehicles(ego)
    lv = LinearVehicle.create_from(ego)
    lv.road = ref.road
    ref_acc = lv.acceleration_features(lv, front, rear)
    our_acc = acceleration_features(ours, state, 0, tuple(ego.lane_index))
    np.testing.assert_allclose(our_acc, ref_acc, atol=1e-4)

    ref_steer = lv.steering_features(ego.target_lane_index)
    our_steer = steering_features(ours, state, 0, tuple(ego.target_lane_index))
    np.testing.assert_allclose(our_steer, ref_steer, atol=1e-4)
