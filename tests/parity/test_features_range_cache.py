"""PARITY #5: Kinematics features_range is frozen at the reset edge.

The reference computes the normalization ranges ONCE per reset from the
ego's edge at first observe (observation.py:214-226 — the observation
object is recreated by define_spaces each reset, then ``if not
self.features_range:`` caches on the first call) and keeps them for the
whole episode.  On merge-v0 the ego spawns on the 2-lane ("a","b") edge
but drives onto the 3-lane ("b","c") merge section mid-episode; a per-step
recompute (the engine's round-2..4 behavior) widens the y range from +/-8
to +/-12 there and diverges.  These tests pin the frozen-at-reset
semantics against the live reference with the ego ON the 3-lane section.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import highwayenv_tpu as ht
from highwayenv_tpu.observations.kinematics import KinematicsObservation
from tests.parity.util import ref_to_vehicle_state

gym = pytest.importorskip("gymnasium")
pytest.importorskip("highway_env")


def _merge_pair_on_3lane_section(seed=0):
    """Reference merge env with the ego teleported onto ("b","c") —
    where the edge lane-count differs from the reset edge — plus the
    injected engine scene."""
    ref = gym.make("merge-v0")
    ref.reset(seed=seed)
    renv = ref.unwrapped
    # first observe already happened inside reset -> ranges cached (+/-8)
    assert renv.observation_type.features_range["y"] == [-8.0, 8.0]
    ego = renv.vehicle
    lane = renv.road.network.get_lane(("b", "c", 1))
    ego.position = lane.position(10.0, 0.0)
    ego.heading = lane.heading_at(10.0)
    ego.lane_index = ("b", "c", 1)
    ego.lane = lane
    assert len(renv.road.network.all_side_lanes(ego.lane_index)) == 3
    ref_obs = renv.observation_type.observe()
    # the cache must still be the reset edge's
    assert renv.observation_type.features_range["y"] == [-8.0, 8.0]

    ours = ht.make("merge-v0")
    veh = ref_to_vehicle_state(ref, ours)
    return ref_obs, ours, veh


def test_merge_obs_uses_reset_edge_ranges():
    ref_obs, ours, veh = _merge_pair_on_3lane_section()
    assert ours.observation_type.reset_edge_lanes == 2
    obs = np.asarray(ours.observation_type.observe(ours.geo, veh, 0))
    np.testing.assert_allclose(obs, ref_obs, atol=2e-4)


def test_per_step_recompute_would_diverge():
    """Teeth: with the frozen range disabled the same scene normalizes
    differently (the old behavior really was a deviation)."""
    ref_obs, ours, veh = _merge_pair_on_3lane_section()
    loose = KinematicsObservation(
        features=ours.observation_type.features,
        vehicles_count=ours.observation_type.vehicles_count,
        reset_edge_lanes=None,
    )
    obs = np.asarray(loose.observe(ours.geo, veh, 0))
    assert np.abs(obs - ref_obs).max() > 1e-3


def test_exit_env_reset_edge_lanes():
    """exit-v0's ego spawn edge has lanes_count (6) lanes; the exit
    section has 7 — the static cache must be 6."""
    ours = ht.make("exit-v0")
    assert ours.observation_type.reset_edge_lanes == 6
