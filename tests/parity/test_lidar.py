"""Lidar observation parity against the reference ray-caster."""

import numpy as np
import jax.numpy as jnp
import pytest

import highwayenv_tpu as ht
from tests.parity.util import ref_to_vehicle_state

gym = pytest.importorskip("gymnasium")
pytest.importorskip("highway_env")

CFG = {"observation": {"type": "LidarObservation"}}


@pytest.mark.parametrize("seed", [0, 4, 9])
def test_lidar_matches_reference(seed):
    ref = gym.make("highway-fast-v0", config=CFG)
    ref.reset(seed=seed)
    # a couple of steps for vehicles to spread into generic poses
    for _ in range(2):
        ref.step(1)
    ours = ht.make("highway-fast-v0", CFG)
    veh = ref_to_vehicle_state(ref, ours)
    obs = np.asarray(
        ours.observation_type.observe(ours.geo, veh, 0)
    )
    ref_obs = ref.unwrapped.observation_type.observe()
    assert obs.shape == ref_obs.shape == (16, 2)
    np.testing.assert_allclose(obs, ref_obs, atol=1e-4)
