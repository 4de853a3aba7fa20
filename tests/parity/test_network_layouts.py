"""Road-network layout parity across all scenario families.

Every lane of every env's compiled network must coincide point-by-point with
the reference's lane of the same (from, to, id) index.
"""

import numpy as np
import pytest

import highwayenv_tpu as ht

gym = pytest.importorskip("gymnasium")
pytest.importorskip("highway_env")

ENV_IDS = [
    "highway-v0",
    "merge-v0",
    "merge-generic-v0",
    "two-way-v0",
    "u-turn-v0",
    "exit-v0",
    "roundabout-v0",
    "roundabout-generic-v0",
    "parking-v0",
    "racetrack-v0",
    "racetrack-large-v0",
    "racetrack-oval-v0",
    "intersection-v0",
    "lane-keeping-v0",
]


@pytest.mark.parametrize("env_id", ENV_IDS)
def test_network_layout_matches(env_id):
    ref = gym.make(env_id)
    ref.reset(seed=0)
    ours = ht.make(env_id)
    net = ref.unwrapped.road.network
    ref_count = sum(
        len(lanes) for tos in net.graph.values() for lanes in tos.values()
    )
    our_count = sum(len(lanes) for lanes in ours.net.edges.values())
    assert ref_count == our_count, (env_id, ref_count, our_count)
    for (f, t), lanes in ours.net.edges.items():
        for i, lane in enumerate(lanes):
            rl = net.get_lane((f, t, i))
            assert abs(lane.length - rl.length) < 1e-5, (env_id, f, t, i)
            for s in (0.0, rl.length / 3, rl.length / 2, rl.length):
                np.testing.assert_allclose(
                    lane.position(s, 0.0), rl.position(s, 0.0), atol=1e-5,
                    err_msg=f"{env_id} {(f, t, i)} at s={s}",
                )
                assert (
                    abs(lane.heading_at(s) - rl.heading_at(s)) < 1e-5
                ), (env_id, f, t, i, s)
            # attribute parity
            assert abs(lane.width - rl.width) < 1e-6, (env_id, f, t, i)
            assert bool(lane.forbidden) == bool(rl.forbidden), (env_id, f, t, i)
