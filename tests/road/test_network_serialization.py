"""Network to_config/from_config round-trips, cross-compatible with the
reference serialization (mirrors tests/road/test_road.py:44-47)."""

import numpy as np
import pytest

import highwayenv_tpu as ht
from highwayenv_tpu.road.network import RoadNetworkBuilder

pytest.importorskip("highway_env")


@pytest.mark.parametrize("env_id", ["merge-v0", "roundabout-v0", "u-turn-v0"])
def test_round_trip(env_id):
    net = ht.make(env_id).net
    cfg = net.to_config()
    net2 = RoadNetworkBuilder.from_config(cfg)
    # serialization nests by from-node, so re-load may reorder edge insertion
    # (exactly like the reference's graph dict); contents must match
    assert set(net.edge_list()) == set(net2.edge_list())
    for (f, t), lanes in net.edges.items():
        for i, lane in enumerate(lanes):
            lane2 = net2.lanes_on_edge(f, t)[i]
            for s in (0.0, lane.length / 2, lane.length):
                np.testing.assert_allclose(
                    lane.position(s, 0.3), lane2.position(s, 0.3), atol=1e-9
                )


def test_reference_can_load_our_config():
    from highway_env.road.road import RoadNetwork

    net = ht.make("merge-v0").net
    ref_net = RoadNetwork.from_config(net.to_config())
    for (f, t), lanes in net.edges.items():
        for i, lane in enumerate(lanes):
            rl = ref_net.get_lane((f, t, i))
            for s in (0.0, lane.length / 2, lane.length):
                np.testing.assert_allclose(
                    lane.position(s, 0.0), rl.position(s, 0.0), atol=1e-9
                )


def test_we_can_load_reference_config():
    import gymnasium as gym

    ref = gym.make("roundabout-v0")
    ref.reset(seed=0)
    cfg = ref.unwrapped.road.network.to_config()
    net = RoadNetworkBuilder.from_config(cfg)
    for (f, t), lanes in net.edges.items():
        for i, lane in enumerate(lanes):
            rl = ref.unwrapped.road.network.get_lane((f, t, i))
            for s in (0.0, rl.length / 2, rl.length):
                np.testing.assert_allclose(
                    lane.position(s, 0.0), rl.position(s, 0.0), atol=1e-9
                )
    # and the loaded network compiles into a geometry table
    geo = net.build()
    assert geo.num_lanes == sum(len(v) for v in net.edges.values())
