"""Interval observer inclusion property + parity with the reference's
IntervalVehicle (mirrors tests/vehicle/test_uncertainty.py)."""

import numpy as np
import pytest

from highwayenv_tpu.ops.uncertainty import IntervalObserver, VehicleInterval
from highwayenv_tpu.road.network import RoadNetworkBuilder

pytest.importorskip("highway_env")

FPS = 15


def _straight_geo():
    return RoadNetworkBuilder.straight_road_network(lanes=4).build()


@pytest.mark.parametrize("mode", ["partial", "predictor"])
def test_interval_contains_true_state(mode):
    from highway_env.road.road import Road, RoadNetwork
    from highway_env.vehicle.uncertainty.prediction import IntervalVehicle

    road = Road(RoadNetwork.straight_road_network())
    ref = IntervalVehicle(road, position=[0, 0], speed=20, heading=0)

    geo = _straight_geo()
    ours = IntervalObserver(
        geo=geo, target_lane=0, target_speed=ref.target_speed
    )
    ours.interval = VehicleInterval.degenerate(
        np.array([0.0, 0.0]), 20.0, 0.0
    )

    for _ in range(2 * FPS):
        ref.step(dt=1 / FPS, mode=mode)
        pos = np.array(ref.position, float)
        if mode == "partial":
            ours.partial_step(1 / FPS, pos, ref.speed)
        else:
            ours.predictor_step(1 / FPS, pos, ref.speed)
        # inclusion of the true (reference) trajectory
        o = ours.interval
        assert o.position[0, 0] <= pos[0] + 1e-6 <= o.position[1, 0] + 2e-6
        assert o.position[0, 1] <= pos[1] + 1e-6 <= o.position[1, 1] + 2e-6
        assert o.heading[0] <= ref.heading + 1e-9
        assert ref.heading <= o.heading[1] + 1e-9
        # parity of the bounds themselves with the reference observer
        np.testing.assert_allclose(
            o.position, ref.interval.position, atol=1e-4
        )
        np.testing.assert_allclose(o.speed, ref.interval.speed, atol=1e-4)
        np.testing.assert_allclose(o.heading, ref.interval.heading, atol=1e-4)
