"""PolyLane / PolyLaneFixedWidth parity against the reference spline lanes
(mirrors tests/road/test_spline.py + the PolyLane~CircularLane check in
tests/road/test_road.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from highwayenv_tpu.road import lane as lane_ops
from highwayenv_tpu.road.network import (
    PolyLane,
    PolyLaneFixedWidth,
    RoadNetworkBuilder,
)

pytest.importorskip("highway_env")

POINTS = [(0.0, 0.0), (10.0, 2.0), (25.0, 10.0), (40.0, 11.0), (60.0, -5.0)]
LEFT = [(0.0, 3.0), (10.0, 5.0), (25.0, 13.5), (40.0, 14.5), (60.0, -1.0)]
RIGHT = [(0.0, -3.0), (10.0, -1.0), (25.0, 6.5), (40.0, 7.5), (60.0, -9.0)]


def _ref_fixed():
    from highway_env.road.lane import PolyLaneFixedWidth as Ref

    return Ref(POINTS)


def test_host_spec_matches_reference_fixed_width():
    ref = _ref_fixed()
    ours = PolyLaneFixedWidth(POINTS)
    assert abs(ours.length - ref.length) < 1e-9
    for s in np.linspace(-3, ours.length + 3, 37):
        for lat in (-2.0, 0.0, 1.5):
            np.testing.assert_allclose(
                ours.position(s, lat), ref.position(s, lat), atol=1e-9
            )
        assert abs(ours.heading_at(s) - ref.heading_at(s)) < 1e-9
    rng = np.random.default_rng(0)
    for _ in range(25):
        p = rng.uniform([-5, -10], [65, 15])
        np.testing.assert_allclose(
            ours.local_coordinates(p), ref.local_coordinates(p), atol=1e-9
        )


def test_device_kernels_match_reference():
    ref = _ref_fixed()
    net = RoadNetworkBuilder()
    net.add_lane("a", "b", PolyLaneFixedWidth(POINTS))
    geo = net.build()
    lane0 = jnp.int32(0)
    s_vals = np.linspace(0, ref.length, 23)
    for s in s_vals:
        np.testing.assert_allclose(
            np.asarray(
                lane_ops.position(geo, lane0, jnp.float32(s), jnp.float32(1.2))
            ),
            ref.position(s, 1.2),
            atol=1e-4,
        )
        assert (
            abs(
                float(lane_ops.heading_at(geo, lane0, jnp.float32(s)))
                - ref.heading_at(s)
            )
            < 1e-5
        )
    rng = np.random.default_rng(1)
    for _ in range(25):
        p = rng.uniform([-5, -10], [65, 15])
        s, lat = lane_ops.local_coordinates(
            geo, lane0, jnp.asarray(p, jnp.float32)
        )
        rs, rlat = ref.local_coordinates(p)
        assert abs(float(s) - rs) < 1e-3, p
        assert abs(float(lat) - rlat) < 1e-3, p


def test_variable_width_poly_lane():
    from highway_env.road.lane import PolyLane as RefPoly

    ref = RefPoly(POINTS, LEFT, RIGHT)
    ours = PolyLane(POINTS, LEFT, RIGHT)
    for s in np.linspace(0, ref.length, 17):
        assert abs(ours.width_samples()[int(min(s, len(ours.width_samples()) - 1))]
                   - ref.width_at(s)) < 1e-9

    net = RoadNetworkBuilder()
    net.add_lane("a", "b", PolyLane(POINTS, LEFT, RIGHT))
    geo = net.build()
    for s in np.linspace(0, ref.length, 9):
        w = float(lane_ops.width_at(geo, jnp.int32(0), jnp.float32(s)))
        assert abs(w - ref.width_at(s)) < 1e-4


def test_poly_serialization_round_trip():
    net = RoadNetworkBuilder()
    net.add_lane("a", "b", PolyLane(POINTS, LEFT, RIGHT))
    net.add_lane("a", "b", PolyLaneFixedWidth(POINTS, width=6.0))
    cfg = net.to_config()
    net2 = RoadNetworkBuilder.from_config(cfg)
    for i in range(2):
        l1 = net.lanes_on_edge("a", "b")[i]
        l2 = net2.lanes_on_edge("a", "b")[i]
        for s in np.linspace(0, l1.length, 9):
            np.testing.assert_allclose(
                l1.position(s, 0.5), l2.position(s, 0.5), atol=1e-9
            )
