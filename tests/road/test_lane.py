"""Lane geometry kernels vs the reference lane objects, point by point."""

import numpy as np
import jax.numpy as jnp
import pytest

from highwayenv_tpu.road import lane as lane_ops
from highwayenv_tpu.road.network import (
    CircularLane,
    RoadNetworkBuilder,
    SineLane,
    StraightLane,
)

ref_lane = pytest.importorskip("highway_env.road.lane")


def _build_single(spec):
    net = RoadNetworkBuilder()
    net.add_lane("a", "b", spec)
    return net.build()


CASES = [
    (
        StraightLane([0, 0], [100, 5], width=4, speed_limit=30),
        ref_lane.StraightLane([0, 0], [100, 5], width=4, speed_limit=30),
    ),
    (
        SineLane([0, 2], [80, 2], amplitude=3.0, pulsation=0.2, phase=0.5),
        ref_lane.SineLane([0, 2], [80, 2], amplitude=3.0, pulsation=0.2, phase=0.5),
    ),
    (
        CircularLane([10, -5], radius=30, start_phase=0.3, end_phase=2.1, clockwise=True),
        ref_lane.CircularLane([10, -5], 30, 0.3, 2.1, clockwise=True),
    ),
    (
        CircularLane([0, 0], radius=20, start_phase=2.5, end_phase=0.5, clockwise=False),
        ref_lane.CircularLane([0, 0], 20, 2.5, 0.5, clockwise=False),
    ),
]


@pytest.mark.parametrize("spec,ref", CASES, ids=["straight", "sine", "circ_cw", "circ_ccw"])
def test_position_heading_roundtrip(spec, ref):
    geo = _build_single(spec)
    lane = jnp.zeros((), jnp.int32)
    assert np.isclose(float(geo.length[0]), ref.length, rtol=1e-5)
    for s in np.linspace(0.0, abs(ref.length), 9):
        for lat in [-1.5, 0.0, 2.0]:
            ours = np.asarray(
                lane_ops.position(geo, lane, jnp.float32(s), jnp.float32(lat))
            )
            theirs = ref.position(s, lat)
            np.testing.assert_allclose(ours, theirs, atol=2e-3)
            np.testing.assert_allclose(
                float(lane_ops.heading_at(geo, lane, jnp.float32(s))),
                ref.heading_at(s),
                atol=1e-4,
            )
            # local_coordinates inverts position
            s2, lat2 = lane_ops.local_coordinates(geo, lane, jnp.asarray(theirs))
            rs, rlat = ref.local_coordinates(np.asarray(theirs))
            np.testing.assert_allclose(float(s2), rs, atol=3e-3)
            np.testing.assert_allclose(float(lat2), rlat, atol=3e-3)


@pytest.mark.parametrize("spec,ref", CASES, ids=["straight", "sine", "circ_cw", "circ_ccw"])
def test_on_lane_and_distance(spec, ref):
    geo = _build_single(spec)
    lane = jnp.zeros((), jnp.int32)
    rng = np.random.default_rng(0)
    for _ in range(50):
        p = rng.uniform(-40, 120, 2)
        s, lat = lane_ops.local_coordinates(geo, lane, jnp.asarray(p))
        ours_on = bool(lane_ops.on_lane(geo, lane, s, lat))
        theirs_on = ref.on_lane(p)
        # skip knife-edge cases where f32 vs f64 flips the boundary
        rs, rlat = ref.local_coordinates(p)
        margin = min(
            abs(abs(rlat) - ref.width_at(rs) / 2),
            abs(rs + 5.0),
            abs(ref.length + 5.0 - rs),
        )
        if margin > 1e-2:
            assert ours_on == theirs_on
        np.testing.assert_allclose(
            float(lane_ops.distance(geo, lane, jnp.asarray(p))),
            ref.distance(p),
            rtol=1e-3, atol=1e-3,
        )
        h = rng.uniform(-np.pi, np.pi)
        np.testing.assert_allclose(
            float(lane_ops.distance_with_heading(geo, lane, jnp.asarray(p), jnp.float32(h))),
            ref.distance_with_heading(p, h),
            rtol=1e-3, atol=2e-3,
        )


def test_closest_lane_matches_reference_network():
    ref_road = pytest.importorskip("highway_env.road.road")
    lanes = 4
    ref_net = ref_road.RoadNetwork.straight_road_network(lanes, speed_limit=30)
    net = RoadNetworkBuilder.straight_road_network(lanes, speed_limit=30)
    geo = net.build()
    rng = np.random.default_rng(1)
    for _ in range(50):
        p = rng.uniform([0, -5], [500, 20])
        h = rng.uniform(-np.pi / 2, np.pi / 2)
        ref_idx = ref_net.get_closest_lane_index(p, h)
        ours = int(lane_ops.closest_lane(geo, jnp.asarray(p), jnp.float32(h)))
        assert ours == net.global_lane_index(ref_idx)


def test_builder_edge_tables():
    net = RoadNetworkBuilder()
    net.add_lane("a", "b", StraightLane([0, 0], [100, 0]))
    net.add_lane("a", "b", StraightLane([0, 4], [100, 4]))
    net.add_lane("b", "c", StraightLane([100, 0], [200, 0]))
    net.add_lane("b", "d", StraightLane([100, 4], [150, 44]))
    geo = net.build()
    assert geo.num_lanes == 4
    assert list(np.asarray(geo.edge_base)) == [0, 0, 2, 3]
    assert list(np.asarray(geo.edge_n)) == [2, 2, 1, 1]
    # lanes 0,1 (a->b) have two successor edges; lanes 2,3 none
    sb = np.asarray(geo.succ_edge_base)
    assert set(sb[0]) == {2, 3}
    assert all(sb[2] == -1) and all(sb[3] == -1)
    pb = np.asarray(geo.pred_edge_base)
    assert pb[2][0] == 0 and pb[3][0] == 0


def test_select_forms_bitwise_match_gather_forms():
    """position_select/heading_at_select/local_coordinates_select (the
    gather-free mask+sum variants used inside fused tick kernels,
    road/regulation.py) must be BITWISE equal to the gather forms on an
    analytic network — both run the same cores on exactly-selected params."""
    import highwayenv_tpu as ht

    env = ht.make("intersection-v0")
    geo = env.geo
    L = geo.num_lanes
    rng = np.random.default_rng(3)
    shape = (64, 7)
    lanes = jnp.asarray(rng.integers(-1, L + 1, shape), jnp.int32)  # incl. OOB
    s = jnp.asarray(rng.uniform(-10, 120, shape), jnp.float32)
    lat = jnp.asarray(rng.uniform(-4, 4, shape), jnp.float32)
    pos = jnp.asarray(rng.uniform(-60, 60, shape + (2,)), jnp.float32)

    import jax

    pg = jax.jit(lambda l, ss, lt: lane_ops.position(geo, l, ss, lt))(lanes, s, lat)
    ps = jax.jit(lambda l, ss, lt: lane_ops.position_select(geo, l, ss, lt))(lanes, s, lat)
    np.testing.assert_array_equal(np.asarray(pg), np.asarray(ps))

    hg = jax.jit(lambda l, ss: lane_ops.heading_at(geo, l, ss))(lanes, s)
    hs = jax.jit(lambda l, ss: lane_ops.heading_at_select(geo, l, ss))(lanes, s)
    np.testing.assert_array_equal(np.asarray(hg), np.asarray(hs))

    lg = jax.jit(lambda l, p_: lane_ops.local_coordinates(geo, l, p_))(lanes, pos)
    ls = jax.jit(lambda l, p_: lane_ops.local_coordinates_select(geo, l, p_))(lanes, pos)
    for a, b in zip(lg, ls):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # select_table matches direct indexing (incl. +inf speed limits)
    st = lane_ops.select_table(geo.speed_limit, lanes, L)
    direct = geo.speed_limit[lane_ops._gather(geo, lanes)]
    np.testing.assert_array_equal(np.asarray(st), np.asarray(direct))


def test_select_forms_poly_fallback():
    """On networks with POLY lanes the select forms fall back to the gather
    implementations (sample banks need real gathers)."""
    from highwayenv_tpu.road.network import PolyLaneFixedWidth

    net = RoadNetworkBuilder()
    net.add_lane("a", "b", StraightLane([0, 0], [50, 0]))
    net.add_lane(
        "a", "c", PolyLaneFixedWidth([[0, 4], [20, 6], [40, 10], [60, 20]])
    )
    geo = net.build()
    lanes = jnp.asarray([0, 1], jnp.int32)
    s = jnp.asarray([5.0, 15.0], jnp.float32)
    lat = jnp.zeros(2, jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(lane_ops.position_select(geo, lanes, s, lat)),
        np.asarray(lane_ops.position(geo, lanes, s, lat)),
    )


def test_predecessor_candidate_order_matches_reference_graph_iteration():
    """PARITY #10 (resolved round 4): the connected-lane candidate table's
    predecessor entries must follow the reference's iteration order — outer
    graph keys in FROM-node first-appearance order (road.py:520-529) — not
    raw edge insertion.  Constructed so the two orders differ: the (b->j)
    edge is inserted AFTER (a->j), but node b first appeared as a from-node
    BEFORE a, so the reference visits b's edge first."""
    ref_road = pytest.importorskip("highway_env.road.road")

    def lanes():
        return {
            # b registers as a from-node first (via an unrelated edge)
            ("b", "w"): StraightLane([-100, 20], [0, 20]),
            ("a", "j"): StraightLane([-100, 8], [0, 0]),
            ("b", "j"): StraightLane([-100, -2], [0, 0]),
            ("j", "k"): StraightLane([0, 0], [100, 0]),
        }

    ref_net = ref_road.RoadNetwork()
    for (f, t), ln in lanes().items():
        ref_net.add_lane(
            f, t, ref_lane.StraightLane(ln.start.tolist(), ln.end.tolist())
        )
    # reference predecessor iteration order for node "j"
    ref_pred_from = [
        fn for fn, to_dict in ref_net.graph.items() if "j" in to_dict
    ]
    assert ref_pred_from == ["b", "a"], "fixture must make orders differ"

    net = RoadNetworkBuilder()
    for (f, t), ln in lanes().items():
        net.add_lane(f, t, ln)
    geo = net.build()

    # query lane (j->k) = global index of that edge's lane 0
    names = list(lanes().keys())
    g_jk = int(np.asarray(geo.edge_base)[names.index(("j", "k"))])
    cand = list(np.asarray(geo.conn_lanes)[g_jk])
    # candidates: [self, successors..., predecessors...]; -1 padded
    cand = [c for c in cand if c >= 0]
    assert cand[0] == g_jk
    # predecessor candidates (negative offsets) in table order
    offs = np.asarray(geo.conn_offsets)[g_jk][: len(cand)]
    preds = [c for c, o in zip(cand, offs) if o < 0]
    # map each predecessor lane to its edge's from-node via edge_base
    base = list(np.asarray(geo.edge_base))
    pred_from = [names[base.index(p)][0] for p in preds]
    assert pred_from == ref_pred_from, (pred_from, ref_pred_from)
