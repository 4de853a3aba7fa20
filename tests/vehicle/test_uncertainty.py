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


def test_observer_step_batch_matches_host():
    """The jittable fleet kernel (observer_step_batch) reproduces the
    per-vehicle host observer, with and without a leading vehicle."""
    import jax
    import jax.numpy as jnp
    from highwayenv_tpu.ops import uncertainty as unc

    geo = _straight_geo()
    rng = np.random.default_rng(3)
    B = 8
    hosts = []
    for i in range(B):
        ob = unc.IntervalObserver(geo=geo, target_lane=0, target_speed=25.0)
        p = np.array([10.0 * i, rng.uniform(-1, 1)])
        ob.interval = unc.VehicleInterval(
            position=np.array([p - 0.2, p + 0.2]),
            speed=np.array([18.0, 19.0]) + i,
            heading=np.array([-0.05, 0.05]),
        )
        hosts.append(ob)

    front = unc.VehicleInterval(
        position=np.array([[400.0, -0.1], [401.0, 0.1]]),
        speed=np.array([15.0, 16.0]),
        heading=np.array([0.0, 0.0]),
    )

    pos_i = jnp.asarray(np.stack([h.interval.position for h in hosts]))
    spd_i = jnp.asarray(np.stack([h.interval.speed for h in hosts]))
    hdg_i = jnp.asarray(np.stack([h.interval.heading for h in hosts]))
    lanes = jnp.zeros((B,), jnp.int32)
    ts = jnp.full((B,), 25.0)
    th_a = jnp.asarray(np.stack([h.theta_a_i for h in hosts]))
    th_b = jnp.asarray(np.stack([h.theta_b_i for h in hosts]))
    meas = jnp.asarray(np.stack([h.interval.position.mean(0) for h in hosts]))
    fmask = jnp.asarray(np.arange(B) % 2 == 0)
    fpos = jnp.broadcast_to(jnp.asarray(front.position), (B, 2, 2))
    fspd = jnp.broadcast_to(jnp.asarray(front.speed), (B, 2))

    step = jax.jit(
        lambda *a: unc.observer_step_batch(geo, *a)
    )
    new_pos, new_spd, new_hdg = step(
        lanes, ts, th_a, th_b, pos_i, spd_i, hdg_i, meas, 0.1,
        fpos, fspd, fmask,
    )

    for i, h in enumerate(hosts):
        f = front if i % 2 == 0 else None
        h.observer_step(0.1, np.asarray(meas[i]), 18.5, f)
        np.testing.assert_allclose(
            np.asarray(new_pos[i]), h.interval.position, atol=2e-4,
            err_msg=f"row {i} position",
        )
        np.testing.assert_allclose(
            np.asarray(new_spd[i]), h.interval.speed, atol=2e-4,
            err_msg=f"row {i} speed",
        )
        np.testing.assert_allclose(
            np.asarray(new_hdg[i]), h.interval.heading, atol=2e-4,
            err_msg=f"row {i} heading",
        )


def test_worst_case_collision_matches_reference():
    """worst_case_collision vs the reference's
    IntervalVehicle.handle_collisions (prediction.py:459-496) over a grid
    of ego poses around an uncertainty box."""
    from highway_env.road.road import Road, RoadNetwork
    from highway_env.vehicle.controller import MDPVehicle
    from highway_env.vehicle.uncertainty.prediction import IntervalVehicle

    from highwayenv_tpu.ops.uncertainty import (
        VehicleInterval,
        worst_case_collision,
    )

    road = Road(network=RoadNetwork.straight_road_network(2))
    lane = road.network.get_lane(("0", "1", 0))
    for x in np.linspace(-12.0, 20.0, 9):
        for y in np.linspace(-4.0, 4.0, 5):
            iv = IntervalVehicle(road, lane.position(50.0, 0.0), heading=0.0, speed=20.0)
            iv.interval.position = np.array(
                [iv.position - [4.0, 1.0], iv.position + [4.0, 1.0]]
            )
            other = MDPVehicle(road, iv.position + [x, y], heading=0.1, speed=15.0)
            iv.handle_collisions(other)
            ref_hit = bool(iv.crashed)

            box = VehicleInterval(
                position=np.array(iv.interval.position, float),
                speed=np.array([20.0, 20.0]),
                heading=np.array([0.0, 0.0]),
            )
            hit, proj = worst_case_collision(
                box, 0.0, other.position, other.LENGTH, other.WIDTH, 0.1,
                self_length=iv.LENGTH, self_width=iv.WIDTH,
            )
            assert hit == ref_hit, (x, y, proj)
