"""Seeded reset parity: replay the reference's NumPy draw schedule on host.

The reference seeds one ``np.random.Generator`` per env
(gymnasium ``Env.reset(seed=...)`` -> ``seeding.np_random(seed)``) and every
scene draw — spawn lane choices, speeds, longitudinal offsets, behavior
randomization — consumes that generator in a strict order fixed by the
Python control flow of each scenario's ``_create_vehicles``
(`/root/reference/highway_env/envs/common/abstract.py:219-257`,
`/root/reference/highway_env/vehicle/kinematics.py:50-104`).

This module re-implements those draw schedules host-side with the *same*
Generator API calls in the *same* order, so ``reset(seed=s)`` produces the
byte-identical initial scene, which then feeds the batched device engine.
The jitted ``jax.random`` reset path remains for high-throughput rollouts
(PARITY #6); this host path backs the Gymnasium adapter and the parity
suite.

Supported: every registered id — highway (+fast), merge (+generic),
roundabout (+generic), parking (+variants), intersection (incl. the 3 s
warm-up, which consumes no draws in the reference and is simulated with
the device engine), two-way, u-turn, exit, racetrack (+large +oval),
lane-keeping.  The one excluded *mode* is racetrack-oval with a random
layout (length=0 / no_lanes=0): the reference's layout RNG is unseeded
(`np.random.default_rng()`, racetrack_env.py:939), so the reference
itself is non-reproducible there and the jax reset path is used.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

from highwayenv_tpu.vehicle.state import (
    KIND_EGO,
    KIND_IDM,
    KIND_LANDMARK,
    KIND_LINEAR,
    KIND_OBSTACLE,
    KIND_PLAIN,
    VEHICLE_LENGTH,
    VEHICLE_WIDTH,
    empty_state,
)

# IDMVehicle.DELTA_RANGE (vehicle/behavior.py:46) and LANE_CHANGE_DELAY (:44)
DELTA_RANGE = (3.5, 4.5)
LANE_CHANGE_DELAY = 1.0
DEFAULT_INITIAL_SPEEDS = (23.0, 25.0)  # Vehicle.DEFAULT_INITIAL_SPEEDS


def np_random(seed):
    """The reference's generator: gymnasium.utils.seeding.np_random
    (Generator(PCG64(SeedSequence(seed))))."""
    from gymnasium.utils import seeding

    rng, _ = seeding.np_random(seed)
    return rng


# --------------------------------------------------------------------------- #
# host scene records
# --------------------------------------------------------------------------- #
@dataclasses.dataclass
class HostVehicle:
    """Host-side spawn record (the fields scene_to_state consumes)."""

    kind: int
    position: np.ndarray
    heading: float = 0.0
    speed: float = 0.0
    lane_index: tuple | None = None
    target_lane_index: tuple | None = None
    target_speed: float = 0.0
    speed_index: int = 0
    route: list | None = None
    delta: float = 4.0
    timer: float = 0.0
    enable_lane_change: bool = True
    length: float = VEHICLE_LENGTH
    width: float = VEHICLE_WIDTH
    check_collisions: bool = True
    is_ego: bool = False
    slot: int | None = None  # explicit engine slot (else list-order packing)


def graph_order(net):
    """(from -> [to, ...]) in the reference's nested-dict iteration order:
    _from nodes by first appearance, _to nodes by first appearance within
    each _from (road/road.py:21-39 graph construction)."""
    order: dict[str, list[str]] = {}
    for (f, t) in net.edges.keys():
        order.setdefault(f, [])
        if t not in order[f]:
            order[f].append(t)
    return order


def closest_lane_index(net, position, heading=None):
    """network.get_closest_lane_index (road/road.py:55-71): first argmin of
    lane.distance_with_heading over the nested graph order."""
    best, best_d = None, np.inf
    for f, tos in graph_order(net).items():
        for t in tos:
            for i, lane in enumerate(net.lanes_on_edge(f, t)):
                s, r = lane.local_coordinates(position)
                d = abs(r) + max(s - lane.length, 0) + max(0 - s, 0)
                if heading is not None:
                    angle = (heading - lane.heading_at(s) + np.pi) % (
                        2 * np.pi
                    ) - np.pi
                    d += abs(angle)
                if d < best_d:
                    best, best_d = (f, t, i), d
    return best


def plan_route_to(net, lane_index, destination):
    """ControlledVehicle.plan_route_to (vehicle/controller.py:71-87)."""
    path = net.bfs_shortest_path(lane_index[1], destination)
    if path:
        return [lane_index] + [
            (path[i], path[i + 1], None) for i in range(len(path) - 1)
        ]
    return [lane_index]


def near_split(x, num_bins):
    """utils.near_split (reference utils.py:382-391)."""
    quotient, remainder = divmod(x, num_bins)
    return [quotient + 1] * remainder + [quotient] * (num_bins - remainder)


# --------------------------------------------------------------------------- #
# reference constructors (draw-free, position/lane bookkeeping only)
# --------------------------------------------------------------------------- #
def _controlled(env, net, position, heading=0.0, speed=0.0):
    """action_type.vehicle_class(road, position, heading, speed): plain
    Vehicle for continuous actions, MDPVehicle (target-speed snapping,
    controller.py:256-290) for DiscreteMetaAction."""
    position = np.asarray(position, np.float64)
    lane_index = closest_lane_index(net, position, heading)
    v = HostVehicle(
        kind=KIND_EGO,
        position=position,
        heading=float(heading),
        speed=float(speed),
        lane_index=lane_index,
        target_lane_index=lane_index,
        target_speed=float(speed),
        is_ego=True,
    )
    ts = getattr(env.action_type, "target_speeds", None)
    if ts is not None:
        ts = np.asarray(ts, np.float64)
        # speed_to_index with clip (controller.py:330-344)
        x = (v.target_speed - ts[0]) / (ts[-1] - ts[0])
        idx = int(np.clip(np.round(x * (len(ts) - 1)), 0, len(ts) - 1))
        v.speed_index = idx
        v.target_speed = float(ts[idx])
    return v


def _idm(net, position, heading=0.0, speed=0.0, target_speed=None):
    """IDMVehicle(road, position, ...) (vehicle/behavior.py:48-64): timer
    seeded from the position, DELTA defaults until randomize_behavior."""
    position = np.asarray(position, np.float64)
    lane_index = closest_lane_index(net, position, heading)
    return HostVehicle(
        kind=KIND_IDM,
        position=position,
        heading=float(heading),
        speed=float(speed),
        lane_index=lane_index,
        target_lane_index=lane_index,
        target_speed=float(speed if target_speed is None else target_speed),
        delta=4.0,
        timer=float((np.sum(position) * np.pi) % LANE_CHANGE_DELAY),
    )


def _make_on_lane(net, lane_index, longitudinal, speed=None, ctor=_idm):
    """RoadObject.make_on_lane (vehicle/objects.py:69-95)."""
    lane = net.get_lane(lane_index)
    if speed is None:
        speed = lane.speed_limit
    return ctor(
        net,
        lane.position(longitudinal, 0),
        heading=lane.heading_at(longitudinal),
        speed=speed,
    )


def _create_random(
    env,
    rng,
    existing,
    ctor,
    speed=None,
    lane_from=None,
    lane_to=None,
    lane_id=None,
    spacing=1.0,
):
    """Vehicle.create_random draw schedule (vehicle/kinematics.py:50-104):
    choice(from), choice(to), choice(id), [uniform speed], uniform offset."""
    net = env.net
    order = graph_order(net)
    _from = lane_from or rng.choice(list(order.keys()))
    _to = lane_to or rng.choice(order[_from])
    lanes = net.lanes_on_edge(_from, _to)
    _id = lane_id if lane_id is not None else rng.choice(len(lanes))
    lane = lanes[int(_id)]
    if speed is None:
        if lane.speed_limit is not None:
            speed = rng.uniform(0.7 * lane.speed_limit, 0.8 * lane.speed_limit)
        else:
            speed = rng.uniform(*DEFAULT_INITIAL_SPEEDS)
    default_spacing = 12 + 1.0 * speed
    offset = spacing * default_spacing * np.exp(-5 / 40 * len(lanes))
    x0 = (
        max(lane.local_coordinates(v.position)[0] for v in existing)
        if existing
        else 3 * offset
    )
    x0 += offset * rng.uniform(0.9, 1.1)
    return ctor(net, lane.position(x0, 0), lane.heading_at(x0), float(speed))


def _randomize_idm(v, rng):
    """IDMVehicle.randomize_behavior (behavior.py:66-69)."""
    v.delta = float(rng.uniform(*DELTA_RANGE))
    return v


# --------------------------------------------------------------------------- #
# per-scenario draw schedules
# --------------------------------------------------------------------------- #
def _spawns_highway(env, rng):
    """HighwayEnv._create_vehicles (envs/highway_env.py:72-99)."""
    cfg = env.config
    objs = []
    for others in near_split(cfg["vehicles_count"], cfg["controlled_vehicles"]):
        ego_seed = _create_random(
            env,
            rng,
            objs,
            ctor=lambda net, p, h, s: HostVehicle(
                kind=KIND_PLAIN, position=np.asarray(p, np.float64),
                heading=float(h), speed=float(s),
            ),
            speed=25.0,
            lane_id=cfg["initial_lane_id"],
            spacing=cfg["ego_spacing"],
        )
        ego = _controlled(
            env, env.net, ego_seed.position, ego_seed.heading, ego_seed.speed
        )
        objs.append(ego)
        for _ in range(others):
            v = _create_random(
                env, rng, objs, ctor=_idm,
                spacing=1 / cfg["vehicles_density"],
            )
            _randomize_idm(v, rng)
            objs.append(v)
    return objs


def _spawns_merge(env, rng):
    """MergeEnv._make_vehicles (envs/merge_env.py:160-185)."""
    net = env.net
    objs = []
    ego = _controlled(
        env, net, net.get_lane(("a", "b", 1)).position(30.0, 0.0), speed=30.0
    )
    objs.append(ego)
    for position, speed in [(90.0, 29.0), (70.0, 31.0), (5.0, 31.5)]:
        lane = net.get_lane(("a", "b", int(rng.integers(2))))
        pos = lane.position(position + rng.uniform(-5.0, 5.0), 0.0)
        speed += rng.uniform(-1.0, 1.0)
        objs.append(_idm(net, pos, speed=float(speed)))
    merging = _idm(
        net, net.get_lane(("j", "k", 0)).position(110.0, 0.0), speed=20.0,
        target_speed=30.0,
    )
    objs.append(merging)
    # end-of-ramp obstacle (merge_env.py:158, placed in _make_road)
    opos = np.asarray(env._obstacle_pos, np.float64)
    objs.append(
        HostVehicle(
            kind=KIND_OBSTACLE, position=opos, length=2.0, width=2.0,
            lane_index=closest_lane_index(net, opos, 0.0),
        )
    )
    return objs


def _spawns_roundabout(env, rng):
    """RoundaboutEnv._make_vehicles (envs/roundabout_env.py:327-391)."""
    net = env.net
    cfg = env.config
    position_deviation = 2.0
    speed_deviation = 2.0
    objs = []

    ego_lane = net.get_lane(("ser", "ses", 0))
    ego = _controlled(
        env, net, ego_lane.position(125.0, 0.0), speed=8.0,
        heading=ego_lane.heading_at(140.0),
    )
    ego.route = plan_route_to(net, ego.lane_index, "nxs")
    objs.append(ego)

    destinations = ["exr", "sxr", "nxr"]

    def incoming(lane_index, longitudinal_base, dest=None):
        v = _make_on_lane(
            net, lane_index,
            longitudinal=longitudinal_base + rng.normal() * position_deviation,
            speed=16.0 + rng.normal() * speed_deviation,
        )
        v.route = plan_route_to(
            net, v.lane_index, dest if dest is not None else rng.choice(destinations)
        )
        _randomize_idm(v, rng)
        objs.append(v)

    dest0 = None
    if cfg["incoming_vehicle_destination"] is not None:
        dest0 = destinations[cfg["incoming_vehicle_destination"]]
    incoming(("we", "sx", 1), 5.0, dest0)
    for i in [1, -1]:
        incoming(("we", "sx", 0), 20.0 * float(i))
    incoming(("eer", "ees", 0), 50.0)
    return objs


def _spawns_parking(env, rng):
    """ParkingEnv._create_vehicles (envs/parking_env.py:182-230)."""
    net = env.net
    cfg = env.config
    objs = []
    empty_spots = [
        (f, t, i)
        for f, tos in graph_order(net).items()
        for t in tos
        for i in range(len(net.lanes_on_edge(f, t)))
    ]

    egos = []
    for i in range(cfg["controlled_vehicles"]):
        x0 = float(i - cfg["controlled_vehicles"] // 2) * 10.0
        ego = _controlled(
            env, net, [x0, 0.0], heading=2.0 * np.pi * rng.uniform(), speed=0.0
        )
        objs.append(ego)
        egos.append(ego)
        empty_spots.remove(ego.lane_index)

    goals = []
    for k, ego in enumerate(egos):
        lane_index = empty_spots[int(rng.choice(np.arange(len(empty_spots))))]
        lane = net.get_lane(lane_index)
        goals.append(
            HostVehicle(
                slot=env._goal_base + k,
                kind=KIND_LANDMARK,
                position=np.asarray(lane.position(lane.length / 2, 0), np.float64),
                heading=float(lane.heading),
                lane_index=closest_lane_index(
                    net, lane.position(lane.length / 2, 0), lane.heading
                ),
                length=2.0,  # Landmark inherits RoadObject 2x2
                width=2.0,
            )
        )
        empty_spots.remove(lane_index)

    npcs = []
    for _ in range(cfg["vehicles_count"]):
        if not empty_spots:
            continue
        lane_index = empty_spots[int(rng.choice(np.arange(len(empty_spots))))]
        v = _make_on_lane(
            net, lane_index, longitudinal=4.0, speed=0.0,
            ctor=lambda net, p, heading=0.0, speed=0.0: HostVehicle(
                kind=KIND_PLAIN, position=np.asarray(p, np.float64),
                heading=float(heading), speed=float(speed),
                lane_index=closest_lane_index(net, p, heading),
                slot=cfg["controlled_vehicles"] + len(npcs),
            ),
        )
        npcs.append(v)
        objs.append(v)
        empty_spots.remove(lane_index)

    walls = []
    if cfg.get("add_walls", True):
        width, height = 70.0, 42.0
        wb = env._wall_base
        for y in (-height / 2, height / 2):
            walls.append(
                HostVehicle(
                    slot=wb + len(walls),
                    kind=KIND_OBSTACLE, position=np.array([0.0, y]),
                    length=width, width=1.0,
                    lane_index=closest_lane_index(net, [0.0, y], 0.0),
                )
            )
        for x in (-width / 2, width / 2):
            walls.append(
                HostVehicle(
                    slot=wb + len(walls),
                    kind=KIND_OBSTACLE, position=np.array([x, 0.0]),
                    heading=np.pi / 2, length=height, width=1.0,
                    lane_index=closest_lane_index(net, [x, 0.0], np.pi / 2),
                )
            )
    # reference list order: vehicles (egos + parked) then objects
    # (goal landmarks, then walls)
    return objs + goals + walls


def _spawns_two_way(env, rng):
    """TwoWayEnv._make_vehicles (envs/two_way_env.py:117-159)."""
    net = env.net
    objs = []
    ego = _controlled(
        env, net, net.get_lane(("a", "b", 1)).position(30.0, 0.0), speed=30.0
    )
    objs.append(ego)
    # same-direction traffic on ("a","b",1): IDMVehicle(position, heading,
    # speed, enable_lane_change=False)
    ab1 = net.get_lane(("a", "b", 1))
    for i in range(3):
        v = _idm(
            net,
            ab1.position(70.0 + 40.0 * float(i) + 10.0 * rng.normal(), 0.0),
            heading=ab1.heading_at(70.0 + 40.0 * float(i)),
            speed=24.0 + 2.0 * rng.normal(),
        )
        v.enable_lane_change = False
        objs.append(v)
    # oncoming traffic on ("b","a",0); target_lane_index set explicitly
    ba0 = net.get_lane(("b", "a", 0))
    for i in range(2):
        v = _idm(
            net,
            ba0.position(200.0 + 100.0 * float(i) + 10.0 * rng.normal(), 0.0),
            heading=ba0.heading_at(200.0 + 100.0 * float(i)),
            speed=20.0 + 5.0 * rng.normal(),
        )
        v.enable_lane_change = False
        v.target_lane_index = ("b", "a", 0)
        objs.append(v)
    return objs


def _spawns_u_turn(env, rng):
    """UTurnEnv._make_vehicles (envs/u_turn_env.py:179-274): ego exact on
    ("a","b",0), six IDM blockers with N(0,2) jitter; only vehicle 1 calls
    randomize_behavior."""
    net = env.net
    objs = []
    ego_lane = net.get_lane(("a", "b", 0))
    ego = _controlled(env, net, ego_lane.position(0, 0), speed=16.0)
    ego.route = plan_route_to(net, ego.lane_index, "d")
    objs.append(ego)

    npcs = [
        (("a", "b", 0), 25.0, 13.5, True),
        (("a", "b", 1), 56.0, 14.5, False),
        (("b", "c", 1), 0.5, 4.5, False),
        (("b", "c", 0), 17.5, 5.5, False),
        (("c", "d", 0), 1.0, 3.5, False),
        (("c", "d", 1), 30.0, 5.5, False),
    ]
    for lane_index, s, speed, randomize in npcs:
        v = _make_on_lane(
            net, lane_index,
            longitudinal=s + rng.normal() * 2.0,
            speed=speed + rng.normal() * 2.0,
        )
        v.route = plan_route_to(net, v.lane_index, "d")
        if randomize:
            _randomize_idm(v, rng)
        objs.append(v)
    return objs


def _spawns_exit(env, rng):
    """ExitEnv._create_vehicles (envs/exit_env.py:109-143)."""
    net = env.net
    cfg = env.config
    objs = []
    for _ in range(cfg["controlled_vehicles"]):
        seed_v = _create_random(
            env, rng, objs,
            ctor=lambda net, p, h, s: HostVehicle(
                kind=KIND_PLAIN, position=np.asarray(p, np.float64),
                heading=float(h), speed=float(s),
            ),
            speed=25.0, lane_from="0", lane_to="1", lane_id=0,
            spacing=cfg["ego_spacing"],
        )
        objs.append(
            _controlled(env, net, seed_v.position, seed_v.heading, seed_v.speed)
        )
    for _ in range(cfg["vehicles_count"]):
        lanes = np.arange(cfg["lanes_count"])
        lane_id = int(
            rng.choice(lanes, size=1, p=lanes / lanes.sum()).astype(int)[0]
        )
        lane = net.get_lane(("0", "1", lane_id))
        v = _create_random(
            env, rng, objs, ctor=_idm,
            lane_from="0", lane_to="1", lane_id=lane_id,
            speed=lane.speed_limit,
            spacing=1 / cfg["vehicles_density"],
        )
        v.route = plan_route_to(net, v.lane_index, "3")
        v.enable_lane_change = False
        objs.append(v)
    return objs


def _spawns_roundabout_generic(env, rng):
    """RoundaboutGenericEnv._make_vehicles (envs/roundabout_env.py:600+):
    rejection-sampled spawns over fixed spawn edges; draw order per try is
    integers(edge), integers(lane), uniform(longitudinal); on success
    normal(speed), [integers(destination)], then randomize DELTA."""
    cfg = env.config
    net = env.net
    destinations = ["exr", "sxr", "nxr", "wxr"]
    objs = []
    ego_lane = net.get_lane(("ser", "ses", 0))
    ego_long = ego_lane.length - 2.5
    ego = _controlled(
        env, net, ego_lane.position(ego_long, 0.0), speed=8.0,
        heading=ego_lane.heading_at(ego_long),
    )
    ego.route = plan_route_to(net, ego.lane_index, "nxs")
    objs.append(ego)

    spawn_lanes = [
        ("we", "sx"), ("sx", "se"), ("ee", "nx"), ("nx", "ne"),
        ("eer", "ees"), ("ner", "nes"), ("wer", "wes"),
    ]
    points = [np.asarray(ego_lane.position(ego_long, 0.0))]
    for _ in range(cfg["vehicles_count"]):
        for _ in range(10):
            lt = spawn_lanes[int(rng.integers(0, len(spawn_lanes)))]
            li = int(rng.integers(0, len(net.lanes_on_edge(*lt))))
            lane_id = (lt[0], lt[1], li)
            lane = net.get_lane(lane_id)
            lon = float(rng.uniform(5.0, max(5.0, lane.length - 5.0)))
            cand = np.asarray(lane.position(lon, 0.0))
            if any(np.linalg.norm(cand - pt) < 7.0 for pt in points):
                continue
            v = _make_on_lane(
                net, lane_id, longitudinal=lon,
                speed=14.0 + float(rng.normal()) * 2.0,
            )
            if cfg.get("incoming_vehicle_destination") is not None:
                dest = destinations[
                    min(
                        cfg["incoming_vehicle_destination"],
                        len(destinations) - 1,
                    )
                ]
            else:
                dest = destinations[int(rng.integers(0, len(destinations)))]
            v.route = plan_route_to(net, v.lane_index, dest)
            _randomize_idm(v, rng)
            objs.append(v)
            points.append(cand)
            break
    return objs


def _spawns_merge_generic(env, rng):
    """MergeGenericEnv._make_vehicles (envs/merge_env.py:320-368):
    rejection-sampled NPC spawns (10 tries each, 15 m clearance) with a
    strict draw order — integers(lane), uniform(position), and
    uniform(speed) only on success."""
    cfg = env.config
    net = env.net
    lanes = cfg["lanes_count"]
    vc = cfg["vehicles_count"]
    max_pos = (
        cfg["before_merge_length"]
        + cfg["converge_merge_length"]
        + cfg["parallel_merge_length"]
    )
    objs = []
    ego_long = 30.0
    ego = _controlled(
        env, net,
        net.get_lane(("a", "b", lanes - 1)).position(ego_long, 0.0),
        speed=30.0,
    )
    objs.append(ego)

    spawned = {i: [] for i in range(lanes)}
    spawned[lanes - 1].append(ego_long)
    n = 0
    for _ in range(vc):
        for _ in range(10):
            li = int(rng.integers(lanes))
            lon = float(rng.uniform(0, max_pos))
            if all(abs(lon - p) > 15.0 for p in spawned[li]):
                spd = 30.0 + float(rng.uniform(-2.0, 2.0))
                v = _idm(
                    net, net.get_lane(("a", "b", li)).position(lon, 0.0),
                    speed=spd,
                )
                v.slot = 1 + n
                n += 1
                spawned[li].append(lon)
                objs.append(v)
                break

    merging = _idm(
        net, net.get_lane(("j", "k", 0)).position(ego_long + 30.0, 0.0),
        speed=20.0, target_speed=30.0,
    )
    merging.slot = 1 + vc
    objs.append(merging)
    opos = np.asarray(env._obstacle_pos, np.float64)
    objs.append(
        HostVehicle(
            kind=KIND_OBSTACLE, position=opos, length=2.0, width=2.0,
            lane_index=closest_lane_index(net, opos, 0.0),
            slot=2 + vc,
        )
    )
    return objs


def _spawns_lane_keeping(env, rng):
    """LaneKeepingEnv._make_vehicles (envs/lane_keeping_env.py:129-139):
    fully deterministic (the generator is consumed only by the
    AttributesObservation noise during stepping)."""
    net = env.net
    lane = net.get_lane(("c", "d", 0))
    ego = _controlled(
        env, net, lane.position(50, -4), heading=lane.heading_at(0), speed=8.3
    )
    return [ego]


def _random_lane_index(net, rng):
    """RoadNetwork.random_lane_index (road/road.py:364-368)."""
    order = graph_order(net)
    _from = rng.choice(list(order.keys()))
    _to = rng.choice(order[_from])
    _id = int(rng.integers(len(net.lanes_on_edge(_from, _to))))
    return (_from, _to, _id)


def _spawns_racetrack(env, rng, n_first=2):
    """RacetrackEnv._make_vehicles (envs/racetrack_env.py:374-426).

    ``n_first`` is the ego's first-lane draw width: the base/large tracks
    draw ``rng.integers(2)`` (racetrack_env.py:385); the oval draws
    ``rng.integers(no_lanes)`` (racetrack_env.py:1352) — everything else
    in the draw schedule is identical between the two.
    """
    net = env.net
    cfg = env.config
    objs = []
    lane_index = None
    for i in range(cfg["controlled_vehicles"]):
        lane_index = (
            ("a", "b", int(rng.integers(n_first)))
            if i == 0
            else _random_lane_index(net, rng)
        )
        longitudinal = float(rng.uniform(20, 50))
        v = _make_on_lane(
            net, lane_index, longitudinal,
            ctor=lambda net, p, heading=0.0, speed=0.0: _controlled(
                env, net, p, heading, speed
            ),
        )
        objs.append(v)

    if cfg["other_vehicles"] > 0:
        front = _make_on_lane(
            net,
            ("b", "c", int(lane_index[-1])),
            longitudinal=float(
                rng.uniform(0.0, net.get_lane(("b", "c", 0)).length)
            ),
            speed=6.0 + float(rng.uniform(high=3.0)),
        )
        objs.append(front)

        for _ in range(int(rng.integers(cfg["other_vehicles"]))):
            rand_lane = _random_lane_index(net, rng)
            v = _make_on_lane(
                net, rand_lane,
                longitudinal=float(
                    rng.uniform(0.0, net.get_lane(rand_lane).length)
                ),
                speed=6.0 + float(rng.uniform(high=3.0)),
            )
            # prevent early collisions (racetrack_env.py:420-425)
            if all(
                np.linalg.norm(v.position - np.asarray(o.position)) >= 20
                for o in objs
            ):
                objs.append(v)
    return objs


def _spawns_racetrack_oval(env, rng):
    """RacetrackEnvOval._make_vehicles (envs/racetrack_env.py:1340-1393).

    Identical draw schedule to the base racetrack except the ego's first
    lane is drawn over all ``no_lanes`` lanes.  The oval's *layout* RNG
    (racetrack_env.py:939 ``np.random.default_rng()``) is unseeded in the
    reference and consumes no draws under the default config
    (length/no_lanes both non-zero); with length=0 or no_lanes=0 the
    reference itself is non-reproducible, so that mode stays on the jax
    reset path.
    """
    return _spawns_racetrack(env, rng, n_first=int(env.config["no_lanes"]))


def _spawn_vehicle_intersection(env, rng, vehicles, longitudinal=0.0,
                                position_deviation=1.0, speed_deviation=1.0,
                                spawn_probability=0.6, go_straight=False):
    """IntersectionEnv._spawn_vehicle (envs/intersection_env.py:324-352)."""
    net = env.net
    if rng.uniform() > spawn_probability:
        return None
    route = rng.choice(range(4), size=2, replace=False)
    route[1] = (route[0] + 2) % 4 if go_straight else route[1]
    v = _make_on_lane(
        net,
        (f"o{route[0]}", f"ir{route[0]}", 0),
        longitudinal=longitudinal + 5.0 + rng.normal() * position_deviation,
        speed=8.0 + rng.normal() * speed_deviation,
    )
    for other in vehicles:
        if np.linalg.norm(np.asarray(other.position) - v.position) < 15:
            return None
    v.route = plan_route_to(net, v.lane_index, f"o{route[1]}")
    _randomize_idm(v, rng)
    vehicles.append(v)
    return v


# --------------------------------------------------------------------------- #
# scene -> VehicleState
# --------------------------------------------------------------------------- #
def scene_to_state(env, objs, dtype=None):
    """Build the engine's VehicleState from host spawn records (the package
    twin of the test harness's reference-scene injection).

    ``dtype`` (default float32) sets the float dtype of the produced state;
    pass jnp.float64 under JAX_ENABLE_X64 for full-precision parity runs."""
    import jax
    import jax.numpy as jnp

    dtype = dtype or jnp.float32

    net = env.net
    V = env.num_slots
    if len(objs) > V:
        raise ValueError(f"{len(objs)} objects > {V} slots")
    R = getattr(env, "route_slots", 1)
    st = empty_state(V, route_slots=R)
    ego_slots = list(env.ego_slots)
    free_slots = [i for i in range(V) if i not in set(ego_slots)]

    def _host(x):
        x = np.asarray(x)
        return x.astype(np.float64) if np.issubdtype(x.dtype, np.floating) else x.copy()

    arr = {
        name: _host(getattr(st, name))
        for name in (
            "pos heading speed lane target_lane target_speed speed_index "
            "timer delta crashed kind length width check_collisions "
            "enable_lane_change route_base route_n route_id route_len"
        ).split()
    }
    for v in objs:
        if v.slot is not None:
            i = v.slot
            if i in free_slots:
                free_slots.remove(i)
        else:
            i = ego_slots.pop(0) if v.is_ego else free_slots.pop(0)
        arr["pos"][i] = v.position
        arr["heading"][i] = v.heading
        arr["speed"][i] = v.speed
        arr["kind"][i] = v.kind
        arr["length"][i] = v.length
        arr["width"][i] = v.width
        arr["timer"][i] = v.timer
        arr["delta"][i] = v.delta
        arr["target_speed"][i] = v.target_speed
        arr["speed_index"][i] = v.speed_index
        arr["enable_lane_change"][i] = v.enable_lane_change
        arr["check_collisions"][i] = v.check_collisions
        if v.lane_index is not None:
            arr["lane"][i] = net.global_lane_index(v.lane_index)
        tli = v.target_lane_index or v.lane_index
        arr["target_lane"][i] = (
            net.global_lane_index(tli) if tli is not None else arr["lane"][i]
        )
        if v.route:
            if len(v.route) > R:
                raise ValueError(f"route length {len(v.route)} > {R} slots")
            for j, (f, t, lid) in enumerate(v.route):
                arr["route_base"][i, j] = net.global_lane_index((f, t, 0))
                arr["route_n"][i, j] = len(net.lanes_on_edge(f, t))
                arr["route_id"][i, j] = -1 if lid is None else int(lid)
            arr["route_len"][i] = len(v.route)

    st = st.replace(
        pos=jnp.asarray(arr["pos"], dtype),
        heading=jnp.asarray(arr["heading"], dtype),
        speed=jnp.asarray(arr["speed"], dtype),
        lane=jnp.asarray(arr["lane"], jnp.int32),
        target_lane=jnp.asarray(arr["target_lane"], jnp.int32),
        target_speed=jnp.asarray(arr["target_speed"], dtype),
        speed_index=jnp.asarray(arr["speed_index"], jnp.int32),
        timer=jnp.asarray(arr["timer"], dtype),
        delta=jnp.asarray(arr["delta"], dtype),
        crashed=jnp.asarray(arr["crashed"]),
        kind=jnp.asarray(arr["kind"], jnp.int32),
        length=jnp.asarray(arr["length"], dtype),
        width=jnp.asarray(arr["width"], dtype),
        check_collisions=jnp.asarray(arr["check_collisions"]),
        enable_lane_change=jnp.asarray(arr["enable_lane_change"]),
        route_base=jnp.asarray(arr["route_base"]),
        route_n=jnp.asarray(arr["route_n"]),
        route_id=jnp.asarray(arr["route_id"]),
        route_len=jnp.asarray(arr["route_len"]),
    )
    # uniform float dtype across the whole pytree (impact, accel, params, ...)
    # so downstream scans see a consistent carry under JAX_ENABLE_X64
    return jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, st
    )


# --------------------------------------------------------------------------- #
# entry points
# --------------------------------------------------------------------------- #
_BUILDERS = {
    "HighwayEnv": _spawns_highway,
    "HighwayEnvFast": _spawns_highway,
    "MergeEnv": _spawns_merge,
    "RoundaboutEnv": _spawns_roundabout,
    "ParkingEnv": _spawns_parking,
    "TwoWayEnv": _spawns_two_way,
    "UTurnEnv": _spawns_u_turn,
    "ExitEnv": _spawns_exit,
    "RacetrackEnv": _spawns_racetrack,
    "RacetrackEnvOval": _spawns_racetrack_oval,
    "LaneKeepingEnv": _spawns_lane_keeping,
    "MergeGenericEnv": _spawns_merge_generic,
    "RoundaboutGenericEnv": _spawns_roundabout_generic,
}


# subclasses whose reference _make_vehicles DIFFERS from the parent they
# inherit from here — the parent's draw replay would silently produce a
# wrong seeded scene, so they fall back to the jax reset path.  The oval
# with a RANDOM layout (length=0 or no_lanes=0) is excluded at runtime in
# supports_seeded_reset below: the reference's layout RNG is unseeded
# (racetrack_env.py:939), so there is nothing to replay.
_EXCLUDED = set()


def supports_seeded_reset(env) -> bool:
    for cls in type(env).__mro__:
        if cls.__name__ in _EXCLUDED:
            return False
        if cls.__name__ == "RacetrackEnvOval" and (
            not env.config.get("length") or not env.config.get("no_lanes")
        ):
            return False  # random layout = unseeded host RNG in the reference
        if cls.__name__ in _BUILDERS or cls.__name__ == "IntersectionEnv":
            return True
    return False


def _builder_for(env):
    for cls in type(env).__mro__:
        if cls.__name__ in _EXCLUDED:
            return None
        if cls.__name__ in _BUILDERS:
            return _BUILDERS[cls.__name__]
    return None


def _rng_key_from(rng):
    """A jax PRNG key derived from the generator WITHOUT consuming draws
    (an extra draw would desynchronize subsequent unseeded resets)."""
    import jax

    state = rng.bit_generator.state["state"]["state"]
    return jax.random.PRNGKey(state % (2**31 - 1))


def seeded_reset_state(env, rng):
    """Host-replayed reset: returns the engine EnvState whose scene is
    byte-identical to the reference's ``reset(seed)`` scene."""
    import jax
    import jax.numpy as jnp

    from highwayenv_tpu.envs.base import EnvState

    is_intersection = any(
        cls.__name__ == "IntersectionEnv" for cls in type(env).__mro__
    )
    if is_intersection:
        veh = _seeded_intersection_vehicles(env, rng)
    else:
        builder = _builder_for(env)
        if builder is None:
            raise NotImplementedError(type(env).__name__)
        veh = scene_to_state(env, builder(env, rng))
    veh = env._apply_npc_type(veh)
    state = EnvState(
        vehicles=veh,
        time=jnp.zeros((), jnp.float32),
        steps=jnp.full((), env._initial_steps, jnp.int32),
        key=_rng_key_from(rng),
    )
    state = env._push_frame(state)
    return state


def seeded_reset(env, rng):
    state = seeded_reset_state(env, rng)
    return env._observe(state), state


def _seeded_intersection_vehicles(env, rng, dtype=None):
    """IntersectionEnv._make_vehicles draw replay
    (envs/intersection_env.py:255-322): initial spawns -> 3 s device warm-up
    (no draws in the reference) -> challenger -> controlled vehicles."""
    import jax
    import jax.numpy as jnp

    from highwayenv_tpu.vehicle.state import KIND_PAD

    cfg = env.config
    net = env.net
    n_vehicles = cfg["initial_vehicle_count"]

    import jax.numpy as _jnp

    dtype = dtype or _jnp.float32
    vehicles = []
    for t in range(n_vehicles - 1):
        # NOTE: the reference's initial population uses _spawn_vehicle's
        # DEFAULT spawn_probability=0.6, not config["spawn_probability"]
        # (intersection_env.py:269-270 vs :139) — config only gates the
        # in-episode spawns.
        _spawn_vehicle_intersection(
            env, rng, vehicles,
            longitudinal=float(np.linspace(0, 80, n_vehicles)[t]),
        )

    veh = scene_to_state(env, vehicles, dtype=dtype)
    if dtype == _jnp.float64:
        # x64 canonical carry: ops promote ints to i64 under JAX_ENABLE_X64,
        # so the warm-up scan's carry must start at i64 as well
        veh = jax.tree.map(
            lambda x: x.astype(_jnp.int64) if x.dtype == _jnp.int32 else x,
            veh,
        )
    # 3 s warm-up on the device engine (consumes no draws in the
    # reference: vehicles hold explicit routes, so no next_lane choices fire)
    warmup = 3 * cfg["simulation_frequency"]
    W = veh.num_slots
    zero_actions = jnp.zeros(
        (W,) + tuple(getattr(env.action_type, "action_shape", ())),
        dtype if getattr(env.action_type, "action_shape", ()) else jnp.int32,
    )
    veh = jax.jit(
        lambda v: env._run_frames_static(v, zero_actions, warmup, steps0=0)
    )(veh)

    # positions after warm-up drive the challenger/ego clearance checks
    def host_positions(veh):
        return np.asarray(veh.pos), np.asarray(veh.kind)

    # challenger (spawn_probability=1, go_straight)
    pos_np, kind_np = host_positions(veh)
    live = [
        HostVehicle(kind=int(k), position=p)
        for p, k in zip(pos_np, kind_np)
        if k != KIND_PAD
    ]
    challenger = _spawn_vehicle_intersection(
        env, rng, live,
        longitudinal=60.0, position_deviation=0.1, speed_deviation=0.0,
        spawn_probability=1.0, go_straight=True,
    )
    arr_set = lambda a, i, v: a.at[i].set(v)
    if challenger is not None:
        slot = int(np.argmax(kind_np[: env._n_npc] == KIND_PAD))
        one = scene_to_state(env, [challenger], dtype=dtype)
        # copy slot 0 of `one` (first free slot there) into `slot`
        src = 0
        veh = veh.replace(
            pos=veh.pos.at[slot].set(one.pos[src]),
            heading=arr_set(veh.heading, slot, one.heading[src]),
            speed=arr_set(veh.speed, slot, one.speed[src]),
            lane=arr_set(veh.lane, slot, one.lane[src]),
            target_lane=arr_set(veh.target_lane, slot, one.target_lane[src]),
            target_speed=arr_set(veh.target_speed, slot, one.target_speed[src]),
            timer=arr_set(veh.timer, slot, one.timer[src]),
            delta=arr_set(veh.delta, slot, one.delta[src]),
            kind=arr_set(veh.kind, slot, one.kind[src]),
            route_base=veh.route_base.at[slot].set(one.route_base[src]),
            route_n=veh.route_n.at[slot].set(one.route_n[src]),
            route_id=veh.route_id.at[slot].set(one.route_id[src]),
            route_ptr=arr_set(veh.route_ptr, slot, one.route_ptr[src]),
            route_len=arr_set(veh.route_len, slot, one.route_len[src]),
        )

    # controlled vehicles (draws: integers destination when config None,
    # normal(1.0) position)
    rb, rn, rid, rlen = env._routes
    for ego_id, slot in enumerate(env.ego_slots):
        corner = ego_id % 4
        lane_index = (f"o{corner}", f"ir{corner}", 0)
        lane = net.get_lane(lane_index)
        destination = cfg["destination"] or "o" + str(int(rng.integers(1, 4)))
        dest = int(destination[1:])
        s = 60.0 + 5.0 * float(rng.normal(1.0))
        pos = np.asarray(lane.position(s, 0), np.float64)
        heading = float(lane.heading_at(60.0))
        speed = float(lane.speed_limit)
        glane = net.global_lane_index(lane_index)
        veh = veh.replace(
            pos=veh.pos.at[slot].set(jnp.asarray(pos, dtype)),
            heading=arr_set(veh.heading, slot, heading),
            speed=arr_set(veh.speed, slot, speed),
            lane=arr_set(veh.lane, slot, glane),
            target_lane=arr_set(veh.target_lane, slot, glane),
            kind=arr_set(veh.kind, slot, KIND_EGO),
        )
        if hasattr(env.action_type, "target_speeds"):
            from highwayenv_tpu.vehicle import controller

            ts = env.action_type.target_speeds
            si = controller.speed_to_index(jnp.float32(speed), ts)
            tsv = jnp.asarray(np.asarray(ts, np.float32))[si]
            veh = veh.replace(
                target_speed=arr_set(veh.target_speed, slot, tsv),
                speed_index=arr_set(veh.speed_index, slot, si),
                route_base=veh.route_base.at[slot].set(rb[corner, dest]),
                route_n=veh.route_n.at[slot].set(rn[corner, dest]),
                route_id=veh.route_id.at[slot].set(rid[corner, dest]),
                route_len=arr_set(veh.route_len, slot, rlen[corner, dest]),
            )
        # prevent early collisions (intersection_env.py:316-322)
        d = jnp.linalg.norm(veh.pos - jnp.asarray(pos, dtype)[None, :], axis=-1)
        drop = (veh.kind != KIND_PAD) & (veh.kind != KIND_EGO) & (d < 20.0)
        veh = veh.replace(kind=jnp.where(drop, KIND_PAD, veh.kind))
    return veh
