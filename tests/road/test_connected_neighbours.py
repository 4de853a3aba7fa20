"""Connected-lane neighbour search vs the reference oracle
(road/road.py:483-547, tests/road/test_neighbour_vehicles.py strategy)."""

import numpy as np
import jax.numpy as jnp
import pytest

import highwayenv_tpu as ht
from highwayenv_tpu.road import lane as lane_ops
from highwayenv_tpu.vehicle import behavior
from tests.parity.util import ref_to_vehicle_state

gym = pytest.importorskip("gymnasium")
pytest.importorskip("highway_env")


@pytest.mark.parametrize("env_id,seed", [
    ("u-turn-v1", 0), ("u-turn-v1", 3),
    ("merge-v1", 0), ("merge-v1", 2),
    ("exit-v1", 1),
])
def test_connected_neighbours_match_reference(env_id, seed):
    ref = gym.make(env_id)
    ref.reset(seed=seed)
    # advance the reference a few steps for a non-trivial configuration
    for _ in range(3):
        ref.step(1)
    ours = ht.make(env_id)
    veh = ref_to_vehicle_state(ref, ours)

    table_s, table_lat = lane_ops.projection_table(ours.geo, veh.pos)
    neigh = behavior.neighbours_connected(
        ours.geo, veh, veh.lane, table_s, table_lat
    )

    road = ref.unwrapped.road
    objs = list(road.vehicles) + list(road.objects)
    controlled = set(id(v) for v in ref.unwrapped.controlled_vehicles)
    ego_slots = list(ours.ego_slots)
    free = [i for i in range(ours.num_slots) if i not in ours.ego_slots]
    slot_of = {}
    for v in objs:
        slot_of[id(v)] = ego_slots.pop(0) if id(v) in controlled else free.pop(0)

    for v in road.vehicles:
        i = slot_of[id(v)]
        ref_front, ref_rear = road.neighbour_vehicles(v)
        our_front = (
            int(neigh.front_idx[i]) if bool(neigh.front_ex[i]) else None
        )
        our_rear = int(neigh.rear_idx[i]) if bool(neigh.rear_ex[i]) else None
        exp_front = slot_of[id(ref_front)] if ref_front is not None else None
        exp_rear = slot_of[id(ref_rear)] if ref_rear is not None else None
        assert our_front == exp_front, (env_id, seed, "front of slot", i)
        assert our_rear == exp_rear, (env_id, seed, "rear of slot", i)
