"""PARITY #4 unreachability proof (resolved round 4).

The reference calls the ego's ``act()`` twice on the first frame of a
policy step (``action_type.act`` then ``road.act()``,
envs/common/abstract.py:295-307), so ``follow_road`` (controller.py) can
advance the target lane TWICE at one position — but only when, after the
first advance, the NEW lane is already past its end at the same position.

Derivation of the reachability bound: ``after_end`` fires at
``s > length - VEHICLE_LENGTH/2``.  A vehicle first crosses that margin on
lane A at most ``v*dt`` beyond it (one frame of travel), so when the first
advance A->B happens its overshoot past A's end is < ``v*dt`` minus the
margin slack; ``after_end(B)`` at that same position then requires
``length_B < v*dt`` (B starts at A's end; the VEHICLE_LENGTH/2 margins
cancel).  With speeds hard-clipped to MAX_SPEED (vehicle/state.py) the
worst overshoot is ``MAX_SPEED / simulation_frequency``.

This test asserts every lane of every registered env is LONGER than that
bound with margin — so the single-advance engine (one follow_road per
frame, envs/base.py) is exactly equivalent to the reference's double call
in every registered config.
"""

import numpy as np
import pytest

import highwayenv_tpu as ht
from highwayenv_tpu.vehicle.state import MAX_SPEED


@pytest.mark.parametrize("env_id", ht.registered_ids())
def test_no_lane_shorter_than_one_frame_of_travel(env_id):
    env = ht.make(env_id)
    sim_freq = env.config.get("simulation_frequency", 15)
    bound = MAX_SPEED / sim_freq
    min_len = float(np.asarray(env.geo.length).min())
    assert min_len > bound, (
        f"{env_id}: lane of length {min_len:.2f} m <= one frame of travel "
        f"{bound:.2f} m — double follow_road (PARITY #4) would be "
        "reachable; implement the second advance before shipping this "
        "config"
    )
