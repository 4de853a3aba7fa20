"""Finite-MDP export vs the reference's transition/ttc-grid semantics
(mirrors tests/envs/test_finite_mdp.py)."""

import numpy as np
import jax
import pytest

import highwayenv_tpu as ht
from highwayenv_tpu.ops.finite_mdp import clip_position, transition_tensor
from tests.parity.util import ref_to_vehicle_state

pytest.importorskip("highway_env")
gym = pytest.importorskip("gymnasium")


def test_transition_tensor_matches_reference():
    from functools import partial

    from highway_env.envs.common.finite_mdp import (
        transition_model as ref_transition,
    )

    shape = (3, 4, 10)
    grid = np.zeros(shape)
    ref = np.fromfunction(
        partial(ref_transition, grid=grid), shape + (5,), dtype=int
    ).reshape(np.prod(shape), 5)
    ours = transition_tensor(shape)
    np.testing.assert_array_equal(ours, ref)


def test_clip_position_matches_reference():
    from highway_env.envs.common.finite_mdp import (
        clip_position as ref_clip,
    )

    shape = (3, 4, 10)
    grid = np.zeros(shape)
    h, i, j = np.meshgrid(
        np.arange(-1, 5), np.arange(-1, 6), np.arange(-1, 12), indexing="ij"
    )
    np.testing.assert_array_equal(
        clip_position(h, i, j, shape), ref_clip(h, i, j, grid)
    )


def test_ttc_grid_matches_reference_live_env():
    from highway_env.envs.common.finite_mdp import (
        compute_ttc_grid as ref_grid,
    )

    ref = gym.make("highway-v0")
    ref.reset(seed=0)
    ours = ht.make("highway-v0")
    veh = ref_to_vehicle_state(ref, ours)
    from highwayenv_tpu.envs.base import EnvState
    import jax.numpy as jnp

    state = EnvState(
        vehicles=veh,
        time=jnp.zeros(()),
        steps=jnp.zeros((), jnp.int32),
        key=jax.random.PRNGKey(0),
    )
    mdp = ours.to_finite_mdp(state)
    g_ref = ref_grid(ref.unwrapped, time_quantization=1.0, horizon=10.0)
    from highwayenv_tpu.observations.ttc import compute_ttc_grid

    if not hasattr(ours, "connected3"):
        ours.connected3 = ours.net.connectivity_matrix(depth=3)
    g = np.asarray(
        compute_ttc_grid(
            ours.geo, veh, 0, ours.action_type.target_speeds,
            ours.connected3, ours.max_edge_lanes, 1.0, 10.0,
        )
    )
    assert g.shape == g_ref.shape
    np.testing.assert_allclose(g, g_ref, atol=1e-5)
    assert int(mdp.state) == np.ravel_multi_index(
        (
            int(ref.unwrapped.vehicle.speed_index),
            ref.unwrapped.vehicle.lane_index[2],
            0,
        ),
        g_ref.shape,
    )


def test_ttc_grid_lane_axis_sized_to_ego_edge_on_multi_edge_network():
    """PARITY #13: on a multi-width network (merge: 2-lane spawn edge,
    3-lane merge section, 1-lane ramp) the host finite-MDP export sizes
    the lane axis to the ego's CURRENT edge like the reference
    (finite_mdp.py:120), and the grid content matches the live reference."""
    from highway_env.envs.common.finite_mdp import (
        compute_ttc_grid as ref_grid,
    )

    ref = gym.make("merge-v0")
    ref.reset(seed=3)
    ours = ht.make("merge-v0")
    veh = ref_to_vehicle_state(ref, ours)
    from highwayenv_tpu.envs.base import EnvState
    import jax.numpy as jnp

    state = EnvState(
        vehicles=veh,
        time=jnp.zeros(()),
        steps=jnp.zeros((), jnp.int32),
        key=jax.random.PRNGKey(0),
    )
    g_ref = ref_grid(ref.unwrapped, time_quantization=1.0, horizon=10.0)
    assert g_ref.shape[1] == 2  # ego edge ("a","b") has 2 lanes, widest is 3
    mdp = ours.to_finite_mdp(state)
    assert mdp.original_shape == g_ref.shape
    # content parity on the reference-sized grid
    from highwayenv_tpu.observations.ttc import compute_ttc_grid

    g = np.asarray(
        compute_ttc_grid(
            ours.geo, veh, 0, ours.action_type.target_speeds,
            ours.connected3, g_ref.shape[1], 1.0, 10.0,
        )
    )
    np.testing.assert_allclose(g, g_ref, atol=1e-5)
