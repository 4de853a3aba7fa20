"""Kinematics observation unit tests: top-k selection edge cases.

The masked-argmin nearest-neighbour selection must behave exactly like the
stable-argsort path it replaced (reference semantics, observation.py:
234-269): rows beyond the number of visible vehicles are ZERO padding,
never duplicates, and an ego-only config (vehicles_count=1) is valid.
"""

import jax
import jax.numpy as jnp
import numpy as np

import highwayenv_tpu as ht


def _sparse_state(env, n_alive):
    """Reset, then deactivate all but the ego + n_alive closest NPCs."""
    _, state = env.reset(jax.random.PRNGKey(0))
    veh = state.vehicles
    V = veh.kind.shape[0]
    keep = jnp.arange(V) <= n_alive  # ego slot 0 + the first n_alive NPCs
    veh = veh.replace(kind=jnp.where(keep, veh.kind, 0))
    return state.replace(vehicles=veh)


def test_padding_rows_are_zero_not_duplicates():
    env = ht.make("highway-v0")  # vehicles_count=5 -> 4 neighbour rows
    state = _sparse_state(env, n_alive=1)  # only ONE visible NPC
    obs = np.asarray(env._observe(state))
    assert obs.shape[0] == 5
    # row 0 = ego, row 1 = the single NPC, rows 2-4 = zero padding
    assert np.any(obs[1] != 0)
    np.testing.assert_array_equal(obs[2:], np.zeros_like(obs[2:]))


def test_all_padding_when_no_neighbours():
    env = ht.make("highway-v0")
    state = _sparse_state(env, n_alive=0)
    obs = np.asarray(env._observe(state))
    np.testing.assert_array_equal(obs[1:], np.zeros_like(obs[1:]))
    assert np.any(obs[0] != 0)  # ego row present


def test_ego_only_vehicles_count_1():
    env = ht.make(
        "highway-v0", {"observation": {"type": "Kinematics", "vehicles_count": 1}}
    )
    obs, state = env.reset(jax.random.PRNGKey(0))
    assert np.asarray(obs).shape[0] == 1
    assert np.isfinite(np.asarray(obs)).all()
