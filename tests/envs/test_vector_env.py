"""GymVectorEnv: the batched-JAX Gymnasium VectorEnv adapter.

Replaces the reference's per-process vectorization
(tests/envs/test_multiprocessing.py:35-59) with one jitted program; these
tests pin the Gymnasium vector API contract on the CPU mesh."""

from __future__ import annotations

import gymnasium
import numpy as np
import pytest

import highwayenv_tpu as ht


def test_vector_env_contract():
    envs = ht.make_vec(
        "highway-fast-v0", num_envs=8, config={"vehicles_count": 6}
    )
    assert envs.num_envs == 8
    assert envs.metadata["autoreset_mode"].value == "SameStep"
    obs, info = envs.reset(seed=7)
    assert obs.shape == (8,) + envs.single_observation_space.shape
    assert envs.observation_space.contains(obs)

    for _ in range(3):
        acts = envs.action_space.sample()
        obs, r, term, trunc, info = envs.step(acts)
        assert envs.observation_space.contains(obs)
        assert r.shape == term.shape == trunc.shape == (8,)
        assert r.dtype == np.float64
        assert term.dtype == trunc.dtype == bool
        # vector-info convention: every key has a presence mask
        for k in info:
            if not k.startswith("_"):
                assert f"_{k}" in info
    envs.close()


def test_vector_env_seeding_is_deterministic():
    envs = ht.make_vec(
        "highway-fast-v0", num_envs=4, config={"vehicles_count": 6}
    )
    a, _ = envs.reset(seed=3)
    b, _ = envs.reset(seed=3)
    c, _ = envs.reset(seed=4)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    # per-env seed list
    d, _ = envs.reset(seed=[1, 2, 3, 4])
    assert d.shape == a.shape
    with pytest.raises(ValueError):
        envs.reset(seed=[1, 2])


def test_gymnasium_make_vec_entry_point():
    ht.register_gymnasium_envs()
    envs = gymnasium.make_vec(
        "highwayenv_tpu/highway-fast-v0",
        num_envs=4,
        config={"vehicles_count": 6},
    )
    obs, _ = envs.reset(seed=0)
    obs, r, term, trunc, info = envs.step(envs.action_space.sample())
    assert obs.shape[0] == 4 and r.shape == (4,)
    envs.close()


def test_vector_env_dict_obs_parking():
    envs = ht.make_vec("parking-v0", num_envs=4)
    obs, _ = envs.reset(seed=1)
    assert set(obs) == {"observation", "achieved_goal", "desired_goal"}
    assert obs["observation"].shape[0] == 4
    acts = envs.action_space.sample()
    obs, r, term, trunc, info = envs.step(acts)
    assert envs.observation_space.contains(obs)
    envs.close()


def test_vector_env_multi_agent_tuple_spaces():
    envs = ht.make_vec(
        "intersection-multi-agent-v0",
        num_envs=2,
        config={"controlled_vehicles": 2},
    )
    obs, _ = envs.reset(seed=0)
    assert isinstance(obs, tuple) and len(obs) == 2
    acts = envs.action_space.sample()
    obs, r, term, trunc, info = envs.step(acts)
    assert isinstance(obs, tuple) and obs[0].shape[0] == 2
    envs.close()


def test_vector_env_autoreset_same_step():
    # two-way truncates at 15 policy steps (registration max_episode_steps
    # lives in the env's duration config here): run past an episode end and
    # check the done envs come back with a fresh (t=0-like) observation
    envs = ht.make_vec(
        "highway-fast-v0",
        num_envs=4,
        config={"duration": 2, "vehicles_count": 6},
    )
    envs.reset(seed=0)
    idle = np.ones(4, dtype=np.int64)
    _, _, term1, trunc1, _ = envs.step(idle)
    d1 = term1 | trunc1  # crashed envs reset a step early
    _, _, term2, trunc2, _ = envs.step(idle)
    # duration 2 s at policy 1 Hz: every env that survived step 1 truncates
    # at step 2; envs reset at step 1 restarted their clock
    np.testing.assert_array_equal(trunc2, ~d1)
    # post-reset steps continue seamlessly
    obs3, r3, term3, trunc3, _ = envs.step(idle)
    assert np.isfinite(obs3).all()
    envs.close()


def test_vector_env_final_obs():
    envs = ht.make_vec(
        "highway-fast-v0",
        num_envs=4,
        config={"duration": 1, "vehicles_count": 6},
        final_obs=True,
    )
    envs.reset(seed=0)
    obs, r, term, trunc, info = envs.step(np.ones(4, dtype=np.int64))
    assert trunc.all()
    assert "final_obs" in info
    # terminal obs differs from the post-reset obs returned as `obs`
    assert info["final_obs"].shape == obs.shape
    assert not np.allclose(info["final_obs"], obs)
    envs.close()


def test_vector_env_rejects_host_side_obs():
    with pytest.raises(ValueError, match="host-side"):
        ht.make_vec(
            "highway-fast-v0",
            num_envs=2,
            config={
                "observation": {
                    "type": "GrayscaleObservation",
                    "observation_shape": (32, 16),
                    "stack_size": 2,
                    "weights": [0.298, 0.587, 0.114],
                    "backend": "pygame",
                }
            },
        )
