"""Stateful Gymnasium adapter: API conformance sweep over every id
(mirrors tests/envs/test_gym.py:46-90's strategy)."""

import numpy as np
import pytest

import highwayenv_tpu as ht
from highwayenv_tpu.gym_env import GymEnv, MultiAgentWrapper

gym = pytest.importorskip("gymnasium")

# one representative per family keeps the sweep fast; every id is
# constructed at least once
FAST_IDS = [
    "highway-fast-v0",
    "merge-v0",
    "two-way-v0",
    "u-turn-v0",
    "exit-v0",
    "roundabout-v0",
    "parking-v0",
    "racetrack-v0",
    "intersection-v0",
    "lane-keeping-v0",
]


def test_all_ids_construct():
    for env_id in ht.registered_ids():
        env = ht.make(env_id)
        assert env.action_space is not None
        assert env.observation_space is not None


@pytest.mark.parametrize("env_id", FAST_IDS)
def test_adapter_episode(env_id):
    env = GymEnv(env_id)
    obs, info = env.reset(seed=3)

    def _np_cast(space, o):
        # numpy-cast leaves so containment checks dtype-compatibly
        if isinstance(space, gym.spaces.Tuple):
            return tuple(_np_cast(s, x) for s, x in zip(space.spaces, o))
        if isinstance(space, gym.spaces.Dict):
            return {k: _np_cast(space.spaces[k], o[k]) for k in space.spaces}
        return np.asarray(o, dtype=space.dtype)

    assert env.observation_space.contains(_np_cast(env.observation_space, obs))
    for _ in range(5):
        a = env.action_space.sample()
        obs, reward, terminated, truncated, info = env.step(a)
        assert np.isfinite(reward)
        assert isinstance(terminated, bool) and isinstance(truncated, bool)
        if terminated or truncated:
            obs, info = env.reset()
    # seeded determinism
    o1, _ = env.reset(seed=11)
    o2, _ = env.reset(seed=11)
    np.testing.assert_allclose(
        np.asarray(list(jax_leaves(o1))[0]), np.asarray(list(jax_leaves(o2))[0])
    )


def jax_leaves(x):
    import jax

    return jax.tree.leaves(x)


def test_reset_options_config_override():
    env = GymEnv("highway-fast-v0")
    env.reset(seed=0, options={"config": {"vehicles_count": 5}})
    assert env.config["vehicles_count"] == 5
    assert env.env.num_slots == 6


def test_multiagent_wrapper_contract():
    env = MultiAgentWrapper(GymEnv("intersection-multi-agent-v0"))
    env.reset(seed=0)
    obs, rewards, terms, trunc, info = env.step((1, 1))
    assert len(obs) == 2 and len(rewards) == 2 and len(terms) == 2


def test_multiagent_v1_registered_with_wrapper():
    """intersection-multi-agent-v1/-v2 auto-apply MultiAgentWrapper
    (reference highway_env/__init__.py:75-84)."""
    import gymnasium as gym
    import highwayenv_tpu as ht

    ht.register_gymnasium_envs()
    env = gym.make("highwayenv_tpu/intersection-multi-agent-v1")
    obs, _ = env.reset(seed=0)
    obs, rewards, terms, trunc, info = env.step(tuple(1 for _ in obs))
    assert isinstance(rewards, tuple) and len(rewards) == len(obs)
    assert isinstance(terms, tuple)
    # v0 stays unwrapped: scalar reward
    env0 = gym.make("highwayenv_tpu/intersection-multi-agent-v0")
    o0, _ = env0.reset(seed=0)
    _, r0, *_ = env0.step(tuple(1 for _ in o0))
    assert np.ndim(r0) == 0


def test_render_rgb_array():
    env = GymEnv("highway-fast-v0", render_mode="rgb_array")
    env.reset(seed=0)
    frame = env.render()
    assert frame.shape == (150, 600, 3) and frame.dtype == np.uint8
