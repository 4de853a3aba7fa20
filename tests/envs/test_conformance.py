"""Gymnasium API conformance: check_env over EVERY registered id plus
vectorization, mirroring the reference's sweep
(/root/reference/tests/envs/test_gym.py:46-62,151-177).

The full sweep compiles every env family on CPU, so it is marked slow;
`pytest -m "not slow"` runs a 4-family subset.
"""

from __future__ import annotations

import warnings

import numpy as np
import pytest

import highwayenv_tpu as ht
from highwayenv_tpu.gym_env import register_gymnasium_envs

gym = pytest.importorskip("gymnasium")
from gymnasium.utils.env_checker import check_env  # noqa: E402

register_gymnasium_envs()

ALL_IDS = list(ht.registered_ids())
FAST_SUBSET = ["highway-fast-v0", "merge-v0", "parking-v0", "two-way-v0"]

# ids the reference wraps in MultiAgentWrapper are skipped there too
# (test_gym.py:53-55)
WRAPPED = {"intersection-multi-agent-v1", "intersection-multi-agent-v2"}

CHECK_ENV_IGNORE_WARNINGS = [
    "A Box observation space minimum value is -infinity. This is probably too low.",
    "A Box observation space maximum value is infinity. This is probably too high.",
    # version-alias deprecations, as in the reference allowlist
    # (test_gym.py:23-44)
    "is out of date. You should consider upgrading to version",
]


def _check(env_id):
    with warnings.catch_warnings(record=True) as caught:
        env = gym.make(f"highwayenv_tpu/{env_id}")
        check_env(env, skip_render_check=True)
        env.close()
    for w in caught:
        msg = str(w.message)
        if "is different from the unwrapped version" in msg:
            continue
        if any(exp in msg for exp in CHECK_ENV_IGNORE_WARNINGS):
            continue
        raise gym.error.Error(f"Unexpected warning for {env_id}: {msg}")


@pytest.mark.parametrize("env_id", FAST_SUBSET)
def test_check_env_fast(env_id):
    _check(env_id)


@pytest.mark.slow
@pytest.mark.parametrize(
    "env_id", [i for i in ALL_IDS if i not in WRAPPED and i not in FAST_SUBSET]
)
def test_check_env_all(env_id):
    _check(env_id)


@pytest.mark.parametrize("env_id", ["highway-fast-v0", "two-way-v0"])
def test_env_vectorization_info_dtype(env_id):
    """SyncVectorEnv with heterogeneous durations; info dtype stability
    (test_gym.py:151-177)."""

    def thunk(**config_kwargs):
        def make():
            return gym.make(f"highwayenv_tpu/{env_id}", config=config_kwargs)

        return make

    envs = gym.vector.SyncVectorEnv(
        [
            thunk(duration=2, simulation_frequency=2),
            thunk(duration=1, simulation_frequency=2),
        ],
        autoreset_mode="SameStep",
    )
    _obs, info = envs.reset(seed=0)
    assert np.issubdtype(np.asarray(info["speed"]).dtype, np.floating)
    zero_action = np.zeros(envs.action_space.shape, envs.action_space.dtype)
    for _ in range(3):
        _obs, _r, _term, truncated, info = envs.step(zero_action)
        assert np.issubdtype(np.asarray(info["speed"]).dtype, np.floating)
        if truncated[0]:
            break
    envs.close()
