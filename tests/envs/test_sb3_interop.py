"""SB3-over-adapter smoke: stable-baselines3 DQN trains on the Gymnasium
adapter end-to-end (reference training story:
/root/reference/scripts/sb3_highway_dqn.py:1-60).

stable-baselines3 is optional (not bundled); the behavioral test skips
without it, but the script itself must always import and expose its CLI.
"""

from __future__ import annotations

import importlib.util
import subprocess
import sys

import pytest

HAS_SB3 = importlib.util.find_spec("stable_baselines3") is not None


def test_script_importable_and_gated():
    """Without SB3 the script must exit 0 with a clear message, not crash."""
    proc = subprocess.run(
        [sys.executable, "scripts/train_sb3_dqn.py", "--smoke"],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    if not HAS_SB3:
        assert "not installed" in proc.stderr


@pytest.mark.skipif(not HAS_SB3, reason="stable-baselines3 not installed")
def test_sb3_dqn_two_updates():
    """SB3 DQN runs >=2 gradient updates over the adapter (smoke profile)."""
    import gymnasium as gym

    import highwayenv_tpu as ht
    from scripts.train_sb3_dqn import build_model

    ht.register_gymnasium_envs()
    env = gym.make("highwayenv_tpu/highway-fast-v0")
    model = build_model(env, learning_starts=10, buffer_size=200, verbose=0)
    model.learn(total_timesteps=15)
    assert model.num_timesteps >= 15
