"""Smoke-test the PPO training example end-to-end (tiny sizes, CPU mesh).

The reference's training story is its SB3 doc scripts; ours is the fully
jitted on-device pipeline in scripts/train_ppo.py.  Two updates at toy
sizes prove the whole path — sharded rollout, GAE, minibatched
clipped-surrogate epochs — compiles and produces finite numbers.
"""

import math
import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "..", "scripts")
)


def test_all_scripts_compile():
    """compile() every script — ast.parse misses misplaced __future__
    imports, which silently broke three training examples once."""
    import glob

    root = os.path.join(os.path.dirname(__file__), "..", "..")
    files = glob.glob(os.path.join(root, "scripts", "*.py"))
    files += [os.path.join(root, "bench.py"), os.path.join(root, "__graft_entry__.py")]
    assert len(files) > 10
    for f in files:
        with open(f) as fh:
            compile(fh.read(), f, "exec")


@pytest.mark.slow
def test_ppo_example_runs():
    import train_ppo

    mean_r = train_ppo.main(
        [
            "--updates", "2",
            "--batch", "16",
            "--horizon", "4",
            "--epochs", "1",
            "--minibatches", "2",
            "--hidden", "8",
        ]
    )
    assert math.isfinite(mean_r)
    assert 0.0 <= mean_r <= 1.0  # highway-fast step rewards are in [0, 1]


@pytest.mark.slow
def test_dqn_torch_example_runs():
    """Torch DQN over the VectorEnv adapter: the reference-user migration
    path (torch agent + standard vector API, batched device env)."""
    import train_dqn_torch

    mean_r = train_dqn_torch.main(
        [
            "--updates", "6",
            "--batch", "4",
            "--train-batch", "8",
            "--target-every", "3",
        ]
    )
    assert math.isfinite(mean_r)
    assert 0.0 <= mean_r <= 1.0
