#!/usr/bin/env python
"""Measure the reference HighwayEnv's single-process throughput on this host.

Used to pin bench.py's vs_baseline denominator (BENCH_REF_STEPS_PER_SEC).
"""

import sys
import time

sys.path.insert(0, "/root/reference")

import numpy as np


def main(env_id: str = "highway-v0", seconds: float = 20.0):
    import gymnasium as gym
    import highway_env  # noqa: F401

    env = gym.make(env_id)
    env.reset(seed=0)
    rng = np.random.default_rng(0)
    n, t0 = 0, time.time()
    while time.time() - t0 < seconds:
        _, _, term, trunc, _ = env.step(int(rng.integers(0, env.action_space.n)))
        n += 1
        if term or trunc:
            env.reset()
    dt = time.time() - t0
    print(f"{env_id}: {n / dt:.2f} env-steps/s ({n} steps in {dt:.1f}s)")


if __name__ == "__main__":
    main(*sys.argv[1:2])
