"""Stable-Baselines3 DQN over the Gymnasium adapter.

Demonstrates that an SB3 trainer runs unmodified on this framework's
Gymnasium surface — the interop story of the reference
(/root/reference/scripts/sb3_highway_dqn.py:1-60): the env steps on TPU
through the jitted functional core while SB3's torch learner consumes the
numpy observations on the host.

stable-baselines3 is an optional dependency (NOT bundled in this image);
the script exits with a clear message when it is absent.  The smoke test
(tests/envs/test_sb3_interop.py) skips on the same condition.

Usage:
    python scripts/train_sb3_dqn.py [--timesteps 20000] [--smoke]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_model(env, **overrides):
    """DQN configured like the reference's headline example
    (sb3_highway_dqn.py:16-30)."""
    from stable_baselines3 import DQN

    kwargs = dict(
        policy_kwargs=dict(net_arch=[256, 256]),
        learning_rate=5e-4,
        buffer_size=15_000,
        learning_starts=200,
        batch_size=32,
        gamma=0.8,
        train_freq=1,
        gradient_steps=1,
        target_update_interval=50,
        verbose=1,
    )
    kwargs.update(overrides)
    return DQN("MlpPolicy", env, **kwargs)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--timesteps", type=int, default=20_000)
    ap.add_argument("--env-id", default="highwayenv_tpu/highway-fast-v0")
    ap.add_argument(
        "--smoke",
        action="store_true",
        help="tiny run: a few hundred steps, enough for 2+ gradient updates",
    )
    ap.add_argument("--save", default="")
    args = ap.parse_args()

    try:
        import stable_baselines3  # noqa: F401
    except ImportError:
        print(
            "stable-baselines3 is not installed in this environment; "
            "install it to run this example (pip install stable-baselines3). "
            "See scripts/train_dqn_torch.py for the bundled-deps-only "
            "external-trainer example.",
            file=sys.stderr,
        )
        return 0

    import gymnasium as gym

    import highwayenv_tpu as ht

    ht.register_gymnasium_envs()
    env = gym.make(args.env_id)

    if args.smoke:
        model = build_model(
            env, learning_starts=50, buffer_size=1_000, verbose=0
        )
        model.learn(total_timesteps=60)
    else:
        model = build_model(env)
        model.learn(total_timesteps=args.timesteps)
    if args.save:
        model.save(args.save)

    # quick greedy rollout to confirm the trained policy drives the env
    obs, _ = env.reset(seed=0)
    ep_ret = 0.0
    for _ in range(20):
        action, _ = model.predict(obs, deterministic=True)
        obs, reward, terminated, truncated, _ = env.step(action)
        ep_ret += float(reward)
        if terminated or truncated:
            break
    print(f"greedy rollout return over <=20 steps: {ep_ret:.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
