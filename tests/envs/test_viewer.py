"""Human viewer, keyboard manual control, video recorder (headless)."""

import os

import numpy as np

# "offscreen", not "dummy": the reference's pygame pipeline (used as the
# oracle by tests/parity/test_pygame_render.py, which may run in the same
# process) renders all-black frames under the dummy driver.
os.environ.setdefault("SDL_VIDEODRIVER", "offscreen")
os.environ.setdefault("SDL_AUDIODRIVER", "dummy")

from highwayenv_tpu.gym_env import GymEnv
from highwayenv_tpu.viewer import EventHandler, VideoRecorder


def test_human_render_and_manual_control(tmp_path):
    import pygame

    env = GymEnv(
        "highway-fast-v0", {"manual_control": True}, render_mode="human"
    )
    env.reset(seed=0)
    frame = env.render()
    assert frame.shape == (150, 600, 3) and frame.dtype == np.uint8

    ev = pygame.event.Event(pygame.KEYDOWN, key=pygame.K_RIGHT)
    EventHandler.handle_event(env._viewer, env.env.action_type, ev)
    assert env._viewer.get_manual_action() == 3  # FASTER
    ev = pygame.event.Event(pygame.KEYDOWN, key=pygame.K_UP)
    EventHandler.handle_event(env._viewer, env.env.action_type, ev)
    assert env._viewer.get_manual_action() == 0  # LANE_LEFT
    obs, r, te, tr, info = env.step(1)  # overridden by manual action
    assert np.isfinite(r)
    env.close()
    assert env._viewer is None


def test_continuous_manual_control():
    import pygame

    env = GymEnv(
        "parking-v0", {"manual_control": True}, render_mode="human"
    )
    env.reset(seed=0)
    env.render()
    ev = pygame.event.Event(pygame.KEYDOWN, key=pygame.K_UP)
    EventHandler.handle_event(env._viewer, env.env.action_type, ev)
    a = env._viewer.get_manual_action()
    assert a[0] == 0.7
    ev = pygame.event.Event(pygame.KEYUP, key=pygame.K_UP)
    EventHandler.handle_event(env._viewer, env.env.action_type, ev)
    assert env._viewer.get_manual_action()[0] == 0.0
    env.close()


def test_video_recorder(tmp_path):
    env = GymEnv("highway-fast-v0", render_mode="rgb_array")
    env.reset(seed=0)
    rec = VideoRecorder(fps=15)
    for _ in range(3):
        rec.capture(env.render())
        env.step(1)
    path = rec.save(str(tmp_path / "ep.gif"))
    assert os.path.getsize(path) > 0
