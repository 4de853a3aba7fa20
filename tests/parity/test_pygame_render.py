"""Pixel-exact rendering parity vs the reference's pygame pipeline.

The pygame backend (highwayenv_tpu/pygame_render.py) replays the
reference's draw sequence — WorldSurface int camera math, LaneGraphics
stripe phase, VehicleGraphics rotated blits — so frames and
GrayscaleObservations are byte-identical for identical scenes
(closes PARITY.md #12 for this backend).

Scene injection via ref_to_vehicle_state keeps both renderers looking at
the same world; the grayscale test instead runs both envs end-to-end from
reset(seed) through 5 policy steps (seeded reset parity + f32 dynamics
keep every drawn pixel identical at this horizon).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

os.environ.setdefault("SDL_VIDEODRIVER", "offscreen")

gym = pytest.importorskip("gymnasium")
pytest.importorskip("highway_env")
pytest.importorskip("pygame")


@pytest.fixture(autouse=True)
def _force_offscreen_sdl_driver():
    """The reference oracle renders all-black frames under SDL's "dummy"
    driver.  If an earlier test initialized the display with any other
    driver, quit it so the next ``pygame.display.init()`` (inside
    PygameFrameRenderer / the reference viewer) picks up "offscreen"."""
    import pygame

    os.environ["SDL_VIDEODRIVER"] = "offscreen"
    if pygame.display.get_init() and pygame.display.get_driver() != "offscreen":
        pygame.display.quit()
    yield

import jax
import jax.numpy as jnp

import highwayenv_tpu as ht
from highwayenv_tpu.envs.base import EnvState
from tests.parity.util import ref_to_vehicle_state


def _frames(env_id, seed=0):
    from highwayenv_tpu.pygame_render import PygameFrameRenderer

    ref = gym.make(
        env_id, render_mode="rgb_array", config={"offscreen_rendering": True}
    )
    ref.reset(seed=seed)
    frame_ref = ref.render()
    ours = ht.make(env_id)
    veh = ref_to_vehicle_state(ref, ours)
    state = EnvState(
        vehicles=veh,
        time=jnp.zeros(()),
        steps=jnp.zeros((), jnp.int32),
        key=jax.random.PRNGKey(0),
    )
    h, w = frame_ref.shape[:2]
    r = PygameFrameRenderer(ours, w, h)
    r.display(state)
    return frame_ref, r.get_image()


@pytest.mark.parametrize(
    "env_id",
    [
        "highway-v0",
        "merge-v0",
        "roundabout-v0",
        "intersection-v0",
        "parking-v0",  # explicit ego color + obstacles + goal landmark
        "racetrack-v0",  # continuous ego: tires + yellow
        "two-way-v0",
        "u-turn-v0",
        "exit-v0",
    ],
)
def test_frame_pixel_exact(env_id):
    frame_ref, frame_ours = _frames(env_id)
    assert frame_ref.shape == frame_ours.shape
    diff = (frame_ref != frame_ours).any(-1)
    assert diff.sum() == 0, f"{diff.sum()} differing pixels"


@pytest.mark.slow
def test_grayscale_pygame_backend_byte_identical():
    from highwayenv_tpu.gym_env import GymEnv

    obs_cfg = {
        "type": "GrayscaleObservation",
        "observation_shape": (128, 64),
        "stack_size": 4,
        "weights": [0.2989, 0.5870, 0.1140],
        "scaling": 1.75,
    }
    ref = gym.make(
        "highway-v0",
        config={"observation": dict(obs_cfg), "offscreen_rendering": True},
    )
    ours = GymEnv(
        "highway-v0",
        config={"observation": {**obs_cfg, "backend": "pygame"}},
    )
    obs_ref, _ = ref.reset(seed=0)
    obs_our, _ = ours.reset(seed=0)
    assert obs_ref.shape == obs_our.shape == (4, 128, 64)
    np.testing.assert_array_equal(obs_ref, obs_our)
    for action in [1, 0, 2, 1, 3]:
        obs_ref, *_ = ref.step(action)
        obs_our, *_ = ours.step(action)
        np.testing.assert_array_equal(obs_ref, obs_our)


def test_render_backend_config():
    """render_backend="pygame" routes env.render() through the exact
    pipeline."""
    from highwayenv_tpu.gym_env import GymEnv

    env = GymEnv(
        "highway-v0", config={"render_backend": "pygame"},
        render_mode="rgb_array",
    )
    env.reset(seed=0)
    frame = env.render()
    assert frame.shape == (150, 600, 3) and frame.dtype == np.uint8
    # grey background must dominate; vehicles present (green ego pixels)
    assert (frame == (100, 100, 100)).all(-1).mean() > 0.3
    assert ((frame == (50, 200, 0)).all(-1)).sum() > 0
