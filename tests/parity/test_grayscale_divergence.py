"""Quantified bound on the default on-device grayscale rasterizer vs the
byte-exact pygame backend (PARITY #12's numeric bound, round 4).

The rasterizer (observations/grayscale.py) is the TRAINING path — it runs
inside the jitted step; the pygame backend replays the reference's draw
pipeline byte-for-byte (tests/parity/test_pygame_render.py).  This test
pins the divergence between the two on identical seeded scenes over
reset+5 steps:

- fraction of pixels differing by more than 8 gray levels  <= 1.5%
- per-frame PSNR                                           >= 28 dB

Measured round 5 (integer-camera chord rasterization of lane markings,
surface-space vehicle detail: body + headlights + 1-px border + tires,
AA rotated edges): highway 0.51% / 31.3 dB, intersection 0.95% / 30.3 dB,
racetrack 0.94% / 28.8 dB (round 4: 2.9% / 23.1 dB worst).  The residual
is pygame's nearest-neighbor rotated-blit raggedness (+-0.5 px random
edge pixels) and fixed-point Bresenham tie-rounding, which a per-pixel
continuous model cannot reproduce bit-exactly.
"""

import os

import numpy as np
import pytest

os.environ.setdefault("SDL_VIDEODRIVER", "dummy")

pytest.importorskip("pygame")

OBS_CFG = {
    "type": "GrayscaleObservation",
    "observation_shape": (128, 64),
    "stack_size": 4,
    "weights": [0.2989, 0.5870, 0.1140],
    "scaling": 1.75,
}

FRAC_GT8_BOUND = 0.015
PSNR_BOUND_DB = 28.0


def _divergence(env_id):
    from highwayenv_tpu.gym_env import GymEnv

    a = GymEnv(env_id, config={"observation": {**OBS_CFG, "backend": "rasterizer"}})
    b = GymEnv(env_id, config={"observation": {**OBS_CFG, "backend": "pygame"}})
    oa, _ = a.reset(seed=0)
    ob, _ = b.reset(seed=0)

    def stats(oa, ob):
        fa = np.asarray(oa[-1], float)
        fb = np.asarray(ob[-1], float)
        d = np.abs(fa - fb)
        mse = (d ** 2).mean()
        psnr = 10 * np.log10(255 ** 2 / mse) if mse > 0 else np.inf
        return (d > 8).mean(), psnr

    worst_frac, worst_psnr = stats(oa, ob)
    for _ in range(5):
        oa, *_ = a.step(1)
        ob, *_ = b.step(1)
        f, p = stats(oa, ob)
        worst_frac = max(worst_frac, f)
        worst_psnr = min(worst_psnr, p)
    return worst_frac, worst_psnr


def test_rasterizer_divergence_bounded_highway():
    frac, psnr = _divergence("highway-v0")
    assert frac <= FRAC_GT8_BOUND, f"frac(|diff|>8)={frac:.4f}"
    assert psnr >= PSNR_BOUND_DB, f"PSNR={psnr:.1f} dB"


@pytest.mark.slow
@pytest.mark.parametrize("env_id", ["intersection-v0", "racetrack-v0"])
def test_rasterizer_divergence_bounded(env_id):
    frac, psnr = _divergence(env_id)
    assert frac <= FRAC_GT8_BOUND, f"{env_id}: frac(|diff|>8)={frac:.4f}"
    assert psnr >= PSNR_BOUND_DB, f"{env_id}: PSNR={psnr:.1f} dB"
