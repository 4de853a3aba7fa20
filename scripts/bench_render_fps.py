"""Render-FPS regression benchmark (reference
scripts/regression_test/bench_render_fps.py equivalent): frames/sec of the
numpy rasterizer and of the jitted grayscale observation pipeline."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

import highwayenv_tpu as ht
from highwayenv_tpu.render import render_rgb

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50

# rgb_array rasterizer across scenario families (the reference harness
# sweeps highway / intersection / roundabout / merge / racetrack)
for env_id in (
    "highway-fast-v0",
    "highway-v0",
    "intersection-v0",
    "roundabout-v0",
    "merge-v0",
    "racetrack-v0",
):
    env = ht.make(env_id)
    _, state = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    a = (
        jnp.int32(1)
        if hasattr(env.action_type, "n")
        else jnp.zeros(env.action_type.action_shape, jnp.float32)
    )
    render_rgb(env, state)  # warm host path
    _, state, *_ = step(state, a)  # compile
    t0 = time.perf_counter()
    for i in range(N):
        frame = render_rgb(env, state)
        _, state, *_ = step(state, a)
    dt = time.perf_counter() - t0
    print(f"render_rgb {env_id} ({frame.shape[1]}x{frame.shape[0]}): {N/dt:,.1f} fps")

# jitted grayscale pipeline (obs shape 128x64, stack 4)
genv = ht.make(
    "highway-fast-v0",
    {
        "observation": {
            "type": "GrayscaleObservation",
            "observation_shape": (128, 64),
            "stack_size": 4,
            "weights": [0.2989, 0.5870, 0.1140],
            "scaling": 1.75,
        }
    },
)
obs, gstate = genv.reset(jax.random.PRNGKey(0))
gstep = jax.jit(genv.step)
obs, gstate, *_ = gstep(gstate, jnp.int32(1))  # compile
t0 = time.perf_counter()
for i in range(N):
    obs, gstate, *_ = gstep(gstate, jnp.int32(1))
obs.block_until_ready()
dt = time.perf_counter() - t0
print(f"grayscale obs (128x64x4, jit, incl. sim): {N/dt:,.1f} fps")
