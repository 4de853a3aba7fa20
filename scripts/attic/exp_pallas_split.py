"""Experiment: does a SINGLE-frame pallas kernel compile on real TPU?

Round 1's 15-frame megakernel hung mosaic (>30 min).  This probes the
split-kernel variant: one pallas_call per frame, scanned 15x.  Run under
`timeout` from the shell; prints stage markers so a kill leaves a record
of where compilation stopped.

Usage:  python scripts/exp_pallas_split.py [major|minor] [block] [frames]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import highwayenv_tpu as ht
from scripts.attic.straight_pallas_retired import FIELDS, frame_core, pack, unpack

mode = sys.argv[1] if len(sys.argv) > 1 else "minor"
block = int(sys.argv[2]) if len(sys.argv) > 2 else 128
frames = int(sys.argv[3]) if len(sys.argv) > 3 else 1
B = 4096

env = ht.make("highway-v0")
fs = env._straight
p = env.idm_params
dt = env.dt
raw = getattr(env.action_type, "stores_raw_controls", False)

keys = jax.random.split(jax.random.PRNGKey(0), B)
_, states = jax.jit(jax.vmap(env._reset))(keys)
veh = states.vehicles
fdict = pack(veh)
names = [n for n, _ in FIELDS]
arrays = [fdict[n] for n in names]  # (B, V)
V = arrays[0].shape[1]
print(f"mode={mode} block={block} frames={frames} B={B} V={V}", flush=True)

core = functools.partial(frame_core, fs, p, dt, raw)

if mode == "major":
    step_env = jax.vmap(core, in_axes=0, out_axes=0)
    spec = lambda: pl.BlockSpec(
        (block, V), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_shapes = [jax.ShapeDtypeStruct((B, V), a.dtype) for a in arrays]
    grid = (B // block,)
    ins = arrays
else:
    step_env = jax.vmap(core, in_axes=-1, out_axes=-1)
    spec = lambda: pl.BlockSpec(
        (V, block), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    out_shapes = [jax.ShapeDtypeStruct((V, B), a.dtype) for a in arrays]
    grid = (B // block,)
    ins = [a.T for a in arrays]


def kernel(*refs):
    f = {n: r[:] for n, r in zip(names, refs[: len(names)])}
    if frames == 1:
        f = step_env(f)
    else:
        f = jax.lax.fori_loop(0, frames, lambda _, ff: step_env(ff), f)
    for n, r in zip(names, refs[len(names):]):
        r[:] = f[n]


@jax.jit
def run(ins):
    return pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=grid,
        in_specs=[spec() for _ in ins],
        out_specs=[spec() for _ in ins],
    )(*ins)


print("tracing...", flush=True)
t0 = time.perf_counter()
lowered = run.lower(ins)
print(f"lowered in {time.perf_counter()-t0:.1f}s; compiling...", flush=True)
t0 = time.perf_counter()
compiled = lowered.compile()
print(f"COMPILED in {time.perf_counter()-t0:.1f}s", flush=True)

outs = compiled(ins)
jax.block_until_ready(outs)
# timing: 20 reps
t0 = time.perf_counter()
for _ in range(20):
    outs = compiled(outs)
o0 = np.asarray(outs[0])  # host materialization
dt_run = (time.perf_counter() - t0) / 20
print(
    f"RUN ok: {dt_run*1e3:.2f} ms per {frames}-frame kernel call "
    f"({B*frames/dt_run/15:.0f} env-steps/s-equivalent at 15 f/step), "
    f"checksum {float(np.sum(o0)):.3f}",
    flush=True,
)
