"""Compile + time the batch-minor pallas frame kernel on real TPU.

Usage: python scripts/exp_pallas_bm.py [block] [B]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import highwayenv_tpu as ht
from highwayenv_tpu.ops.straight_pallas_bm import (
    build_pallas_frame, pack_bm, unpack_bm,
)

block = int(sys.argv[1]) if len(sys.argv) > 1 else 128
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
mode = sys.argv[3] if len(sys.argv) > 3 else "scan"

env = ht.make("highway-v0")
keys = jax.random.split(jax.random.PRNGKey(0), B)
_, states = jax.jit(jax.vmap(env._reset))(keys)
veh = states.vehicles
arrays = [np.asarray(a) for a in pack_bm(veh)]
print(f"block={block} B={B} mode={mode} V={arrays[0].shape[0]}", flush=True)

nframes = 15 if mode == "mega" else 1
frame = build_pallas_frame(env, block=block, frames=nframes)


@jax.jit
def run15(arrs):
    if mode == "mega":
        return list(frame(list(arrs)))
    if mode == "unroll":
        arrs = list(arrs)
        for _ in range(15):
            arrs = list(frame(arrs))
        return arrs
    if mode == "chunk":
        # sequential 1024-env chunks: each chunk's 15-frame scan carry is
        # small enough for XLA to keep VMEM-resident
        C = max(B // 1024, 1)
        stacked = [a.reshape(a.shape[0], C, B // C).transpose(1, 0, 2) for a in arrs]
        def chunk_fn(chunk):
            def body(a, _):
                return list(frame(a)), None
            out, _ = jax.lax.scan(body, list(chunk), None, length=15)
            return out
        outs = jax.lax.map(chunk_fn, stacked)
        return [o.transpose(1, 0, 2).reshape(a.shape[0], B) for o, a in zip(outs, arrs)]
    def body(a, _):
        return list(frame(a)), None
    out, _ = jax.lax.scan(body, list(arrs), None, length=15)
    return out

t0 = time.perf_counter()
lowered = run15.lower(arrays)
print(f"lowered {time.perf_counter()-t0:.1f}s; compiling...", flush=True)
t0 = time.perf_counter()
compiled = lowered.compile()
print(f"COMPILED {time.perf_counter()-t0:.1f}s", flush=True)

out = compiled(arrays)
s0 = float(np.sum(np.asarray(out[0])))
print(f"ran, checksum px: {s0:.2f}", flush=True)

reps = 10
t0 = time.perf_counter()
o = arrays
for _ in range(reps):
    o = compiled(o)
_ = float(np.sum(np.asarray(o[0])))
dt = (time.perf_counter() - t0) / reps
print(
    f"{dt*1e3:.2f} ms per 15-frame policy-step sim; "
    f"{B/dt:,.0f} env-steps/s (sim only)",
    flush=True,
)
