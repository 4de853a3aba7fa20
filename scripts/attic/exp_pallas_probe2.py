"""Second probe round: patterns the full frame kernel needs.

Run: python scripts/exp_pallas_probe2.py <probe>
  maskfetch   fetch via f32 one-hot pair mask (argmin-style), 5 fields
  lanesel     _sel: unrolled where over L lanes with i32 lane idx
  powv        jnp.power(f32, f32-array exponent)
  i32ops      i32 adds/clips/compares on (V,blk)
  eyemask     diag mask via iota axis0==axis1 (i32 compare, no bcast)
  satcoll     velocity-swept SAT collision pair kernel (8 axes)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

probe = sys.argv[1]
block = 128
V = 51
B = 1024


def timed_compile(fn, *args):
    t0 = time.perf_counter()
    compiled = jax.jit(fn).lower(*args).compile()
    print(f"  COMPILED {time.perf_counter()-t0:.1f}s", flush=True)
    out = compiled(*args)
    s = float(np.sum(np.asarray(jax.tree.leaves(out)[0], dtype=np.float64)))
    reps = 50
    t0 = time.perf_counter()
    for _ in range(reps):
        out = compiled(*args)
    jax.block_until_ready(out)
    print(
        f"  ran: checksum {s:.3f}, {1e6*(time.perf_counter()-t0)/reps:.0f} us/call",
        flush=True,
    )


def pc(kernel, n_in, n_out, dtypes_out=None):
    dtypes_out = dtypes_out or [jnp.float32] * n_out
    def run(*ins):
        return pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((V, B), d) for d in dtypes_out],
            grid=(B // block,),
            in_specs=[
                pl.BlockSpec((V, block), lambda i: (0, i), memory_space=pltpu.VMEM)
            ] * n_in,
            out_specs=[
                pl.BlockSpec((V, block), lambda i: (0, i), memory_space=pltpu.VMEM)
            ] * n_out,
        )(*ins)
    return run


f = lambda: jnp.asarray(np.random.randn(V, B).astype(np.float32))
i = lambda hi: jnp.asarray(np.random.randint(0, hi, (V, B)).astype(np.int32))

print(f"probe={probe}", flush=True)

if probe == "maskfetch":
    # front mask from f32 key equality, then fetch 5 fields by masked sums
    def kernel(s_ref, lat_ref, f1, f2, f3, f4, f5, *outs):
        sv = s_ref[:]
        latv = lat_ref[:]
        m = jnp.abs(latv[None, :, :] - latv[:, None, :]) <= 3.0
        front = m & (sv[:, None, :] <= sv[None, :, :])
        key = jnp.where(front, sv[None, :, :], jnp.inf)
        kmin = jnp.min(key, axis=1)
        hit = (key == kmin[:, None, :]) & front  # (Vq,Vc,blk) one-hot-ish
        hitf = hit.astype(jnp.float32)
        # dedupe ties: keep first -> divide by count (cheap tie handling probe)
        for k, fr in enumerate((f1, f2, f3, f4, f5)):
            outs[k][:] = jnp.sum(hitf * fr[:][None, :, :], axis=1)

    timed_compile(pc(kernel, 7, 5), f(), f(), f(), f(), f(), f(), f())

elif probe == "lanesel":
    off = [float(x) for x in np.linspace(0, 16, 5)]

    def kernel(lane_ref, out_ref):
        lane = lane_ref[:]
        out = jnp.zeros_like(lane, dtype=jnp.float32)
        for l, v in enumerate(off):
            out = jnp.where(lane == l, v, out)
        out_ref[:] = out

    timed_compile(pc(kernel, 1, 1), i(5))

elif probe == "powv":
    def kernel(x_ref, d_ref, out_ref):
        out_ref[:] = jnp.power(jnp.abs(x_ref[:]) + 0.1, d_ref[:])

    timed_compile(pc(kernel, 2, 1), f(), f())

elif probe == "i32ops":
    def kernel(a_ref, b_ref, out_ref):
        a = a_ref[:]
        b = b_ref[:]
        c = jnp.clip(a + 1, 0, 4)
        d = jnp.where((a == b) & (c > 1), c - 1, b)
        out_ref[:] = d

    timed_compile(pc(kernel, 2, 1, [jnp.int32]), i(5), i(5))

elif probe == "eyemask":
    def kernel(s_ref, out_ref):
        sv = s_ref[:]
        r = jax.lax.broadcasted_iota(jnp.int32, (V, V, block), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (V, V, block), 1)
        eye = r == c
        m = jnp.where(eye, 0.0, sv[None, :, :])
        out_ref[:] = jnp.sum(m, axis=1)

    timed_compile(pc(kernel, 1, 1), f())

elif probe == "satcoll":
    from highwayenv_tpu.utils.math import rects_intersecting

    def kernel(x_ref, y_ref, h_ref, sp_ref, cr_ref, ix_ref, iy_ref):
        x, y, h, sp = x_ref[:], y_ref[:], h_ref[:], sp_ref[:]
        pos = jnp.stack([x, y], axis=-1)  # (V, blk, 2)
        vel = jnp.stack([sp * jnp.cos(h), sp * jnp.sin(h)], axis=-1)
        L = jnp.full_like(x, 5.0)
        W = jnp.full_like(x, 2.0)
        inter, will, trans = rects_intersecting(
            pos[:, None], L[:, None], W[:, None], h[:, None],
            pos[None, :], L[None, :], W[None, :], h[None, :],
            displacement_a=vel[:, None] * (1 / 15),
            displacement_b=vel[None, :] * (1 / 15),
        )
        r = jax.lax.broadcasted_iota(jnp.int32, (V, V, block), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (V, V, block), 1)
        upper = r < c
        crash = (inter & upper).astype(jnp.float32)
        cr_ref[:] = jnp.max(crash, axis=1) + jnp.max(crash, axis=0)
        w = (will & upper).astype(jnp.float32)
        ix_ref[:] = jnp.sum(w * trans[..., 0], axis=1)
        iy_ref[:] = jnp.sum(w * trans[..., 1], axis=1)

    timed_compile(pc(kernel, 4, 3), f(), f(), f(), f())

print("DONE", flush=True)
