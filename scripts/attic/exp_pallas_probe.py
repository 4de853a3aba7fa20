"""Probe which pair-matrix kernel layouts mosaic can compile quickly.

Each probe is a tiny pallas kernel exercising one pattern used by the frame
kernel.  Run: python scripts/exp_pallas_probe.py <probe> [block]
Probes:
  minor_pair    (V,block) state -> (V,V,block) mask -> reduce over axis 1
  major_pair    (block,V) state -> (block,V,V) mask -> reduce over axis 2
  minor_argmin  batch-minor front-neighbour argmax pattern
  minor_fetch   batch-minor one-hot row fetch via mask+sum
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
block = int(sys.argv[2]) if len(sys.argv) > 2 else 128
V = 51
B = 1024

print(f"probe={probe} block={block} V={V} B={B}", flush=True)


def timed_compile(fn, *args):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    print(f"  lowered {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    print(f"  COMPILED {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    out = compiled(*args)
    s = float(np.sum(np.asarray(jax.tree.leaves(out)[0])))
    print(f"  ran, checksum {s:.3f}", flush=True)
    reps = 50
    t0 = time.perf_counter()
    for _ in range(reps):
        out = compiled(*args)
    jax.block_until_ready(out)
    print(f"  {1e6*(time.perf_counter()-t0)/reps:.0f} us/call", flush=True)


if probe == "minor_pair":
    # state (V, B) f32; kernel computes same-lane mask and front-gap min
    s = jnp.asarray(np.random.randn(V, B).astype(np.float32))
    lat = jnp.asarray(np.random.randn(V, B).astype(np.float32))

    def kernel(s_ref, lat_ref, out_ref):
        sv = s_ref[:]          # (V, blk)
        latv = lat_ref[:]
        # pair mask (Vq, Vc, blk)
        m = jnp.abs(latv[None, :, :] - latv[:, None, :]) <= 3.0
        front = m & (sv[:, None, :] <= sv[None, :, :])
        key = jnp.where(front, sv[None, :, :], jnp.inf)
        out_ref[:] = jnp.min(key, axis=1)

    def run(s, lat):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((V, B), jnp.float32),
            grid=(B // block,),
            in_specs=[
                pl.BlockSpec((V, block), lambda i: (0, i), memory_space=pltpu.VMEM)
            ] * 2,
            out_specs=pl.BlockSpec(
                (V, block), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        )(s, lat)

    timed_compile(run, s, lat)

elif probe == "major_pair":
    s = jnp.asarray(np.random.randn(B, V).astype(np.float32))
    lat = jnp.asarray(np.random.randn(B, V).astype(np.float32))

    def kernel(s_ref, lat_ref, out_ref):
        sv = s_ref[:]          # (blk, V)
        latv = lat_ref[:]
        m = jnp.abs(latv[:, None, :] - latv[:, :, None]) <= 3.0
        front = m & (sv[:, :, None] <= sv[:, None, :])
        key = jnp.where(front, sv[:, None, :], jnp.inf)
        out_ref[:] = jnp.min(key, axis=2)

    def run(s, lat):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, V), jnp.float32),
            grid=(B // block,),
            in_specs=[
                pl.BlockSpec((block, V), lambda i: (i, 0), memory_space=pltpu.VMEM)
            ] * 2,
            out_specs=pl.BlockSpec(
                (block, V), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        )(s, lat)

    timed_compile(run, s, lat)

elif probe == "minor_argmin":
    s = jnp.asarray(np.random.randn(V, B).astype(np.float32))
    lat = jnp.asarray(np.random.randn(V, B).astype(np.float32))

    def kernel(s_ref, lat_ref, idx_ref, ex_ref):
        sv = s_ref[:]
        latv = lat_ref[:]
        m = jnp.abs(latv[None, :, :] - latv[:, None, :]) <= 3.0
        front = m & (sv[:, None, :] <= sv[None, :, :])
        key = jnp.where(front, sv[None, :, :], jnp.inf)
        kmin = jnp.min(key, axis=1)  # (Vq, blk)
        iota = jax.lax.broadcasted_iota(jnp.int32, (V, V, block), 1)
        hit = (key == kmin[:, None, :]) & front
        idx = jnp.max(jnp.where(hit, iota, -1), axis=1)
        idx_ref[:] = idx
        ex_ref[:] = (kmin < jnp.inf).astype(jnp.int32)

    def run(s, lat):
        return pl.pallas_call(
            kernel,
            out_shape=[
                jax.ShapeDtypeStruct((V, B), jnp.int32),
                jax.ShapeDtypeStruct((V, B), jnp.int32),
            ],
            grid=(B // block,),
            in_specs=[
                pl.BlockSpec((V, block), lambda i: (0, i), memory_space=pltpu.VMEM)
            ] * 2,
            out_specs=[
                pl.BlockSpec((V, block), lambda i: (0, i), memory_space=pltpu.VMEM)
            ] * 2,
        )(s, lat)

    timed_compile(run, s, lat)

elif probe == "minor_fetch":
    # fetch field rows at per-env indices: out[q, b] = field[idx[q,b], b]
    idx = jnp.asarray(np.random.randint(0, V, (V, B)).astype(np.int32))
    field = jnp.asarray(np.random.randn(V, B).astype(np.float32))

    def kernel(idx_ref, f_ref, out_ref):
        iv = idx_ref[:]        # (Vq, blk)
        fv = f_ref[:]          # (Vc, blk)
        cols = jax.lax.broadcasted_iota(jnp.int32, (V, V, block), 1)
        m = (iv[:, None, :] == cols).astype(jnp.float32)
        out_ref[:] = jnp.sum(m * fv[None, :, :], axis=1)

    def run(idx, field):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((V, B), jnp.float32),
            grid=(B // block,),
            in_specs=[
                pl.BlockSpec((V, block), lambda i: (0, i), memory_space=pltpu.VMEM)
            ] * 2,
            out_specs=pl.BlockSpec(
                (V, block), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        )(idx, field)

    timed_compile(run, idx, field)

print("DONE", flush=True)

if probe == "minor_fetch_f32":
    idx = jnp.asarray(np.random.randint(0, V, (V, B)).astype(np.float32))
    field = jnp.asarray(np.random.randn(V, B).astype(np.float32))

    def kernel(idx_ref, f_ref, out_ref):
        iv = idx_ref[:]        # (Vq, blk) f32 indices
        fv = f_ref[:]
        cols = jax.lax.broadcasted_iota(jnp.float32, (V, V, block), 1)
        m = jnp.where(jnp.abs(iv[:, None, :] - cols) < 0.5, 1.0, 0.0)
        out_ref[:] = jnp.sum(m * fv[None, :, :], axis=1)

    def run(idx, field):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((V, B), jnp.float32),
            grid=(B // block,),
            in_specs=[
                pl.BlockSpec((V, block), lambda i: (0, i), memory_space=pltpu.VMEM)
            ] * 2,
            out_specs=pl.BlockSpec(
                (V, block), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        )(idx, field)

    timed_compile(run, idx, field)
    print("DONE", flush=True)

if probe == "minor_fetch_i32iota":
    # like minor_fetch but iota via broadcasted_iota int32 on axis 0 vs axis 1
    idx = jnp.asarray(np.random.randint(0, V, (V, B)).astype(np.int32))
    field = jnp.asarray(np.random.randn(V, B).astype(np.float32))

    def kernel(idx_ref, f_ref, out_ref):
        iv = idx_ref[:]
        fv = f_ref[:]
        cols = jax.lax.broadcasted_iota(jnp.int32, (V, V, block), 1)
        m = (iv[:, None, :] == cols)
        out_ref[:] = jnp.sum(jnp.where(m, fv[None, :, :], 0.0), axis=1)

    def run(idx, field):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((V, B), jnp.float32),
            grid=(B // block,),
            in_specs=[
                pl.BlockSpec((V, block), lambda i: (0, i), memory_space=pltpu.VMEM)
            ] * 2,
            out_specs=pl.BlockSpec(
                (V, block), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        )(idx, field)

    timed_compile(run, idx, field)
    print("DONE", flush=True)
