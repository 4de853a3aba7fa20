"""Probe: does mosaic lower lax.cond (vector results, scalar pred) inside a
fori_loop, and pltpu.roll along the sublane axis?  Run on the real chip."""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

V, B = 56, 128


def kernel(x_ref, o_ref):
    x = x_ref[:]

    def step(i, x):
        r = pltpu.roll(x, 1, 0)          # roll along sublane axis
        any_big = jnp.max(x) > 0.5

        def heavy(ops):
            x, r = ops
            return x * 0.5 + r * jnp.sin(x)

        def cheap(ops):
            x, r = ops
            return x + 1.0

        return jax.lax.cond(any_big, heavy, cheap, (x, r))

    o_ref[:] = jax.lax.fori_loop(0, 4, step, x)


@jax.jit
def run(x):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((V, B), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


x = jnp.ones((V, B), jnp.float32) * 0.3
out = run(x)
print("cond+roll ok:", out.shape, float(out[0, 0]))

# reference: same computation in plain jax
def step_ref(i, x):
    r = jnp.roll(x, 1, 0)
    return jax.lax.cond(jnp.max(x) > 0.5,
                        lambda o: o[0] * 0.5 + o[1] * jnp.sin(o[0]),
                        lambda o: o[0] + 1.0, (x, r))

ref = jax.lax.fori_loop(0, 4, step_ref, x)
import numpy as np
print("matches ref:", np.allclose(np.asarray(out), np.asarray(ref), atol=1e-6))
