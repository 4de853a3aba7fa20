"""Mosaic-lowerable transcendental helpers shared by the Pallas kernels.

Mosaic (the TPU Pallas backend) lowers no inverse-trig primitives, so the
kernels carry their own branchless cephes-style polynomials.  Accuracy is
~1e-7 absolute on f32 — the source of the documented ~6e-5 kernel-vs-XLA
trace divergence on real TPU (PARITY #17).

Used by ops/straight_pallas_bm.py and ops/general_pallas_bm.py.
"""

from __future__ import annotations

import jax.numpy as jnp


def _atan(x):
    """Branchless cephes atanf: ~1e-7 abs error (mosaic lowers no inverse
    trig, so the kernel carries its own polynomial)."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t3p8 = 2.414213562373095  # tan(3*pi/8)
    tp8 = 0.4142135623730950  # tan(pi/8)
    big = ax > t3p8
    mid = (ax > tp8) & ~big
    safe = jnp.maximum(ax, 1e-30)
    z = jnp.where(
        big, -1.0 / safe, jnp.where(mid, (ax - 1.0) / (ax + 1.0), ax)
    )
    zz = z * z
    y = (
        ((8.05374449538e-2 * zz - 1.38776856032e-1) * zz + 1.99777106478e-1)
        * zz
        - 3.33329491539e-1
    ) * zz * z + z
    y = jnp.where(
        big, jnp.pi / 2 + y, jnp.where(mid, jnp.pi / 4 + y, y)
    )
    return sign * y


def _asin(x):
    """arcsin on [-1, 1] via atan(x / sqrt(1 - x^2))."""
    denom = jnp.sqrt(jnp.maximum(1.0 - x * x, 1e-12))
    return _atan(x / denom)


def _atan2_pos_x(y, x):
    """atan2 restricted to x >= 0 (result in (-pi/2, pi/2))."""
    return _atan(y / jnp.maximum(x, 1e-12))


def _tan(x):
    return jnp.sin(x) / jnp.cos(x)
