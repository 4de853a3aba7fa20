#!/usr/bin/env python
"""Reproduce test_sorted_banded_collisions_match_dense failure, localized."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

import highwayenv_tpu as ht
from highwayenv_tpu.ops.straight_pallas_bm import (
    pallas_simulate_bm,
    pallas_simulate_bm_sorted,
)

env = ht.make("highway-v0")
frames = env.frames_per_step
B, block = 16, 8
keys = jax.random.split(jax.random.PRNGKey(3), B)
_, states = jax.vmap(env.reset)(keys)
veh = states.vehicles

acts = jax.random.randint(jax.random.PRNGKey(4), (B,), 0, 5)
sa = jax.vmap(env._action_to_slots)(acts)

d = jax.jit(
    lambda v, a: pallas_simulate_bm(env, v, a, frames, block=block, interpret=True)
)(veh, sa)
s, nviol = jax.jit(
    lambda v, a: pallas_simulate_bm_sorted(
        env, v, a, frames, block=block, interpret=True, return_viol=True
    )
)(veh, sa)
print("n_viol:", int(nviol))
for fld in ["pos", "heading", "speed", "crashed", "lane", "target_lane",
            "timer", "steering", "accel"]:
    a, b = np.asarray(getattr(d, fld)), np.asarray(getattr(s, fld))
    if not np.array_equal(a, b):
        idx = np.argwhere(a != b)
        print(fld, "differs at (env, slot):", idx[:10].tolist())
        for e_s in idx[:5]:
            print("   dense", a[tuple(e_s)], "sorted", b[tuple(e_s)])
