#!/usr/bin/env python
"""Frame-by-frame diff of the banded vs dense neighbour pass (debug)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

import highwayenv_tpu as ht
from highwayenv_tpu.ops import straight_pallas_bm as bm

# run _frame_body outside pallas: pltpu.roll -> jnp.roll (same semantics)
from jax.experimental.pallas import tpu as pltpu

pltpu.roll = lambda x, s, axis=0: jnp.roll(x, s, axis)

env = ht.make("highway-v0")
frames = env.frames_per_step
B, block = 16, 8
keys = jax.random.split(jax.random.PRNGKey(3), B)
_, states = jax.vmap(env.reset)(keys)
veh = states.vehicles

acts = jax.random.randint(jax.random.PRNGKey(4), (B,), 0, 5)
sa = jax.vmap(env._action_to_slots)(acts)
ego_mask = veh.kind == bm.KIND_EGO
veh = env.action_type.apply(env.geo, veh, ego_mask, sa)

sort_fn, unsort_fn = bm.build_sort_kernels(env, block=block, interpret=True)
srt = sort_fn(bm.pack_bm(veh))
V = veh.num_slots

fs = env._straight
p = env.idm_params
dt = env.dt
raw = getattr(env.action_type, "stores_raw_controls", False)

n_mut = len(bm.BM_MUT_FIELDS)
f = {}
for n, a in zip(bm.BM_FIELDS, srt[: len(bm.BM_FIELDS)]):
    f[n] = a
f["idx"] = srt[-1]
f["viol"] = jnp.zeros_like(f["px"])

lean = True
has_linear = False


def run_frame(fd, banded):
    os.environ["HT_SORT_DENSE_NEIGH"] = "0" if banded else "1"
    return bm._frame_body(fs, p, dt, raw, lean, has_linear, True, dict(fd))


fd_d = dict(f)
fd_b = dict(f)
for fr in range(frames):
    out_d = run_frame(fd_d, banded=False)
    out_b = run_frame(fd_b, banded=True)
    bad = False
    for k in bm.BM_MUT_FIELDS:
        a, b = np.asarray(out_d[k]), np.asarray(out_b[k])
        if not np.array_equal(a, b):
            idx = np.argwhere(a != b)
            print(f"frame {fr}: field {k} differs at {idx[:10].tolist()}")
            for r, c in idx[:5]:
                print(f"   slot {r} env {c}: dense {a[r, c]} banded {b[r, c]}"
                      f"  viol_b={np.asarray(out_b['viol'])[r, c]}"
                      f"  env_viol={np.asarray(out_b['viol'])[:, c].max()}")
            bad = True
    if bad:
        # dump the pre-frame state of the first bad env
        k0 = bm.BM_MUT_FIELDS[0]
        a, b = np.asarray(out_d["heading"]), np.asarray(out_b["heading"])
        idx = np.argwhere(
            np.asarray(out_d["target_lane"]) != np.asarray(out_b["target_lane"])
        )
        print("target_lane diffs:", idx[:10].tolist())
        c = None
        for k in bm.BM_MUT_FIELDS:
            d_ = np.argwhere(
                np.asarray(out_d[k]) != np.asarray(out_b[k])
            )
            if len(d_):
                c = int(d_[0][1])
                break
        if c is not None:
            ux, uy = float(fs.u[0]), float(fs.u[1])
            ox, oy = float(fs.origin[0]), float(fs.origin[1])
            px = np.asarray(fd_d["px"])[:, c]
            py = np.asarray(fd_d["py"])[:, c]
            s = (px - ox) * ux + (py - oy) * uy
            print(f"env {c} pre-frame s (sorted layout): {np.round(s, 2)}")
            print(f"  lane: {np.asarray(fd_d['lane'])[:, c]}")
            print(f"  kind: {np.asarray(fd_d['kind'])[:, c]}")
            print(f"  timer: {np.round(np.asarray(fd_d['timer'])[:, c], 3)}")
        break
    fd_d = out_d
    fd_b = out_b
else:
    print("all frames bitwise equal")
