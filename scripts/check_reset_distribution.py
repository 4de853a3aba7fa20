#!/usr/bin/env python
"""Prototype for PARITY #6/#11: compare spawn distributions between the
jitted jax.random reset path and the host replay of the reference's NumPy
draw schedule (seeding.py, byte-identical to the reference).

Pools per-vehicle marginals (x, y, speed, heading) over active slots and
runs two-sample KS per feature with a conservative effective sample size
(n_scenes, since vehicles within a scene are correlated).

Usage: JAX_PLATFORMS=cpu python scripts/check_reset_distribution.py [N] [envs...]
"""

import os as _os
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import jax

import highwayenv_tpu as ht
from highwayenv_tpu import seeding
from highwayenv_tpu.vehicle.state import KIND_EGO, KIND_PLAIN


def features(veh):
    """Pool active-vehicle marginals to host numpy: x, y, speed, heading."""
    kind = np.asarray(veh.kind)
    act = (kind >= KIND_EGO) & (kind <= KIND_PLAIN)
    pos = np.asarray(veh.pos)
    return {
        "x": pos[..., 0][act],
        "y": pos[..., 1][act],
        "speed": np.asarray(veh.speed)[act],
        "heading": np.asarray(veh.heading)[act],
        "n_active": act.sum(axis=-1).ravel(),
    }


def host_features(objs):
    """Pool HostVehicle records (pure-host builder output) like features()."""
    kind = np.array([o.kind for o in objs])
    act = (kind >= KIND_EGO) & (kind <= KIND_PLAIN)
    # cast to f32: the jitted path stores f32, and KS on point-mass features
    # (lane headings, speed limits) spuriously flags the f64-vs-f32 rounding
    # of the SAME mass point as a 0.2+ ECDF gap otherwise
    pos = np.array([np.asarray(o.position, np.float64) for o in objs])
    return {
        "x": pos[act, 0].astype(np.float32),
        "y": pos[act, 1].astype(np.float32),
        "speed": np.array([float(o.speed) for o in objs], np.float32)[act],
        "heading": np.array([float(o.heading) for o in objs], np.float32)[act],
        "n_active": np.array([act.sum()]),
    }


def gather(env_id, n):
    env = ht.make(env_id)
    # jitted path: one vmapped reset over n keys.  Compare the spawn stage
    # (_reset_vehicles) against the host builder records — the rest of
    # _reset (_apply_npc_type, _push_frame) is draw-free.
    keys = jax.random.split(jax.random.PRNGKey(1234), n)
    veh = jax.jit(jax.vmap(env._reset_vehicles))(keys)
    jit_f = features(veh)

    # host replay path (reference draw schedule), one generator streamed
    # across resets (the Gymnasium contract)
    rng = seeding.np_random(4321)
    host = {k: [] for k in ("x", "y", "speed", "heading", "n_active")}
    builder = seeding._builder_for(env)
    t0 = time.perf_counter()
    for i in range(n):
        f = host_features(builder(env, rng))
        for k in host:
            host[k].append(f[k])
    host = {k: np.concatenate(v) for k, v in host.items()}
    dt = time.perf_counter() - t0
    return jit_f, host, dt


def main():
    from scipy.stats import ks_2samp

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    env_ids = sys.argv[2:] or [
        "highway-v0", "merge-v0", "roundabout-v0", "two-way-v0",
        "intersection-v0", "parking-v0",
    ]
    for env_id in env_ids:
        jit_f, host_f, dt = gather(env_id, n)
        print(f"== {env_id}  (n={n}, host replay {dt:.1f}s)")
        # conservative: treat n_scenes as the effective sample size
        d_crit = 1.95 * np.sqrt(2.0 / n)
        for k in ("x", "y", "speed", "heading", "n_active"):
            a, b = jit_f[k], host_f[k]
            ks = ks_2samp(a, b)
            flag = "OK " if ks.statistic < d_crit else "DIVERGENT"
            print(
                f"  {k:9s} D={ks.statistic:.4f} (crit {d_crit:.4f}) {flag}"
                f"  jit mean/std {a.mean():9.3f}/{a.std():8.3f}"
                f"  host {b.mean():9.3f}/{b.std():8.3f}"
            )


if __name__ == "__main__":
    main()
