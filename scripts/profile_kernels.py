import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
#!/usr/bin/env python
"""Per-kernel ablation timing of the highway frame pipeline.

Each kernel is scanned K times inside one jit so tunnel dispatch overhead
amortizes; results are host-materialized so timings are honest.
"""

import time

import jax
import jax.numpy as jnp

import highwayenv_tpu as ht
from highwayenv_tpu.ops import collision
from highwayenv_tpu.road import lane as lane_ops
from highwayenv_tpu.vehicle import behavior, controller, kinematics

B = int(__import__("os").environ.get("B", 512))
K = int(__import__("os").environ.get("K", 50))


def timed(label, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    _ = float(jax.tree.leaves(out)[0].sum())
    t0 = time.perf_counter()
    out = f(*args)
    v = float(jax.tree.leaves(out)[0].sum())
    dt = (time.perf_counter() - t0) / K
    print(f"{label:34s} {dt*1e3:8.2f} ms/iter ({v:.3g})")
    return dt


def scan_k(body):
    def run(carry):
        def step(c, _):
            return body(c), None
        c, _ = jax.lax.scan(step, carry, None, length=K)
        return c
    return run


def main():
    env = ht.make("highway-v0")
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    _, states = jax.jit(jax.vmap(env._reset))(keys)
    veh = states.vehicles
    geo = env.geo
    _ = float(veh.pos.sum())
    print(f"B={B} V={veh.kind.shape[-1]} L={geo.num_lanes} K={K}")

    # full frame
    actions = jnp.ones((B, veh.kind.shape[-1]), jnp.int32)

    def full_frame(v):
        tables = jax.vmap(lambda p: lane_ops.projection_table(geo, p))(v.pos)
        v2, _ = jax.vmap(
            lambda vv, t0, t1, a: env._frame(vv, (t0, t1), a, jnp.bool_(True))
        )(v, tables[0], tables[1], actions)
        return v2

    timed("full frame", scan_k(full_frame), veh)

    # projection table
    def proj(v):
        t = jax.vmap(lambda p: lane_ops.projection_table(geo, p))(v.pos)
        return v.replace(heading=v.heading + 0 * jnp.sum(t[0]))

    timed("projection_table", scan_k(proj), veh)

    # lane index build (argsort)
    def lanes_idx(v):
        ts, tl = jax.vmap(lambda p: lane_ops.projection_table(geo, p))(v.pos)
        idx = jax.vmap(
            lambda vv, a, b: behavior.build_lane_index(geo, vv, a, b)
        )(v, ts, tl)
        return v.replace(heading=v.heading + 0 * jnp.sum(idx.sorted_s))

    timed("build_lane_index (argsort)", scan_k(lanes_idx), veh)

    # idm_act
    def idm(v):
        ts, tl = jax.vmap(lambda p: lane_ops.projection_table(geo, p))(v.pos)
        v2, steer, acc = jax.vmap(
            lambda vv, a, b: behavior.idm_act(geo, env.idm_params, vv, a, b)
        )(v, ts, tl)
        return v2.replace(heading=v2.heading + 0 * jnp.sum(steer))

    timed("idm_act (IDM+MOBIL)", scan_k(idm), veh)

    # collisions
    def coll(v):
        return jax.vmap(lambda vv: collision.handle_collisions(vv, env.dt))(v)

    timed("handle_collisions (SAT)", scan_k(coll), veh)

    # integrate
    def integ(v):
        return jax.vmap(lambda vv: kinematics.integrate(vv, env.dt))(v)

    timed("integrate", scan_k(integ), veh)

    # re-localization
    def reloc(v):
        ts, tl = jax.vmap(lambda p: lane_ops.projection_table(geo, p))(v.pos)
        lane = jax.vmap(
            lambda a, b, h: lane_ops.closest_lane_from_table(geo, a, b, h)
        )(ts, tl, v.heading)
        return v.replace(lane=lane)

    timed("re-localization (argmin)", scan_k(reloc), veh)

    # observation
    def obs_fn(v):
        o = jax.vmap(lambda vv: env.observation_type.observe(geo, vv, 0))(v)
        return v.replace(heading=v.heading + 0 * jnp.sum(o))

    timed("kinematics observation", scan_k(obs_fn), veh)


if __name__ == "__main__":
    main()
