"""Time regulation sub-components on TPU (15 calls per 'step' like _simulate)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

import highwayenv_tpu as ht
from highwayenv_tpu.road import regulation, lane as lane_ops

B = 1024
REPS = 15  # calls per policy step in _simulate

env = ht.make("intersection-v0")
keys = jax.random.split(jax.random.PRNGKey(0), B)
_, states = jax.jit(jax.vmap(env._reset))(keys)
veh = states.vehicles
_ = float(jnp.sum(veh.speed))
geo = env.geo
times = np.arange(
    regulation.CONFLICT_STEP, regulation.CONFLICT_HORIZON, regulation.CONFLICT_STEP
)
print(f"dev={jax.devices()[0].platform} B={B} V={veh.num_slots} L={geo.num_lanes} T={len(times)}")


def bench(label, fn):
    g = jax.jit(
        lambda v: jax.lax.scan(
            lambda c, _: (fn(c), None), v, None, length=REPS
        )[0]
    )
    out = g(veh)
    _ = float(jnp.sum(out.speed if hasattr(out, "speed") else out))
    t0 = time.perf_counter()
    n = 3
    for _i in range(n):
        out = g(veh)
        _ = float(jnp.sum(out.speed if hasattr(out, "speed") else out))
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{label}: {dt:.1f} ms per 15 calls")


bench("enforce_road_rules   ", lambda v: jax.vmap(lambda s: regulation.enforce_road_rules(geo, s))(v))


def pred_only(v):
    def one(s):
        pos, heading = regulation.predict_route_positions(geo, s, times)
        return s.replace(timer=s.timer + pos.sum() * 0 + heading.sum() * 0 + 1e-9)

    return jax.vmap(one)(v)


bench("predict_route_pos    ", pred_only)


def pos_only(v):
    def one(s):
        lane_k = jnp.broadcast_to(s.lane[:, None], (s.num_slots, len(times)))
        s_loc = jnp.broadcast_to(s.speed[:, None], (s.num_slots, len(times)))
        p = lane_ops.position(geo, lane_k, s_loc, jnp.zeros_like(s_loc))
        h = lane_ops.heading_at(geo, lane_k, s_loc)
        return s.replace(timer=s.timer + p.sum() * 0 + h.sum() * 0 + 1e-9)

    return jax.vmap(one)(v)


bench("lane position/heading", pos_only)


def local_only(v):
    def one(s):
        s0, _ = lane_ops.local_coordinates(geo, s.lane, s.pos)
        return s.replace(timer=s.timer + s0.sum() * 0 + 1e-9)

    return jax.vmap(one)(v)


bench("local_coordinates    ", local_only)
