"""Which part of the GENERAL frame dominates on small-V scenarios?

Times merge-v0 rollouts with parts of the frame disabled (B=1024, TPU).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import highwayenv_tpu as ht
from highwayenv_tpu.road import lane as lane_ops
from highwayenv_tpu.ops import collision
from highwayenv_tpu.vehicle import behavior, controller

B = 1024
T = 4
env_id = sys.argv[1] if len(sys.argv) > 1 else "merge-v0"
env = ht.make(env_id)
keys = jax.random.split(jax.random.PRNGKey(0), B)
_, states = jax.jit(jax.vmap(env._reset))(keys)
veh0 = states.vehicles
acts = jnp.ones((B,), jnp.int32)
sa = jax.vmap(env._action_to_slots)(acts)
print(f"{env_id} V={env.num_slots} L={env.geo.num_lanes} B={B}", flush=True)


def timed(label, frame_fn):
    @jax.jit
    def run(veh, sa):
        def outer(v, _):
            tables = lane_ops.projection_table(env.geo, v.pos)

            def body(carry, i):
                vv, tb = carry
                return frame_fn(vv, tb, sa, i == 0), None

            (v, _t), _ = jax.lax.scan(
                body, (v, tables), jnp.arange(15), unroll=1
            )
            return v, jnp.sum(v.pos)

        v, s = jax.lax.scan(
            lambda c, _: outer(c, None), veh, None, length=T
        )
        return v, s

    out = run(veh0, sa)
    _ = float(np.sum(np.asarray(out[1])))
    t0 = time.perf_counter()
    for _ in range(3):
        out = run(veh0, sa)
        _ = float(np.sum(np.asarray(out[1])))
    dt = (time.perf_counter() - t0) / 3 / T
    print(f"{label:26s} {dt*1e3:7.2f} ms/step ({B/dt:,.0f} steps/s)", flush=True)


def vm(fn):
    return jax.vmap(fn, in_axes=(0, (0, 0), 0, None), out_axes=(0, (0, 0)))


# full frame
timed("full frame", vm(lambda v, tb, a, first: env._frame(v, tb, a, first)))


# no collisions
def frame_nocoll(v, tb, a, first):
    orig = collision.handle_collisions
    collision.handle_collisions = lambda veh, dt: veh
    try:
        out = env._frame(v, tb, a, first)
    finally:
        collision.handle_collisions = orig
    return out


timed("no collisions", vm(frame_nocoll))


# no idm decisions (keep controls/integration/relocalize/collide)
def frame_noidm(v, tb, a, first):
    orig = behavior.idm_act
    behavior.idm_act = lambda geo, p, veh, ts, tl, connected=False: (
        veh, jnp.zeros_like(veh.steering), jnp.zeros_like(veh.accel)
    )
    try:
        out = env._frame(v, tb, a, first)
    finally:
        behavior.idm_act = orig
    return out


timed("no idm/mobil", vm(frame_noidm))


# projection table + integrate only
def frame_tables_only(v, tb, a, first):
    from highwayenv_tpu.vehicle import kinematics

    v = kinematics.integrate(v, env.dt)
    new_s, new_lat = lane_ops.projection_table(env.geo, v.pos)
    new_lane = lane_ops.closest_lane_from_table(env.geo, new_s, new_lat, v.heading)
    v = v.replace(lane=jnp.where(v.is_vehicle, new_lane, v.lane))
    return v, (new_s, new_lat)


timed("tables+integrate only", vm(frame_tables_only))
