"""General-path (analytic-lane) batch-minor Pallas megakernel.

The XLA general frame (envs/base.py::_frame) is op-launch-bound at small V:
racetrack-v0 (V=2, L=18) measures ~1.2 ms per frame at B=1024 — hundreds of
tiny kernel launches, not FLOPs (BASELINE.md, 2026-08-18 decomposition).
Mosaic removes the per-op dispatch entirely: this kernel runs the WHOLE
policy step (all frames of follow-road + meta-action + IDM/MOBIL + P-cascade
controls + integration + re-localization + swept-SAT collisions) as ONE
VMEM-resident pallas_call per 128-env block, in the batch-minor (V, block)
layout that made the straight kernel compilable (docs/kernels.md).

Where the straight kernel (ops/straight_pallas_bm.py) collapses the network
to lateral offsets of one axis, this kernel carries the full per-lane
analytic geometry (StraightLane / SineLane / CircularLane —
road/lane.py:159-384 math) as compile-time scalar constants, unrolled over
the (small, static) L lane axis:

  - projection tables  s_l(pos), lat_l(pos)       local_coordinates per lane
  - lane-graph following (follow_road/next_lane,   vehicle/controller.py:135-143,
    route cursor pop, successor-edge choice)       road/road.py:73-157
  - DiscreteMetaAction on the first frame          vehicle/controller.py:295-315
  - MOBIL with per-lane reachability, same-road    vehicle/behavior.py:219-324
    abort gate and route-directed sign override
  - per-lane speed-limit clipping in IDM           vehicle/behavior.py:150-190
  - heading-aware re-localization (closest lane    road/road.py:55-71
    by |lat| + overrun + heading distance)

Dynamic per-vehicle lane lookups are cumulative where-selects over the
unrolled L axis (the kernel never touches int vectors or gathers); pair
fetches are mask+sum contractions exactly as in the straight kernel.

Scope gate (``try_general``): analytic lanes only (no POLY sample banks),
default neighbour mode (not connected-lanes), unregulated, non-dynamical
egos (no BicycleVehicle RK4), base ``_step``, V <= 32 and L <= 32 (above
that the XLA path stops being launch-bound and the unrolled selects stop
being cheap).  Covers merge / roundabout / u-turn / exit / two-way /
racetrack; straight networks keep their specialized kernel; intersection
(regulated + custom ``_step``) and lane-keeping (custom ``_step``) fall
back to XLA.

Numerics: inverse trig via the cephes polynomials of ops/mosaic_math
(PARITY.md #17); everything else f32 VPU math identical in form to the XLA
path.  Cross-validated frame-by-frame against ``BaseEnv._frame`` in
tests/test_general_pallas.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from highwayenv_tpu.ops.mosaic_math import _asin, _atan, _atan2_pos_x, _tan
from highwayenv_tpu.utils.math import not_zero, wrap_to_pi
from highwayenv_tpu.utils.math import rects_intersecting_xy_folded
from highwayenv_tpu.vehicle import controller
from highwayenv_tpu.vehicle.behavior import IDMParams
from highwayenv_tpu.vehicle.state import (
    KIND_EGO,
    KIND_IDM,
    KIND_LANDMARK,
    KIND_LINEAR,
    KIND_OBSTACLE,
    KIND_PLAIN,
    MAX_SPEED,
    MIN_SPEED,
    VehicleState,
)

F32 = jnp.float32
VEHICLE_LENGTH = 5.0

STRAIGHT, SINE, CIRCULAR = 0, 1, 2


class GeneralGeo(NamedTuple):
    """Compile-time lane/graph tables as host numpy (python scalars inside
    the kernel)."""

    kind: np.ndarray  # (L,)
    sx: np.ndarray
    sy: np.ndarray
    ux: np.ndarray
    uy: np.ndarray
    nx: np.ndarray
    ny: np.ndarray
    heading0: np.ndarray
    amp: np.ndarray
    puls: np.ndarray
    phase: np.ndarray
    cx: np.ndarray
    cy: np.ndarray
    radius: np.ndarray
    sp: np.ndarray  # start_phase
    cw: np.ndarray
    width: np.ndarray
    length: np.ndarray
    speed_limit: np.ndarray  # +inf when unlimited
    forbidden: np.ndarray
    lane_id: np.ndarray
    edge_base: np.ndarray
    edge_n: np.ndarray
    from_node: np.ndarray
    to_node: np.ndarray
    succ_base: np.ndarray  # (L, S), -1 pad
    succ_n: np.ndarray  # (L, S)
    priority: np.ndarray  # (L,) right-of-way priority (RegulatedRoad)
    max_edge_lanes: int

    @property
    def L(self) -> int:
        return int(self.kind.shape[0])


def extract_geo(env) -> GeneralGeo:
    g = env.geo

    def a(tab):
        return np.asarray(tab.a if hasattr(tab, "a") else tab)

    start = a(g.start)
    d = a(g.direction)
    dl = a(g.direction_lateral)
    center = a(g.center)
    return GeneralGeo(
        kind=a(g.kind).astype(np.int32),
        sx=start[:, 0].astype(np.float64),
        sy=start[:, 1].astype(np.float64),
        ux=d[:, 0].astype(np.float64),
        uy=d[:, 1].astype(np.float64),
        nx=dl[:, 0].astype(np.float64),
        ny=dl[:, 1].astype(np.float64),
        heading0=a(g.heading0).astype(np.float64),
        amp=a(g.amplitude).astype(np.float64),
        puls=a(g.pulsation).astype(np.float64),
        phase=a(g.phase).astype(np.float64),
        cx=center[:, 0].astype(np.float64),
        cy=center[:, 1].astype(np.float64),
        radius=a(g.radius).astype(np.float64),
        sp=a(g.start_phase).astype(np.float64),
        cw=a(g.cw).astype(np.float64),
        width=a(g.width).astype(np.float64),
        length=a(g.length).astype(np.float64),
        speed_limit=a(g.speed_limit).astype(np.float64),
        forbidden=a(g.forbidden).astype(bool),
        lane_id=a(g.lane_id).astype(np.int32),
        edge_base=a(g.edge_base).astype(np.int32),
        edge_n=a(g.edge_n).astype(np.int32),
        from_node=a(g.from_node).astype(np.int32),
        to_node=a(g.to_node).astype(np.int32),
        succ_base=a(g.succ_edge_base).astype(np.int32),
        succ_n=a(g.succ_edge_n).astype(np.int32),
        priority=a(g.priority).astype(np.int32),
        max_edge_lanes=int(env.max_edge_lanes),
    )


def try_general(env) -> GeneralGeo | None:
    """The scope gate — None when the env must stay on the XLA path."""
    from highwayenv_tpu.envs.base import BaseEnv
    from highwayenv_tpu.road import lane as lane_ops

    if env._straight is not None:  # the specialized kernel is better
        return None
    # Regulated envs: DEFAULT since round 5.  The round-4 every-frame
    # enforcement build was slower than the XLA tick scheduler, but the
    # static-slot schedule (build_general_frame) computes the conflict
    # pass at only ceil(frames/period) static tick slots: intersection-v0
    # sim 25.2 -> ~12 ms/step at B=1024 (bitwise-matching the XLA path on
    # mixed-phase batches, test_general_pallas.py).  HT_NO_REG_PALLAS=1
    # restores the XLA tick scheduler.
    if env.regulated and __import__("os").environ.get("HT_NO_REG_PALLAS"):
        return None
    if type(env)._step is not BaseEnv._step:
        return None
    if env.config.get("neighbour_vehicles_connected_lanes", False):
        return None
    if getattr(env.action_type, "dynamical", False):
        return None
    if lane_ops.has_poly(env.geo):
        return None
    at = env.action_type
    raw = getattr(at, "stores_raw_controls", False)
    if not raw and not hasattr(at, "target_speeds"):
        return None  # meta-action egos or raw-control egos only
    gg = extract_geo(env)
    if gg.L > 32 or env.num_slots > 32:
        return None
    return gg


# --------------------------------------------------------------------------- #
# kernel state fields: all (V, block) f32
# --------------------------------------------------------------------------- #

GEN_MUT_FIELDS = [
    "px", "py", "heading", "speed", "lane", "target_lane", "target_speed",
    "timer", "crashed", "hit", "impact_pending", "impact_x", "impact_y",
    "steering", "accel", "route_ptr", "speed_index",
]
GEN_CONST_BASE = [
    "delta", "kind", "length", "width", "check_collisions", "collidable",
    "enable_lane_change", "mobil_gain", "mobil_max_braking",
    "accel_p0", "accel_p1", "accel_p2", "steer_p0", "steer_p1",
    "route_len", "action",
]
# RegulatedRoad extras (regulated=True builds only): the per-env frame
# counter at step start (tick phase) and the yielding state
GEN_REG_MUT = ["is_yielding", "yield_timer"]
GEN_REG_CONST = ["steps0"]


def gen_fields(R: int, regulated: bool = False) -> tuple[list, list]:
    mut = list(GEN_MUT_FIELDS) + (GEN_REG_MUT if regulated else [])
    const = list(GEN_CONST_BASE)
    for r in range(R):
        const += [f"route_base_{r}", f"route_id_{r}", f"route_n_{r}"]
    if regulated:
        const += GEN_REG_CONST
    return mut, const


def pack_general(veh: VehicleState, slot_actions, steps0=None) -> list:
    """VehicleState (B, V) -> list of (V, B) f32 arrays.  ``steps0`` (B,)
    enables the regulated field set (tick phase + yielding state)."""
    R = veh.route_base.shape[-1]
    regulated = steps0 is not None
    mut, const = gen_fields(R, regulated)
    f = {
        "px": veh.pos[..., 0], "py": veh.pos[..., 1],
        "heading": veh.heading, "speed": veh.speed,
        "lane": veh.lane, "target_lane": veh.target_lane,
        "target_speed": veh.target_speed, "timer": veh.timer,
        "crashed": veh.crashed, "hit": veh.hit,
        "impact_pending": veh.impact_pending,
        "impact_x": veh.impact[..., 0], "impact_y": veh.impact[..., 1],
        "steering": veh.steering, "accel": veh.accel,
        "route_ptr": veh.route_ptr, "speed_index": veh.speed_index,
        "delta": veh.delta, "kind": veh.kind,
        "length": veh.length, "width": veh.width,
        "check_collisions": veh.check_collisions,
        "collidable": veh.collidable,
        "enable_lane_change": veh.enable_lane_change,
        "mobil_gain": veh.mobil_gain,
        "mobil_max_braking": veh.mobil_max_braking,
        "accel_p0": veh.accel_params[..., 0],
        "accel_p1": veh.accel_params[..., 1],
        "accel_p2": veh.accel_params[..., 2],
        "steer_p0": veh.steer_params[..., 0],
        "steer_p1": veh.steer_params[..., 1],
        "route_len": veh.route_len,
        "action": jnp.broadcast_to(
            jnp.asarray(slot_actions, F32), veh.timer.shape
        )
        if jnp.ndim(slot_actions) < veh.timer.ndim
        else slot_actions,
    }
    for r in range(R):
        f[f"route_base_{r}"] = veh.route_base[..., r]
        f[f"route_id_{r}"] = veh.route_id[..., r]
        f[f"route_n_{r}"] = veh.route_n[..., r]
    if regulated:
        f["is_yielding"] = veh.is_yielding
        f["yield_timer"] = veh.yield_timer
        f["steps0"] = jnp.broadcast_to(
            jnp.asarray(steps0, F32)[..., None], veh.timer.shape
        )
    return [jnp.asarray(f[n], F32).T for n in mut + const]


def unpack_general(
    arrays: list, veh: VehicleState, regulated: bool = False
) -> VehicleState:
    names = GEN_MUT_FIELDS + (GEN_REG_MUT if regulated else [])
    f = {n: a.T for n, a in zip(names, arrays)}
    out = veh.replace(
        pos=jnp.stack([f["px"], f["py"]], axis=-1),
        heading=f["heading"], speed=f["speed"],
        lane=f["lane"].astype(jnp.int32),
        target_lane=f["target_lane"].astype(jnp.int32),
        target_speed=f["target_speed"], timer=f["timer"],
        crashed=f["crashed"] > 0.5, hit=f["hit"] > 0.5,
        impact_pending=f["impact_pending"] > 0.5,
        impact=jnp.stack([f["impact_x"], f["impact_y"]], axis=-1),
        steering=f["steering"], accel=f["accel"],
        route_ptr=f["route_ptr"].astype(jnp.int32),
        speed_index=f["speed_index"].astype(jnp.int32),
    )
    if regulated:
        out = out.replace(
            is_yielding=f["is_yielding"] > 0.5,
            yield_timer=f["yield_timer"].astype(veh.yield_timer.dtype),
        )
    return out


# --------------------------------------------------------------------------- #
# in-kernel geometry helpers (all unrolled over the static L axis)
# --------------------------------------------------------------------------- #


def _atan2(y, x):
    """Full-quadrant atan2 from the cephes atan polynomial."""
    safe_x = jnp.where(jnp.abs(x) > 1e-30, x, jnp.where(x >= 0, 1e-30, -1e-30))
    base = _atan(y / safe_x)
    sign_y = jnp.where(y >= 0.0, 1.0, -1.0)
    return jnp.where(x > 0.0, base, base + sign_y * np.pi)


def _sel_lane(vals, lane):
    """Cumulative floor-clip select of static per-lane scalars by a (near-)
    integer f32 lane array: out = vals[clip(round(lane), 0, L-1)]."""
    out = jnp.full_like(lane, float(vals[0]))
    for l in range(1, len(vals)):
        out = jnp.where(lane >= l - 0.5, float(vals[l]), out)
    return out


def _sel_rows(tensors, lane):
    """Row-aligned select of per-lane (V, blk) tensors by a (V, blk) lane
    array: out[i] = tensors[lane_i][i]  (lane_ops.row_lookup in kernel form)."""
    out = tensors[0]
    for l in range(1, len(tensors)):
        out = jnp.where(lane >= l - 0.5, tensors[l], out)
    return out


def _pair_from(tensors, qlane):
    """All-pairs projection: out[i, j] = tensors[qlane_i][j]
    (lane_ops.pair_project in kernel form).  qlane (V, blk) -> (V, V, blk)."""
    out = jnp.broadcast_to(
        tensors[0][None, :, :],
        (qlane.shape[0],) + tensors[0].shape,
    )
    for l in range(1, len(tensors)):
        out = jnp.where(
            (qlane >= l - 0.5)[:, None, :], tensors[l][None, :, :], out
        )
    return out


def _local_coords_static(gg: GeneralGeo, l: int, px, py):
    """(s, lat) of (px, py) on static lane l (road/lane.py math, scalar
    constants)."""
    k = int(gg.kind[l])
    if k == CIRCULAR:
        cx, cy = float(gg.cx[l]), float(gg.cy[l])
        sp, cw, rad = float(gg.sp[l]), float(gg.cw[l]), float(gg.radius[l])
        dcx = px - cx
        dcy = py - cy
        phi = _atan2(dcy, dcx)
        phi = sp + wrap_to_pi(phi - sp)
        r = jnp.sqrt(dcx * dcx + dcy * dcy)
        s = cw * (phi - sp) * rad
        lat = cw * (rad - r)
        return s.astype(F32), lat.astype(F32)
    dx = px - float(gg.sx[l])
    dy = py - float(gg.sy[l])
    s = dx * float(gg.ux[l]) + dy * float(gg.uy[l])
    lat = dx * float(gg.nx[l]) + dy * float(gg.ny[l])
    if k == SINE:
        lat = lat - float(gg.amp[l]) * jnp.sin(
            float(gg.puls[l]) * s + float(gg.phase[l])
        )
    return s.astype(F32), lat.astype(F32)


def _heading_static(gg: GeneralGeo, l: int, s):
    k = int(gg.kind[l])
    if k == CIRCULAR:
        cw = float(gg.cw[l])
        phi = cw * s / float(gg.radius[l]) + float(gg.sp[l])
        return (phi + np.pi / 2 * cw).astype(F32)
    if k == SINE:
        return (
            float(gg.heading0[l])
            + _atan(
                float(gg.amp[l])
                * float(gg.puls[l])
                * jnp.cos(float(gg.puls[l]) * s + float(gg.phase[l]))
            )
        ).astype(F32)
    return jnp.full_like(s, float(gg.heading0[l]))


class _DynParams(NamedTuple):
    is_cir: jnp.ndarray
    is_sin: jnp.ndarray
    sx: jnp.ndarray
    sy: jnp.ndarray
    ux: jnp.ndarray
    uy: jnp.ndarray
    nx: jnp.ndarray
    ny: jnp.ndarray
    heading0: jnp.ndarray
    amp: jnp.ndarray
    puls: jnp.ndarray
    phase: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    radius: jnp.ndarray
    sp: jnp.ndarray
    cw: jnp.ndarray


def _dyn_params(gg: GeneralGeo, lane) -> _DynParams:
    """Select all analytic params of a dynamic (V, blk) lane array."""
    return _DynParams(
        is_cir=_sel_lane((gg.kind == CIRCULAR).astype(np.float64), lane),
        is_sin=_sel_lane((gg.kind == SINE).astype(np.float64), lane),
        sx=_sel_lane(gg.sx, lane), sy=_sel_lane(gg.sy, lane),
        ux=_sel_lane(gg.ux, lane), uy=_sel_lane(gg.uy, lane),
        nx=_sel_lane(gg.nx, lane), ny=_sel_lane(gg.ny, lane),
        heading0=_sel_lane(gg.heading0, lane),
        amp=_sel_lane(gg.amp, lane), puls=_sel_lane(gg.puls, lane),
        phase=_sel_lane(gg.phase, lane),
        cx=_sel_lane(gg.cx, lane), cy=_sel_lane(gg.cy, lane),
        radius=_sel_lane(gg.radius, lane), sp=_sel_lane(gg.sp, lane),
        cw=_sel_lane(gg.cw, lane),
    )


def _local_coords_dyn(p: _DynParams, px, py):
    dx = px - p.sx
    dy = py - p.sy
    s_str = dx * p.ux + dy * p.uy
    lat_str = dx * p.nx + dy * p.ny
    lat_str = jnp.where(
        p.is_sin > 0.5,
        lat_str - p.amp * jnp.sin(p.puls * s_str + p.phase),
        lat_str,
    )
    dcx = px - p.cx
    dcy = py - p.cy
    phi = _atan2(dcy, dcx)
    phi = p.sp + wrap_to_pi(phi - p.sp)
    r = jnp.sqrt(dcx * dcx + dcy * dcy)
    s_cir = p.cw * (phi - p.sp) * p.radius
    lat_cir = p.cw * (p.radius - r)
    cir = p.is_cir > 0.5
    return jnp.where(cir, s_cir, s_str), jnp.where(cir, lat_cir, lat_str)


def _position_dyn(p: _DynParams, s, lat):
    lat_eff = jnp.where(
        p.is_sin > 0.5, lat + p.amp * jnp.sin(p.puls * s + p.phase), lat
    )
    px_str = p.sx + s * p.ux + lat_eff * p.nx
    py_str = p.sy + s * p.uy + lat_eff * p.ny
    phi = p.cw * s / p.radius + p.sp
    rr = p.radius - lat * p.cw
    px_cir = p.cx + rr * jnp.cos(phi)
    py_cir = p.cy + rr * jnp.sin(phi)
    cir = p.is_cir > 0.5
    return jnp.where(cir, px_cir, px_str), jnp.where(cir, py_cir, py_str)


def _heading_dyn(p: _DynParams, s):
    h_sin = p.heading0 + _atan(p.amp * p.puls * jnp.cos(p.puls * s + p.phase))
    h = jnp.where(p.is_sin > 0.5, h_sin, p.heading0)
    phi = p.cw * s / p.radius + p.sp
    return jnp.where(p.is_cir > 0.5, phi + np.pi / 2 * p.cw, h)


# --------------------------------------------------------------------------- #
# the frame body
# --------------------------------------------------------------------------- #


def _frame_body_general(
    gg: GeneralGeo,
    p: IDMParams,
    dt: float,
    raw_controls: bool,
    has_linear: bool,
    meta: tuple | None,  # (target_speeds tuple, longitudinal, lateral) or None
    R: int,
    reg_period: int | None,  # RegulatedRoad tick period in frames, or None
    f: dict,
    i_f,  # frame index within the policy step (f32 scalar or (blk,) vector)
    enforce="mod",  # regulated-block gate: "mod" = compute every call and
    #   mask writes by each env's own mod-derived tick phase (the round-4
    #   every-frame build); None = statically SKIP the block (a non-tick
    #   slot of the round-5 static schedule); an array = compute and use
    #   it as the per-env tick mask (a static tick slot)
) -> dict:
    """One general frame on (V, blk) f32 fields; mirrors
    envs/base.py::_frame (kinematic-only; regulated right-of-way when
    ``reg_period`` is set — see the enforcement block before `out`)."""
    first = (i_f < 0.5).astype(F32)
    V = f["px"].shape[0]
    L = gg.L
    blk = f["px"].shape[1]

    kind = f["kind"]
    crashed = f["crashed"] > 0.5
    active = kind > 0.5
    is_vehicle = (kind > KIND_EGO - 0.5) & (kind < KIND_PLAIN + 0.5)
    is_controlled = (kind > KIND_EGO - 0.5) & (kind < KIND_LINEAR + 0.5)
    is_linear = (
        jnp.abs(kind - KIND_LINEAR) < 0.5
        if has_linear
        else jnp.zeros_like(active)
    )
    idm = ((jnp.abs(kind - KIND_IDM) < 0.5) | is_linear) & ~crashed
    is_ego = jnp.abs(kind - KIND_EGO) < 0.5

    # --- projection tables (pre-integration positions) --------------------- #
    S = []
    LAT = []
    ELIG = []
    not_landmark = jnp.abs(kind - KIND_LANDMARK) > 0.5
    for l in range(L):
        s_l, lat_l = _local_coords_static(gg, l, f["px"], f["py"])
        S.append(s_l)
        LAT.append(lat_l)
        on = (
            (jnp.abs(lat_l) <= float(gg.width[l]) / 2 + 1.0)
            & (-VEHICLE_LENGTH <= s_l)
            & (s_l < float(gg.length[l]) + VEHICLE_LENGTH)
        )
        ELIG.append((on & active & not_landmark).astype(F32))

    # --- follow_road (controller.py:135-143 / road.py:73-157) -------------- #
    tlane = f["target_lane"]
    s_t = _sel_rows(S, tlane)
    len_t = _sel_lane(gg.length, tlane)
    ended = s_t > len_t - VEHICLE_LENGTH / 2

    # projected position: lane-centered point at the same arc length
    pt = _dyn_params(gg, tlane)
    proj_x, proj_y = _position_dyn(pt, s_t, jnp.zeros_like(s_t))

    # route head handling
    def route_entry(prefix, ptr):
        vals = [f[f"{prefix}_{r}"] for r in range(R)]
        out = vals[0]
        for r in range(1, R):
            out = jnp.where(ptr >= r - 0.5, vals[r], out)
        return out

    ptr = f["route_ptr"]
    has_route = ptr < f["route_len"] - 0.5
    head_base = route_entry("route_base", ptr)
    edge_base_t = _sel_lane(gg.edge_base, tlane)
    pop = has_route & (jnp.abs(head_base - edge_base_t) < 0.5)
    new_ptr = jnp.where(pop, ptr + 1.0, ptr)
    has_route2 = new_ptr < f["route_len"] - 0.5
    head_base2 = route_entry("route_base", new_ptr)
    head_n2 = route_entry("route_n", new_ptr)
    head_id2 = route_entry("route_id", new_ptr)
    head_from = _sel_lane(gg.from_node, head_base2)
    to_node_t = _sel_lane(gg.to_node, tlane)
    follow_route = has_route2 & (jnp.abs(head_from - to_node_t) < 0.5)

    cur_n = _sel_lane(gg.edge_n, tlane)
    cur_id = _sel_lane(gg.lane_id, tlane)
    M = gg.max_edge_lanes
    BIG = 1e9

    def next_on_edge(cand_base, cand_n, next_id):
        """road/road.py:138-157 for a dynamic successor edge."""
        ds = []
        for m in range(M):
            cand = cand_base + float(m)
            pcm = _dyn_params(gg, cand)
            s_m, lat_m = _local_coords_dyn(pcm, proj_x, proj_y)
            len_m = _sel_lane(gg.length, cand)
            d_m = (
                jnp.abs(lat_m)
                + jnp.maximum(s_m - len_m, 0.0)
                + jnp.maximum(-s_m, 0.0)
            )
            ds.append(jnp.where(cand_n > m + 0.5, d_m, BIG))
        best_d = ds[0]
        closest_id = jnp.zeros_like(best_d)
        for m in range(1, M):
            better = ds[m] < best_d  # first minimum wins (argmin)
            best_d = jnp.where(better, ds[m], best_d)
            closest_id = jnp.where(better, float(m), closest_id)
        same_count = jnp.abs(cur_n - cand_n) < 0.5
        chosen_id = jnp.where(
            same_count, jnp.where(next_id >= -0.5, next_id, cur_id), closest_id
        )
        chosen_id = jnp.clip(chosen_id, 0.0, jnp.maximum(cand_n - 1.0, 0.0))
        # dist at the chosen id
        dist = ds[0]
        for m in range(1, M):
            dist = jnp.where(chosen_id >= m - 0.5, ds[m], dist)
        return cand_base + chosen_id, dist

    route_lane, _ = next_on_edge(head_base2, head_n2, head_id2)

    # free choice among static successor edges of the target lane
    Snum = gg.succ_base.shape[1]
    no_id = jnp.full_like(tlane, -1.0)
    best_lane = tlane
    best_dist = jnp.full_like(tlane, BIG)
    any_succ = jnp.zeros_like(ended)
    for si in range(Snum):
        sb = _sel_lane(gg.succ_base[:, si].astype(np.float64), tlane)
        sn = _sel_lane(gg.succ_n[:, si].astype(np.float64), tlane)
        valid = sb > -0.5
        cl, cd = next_on_edge(jnp.maximum(sb, 0.0), sn, no_id)
        cd = jnp.where(valid, cd, BIG)
        better = cd < best_dist  # first minimum wins (argmin over edges)
        best_lane = jnp.where(better, cl, best_lane)
        best_dist = jnp.where(better, cd, best_dist)
        any_succ = any_succ | valid
    nxt = jnp.where(
        follow_route, route_lane, jnp.where(any_succ, best_lane, tlane)
    )

    apply_fr = ended & is_controlled
    tlane = jnp.where(apply_fr, nxt, tlane)
    route_ptr = jnp.where(apply_fr, new_ptr, f["route_ptr"])

    target_speed = f["target_speed"]
    speed_index = f["speed_index"]

    # --- ego meta-action on the first frame (controller.py:295-315) -------- #
    if meta is not None:
        ts_grid, longitudinal, lateral = meta
        n_speeds = len(ts_grid)
        act = f["action"]
        # `first` arrives as an f32 scalar (i == 0 in the fori_loop);
        # broadcast to a vector mask (mosaic dislikes scalar-i1 broadcasts)
        first_v = jnp.zeros_like(kind) + first
        ego_act = is_ego & (first_v > 0.5)
        if longitudinal and lateral:
            a_ll = jnp.abs(act - 0.0) < 0.5
            a_lr = jnp.abs(act - 2.0) < 0.5
            a_fa = jnp.abs(act - 3.0) < 0.5
            a_sl = jnp.abs(act - 4.0) < 0.5
        elif longitudinal:
            a_ll = jnp.zeros_like(ego_act)
            a_lr = jnp.zeros_like(ego_act)
            a_fa = jnp.abs(act - 2.0) < 0.5
            a_sl = jnp.abs(act - 0.0) < 0.5
        else:
            a_ll = jnp.abs(act - 0.0) < 0.5
            a_lr = jnp.abs(act - 2.0) < 0.5
            a_fa = jnp.zeros_like(ego_act)
            a_sl = jnp.zeros_like(ego_act)
        a_ll = a_ll & ego_act
        a_lr = a_lr & ego_act
        a_fa = a_fa & ego_act
        a_sl = a_sl & ego_act

        lo, hi = float(ts_grid[0]), float(ts_grid[-1])
        x = (f["speed"] - lo) / (hi - lo)
        cur_index = jnp.clip(
            jnp.round(x * (n_speeds - 1)), 0.0, n_speeds - 1.0
        )
        new_index = jnp.where(
            a_fa, cur_index + 1.0, jnp.where(a_sl, cur_index - 1.0, speed_index)
        )
        new_index = jnp.clip(new_index, 0.0, n_speeds - 1.0)
        sp_changed = a_fa | a_sl
        new_ts = _sel_lane(np.asarray(ts_grid, np.float64), new_index)
        new_ts = jnp.where(sp_changed, new_ts, target_speed)

        # lane change on the target lane's edge
        tl_id = _sel_lane(gg.lane_id, tlane)
        tl_n = _sel_lane(gg.edge_n, tlane)
        tl_base = _sel_lane(gg.edge_base, tlane)
        delta_id = jnp.where(a_lr, 1.0, jnp.where(a_ll, -1.0, 0.0))
        cand_id = jnp.clip(tl_id + delta_id, 0.0, tl_n - 1.0)
        cand_lane = tl_base + cand_id
        pcl = _dyn_params(gg, cand_lane)
        s_cl, lat_cl = _local_coords_dyn(pcl, f["px"], f["py"])
        w_cl = _sel_lane(gg.width, cand_lane)
        len_cl = _sel_lane(gg.length, cand_lane)
        fb_cl = _sel_lane(gg.forbidden.astype(np.float64), cand_lane)
        reach = (
            (jnp.abs(lat_cl) <= 2.0 * w_cl)
            & (0.0 <= s_cl)
            & (s_cl < len_cl + VEHICLE_LENGTH)
            & (fb_cl < 0.5)
        )
        new_tl = jnp.where((a_ll | a_lr) & reach, cand_lane, tlane)

        speed_index = jnp.where(ego_act, new_index, speed_index)
        target_speed = jnp.where(ego_act, new_ts, target_speed)
        tlane = jnp.where(ego_act, new_tl, tlane)

    # --- pair machinery ----------------------------------------------------- #
    row_i = jax.lax.broadcasted_iota(jnp.int32, (V, V, blk), 0).astype(F32)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (V, V, blk), 1).astype(F32)
    not_eye = jnp.abs(row_i - col_i) > 0.5

    lane = f["lane"]
    s_own = _sel_rows(S, lane)  # own s on own current lane
    cos_h = jnp.cos(f["heading"])
    sin_h = jnp.sin(f["heading"])
    vxv = f["speed"] * cos_h
    vyv = f["speed"] * sin_h

    def neigh_masks(qlane, s_pairs=None, e_pairs=None):
        """front/rear one-hot pair masks for a (V, blk) query lane.
        Ties (road.py:539-545, PARITY #3): front keeps the LAST equally
        -distant column, rear the first — matching the XLA paths."""
        if s_pairs is None:
            s_pairs = _pair_from(S, qlane)
        if e_pairs is None:
            e_pairs = _pair_from(ELIG, qlane) > 0.5
        s_self = _sel_rows(S, qlane)
        ok = e_pairs & not_eye
        front_ok = ok & (s_self[:, None, :] <= s_pairs)
        f_key = jnp.where(front_ok, s_pairs, BIG)
        f_min = jnp.min(f_key, axis=1)
        f_hit = front_ok & (f_key <= f_min[:, None, :])
        f_col = jnp.max(jnp.where(f_hit, col_i, -BIG), axis=1)
        f_hot = (f_hit & (col_i >= f_col[:, None, :])).astype(F32)
        front_ex = f_min < BIG

        rear_ok = ok & (s_pairs < s_self[:, None, :])
        r_key = jnp.where(rear_ok, s_pairs, -BIG)
        r_max = jnp.max(r_key, axis=1)
        r_hit = rear_ok & (r_key >= r_max[:, None, :])
        r_col = jnp.min(jnp.where(r_hit, col_i, BIG), axis=1)
        r_hot = (r_hit & (col_i <= r_col[:, None, :])).astype(F32)
        rear_ex = r_max > -BIG
        return f_hot, front_ex, r_hot, rear_ex, s_self, s_pairs

    fetch_fields = {
        "speed": f["speed"], "target_speed": f["target_speed"],
        "lane": lane, "s_own": s_own,
        "vx": vxv, "vy": vyv, "cos": cos_h, "sin": sin_h,
        "is_vehicle": is_vehicle.astype(F32),
    }
    EGO_KEYS = ("speed", "target_speed", "lane", "s_own", "cos", "sin",
                "is_vehicle")
    FRONT_KEYS = ("speed", "vx", "vy") if has_linear else ("vx", "vy")

    def fetch(hot, keys):
        out = {}
        for k in keys:
            out[k] = jnp.sum(hot * fetch_fields[k][None, :, :], axis=1)
        if "is_vehicle" in out:
            out["is_vehicle"] = out["is_vehicle"] > 0.5
        return out

    def fetch_s_per_lane(hot):
        """q_l[i] = S_l[fetched column of row i] for every lane l."""
        return [jnp.sum(hot * S[l][None, :, :], axis=1) for l in range(L)]

    # per-lane speed-limit handling without inf constants
    sl = gg.speed_limit
    has_lim = np.isfinite(sl).astype(np.float64)
    lim_val = np.where(np.isfinite(sl), sl, 0.0)

    def accel_pair(eg, ego_ex, fr_s_on_ego_lane, fr, fr_ex):
        """IDM/Linear acceleration (behavior.py:150-217).  ``eg`` carries the
        fetched decider-row fields; ``fr_s_on_ego_lane`` is the front's s
        measured on the ego's current lane."""
        ego_speed = eg["speed"]
        ego_ts_raw = eg["target_speed"]
        h_l = _sel_lane(has_lim, eg["lane"])
        l_v = _sel_lane(lim_val, eg["lane"])
        ego_ts = jnp.where(
            h_l > 0.5, jnp.clip(ego_ts_raw, 0.0, l_v), ego_ts_raw
        )
        free = p.comfort_acc_max * (
            1.0
            - jnp.power(
                jnp.maximum(ego_speed, 0.0) / jnp.abs(not_zero(ego_ts)),
                f["delta"],
            )
        )
        d = fr_s_on_ego_lane - eg["s_on_ego_lane"]
        dv = (ego_speed * eg["cos"] - fr["vx"]) * eg["cos"] + (
            ego_speed * eg["sin"] - fr["vy"]
        ) * eg["sin"]
        ab = -p.comfort_acc_max * p.comfort_acc_min
        d_star = (
            p.distance_wanted
            + ego_speed * p.time_wanted
            + ego_speed * dv / (2 * jnp.sqrt(ab))
        )
        interaction = p.comfort_acc_max * jnp.square(d_star / not_zero(d))
        acc = free - jnp.where(fr_ex, interaction, 0.0)
        if has_linear:
            vt = ego_ts_raw - ego_speed
            d_safe = p.distance_wanted + jnp.maximum(ego_speed, 0.0) * 2.5
            dv_raw = jnp.minimum(fr["speed"] - ego_speed, 0.0)
            dp = jnp.minimum(d - d_safe, 0.0)
            acc_lin = (
                f["accel_p0"] * vt
                + f["accel_p1"] * jnp.where(fr_ex, dv_raw, 0.0)
                + f["accel_p2"] * jnp.where(fr_ex, dp, 0.0)
            )
            acc = jnp.where(is_linear, acc_lin, acc)
        return jnp.where(ego_ex & eg["is_vehicle"], acc, 0.0)

    T = jnp.ones_like(crashed)

    # current-lane neighbours (query 1)
    op_hot, op_ex, of_hot, of_ex, s_self_cur, s_pairs_cur = neigh_masks(lane)

    self_row = dict(
        speed=f["speed"], target_speed=f["target_speed"], lane=lane,
        cos=cos_h, sin=sin_h, is_vehicle=is_vehicle,
        s_on_ego_lane=s_self_cur,
    )

    def self_decider_front_s(np_hot):
        """front's s on the SELF row's current lane via the current-lane
        pair table."""
        return jnp.sum(np_hot * s_pairs_cur, axis=1)

    def fetched_decider(hot):
        """Decider fields for a fetched (one-hot) row; s_on_ego_lane is the
        decider's own s on its own current lane."""
        eg = fetch(hot, EGO_KEYS)
        eg["s_on_ego_lane"] = eg.pop("s_own")
        return eg

    def front_s_on_lane(q_s_l, dec_lane):
        """front's s on the decider's current lane: select the per-lane
        fetches by the decider's lane."""
        out = q_s_l[0]
        for l in range(1, L):
            out = jnp.where(dec_lane >= l - 0.5, q_s_l[l], out)
        return out

    # a_self: own IDM on current lane
    row_op = fetch(op_hot, FRONT_KEYS)
    a_self = accel_pair(
        self_row, T, self_decider_front_s(op_hot), row_op, op_ex
    )

    # old follower (current lane rear)
    eg_of = fetched_decider(of_hot)
    row_self_front = {  # self as the front vehicle of a pair
        "speed": f["speed"], "vx": vxv, "vy": vyv,
    }
    q_op_l = fetch_s_per_lane(op_hot)
    # self's s on of's lane: S[lane_of][i]
    s_self_on_of = _sel_rows(S, eg_of["lane"])
    a_of = accel_pair(eg_of, of_ex, s_self_on_of, row_self_front, T)
    a_of_pred = accel_pair(
        eg_of, of_ex, front_s_on_lane(q_op_l, eg_of["lane"]), row_op, op_ex
    )

    mid_change = jnp.abs(lane - tlane) > 0.5
    tick = f["timer"] > p.lane_change_delay
    deciding = idm & ~mid_change & tick & (f["enable_lane_change"] > 0.5)
    new_timer = jnp.where(deciding, 0.0, f["timer"])
    moving = jnp.abs(f["speed"]) >= 1.0

    lane_id_cur = _sel_lane(gg.lane_id, lane)
    edge_base_cur = _sel_lane(gg.edge_base, lane)
    edge_n_cur = _sel_lane(gg.edge_n, lane)

    # route-directed MOBIL override inputs (behavior.py:287-298)
    head_id_m = route_entry("route_id", route_ptr)
    has_rid = (route_ptr < f["route_len"] - 0.5) & (head_id_m > -0.5)
    tgt_id_m = _sel_lane(gg.lane_id, tlane)

    target = tlane
    for dlt in (-1.0, 1.0):
        cand_id = lane_id_cur + dlt
        # exists: 0 <= cand_id < edge_n (controller/behavior side-lane rule)
        exists = (cand_id > -0.5) & (cand_id < edge_n_cur - 0.5)
        cand = jnp.clip(edge_base_cur + cand_id, 0.0, L - 1.0)
        np_hot, np_ex, nf_hot, nf_ex, s_self_cand, _sp = neigh_masks(cand)

        eg_nf = fetched_decider(nf_hot)
        q_np_l = fetch_s_per_lane(np_hot)
        row_np = fetch(np_hot, FRONT_KEYS)

        a_nf = accel_pair(
            eg_nf, nf_ex, front_s_on_lane(q_np_l, eg_nf["lane"]), row_np, np_ex
        )
        s_self_on_nf = _sel_rows(S, eg_nf["lane"])
        a_nf_pred = accel_pair(eg_nf, nf_ex, s_self_on_nf, row_self_front, T)
        safe = a_nf_pred >= -f["mobil_max_braking"]
        a_self_pred = accel_pair(
            self_row, T, self_decider_front_s(np_hot), row_np, np_ex
        )
        jerk = (
            a_self_pred
            - a_self
            + p.politeness * (a_nf_pred - a_nf + a_of_pred - a_of)
        )
        jerk_ok = jerk >= f["mobil_gain"]

        cand_id_m = _sel_lane(gg.lane_id, cand)
        sgn_c = jnp.sign(cand_id_m - tgt_id_m)
        sgn_h = jnp.sign(head_id_m - tgt_id_m)
        route_ok = (jnp.abs(sgn_c - sgn_h) < 0.5) & (
            a_self_pred >= -f["mobil_max_braking"]
        )
        # logic ops, not a select: mosaic cannot lower i1-operand selects
        mobil_ok = safe & ((has_rid & route_ok) | (~has_rid & jerk_ok))

        # is_reachable_from via the table (road/lane.py:104-118)
        lat_c = _sel_rows(LAT, cand)
        s_c = s_self_cand
        w_c = _sel_lane(gg.width, cand)
        len_c = _sel_lane(gg.length, cand)
        fb_c = _sel_lane(gg.forbidden.astype(np.float64), cand)
        reachable = (
            (jnp.abs(lat_c) <= 2.0 * w_c)
            & (0.0 <= s_c)
            & (s_c < len_c + VEHICLE_LENGTH)
            & (fb_c < 0.5)
        )
        ok = deciding & exists & reachable & moving & mobil_ok
        target = jnp.where(ok, cand, target)

    # abort-on-conflict (behavior.py:229-243), with the same-road gate
    d_ij = s_pairs_cur - s_self_cur[:, None, :]
    dv_ij = (vxv[:, None, :] - vxv[None, :, :]) * cos_h[:, None, :] + (
        vyv[:, None, :] - vyv[None, :, :]
    ) * sin_h[:, None, :]
    ab = -p.comfort_acc_max * p.comfort_acc_min
    d_star_ij = (
        p.distance_wanted
        + f["speed"][:, None, :] * p.time_wanted
        + f["speed"][:, None, :] * dv_ij / (2 * jnp.sqrt(ab))
    )
    conflict = (
        not_eye
        & (is_controlled.astype(F32)[None, :, :] > 0.5)
        & (jnp.abs(lane[None, :, :] - f["target_lane"][:, None, :]) > 0.5)
        & (
            jnp.abs(
                f["target_lane"][None, :, :] - f["target_lane"][:, None, :]
            )
            < 0.5
        )
        & (0.0 < d_ij)
        & (d_ij < d_star_ij)
    )
    edge_base_tl = _sel_lane(gg.edge_base, f["target_lane"])
    same_road = jnp.abs(edge_base_cur - edge_base_tl) < 0.5
    abort = (
        idm
        & mid_change
        & same_road
        & (jnp.max(conflict.astype(F32), axis=1) > 0.5)
    )
    target = jnp.where(abort, lane, target)

    # --- low-level controls (controller.py:145-198) ------------------------- #
    s_tgt = _sel_rows(S, target)
    lat_tgt = _sel_rows(LAT, target)
    ptgt = _dyn_params(gg, target)
    future_heading = _heading_dyn(
        ptgt, s_tgt + f["speed"] * controller.TAU_PURSUIT
    )
    lateral_speed_command = -controller.KP_LATERAL * lat_tgt
    heading_command = _asin(
        jnp.clip(lateral_speed_command / not_zero(f["speed"]), -1.0, 1.0)
    )
    heading_ref = future_heading + jnp.clip(
        heading_command, -np.pi / 4, np.pi / 4
    )
    heading_rate = controller.KP_HEADING * wrap_to_pi(
        heading_ref - f["heading"]
    )
    sin_slip = jnp.clip(
        f["length"] / 2 / not_zero(f["speed"]) * heading_rate, -1.0, 1.0
    )
    cos_slip = jnp.sqrt(jnp.maximum(1.0 - sin_slip * sin_slip, 0.0))
    steer_pc = _atan2_pos_x(2 * sin_slip, cos_slip)
    # steering_from_coords clips at the source (controller.py:145-187),
    # so the ego branch below must see the CLIPPED value too — the ego
    # saturates this bound when turning onto a new edge at low speed
    steer_pc = jnp.clip(
        steer_pc, -controller.MAX_STEERING_ANGLE,
        controller.MAX_STEERING_ANGLE,
    )
    if has_linear:
        feat_h = (
            wrap_to_pi(future_heading - f["heading"])
            * f["length"]
            / not_zero(f["speed"])
        )
        feat_lat = -lat_tgt * f["length"] / (not_zero(f["speed"]) ** 2)
        steer_lin = f["steer_p0"] * feat_h + f["steer_p1"] * feat_lat
        steering = jnp.where(is_linear, steer_lin, steer_pc)
    else:
        steering = steer_pc
    steering = jnp.clip(
        steering, -controller.MAX_STEERING_ANGLE, controller.MAX_STEERING_ANGLE
    )

    # dual-lane IDM while mid-change: the target lane can be any lane after
    # follow_road advanced it, so run the real 4th query (XLA idm_act does)
    mid = jnp.abs(lane - target) > 0.5
    npt_hot, npt_ex, _rh, _re, _ss, _sp2 = neigh_masks(target)
    a_t = accel_pair(
        self_row, T, self_decider_front_s(npt_hot), fetch(npt_hot, FRONT_KEYS),
        npt_ex,
    )
    accel = jnp.where(mid, jnp.minimum(a_self, a_t), a_self)
    accel = jnp.clip(accel, -p.acc_max, p.acc_max)

    if raw_controls:
        new_steer = jnp.where(idm, steering, f["steering"])
        new_accel = jnp.where(idm, accel, f["accel"])
    else:
        ego_acc = controller.KP_A * (target_speed - f["speed"])
        new_steer = jnp.where(
            is_ego, steer_pc, jnp.where(idm, steering, f["steering"])
        )
        new_accel = jnp.where(is_ego, ego_acc, jnp.where(idm, accel, f["accel"]))

    # --- integrate (vehicle/kinematics.py:130-168) -------------------------- #
    st = jnp.where(crashed, 0.0, new_steer)
    ac = jnp.where(crashed, -1.0 * f["speed"], new_accel)
    ac = jnp.where(
        f["speed"] > MAX_SPEED,
        jnp.minimum(ac, MAX_SPEED - f["speed"]),
        jnp.where(
            f["speed"] < MIN_SPEED,
            jnp.maximum(ac, MIN_SPEED - f["speed"]),
            ac,
        ),
    )
    beta = _atan(0.5 * _tan(st))
    hb = f["heading"] + beta
    pend = f["impact_pending"] > 0.5
    px = f["px"] + f["speed"] * jnp.cos(hb) * dt + jnp.where(
        pend, f["impact_x"], 0.0
    )
    py = f["py"] + f["speed"] * jnp.sin(hb) * dt + jnp.where(
        pend, f["impact_y"], 0.0
    )
    new_crashed = crashed | (pend & is_vehicle)
    heading = f["heading"] + f["speed"] * jnp.sin(beta) / (f["length"] / 2) * dt
    speed = f["speed"] + ac * dt

    mv = is_vehicle
    px = jnp.where(mv, px, f["px"])
    py = jnp.where(mv, py, f["py"])
    heading = jnp.where(mv, heading, f["heading"])
    speed = jnp.where(mv, speed, f["speed"])
    crashed_f = ((mv & new_crashed) | (~mv & crashed)).astype(F32)
    impact_x = jnp.where(mv, 0.0, f["impact_x"])
    impact_y = jnp.where(mv, 0.0, f["impact_y"])
    pend_left = pend & ~mv
    timer = jnp.where(mv, new_timer + dt, new_timer)

    # --- re-localization (closest lane, heading-aware; road.py:55-71) ------ #
    best_d = None
    new_lane = jnp.zeros_like(lane)
    for l in range(L):
        s_l, lat_l = _local_coords_static(gg, l, px, py)
        h_l = _heading_static(gg, l, s_l)
        d_l = (
            jnp.abs(lat_l)
            + jnp.maximum(s_l - float(gg.length[l]), 0.0)
            + jnp.maximum(-s_l, 0.0)
            + jnp.abs(wrap_to_pi(heading - h_l))
        )
        if best_d is None:
            best_d = d_l
        else:
            better = d_l < best_d  # first minimum wins
            new_lane = jnp.where(better, float(l), new_lane)
            best_d = jnp.where(better, d_l, best_d)
    lane_out = jnp.where(mv, new_lane, lane)

    # --- collisions (sphere pre-check + swept SAT; ops/collision.py) -------- #
    kind_q = kind[:, None, :]
    kind_c = kind[None, :, :]
    veh_q = (kind_q > KIND_EGO - 0.5) & (kind_q < KIND_PLAIN + 0.5)
    veh_c = (kind_c > KIND_EGO - 0.5) & (kind_c < KIND_PLAIN + 0.5)
    chk_q = f["check_collisions"][:, None, :] > 0.5
    chk_c = f["check_collisions"][None, :, :] > 0.5
    upper = row_i < col_i
    pair_ok = (
        upper
        & (kind_q > 0.5) & (kind_c > 0.5)
        & (veh_q | veh_c)
        & (chk_q | chk_c)
        & (f["collidable"][:, None, :] > 0.5)
        & (f["collidable"][None, :, :] > 0.5)
    )
    dx = px[:, None, :] - px[None, :, :]
    dy = py[:, None, :] - py[None, :, :]
    dist2 = dx * dx + dy * dy
    diag = jnp.sqrt(f["length"] ** 2 + f["width"] ** 2)
    reach = (diag[:, None, :] + diag[None, :, :]) / 2 + speed[:, None, :] * dt
    pair_ok = pair_ok & (dist2 <= reach * reach)

    velx = speed * jnp.cos(heading)
    vely = speed * jnp.sin(heading)
    inter, will, tx, ty = rects_intersecting_xy_folded(
        px[:, None, :], py[:, None, :],
        f["length"][:, None, :], f["width"][:, None, :], heading[:, None, :],
        px[None, :, :], py[None, :, :],
        f["length"][None, :, :], f["width"][None, :, :], heading[None, :, :],
        relx=(velx[:, None, :] - velx[None, :, :]) * dt,
        rely=(vely[:, None, :] - vely[None, :, :]) * dt,
    )
    inter = inter & pair_ok
    will = will & pair_ok

    def anyf(x, axis):
        return jnp.max(x.astype(F32), axis=axis) > 0.5

    solid_q = (kind_q > 0.5) & (jnp.abs(kind_q - KIND_LANDMARK) > 0.5)
    solid_c = (kind_c > 0.5) & (jnp.abs(kind_c - KIND_LANDMARK) > 0.5)
    both = solid_q & solid_c
    obst_q = jnp.abs(kind_q - KIND_OBSTACLE) < 0.5
    obst_c = jnp.abs(kind_c - KIND_OBSTACLE) < 0.5
    w = will & both
    neither = ~obst_q & ~obst_c
    coef_q = jnp.where(w & obst_c, 1.0, jnp.where(w & neither, 0.5, 0.0))
    coef_c = jnp.where(w & obst_q, 1.0, jnp.where(w & neither, -0.5, 0.0))
    # last-written impact (PARITY #2, objects.py:104-111 assigns; loop
    # order road.py:477-481): max-index row-side writing pair wins, else
    # max-index column-side pair, else the carried value
    write_q = w & ~obst_q
    write_c = w & ~obst_c
    last_c = jnp.max(jnp.where(write_q, col_i, -1.0), axis=1)
    last_q = jnp.max(jnp.where(write_c, row_i, -1.0), axis=0)
    sel_row = write_q & (col_i >= last_c[:, None, :])
    sel_col = write_c & (row_i >= last_q[None, :, :])
    imp_row_x = jnp.sum(jnp.where(sel_row, coef_q * tx, 0.0), axis=1)
    imp_row_y = jnp.sum(jnp.where(sel_row, coef_q * ty, 0.0), axis=1)
    imp_col_x = jnp.sum(jnp.where(sel_col, coef_c * tx, 0.0), axis=0)
    imp_col_y = jnp.sum(jnp.where(sel_col, coef_c * ty, 0.0), axis=0)
    any_row = last_c >= 0.0
    any_col = last_q >= 0.0
    impact_x = jnp.where(
        any_row, imp_row_x, jnp.where(any_col, imp_col_x, impact_x)
    )
    impact_y = jnp.where(
        any_row, imp_row_y, jnp.where(any_col, imp_col_y, impact_y)
    )
    impact_pending = pend_left | any_row | any_col
    crash_pair = inter & both
    crashed_out = (crashed_f > 0.5) | anyf(crash_pair, 1) | anyf(crash_pair, 0)
    hit_pair_q = inter & ~solid_q
    hit_pair_c = inter & ~solid_c
    hit = (f["hit"] > 0.5) | anyf(hit_pair_q, 1) | anyf(hit_pair_c, 0)

    out = dict(f)
    out.update(
        px=px, py=py, heading=heading, speed=speed,
        lane=lane_out, target_lane=target, target_speed=target_speed,
        timer=timer, crashed=crashed_out.astype(F32), hit=hit.astype(F32),
        impact_pending=impact_pending.astype(F32),
        impact_x=impact_x, impact_y=impact_y,
        steering=new_steer, accel=new_accel,
        route_ptr=route_ptr, speed_index=speed_index,
    )

    if reg_period is not None and enforce is not None:
        # --- RegulatedRoad right-of-way (road/regulation.py:36-112) -------- #
        # In-kernel port of road/regulation.py::enforce_road_rules +
        # predict_route_positions.  Two gating modes (see ``enforce``):
        # the round-4 every-frame build computes this block in all 15
        # frames and masks writes by each env's own mod-derived tick
        # phase (a measured 2.4x end-to-end loss — 15 evaluations where
        # the XLA scheduler amortizes ~2.1); the round-5 STATIC-SLOT
        # schedule (build_general_frame) computes it at only
        # ceil(frames/period) static tick slots, passing the slot's
        # activity mask as ``enforce``.  Reads only pre-integration
        # state; writes target_speed / is_yielding / yield_timer, which
        # nothing later in the frame reads — so evaluating it here (after
        # the collision block) is equivalent to the XLA path's
        # before-integration hook.
        from highwayenv_tpu.road.regulation import (
            CONFLICT_HORIZON,
            CONFLICT_STEP,
            REGULATION_FREQUENCY,
            YIELD_DURATION,
        )

        if isinstance(enforce, str):  # "mod": derive each env's tick phase
            tick = (
                jnp.mod(f["steps0"] + i_f + 1.0, float(reg_period)) < 0.5
            )  # (V, blk); steps0 is replicated over rows
        else:
            tick = jnp.zeros_like(f["px"]) + enforce  # broadcast (blk,)
            tick = tick > 0.5
        can_yield = (jnp.abs(kind - KIND_IDM) < 0.5) | (
            jnp.abs(kind - KIND_LINEAR) < 0.5
        )

        # 1. unfreeze expired yielders (regulation.py:113-125)
        yld = f["is_yielding"] > 0.5
        expired = yld & (
            f["yield_timer"] >= YIELD_DURATION * REGULATION_FREQUENCY - 0.5
        )
        limit = _sel_lane(gg.speed_limit, lane)
        ts_reg = jnp.where(expired, limit, target_speed)
        yt_reg = jnp.where(
            yld & ~expired, f["yield_timer"] + 1.0, f["yield_timer"]
        )
        yld_reg = yld & ~expired

        # 2. constant-speed route predictions (regulation.py:31-106).
        # Route walk unrolled over the R segments; positions/headings per
        # prediction time via the analytic per-lane forms.
        s0 = _sel_rows(S, lane)
        has_rt = route_ptr < f["route_len"] - 0.5
        cur_id_own = _sel_lane(gg.lane_id, lane)
        valid_r, seg_lane_r, cum_r = [], [], []
        acc = jnp.zeros_like(lane)
        for r in range(R):
            v_r = (
                has_rt
                & (float(r) >= route_ptr - 0.5)
                & (float(r) < f["route_len"] - 0.5)
            )
            fallback = jnp.where(
                cur_id_own < f[f"route_n_{r}"] - 0.5, cur_id_own, 0.0
            )
            seg_id = jnp.where(
                f[f"route_id_{r}"] >= -0.5, f[f"route_id_{r}"], fallback
            )
            sl = jnp.clip(f[f"route_base_{r}"] + seg_id, 0.0, float(L - 1))
            sl = jnp.where(v_r, sl, lane)
            valid_r.append(v_r)
            seg_lane_r.append(sl)
            acc = acc + jnp.where(v_r, _sel_lane(gg.length, sl), 0.0)
            cum_r.append(acc)
        n_valid = sum(jnp.where(v, 1.0, 0.0) for v in valid_r)
        first_seg = jnp.zeros_like(lane)
        found = jnp.zeros_like(valid_r[0])
        for r in range(R):
            first_seg = jnp.where(~found & valid_r[r], float(r), first_seg)
            found = found | valid_r[r]
        last_seg = jnp.where(n_valid > 0.5, first_seg + n_valid - 1.0, 0.0)

        times = np.arange(CONFLICT_STEP, CONFLICT_HORIZON, CONFLICT_STEP)
        px_t, py_t, ch_t, sh_t = [], [], [], []
        for t in times:
            target_t = s0 + f["speed"] * float(t)
            k = first_seg
            for r in range(R):
                add = (
                    (target_t > cum_r[r])
                    & (float(r) < last_seg - 0.5)
                    & valid_r[r]
                )
                k = k + jnp.where(add, 1.0, 0.0)
            k = jnp.minimum(k, last_seg)
            lane_k = seg_lane_r[0]
            for r in range(1, R):
                lane_k = jnp.where(k >= r - 0.5, seg_lane_r[r], lane_k)
            base = jnp.zeros_like(lane)
            for r in range(R):
                base = jnp.where(k - 1.0 >= r - 0.5, cum_r[r], base)
            base = jnp.where(k > first_seg + 0.5, base, 0.0)
            s_loc = target_t - base
            pk = _dyn_params(gg, lane_k)
            pxt, pyt = _position_dyn(pk, s_loc, jnp.zeros_like(s_loc))
            ht = _heading_dyn(pk, s_loc)
            px_t.append(pxt)
            py_t.append(pyt)
            ch_t.append(jnp.cos(ht))
            sh_t.append(jnp.sin(ht))

        # 3. pairwise future-overlap probes (regulation.py:127-191):
        # 9 probe points of the 1.5x-length / 0.9x-width rect, both ways
        l_i = f["length"][:, None, :]
        w_i = f["width"][:, None, :]
        l_j = f["length"][None, :, :]
        w_j = f["width"][None, :, :]
        la_i, wa_i = 1.5 * l_i, 0.9 * w_i
        la_j, wa_j = 1.5 * l_j, 0.9 * w_j
        probes = (
            (-0.5, -0.5), (-0.5, 0.5), (0.5, 0.5), (0.5, -0.5), (0.0, 0.0),
            (-0.5, 0.0), (0.5, 0.0), (0.0, -0.5), (0.0, 0.5),
        )

        def reg_one_way(ax, ay, la, wa, ca, sa, bx, by, lb, wb, cb, sb):
            hit_ = None
            for fx, fy in probes:
                lx = fx * la
                ly = fy * wa
                ppx = ax + ca * lx - sa * ly
                ppy = ay + sa * lx + ca * ly
                dxp = ppx - bx
                dyp = ppy - by
                rx = cb * dxp - sb * dyp
                ry = sb * dxp + cb * dyp
                ins = (
                    (-lb / 2 <= rx) & (rx <= lb / 2)
                    & (-wb / 2 <= ry) & (ry <= wb / 2)
                )
                hit_ = ins if hit_ is None else hit_ | ins
            return hit_

        any_hit = None
        for ti in range(len(times)):
            pxi, pxj = px_t[ti][:, None, :], px_t[ti][None, :, :]
            pyi, pyj = py_t[ti][:, None, :], py_t[ti][None, :, :]
            ci, cj = ch_t[ti][:, None, :], ch_t[ti][None, :, :]
            si, sj = sh_t[ti][:, None, :], sh_t[ti][None, :, :]
            dxp = pxj - pxi
            dyp = pyj - pyi
            close = dxp * dxp + dyp * dyp <= l_i * l_i
            hit_t = close & (
                reg_one_way(pxi, pyi, la_i, wa_i, ci, si,
                            pxj, pyj, la_j, wa_j, cj, sj)
                | reg_one_way(pxj, pyj, la_j, wa_j, cj, sj,
                              pxi, pyi, la_i, wa_i, ci, si)
            )
            any_hit = hit_t if any_hit is None else any_hit | hit_t

        upper = row_i < col_i
        conflict = (
            upper
            & is_vehicle[:, None, :] & is_vehicle[None, :, :]
            & any_hit
        )

        # 4. who yields: lower priority; tie -> the trailing vehicle
        # (regulation.py:194-220)
        prio = _sel_lane(gg.priority, lane)
        p_i = prio[:, None, :]
        p_j = prio[None, :, :]
        cos_h0 = jnp.cos(f["heading"])
        sin_h0 = jnp.sin(f["heading"])
        dx0 = f["px"][None, :, :] - f["px"][:, None, :]
        dy0 = f["py"][None, :, :] - f["py"][:, None, :]
        front_ij = dx0 * cos_h0[:, None, :] + dy0 * sin_h0[:, None, :]
        front_ji = -dx0 * cos_h0[None, :, :] - dy0 * sin_h0[None, :, :]
        tie = jnp.abs(p_i - p_j) < 0.5
        i_yields = (p_i < p_j - 0.5) | (tie & (front_ij > front_ji))
        yield_i = conflict & i_yields
        yield_j = conflict & ~i_yields
        new_yield = (
            (jnp.max(jnp.where(yield_i, 1.0, 0.0), axis=1) > 0.5)
            | (jnp.max(jnp.where(yield_j, 1.0, 0.0), axis=0) > 0.5)
        ) & can_yield
        ts_reg = jnp.where(new_yield, 0.0, ts_reg)
        yt_reg = jnp.where(new_yield, 0.0, yt_reg)
        yld_reg = yld_reg | new_yield

        # apply only on this env's tick frames
        out.update(
            target_speed=jnp.where(tick, ts_reg, target_speed),
            yield_timer=jnp.where(tick, yt_reg, f["yield_timer"]),
            is_yielding=jnp.where(
                tick, jnp.where(yld_reg, 1.0, 0.0), f["is_yielding"]
            ),
        )
    return out


# --------------------------------------------------------------------------- #
# pallas_call wrapper
# --------------------------------------------------------------------------- #


def build_general_frame(
    env,
    R: int,
    block: int = 128,
    interpret: bool = False,
    vmem_limit_mb: int = int(
        __import__("os").environ.get("HT_PALLAS_VMEM_MB", 100)
    ),
    frames: int = 1,
    regulated: bool = False,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    gg = env._general
    p = env.idm_params
    dt = env.dt
    raw = getattr(env.action_type, "stores_raw_controls", False)
    npc = env.config.get("other_vehicles_type", "").rsplit(".", 1)[-1]
    has_linear = npc in getattr(env, "_NPC_PRESETS", {})
    if raw:
        meta = None
    else:
        at = env.action_type
        meta = (
            tuple(float(x) for x in np.asarray(at.target_speeds)),
            bool(getattr(at, "longitudinal", True)),
            bool(getattr(at, "lateral", True)),
        )
    reg_period = int(env._regulation_period) if regulated else None
    mut, const = gen_fields(R, regulated)
    body = functools.partial(
        _frame_body_general, gg, p, dt, raw, has_linear, meta, R, reg_period
    )
    n = len(mut) + len(const)
    n_mut = len(mut)

    every_frame = bool(__import__("os").environ.get("HT_REG_EVERY_FRAME"))

    def kernel(*refs):
        f = {name: r[:] for name, r in zip(mut + const, refs[:n])}
        if frames == 1:
            out = body(f, jnp.float32(0.0))
        elif reg_period is None or every_frame:
            consts = {name: f[name] for name in const}

            def step(i, m):
                return {
                    name: body({**m, **consts}, i.astype(F32))[name]
                    for name in mut
                }

            mut0 = {name: f[name] for name in mut}
            out = jax.lax.fori_loop(0, frames, step, mut0)
        else:
            # STATIC-SLOT schedule (round 5): the regulated block is
            # computed at only ceil(frames/period) static tick slots
            # instead of every frame.  Mixed per-env phases are handled by
            # slot-activity masking: env with first-tick offset
            # i0 = period-1 - steps0%period executes prologue slots
            # j < i0, then tick/chunk slots while its frame index
            # i0 + e*period + j stays < frames — exactly `frames` active
            # slots per env, identical per-frame semantics, ~1.4x slot
            # overhead in exchange for a (frames/ticks)x cut of the
            # expensive conflict pass.  HT_REG_EVERY_FRAME=1 restores the
            # round-4 every-frame build for A/B.
            period = reg_period
            consts = {name: f[name] for name in const}
            phase = f["steps0"][0]  # (blk,) — packed as steps0 % period
            i0 = float(period - 1) - phase  # first tick offset per env

            def masked(m, i_vec, act, enf):
                o = body({**m, **consts}, i_vec, enforce=enf)
                return {
                    name: jnp.where(act, o[name], m[name]) for name in mut
                }

            m = {name: f[name] for name in mut}
            # one fori over tick periods, each = [period-1 masked plain
            # slots LEADING UP TO the tick + the tick slot]: the program
            # contains the enforcement-bearing body exactly ONCE (inlining
            # it per tick tripled its VMEM footprint: 21.9 ms vs 15.6),
            # and period 0's leading slots double as the prologue (frames
            # 0..i0-1), so the schedule is the minimal period-1 + frames
            # = 21 slots for frames=15, period=7 (a separate prologue +
            # trailing masked chunks measured 27 slots / ~16 ms)
            max_ticks = -(-frames // period)

            def one_period(e, m):
                t_e = i0 + e.astype(F32) * float(period)

                def lead(j, m):
                    # frames t_e - (period-1) .. t_e - 1, clipped to the
                    # policy step; period 0: exactly the 0..i0-1 prologue
                    fidx = t_e - float(period) + j.astype(F32)
                    return masked(
                        m, fidx, (fidx >= 0.0) & (fidx < float(frames)),
                        None,
                    )

                m = jax.lax.fori_loop(1, period, lead, m)
                act = t_e < float(frames)
                return masked(m, t_e, act, act)

            out = jax.lax.fori_loop(0, max_ticks, one_period, m)
        for name, r in zip(mut, refs[n:]):
            r[:] = out[name]

    def frame(arrays):
        V, B = arrays[0].shape
        grid = (B // block,)
        spec = lambda: pl.BlockSpec(
            (V, block), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        mut_out = pl.pallas_call(
            kernel,
            out_shape=[
                jax.ShapeDtypeStruct((V, B), F32) for _ in range(n_mut)
            ],
            grid=grid,
            in_specs=[spec() for _ in range(n)],
            out_specs=[spec() for _ in range(n_mut)],
            input_output_aliases={i: i for i in range(n_mut)},
            compiler_params=None
            if interpret
            else pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_mb * 1024 * 1024
            ),
            interpret=interpret,
        )(*arrays)
        return list(mut_out) + list(arrays[n_mut:])

    return frame


def pallas_simulate_general(
    env, veh: VehicleState, slot_actions, frames: int,
    block: int = 128, interpret: bool = False, steps0=None,
) -> VehicleState:
    """Policy-step simulation on the general path: raw-control actions are
    stored in XLA; DiscreteMetaAction egos are applied INSIDE the kernel on
    frame 0 (after follow_road, matching envs/base.py::_frame order — the
    straight kernel can apply them outside because straight networks have no
    follow_road).

    ``steps0`` (the (B,) per-env frame counter at step start) switches the
    kernel to the REGULATED build: the RegulatedRoad right-of-way pass runs
    inside the kernel, masked to each env's own tick phase."""
    raw = getattr(env.action_type, "stores_raw_controls", False)
    if raw:
        ego_mask = veh.kind == KIND_EGO
        veh = env.action_type.apply(env.geo, veh, ego_mask, slot_actions)
        actions = jnp.zeros_like(veh.timer)
    else:
        actions = jnp.broadcast_to(
            jnp.asarray(slot_actions, F32)[..., None], veh.timer.shape
        ) if jnp.ndim(slot_actions) < veh.timer.ndim else jnp.asarray(
            slot_actions, F32
        )

    regulated = steps0 is not None
    if regulated:
        # pack only the tick PHASE: the raw cumulative counter loses f32
        # integer exactness past 2^24 frames (~1.1M policy steps of a long
        # autoreset run) and regulation would silently fire on wrong
        # frames; the kernel's mod(steps0 + i_f + 1, period) only ever
        # needs steps0 mod period, which stays exact forever
        steps0 = jnp.asarray(  # mod BEFORE the f32 cast (int32 is exact)
            jnp.mod(jnp.asarray(steps0), env._regulation_period), F32
        )
    R = veh.route_base.shape[-1]
    key = (id(env), R, block, interpret, frames, regulated)
    if key not in _FRAME_CACHE:
        _FRAME_CACHE[key] = build_general_frame(
            env, R, block=block, interpret=interpret, frames=frames,
            regulated=regulated,
        )
    arrays = _FRAME_CACHE[key](pack_general(veh, actions, steps0=steps0))
    return unpack_general(list(arrays), veh, regulated=regulated)


_FRAME_CACHE: dict = {}
