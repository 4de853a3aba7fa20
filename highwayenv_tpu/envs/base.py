"""Functional env core: fused frame kernel + scan-based step.

The reference AbstractEnv (envs/common/abstract.py:40-465) holds mutable
Python scene state and loops ``road.act(); road.step(dt)`` per simulation
frame.  Here the whole policy step is one pure jittable function: a
``lax.scan`` over ``sim_freq // policy_freq`` fused frames of
{follow_road, ego meta-action, IDM/MOBIL decisions, P-controllers, bicycle
integration, lane re-localization, pairwise collisions}, followed by the
observation / reward / termination heads.  ``vmap`` over EnvState batches
thousands of envs per chip; the batch axis shards over a device mesh.
"""

from __future__ import annotations

import copy
from functools import partial
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from highwayenv_tpu.ops import collision
from highwayenv_tpu.road import lane as lane_ops
from highwayenv_tpu.vehicle import behavior, controller, kinematics
from highwayenv_tpu.vehicle.behavior import IDMParams
from highwayenv_tpu.vehicle.state import (
    KIND_EGO,
    KIND_IDM,
    KIND_LINEAR,
    VehicleState,
)


@flax.struct.dataclass
class EnvState:
    vehicles: VehicleState
    time: jnp.ndarray  # f32 scalar, simulation time [s]
    steps: jnp.ndarray  # i32 scalar, simulation frames executed
    key: jnp.ndarray  # PRNG key for in-episode randomness
    # DQN-style frame stack for GrayscaleObservation (None otherwise); the
    # reference keeps it on the observation object (observation.py:82), but
    # a pure step must carry it in state
    obs_stack: jnp.ndarray | None = None


class BaseEnv:
    """Config surface mirrors the reference AbstractEnv.

    Pure API (all jittable, single-env semantics; use vmap for batching):
      reset(key)          -> (obs, EnvState)
      step(state, action) -> (obs, EnvState, reward, terminated, truncated, info)
    """

    PERCEPTION_DISTANCE = 200.0

    def __init__(self, config: dict | None = None):
        self.config = self.default_config()
        self.configure(config)
        self._build()

    @classmethod
    def default_config(cls) -> dict:
        """envs/common/abstract.py:101-125."""
        return {
            "observation": {"type": "Kinematics"},
            "action": {"type": "DiscreteMetaAction"},
            "simulation_frequency": 15,
            "policy_frequency": 1,
            "other_vehicles_type": "highway_env.vehicle.behavior.IDMVehicle",
            "screen_width": 600,
            "screen_height": 150,
            "centering_position": [0.3, 0.5],
            "scaling": 5.5,
            "show_trajectories": False,
            "render_agent": True,
            "offscreen_rendering": None,
            "manual_control": False,
            "real_time_rendering": False,
            "neighbour_vehicles_connected_lanes": False,
        }

    def configure(self, config: dict | None) -> None:
        if config:
            self.config.update(copy.deepcopy(config))

    # ------------------------------------------------------------------ #
    # build
    # ------------------------------------------------------------------ #
    #: initial value of the frame counter (RegulatedRoad counts its warm-up
    #: frames, so enforcement phase depends on it)
    _initial_steps = 0

    #: set False to force the general frame kernel even on straight networks
    fast_straight = True

    #: general-path (analytic curved network) pallas kernel
    #: (ops/general_pallas_bm.py::try_general gates eligibility)
    fast_general = True

    #: pallas block width for the batched straight-path kernel
    pallas_block = 128

    #: unroll factor for the general-path frame scan: small-V scenarios are
    #: launch/fusion-overhead bound, so letting XLA fuse across frames wins
    #: (override with HT_SCAN_UNROLL)
    @property
    def _scan_unroll(self) -> int:
        import os

        return int(os.environ.get("HT_SCAN_UNROLL", 5))

    def _use_pallas(self, batch: int) -> bool:
        """Pallas frame kernel: TPU platform + straight network + batch a
        multiple of the block width; HT_NO_PALLAS=1 disables."""
        import os

        if os.environ.get("HT_NO_PALLAS"):
            return False
        if self._straight is None or batch % self.pallas_block != 0:
            return False
        try:
            # 'axon' is the tunneled-TPU plugin platform name
            return jax.default_backend() in ("tpu", "axon")
        except Exception:
            return False

    def _use_pallas_general(self, batch: int) -> bool:
        """General-path pallas kernel: TPU platform + eligible analytic
        network (``self._general``) + batch a multiple of the block width."""
        import os

        if os.environ.get("HT_NO_PALLAS"):
            return False
        if (
            getattr(self, "_general", None) is None
            or batch % self.pallas_block != 0
        ):
            return False
        try:
            return jax.default_backend() in ("tpu", "axon")
        except Exception:
            return False

    def _build(self):
        self._build_scene()  # subclass: sets self.net / self.geo / slots
        self._build_spaces()
        self.idm_params = self._idm_params()
        # straight parallel-lane networks get a specialized frame kernel
        # (ops/straight_fast.py): no lane tables, no trig
        from highwayenv_tpu.ops import straight_fast

        self._straight = (
            straight_fast.try_compile(self.net) if self.fast_straight else None
        )
        if self.regulated:
            self._straight = None  # regulation needs the general path
        if self.config.get("sequential_decisions", False):
            # the exact act()-list-order mode lives only in the general
            # _frame path — the straight/pallas fast paths implement the
            # parallel (pre-frame state) decision pass
            self._straight = None
        # analytic (curved) networks get the general-path pallas megakernel
        # (ops/general_pallas_bm.py) — the XLA general frame is
        # op-launch-bound at small V (BASELINE.md, 2026-08-18)
        from highwayenv_tpu.ops import general_pallas_bm

        try:
            self._general = (
                general_pallas_bm.try_general(self)
                if self.fast_general
                and not self.config.get("sequential_decisions", False)
                else None
            )
        except Exception:
            self._general = None
        self.dt = 1.0 / self.config["simulation_frequency"]
        self.frames_per_step = int(
            self.config["simulation_frequency"] // self.config["policy_frequency"]
        )
        self.step = jax.jit(self._step)
        self.reset = jax.jit(self._reset)

    def _build_scene(self):
        raise NotImplementedError

    def _idm_params(self) -> IDMParams:
        return IDMParams()

    def _build_spaces(self):
        from highwayenv_tpu.factories import action_factory, observation_factory

        self.action_type = action_factory(self.config["action"], self)
        self.observation_type = observation_factory(self, self.config["observation"])

    @property
    def action_space(self):
        return self.action_type.space()

    @property
    def observation_space(self):
        return self.observation_type.space()

    # ------------------------------------------------------------------ #
    # subclass hooks
    # ------------------------------------------------------------------ #
    @property
    def ego_slots(self) -> tuple[int, ...]:
        return (0,)

    def _reset_vehicles(self, key) -> VehicleState:
        raise NotImplementedError

    def _rewards(self, state: EnvState, action) -> dict[str, jnp.ndarray]:
        raise NotImplementedError

    def _reward(self, state: EnvState, action) -> jnp.ndarray:
        raise NotImplementedError

    def _is_terminated(self, state: EnvState) -> jnp.ndarray:
        raise NotImplementedError

    def _is_truncated(self, state: EnvState) -> jnp.ndarray:
        raise NotImplementedError

    def _info(self, state: EnvState, action) -> dict[str, Any]:
        """envs/common/abstract.py:200-217."""
        ego = self.ego_slots[0]
        info = {
            "speed": state.vehicles.speed[..., ego],
            "crashed": state.vehicles.crashed[..., ego],
            "action": action,
        }
        try:
            info["rewards"] = self._rewards(state, action)
        except NotImplementedError:
            pass
        return info

    # ------------------------------------------------------------------ #
    # helpers shared by scenario reward/termination code
    # ------------------------------------------------------------------ #
    def ego_on_road(self, state: EnvState, ego: int | None = None) -> jnp.ndarray:
        """RoadObject.on_road (vehicle/objects.py:200-203)."""
        veh = state.vehicles
        ego = self.ego_slots[0] if ego is None else ego
        lane = veh.lane[..., ego]
        s, lat = lane_ops.local_coordinates(self.geo, lane, veh.pos[..., ego, :])
        return lane_ops.on_lane(self.geo, lane, s, lat)

    # ------------------------------------------------------------------ #
    # fused simulation frame
    # ------------------------------------------------------------------ #
    def _action_to_slots(self, action) -> jnp.ndarray:
        """Scatter the agent action(s) to a per-slot array.

        Discrete action types: scalar per agent -> (..., V) int32.
        Continuous: (size,) floats per agent -> (..., V, size) float32.
        """
        V = self.num_slots
        extra = getattr(self.action_type, "action_shape", ())
        if extra:  # vector (continuous) action
            action = jnp.asarray(action, jnp.float32)
            if len(self.ego_slots) == 1:
                batch = action.shape[: action.ndim - 1]
                slots = jnp.zeros(batch + (V,) + extra, jnp.float32)
                return slots.at[..., self.ego_slots[0], :].set(action)
            batch = action.shape[: action.ndim - 2]
            slots = jnp.zeros(batch + (V,) + extra, jnp.float32)
            for k, slot in enumerate(self.ego_slots):
                slots = slots.at[..., slot, :].set(action[..., k, :])
            return slots
        action = jnp.asarray(action, jnp.int32)
        if len(self.ego_slots) == 1:
            slots = jnp.zeros(action.shape + (V,), jnp.int32)
            return slots.at[..., self.ego_slots[0]].set(action)
        slots = jnp.zeros(action.shape[:-1] + (V,), jnp.int32)
        for k, slot in enumerate(self.ego_slots):
            slots = slots.at[..., slot].set(action[..., k])
        return slots

    #: subclasses set True to run the RegulatedRoad right-of-way pass
    #: (road/regulation.py:36-40) inside the frame loop
    regulated = False

    #: lane count of the ego's deterministic reset edge, or None.  Feeds
    #: KinematicsObservation's features_range default so normalization
    #: ranges are frozen at the reset edge like the reference's
    #: once-per-reset cache (observation.py:214-226, PARITY #5); envs set
    #: it in _build_scene.
    obs_edge_lanes = None

    def _frame(
        self,
        veh: VehicleState,
        tables,
        slot_actions: jnp.ndarray,
        first: jnp.ndarray,
        enforce: jnp.ndarray | bool | None = None,
    ):
        """One simulation frame = road.act() + road.step(dt)
        (envs/common/abstract.py:287-317, road/road.py:464-481).

        ``tables`` is the (s, lat) projection table of the *current*
        positions on every lane (road/lane.py projection_table); the frame
        consumes it for all decision-phase lane queries and returns the
        post-integration table for the next frame / re-localization.
        """
        geo = self.geo
        table_s, table_lat = tables

        connected = bool(
            self.config.get("neighbour_vehicles_connected_lanes", False)
        )
        raw_controls = getattr(self.action_type, "stores_raw_controls", False)
        if self.config.get("sequential_decisions", False):
            # exact reference act()-list-order mode (road/road.py:464-467):
            # meta-action first (action_type.act precedes road.act,
            # abstract.py:287-295), then a per-slot scan where follow_road
            # and the MOBIL/abort decision of vehicle i observe the
            # same-frame target-lane writes of vehicles j < i.  Opt-in
            # parity path; the production path below evaluates decisions on
            # pre-frame state (PARITY.md #1).
            ego_mask = (veh.kind == KIND_EGO) & first
            veh = self.action_type.apply(geo, veh, ego_mask, slot_actions)
            veh, idm_steer, idm_acc = behavior.idm_act_sequential(
                geo, self.idm_params, veh, table_s, table_lat,
                self.max_edge_lanes, connected=connected,
            )
            if not raw_controls:
                # ego controls from its final target (its own act computes
                # them after its follow_road; later vehicles cannot touch
                # its target, so post-scan evaluation is order-exact)
                ego_steer, ego_acc = controller.controlled_vehicle_controls(
                    geo, veh, table_s, table_lat
                )
        else:
            # every controlled/IDM vehicle first advances its target lane at
            # lane ends (controller.py:98, behavior.py:106)
            veh = controller.follow_road(geo, veh, self.max_edge_lanes, table_s)

            # ego meta-action on the first frame of the policy step
            ego_mask = (veh.kind == KIND_EGO) & first
            veh = self.action_type.apply(geo, veh, ego_mask, slot_actions)

            if not raw_controls:
                # low-level controls for externally-actioned vehicles
                ego_steer, ego_acc = controller.controlled_vehicle_controls(
                    geo, veh, table_s, table_lat
                )

            # IDM/MOBIL NPC decisions (sees the ego's fresh targets, matching
            # the reference's act() list order with the ego first)
            veh, idm_steer, idm_acc = behavior.idm_act(
                geo, self.idm_params, veh, table_s, table_lat,
                connected=connected,
            )

        is_ego = veh.kind == KIND_EGO
        is_idm = (
            (veh.kind == KIND_IDM) | (veh.kind == KIND_LINEAR)
        ) & ~veh.crashed
        if raw_controls:
            # ContinuousAction egos keep their stored commands (action.py:160)
            veh = veh.replace(
                steering=jnp.where(is_idm, idm_steer, veh.steering),
                accel=jnp.where(is_idm, idm_acc, veh.accel),
            )
        else:
            veh = veh.replace(
                steering=jnp.where(
                    is_ego, ego_steer, jnp.where(is_idm, idm_steer, veh.steering)
                ),
                accel=jnp.where(
                    is_ego, ego_acc, jnp.where(is_idm, idm_acc, veh.accel)
                ),
            )

        # RegulatedRoad: enforcement runs every 1/dt/REGULATION_FREQUENCY
        # frames, *before* integration (road/regulation.py:36-40).  The tick
        # schedule is handled by _simulate_regulated_frames so the expensive
        # conflict pass is only *computed* on (at most) the tick slots, not
        # on all 15 frames; ``enforce`` is True / a traced bool on tick
        # slots and None on plain frames.
        if self.regulated and enforce is not None:
            from highwayenv_tpu.road import regulation

            enforced = regulation.enforce_road_rules(geo, veh)
            if enforce is True:
                veh = enforced
            else:
                # enforcement writes exactly these three fields
                # (regulation.py:218-222); select only them
                def sel(new, old):
                    e = jnp.reshape(
                        enforce, enforce.shape + (1,) * (new.ndim - enforce.ndim)
                    )
                    return jnp.where(e, new, old)

                veh = veh.replace(
                    target_speed=sel(enforced.target_speed, veh.target_speed),
                    yield_timer=sel(enforced.yield_timer, veh.yield_timer),
                    is_yielding=sel(enforced.is_yielding, veh.is_yielding),
                )

        pre_integration = veh
        veh = kinematics.integrate(veh, self.dt)

        # dynamical egos use the BicycleVehicle tire-slip RK4 integrator
        # instead (dynamics.py:142-151; no impact handling, as in the
        # reference override)
        if getattr(self.action_type, "dynamical", False):
            from highwayenv_tpu.vehicle import dynamics

            dyn_mask = pre_integration.kind == KIND_EGO
            dyn = dynamics.integrate_dynamic(pre_integration, self.dt, dyn_mask)
            veh = veh.replace(
                pos=jnp.where(dyn_mask[..., None], dyn.pos, veh.pos),
                heading=jnp.where(dyn_mask, dyn.heading, veh.heading),
                speed=jnp.where(dyn_mask, dyn.speed, veh.speed),
                lateral_speed=jnp.where(
                    dyn_mask, dyn.lateral_speed, veh.lateral_speed
                ),
                yaw_rate=jnp.where(dyn_mask, dyn.yaw_rate, veh.yaw_rate),
            )

        # fresh projection table for the moved scene; re-localize lanes from
        # it (on_state_update, kinematics.py:170-175)
        new_s, new_lat = lane_ops.projection_table(geo, veh.pos)
        new_lane = lane_ops.closest_lane_from_table(geo, new_s, new_lat, veh.heading)
        veh = veh.replace(lane=jnp.where(veh.is_vehicle, new_lane, veh.lane))

        veh = collision.handle_collisions(veh, self.dt)
        return veh, (new_s, new_lat)

    def _simulate(self, state: EnvState, slot_actions) -> EnvState:
        if self._straight is not None:
            from highwayenv_tpu.ops.straight_fast import straight_frame

            def sbody(veh, i):
                return (
                    straight_frame(
                        self, self._straight, veh, slot_actions, i == 0
                    ),
                    None,
                )

            veh, _ = jax.lax.scan(
                sbody, state.vehicles, jnp.arange(self.frames_per_step)
            )
            return state.replace(
                vehicles=veh, steps=state.steps + self.frames_per_step
            )

        if self.regulated:
            veh = self._simulate_regulated_frames(
                state.vehicles, slot_actions, state.steps, self.frames_per_step
            )
            return state.replace(
                vehicles=veh, steps=state.steps + self.frames_per_step
            )

        tables0 = lane_ops.projection_table(self.geo, state.vehicles.pos)

        def body(carry, i):
            veh, tables = carry
            return (
                self._frame(veh, tables, slot_actions, i == 0),
                None,
            )

        (veh, _tables), _ = jax.lax.scan(
            body,
            (state.vehicles, tables0),
            jnp.arange(self.frames_per_step),
            unroll=self._scan_unroll,
        )
        return state.replace(
            vehicles=veh, steps=state.steps + self.frames_per_step
        )

    # ------------------------------------------------------------------ #
    # RegulatedRoad frame scheduling
    # ------------------------------------------------------------------ #
    @property
    def _regulation_period(self) -> int:
        """Frames between enforcement ticks: int(1/dt/REGULATION_FREQUENCY)
        (road/regulation.py:36-40)."""
        from highwayenv_tpu.road import regulation

        return int(
            self.config["simulation_frequency"] // regulation.REGULATION_FREQUENCY
        )

    def _simulate_regulated_frames(self, veh, slot_actions, steps0, frames):
        """Run ``frames`` regulated frames starting at frame counter
        ``steps0``, enforcing right-of-way on the reference's every-``period``
        tick schedule ((steps+1) % period == 0).

        The conflict pass (regulation.py:42-71) is ~2.5x the cost of a plain
        frame, so instead of computing it every frame and masking (round-1
        design: 15 evaluations per policy step), the loop is restructured
        around the tick positions: the first tick of the step falls at frame
        i0 = period-1 - steps0 % period (traced), subsequent ticks every
        ``period`` frames.  Frames are executed by a static slot schedule —
        masked prologue (frames < i0), unconditional tick + mid chunk,
        masked tails — so enforcement is computed at most
        ceil(frames/period) times with identical per-frame semantics.
        """
        period = self._regulation_period
        if isinstance(steps0, int):
            return self._run_frames_static(veh, slot_actions, frames, steps0)
        F = frames
        i0 = (period - 1) - (steps0 % period)  # first tick frame, in [0, period)
        carry = (veh, lane_ops.projection_table(self.geo, veh.pos))

        def tree_sel(active, new, old):
            def s(n, o):
                a = jnp.reshape(
                    active, active.shape + (1,) * (n.ndim - active.ndim)
                )
                return jnp.where(a, n, o)

            return jax.tree.map(s, new, old)

        def masked_plain(c, fidx, active):
            out = self._frame(c[0], c[1], slot_actions, fidx == 0)
            return tree_sel(active, out, c)

        # prologue: frames 0..i0-1
        if period > 1:

            def pro(c, j):
                return masked_plain(c, j, j < i0), None

            carry, _ = jax.lax.scan(pro, carry, jnp.arange(period - 1))

        max_ticks = -(-F // period)
        for e in range(max_ticks):
            if e * period >= F:
                break  # this tick (and everything after) can never fire
            t_e = i0 + e * period
            tick_always = (e + 1) * period - 1 < F  # t_e < F for every i0
            out = self._frame(
                carry[0], carry[1], slot_actions, t_e == 0, enforce=True
            )
            carry = out if tick_always else tree_sel(t_e < F, out, carry)

            if e * period + 1 >= F:
                continue  # chunk after this tick can never fire
            chunk_always = (e + 1) * period + period - 2 < F

            def chunk(c, j, t_e=t_e, chunk_always=chunk_always):
                if chunk_always:
                    return self._frame(c[0], c[1], slot_actions, False), None
                return masked_plain(c, t_e + j, t_e + j < F), None

            carry, _ = jax.lax.scan(chunk, carry, jnp.arange(1, period))
        return carry[0]

    def _run_frames_static(self, veh, slot_actions, frames, steps0=0):
        """Regulated frame loop with a *static* start phase (used by the
        intersection warm-up reset, intersection_env.py:270-277): tick
        positions are compile-time constants, so no masking at all."""
        period = self._regulation_period
        carry = (veh, lane_ops.projection_table(self.geo, veh.pos))

        def plain(c, _):
            return self._frame(c[0], c[1], slot_actions, False), None

        i0 = (period - 1) - (steps0 % period)
        pro = min(i0, frames)
        if pro:
            carry, _ = jax.lax.scan(plain, carry, None, length=pro)
        rem = frames - pro
        n_periods, leftover = divmod(rem, period)

        if n_periods:

            def one_period(c, _):
                out = self._frame(
                    c[0], c[1], slot_actions, False, enforce=True
                )
                out, _ = jax.lax.scan(plain, out, None, length=period - 1)
                return out, None

            carry, _ = jax.lax.scan(one_period, carry, None, length=n_periods)
        if leftover:
            carry = self._frame(
                carry[0], carry[1], slot_actions, False, enforce=True
            )
            if leftover > 1:
                carry, _ = jax.lax.scan(
                    plain, carry, None, length=leftover - 1
                )
        return carry[0]

    # ------------------------------------------------------------------ #
    # public pure API
    # ------------------------------------------------------------------ #
    def _observe(self, state: EnvState):
        if getattr(self.observation_type, "stateful_stack", False):
            # grayscale frame stack is maintained in state by _push_frame
            return state.obs_stack
        if getattr(self.observation_type, "host_side", False):
            # host-rendered observations are filled in by the Gymnasium
            # adapter; the jitted path carries a placeholder
            return jnp.zeros(self.observation_type.shape, jnp.uint8)
        multi = getattr(self.observation_type, "multi_agent", False)
        kw = {}
        if getattr(self.observation_type, "needs_key", False):
            kw["key"] = jax.random.fold_in(state.key, state.steps)
        if len(self.ego_slots) == 1 and not multi:
            return self.observation_type.observe(
                self.geo, state.vehicles, self.ego_slots[0], **kw
            )
        return tuple(
            self.observation_type.observe(self.geo, state.vehicles, slot, **kw)
            for slot in self.ego_slots
        )

    # NPC class presets: ACCELERATION_PARAMETERS + MOBIL gain
    # (vehicle/behavior.py:353, 563-583)
    _NPC_PRESETS = {
        "LinearVehicle": ([0.3, 0.3, 2.0], 0.2),
        "AggressiveVehicle": (
            [0.8 / (0.25 * 30), 0.8 / (0.75 * 30), 0.5], 1.0
        ),
        "DefensiveVehicle": (
            [1.2 / (0.25 * 30), 1.2 / (0.75 * 30), 2.0], 1.0
        ),
    }

    def _apply_npc_type(self, veh: VehicleState) -> VehicleState:
        """Dispatch config["other_vehicles_type"] (abstract.py:114,
        class_from_path utils.py:40-43): scenario resets spawn NPCs as IDM;
        a Linear-family type flips their kind enum and installs the class
        parameters."""
        path = self.config.get("other_vehicles_type", "")
        name = path.rsplit(".", 1)[-1]
        if name not in self._NPC_PRESETS:
            return veh
        accel_params, gain = self._NPC_PRESETS[name]
        is_npc = veh.kind == KIND_IDM
        return veh.replace(
            kind=jnp.where(is_npc, KIND_LINEAR, veh.kind),
            accel_params=jnp.where(
                is_npc[..., None],
                jnp.asarray(accel_params, jnp.float32),
                veh.accel_params,
            ),
            mobil_gain=jnp.where(is_npc, gain, veh.mobil_gain),
        )

    def _push_frame(self, state: EnvState) -> EnvState:
        """Roll the grayscale frame stack with the current scene."""
        ot = self.observation_type
        if not getattr(ot, "stateful_stack", False):
            return state
        stack = (
            state.obs_stack if state.obs_stack is not None else ot.init_stack()
        )
        return state.replace(
            obs_stack=ot.push(self.geo, state.vehicles, self.ego_slots[0], stack)
        )

    def _reset(self, key):
        kv, ks = jax.random.split(key)
        veh = self._apply_npc_type(self._reset_vehicles(kv))
        state = EnvState(
            vehicles=veh,
            time=jnp.zeros((), jnp.float32),
            steps=jnp.full((), self._initial_steps, jnp.int32),
            key=ks,
        )
        state = self._push_frame(state)
        return self._observe(state), state

    def reset_seeded(self, seed: int | None = None, rng=None):
        """Host-replayed reset with the reference's NumPy draw schedule
        (bit-identical seeded scenes; see highwayenv_tpu/seeding.py).

        Pass either a ``seed`` or an existing ``np.random.Generator`` whose
        state continues across resets (the Gymnasium contract)."""
        from highwayenv_tpu import seeding

        rng = rng if rng is not None else seeding.np_random(seed)
        return seeding.seeded_reset(self, rng)

    def _step(self, state: EnvState, action):
        slot_actions = self._action_to_slots(action)
        state = state.replace(
            time=state.time + 1.0 / self.config["policy_frequency"]
        )
        state = self._simulate(state, slot_actions)
        obs, state, reward, terminated, truncated, info = self._finish_step(
            state, action
        )
        # population hook AFTER the head: its effects reach only the NEXT
        # step's observation (e.g. intersection's post-step spawn,
        # intersection_env.py:136-140)
        state = self._post_step_population(state)
        return obs, state, reward, terminated, truncated, info

    def _post_step_population(self, state: EnvState) -> EnvState:
        """Per-step population update (spawns/clears), applied after the
        observation/reward head so it affects only the NEXT step.  Identity
        in the base env; envs overriding it (instead of ``_step``) keep the
        batched sim kernels of ``_simulate_batched`` eligible."""
        return state

    def _finish_step(self, state: EnvState, action):
        """Observation/reward/termination for an already-simulated state."""
        state = self._push_frame(state)
        obs = self._observe(state)
        reward = self._reward(state, action)
        terminated = self._is_terminated(state)
        truncated = self._is_truncated(state)
        # registration-level TimeLimit (e.g. two-way max_episode_steps=15)
        mes = self.config.get("max_episode_steps")
        if mes:
            policy_steps = state.steps // self.frames_per_step
            truncated = truncated | (policy_steps >= mes)
        info = self._info(state, action)
        return obs, state, reward, terminated, truncated, info

    def close_objects_to(
        self,
        state: EnvState,
        slot: int,
        distance: float,
        count: int | None = None,
        see_behind: bool = True,
        sort: bool = True,
        vehicles_only: bool = False,
    ):
        """Perception query (road/road.py:421-450): slots within ``distance``
        of ``slot``, ordered by |lane distance| projected on its lane.

        Jittable; returns (indices (count,), valid (count,)) with static
        ``count`` (default: all other slots).  With ``sort=False`` results
        keep slot order (the reference keeps vehicles-then-obstacles list
        order, which the slot layout already guarantees).
        """
        veh = state.vehicles
        V = veh.num_slots
        s_all, _ = lane_ops.local_coordinates(
            self.geo, veh.lane[..., slot][..., None], veh.pos
        )
        lane_dist = s_all - s_all[..., slot][..., None]
        dist = jnp.linalg.norm(
            veh.pos - veh.pos[..., slot, :][..., None, :], axis=-1
        )
        idx = jnp.arange(V)
        not_self = idx != slot
        behind_ok = lane_dist > -2 * 5.0  # -2 * LENGTH (road.py:435,441)
        veh_ok = (
            veh.is_vehicle
            & not_self
            & (dist < distance)
            & (see_behind | behind_ok)
        )
        obj_ok = (
            veh.active
            & ~veh.is_vehicle
            & not_self
            & (dist < distance)
            & behind_ok
            & (not vehicles_only)
        )
        ok = veh_ok | obj_ok
        key = jnp.where(
            ok,
            jnp.abs(lane_dist) if sort else idx.astype(jnp.float32),
            jnp.inf,
        )
        order = jnp.argsort(key, axis=-1, stable=True)
        n = count if count is not None else V - 1
        sel = order[..., :n]
        sel_ok = jnp.take_along_axis(ok, sel, axis=-1)
        return sel, sel_ok

    # ------------------------------------------------------------------ #
    # planner export (abstract.py:452-453)
    # ------------------------------------------------------------------ #
    def to_finite_mdp(self, state: EnvState, horizon: float = 10.0):
        """TTC-grid finite-MDP export (envs/common/finite_mdp.py:17-103).

        The grid's lane axis is sized like the reference's — to the ego's
        CURRENT edge (finite_mdp.py:120 ``all_side_lanes``) — whenever the
        state is concrete (the normal planner-export call, like the
        reference's host-side use).  Under jit the lane count must be
        static, so a traced state falls back to the widest edge
        (PARITY #13; identical on single-width networks, which covers
        every registered env that exports a finite MDP on its hot path).
        """
        from highwayenv_tpu.ops.finite_mdp import finite_mdp
        from highwayenv_tpu.road import lane as lane_ops

        if not hasattr(self, "connected3"):
            self.connected3 = self.net.connectivity_matrix(depth=3)
        try:
            ego_lane = int(state.vehicles.lane[..., self.ego_slots[0]])
            grid_lanes = int(
                self.geo.edge_n[
                    int(lane_ops._gather(self.geo, jnp.int32(ego_lane)))
                ]
            )
        except (TypeError, jax.errors.TracerArrayConversionError,
                jax.errors.ConcretizationTypeError):
            grid_lanes = getattr(self, "ttc_grid_lanes", self.max_edge_lanes)
        return finite_mdp(
            self, state, 1.0 / self.config["policy_frequency"], horizon,
            grid_lanes=grid_lanes,
        )

    # ------------------------------------------------------------------ #
    # batched + auto-reset conveniences
    # ------------------------------------------------------------------ #
    def _reset_batched(self, keys):
        """Batched reset over a leading key axis.  Default is plain
        ``vmap(_reset)``; envs with an expensive in-reset simulation stage
        override it to route that stage through the batched kernels
        (intersection's 45-frame warm-up: 35 -> ~3 ms per 128-env reset
        batch on TPU)."""
        return jax.vmap(self._reset)(keys)

    def reset_batch(self, keys):
        return self._reset_batched(keys)

    def step_autoreset(self, state: EnvState, action):
        """Single-env step that re-initializes on episode end (the Gymnasium
        vector autoreset contract: terminal obs replaced by the reset obs).

        When ``_step`` is not overridden, the observation is computed ONCE on
        the post-select state instead of twice (step obs + reset obs then
        select) — observationally identical, and the observation head is a
        large share of the non-sim cost at scale."""
        if type(self)._step is not BaseEnv._step:
            return self._autoreset(*self._step(state, action))

        slot_actions = self._action_to_slots(action)
        state = state.replace(
            time=state.time + 1.0 / self.config["policy_frequency"]
        )
        state = self._simulate(state, slot_actions)
        return self._finish_autoreset(state, action)

    def _finish_head(self, state: EnvState, action):
        """Reward/termination/info head on an already-simulated state
        (single-env semantics; vmap outside).  Shared by the full and
        compact autoreset finishers."""
        state = self._push_frame(state)
        reward = self._reward(state, action)
        terminated = self._is_terminated(state)
        truncated = self._is_truncated(state)
        mes = self.config.get("max_episode_steps")
        if mes:
            truncated = truncated | (
                state.steps // self.frames_per_step >= mes
            )
        info = self._info(state, action)
        return state, reward, terminated, truncated, info

    def _finish_autoreset(self, state: EnvState, action):
        """Reward/termination + in-place reset select + single observe, for
        an already-simulated state (single-env semantics; vmap outside)."""
        state, reward, terminated, truncated, info = self._finish_head(
            state, action
        )
        done = terminated | truncated
        has_hook = (
            type(self)._post_step_population
            is not BaseEnv._post_step_population
        )
        if has_hook:
            # the hook's effects must not reach THIS step's observation
            # (reference order: obs first, then the population update),
            # so observe pre-hook and patch done rows with the reset obs.
            # The reset key splits the POST-hook key — the hook consumes a
            # split of the step key itself (matching the former
            # _step-override order, which ran the hook before autoreset)
            obs = self._observe(state)
            state = self._post_step_population(state)
            k_reset, k_next = jax.random.split(state.key)
            reset_obs, reset_state = self._reset(k_reset)
        else:
            k_reset, k_next = jax.random.split(state.key)
            _reset_obs, reset_state = self._reset(k_reset)  # obs DCE'd
        reset_state = reset_state.replace(key=k_next)

        def where_done(x, y):
            d = jnp.reshape(done, done.shape + (1,) * (x.ndim - done.ndim))
            return jnp.where(d, x, y)

        state = jax.tree.map(where_done, reset_state, state)
        if has_hook:
            obs = jax.tree.map(where_done, reset_obs, obs)
        else:
            obs = self._observe(state)
        return obs, state, reward, terminated, truncated, info

    def _autoreset(self, obs, new_state, reward, terminated, truncated, info):
        done = terminated | truncated
        k_reset, k_next = jax.random.split(new_state.key)
        reset_obs, reset_state = self._reset(k_reset)
        reset_state = reset_state.replace(key=k_next)
        def where_done(x, y):
            d = jnp.reshape(done, done.shape + (1,) * (x.ndim - done.ndim))
            return jnp.where(d, x, y)

        state = jax.tree.map(where_done, reset_state, new_state)
        obs = jax.tree.map(where_done, reset_obs, obs)
        return obs, state, reward, terminated, truncated, info

    def _compact_autoreset(self, states, done, reset_slots: int, obs=None):
        """Replace done rows with fresh per-row resets computed
        ``reset_slots`` rows at a time instead of all B rows every step.

        The plain in-step autoreset evaluates a full ``_reset`` for EVERY
        env every step (XLA computes both select branches), which dominates
        the step on warm-up-heavy envs (intersection's 45-frame warm-up:
        ~13.5 ms of the ~39 ms step at B=1024).  This version gathers the
        done rows' per-row reset keys into a (P,) slot buffer, runs
        ``vmap(_reset)`` at batch P, and scatters the fresh rows back.

        Exactness: each done row's scene is ``_reset(k_reset_row)`` with
        the SAME per-row key split the full path uses, and a row's reset
        program is row-local (no cross-batch reductions), so evaluating it
        in a (P, ...) batch produces the same bits as in a (B, ...) batch.
        Row-level reset determinism holds (unlike ``fresh_pool``), verified
        bitwise in tests/envs/test_compact_autoreset.py.  Overflow-safe:
        one unconditional pass plus ceil(B/P)-1 ``lax.cond``-guarded extra
        passes cover every possible done count.  (Round 4: this was a
        ``lax.while_loop``, which is semantically identical — but a
        while_loop nested inside ``lax.scan`` hard-crashes the TPU runtime
        ("TPU worker process crashed: kernel fault", reproduced minimally
        with pure-XLA gather/scatter bodies); the cond chain compiles and
        runs, and skipped passes cost nothing at run time.)

        When ``obs`` is given (envs that compute obs inside ``_step``),
        done rows' observations are replaced by the reset obs, matching
        ``_autoreset``.  Designed for single-chip batched rollouts; under a
        multi-device pjit the gather/scatter crosses shards and GSPMD may
        insert collectives — shard_map a per-device batch instead.
        """
        B = done.shape[0]
        P = min(int(reset_slots), B)
        keys2 = jax.vmap(jax.random.split)(states.key)  # (B, 2, key)
        k_reset, k_next = keys2[:, 0], keys2[:, 1]
        carry_obs = obs is not None

        def body(carry):
            st, ob, mask = carry
            n = jnp.sum(mask)
            idx = jnp.flatnonzero(mask, size=P, fill_value=0)
            valid = jnp.arange(P) < n

            r_obs, rst = self._reset_batched(k_reset[idx])
            rst = rst.replace(key=k_next[idx])

            def scatter(x, r):
                v = jnp.reshape(valid, valid.shape + (1,) * (r.ndim - 1))
                return x.at[idx].set(jnp.where(v, r, x[idx]))

            st = jax.tree.map(scatter, st, rst)
            if carry_obs:
                ob = jax.tree.map(scatter, ob, r_obs)
            mask = mask.at[idx].set(jnp.where(valid, False, mask[idx]))
            return st, ob, mask

        carry = (states, obs if carry_obs else jnp.zeros(()), done)
        for _ in range(-(-B // P)):  # passes beyond the first usually skip
            carry = jax.lax.cond(
                jnp.any(carry[2]), body, lambda c: c, carry
            )
        states, obs, _ = carry
        return (states, obs) if carry_obs else states

    def step_autoreset_batched(
        self, states: EnvState, actions, reset_slots: int | None = None
    ):
        """Batched autoreset step over a leading env axis.

        Semantically ``jax.vmap(self.step_autoreset)`` — and that is the
        fallback — but the simulation frames run through the batched
        kernels of ``_simulate_batched`` where eligible (pallas megakernels
        / batch-minor XLA).  Observation, reward and autoreset stay vmapped
        (they are batch-major friendly: per-ego rows, no pair matrices).

        ``reset_slots=P`` switches the reset branch to the compact
        gather/scatter evaluation (see ``_compact_autoreset``): bitwise the
        same results, ~B/P less reset compute per step.
        """
        if reset_slots is None:
            sim = self._simulate_batched(states, actions)
            if sim is None:
                return jax.vmap(self.step_autoreset)(states, actions)
            return jax.vmap(self._finish_autoreset)(sim, actions)

        if type(self)._step is not BaseEnv._step:
            obs, st, reward, term, trunc, info = jax.vmap(self._step)(
                states, actions
            )
            st, obs = self._compact_autoreset(
                st, term | trunc, reset_slots, obs=obs
            )
            return obs, st, reward, term, trunc, info

        sim = self._simulate_batched(states, actions)
        if sim is None:
            slot_actions = jax.vmap(self._action_to_slots)(actions)
            st = states.replace(
                time=states.time + 1.0 / self.config["policy_frequency"]
            )
            sim = jax.vmap(self._simulate)(st, slot_actions)
        st, reward, term, trunc, info = jax.vmap(self._finish_head)(
            sim, actions
        )
        if (
            type(self)._post_step_population
            is not BaseEnv._post_step_population
        ):
            # reference order: obs BEFORE the population update; done rows'
            # obs patched by the compact reset
            obs = jax.vmap(self._observe)(st)
            st = jax.vmap(self._post_step_population)(st)
            st, obs = self._compact_autoreset(
                st, term | trunc, reset_slots, obs=obs
            )
        else:
            st = self._compact_autoreset(st, term | trunc, reset_slots)
            obs = jax.vmap(self._observe)(st)
        return obs, st, reward, term, trunc, info

    def step_batched(self, states: EnvState, actions):
        """Batched step WITHOUT autoreset: ``jax.vmap(self._step)`` with the
        sim frames routed through the batched kernels where eligible.

        This is the building block for rollout drivers that handle episode
        ends themselves (e.g. ``sharded_rollout_fn(fresh_pool=...)``, which
        assigns pre-computed fresh scenes to done envs) — calling
        ``jax.vmap(self._step)`` directly would silently drop the pallas
        fast paths (measured 4.7x slower on highway-v0 @ B=4096)."""
        sim = self._simulate_batched(states, actions)
        if sim is None:
            return jax.vmap(self._step)(states, actions)
        obs, st, reward, term, trunc, info = jax.vmap(self._finish_step)(
            sim, actions
        )
        st = jax.vmap(self._post_step_population)(st)
        return obs, st, reward, term, trunc, info

    def _simulate_batched(self, states: EnvState, actions):
        """Run one policy step's simulation frames over a leading env axis,
        or return None when only the generic vmapped path applies.

        On straight fast-path networks the frames run batch-minor: state is
        transposed to (V, ..., B) so the batch rides the 128-wide TPU lane
        dimension and the (V, V, B) pair matrices of the IDM/MOBIL kernels
        waste no vector lanes (batch-major pads V=51 -> 128 on the minor
        axis instead, ~2.5x); above the pallas gate the whole policy step is
        one VMEM-resident megakernel.

        Envs that override ``_step`` (intersection's post-step spawning,
        lane-keeping's LPV tracking) return None — the batched pipeline
        reimplements only the base step.  General-path (non-straight) envs
        below the general-kernel gate also return None: measured on TPU,
        batch-minor was neutral-to-negative there (the lane-table
        projections, not the pair matrices, dominate; see BASELINE.md).
        """
        B = states.time.shape[0]
        general = (
            type(self)._step is BaseEnv._step
            and self._straight is None
            and self._use_pallas_general(B)
        )
        if type(self)._step is not BaseEnv._step or (
            self._straight is None and not general
        ):
            return None
        slot_actions = jax.vmap(self._action_to_slots)(actions)
        states = states.replace(
            time=states.time + 1.0 / self.config["policy_frequency"]
        )

        if general:
            # general-path megakernel: all frames of one policy step in one
            # VMEM-resident pallas_call (ops/general_pallas_bm.py).  For
            # regulated envs the right-of-way pass runs INSIDE the kernel,
            # masked to each env's tick phase (steps0 carries the per-env
            # frame counter at step start).
            from highwayenv_tpu.ops.general_pallas_bm import (
                pallas_simulate_general,
            )

            veh = pallas_simulate_general(
                self, states.vehicles, slot_actions, self.frames_per_step,
                steps0=states.steps if self.regulated else None,
            )
            return states.replace(
                vehicles=veh, steps=states.steps + self.frames_per_step
            )

        if self._use_pallas(B):
            # batch-minor pallas frame kernel: whole frame VMEM-resident
            # per 128-env block (ops/straight_pallas_bm.py).  DEFAULT for
            # lean scenes is the s-sorted banded collision variant
            # (round 4): bitwise-equal to the dense pass and +57% at the
            # headline (164.1k vs 104.5k env-steps/s, B=4096, 2026-08-20)
            # once the sort moved into pallas permute kernels and the
            # never-taken dense fallback moved to an XLA-level cond (the
            # in-kernel fallback branch alone cost ~-45% through mosaic's
            # branch-union VMEM allocation).  HT_NO_SORTED=1 forces the
            # dense pair kernel.
            import os as _os

            from highwayenv_tpu.ops.straight_pallas_bm import (
                pallas_simulate_bm,
                pallas_simulate_bm_sorted,
            )

            lean = bool(getattr(self, "pallas_lean", True))
            sim = (
                pallas_simulate_bm_sorted
                if lean and not _os.environ.get("HT_NO_SORTED")
                else pallas_simulate_bm
            )
            veh = sim(
                self, states.vehicles, slot_actions, self.frames_per_step
            )
            return states.replace(
                vehicles=veh, steps=states.steps + self.frames_per_step
            )

        def t(x):
            return jnp.moveaxis(x, 0, -1)

        def ut(x):
            return jnp.moveaxis(x, -1, 0)

        veh_t = jax.tree.map(t, states.vehicles)
        sa_t = jax.tree.map(t, slot_actions)

        from highwayenv_tpu.ops.straight_fast import straight_frame

        frame = jax.vmap(
            lambda v, sa, first: straight_frame(
                self, self._straight, v, sa, first
            ),
            in_axes=(-1, -1, None),
            out_axes=-1,
        )

        def sbody(veh, i):
            return frame(veh, sa_t, i == 0), None

        veh_t, _ = jax.lax.scan(
            sbody, veh_t, jnp.arange(self.frames_per_step)
        )

        return states.replace(
            vehicles=jax.tree.map(ut, veh_t),
            steps=states.steps + self.frames_per_step,
        )
