"""Kinematics observation as pure array ops.

Replaces the pandas-DataFrame hot path of the reference
(envs/common/observation.py:155-276 + road/road.py:421-450): the
perception query (``close_objects_to``), the relative-feature build
(``Vehicle.to_dict``, vehicle/kinematics.py:237-261), lmap normalization,
clipping, distance sort, and zero padding all become one masked gather +
top-k over the padded object axis.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from highwayenv_tpu.road import lane as lane_ops
from highwayenv_tpu.road.lane import DEFAULT_WIDTH, LaneGeometry
from highwayenv_tpu.utils.math import lmap
from highwayenv_tpu.vehicle.state import MAX_SPEED, VehicleState

DEFAULT_FEATURES = ("presence", "x", "y", "vx", "vy")
PERCEPTION_DISTANCE = 5.0 * MAX_SPEED  # envs/common/abstract.py:56


class KinematicsObservation:
    """Config-compatible with the reference KinematicObservation."""

    def __init__(
        self,
        features=None,
        vehicles_count: int = 5,
        features_range: dict | None = None,
        absolute: bool = False,
        order: str = "sorted",
        normalize: bool = True,
        clip: bool = True,
        see_behind: bool = False,
        observe_intentions: bool = False,
        include_obstacles: bool = True,
        reset_edge_lanes: int | None = None,
        **kwargs,
    ):
        self.features = tuple(features) if features else DEFAULT_FEATURES
        self.vehicles_count = vehicles_count
        self.features_range = features_range
        self.absolute = absolute
        self.order = order
        self.normalize = normalize
        self.clip = clip
        self.see_behind = see_behind
        self.observe_intentions = observe_intentions
        self.include_obstacles = include_obstacles
        #: lane count of the ego's (deterministic) reset edge.  The
        #: reference computes features_range ONCE per reset from the ego's
        #: edge at first observe (observation.py:214-226; the observation
        #: object is recreated by define_spaces on every reset) and keeps
        #: it frozen for the episode — so on merge (2-lane spawn edge,
        #: 3-lane merge section) and exit (6 -> 7) the ranges must NOT
        #: track the ego's current edge.  Envs whose ego spawn edge is
        #: deterministic pass its lane count here (env.obs_edge_lanes);
        #: None falls back to the per-step recompute.
        self.reset_edge_lanes = reset_edge_lanes

    @property
    def shape(self):
        return (self.vehicles_count, len(self.features))

    def space(self):
        from gymnasium import spaces

        return spaces.Box(shape=self.shape, low=-np.inf, high=np.inf, dtype=np.float32)

    def _feature_table(self, geo: LaneGeometry, state: VehicleState):
        """All per-object features (V, F) before relative/normalize steps."""
        cols = {}
        vel = state.velocity
        is_vehicle = state.is_vehicle
        # RoadObject.to_dict reports vx=vy=0 for static objects (objects.py:141-159)
        vx = jnp.where(is_vehicle, vel[..., 0], 0.0)
        vy = jnp.where(is_vehicle, vel[..., 1], 0.0)
        cols["presence"] = jnp.ones_like(state.speed)
        cols["x"] = state.pos[..., 0]
        cols["y"] = state.pos[..., 1]
        cols["vx"] = vx
        cols["vy"] = vy
        if any(
            f in self.features
            for f in ("heading", "cos_h", "sin_h", "long_off", "lat_off", "ang_off")
        ):
            cols["heading"] = state.heading
            cols["cos_h"] = jnp.cos(state.heading)
            cols["sin_h"] = jnp.sin(state.heading)
            s, lat = lane_ops.local_coordinates(geo, state.lane, state.pos)
            cols["long_off"] = s
            cols["lat_off"] = lat
            cols["ang_off"] = lane_ops.local_angle(geo, state.lane, state.heading, s)
        if "cos_d" in self.features or "sin_d" in self.features:
            # destination direction = unit vector to the end of the last
            # route segment (kinematics.py:205-226); zero without a route
            R = state.route_base.shape[-1]
            last = jnp.clip(state.route_len - 1, 0, R - 1)[..., None]
            base = jnp.take_along_axis(state.route_base, last, axis=-1)[..., 0]
            rid = jnp.take_along_axis(state.route_id, last, axis=-1)[..., 0]
            lane = jnp.clip(base + jnp.maximum(rid, 0), 0, geo.num_lanes - 1)
            dest = lane_ops.position(
                geo, lane, geo.length[lane], jnp.zeros_like(state.speed)
            )
            delta = dest - state.pos
            norm = jnp.linalg.norm(delta, axis=-1)
            ok = (state.route_len > 0) & (norm > 0) & bool(
                self.observe_intentions
            )
            d = jnp.where(
                (ok & (norm > 0))[..., None],
                delta / jnp.where(norm[..., None] == 0, 1.0, norm[..., None]),
                0.0,
            )
            cols["cos_d"] = d[..., 0]
            cols["sin_d"] = d[..., 1]
        return cols

    @property
    def needs_key(self) -> bool:
        return self.order == "shuffled"

    def observe(
        self, geo: LaneGeometry, state: VehicleState, ego: int, key=None
    ) -> jnp.ndarray:
        """Observation for controlled slot ``ego``. Returns (N, F) float32."""
        V = state.num_slots
        ego_pos = state.pos[..., ego, :]
        ego_lane = state.lane[..., ego]

        # lane-projected signed gaps on the ego's current lane
        s_all, _ = lane_ops.local_coordinates(
            geo, ego_lane[..., None], state.pos
        )
        s_ego = s_all[..., ego]
        lane_dist = s_all - s_ego[..., None]

        dist = jnp.linalg.norm(state.pos - ego_pos[..., None, :], axis=-1)
        idx = jnp.arange(V)
        not_self = idx != ego
        is_vehicle = state.is_vehicle
        behind_ok = lane_dist > -2 * 5.0  # -2 * ego LENGTH (road.py:435,441)
        veh_ok = (
            is_vehicle
            & not_self
            & (dist < PERCEPTION_DISTANCE)
            & (self.see_behind | behind_ok)
        )
        obj_ok = (
            state.active
            & ~is_vehicle
            & (dist < PERCEPTION_DISTANCE)
            & behind_ok
            & bool(self.include_obstacles)
        )
        ok = veh_ok | obj_ok

        # stable sort by |lane_dist| (reference sorted(); road.py:446-449)
        sort_key = jnp.where(ok, jnp.abs(lane_dist), jnp.inf)
        count = self.vehicles_count - 1
        if 0 < count <= 8:
            # iterative masked argmin: k tiny reductions instead of a
            # V-wide bitonic sort.  Observationally identical: argmin
            # returns the FIRST minimum (= stable argsort's index
            # tie-break) so every finite-key (valid) row is picked in the
            # same order.  Once valid rows run out, argmin re-picks from
            # the masked/inf pool — validity must therefore come from the
            # key AT PICK TIME (finite = fresh valid row), NOT from
            # ok[sel], or a re-picked valid row would duplicate instead
            # of zeroing as padding.
            key_left = sort_key
            picks, valid = [], []
            for _ in range(min(count, V)):  # argsort path also caps at V
                j = jnp.argmin(key_left, axis=-1)
                picks.append(j)
                valid.append(
                    jnp.take_along_axis(key_left, j[..., None], axis=-1)[..., 0]
                    < jnp.inf
                )
                key_left = jnp.where(
                    jnp.arange(V) == j[..., None], jnp.inf, key_left
                )
            sel = jnp.stack(picks, axis=-1)
            sel_ok = jnp.stack(valid, axis=-1)
        else:
            sel = jnp.argsort(sort_key, axis=-1, stable=True)[..., :count]
            sel_ok = jnp.take_along_axis(ok, sel, axis=-1)

        cols = self._feature_table(geo, state)
        feats = jnp.stack([cols[f] for f in self.features], axis=-1)  # (V,F)
        ego_row = feats[..., ego, :]
        rows = jnp.take_along_axis(
            feats, sel[..., None], axis=-2
        )  # (count, F)

        if not self.absolute:
            rel = jnp.array(
                [f in ("x", "y", "vx", "vy") for f in self.features]
            )
            rows = jnp.where(rel, rows - ego_row[..., None, :], rows)

        rows = jnp.where(sel_ok[..., None], rows, 0.0)
        # the displayed ego row may differ from the world-frame row used for
        # the relative subtraction above (ExitObservation overrides it)
        ego_display = self._ego_row(geo, state, ego, ego_row)
        obs = jnp.concatenate([ego_display[..., None, :], rows], axis=-2)

        if self.normalize:
            obs = self._normalize(geo, state, ego, obs)
        # zero out padding rows *after* normalization (reference pads with
        # zero rows post-normalization, observation.py:264-269)
        # explicit (..., 1) ones for the ego row: deriving it from
        # sel_ok[..., :1] collapses to zero rows when vehicles_count == 1
        row_ok = jnp.concatenate(
            [jnp.ones(sel_ok.shape[:-1] + (1,), bool), sel_ok], axis=-1
        )
        obs = jnp.where(row_ok[..., None], obs, 0.0)
        if self.order == "shuffled" and key is not None:
            # shuffle the non-ego rows (observation.py:270-271)
            import jax

            perm = jax.random.permutation(key, obs.shape[-2] - 1)
            obs = jnp.concatenate(
                [obs[..., :1, :], jnp.take(obs[..., 1:, :], perm, axis=-2)],
                axis=-2,
            )
        return obs.astype(jnp.float32)

    def _ego_row(self, geo, state, ego, ego_row):
        """Hook: the ego feature row as displayed (before normalization)."""
        return ego_row

    def _normalize(self, geo, state, ego, obs):
        """observation.py:207-232."""
        if self.features_range is None:
            if self.reset_edge_lanes is not None:
                # reference semantics: ranges frozen at reset (see __init__)
                n_lanes = jnp.float32(self.reset_edge_lanes)
            else:
                n_lanes = geo.edge_n[lane_ops._gather(geo, state.lane[..., ego])]
            side = DEFAULT_WIDTH * n_lanes
            ranges = {
                "x": (-5.0 * MAX_SPEED, 5.0 * MAX_SPEED),
                "y": (-side, side),
                "vx": (-2 * MAX_SPEED, 2 * MAX_SPEED),
                "vy": (-2 * MAX_SPEED, 2 * MAX_SPEED),
            }
        else:
            ranges = {k: (v[0], v[1]) for k, v in self.features_range.items()}
        out = []
        for fi, f in enumerate(self.features):
            col = obs[..., fi]
            if f in ranges:
                lo, hi = ranges[f]
                col = lmap(col, (lo, hi), (-1.0, 1.0))
                if self.clip:
                    col = jnp.clip(col, -1.0, 1.0)
            out.append(col)
        return jnp.stack(out, axis=-1)
