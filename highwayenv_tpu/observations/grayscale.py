"""Grayscale frame-stack observation (envs/common/observation.py:50-112).

Unlike the reference (which grabs the pygame viewer's framebuffer), the frame
is rasterized INSIDE the jitted step: lane markings via the compiled lane
projection tables and vehicles as rotated-rectangle membership tests on the
pixel grid, then RGB->gray with the configured weights.  The DQN-style frame
stack lives in ``EnvState.obs_stack`` so the observation stays a pure
function of state.  Divergence from the byte-exact pygame backend is
bounded and asserted (<=1.5% of pixels off by >8 levels, PSNR >= 28 dB —
PARITY.md #12, tests/parity/test_grayscale_divergence.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from highwayenv_tpu.road import lane as lane_ops
from highwayenv_tpu.vehicle.state import (
    KIND_EGO,
    KIND_IDM,
    KIND_LANDMARK,
    KIND_OBSTACLE,
    KIND_PLAIN,
)

# vehicle/graphics.py + road/graphics.py colors -> gray levels via the DQN
# weights at __init__ (the same palette the byte-exact pygame backend uses)
_COLORS = {
    "grey": (100, 100, 100),
    "white": (255, 255, 255),
    "black": (60, 60, 60),
    "yellow": (200, 200, 0),
    "green": (50, 200, 0),
    "red": (255, 100, 100),
    "blue": (100, 200, 255),
}
STRIPE_SPACING = 4.33
STRIPE_LENGTH = 3.0


def _lighten(color):
    """VehicleGraphics.lighten (vehicle/graphics.py:253-258)."""
    return tuple(min(int(c / 0.68), 255) for c in color)


class GrayscaleObservation:
    host_side = False
    stateful_stack = True

    def __init__(
        self,
        env,
        observation_shape,
        stack_size: int,
        weights,
        scaling: float | None = None,
        centering_position=None,
        backend: str = "rasterizer",
        **kwargs,
    ):
        self.env = env
        self.observation_shape = tuple(observation_shape)
        self.stack_size = stack_size
        self.shape = (stack_size,) + self.observation_shape
        self.weights = np.asarray(weights, np.float64)
        self.scaling = float(scaling or env.config["scaling"])
        self.centering = list(
            centering_position or env.config["centering_position"]
        )
        w = self.weights
        self.gray = {k: float(np.dot(c, w)) for k, c in _COLORS.items()}
        # color-id tables for the entity layer: 0 yellow, 1 blue, 2 green,
        # 3 red (+4 = per-env ego_color override); paired lightened grays
        # for the headlight rects (vehicle/graphics.py:49-66)
        base = [_COLORS["yellow"], _COLORS["blue"], _COLORS["green"],
                _COLORS["red"]]
        override = getattr(env, "ego_color", None)
        base.append(tuple(override) if override is not None else base[0])
        self._cid_gray = np.array([np.dot(c, w) for c in base], np.float32)
        self._cid_gray_light = np.array(
            [np.dot(_lighten(c), w) for c in base], np.float32
        )
        self._has_ego_override = override is not None
        # MDPVehicle egos (green, no tires) vs plain/bicycle egos (yellow,
        # tires) — same action-family rule as the pygame backend
        name = type(env.action_type).__name__
        self._meta_ego = name in ("DiscreteMetaAction", "MultiAgentAction")
        # "pygame" backend: host-side pixel-exact frames via the reference's
        # own draw pipeline (pygame_render.py) — for transferring
        # reference-trained pixel agents.  Default stays the in-jit
        # TPU-resident rasterizer below.
        if backend not in ("rasterizer", "pygame"):
            raise ValueError(f"unknown grayscale backend {backend!r}")
        self.backend = backend
        if backend == "pygame":
            self.host_side = True        # instance attrs shadow the class
            self.stateful_stack = False  # defaults used by the jit path
            self._renderer = None
            self._host_stack = np.zeros(self.shape, np.uint8)

    # ---------------- pygame-exact host path ------------------------------ #
    def reset_stack(self) -> None:
        self._host_stack = np.zeros(self.shape, np.uint8)

    def observe_host(self, env, state) -> np.ndarray:
        """Reference GrayscaleObservation.observe: render the viewer frame,
        convert with the RGB weights, roll the stack
        (envs/common/observation.py:101-112)."""
        from highwayenv_tpu.pygame_render import PygameFrameRenderer

        if self._renderer is None:
            self._renderer = PygameFrameRenderer(
                env,
                self.observation_shape[0],
                self.observation_shape[1],
                scaling=self.scaling,
                centering=self.centering,
            )
        self._renderer.display(state)
        raw_rgb = self._renderer.get_image()  # H x W x C
        raw_rgb = np.moveaxis(raw_rgb, 0, 1)
        frame = (
            np.dot(raw_rgb[..., :3], self.weights).clip(0, 255).astype(np.uint8)
        )
        self._host_stack = np.roll(self._host_stack, -1, axis=0)
        self._host_stack[-1, :, :] = frame
        return self._host_stack

    def space(self):
        from gymnasium import spaces

        return spaces.Box(shape=self.shape, low=0, high=255, dtype=np.uint8)

    # ------------------------------------------------------------------ #
    def init_stack(self) -> jnp.ndarray:
        return jnp.zeros(self.shape, jnp.uint8)

    def push(self, geo, veh, ego, stack: jnp.ndarray) -> jnp.ndarray:
        """Roll the stack and append the current frame
        (observation.py:101-105)."""
        frame = self.frame(geo, veh, ego)
        return jnp.concatenate([stack[1:], frame[None]], axis=0)

    def frame(self, geo, veh, ego) -> jnp.ndarray:
        """Rasterize one (W, H) uint8 grayscale frame, jittable.

        Round-5 rebuild: instead of continuous point-membership tests, the
        rasterizer models the pygame pipeline's INTEGER camera math
        (road/graphics.py:42-95 truncating vec2pix, the 1-px line draws,
        and VehicleGraphics' surface-space rects: body + headlights + 1px
        black border + tires, vehicle/graphics.py:31-141) evaluated
        per-pixel on device.  Exact for axis-aligned entities (pygame skips
        rotation below 2 deg, graphics.py:102); rotated entities use the
        continuous inverse-rotation approximation of the nearest-neighbor
        rotated blit.  Divergence vs the byte-exact backend is asserted in
        tests/parity/test_grayscale_divergence.py.
        """
        W, H = self.observation_shape
        gamma = self.scaling
        cx = veh.pos[..., ego, 0]
        cy = veh.pos[..., ego, 1]
        x0 = cx - self.centering[0] * W / gamma
        y0 = cy - self.centering[1] * H / gamma
        wx = x0 + (jnp.arange(W, dtype=jnp.float32) + 0.5) / gamma  # (W,)
        wy = y0 + (jnp.arange(H, dtype=jnp.float32) + 0.5) / gamma  # (H,)
        # pixel grid, flattened points (N=H*W, 2), row-major (H, W)
        gx = jnp.broadcast_to(wx[None, :], (H, W)).reshape(-1)
        gy = jnp.broadcast_to(wy[:, None], (H, W)).reshape(-1)
        pts = jnp.stack([gx, gy], axis=-1)
        ixg = jnp.broadcast_to(
            jnp.arange(W, dtype=jnp.float32)[None, :], (H, W)
        ).reshape(-1)  # (N,) integer pixel column of each point
        iyg = jnp.broadcast_to(
            jnp.arange(H, dtype=jnp.float32)[:, None], (H, W)
        ).reshape(-1)

        g = self._lane_layer(geo, pts, ixg, iyg, gamma)
        g = self._entity_layer(veh, ixg, iyg, x0, y0, gamma, ego, g)

        img = jnp.clip(g, 0, 255).astype(jnp.uint8).reshape(H, W)
        return img.T  # (W, H) like the reference's moveaxis

    def _lane_layer(self, geo, pts, ixg, iyg, gamma):
        """White lane markings on a uniform grey ground.

        The reference fills the whole world surface GREY and draws ONLY the
        lane lines (graphics.py:296-308 fill + LaneGraphics.display).  Each
        marking segment is a 1-px pygame line — a straight CHORD between
        the integer-truncated pixels of its two endpoints, even on curved
        lanes (road/graphics.py:229-260 draws per-stripe chords; CONTINUOUS
        draws SPACING-length chords, CONTINUOUS_LINE one single chord).
        Each pixel Bresenham-tests the chord of the segment(s) its own
        projected arc-length selects: STRIPED segments are
        [k*SPACING, k*SPACING+LENGTH], CONTINUOUS [k*SPACING, (k+1)*SPACING],
        both clipped to the lane and skipped when the clipped remainder is
        <= 0.5*LENGTH (graphics.py:251-253).  Lines wider than 1 px (pygame
        uses max(pix(0.3), 1)) are not modeled — at the standard
        scaling <= 3.3 px/m the width is 1."""
        L = geo.num_lanes
        s_tab, _lat_tab = lane_ops.projection_table(geo, pts)  # (L, N)
        lengths = jnp.asarray(geo.length)[:, None]
        widths = jnp.asarray(geo.width)[:, None]
        lt = np.asarray(geo.line_types)  # (L, 2) static
        half = 0.5 / gamma
        x0 = pts[..., 0] - (ixg + 0.5) / gamma  # scalar origin, broadcast
        y0 = pts[..., 1] - (iyg + 0.5) / gamma
        all_lanes = jnp.arange(L, dtype=jnp.int32)[:, None]

        def chord_hit(lane_arr, a, b, sign):
            """Pixelwise Bresenham membership of the chord from
            position(a) to position(b) at lateral sign*width/2."""
            e0 = lane_ops.position(geo, lane_arr, a, sign * widths / 2)
            e1 = lane_ops.position(geo, lane_arr, b, sign * widths / 2)
            # vec2pix truncation (pygame's int() truncates TOWARD ZERO)
            p0x = jnp.trunc(gamma * (e0[..., 0] - x0))
            p0y = jnp.trunc(gamma * (e0[..., 1] - y0))
            p1x = jnp.trunc(gamma * (e1[..., 0] - x0))
            p1y = jnp.trunc(gamma * (e1[..., 1] - y0))
            dx = p1x - p0x
            dy = p1y - p0y
            tx = jnp.where(dx != 0, (ixg - p0x) / dx, 0.0)
            ty = jnp.where(dy != 0, (iyg - p0y) / dy, 0.0)
            yx = p0y + tx * dy  # ideal y at this integer x
            xy = p0x + ty * dx
            inx = (ixg >= jnp.minimum(p0x, p1x)) & (ixg <= jnp.maximum(p0x, p1x))
            iny = (iyg >= jnp.minimum(p0y, p1y)) & (iyg <= jnp.maximum(p0y, p1y))
            lit_x = inx & (iyg == jnp.floor(yx + 0.5))
            lit_y = iny & (ixg == jnp.floor(xy + 0.5))
            return jnp.where(jnp.abs(dx) >= jnp.abs(dy), lit_x, lit_y)

        white = jnp.zeros((pts.shape[0],), bool)
        for side, sign in ((0, -1.0), (1, 1.0)):
            ctype = lt[:, side]
            if not np.any(ctype > 0):
                continue
            striped = jnp.asarray(ctype == 1)[:, None]
            is_contline = ctype == 3
            seg_len = jnp.where(striped, STRIPE_LENGTH, STRIPE_SPACING)
            drawn_seg = jnp.asarray((ctype == 1) | (ctype == 2))[:, None]
            # candidate segments: the pixel's own and the boundary-nearest
            # neighbor (chords of adjacent segments share endpoints)
            k0 = jnp.floor(s_tab / STRIPE_SPACING)
            knear = k0 + jnp.where(
                jnp.mod(s_tab, STRIPE_SPACING) > STRIPE_SPACING / 2, 1.0, -1.0
            )
            for k in (k0, knear):
                a = jnp.maximum(k * STRIPE_SPACING, 0.0)
                b = jnp.minimum(k * STRIPE_SPACING + seg_len, lengths)
                vis_ok = (b - a) > 0.5 * STRIPE_LENGTH
                white = white | jnp.any(
                    drawn_seg & vis_ok & chord_hit(all_lanes, a, b, sign),
                    axis=0,
                )
            if np.any(is_contline):
                cl = jnp.asarray(is_contline)[:, None]
                zero = jnp.zeros_like(s_tab)
                white = white | jnp.any(
                    cl & chord_hit(
                        all_lanes, zero, zero + lengths, sign
                    ),
                    axis=0,
                )

        return jnp.where(white, self.gray["white"], self.gray["grey"])

    def _entity_layer(self, veh, ixg, iyg, x0, y0, gamma, ego, g):
        """Vehicles and road objects with the pygame backend's surface-space
        detail: body rect + headlights + 1-px black border (+ tires for
        plain/continuous-ego vehicles), colored by get_color's cascade
        (vehicle/graphics.py:234-250), drawn objects-then-traffic in slot
        order (graphics.py:133-151) so the LAST drawn slot wins a pixel."""
        flr = jnp.floor
        kind = veh.kind
        V = kind.shape[-1]
        slot = jnp.arange(V)
        is_ego_slot = np.zeros((V,), bool)
        for e in np.atleast_1d(np.asarray(self.env.ego_slots)):
            is_ego_slot[int(e)] = True
        is_ego_slot = jnp.asarray(is_ego_slot)
        is_obj = (kind == KIND_OBSTACLE) | (kind == KIND_LANDMARK)
        length = veh.length
        width = veh.width
        side = jnp.where(is_obj, length, length + 2.0)  # tire_length = 1.0

        # --- inverse-rotated surface pixel coordinates (V, N) ------------- #
        # pygame skips rotation below 2 degrees (vehicle/graphics.py:131)
        h = jnp.where(jnp.abs(veh.heading) > 2.0 * np.pi / 180.0,
                      veh.heading, 0.0)
        pos_px_x = jnp.trunc(gamma * (veh.pos[..., 0] - x0))  # blit pivot px
        pos_px_y = jnp.trunc(gamma * (veh.pos[..., 1] - y0))
        c = jnp.cos(h)[..., None]
        s = jnp.sin(h)[..., None]
        dx = (ixg + 0.5) - pos_px_x[..., None]
        dy = (iyg + 0.5) - pos_px_y[..., None]
        c0 = (flr(gamma * side) / 2.0)[..., None]  # surface center (px)
        ux = c0 + c * dx + s * dy
        uy = c0 - s * dx + c * dy

        def rect(x0r, y0r, wr, hr):
            return (ux >= x0r) & (ux < x0r + wr) & (uy >= y0r) & (uy < y0r + hr)

        # body rect at integer surface coords (vehicle/graphics.py:38-44)
        pl = flr(gamma * length)[..., None]
        pw = flr(gamma * width)[..., None]
        bx0 = jnp.where(is_obj, 0.0, flr(gamma * 1.0))[..., None]
        by0 = flr(gamma * (side / 2 - width / 2))[..., None]
        body = rect(bx0, by0, pl, pw)
        interior = rect(bx0 + 1, by0 + 1, pl - 2, pw - 2)
        border = body & ~interior  # 1-px BLACK ring (draw.rect width=1)
        # signed distance (surface px) to the body rect boundary, for the
        # rotated-branch edge anti-aliasing below (positive inside)
        d_body = jnp.minimum(
            jnp.minimum(ux - bx0, bx0 + pl - ux),
            jnp.minimum(uy - by0, by0 + pw - uy),
        )

        # headlights: two lightened rects at the front (graphics.py:49-66)
        hx0 = flr(gamma * (1.0 + length - 0.72))[..., None]
        hw = flr(gamma * 0.72)[..., None]
        hh = flr(gamma * 0.6)[..., None]
        hy1 = flr(gamma * (side / 2 - 1.4 * width / 3.0))[..., None]
        hy2 = flr(gamma * (side / 2 + 0.6 * width / 5.0))[..., None]
        headlight = (~is_obj[..., None]) & (
            rect(hx0, hy1, hw, hh) | rect(hx0, hy2, hw, hh)
        )

        # tires: 4 black rects half-overhanging the body corners — only for
        # plain vehicles and non-meta egos (graphics.py:67-96); invisible
        # below scaling ~3.3 px/m where floor(gamma*0.3) == 0
        tire_on_slot = (kind == KIND_PLAIN) | (
            is_ego_slot & (not self._meta_ego)
        )
        ptl = flr(gamma * 1.0)
        toff = flr((ptl + 1.0) / 2.0)  # blit-origin truncation
        ty0 = flr(gamma * 0.35)
        th = flr(gamma * 0.3)
        tire = jnp.zeros_like(body)
        if float(np.floor(gamma * 0.3)) >= 1.0:
            for tx_expr, ty_expr in (
                (1.0, side / 2 - width / 2),
                (1.0, side / 2 + width / 2),
                (side - 1.0, side / 2 - width / 2),
                (side - 1.0, side / 2 + width / 2),
            ):
                ox = (flr(gamma * tx_expr) - toff)[..., None]
                oy = (flr(gamma * ty_expr) - toff + ty0)[..., None]
                tire = tire | rect(ox, oy, ptl[..., None],
                                   jnp.broadcast_to(th, ox.shape))
            tire = tire & tire_on_slot[..., None]

        covered = (body | tire) & veh.active[..., None]

        # --- get_color cascade as a color-id (0 yellow / 1 blue / 2 green /
        # 3 red / 4 ego override) ----------------------------------------- #
        cid = jnp.where(
            kind == KIND_LANDMARK,
            jnp.where(veh.hit, 2, 1),
            jnp.where(
                is_obj,
                jnp.where(veh.crashed, 3, 0),
                jnp.where(
                    veh.crashed,
                    3,
                    jnp.where(
                        kind == KIND_IDM,
                        1,
                        jnp.where(
                            (kind == KIND_EGO)
                            & is_ego_slot
                            & self._meta_ego,
                            2,
                            0,
                        ),
                    ),
                ),
            ),
        )
        if self._has_ego_override:
            # explicit env.ego_color beats even crashed (graphics.py:235-236)
            cid = jnp.where(is_ego_slot, 4, cid)
        body_gray = jnp.asarray(self._cid_gray)[cid]
        hl_gray = jnp.asarray(self._cid_gray_light)[cid]

        black = jnp.float32(self.gray["black"])
        gv_pix = jnp.where(
            tire | border,
            black,
            jnp.where(headlight, hl_gray[..., None], body_gray[..., None]),
        )  # (V, N)

        # rotated entities: pygame's nearest-neighbor rotated blit produces
        # ragged +-0.5 px edges a hard membership test cannot reproduce;
        # anti-aliased coverage halves the expected per-edge-pixel error
        # (axis-aligned entities keep the exact hard test)
        rot = (h != 0.0)[..., None]
        alpha = jnp.where(
            rot & ~tire,
            jnp.clip(d_body + 0.5, 0.0, 1.0),
            jnp.where(body | tire, 1.0, 0.0),
        )
        covered = covered | (rot & (alpha > 0.0) & veh.active[..., None])

        # objects draw before traffic, both in slot order -> the last-drawn
        # covering slot wins
        prio = slot + jnp.where(is_obj, 0, V)
        key = jnp.where(covered, prio[..., None], -1)
        win = jnp.argmax(key, axis=-2)  # (N,) highest prio (unique per slot)
        oh = jax.nn.one_hot(win, V, dtype=g.dtype, axis=-2)
        g_veh = jnp.einsum("...vn,...vn->...n", oh, gv_pix,
                           precision="highest")
        a_win = jnp.einsum("...vn,...vn->...n", oh, alpha.astype(g.dtype),
                           precision="highest")
        covered_any = jnp.max(key, axis=-2) >= 0
        return jnp.where(covered_any, a_win * g_veh + (1 - a_win) * g, g)

    def observe(self, geo, veh, ego):
        raise TypeError(
            "GrayscaleObservation is stacked through EnvState.obs_stack; "
            "BaseEnv handles it in _observe"
        )
