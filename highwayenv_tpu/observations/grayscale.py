"""Grayscale frame-stack observation (envs/common/observation.py:50-112).

Unlike the reference (which grabs the pygame viewer's framebuffer), the frame
is rasterized INSIDE the jitted step: lane markings via the compiled lane
projection tables and vehicles as rotated-rectangle membership tests on the
pixel grid, then RGB->gray with the configured weights.  The DQN-style frame
stack lives in ``EnvState.obs_stack`` so the observation stays a pure
function of state.  Divergence from the byte-exact pygame backend is
bounded and asserted (<=5% of pixels off by >8 levels, PSNR >= 21 dB —
PARITY.md #12, tests/parity/test_grayscale_divergence.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from highwayenv_tpu.road import lane as lane_ops
from highwayenv_tpu.vehicle.state import (
    KIND_EGO,
    KIND_LANDMARK,
    KIND_OBSTACLE,
)

# render.py colors -> gray levels via the DQN weights at __init__
_COLORS = {
    "grey": (100, 100, 100),
    "white": (255, 255, 255),
    "black": (60, 60, 60),
    "yellow": (200, 200, 0),
    "green": (50, 200, 0),
    "red": (255, 100, 100),
    "blue": (100, 200, 255),
    "obstacle": (150, 120, 120),
}
STRIPE_SPACING = 4.33
STRIPE_LENGTH = 3.0


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
        """Rasterize one (W, H) uint8 grayscale frame, jittable."""
        W, H = self.observation_shape
        scaling = self.scaling
        cx = veh.pos[..., ego, 0]
        cy = veh.pos[..., ego, 1]
        x0 = cx - self.centering[0] * W / scaling
        y0 = cy - self.centering[1] * H / scaling
        wx = x0 + (jnp.arange(W, dtype=jnp.float32) + 0.5) / scaling  # (W,)
        wy = y0 + (jnp.arange(H, dtype=jnp.float32) + 0.5) / scaling  # (H,)
        # pixel grid, flattened points (N=H*W, 2), row-major (H, W)
        gx = jnp.broadcast_to(wx[None, :], (H, W)).reshape(-1)
        gy = jnp.broadcast_to(wy[:, None], (H, W)).reshape(-1)
        pts = jnp.stack([gx, gy], axis=-1)

        # ---- lanes: white markings on a uniform grey ground ------------- #
        # The reference fills the whole world surface GREY and draws ONLY
        # the lane lines (graphics.py:296-308 fill + LaneGraphics.display)
        # — there is no darker road band; earlier rounds drew one, which
        # made every road-interior pixel differ from the pygame backend.
        # CONTINUOUS (2) and CONTINUOUS_LINE (3) both render as continuous
        # lines (graphics.py:145-149); STRIPED (1) uses the global
        # s ~ [k*SPACING, k*SPACING+LENGTH) phase.
        s_tab, lat_tab = lane_ops.projection_table(geo, pts)  # (L, N)
        lengths = jnp.asarray(geo.length)[:, None]
        widths = jnp.asarray(geo.width)[:, None]
        lt = np.asarray(geo.line_types)  # (L, 2) static
        on_len = (s_tab >= 0.0) & (s_tab <= lengths)
        half_px = 0.5 / scaling

        stripe_on = jnp.mod(s_tab, STRIPE_SPACING) <= STRIPE_LENGTH
        white = jnp.zeros((pts.shape[0],), bool)
        for side, sign in ((0, -1.0), (1, 1.0)):
            side_hit = on_len & (
                jnp.abs(lat_tab - sign * widths / 2) <= half_px
            )
            cont = jnp.asarray((lt[:, side] == 2) | (lt[:, side] == 3))[:, None]
            strp = jnp.asarray(lt[:, side] == 1)[:, None]
            white = white | jnp.any(
                side_hit & (cont | (strp & stripe_on)), axis=0
            )

        g = jnp.where(white, self.gray["white"], self.gray["grey"])

        # ---- vehicles: rotated-rect membership, lower kind drawn on top -- #
        dx = pts[..., 0][None, :] - veh.pos[..., :, 0][..., None]  # (V, N)
        dy = pts[..., 1][None, :] - veh.pos[..., :, 1][..., None]
        c = jnp.cos(veh.heading)[..., None]
        s = jnp.sin(veh.heading)[..., None]
        rx = c * dx + s * dy
        ry = -s * dx + c * dy
        inside = (
            (jnp.abs(rx) <= veh.length[..., None] / 2)
            & (jnp.abs(ry) <= veh.width[..., None] / 2)
            & veh.active[..., None]
        )

        kind = veh.kind
        slot = jnp.arange(kind.shape[-1])
        is_ego = slot == ego
        gv = jnp.where(
            kind == KIND_LANDMARK,
            self.gray["blue"],
            jnp.where(
                kind == KIND_OBSTACLE,
                jnp.where(veh.crashed, self.gray["red"], self.gray["obstacle"]),
                jnp.where(
                    veh.crashed,
                    self.gray["red"],
                    jnp.where(is_ego, self.gray["green"], self.gray["yellow"]),
                ),
            ),
        )  # (V,)

        # render order is kind-descending (render.py:176) so the LOWEST kind
        # covering a pixel wins
        key = jnp.where(inside, kind[..., None], 99)
        kmin = jnp.min(key, axis=-2)  # (N,)
        first = jnp.argmax(key == kmin[..., None, :], axis=-2)  # (N,)
        oh = jax.nn.one_hot(first, kind.shape[-1], dtype=g.dtype)
        g_veh = jnp.einsum("...nv,...v->...n", oh, gv, precision="highest")
        covered = kmin < 99
        g = jnp.where(covered, g_veh, g)

        img = jnp.clip(g, 0, 255).astype(jnp.uint8).reshape(H, W)
        return img.T  # (W, H) like the reference's moveaxis

    def observe(self, geo, veh, ego):
        raise TypeError(
            "GrayscaleObservation is stacked through EnvState.obs_stack; "
            "BaseEnv handles it in _observe"
        )
