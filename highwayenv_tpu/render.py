"""Minimal numpy rasterizer for rgb_array rendering.

Pygame-free re-creation of the reference viewer's look
(envs/common/graphics.py:23-289, road/graphics.py:21-459,
vehicle/graphics.py:20-264): meters->pixels camera with the configured
scaling/centering, grey background, lane markings (continuous/striped, 4.33 m
stripe spacing), and vehicles as filled rotated rectangles colored by state
(ego green, crashed red, traffic yellow, obstacles grey-red, landmark blue).

This renderer is out of the RL hot path; it runs host-side on numpy arrays
pulled from the device state.  Pixel-exact parity with pygame is NOT a goal.
"""

from __future__ import annotations

import numpy as np

from highwayenv_tpu.vehicle.state import (
    KIND_EGO,
    KIND_LANDMARK,
    KIND_OBSTACLE,
)

# colors (vehicle/graphics.py:24-33, road/graphics.py class attrs)
GREY = (100, 100, 100)
WHITE = (255, 255, 255)
YELLOW = (200, 200, 0)
GREEN = (50, 200, 0)
RED = (255, 100, 100)
BLUE = (100, 200, 255)
BLACK = (60, 60, 60)

STRIPE_SPACING = 4.33
STRIPE_LENGTH = 3.0


class Camera:
    def __init__(self, width, height, scaling, center, centering):
        self.w, self.h = int(width), int(height)
        self.scaling = float(scaling)
        cx, cy = center
        self.x0 = cx - centering[0] * self.w / self.scaling
        self.y0 = cy - centering[1] * self.h / self.scaling

    def to_px(self, pos):
        pos = np.asarray(pos, np.float64)
        px = (pos[..., 0] - self.x0) * self.scaling
        py = (pos[..., 1] - self.y0) * self.scaling
        return px, py


def _draw_points(img, px, py, color):
    xi = np.round(px).astype(int)
    yi = np.round(py).astype(int)
    ok = (0 <= xi) & (xi < img.shape[1]) & (0 <= yi) & (yi < img.shape[0])
    img[yi[ok], xi[ok]] = color


def _draw_polyline(img, cam, pts, color, step_px=1.0):
    """Rasterize a world-space polyline by dense sampling."""
    pts = np.asarray(pts, np.float64)
    if len(pts) < 2:
        return
    seg = np.diff(pts, axis=0)
    lens = np.linalg.norm(seg, axis=-1)
    for p0, d, ln in zip(pts[:-1], seg, lens):
        n = max(2, int(ln * cam.scaling / step_px) + 1)
        t = np.linspace(0.0, 1.0, n)[:, None]
        samples = p0 + t * d
        px, py = cam.to_px(samples)
        _draw_points(img, px, py, color)


def _fill_rect(img, cam, center, length, width, heading, color):
    """Filled rotated rectangle via bounding-box membership test."""
    c, s = np.cos(heading), np.sin(heading)
    corners = np.array(
        [[dx * length / 2, dy * width / 2] for dx, dy in
         ((-1, -1), (-1, 1), (1, 1), (1, -1))]
    )
    world = center + corners @ np.array([[c, s], [-s, c]])
    px, py = cam.to_px(world)
    x_min, x_max = int(np.floor(px.min())), int(np.ceil(px.max()))
    y_min, y_max = int(np.floor(py.min())), int(np.ceil(py.max()))
    x_min = max(x_min, 0)
    y_min = max(y_min, 0)
    x_max = min(x_max, img.shape[1] - 1)
    y_max = min(y_max, img.shape[0] - 1)
    if x_min > x_max or y_min > y_max:
        return
    xs = np.arange(x_min, x_max + 1)
    ys = np.arange(y_min, y_max + 1)
    gx, gy = np.meshgrid(xs, ys)
    wx = gx / cam.scaling + cam.x0 - center[0]
    wy = gy / cam.scaling + cam.y0 - center[1]
    rx = c * wx + s * wy
    ry = -s * wx + c * wy
    inside = (
        (np.abs(rx) <= length / 2) & (np.abs(ry) <= width / 2)
    )
    img[gy[inside], gx[inside]] = color


def _positions_at(lane, s, lat):
    """Vectorized host lane.position over an array of arc lengths."""
    n = len(s)
    try:
        pts = np.asarray(lane.position(s[:, None], float(lat)), float)
        if pts.shape == (n, 2):
            return pts
        if pts.shape == (n, 1, 2):  # lanes that broadcast on the last axis
            return pts[:, 0, :]
    except Exception:
        pass
    return np.stack(
        [np.asarray(lane.position(float(si), float(lat)), float) for si in s]
    )


def _draw_lane_line(img, cam, lane, lat, s0, s1, color, dashed=False):
    """Stamp a lane-parallel line in ONE vectorized pass: arc lengths at
    ~1 px spacing (optionally masked to the 3 m / 4.33 m stripe pattern,
    phase-locked to s=0 like road/graphics.py:113-180), one host
    ``lane.position`` call, one pixel scatter."""
    if s1 <= s0:
        return
    step = max(1.0 / cam.scaling, 1e-3)  # ~1 px along the arc, in meters
    s = np.arange(s0, s1, step)
    if len(s) == 0:
        return
    if dashed:
        s = s[np.mod(s, STRIPE_SPACING) < STRIPE_LENGTH]
        if len(s) == 0:
            return
    px, py = cam.to_px(_positions_at(lane, s, lat))
    _draw_points(img, px, py, color)


def _visible_s_window(lane, cam_center, cam):
    """Arc-length window of a lane visible from the camera (with margin)."""
    s_c, _ = (float(x) for x in lane.local_coordinates(np.asarray(cam_center)))
    half = (cam.w + cam.h) / cam.scaling  # generous half-diagonal in meters
    return max(0.0, s_c - half), min(float(lane.length), s_c + half)


def render_rgb(env, state, history=None) -> np.ndarray:
    """(H, W, 3) uint8 frame centered on the first controlled vehicle.

    ``history``: optional per-slot deque of past (pos, heading) snapshots
    (maintained by the stateful viewer); drawn as faded trajectory ghosts
    when ``config["show_trajectories"]`` (vehicle/graphics.py:146-171)."""
    cfg = env.config
    veh = state.vehicles
    pos = np.asarray(veh.pos)
    ego = env.ego_slots[0]
    cam = Camera(
        cfg["screen_width"],
        cfg["screen_height"],
        cfg["scaling"],
        pos[ego],
        cfg.get("centering_position", [0.3, 0.5]),
    )
    img = np.empty((cam.h, cam.w, 3), np.uint8)
    img[:] = GREY

    # lanes: surface band + side lines (road/graphics.py:113-240), sampled
    # from the host lane objects over the visible window only
    geo = env.geo
    line_types = np.asarray(geo.line_types)
    lanes = [lane for ls in env.net.edges.values() for lane in ls]
    cam_center = pos[ego]
    for li, lane in enumerate(lanes):
        half = lane.width / 2
        s0, s1 = _visible_s_window(lane, cam_center, cam)
        if s1 <= s0:
            continue
        # darker road band
        _draw_lane_line(img, cam, lane, 0.0, s0, s1, BLACK)
        for side, lat in ((0, -half), (1, half)):
            lt = int(line_types[li, side])
            if lt == 0:
                continue
            # striped (lt=1): 3 m dashes at 4.33 m spacing; else continuous
            _draw_lane_line(
                img, cam, lane, lat, s0, s1, WHITE, dashed=(lt == 1)
            )

    # trajectory ghosts: faded rectangles at past poses
    # (vehicle/graphics.py:146-171 display_history, every 5th frame)
    if history and cfg.get("show_trajectories"):
        for i, snaps in history.items():
            for k, (hp, hh, hl, hw) in enumerate(list(snaps)[::5]):
                fade = 0.25
                base = np.array(YELLOW if i not in env.ego_slots else GREEN)
                ghost = tuple(
                    (fade * base + (1 - fade) * np.array(GREY)).astype(int)
                )
                _fill_rect(img, cam, hp, hl, hw, hh, ghost)

    # lidar overlay (envs/common/graphics.py:258-288): one ray per angular
    # cell, clipped at the measured distance
    if type(env.observation_type).__name__ == "LidarObservation":
        ot = env.observation_type
        grid = np.asarray(
            ot.observe(env.geo, state.vehicles, env.ego_slots[0])
        )
        cells = grid.shape[0]
        dist = grid[:, 0] * (
            ot.maximum_range if getattr(ot, "normalize", True) else 1.0
        )
        angles = np.arange(cells) * ot.angle
        origin = pos[ego]
        for a, d in zip(angles, dist):
            end = origin + d * np.array([np.cos(a), np.sin(a)])
            _draw_polyline(img, cam, np.stack([origin, end]), (200, 200, 200))

    # objects + vehicles (vehicle/graphics.py:20-100)
    kind = np.asarray(veh.kind)
    heading = np.asarray(veh.heading)
    length = np.asarray(veh.length)
    width = np.asarray(veh.width)
    crashed = np.asarray(veh.crashed)
    active = np.asarray(veh.active)
    for i in np.argsort(kind)[::-1]:  # draw objects first, egos last
        if not active[i]:
            continue
        if kind[i] == KIND_LANDMARK:
            color = BLUE
        elif kind[i] == KIND_OBSTACLE:
            color = RED if crashed[i] else (150, 120, 120)
        elif crashed[i]:
            color = RED
        elif i in env.ego_slots:
            color = GREEN
        else:
            color = YELLOW
        _fill_rect(
            img, cam, pos[i], float(length[i]), float(width[i]),
            float(heading[i]), color,
        )
    return img
