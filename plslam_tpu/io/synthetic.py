"""Synthetic RGB-D sequence with exact ground truth.

Offline stand-in for the TUM RGB-D benchmark (no network in this
environment): a textured background plane plus floating foreground patches,
rendered by ray-plane intersection; camera follows a smooth fr1_xyz-style
trajectory (mostly translation + gentle rotation). The texture includes dark
straight stripes so the LSD/LBD line pipeline has structure to find
(ICL-NUIM-style low-texture mode sets `low_texture=True`).

Used by tests, examples/rgbd_tum.py --synthetic, and bench.py.
"""

from __future__ import annotations

import numpy as np

from plslam_tpu.config import Settings


def _texture(rng, size=2048, low_texture=False, n_lines=40):
    try:
        import cv2

        tex = rng.uniform(0, 255, (size, size)).astype(np.float32)
        tex = cv2.GaussianBlur(tex, (0, 0), 2.0 if not low_texture else 6.0)
    except ImportError:  # pragma: no cover
        tex = rng.uniform(0, 255, (size, size)).astype(np.float32)
    tex = (tex - tex.min()) / (tex.max() - tex.min() + 1e-9)
    tex = (40 + tex * 170).astype(np.float32)
    # straight dark/bright stripes -> line features
    for _ in range(n_lines):
        x0, y0 = rng.uniform(0, size, 2)
        ang = rng.uniform(0, np.pi)
        length = rng.uniform(0.2, 0.8) * size
        x1, y1 = x0 + np.cos(ang) * length, y0 + np.sin(ang) * length
        try:
            import cv2

            cv2.line(
                tex,
                (int(x0), int(y0)),
                (int(x1), int(y1)),
                float(rng.choice([20.0, 235.0])),
                thickness=int(rng.integers(2, 5)),
            )
        except ImportError:  # pragma: no cover
            pass
    return tex


class SyntheticSequence:
    """Deterministic RGB-D sequence. frame(i) -> (gray f32[H,W] 0..255,
    depth f32[H,W] meters, timestamp float). gt_pose_wc(i) -> Twc f64[4,4]."""

    def __init__(
        self,
        n_frames: int = 100,
        height: int = 480,
        width: int = 640,
        seed: int = 0,
        low_texture: bool = False,
        motion_scale: float = 1.0,
        fps: float = 30.0,
        trajectory: str = "xyz",
        depth_noise: float = 0.0,
        settings: Settings | None = None,
    ):
        """settings: render through THIS calibration (intrinsics AND lens
        distortion — rays come from cv2.undistortPoints, so the image is
        what that lens would see and the pipeline's undistortion inverts
        it). Lets e2e tests drive a System built verbatim from a shipped
        config file (e.g. configs/TUM1.yaml) with geometrically consistent
        synthetic frames."""
        self.n_frames = n_frames
        if settings is not None:
            width, height = settings.width, settings.height
            fps = settings.fps
        self.height, self.width = height, width
        self.fps = fps
        # "xyz" (fr1_xyz-style) | "loop" (circle) | "rect" (corridor circuit)
        self.trajectory = trajectory
        # depth_noise: sigma of a deterministic per-frame low-frequency
        # multiplicative depth error field (Kinect-style calibration warp).
        # Gives the odometry a realistic random-walk drift so loop-closure
        # fixtures accumulate REAL error on the excursion (with exact depth
        # the synthetic odometry is so good that a revisit re-fuses the old
        # landmarks and the map reconnects without any loop closure).
        self.depth_noise = depth_noise
        self.seed = seed
        rng = np.random.default_rng(seed)
        self.settings = settings if settings is not None else Settings(
            fx=520.0, fy=520.0, cx=width / 2 - 0.5, cy=height / 2 - 0.5,
            k1=0, k2=0, p1=0, p2=0, k3=0, width=width, height=height,
            bf=40.0, depth_map_factor=1.0, fps=fps,
        )
        self.tex = _texture(rng, low_texture=low_texture)
        self.tex_scale = 220.0  # pixels per world meter on the planes
        self.z_bg = 3.4
        # foreground square patches (world x, y, half-size, z). The loop
        # circuit sweeps the whole ring (x in ±R+fov, y in [0, 2R]) — close
        # structure must exist along ALL of it or the far-only arcs (wall
        # beyond ThDepth*baseline) drift unboundedly.
        # each patch samples its OWN texture region (offset into the tiled
        # texture): without the offset a patch is a floating COPY of the wall
        # area at the same (x, y) — duplicated texture that produces exact
        # descriptor collisions between different physical points (false
        # loop-closure correspondences no real scene would have)
        if trajectory == "loop":
            self.patches = [
                (rng.uniform(-2.4, 2.4), rng.uniform(-0.8, 4.0),
                 rng.uniform(0.2, 0.5), rng.uniform(1.5, 3.0),
                 rng.uniform(4.0, 8.0), rng.uniform(4.0, 8.0))
                for _ in range(34)
            ]
        elif trajectory == "rect":
            # corridor circuit sweeps x in [0, 3.2]+fov, y in [0, 2.4]+fov.
            # JITTERED GRID placement: uniform-random patches leave close-
            # structure deserts along the straight legs, and a leg posed
            # only against the far wall (beyond ThDepth*baseline) drifts
            # unboundedly (measured 1.2 m by mid-leg-1 with 40 random
            # patches)
            self.patches = []
            for gx in range(8):
                for gy in range(6):
                    px = -1.2 + (gx + rng.uniform(0.2, 0.8)) * 5.6 / 8
                    py = -1.0 + (gy + rng.uniform(0.2, 0.8)) * 4.6 / 6
                    self.patches.append(
                        (px, py, rng.uniform(0.25, 0.5),
                         rng.uniform(1.5, 2.8),
                         rng.uniform(4.0, 8.0), rng.uniform(4.0, 8.0))
                    )
        else:
            self.patches = [
                (rng.uniform(-1.4, 1.4), rng.uniform(-1.0, 1.0),
                 rng.uniform(0.2, 0.5), rng.uniform(1.5, 3.0),
                 rng.uniform(4.0, 8.0), rng.uniform(4.0, 8.0))
                for _ in range(14)
            ]
        self.motion_scale = motion_scale
        K, dist = self.settings.intrinsics()
        self.K = K
        u, v = np.meshgrid(np.arange(width), np.arange(height))
        if np.any(np.asarray(dist) != 0):
            # distorted lens: each pixel's ray comes from undistortPoints,
            # so the rendered image is what the configured lens observes
            import cv2

            pts = np.stack([u, v], -1).reshape(-1, 1, 2).astype(np.float64)
            norm = cv2.undistortPoints(
                pts, np.asarray(K, np.float64), np.asarray(dist, np.float64)
            ).reshape(height, width, 2)
            self.ray = np.concatenate(
                [norm, np.ones((height, width, 1), np.float64)], -1
            )
        else:
            self.ray = np.stack(
                [(u - K[0, 2]) / K[0, 0], (v - K[1, 2]) / K[1, 1], np.ones_like(u, np.float64)], -1
            )  # camera-frame ray with z=1

    def gt_pose_wc(self, i: int) -> np.ndarray:
        """Twc (camera->world), float64."""
        t = i / self.fps
        s = self.motion_scale
        if self.trajectory == "loop":
            # circular circuit in the wall-parallel (x, y) plane, camera
            # always facing the wall: the viewed ring on the wall is WIDER
            # than the field of view, so mid-circuit frames share no content
            # with the start — closure is abrupt at the wrap, like a corridor
            # loop (an out-and-back path would re-observe mapped content
            # continuously and reconnect through tracking, never needing a
            # loop closure). Final ~25% of frames dwell at the start pose so
            # the keyframe policy fires inside the revisited region.
            period = max(int(0.75 * self.n_frames), 2)
            ph = 2.0 * np.pi * min(i, period) / period
            R_loop = 1.6 * s
            tx = R_loop * np.sin(ph)
            ty = R_loop * (1.0 - np.cos(ph))
            tz = 0.05 * s * np.sin(3.0 * ph)
            T = np.eye(4)
            T[:3, 3] = [tx, ty, tz]
            return T
        if self.trajectory == "rect":
            # out-and-back corridor CIRCUIT (the second loop topology the
            # round-4 verdict asked for): straight legs + sharp turns, a
            # return leg fully outside the outbound leg's field of view
            # (viewed wall bands 2.4 m apart > the ~1.6 m FOV height), so
            # the ONLY revisit is the final descent into the start region —
            # abrupt, with the full circuit's accumulated drift, unlike the
            # circle's smooth wrap. Final ~10% dwells at the start pose so
            # the keyframe policy fires inside the revisited region.
            Lx, Ly = 3.2 * s, 2.4 * s
            legs = [0.30, 0.15, 0.30, 0.15]  # fractions: +x, +y, -x, -y
            period = max(int(0.9 * self.n_frames), 4)
            u = min(i, period) / period
            pts = [(0.0, 0.0), (Lx, 0.0), (Lx, Ly), (0.0, Ly), (0.0, 0.0)]
            tx, ty = pts[-1]
            acc = 0.0
            for leg, (p0, p1) in zip(legs, zip(pts[:-1], pts[1:])):
                if u <= acc + leg or leg == legs[-1]:
                    a = np.clip((u - acc) / leg, 0.0, 1.0)
                    a = a * a * (3 - 2 * a)  # smoothstep: ease the corners
                    tx = p0[0] + a * (p1[0] - p0[0])
                    ty = p0[1] + a * (p1[1] - p0[1])
                    break
                acc += leg
            T = np.eye(4)
            T[:3, 3] = [tx, ty, 0.03 * s * np.sin(7.0 * u)]
            return T
        tx = 0.25 * s * np.sin(0.9 * t)
        ty = 0.18 * s * np.sin(0.7 * t + 0.5)
        tz = 0.12 * s * np.sin(0.5 * t + 1.1)
        yaw = 0.04 * s * np.sin(0.6 * t)
        pitch = 0.03 * s * np.sin(0.45 * t + 0.7)
        cy_, sy = np.cos(yaw), np.sin(yaw)
        cp, sp = np.cos(pitch), np.sin(pitch)
        Ry = np.array([[cy_, 0, sy], [0, 1, 0], [-sy, 0, cy_]])
        Rx = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
        T = np.eye(4)
        T[:3, :3] = Ry @ Rx
        T[:3, 3] = [tx, ty, tz]
        return T

    def timestamp(self, i: int) -> float:
        return i / self.fps

    def frame(self, i: int):
        Twc = self.gt_pose_wc(i)
        R, c = Twc[:3, :3], Twc[:3, 3]
        d_world = self.ray @ R.T  # [H, W, 3]
        # background plane z = z_bg
        t_bg = (self.z_bg - c[2]) / d_world[..., 2]
        depth = t_bg.copy()
        wx = c[0] + t_bg * d_world[..., 0]
        wy = c[1] + t_bg * d_world[..., 1]
        # foreground patches (nearer planes override)
        for px, py, half, pz, ox, oy in self.patches:
            t_p = (pz - c[2]) / d_world[..., 2]
            x = c[0] + t_p * d_world[..., 0]
            y = c[1] + t_p * d_world[..., 1]
            hit = (np.abs(x - px) < half) & (np.abs(y - py) < half) & (t_p > 0.1) & (t_p < depth)
            depth = np.where(hit, t_p, depth)
            wx = np.where(hit, x + ox, wx)
            wy = np.where(hit, y + oy, wy)
        # sample texture bilinearly at world (x, y)
        size = self.tex.shape[0]
        fx_ = (wx * self.tex_scale) % (size - 1)
        fy_ = (wy * self.tex_scale) % (size - 1)
        x0 = fx_.astype(np.int64)
        y0 = fy_.astype(np.int64)
        ax, ay = (fx_ - x0).astype(np.float32), (fy_ - y0).astype(np.float32)
        t00 = self.tex[y0, x0]
        t01 = self.tex[y0, x0 + 1]
        t10 = self.tex[y0 + 1, x0]
        t11 = self.tex[y0 + 1, x0 + 1]
        gray = (1 - ay) * ((1 - ax) * t00 + ax * t01) + ay * ((1 - ax) * t10 + ax * t11)
        if self.depth_noise > 0:
            nrng = np.random.default_rng((self.seed + 1) * 100003 + i)
            cell = 40
            H, W = depth.shape
            field = nrng.normal(0.0, self.depth_noise,
                                (H // cell + 1, W // cell + 1))
            field = np.kron(field, np.ones((cell, cell)))[:H, :W]
            depth = depth * (1.0 + field)
        return gray.astype(np.float32), depth.astype(np.float32), self.timestamp(i)

    def gt_trajectory(self):
        """[(t, Twc)] for the evaluator."""
        return [(self.timestamp(i), self.gt_pose_wc(i)) for i in range(self.n_frames)]
