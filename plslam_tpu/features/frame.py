"""Per-frame feature container + builder (points AND lines).

Replaces the Frame RGBD ctor (src/Frame.cc ~150): ORB extraction,
UndistortKeyPoints (~430), ComputeStereoFromRGBD (~600: u_r = u - bf/d),
line-endpoint undistortion + depth lookup, all as one jitted program. The
reference runs point and line extraction in two std::threads (Frame ctor);
here both are stages of the same XLA dispatch — except LSD segment DETECTION,
which is host-side (see ops/lsd.py) and feeds fixed-capacity endpoint arrays
into the jitted builder.

The reference's AssignFeaturesToGrid is deliberately absent — windowed
matching is a mask on the dense distance matrix (see matching/points.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from plslam_tpu import constants as C
from plslam_tpu.config import Settings
from plslam_tpu.features.orb import ORBExtractor
from plslam_tpu.geometry import camera
from plslam_tpu.ops import brief, lbd, lsd


class FrameData(NamedTuple):
    """Fixed-capacity per-frame observation data (all device arrays)."""

    # points
    uvr: jnp.ndarray  # f32[N, 3] undistorted (u, v, u_r); u_r = -1 if no depth
    uv_raw: jnp.ndarray  # f32[N, 2] raw (distorted) pixel coords
    depth: jnp.ndarray  # f32[N] depth (m), 0 where invalid
    octave: jnp.ndarray  # i32[N]
    angle: jnp.ndarray  # f32[N]
    desc: jnp.ndarray  # u8[N, 32]
    pm1: jnp.ndarray  # bf16[N, 256] +-1 unpacked bits (MXU matching)
    valid: jnp.ndarray  # bool[N]
    # lines (LSD segments + LBD descriptors)
    ln_sp: jnp.ndarray  # f32[L, 2] undistorted start endpoint
    ln_ep: jnp.ndarray  # f32[L, 2] undistorted end endpoint
    ln_line2d: jnp.ndarray  # f32[L, 3] normalized 2D line (a, b, c)
    ln_angle: jnp.ndarray  # f32[L] segment orientation
    ln_depth_sp: jnp.ndarray  # f32[L] endpoint depths (0 invalid)
    ln_depth_ep: jnp.ndarray  # f32[L]
    ln_desc: jnp.ndarray  # u8[L, 32] LBD
    ln_pm1: jnp.ndarray  # bf16[L, 256]
    ln_valid: jnp.ndarray  # bool[L]


class FrameBuilder:
    """gray/depth images (+ host-detected line endpoints) -> FrameData."""

    def __init__(
        self,
        settings: Settings,
        capacity: int = C.MAX_FEAT,
        line_capacity: int = C.MAX_LINES,
    ):
        self.s = settings
        self.extractor = ORBExtractor(
            settings.height,
            settings.width,
            n_features=settings.n_features,
            scale_factor=settings.scale_factor,
            n_levels=settings.n_levels,
            ini_th_fast=settings.ini_th_fast,
            min_th_fast=settings.min_th_fast,
            capacity=capacity,
        )
        K, dist = settings.intrinsics()
        self.K = jnp.asarray(K)
        self.dist = jnp.asarray(dist)
        self.has_dist = bool((dist != 0).any())
        self.bf = float(settings.bf)
        self.line_capacity = line_capacity
        self.use_lines = settings.use_lines
        # "device": LSD runs INSIDE the jitted builder (ops/lsd_device.py) —
        # the host endpoint inputs are ignored and detect_lines() returns
        # empties. "host": reference architecture (C++ LSD on the host).
        self.device_lines = (
            settings.use_lines and getattr(settings, "line_backend", "device") == "device"
        )

    @functools.cached_property
    def _jitted(self):
        return jax.jit(self._build)

    def detect_lines(self, gray_np: np.ndarray):
        """Host LSD -> fixed-capacity endpoint arrays (ops/lsd.py). With the
        device backend the jitted builder detects its own lines and this
        returns empties (kept so callers are backend-agnostic)."""
        if not self.use_lines or self.device_lines:
            L = self.line_capacity
            return (
                np.zeros((L, 2), np.float32),
                np.zeros((L, 2), np.float32),
                np.zeros(L, bool),
            )
        return lsd.detect_lines_host(gray_np, self.line_capacity)

    def empty_lines(self):
        L = self.line_capacity
        return (
            jnp.zeros((L, 2), jnp.float32),
            jnp.zeros((L, 2), jnp.float32),
            jnp.zeros(L, bool),
        )

    def __call__(self, gray, depth, ln_sp=None, ln_ep=None, ln_valid=None) -> FrameData:
        if ln_sp is None:
            ln_sp, ln_ep, ln_valid = self.empty_lines()
        return self._jitted(
            gray, depth, jnp.asarray(ln_sp), jnp.asarray(ln_ep), jnp.asarray(ln_valid)
        )

    def _undistort(self, uv):
        return camera.undistort_pixels(self.K, self.dist, uv) if self.has_dist else uv

    def _depth_at(self, depth, uv, valid):
        xi = jnp.clip(jnp.round(uv[..., 0]).astype(jnp.int32), 0, depth.shape[1] - 1)
        yi = jnp.clip(jnp.round(uv[..., 1]).astype(jnp.int32), 0, depth.shape[0] - 1)
        # flat 1D gather (a [N] 2D advanced-index gather lowers poorly here)
        d = depth.reshape(-1)[yi * depth.shape[1] + xi]
        return jnp.where(valid & (d > 0) & jnp.isfinite(d), d, 0.0)

    def _build(self, gray, depth, ln_sp_raw, ln_ep_raw, ln_valid) -> FrameData:
        if self.device_lines:
            # LSD fused into the frame program: intra-frame points ∥ lines
            # in ONE dispatch (the reference needs two pthreads in the Frame
            # ctor, src/Frame.cc ~150; SURVEY.md §3.3 intra-frame row)
            from plslam_tpu.ops import lsd_device

            ln_sp_raw, ln_ep_raw, ln_valid = lsd_device.detect_lines_device(
                gray, self.line_capacity
            )
        fs = self.extractor._extract(gray)
        uv_raw = fs.uv
        # invalid (padded) slots carry arbitrary coords; the fixed-point
        # undistortion DIVERGES on far-out-of-image inputs (freiburg1 k2/k3)
        # and the resulting NaN uvr rows poison every downstream 0*NaN
        # reduction (measured: pose LM's b vector went NaN, every step was
        # rejected, tracking froze at the init pose in config-1) — undistort
        # a zeroed stand-in instead
        uv_und = self._undistort(jnp.where(fs.valid[:, None], uv_raw, 0.0))
        # depth lookup at the raw keypoint position (Frame::ComputeStereoFromRGBD
        # samples mImDepth at the detected, pre-undistortion coords)
        d = self._depth_at(depth, uv_raw, fs.valid)
        ur = jnp.where(d > 0, uv_und[:, 0] - self.bf / jnp.where(d > 0, d, 1.0), -1.0)
        uvr = jnp.concatenate([uv_und, ur[:, None]], -1)

        # ---- lines: LBD on device, endpoint undistortion + depth ----
        gx, gy = lbd.image_gradients(gray)
        ln_desc = lbd.lbd_descriptor(gx, gy, ln_sp_raw, ln_ep_raw, ln_valid)
        sp_und = self._undistort(jnp.where(ln_valid[:, None], ln_sp_raw, 0.0))
        ep_und = self._undistort(jnp.where(ln_valid[:, None], ln_ep_raw, 1.0))
        seg = ep_und - sp_und
        ln_angle = jnp.arctan2(seg[:, 1], seg[:, 0])
        # 2D line equation from undistorted endpoints, sqrt(a^2+b^2)=1
        l = jnp.cross(
            jnp.concatenate([sp_und, jnp.ones((sp_und.shape[0], 1))], -1),
            jnp.concatenate([ep_und, jnp.ones((ep_und.shape[0], 1))], -1),
        )
        l = l / jnp.clip(jnp.linalg.norm(l[:, :2], axis=-1, keepdims=True), 1e-6)
        d_sp = self._depth_at(depth, ln_sp_raw, ln_valid)
        d_ep = self._depth_at(depth, ln_ep_raw, ln_valid)

        return FrameData(
            uvr=uvr,
            uv_raw=uv_raw,
            depth=d,
            octave=fs.octave,
            angle=fs.angle,
            desc=fs.desc,
            pm1=brief.unpack_bits_pm1(fs.desc),
            valid=fs.valid,
            ln_sp=sp_und,
            ln_ep=ep_und,
            ln_line2d=l,
            ln_angle=ln_angle,
            ln_depth_sp=d_sp,
            ln_depth_ep=d_ep,
            ln_desc=ln_desc,
            ln_pm1=brief.unpack_bits_pm1(ln_desc),
            ln_valid=ln_valid,
        )
