"""Per-frame feature container + builder.

Replaces the Frame RGBD ctor (src/Frame.cc ~150): ORB extraction,
UndistortKeyPoints (~430), ComputeStereoFromRGBD (~600: u_r = u - bf/d),
all as one jitted program. The reference's AssignFeaturesToGrid is
deliberately absent — windowed matching is a mask on the dense distance
matrix (see matching/points.py docstring).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from plslam_tpu import constants as C
from plslam_tpu.config import Settings
from plslam_tpu.features.orb import ORBExtractor
from plslam_tpu.geometry import camera
from plslam_tpu.ops import brief


class FrameData(NamedTuple):
    """Fixed-capacity per-frame observation data (all device arrays)."""

    uvr: jnp.ndarray  # f32[N, 3] undistorted (u, v, u_r); u_r = -1 if no depth
    uv_raw: jnp.ndarray  # f32[N, 2] raw (distorted) pixel coords
    depth: jnp.ndarray  # f32[N] depth (m), 0 where invalid
    octave: jnp.ndarray  # i32[N]
    angle: jnp.ndarray  # f32[N]
    desc: jnp.ndarray  # u8[N, 32]
    pm1: jnp.ndarray  # bf16[N, 256] +-1 unpacked bits (MXU matching)
    valid: jnp.ndarray  # bool[N]


class FrameBuilder:
    """gray/depth images -> FrameData. Static config, jitted once."""

    def __init__(self, settings: Settings, capacity: int = C.MAX_FEAT):
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

    @functools.cached_property
    def _jitted(self):
        return jax.jit(self._build)

    def __call__(self, gray, depth) -> FrameData:
        return self._jitted(gray, depth)

    def _build(self, gray, depth) -> FrameData:
        fs = self.extractor._extract(gray)
        uv_raw = fs.uv
        uv_und = (
            camera.undistort_pixels(self.K, self.dist, uv_raw)
            if self.has_dist
            else uv_raw
        )
        # depth lookup at the raw keypoint position (Frame::ComputeStereoFromRGBD
        # samples mImDepth at the detected, pre-undistortion coords)
        xi = jnp.clip(jnp.round(uv_raw[:, 0]).astype(jnp.int32), 0, depth.shape[1] - 1)
        yi = jnp.clip(jnp.round(uv_raw[:, 1]).astype(jnp.int32), 0, depth.shape[0] - 1)
        d = depth[yi, xi]
        d = jnp.where(fs.valid & (d > 0) & jnp.isfinite(d), d, 0.0)
        ur = jnp.where(d > 0, uv_und[:, 0] - self.bf / jnp.where(d > 0, d, 1.0), -1.0)
        uvr = jnp.concatenate([uv_und, ur[:, None]], -1)
        return FrameData(
            uvr=uvr,
            uv_raw=uv_raw,
            depth=d,
            octave=fs.octave,
            angle=fs.angle,
            desc=fs.desc,
            pm1=brief.unpack_bits_pm1(fs.desc),
            valid=fs.valid,
        )
