"""Pinhole camera model: projection, undistortion, depth backprojection.

Replaces the reference's per-point OpenCV calls:
  * Frame::UndistortKeyPoints (src/Frame.cc ~430, cv::undistortPoints)
  * Frame::ComputeStereoFromRGBD (src/Frame.cc ~600: u_r = u - bf/d)
  * Frame::UnprojectStereo (src/Frame.cc ~640: (u,v,d) -> world xyz)
All functions are batched over leading dims and jit-safe.

Distortion model is OpenCV's radial-tangential (k1,k2,p1,p2,k3).
Undistortion inverts it with a fixed-iteration Newton/fixed-point loop
(cv::undistortPoints uses 5 fixed-point iterations; we use 8).
"""

from __future__ import annotations

import jax.numpy as jnp


def project(K, p_cam):
    """Points in camera frame [..., 3] -> pixel coords [..., 2] (no distortion;
    the reference matches/optimizes in undistorted pixel space)."""
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    z = p_cam[..., 2]
    zi = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = fx * p_cam[..., 0] * zi + cx
    v = fy * p_cam[..., 1] * zi + cy
    return jnp.stack([u, v], -1)


def project_stereo(K, bf, p_cam):
    """-> [..., 3] = (u, v, u_r) with u_r = u - bf/z (virtual right camera,
    Frame::ComputeStereoFromRGBD)."""
    uv = project(K, p_cam)
    z = jnp.where(jnp.abs(p_cam[..., 2]) < 1e-9, 1e-9, p_cam[..., 2])
    ur = uv[..., 0] - bf / z
    return jnp.concatenate([uv, ur[..., None]], -1)


def distort_normalized(dist, xn):
    """Apply radial-tangential distortion to normalized coords [..., 2]."""
    k1, k2, p1, p2, k3 = dist[..., 0], dist[..., 1], dist[..., 2], dist[..., 3], dist[..., 4]
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], -1)


def undistort_pixels(K, dist, uv, iters: int = 8):
    """Distorted pixel coords -> undistorted pixel coords (same K).
    Matches cv::undistortPoints(..., P=K) semantics used by
    Frame::UndistortKeyPoints."""
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    xd = jnp.stack([(uv[..., 0] - cx) / fx, (uv[..., 1] - cy) / fy], -1)
    x = xd
    for _ in range(iters):  # fixed-point: x <- xd - distortion_residual(x)
        delta = distort_normalized(dist, x) - x
        x = xd - delta
    u = fx * x[..., 0] + cx
    v = fy * x[..., 1] + cy
    return jnp.stack([u, v], -1)


def backproject(K, uv, depth):
    """(u, v) pixels [..., 2] + depth [...] -> camera-frame 3D [..., 3]
    (Frame::UnprojectStereo without the world transform)."""
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    x = (uv[..., 0] - cx) / fx * depth
    y = (uv[..., 1] - cy) / fy * depth
    return jnp.stack([x, y, depth], -1)


def in_image(uv, width, height, margin=0.0):
    return (
        (uv[..., 0] >= margin)
        & (uv[..., 0] < width - margin)
        & (uv[..., 1] >= margin)
        & (uv[..., 1] < height - margin)
    )
