"""Two-view triangulation + epipolar matching (CreateNewMapPoints).

Replaces LocalMapping::CreateNewMapPoints (~250) and
ORBmatcher::SearchForTriangulation (~640): features of the new keyframe that
have NO depth measurement (beyond sensor range) are matched against a
covisible keyframe under the epipolar constraint and triangulated, so far
structure still becomes landmarks. (Close features are already backprojected
from depth at insertion, like the reference's CreateNewKeyFrame.)

All pair candidates are gated by |x2^T F21 x1| (point-to-epiline distance)
inside the dense MXU matching matrix; triangulation is the batched midpoint
/ DLT closed form; acceptance replicates the reference's checks: positive
depth in both views, reprojection chi2 within 5.991 * sigma^2, and finite
parallax.
"""

from __future__ import annotations

import jax.numpy as jnp

from plslam_tpu import constants as C
from plslam_tpu.geometry import se3
from plslam_tpu.utils.precision import mm


def fundamental_from_poses(Tcw1, Tcw2, K):
    """F21 such that x2^T F21 x1 = 0 for projections x of one world point."""
    T12 = se3.compose(Tcw1, se3.inverse(Tcw2))  # cam1 <- cam2
    T21 = se3.inverse(T12)  # cam2 <- cam1
    R21 = T21[:3, :3]
    t21 = T21[:3, 3]
    E21 = mm(se3.hat(t21), R21)
    Kinv = jnp.linalg.inv(K)
    return mm(Kinv.T, mm(E21, Kinv))


def epipolar_distance(uv1, uv2, F21):
    """[N1, 2] x [N2, 2] -> |dist of x2 to epiline F21 x1| matrix [N1, N2]."""
    ones1 = jnp.ones((uv1.shape[0], 1), uv1.dtype)
    x1 = jnp.concatenate([uv1, ones1], -1)  # [N1, 3]
    lines = mm(x1, F21.T)  # [N1, 3] epilines in image 2
    norm = jnp.sqrt(lines[:, 0] ** 2 + lines[:, 1] ** 2) + 1e-9
    ones2 = jnp.ones((uv2.shape[0], 1), uv2.dtype)
    x2 = jnp.concatenate([uv2, ones2], -1)
    return jnp.abs(mm(lines, x2.T)) / norm[:, None]  # [N1, N2]


def triangulate_midpoint(Tcw1, Tcw2, K, uv1, uv2):
    """Batched two-view midpoint triangulation -> world points [N, 3].

    Rays r_i from camera centers c_i; solve the 2x2 least-squares for the
    closest points along each ray, return the midpoint (closed form — no
    per-point SVD, TPU-friendly)."""
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]

    def ray(Tcw, uv):
        Twc = se3.inverse(Tcw)
        d_cam = jnp.stack(
            [(uv[:, 0] - cx) / fx, (uv[:, 1] - cy) / fy, jnp.ones(uv.shape[0])], -1
        )
        R = Twc[:3, :3]
        d = se3.transform(se3.from_rt(R, jnp.zeros(3)), d_cam)
        return Twc[:3, 3], d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    c1, d1 = ray(Tcw1, uv1)
    c2, d2 = ray(Tcw2, uv2)
    b = c2 - c1
    d11 = jnp.sum(d1 * d1, -1)
    d22 = jnp.sum(d2 * d2, -1)
    d12 = jnp.sum(d1 * d2, -1)
    denom = d11 * d22 - d12 * d12
    denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    t1 = (jnp.sum(b * d1, -1) * d22 - jnp.sum(b * d2, -1) * d12) / denom
    t2 = (jnp.sum(b * d1, -1) * d12 - jnp.sum(b * d2, -1) * d11) / denom
    p1 = c1 + t1[:, None] * d1
    p2 = c2 + t2[:, None] * d2
    parallax_cos = jnp.clip(d12 / jnp.sqrt(d11 * d22), -1.0, 1.0)
    return 0.5 * (p1 + p2), parallax_cos


def triangulation_checks(Tcw1, Tcw2, K, uv1, uv2, pw, parallax_cos, inv_sigma2_1, inv_sigma2_2):
    """Reference acceptance tests (CreateNewMapPoints tail): positive depth
    both views, reprojection chi2 < 5.991/invSigma2, real parallax."""
    from plslam_tpu.geometry import camera

    ok = parallax_cos < 0.9998  # ~1 degree of parallax minimum
    for Tcw, uv, is2 in ((Tcw1, uv1, inv_sigma2_1), (Tcw2, uv2, inv_sigma2_2)):
        pc = se3.transform(Tcw, pw)
        ok &= pc[:, 2] > 0.05
        proj = camera.project(K, pc)
        chi2 = jnp.sum((proj - uv) ** 2, -1) * is2
        ok &= chi2 < C.CHI2_MONO
    return ok
