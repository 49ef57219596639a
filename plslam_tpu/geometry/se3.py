"""SE(3) on 4x4 homogeneous matrices + se(3) exp/log.

TPU-native replacement for g2o::SE3Quat (Thirdparty/g2o/g2o/types/se3quat.h)
and src/Converter.cc. Poses are float32 [..., 4, 4] matrices `Tcw`
(world->camera, the reference's convention in Frame::mTcw). Twists are
[..., 6] = (rho, phi) = (translation part, rotation part), matching g2o's
exp/log ordering for SE3Quat (upsilon, omega).

Everything broadcasts over leading batch dims and is jit/vmap-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

from plslam_tpu.utils.precision import mm

_EPS = 1e-8


def hat(phi):
    """so(3) hat: [..., 3] -> [..., 3, 3] skew-symmetric."""
    x, y, z = phi[..., 0], phi[..., 1], phi[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], -1),
            jnp.stack([z, zero, -x], -1),
            jnp.stack([-y, x, zero], -1),
        ],
        -2,
    )


_SMALL_THETA2 = 1e-3  # f32: below theta ~ 0.03, 1-cos / t-sin cancel catastrophically


def _so3_coeffs(theta2):
    """Taylor-safe (A, B, C) = (sin t / t, (1-cos t)/t^2, (t - sin t)/t^3).

    The series cutoff is theta^2 < 1e-3, NOT machine-eps-sized: in float32
    the closed forms lose all precision well before that (1 - cos(1e-4) == 0
    in f32), which silently corrupts V / V^-1 in exp/log."""
    small = theta2 < _SMALL_THETA2
    t2 = jnp.where(small, 1.0, theta2)  # keep sqrt/divisions well-conditioned
    theta = jnp.sqrt(t2)
    A = jnp.where(small, 1.0 - theta2 / 6.0 + theta2 * theta2 / 120.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0 + theta2 * theta2 / 720.0, (1.0 - jnp.cos(theta)) / t2)
    C = jnp.where(
        small,
        1.0 / 6.0 - theta2 / 120.0 + theta2 * theta2 / 5040.0,
        (theta - jnp.sin(theta)) / (t2 * theta),
    )
    return A, B, C


def so3_exp(phi):
    """Rodrigues: [..., 3] -> [..., 3, 3]."""
    theta2 = jnp.sum(phi * phi, -1)
    A, B, _ = _so3_coeffs(theta2)
    K = hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return I + A[..., None, None] * K + B[..., None, None] * mm(K, K)


def so3_log(R):
    """[..., 3, 3] -> [..., 3]. Goes through the (shepperd-selected)
    quaternion, which is uniformly stable for all angles in [0, pi]."""
    q = to_quat_xyzw(R)  # canonical w >= 0 -> theta in [0, pi]
    xyz, w = q[..., :3], q[..., 3]
    n = jnp.linalg.norm(xyz, axis=-1)
    theta = 2.0 * jnp.arctan2(n, w)
    # rotvec = xyz * theta / n; as n -> 0, theta/n -> 2/w
    scale = jnp.where(n > 1e-7, theta / (n + _EPS), 2.0 / jnp.clip(w, 0.5, None))
    return xyz * scale[..., None]


def exp(xi):
    """se(3) exp: twist [..., 6] = (rho, phi) -> [..., 4, 4]."""
    rho, phi = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(phi * phi, -1)
    A, B, Cc = _so3_coeffs(theta2)
    K = hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    R = I + A[..., None, None] * K + B[..., None, None] * mm(K, K)
    V = I + B[..., None, None] * K + Cc[..., None, None] * mm(K, K)
    t = mm(V, rho[..., None])[..., 0]
    return from_rt(R, t)


def log(T):
    """[..., 4, 4] -> twist [..., 6] = (rho, phi)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    phi = so3_log(R)
    theta2 = jnp.sum(phi * phi, -1)
    A, B, _ = _so3_coeffs(theta2)
    K = hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), K.shape)
    # V^{-1} = I - K/2 + (1/theta^2)(1 - A/(2B)) K^2
    coef = jnp.where(
        theta2 < _SMALL_THETA2,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - A / (2.0 * B + _EPS)) / jnp.where(theta2 < _SMALL_THETA2, 1.0, theta2),
    )
    Vinv = I - 0.5 * K + coef[..., None, None] * mm(K, K)
    rho = mm(Vinv, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], -1)


def from_rt(R, t):
    """[..., 3, 3], [..., 3] -> [..., 4, 4]."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., None]], -1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], -2)


def identity(batch=(), dtype=jnp.float32):
    return jnp.broadcast_to(jnp.eye(4, dtype=dtype), tuple(batch) + (4, 4))


def inverse(T):
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return from_rt(Rt, -mm(Rt, t[..., None])[..., 0])


def compose(A, B):
    return mm(A, B)


def transform(T, p):
    """Apply [..., 4, 4] to points [..., N, 3] (or [..., 3]).

    Elementwise expansion, NOT a matmul: [N, 3] x [3, 3] matmuls at HIGHEST
    precision lower to thousands of padded MXU passes on TPU (measured ~3 ms
    for N=32768); nine VPU multiplies are ~microseconds and exact."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    if p.ndim >= 2 and p.shape[-1] == 3 and p.ndim - 1 >= T.ndim - 2:
        R_ = R[..., None, :, :]  # broadcast over the point axis
        t_ = t[..., None, :]
    else:
        R_, t_ = R, t
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    return jnp.stack(
        [
            R_[..., 0, 0] * x + R_[..., 0, 1] * y + R_[..., 0, 2] * z + t_[..., 0],
            R_[..., 1, 0] * x + R_[..., 1, 1] * y + R_[..., 1, 2] * z + t_[..., 1],
            R_[..., 2, 0] * x + R_[..., 2, 1] * y + R_[..., 2, 2] * z + t_[..., 2],
        ],
        -1,
    )


def rotation(T):
    return T[..., :3, :3]


def translation(T):
    return T[..., :3, 3]


def to_quat_xyzw(R):
    """Rotation matrix -> quaternion (x, y, z, w), TUM trajectory order
    (System::SaveTrajectoryTUM writes qx qy qz qw)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions, pick numerically best
    qw0 = jnp.sqrt(jnp.clip(1.0 + tr, _EPS, None)) * 0.5
    q0 = jnp.stack([(m21 - m12), (m02 - m20), (m10 - m01), 4.0 * qw0 * qw0], -1) / (4.0 * qw0[..., None])
    qx1 = jnp.sqrt(jnp.clip(1.0 + m00 - m11 - m22, _EPS, None)) * 0.5
    q1 = jnp.stack([4.0 * qx1 * qx1, (m01 + m10), (m02 + m20), (m21 - m12)], -1) / (4.0 * qx1[..., None])
    qy2 = jnp.sqrt(jnp.clip(1.0 - m00 + m11 - m22, _EPS, None)) * 0.5
    q2 = jnp.stack([(m01 + m10), 4.0 * qy2 * qy2, (m12 + m21), (m02 - m20)], -1) / (4.0 * qy2[..., None])
    qz3 = jnp.sqrt(jnp.clip(1.0 - m00 - m11 + m22, _EPS, None)) * 0.5
    q3 = jnp.stack([(m02 + m20), (m12 + m21), 4.0 * qz3 * qz3, (m10 - m01)], -1) / (4.0 * qz3[..., None])
    cands = jnp.stack([q0, q1, q2, q3], -2)  # [..., 4, 4]
    scores = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], -1)
    k = jnp.argmax(scores, -1)
    q = jnp.take_along_axis(cands, k[..., None, None].repeat(4, -1), -2)[..., 0, :]
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + _EPS)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)


def from_quat_xyzw(q, t):
    """Quaternion (x,y,z,w) + translation -> [..., 4, 4]."""
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + _EPS)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
        ],
        -2,
    )
    return from_rt(R, t)
