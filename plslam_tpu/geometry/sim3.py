"""Sim(3) similarity transforms for loop closing.

Replacement for g2o::Sim3 (Thirdparty/g2o/g2o/types/sim3.h), used by the
reference's Sim3Solver, OptimizeSim3, and OptimizeEssentialGraph
(src/Optimizer.cc ~900-1100). A Sim3 is carried as a tuple
(R [...,3,3], t [...,3], s [...]); twists are [..., 7] = (rho, phi, sigma).

Action: S(p) = s * R @ p + t.

exp uses W = integral_0^1 e^{sigma u} R(u theta) du in closed form
(= C I + A K + B K^2 with the coefficients below), with Taylor series for
the small-theta / small-sigma corners.
"""

from __future__ import annotations

import jax.numpy as jnp

from plslam_tpu.utils.precision import mm

from plslam_tpu.geometry import se3

_EPS = 1e-8


def identity(batch=(), dtype=jnp.float32):
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), tuple(batch) + (3, 3))
    t = jnp.zeros(tuple(batch) + (3,), dtype)
    s = jnp.ones(tuple(batch), dtype)
    return R, t, s


def from_se3(T, s=None):
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    if s is None:
        s = jnp.ones(T.shape[:-2], T.dtype)
    return R, t, s


def to_se3(S):
    """Fold scale into translation to get SE3 (the reference divides
    translation by scale when mapping Sim3 back after essential-graph opt:
    src/Optimizer.cc §OptimizeEssentialGraph tail)."""
    R, t, s = S
    return se3.from_rt(R, t / s[..., None])


def apply(S, p):
    R, t, s = S
    if p.ndim >= 2 and p.shape[-1] == 3 and p.ndim - 1 >= R.ndim - 2:
        return s[..., None, None] * (mm(p, jnp.swapaxes(R, -1, -2))) + t[..., None, :]
    return s[..., None] * mm(R, p[..., None])[..., 0] + t


def compose(A, B):
    """A after B: S_A(S_B(x))."""
    RA, tA, sA = A
    RB, tB, sB = B
    R = mm(RA, RB)
    t = sA[..., None] * mm(RA, tB[..., None])[..., 0] + tA
    s = sA * sB
    return R, t, s


def inverse(S):
    R, t, s = S
    Rt = jnp.swapaxes(R, -1, -2)
    sinv = 1.0 / s
    return Rt, -sinv[..., None] * mm(Rt, t[..., None])[..., 0], sinv


def _W_coeffs(theta2, sigma, s):
    """Coefficients (C, A, B) of W = C I + A K + B K^2.

    f32-safe: series cutoffs are sized for float32 cancellation (theta below
    ~0.03, |sigma| below 0.25 for the B_t0/A_t0 forms whose closed forms
    cancel to O(sigma^3))."""
    small_t = theta2 < 1e-3
    small_s = jnp.abs(sigma) < 0.25
    sig = jnp.where(small_s, jnp.ones_like(sigma), sigma)
    th = jnp.where(small_t, jnp.ones_like(jnp.asarray(theta2)), jnp.sqrt(jnp.where(small_t, 1.0, theta2)))

    # C = (s - 1)/sigma = int_0^1 e^{sigma u} du
    C = jnp.where(
        small_s,
        1.0 + sigma / 2.0 + sigma**2 / 6.0 + sigma**3 / 24.0,
        (s - 1.0) / sig,
    )

    # General form (theta not small): smooth in sigma, including sigma = 0.
    a = s * jnp.sin(th)
    b = s * jnp.cos(th)
    c2 = th * th + sigma * sigma
    A_gen = (a * sigma + (1.0 - b) * th) / (th * c2)
    B_gen = (C - ((b - 1.0) * sigma + a * th) / c2) / (th * th)
    # theta -> 0: A = int u e^{su}, B = (1/2) int u^2 e^{su}; closed forms
    # cancel at O(sigma^2)/O(sigma^3) so use series for small |sigma|
    A_t0 = jnp.where(
        small_s,
        0.5 + sigma / 3.0 + sigma**2 / 8.0 + sigma**3 / 30.0,
        (s * (sig - 1.0) + 1.0) / (sig * sig),
    )
    B_t0 = jnp.where(
        small_s,
        1.0 / 6.0 + sigma / 8.0 + sigma**2 / 20.0 + sigma**3 / 72.0,
        (s * (sig * sig - 2.0 * sig + 2.0) - 2.0) / (2.0 * sig * sig * sig),
    )

    A = jnp.where(small_t, A_t0, A_gen)
    B = jnp.where(small_t, B_t0, B_gen)
    return C, A, B


def exp(xi):
    """[..., 7] = (rho, phi, sigma) -> Sim3."""
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = se3.so3_exp(phi)
    theta2 = jnp.sum(phi * phi, -1)
    K = se3.hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    C, A, B = _W_coeffs(theta2, sigma, s)
    W = C[..., None, None] * I + A[..., None, None] * K + B[..., None, None] * mm(K, K)
    t = mm(W, rho[..., None])[..., 0]
    return R, t, s


def log(S):
    """Sim3 -> [..., 7]: invert exp by solving W rho = t."""
    R, t, s = S
    phi = se3.so3_log(R)
    sigma = jnp.log(s)
    theta2 = jnp.sum(phi * phi, -1)
    K = se3.hat(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=t.dtype), K.shape)
    C, A, B = _W_coeffs(theta2, sigma, s)
    W = C[..., None, None] * I + A[..., None, None] * K + B[..., None, None] * mm(K, K)
    rho = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], -1)


def stack(Ss):
    Rs, ts, ss = zip(*Ss)
    return jnp.stack(Rs), jnp.stack(ts), jnp.stack(ss)
