"""Sim3 (fixed-scale for RGB-D) estimation: batched Horn + RANSAC.

Replaces src/Sim3Solver.cc (~500 LoC: iterate ~120, ComputeSim3 ~200 Horn
closed form, CheckInliers ~280): given matched 3D landmark pairs between two
keyframes, estimate the relative similarity. RGB-D fixes scale to 1
(bFixScale=true), so this is closed-form rigid Horn alignment inside RANSAC.

TPU-native: ALL RANSAC hypotheses are evaluated in one batch — sample
n_hyp x 3 correspondence triples with a counter-based generator, solve Horn
per hypothesis via the quaternion eigen method (batched 4x4 symmetric
eigendecomposition), score every hypothesis against every correspondence by
bidirectional reprojection chi2 (one [H, N] computation), pick the best, and
refine on its inliers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from plslam_tpu import constants as C
from plslam_tpu.geometry import camera, se3
from plslam_tpu.utils.precision import mm


class Sim3Result(NamedTuple):
    R: jnp.ndarray  # f32[3, 3] rotation 1<-2
    t: jnp.ndarray  # f32[3]
    s: jnp.ndarray  # f32[] (1.0 when fix_scale)
    n_inliers: jnp.ndarray  # i32[]
    inliers: jnp.ndarray  # bool[N]
    ok: jnp.ndarray  # bool[]


def _horn(p1, p2, w, fix_scale: bool = True):
    """Weighted Horn alignment: find (R, t, s) with p1 ~= s R p2 + t.

    p1, p2: [..., N, 3]; w: [..., N] weights. Quaternion eigen method
    (Sim3Solver::ComputeSim3 ~200)."""
    wsum = jnp.clip(jnp.sum(w, -1, keepdims=True), 1e-6)
    c1 = jnp.sum(p1 * w[..., None], -2) / wsum
    c2 = jnp.sum(p2 * w[..., None], -2) / wsum
    q1 = p1 - c1[..., None, :]
    q2 = p2 - c2[..., None, :]
    M = jnp.einsum("...ni,...n,...nj->...ij", q1, w, q2)  # [..., 3, 3]
    Sxx, Sxy, Sxz = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    Syx, Syy, Syz = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    Szx, Szy, Szz = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    N = jnp.stack(
        [
            jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], -1),
            jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], -1),
            jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy], -1),
            jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz], -1),
        ],
        -2,
    )  # [..., 4, 4] symmetric
    evals, evecs = jnp.linalg.eigh(N)
    q = evecs[..., :, -1]  # max eigenvalue -> quaternion (w, x, y, z)
    # conjugate: this N convention yields the 1->2 rotation; we want 2->1
    quat_xyzw = jnp.stack([-q[..., 1], -q[..., 2], -q[..., 3], q[..., 0]], -1)
    R = se3.from_quat_xyzw(quat_xyzw, jnp.zeros_like(c1))[..., :3, :3]
    if fix_scale:
        s = jnp.ones(M.shape[:-2], M.dtype)
    else:
        rot_q2 = jnp.einsum("...ij,...nj->...ni", R, q2)
        s = jnp.sum(q1 * rot_q2 * w[..., None], (-2, -1)) / jnp.clip(
            jnp.sum(q2 * q2 * w[..., None], (-2, -1)), 1e-9
        )
    t = c1 - s[..., None] * jnp.einsum("...ij,...j->...i", R, c2)
    return R, t, s


def solve_sim3_ransac(
    x1,
    x2,
    valid,
    K,
    Tcw1,
    Tcw2,
    n_hyp: int = 256,
    chi2_th: float = 9.21,
    min_inliers: int = 20,
    fix_scale: bool = True,
    seed: int = 0,
):
    """x1/x2 f32[N, 3]: world positions of matched landmarks seen from KF1/KF2
    maps; valid bool[N]. Tcw1/Tcw2: the two keyframe poses (for the
    bidirectional reprojection inlier check, Sim3Solver::CheckInliers).

    Returns Sim3Result with (R, t, s) mapping CAMERA-2 coords to CAMERA-1:
    p_c1 = s R p_c2 + t. (The reference estimates in camera frames.)"""
    N = x1.shape[0]
    # to camera frames (the reference stores mvX3Dc1/mvX3Dc2)
    p1 = se3.transform(Tcw1, x1)
    p2 = se3.transform(Tcw2, x2)

    # counter-based hypothesis sampling (deterministic, batched)
    key = jax.random.PRNGKey(seed)
    idx = jax.random.randint(key, (n_hyp, 3), 0, jnp.maximum(jnp.sum(valid), 1))
    # map sampled ranks to valid correspondence indices
    order = jnp.argsort(~valid)  # valid first
    samp = order[idx]  # [H, 3]
    h1 = p1[samp]  # [H, 3, 3]
    h2 = p2[samp]
    w = jnp.ones((n_hyp, 3))
    R, t, s = _horn(h1, h2, w, fix_scale)  # batched [H, ...]

    # score all hypotheses: project p2 through (R, t, s) into cam1 and
    # compare against the observed projections of p1 (and vice versa)
    uv1_obs = camera.project(K, p1)  # [N, 2]
    uv2_obs = camera.project(K, p2)
    p2_in_1 = s[:, None, None] * jnp.einsum("hij,nj->hni", R, p2) + t[:, None, :]
    Rt = jnp.swapaxes(R, -1, -2)
    p1_in_2 = jnp.einsum("hij,hnj->hni", Rt, (p1[None] - t[:, None, :]) / s[:, None, None])
    uv12 = camera.project(K, p2_in_1)  # [H, N, 2]
    uv21 = camera.project(K, p1_in_2)
    e1 = jnp.sum((uv12 - uv1_obs[None]) ** 2, -1)
    e2 = jnp.sum((uv21 - uv2_obs[None]) ** 2, -1)
    inl = (e1 < chi2_th) & (e2 < chi2_th) & valid[None] & (p2_in_1[..., 2] > 0) & (
        p1_in_2[..., 2] > 0
    )
    counts = jnp.sum(inl, -1)
    best = jnp.argmax(counts)
    best_inl = inl[best]

    # refine on the winning inlier set (weighted Horn)
    Rr, tr, sr = _horn(p1, p2, best_inl.astype(jnp.float32), fix_scale)
    # recount inliers at the refined transform
    p2_in_1r = sr * mm(p2, Rr.T) + tr
    p1_in_2r = mm((p1 - tr) / sr, Rr)
    e1r = jnp.sum((camera.project(K, p2_in_1r) - uv1_obs) ** 2, -1)
    e2r = jnp.sum((camera.project(K, p1_in_2r) - uv2_obs) ** 2, -1)
    inl_r = (e1r < chi2_th) & (e2r < chi2_th) & valid & (p2_in_1r[:, 2] > 0) & (
        p1_in_2r[:, 2] > 0
    )
    n = jnp.sum(inl_r)
    return Sim3Result(
        R=Rr, t=tr, s=sr, n_inliers=n, inliers=inl_r, ok=n >= min_inliers
    )


def optimize_sim3(
    p1,
    p2,
    uv1,
    uv2,
    inv_s2_1,
    inv_s2_2,
    valid,
    K,
    R0,
    t0,
    s0,
    fix_scale: bool = True,
    chi2_th: float = C.CHI2_SIM3,
    iters: int = C.SIM3_OPT_ITERS,
):
    """LM refinement of a Sim3 with bidirectional reprojection edges
    (Optimizer::OptimizeSim3, src/Optimizer.cc ~1100):

      e1_i = uv1_i - pi(K, s R p2_i + t)        (observed in KF1's image)
      e2_i = uv2_i - pi(K, (1/s) R^T (p1_i - t))  (observed in KF2's image)

    p1/p2 f32[N,3] camera-frame positions of the matched landmark pair;
    uv1/uv2 f32[N,2] the matched features' undistorted keypoints;
    inv_s2_* per-feature octave information weights.

    Parametrized as a left-composed update exp([rho, nu, lam]) on
    (R, t, s) with lam frozen when fix_scale; Jacobians by jax.jacfwd over
    the 7 params (the reference's ~200-line hand Jacobian is autodiff here).
    Runs the reference schedule: `iters` LM steps, chi2 outlier pruning on
    BOTH directions, `iters` more on inliers. Returns
    (R, t, s, inliers bool[N], n_inliers)."""
    f32 = jnp.float32

    def apply_delta(d, R, t, s):
        dR = se3.exp(jnp.concatenate([jnp.zeros(3), d[:3]])[None])[0][:3, :3]
        s_new = s * jnp.exp(d[6]) if not fix_scale else s
        return mm(dR, R), t + d[3:6], s_new

    def residuals(d, R, t, s):
        R_, t_, s_ = apply_delta(d, R, t, s)
        q1 = s_ * mm(p2, R_.T) + t_  # p2 -> cam1
        q2 = mm(p1 - t_, R_) / s_  # p1 -> cam2 (R^T (p1 - t) / s)
        r1 = uv1 - camera.project(K, q1)
        r2 = uv2 - camera.project(K, q2)
        okz = (q1[:, 2] > 1e-3) & (q2[:, 2] > 1e-3)
        return r1, r2, okz

    def chi2_pair(d, R, t, s, active):
        r1, r2, okz = residuals(d, R, t, s)
        c1 = jnp.sum(r1 * r1, -1) * inv_s2_1
        c2 = jnp.sum(r2 * r2, -1) * inv_s2_2
        bad_z = ~okz
        return c1, c2, bad_z

    def cost_fn(d, R, t, s, active):
        c1, c2, bad_z = chi2_pair(d, R, t, s, active)
        # Huber rho on each directed edge (deltaHuber = sqrt(th2))
        def rho(c):
            return jnp.where(
                c <= chi2_th, c, 2.0 * jnp.sqrt(chi2_th * jnp.clip(c, 0.0)) - chi2_th
            )
        w = active & valid
        return jnp.sum(jnp.where(w, rho(c1) + rho(c2), 0.0)) + 1e7 * jnp.sum(
            w & bad_z
        )

    n_par = 7

    def lm_phase(R, t, s, active, n_iters):
        def system(R, t, s):
            def rvec(d):
                r1, r2, _ = residuals(d, R, t, s)
                return jnp.concatenate([r1, r2], 0)  # [2N, 2]

            J = jax.jacfwd(rvec)(jnp.zeros(n_par, f32))  # [2N, 2, 7]
            r0 = rvec(jnp.zeros(n_par, f32))
            c1, c2, bad_z = chi2_pair(jnp.zeros(n_par, f32), R, t, s, active)
            cc = jnp.concatenate([c1, c2])
            hub = jnp.where(
                cc <= chi2_th, 1.0, jnp.sqrt(chi2_th / jnp.clip(cc, 1e-12))
            )
            wbase = jnp.concatenate([inv_s2_1, inv_s2_2])
            act = jnp.concatenate([active & valid & ~bad_z] * 2)
            w = jnp.where(act, wbase * hub, 0.0)
            H = jnp.einsum("eai,e,eaj->ij", J, w, J)
            g = -jnp.einsum("eai,e,ea->i", J, w, r0)
            return H, g

        def body(_, carry):
            R, t, s, lam, nu, cost = carry
            H, g = system(R, t, s)
            Hd = H + lam * jnp.eye(n_par)
            if fix_scale:  # freeze the scale row/col
                Hd = Hd.at[6, :].set(0.0).at[:, 6].set(0.0).at[6, 6].set(1.0)
                g = g.at[6].set(0.0)
            d = jnp.linalg.solve(Hd, g)
            R_n, t_n, s_n = apply_delta(d, R, t, s)
            new_cost = cost_fn(jnp.zeros(n_par, f32), R_n, t_n, s_n, active)
            accept = (new_cost < cost) & jnp.all(jnp.isfinite(d))
            R = jnp.where(accept, R_n, R)
            t = jnp.where(accept, t_n, t)
            s = jnp.where(accept, s_n, s)
            cost = jnp.where(accept, new_cost, cost)
            lam = jnp.where(accept, lam / 3.0, lam * nu)
            nu = jnp.where(accept, 2.0, nu * 2.0)
            return R, t, s, lam, nu, cost

        cost0 = cost_fn(jnp.zeros(n_par, f32), R, t, s, active)
        H0, _ = system(R, t, s)
        lam0 = 1e-5 * jnp.max(jnp.abs(jnp.diag(H0)))
        R, t, s, _, _, _ = jax.lax.fori_loop(
            0, n_iters, body, (R, t, s, lam0, jnp.float32(2.0), cost0)
        )
        return R, t, s

    active = jnp.ones_like(valid)
    R, t, s = lm_phase(R0, t0, s0, active, iters)
    # outlier pruning: drop the PAIR if either directed edge fails chi2
    c1, c2, bad_z = chi2_pair(jnp.zeros(n_par, f32), R, t, s, active)
    active = valid & (c1 <= chi2_th) & (c2 <= chi2_th) & ~bad_z
    R, t, s = lm_phase(R, t, s, active, iters)
    c1, c2, bad_z = chi2_pair(jnp.zeros(n_par, f32), R, t, s, active)
    inl = valid & (c1 <= chi2_th) & (c2 <= chi2_th) & ~bad_z
    return R, t, s, inl, jnp.sum(inl)
