"""Motion-only pose optimization: batched Levenberg-Marquardt over point AND
line reprojection errors.

Replaces Optimizer::PoseOptimization (src/Optimizer.cc ~250): g2o graph with
one VertexSE3Expmap + unary EdgeStereoSE3ProjectXYZOnlyPose /
EdgeSE3ProjectXYZOnlyPose / EdgeLineProjectXYZOnlyPose edges, 4 rounds x 10 LM
iterations, chi2 outlier re-classification between rounds, Huber kernel off in
the last round. Here the whole solve is one jitted computation: residuals and
closed-form Jacobians are batched over the fixed-capacity observation arrays,
H (6x6) and b are masked reductions, and the LM loop is a fori_loop with
g2o-style damping (tau = 1e-5 on max diag, accept/reject with ni-doubling).

Point residual (stereo, 3-dof): obs (u, v, u_r) - (pi(P), u - bf/Z) with
info invSigma2(octave) * I, Huber sqrt(7.815); mono (2-dof) drops the u_r row
(Huber sqrt(5.991)). Line residual (2-dof): (l . pih(P_sp), l . pih(P_ep))
for the observed normalized 2D line l = (a, b, c) (SURVEY.md §9).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from plslam_tpu import constants as C
from plslam_tpu.geometry import se3
from plslam_tpu.utils.precision import mm

_TAU = 1e-5  # g2o OptimizationAlgorithmLevenberg initial lambda factor


class PointObs(NamedTuple):
    """Fixed-capacity point observations for a pose solve. [N] leading dim."""

    xw: jnp.ndarray  # f32[N, 3] landmark world position
    obs: jnp.ndarray  # f32[N, 3] (u, v, u_r); u_r only used when is_stereo
    inv_sigma2: jnp.ndarray  # f32[N]
    is_stereo: jnp.ndarray  # bool[N]
    valid: jnp.ndarray  # bool[N]


class LineObs(NamedTuple):
    """Fixed-capacity line observations. [L] leading dim."""

    sw: jnp.ndarray  # f32[L, 3] start-point world position
    ew: jnp.ndarray  # f32[L, 3] end-point world position
    line2d: jnp.ndarray  # f32[L, 3] observed 2D line (a, b, c), a^2+b^2 = 1
    inv_sigma2: jnp.ndarray  # f32[L]
    valid: jnp.ndarray  # bool[L]


def _rot_cols(A, X, Y, Z):
    """Elementwise A @ hat(P) for a row A [N, 3] of d(pred)/dP.

    TPU note: batched [N, 3, 3] @ [N, 3, 6] matmuls lower to N separate
    padded MXU ops (~30 ms for N=1024!); the whole Jacobian is therefore
    built from elementwise VPU expressions."""
    c0 = A[..., 1] * Z - A[..., 2] * Y
    c1 = -A[..., 0] * Z + A[..., 2] * X
    c2 = A[..., 0] * Y - A[..., 1] * X
    return jnp.stack([c0, c1, c2], -1)


def _point_residual_jac(Tcw, pts: PointObs, K, bf):
    """-> r f32[N, 3], J f32[N, 3, 6], depth_ok bool[N].

    J is d(residual)/d(xi) for left-multiplied update exp(xi) * Tcw, twist
    order (rho, phi). Closed form, fully elementwise (see _rot_cols note)."""
    fx, fy = K[0, 0], K[1, 1]
    P = se3.transform(Tcw, pts.xw)  # [N, 3] camera frame (elementwise)
    X, Y, Z = P[..., 0], P[..., 1], P[..., 2]
    depth_ok = Z > 1e-3
    Zs = jnp.where(depth_ok, Z, 1.0)
    iz = 1.0 / Zs
    iz2 = iz * iz
    u = fx * X * iz + K[0, 2]
    v = fy * Y * iz + K[1, 2]
    ur = u - bf * iz
    pred = jnp.stack([u, v, ur], -1)
    r = pts.obs - pred
    r = r.at[..., 2].set(jnp.where(pts.is_stereo, r[..., 2], 0.0))

    # d(pred)/dP rows
    zero = jnp.zeros_like(X)
    du_dP = jnp.stack([fx * iz, zero, -fx * X * iz2], -1)
    dv_dP = jnp.stack([zero, fy * iz, -fy * Y * iz2], -1)
    dur_dP = du_dP + jnp.stack([zero, zero, bf * iz2], -1)
    # J = -dpred_dP @ [I | -hat(P)]: translation cols = -dpred_dP,
    # rotation cols = +dpred_dP @ hat(P)
    J = jnp.stack(
        [
            jnp.concatenate([-du_dP, _rot_cols(du_dP, X, Y, Z)], -1),
            jnp.concatenate([-dv_dP, _rot_cols(dv_dP, X, Y, Z)], -1),
            jnp.concatenate([-dur_dP, _rot_cols(dur_dP, X, Y, Z)], -1),
        ],
        -2,
    )  # [N, 3, 6]
    J = J.at[..., 2, :].set(
        jnp.where(pts.is_stereo[..., None], J[..., 2, :], 0.0)
    )
    return r, J, depth_ok


def _line_residual_jac(Tcw, lines: LineObs, K):
    """-> r f32[L, 2], J f32[L, 2, 6], depth_ok bool[L]."""
    fx, fy = K[0, 0], K[1, 1]
    l = lines.line2d  # [L, 3]

    def endpoint(Xw):
        P = se3.transform(Tcw, Xw)
        X, Y, Z = P[..., 0], P[..., 1], P[..., 2]
        ok = Z > 1e-3
        iz = 1.0 / jnp.where(ok, Z, 1.0)
        iz2 = iz * iz
        u = fx * X * iz + K[0, 2]
        v = fy * Y * iz + K[1, 2]
        res = l[..., 0] * u + l[..., 1] * v + l[..., 2]  # point-to-line
        zero = jnp.zeros_like(X)
        du_dP = jnp.stack([fx * iz, zero, -fx * X * iz2], -1)
        dv_dP = jnp.stack([zero, fy * iz, -fy * Y * iz2], -1)
        dres_dP = l[..., 0:1] * du_dP + l[..., 1:2] * dv_dP  # [L, 3]
        # dres/dxi = dres_dP @ [I | -hat(P)] (elementwise, see _rot_cols)
        dres_dxi = jnp.concatenate(
            [dres_dP, -_rot_cols(dres_dP, X, Y, Z)], -1
        )  # [L, 6]
        return res, dres_dxi, ok

    r_s, J_s, ok_s = endpoint(lines.sw)
    r_e, J_e, ok_e = endpoint(lines.ew)
    # residual is -(signed distances): consistent sign convention (obs - pred)
    r = -jnp.stack([r_s, r_e], -1)
    J = -jnp.stack([J_s, J_e], -2)
    return r, J, ok_s & ok_e


def _huber_weight(chi2, delta2, robust):
    """g2o RobustKernelHuber: weight = rho'(chi2); 1 inside, delta/sqrt(chi2)
    outside. `robust` False -> 1 (last round disables the kernel)."""
    w = jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / jnp.clip(chi2, 1e-12, None)))
    return jnp.where(robust, w, 1.0)


def _chi2_threshold_pts(is_stereo):
    return jnp.where(is_stereo, C.CHI2_STEREO, C.CHI2_MONO)


def pose_optimization(
    Tcw0,
    pts: PointObs,
    K,
    bf,
    lines: LineObs | None = None,
    rounds: int = C.POSE_OPT_ROUNDS,
    iters_schedule: tuple = C.POSE_OPT_SCHEDULE,
):
    """-> (Tcw f32[4,4], pt_inlier bool[N], line_inlier bool[L] | None).

    Fully jit-compatible; `lines=None` traces a points-only solve.

    On the TPU backend the whole solve runs as ONE fused Pallas kernel
    (solvers/pose_pallas.py) — the jnp path below traces into ~500 tiny XLA
    kernels whose launch gaps dominate the tracking step (device trace).
    This path remains the CPU/test oracle; the TPU runner asserts the two
    agree (tests/test_pose.py)."""
    import os

    if (
        jax.default_backend() == "tpu"
        and not os.environ.get("PLSLAM_NO_PALLAS")
        and pts.xw.shape[0] % 128 == 0
        and (lines is None or lines.sw.shape[0] % 128 == 0)
    ):
        from plslam_tpu.solvers.pose_pallas import pose_optimization_pallas

        return pose_optimization_pallas(
            Tcw0, pts, K, bf, lines=lines, rounds=rounds,
            iters_schedule=iters_schedule,
        )
    has_lines = lines is not None

    def chi2_all(Tcw, active_pts, active_lines):
        r, _, ok = _point_residual_jac(Tcw, pts, K, bf)
        chi2_p = jnp.sum(r * r, -1) * pts.inv_sigma2
        chi2_p = jnp.where(ok, chi2_p, jnp.inf)
        if has_lines:
            rl, _, okl = _line_residual_jac(Tcw, lines, K)
            chi2_l = jnp.sum(rl * rl, -1) * lines.inv_sigma2
            chi2_l = jnp.where(okl, chi2_l, jnp.inf)
        else:
            chi2_l = None
        return chi2_p, chi2_l

    def build_system(Tcw, active_pts, active_lines, robust):
        r, J, ok = _point_residual_jac(Tcw, pts, K, bf)
        # zero residuals of excluded rows BEFORE they enter any matmul:
        # w=0 does not save b = (Jw)^T r from 0 * NaN = NaN when a padded
        # observation row carries non-finite coords (NaN b -> NaN delta ->
        # every LM step rejected -> the solve silently returns its init)
        r = jnp.where((pts.valid & ok)[:, None], r, 0.0)
        chi2 = jnp.sum(r * r, -1) * pts.inv_sigma2
        delta2 = _chi2_threshold_pts(pts.is_stereo)
        w = _huber_weight(chi2, delta2, robust) * pts.inv_sigma2
        w = jnp.where(active_pts & pts.valid & ok, w, 0.0)
        # flat accumulation: ONE [6, 3N] x [3N, 6] matmul (batched-per-point
        # einsums lower to N tiny MXU ops on TPU — catastrophic)
        Jf = J.reshape(-1, 6)
        wf = jnp.broadcast_to(w[:, None], w.shape + (3,)).reshape(-1)
        Jw = Jf * wf[:, None]
        H = mm(Jw.T, Jf)
        b = -mm(Jw.T, r.reshape(-1, 1))[:, 0]  # GN: H delta = -J^T W r
        # robustified cost (g2o: sum rho(chi2))
        rho = jnp.where(
            chi2 <= delta2, chi2, 2.0 * jnp.sqrt(delta2 * jnp.clip(chi2, 0)) - delta2
        )
        rho = jnp.where(robust, rho, chi2)
        cost = jnp.sum(jnp.where(active_pts & pts.valid & ok, rho, 0.0))
        # Points pushed behind the camera must RAISE the cost, not vanish
        # from it (otherwise "everything invisible" is a zero-cost minimum).
        cost = cost + 1e7 * jnp.sum(active_pts & pts.valid & ~ok)
        if has_lines:
            rl, Jl, okl = _line_residual_jac(Tcw, lines, K)
            rl = jnp.where((lines.valid & okl)[:, None], rl, 0.0)  # see r
            chi2l = jnp.sum(rl * rl, -1) * lines.inv_sigma2
            wl = _huber_weight(chi2l, C.CHI2_LINE, robust) * lines.inv_sigma2
            wl = jnp.where(active_lines & lines.valid & okl, wl, 0.0)
            Jlf = Jl.reshape(-1, 6)
            wlf = jnp.broadcast_to(wl[:, None], wl.shape + (2,)).reshape(-1)
            Jlw = Jlf * wlf[:, None]
            H = H + mm(Jlw.T, Jlf)
            b = b - mm(Jlw.T, rl.reshape(-1, 1))[:, 0]
            rhol = jnp.where(
                chi2l <= C.CHI2_LINE,
                chi2l,
                2.0 * jnp.sqrt(C.CHI2_LINE * jnp.clip(chi2l, 0)) - C.CHI2_LINE,
            )
            rhol = jnp.where(robust, rhol, chi2l)
            cost = cost + jnp.sum(jnp.where(active_lines & lines.valid & okl, rhol, 0.0))
            cost = cost + 1e7 * jnp.sum(active_lines & lines.valid & ~okl)
        return H, b, cost

    def lm_round(Tcw, active_pts, active_lines, robust, n_iters):
        """Statically UNROLLED LM iterations. The reference runs 10 per
        round, but with exact batched GN algebra the solve converges in 2-3;
        on TPU each lax-loop iteration costs a chain of tiny-kernel launches
        (~20 ms/frame of pure dispatch latency measured), so the schedule is
        compressed and unrolled for fusion. The 4-round chi2
        re-classification structure (the part that matters for robustness)
        is preserved by the caller.

        ONE residual/Jacobian pass per iteration: (H, b, cost) at the
        current linearization point are CARRIED — the candidate evaluation
        build_system(T_new) either becomes next iteration's system (accept:
        same linearization point) or is discarded (reject: the carried
        system is still the current one). Identical decisions/values to the
        textbook two-pass form, at half the residual passes."""
        H, b, cost = build_system(Tcw, active_pts, active_lines, robust)
        lam = _TAU * jnp.max(jnp.abs(jnp.diag(H)))
        nu = jnp.float32(2.0)
        for _ in range(n_iters):
            # g2o OptimizationAlgorithmLevenberg: ADDITIVE damping H + lam*I
            # with lam0 = tau * max(diag H) (multiplicative diag scaling
            # over-damps by ~maxdiag/mindiag and stalls convergence)
            Hd = H + (lam + 1e-9) * jnp.eye(6, dtype=H.dtype)
            delta = jnp.linalg.solve(Hd, b)
            T_new = se3.compose(se3.exp(delta), Tcw)
            H_new, b_new, new_cost = build_system(
                T_new, active_pts, active_lines, robust
            )
            accept = (new_cost < cost) & jnp.all(jnp.isfinite(delta))
            Tcw = jnp.where(accept, T_new, Tcw)
            H = jnp.where(accept, H_new, H)
            b = jnp.where(accept, b_new, b)
            cost = jnp.where(accept, new_cost, cost)
            lam = jnp.where(accept, lam / 3.0, lam * nu)
            nu = jnp.where(accept, 2.0, nu * 2.0)
        return Tcw

    active_pts = pts.valid
    active_lines = lines.valid if has_lines else None
    Tcw = Tcw0
    for rnd in range(rounds):
        robust = jnp.bool_(rnd < rounds - 1)  # kernel off in last round
        Tcw = lm_round(Tcw, active_pts, active_lines, robust, iters_schedule[rnd % len(iters_schedule)])
        chi2_p, chi2_l = chi2_all(Tcw, active_pts, active_lines)
        active_pts = pts.valid & (chi2_p <= _chi2_threshold_pts(pts.is_stereo))
        if has_lines:
            active_lines = lines.valid & (chi2_l <= C.CHI2_LINE)

    return Tcw, active_pts, (active_lines if has_lines else None)
