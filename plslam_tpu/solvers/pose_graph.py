"""Essential-graph (pose-graph) optimization over Sim3 nodes.

Replaces Optimizer::OptimizeEssentialGraph (src/Optimizer.cc ~900, g2o
VertexSim3Expmap/EdgeSim3, 20 LM iterations): after a loop closure, all
keyframe poses are re-distributed so the loop-edge measurement and the
odometry/covisibility edges agree; landmarks are then corrected through
their reference keyframe's pose change.

TPU-native shape: edges are a DENSE [K, K] masked pair tensor (spanning
tree + strong covisibility (>=100 shared, COVIS_ESSENTIAL_TH) + loop edges),
residual r_ij = log(S_meas_ij * S_j * S_i^-1) evaluated for every pair at
once, per-pair 7x7 Jacobians by batched forward-mode autodiff, Gauss-Newton
with additive damping on the dense [7K, 7K] system (K <= 256 -> at most
1792x1792, one MXU-sized Cholesky solve per iteration). RGB-D fixes scale:
the sigma component of every update is projected out (bFixScale=true).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from plslam_tpu.geometry import se3, sim3


def _residual(xi_i, xi_j, Si, Sj, Smeas):
    """r = log(Smeas * (exp(xi_j) Sj) * (exp(xi_i) Si)^-1) -> [7]."""
    Sj_p = sim3.compose(sim3.exp(xi_j), Sj)
    Si_p = sim3.compose(sim3.exp(xi_i), Si)
    return sim3.log(sim3.compose(Smeas, sim3.compose(Sj_p, sim3.inverse(Si_p))))


def optimize_essential_graph(
    poses,  # f32[K, 4, 4] initial Tcw (corrected window already applied)
    node_valid,  # bool[K]
    fixed,  # bool[K] (loop-origin KF fixed; invalid nodes implicitly fixed)
    edge_mask,  # bool[K, K] symmetric-upper edges
    meas_R,  # f32[K, K, 3, 3] S_meas[i, j]: measures S_i * S_j^-1
    meas_t,  # f32[K, K, 3]
    meas_s,  # f32[K, K]
    n_iters: int = 20,
    fix_scale: bool = True,
    damping: float = 1e-6,
):
    """-> corrected poses f32[K, 4, 4]."""
    K = poses.shape[0]
    Sn = sim3.from_se3(poses)  # (R [K,3,3], t [K,3], s [K])

    iu, ju = jnp.triu_indices(K, k=1)
    e_mask = (edge_mask | edge_mask.T)[iu, ju] & node_valid[iu] & node_valid[ju]
    Sm = (meas_R[iu, ju], meas_t[iu, ju], meas_s[iu, ju])

    res_and_jac = jax.vmap(
        lambda Si_R, Si_t, Si_s, Sj_R, Sj_t, Sj_s, Sm_R, Sm_t, Sm_s: (
            _residual(
                jnp.zeros(7), jnp.zeros(7), (Si_R, Si_t, Si_s), (Sj_R, Sj_t, Sj_s), (Sm_R, Sm_t, Sm_s)
            ),
            jax.jacfwd(_residual, argnums=(0, 1))(
                jnp.zeros(7), jnp.zeros(7), (Si_R, Si_t, Si_s), (Sj_R, Sj_t, Sj_s), (Sm_R, Sm_t, Sm_s)
            ),
        )
    )

    def gn_step(S):
        R, t, s = S
        r, (Ji, Jj) = res_and_jac(
            R[iu], t[iu], s[iu], R[ju], t[ju], s[ju], *Sm
        )  # r [E,7], Ji/Jj [E,7,7]
        w = e_mask.astype(jnp.float32)
        H = jnp.zeros((K, K, 7, 7))
        Hii = jnp.einsum("eai,e,eaj->eij", Ji, w, Ji)
        Hjj = jnp.einsum("eai,e,eaj->eij", Jj, w, Jj)
        Hij = jnp.einsum("eai,e,eaj->eij", Ji, w, Jj)
        H = H.at[iu, iu].add(Hii).at[ju, ju].add(Hjj)
        H = H.at[iu, ju].add(Hij).at[ju, iu].add(jnp.swapaxes(Hij, -1, -2))
        b = jnp.zeros((K, 7))
        b = b.at[iu].add(-jnp.einsum("eai,e,ea->ei", Ji, w, r))
        b = b.at[ju].add(-jnp.einsum("eai,e,ea->ei", Jj, w, r))
        # flatten to dense [7K, 7K]
        Hf = jnp.transpose(H, (0, 2, 1, 3)).reshape(7 * K, 7 * K)
        bf = b.reshape(7 * K)
        # fixed / invalid nodes: identity rows
        free = (node_valid & ~fixed).astype(jnp.float32)
        fmask = jnp.repeat(free, 7)
        Hf = Hf * fmask[:, None] * fmask[None, :] + jnp.diag(1.0 - fmask)
        bf = bf * fmask
        lam = damping * jnp.max(jnp.abs(jnp.diag(Hf)))
        delta = jnp.linalg.solve(Hf + lam * jnp.eye(7 * K), bf).reshape(K, 7)
        if fix_scale:
            delta = delta.at[:, 6].set(0.0)
        delta = jnp.where((node_valid & ~fixed)[:, None], delta, 0.0)
        return sim3.compose(sim3.exp(delta), S), jnp.sum(w * jnp.sum(r * r, -1))

    S = Sn
    for _ in range(n_iters):
        S_new, _ = gn_step(S)
        S = S_new
    out = sim3.to_se3(S)
    return jnp.where(node_valid[:, None, None], out, poses)


def correct_landmarks(pt_pos, pt_valid, pt_ref_kf, poses_old, poses_new):
    """Move landmarks with their reference keyframe
    (LoopClosing::CorrectLoop + RunGlobalBundleAdjustment tail:
    P' = Twc_new * Tcw_old * P)."""
    ref = jnp.clip(pt_ref_kf, 0)
    T_old = poses_old[ref]  # [P, 4, 4]
    T_new_wc = jax.vmap(se3.inverse)(poses_new)[ref]
    p_cam = jnp.einsum("pij,pj->pi", T_old[:, :3, :3], pt_pos) + T_old[:, :3, 3]
    p_new = jnp.einsum("pij,pj->pi", T_new_wc[:, :3, :3], p_cam) + T_new_wc[:, :3, 3]
    return jnp.where(pt_valid[:, None], p_new, pt_pos)
