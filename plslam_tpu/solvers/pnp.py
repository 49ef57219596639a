"""Init-free camera pose from 2D-3D matches: batched RANSAC for
relocalization.

Replaces src/PnPsolver.cc (~1000 LoC EPnP + adaptive RANSAC inside
Tracking::Relocalization ~1300). The reference needs EPnP because its
minimal solve must work from 2D observations alone; an RGB-D frame carries
metric depth for most features, so the TPU-native minimal solve is 3D-3D:
sample 3 matched (frame-backprojection, landmark-world) pairs per
hypothesis, closed-form Horn alignment (batched 4x4 eigh — the same kernel
as Sim3Solver), and score EVERY hypothesis against EVERY match by
REPROJECTION chi2 (PnPsolver::CheckInliers semantics — depthless matches
still vote). Documented deviation: EPnP's control-point linear system is
replaced by the depth-enabled Horn minimal solve; both are init-free, and
the scoring/refinement contract matches the reference.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from plslam_tpu import constants as C
from plslam_tpu.geometry import camera
from plslam_tpu.solvers.sim3_solver import _horn


class PnPResult(NamedTuple):
    Tcw: jnp.ndarray  # f32[4, 4]
    n_inliers: jnp.ndarray  # i32[]
    inliers: jnp.ndarray  # bool[N]
    ok: jnp.ndarray  # bool[]


def solve_pnp_ransac(
    xw,
    uv,
    depth,
    inv_sigma2,
    valid,
    K,
    n_hyp: int = 256,
    chi2_th: float = C.CHI2_MONO,
    min_inliers: int = 10,
    seed: int = 0,
):
    """xw f32[N,3] matched landmark world positions; uv f32[N,2] observed
    undistorted keypoints; depth f32[N] measured frame depth (<=0: no depth,
    the match still votes via reprojection but cannot seed a hypothesis);
    inv_sigma2 f32[N] octave weights. Returns PnPResult with Tcw such that
    p_cam = R p_w + t — NO pose prior anywhere."""
    N = xw.shape[0]
    p_cam = camera.backproject(K, uv, jnp.maximum(depth, 1e-3))  # [N, 3]
    can_seed = valid & (depth > 0)

    key = jax.random.PRNGKey(seed)
    idx = jax.random.randint(key, (n_hyp, 3), 0, jnp.maximum(jnp.sum(can_seed), 1))
    order = jnp.argsort(~can_seed)  # seedable matches first
    samp = order[idx]  # [H, 3]
    h_cam = p_cam[samp]
    h_w = xw[samp]
    R, t, _ = _horn(h_cam, h_w, jnp.ones((n_hyp, 3)), fix_scale=True)

    # reprojection scoring of all hypotheses against all matches
    pc = jnp.einsum("hij,nj->hni", R, xw) + t[:, None, :]  # [H, N, 3]
    uv_p = camera.project(K, pc)
    chi2 = jnp.sum((uv_p - uv[None]) ** 2, -1) * inv_sigma2[None]
    inl = (chi2 < chi2_th) & valid[None] & (pc[..., 2] > 0.05)
    counts = jnp.sum(inl, -1)
    best = jnp.argmax(counts)
    best_inl = inl[best]

    # refine with weighted Horn on the depth-valid winning inliers, recount
    w = (best_inl & can_seed).astype(jnp.float32)
    Rr, tr, _ = _horn(p_cam, xw, w, fix_scale=True)
    pc_r = jnp.einsum("ij,nj->ni", Rr, xw) + tr
    chi2_r = jnp.sum((camera.project(K, pc_r) - uv) ** 2, -1) * inv_sigma2
    inl_r = (chi2_r < chi2_th) & valid & (pc_r[:, 2] > 0.05)
    # keep the refined transform only if it didn't lose support
    better = jnp.sum(inl_r) >= counts[best]
    Rf = jnp.where(better, Rr, R[best])
    tf = jnp.where(better, tr, t[best])
    inl_f = jnp.where(better, inl_r, best_inl)
    Tcw = jnp.eye(4, dtype=xw.dtype).at[:3, :3].set(Rf).at[:3, 3].set(tf)
    n = jnp.sum(inl_f)
    return PnPResult(Tcw=Tcw, n_inliers=n, inliers=inl_f, ok=n >= min_inliers)
