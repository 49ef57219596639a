"""Local bundle adjustment: batched Schur-complement Levenberg-Marquardt.

Replaces Optimizer::LocalBundleAdjustment (src/Optimizer.cc ~450, g2o
BlockSolver_6_3 + LinearSolverEigen + OptimizationAlgorithmLevenberg):

  * Window: the new keyframe + its covisible keyframes (vertices);
    keyframes that see local landmarks but are not covisible enter as FIXED
    vertices; keyframe 0 is always fixed (gauge).
  * Landmarks: every map point observed by a window keyframe, AND every map
    LINE observed by one (the fork's EdgeLineProjectXYZ, SURVEY.md §3.2 g2o
    row). The line edge's 2-dof residual (l·pi(T sw), l·pi(T ew)) decouples
    into two independent scalar edges — r1 depends only on the start point,
    r2 only on the end point — so each endpoint enters the Schur system as
    an ordinary 3-dof landmark block. No 6x6 line blocks needed; the
    landmark axis is just [Pl points | Ql starts | Ql ends].
  * Edges: all observations of local landmarks by window+fixed keyframes —
    enumerated directly from the per-KF landmark-index arrays (kf_lm_idx /
    kf_ln_idx), no edge lists.
  * Solve: explicit Schur complement. H_pp is block-diagonal (batched 3x3
    inverses on the VPU), the reduced camera system S is a dense
    (6W x 6W) matrix solved with Cholesky-sized dense algebra on the MXU
    (W <= 16 -> 96x96). LM damping is additive (g2o semantics), with
    accept/reject and the reference's 5 + 10 iteration schedule and a chi2
    outlier pass in between (outlier observations are erased from the map,
    like the reference does under the map mutex).

Everything is fixed-capacity: W window cams, X fixed cams, Pl local points,
Ql local lines — masks everywhere, one XLA program, no host round trips.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from plslam_tpu import constants as C
from plslam_tpu.geometry import se3
from plslam_tpu.slammap.state import (
    MapState,
    line_observation_matrix,
    observation_matrix,
)
from plslam_tpu.utils.precision import mm

_TAU = 1e-5


def _rot_cols(A, P):
    """A @ hat(P), elementwise (batched tiny matmuls are catastrophic on
    TPU — see solvers/pose.py _rot_cols)."""
    Xc, Yc, Zc = P[..., 0], P[..., 1], P[..., 2]
    return jnp.stack(
        [
            A[..., 1] * Zc - A[..., 2] * Yc,
            -A[..., 0] * Zc + A[..., 2] * Xc,
            A[..., 0] * Yc - A[..., 1] * Xc,
        ],
        -1,
    )


def _times_R(A, Rp):
    """A @ R_pose, elementwise (Rp broadcastable [.., 3, 3])."""
    return jnp.stack(
        [
            A[..., 0] * Rp[..., 0, 0] + A[..., 1] * Rp[..., 1, 0] + A[..., 2] * Rp[..., 2, 0],
            A[..., 0] * Rp[..., 0, 1] + A[..., 1] * Rp[..., 1, 1] + A[..., 2] * Rp[..., 2, 1],
            A[..., 0] * Rp[..., 0, 2] + A[..., 1] * Rp[..., 1, 2] + A[..., 2] * Rp[..., 2, 2],
        ],
        -1,
    )


def _onehot_segsum(vals, drop, P):
    """out[p] = sum_e vals[e] over edges with drop[e] == p; drop >= P drops.

    [E, V], i32[E] -> f32[P, V]. NOT a scatter-add — on TPU a 40k-element
    indexed add lowers to a slow serial/sort path (measured as a top
    local-BA cost, paid twice per LM iteration); two one-hot operands
    contracted on the MXU at HIGHEST precision sum the same values with
    f32 accumulation. Memory scales with E * ceil(P/128) * V, so callers
    gate this to LOCAL window sizes (global-mode BA keeps the scatter)."""
    E, V = vals.shape
    L = 128
    R = (P + L - 1) // L
    ok = drop < P
    idc = jnp.where(ok, drop, 0)
    lo = ((idc & (L - 1))[:, None] == jnp.arange(L, dtype=jnp.int32)).astype(
        jnp.float32
    )  # [E, 128]
    hi = ((idc >> 7)[:, None] == jnp.arange(R, dtype=jnp.int32)) & ok[:, None]
    hv = hi.astype(jnp.float32)[:, :, None] * vals[:, None, :]  # [E, R, V]
    out = jax.lax.dot_general(
        lo, hv.reshape(E, R * V), (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # [128, R*V]
    return out.reshape(L, R, V).transpose(1, 0, 2).reshape(R * L, V)[:P]


def _onehot_segsum_rows(vals, drop, P):
    """Per-row variant: [W, N, V], i32[W, N] -> f32[W, P, V] (the Schur M
    assembly — each window camera accumulates its own landmark columns)."""
    W, N, V = vals.shape
    L = 128
    R = (P + L - 1) // L
    ok = drop < P
    idc = jnp.where(ok, drop, 0)
    lo = (
        (idc & (L - 1))[..., None] == jnp.arange(L, dtype=jnp.int32)
    ).astype(jnp.float32)  # [W, N, 128]
    hi = ((idc >> 7)[..., None] == jnp.arange(R, dtype=jnp.int32)) & ok[
        ..., None
    ]
    hv = hi.astype(jnp.float32)[..., None] * vals[:, :, None, :]  # [W,N,R,V]
    out = jax.lax.dot_general(
        lo, hv.reshape(W, N, R * V), (((1,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # [W, 128, R*V]
    return out.reshape(W, L, R, V).transpose(0, 2, 1, 3).reshape(
        W, R * L, V
    )[:, :P]


class LocalBA:
    def __init__(
        self,
        tracker,
        window: int = C.LOCAL_KFS,
        fixed: int = C.LOCAL_FIXED_KFS,
        local_pts: int = 4096,
        local_lines: int = 256,
        iters1: int = C.LOCAL_BA_ITERS_1,
        iters2: int = C.LOCAL_BA_ITERS_2,
        global_mode: bool = False,
    ):
        """global_mode=True turns this into GlobalBundleAdjustment
        (src/Optimizer.cc ~60): the window is EVERY valid keyframe (gauge =
        KF 0), no fixed ring, and all valid landmarks/lines enter — the same
        Schur machinery, map-wide scope."""
        self.tracker = tracker
        self.global_mode = global_mode
        if global_mode:
            window, fixed = tracker.max_kf, 1
            local_pts, local_lines = tracker.max_pts, tracker.max_maplines
        self.W = min(window, tracker.max_kf)
        self.X = min(fixed, tracker.max_kf)
        self.Pl = min(local_pts, tracker.max_pts)
        self.Ql = min(local_lines, tracker.max_maplines)
        self.iters1, self.iters2 = iters1, iters2

    @functools.cached_property
    def run(self):
        return jax.jit(
            lambda m, k: self._run(m, k, self.iters1, self.iters2, True)
        )

    def slice_runner(self, iters1: int, iters2: int, erase: bool):
        """Jitted partial solve — the unit of TIME-SLICED global BA.

        The reference runs GlobalBundleAdjustment in a transient thread
        while tracking continues on the stale map
        (LoopClosing::RunGlobalBundleAdjustment ~600). The TPU analogue:
        the 10+10 LM schedule is split into slices, one dispatched between
        frames (System.track_rgbd pumps LoopCloser.gba_queue) — tracking
        proceeds on the partially-optimized map and the closure's frame-time
        spike spreads over the slice count. Each slice re-selects/rebuilds
        on the CURRENT map, so keyframes created mid-GBA simply join later
        slices (strictly cleaner than the reference's post-hoc correction
        propagation). iters1 robust LM iterations, then a chi2 gate +
        iters2 non-robust iterations (either phase statically skipped at 0);
        erase=True runs the final outlier sweep that drops bad observations
        from kf_lm_idx/kf_ln_idx — only the LAST slice should erase."""
        fns = self.__dict__.setdefault("_slice_fns", {})
        key = (iters1, iters2, erase)
        if key not in fns:
            fns[key] = jax.jit(
                lambda m, k: self._run(m, k, iters1, iters2, erase)
            )
        return fns[key]

    # ------------------------------------------------------------------ build
    def _select(self, m: MapState, k):
        """Pick window/fixed keyframes + local landmark slots."""
        tr = self.tracker
        obs = observation_matrix(m)  # [K, P]
        if self.global_mode:
            return self._select_global(m, k, obs)
        obs_f = obs.astype(jnp.bfloat16)
        covis_k = jax.lax.dot_general(
            obs_f, obs_f[k], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)  # [K] shared-landmark counts with KF k
        covis_k = covis_k.at[k].set(0)
        covis_ok = m.kf_valid & (covis_k >= C.COVIS_TH)
        score = jnp.where(covis_ok, covis_k, -1)
        _, top = jax.lax.top_k(score, self.W - 1)
        win_valid = jnp.take(score, top) > 0
        win_ids = jnp.concatenate([jnp.array([k]), jnp.where(win_valid, top, 0)])
        win_mask = jnp.concatenate([jnp.array([True]), win_valid])

        in_window = jnp.zeros(tr.max_kf, bool).at[jnp.where(win_mask, win_ids, tr.max_kf)].set(
            True, mode="drop"
        )

        # local landmarks: observed by any window KF
        w_obs = obs & in_window[:, None]  # [K, P]
        lm_local = jnp.any(w_obs, axis=0) & m.pt_valid  # [P]
        _, local_ids = jax.lax.top_k(lm_local.astype(jnp.int32), self.Pl)
        local_valid = jnp.take(lm_local, local_ids)
        lm_slot = jnp.full(tr.max_pts, -1, jnp.int32).at[
            jnp.where(local_valid, local_ids, tr.max_pts)
        ].set(jnp.arange(self.Pl, dtype=jnp.int32), mode="drop")

        # fixed KFs: see local landmarks, not in window
        sees_local = jnp.sum(
            (obs & lm_local[None, :]).astype(jnp.int32), axis=1
        )
        fixed_ok = m.kf_valid & ~in_window & (sees_local > 0)
        fscore = jnp.where(fixed_ok, sees_local, -1)
        _, ftop = jax.lax.top_k(fscore, self.X)
        fix_valid = jnp.take(fscore, ftop) > 0
        fix_ids = jnp.where(fix_valid, ftop, 0)

        # local map LINES: observed by any window KF (kf_ln_idx incidence)
        ln_obs = line_observation_matrix(m)  # [K, Q]
        ln_local = jnp.any(ln_obs & in_window[:, None], axis=0) & m.ln_valid
        _, ln_ids = jax.lax.top_k(ln_local.astype(jnp.int32), self.Ql)
        ln_sel_valid = jnp.take(ln_local, ln_ids)
        ln_slot = jnp.full(tr.max_maplines, -1, jnp.int32).at[
            jnp.where(ln_sel_valid, ln_ids, tr.max_maplines)
        ].set(jnp.arange(self.Ql, dtype=jnp.int32), mode="drop")

        return (win_ids, win_mask, fix_ids, fix_valid, local_ids, local_valid,
                lm_slot, ln_ids, ln_sel_valid, ln_slot)

    def _select_global(self, m: MapState, k, obs):
        """GlobalBundleAdjustment scope: all valid KFs, all landmarks."""
        tr = self.tracker
        win_ids = jnp.argsort(~m.kf_valid).astype(jnp.int32)[: self.W]
        win_mask = m.kf_valid[win_ids]
        fix_ids = jnp.zeros(self.X, jnp.int32)
        fix_valid = jnp.zeros(self.X, bool)
        local_ids = jnp.arange(self.Pl, dtype=jnp.int32)
        local_valid = m.pt_valid[: self.Pl]
        lm_slot = jnp.where(
            jnp.arange(tr.max_pts) < self.Pl,
            jnp.arange(tr.max_pts, dtype=jnp.int32), -1
        )
        lm_slot = jnp.where(m.pt_valid, lm_slot, -1)
        ln_ids = jnp.arange(self.Ql, dtype=jnp.int32)
        ln_sel_valid = m.ln_valid[: self.Ql]
        ln_slot = jnp.where(
            jnp.arange(tr.max_maplines) < self.Ql,
            jnp.arange(tr.max_maplines, dtype=jnp.int32), -1
        )
        ln_slot = jnp.where(m.ln_valid, ln_slot, -1)
        return (win_ids, win_mask, fix_ids, fix_valid, local_ids, local_valid,
                lm_slot, ln_ids, ln_sel_valid, ln_slot)

    # ------------------------------------------------------------------- core
    def _edge_terms(self, poses, pos_local, uv, oct_, lm_slot_row, feat_ok, is_stereo, robust):
        """Residuals/Jacobians for all [R, F] edges.

        poses f32[R,4,4]; pos_local f32[Pl,3]; uv f32[R,F,3]; lm_slot_row
        i32[R,F] (slot into pos_local or -1). Returns r, Jc, Jp, w, chi2, ok."""
        tr = self.tracker
        K, bf = tr.K, tr.bf
        fx, fy = K[0, 0], K[1, 1]
        slot = jnp.clip(lm_slot_row, 0)
        X = pos_local[slot]  # [R, F, 3]
        Rp = poses[:, None, :3, :3]  # [R, 1, 3, 3]
        tp = poses[:, None, :3, 3]
        xx, yy, zz = X[..., 0], X[..., 1], X[..., 2]
        P = jnp.stack(
            [
                Rp[..., 0, 0] * xx + Rp[..., 0, 1] * yy + Rp[..., 0, 2] * zz + tp[..., 0],
                Rp[..., 1, 0] * xx + Rp[..., 1, 1] * yy + Rp[..., 1, 2] * zz + tp[..., 1],
                Rp[..., 2, 0] * xx + Rp[..., 2, 1] * yy + Rp[..., 2, 2] * zz + tp[..., 2],
            ],
            -1,
        )
        Z = P[..., 2]
        ok = feat_ok & (lm_slot_row >= 0) & (Z > 1e-3)
        iz = 1.0 / jnp.where(Z > 1e-3, Z, 1.0)
        iz2 = iz * iz
        u = fx * P[..., 0] * iz + K[0, 2]
        v = fy * P[..., 1] * iz + K[1, 2]
        ur = u - bf * iz
        pred = jnp.stack([u, v, ur], -1)
        r = uv - pred
        r = r.at[..., 2].set(jnp.where(is_stereo, r[..., 2], 0.0))

        zero = jnp.zeros_like(Z)
        du = jnp.stack([fx * iz, zero, -fx * P[..., 0] * iz2], -1)
        dv = jnp.stack([zero, fy * iz, -fy * P[..., 1] * iz2], -1)
        dur = du + jnp.stack([zero, zero, bf * iz2], -1)
        # Elementwise Jacobians (batched tiny matmuls are catastrophic on
        # TPU — see solvers/pose.py _rot_cols)
        Xc, Yc, Zc = P[..., 0], P[..., 1], P[..., 2]

        def rot_cols(A):  # A @ hat(P), elementwise
            return jnp.stack(
                [
                    A[..., 1] * Zc - A[..., 2] * Yc,
                    -A[..., 0] * Zc + A[..., 2] * Xc,
                    A[..., 0] * Yc - A[..., 1] * Xc,
                ],
                -1,
            )

        def times_R(A):  # A @ R_pose, elementwise ([R,1,3,3] broadcast)
            return jnp.stack(
                [
                    A[..., 0] * Rp[..., 0, 0] + A[..., 1] * Rp[..., 1, 0] + A[..., 2] * Rp[..., 2, 0],
                    A[..., 0] * Rp[..., 0, 1] + A[..., 1] * Rp[..., 1, 1] + A[..., 2] * Rp[..., 2, 1],
                    A[..., 0] * Rp[..., 0, 2] + A[..., 1] * Rp[..., 1, 2] + A[..., 2] * Rp[..., 2, 2],
                ],
                -1,
            )

        Jc = jnp.stack(
            [
                jnp.concatenate([-du, rot_cols(du)], -1),
                jnp.concatenate([-dv, rot_cols(dv)], -1),
                jnp.concatenate([-dur, rot_cols(dur)], -1),
            ],
            -2,
        )  # [R, F, 3, 6]
        Jp = -jnp.stack([times_R(du), times_R(dv), times_R(dur)], -2)  # [R,F,3,3]
        # mono rows: zero third component
        Jc = Jc.at[..., 2, :].set(jnp.where(is_stereo[..., None], Jc[..., 2, :], 0.0))
        Jp = Jp.at[..., 2, :].set(jnp.where(is_stereo[..., None], Jp[..., 2, :], 0.0))

        inv_s2 = jnp.asarray(tr.inv_sigma2)[jnp.clip(oct_, 0, tr.n_levels - 1)]
        chi2 = jnp.sum(r * r, -1) * inv_s2
        delta2 = jnp.where(is_stereo, C.CHI2_STEREO, C.CHI2_MONO)
        hub = jnp.where(
            chi2 <= delta2, 1.0, jnp.sqrt(delta2 / jnp.clip(chi2, 1e-12))
        )
        hub = jnp.where(robust, hub, 1.0)
        w = jnp.where(ok, hub * inv_s2, 0.0)
        rho = jnp.where(
            chi2 <= delta2, chi2, 2.0 * jnp.sqrt(delta2 * jnp.clip(chi2, 0)) - delta2
        )
        rho = jnp.where(robust, rho, chi2)
        cost = jnp.sum(jnp.where(ok, rho, 0.0)) + 1e7 * jnp.sum(
            feat_ok & (lm_slot_row >= 0) & ~(Z > 1e-3)
        )
        return r, Jc, Jp, w, chi2, ok, cost

    def _line_edge_terms(self, poses, sw, ew, lobs, ln_slot_row, ln_feat_ok, robust):
        """Scalar endpoint edges for all [R, L] line observations
        (EdgeLineProjectXYZ, SURVEY.md §9 line residual: r_e = l·pi(T·X_e)).

        lobs f32[R,L,3] normalized (a,b,c); sw/ew f32[Ql,3] endpoint
        positions. Returns ((r, Jc, Jp) per endpoint), w, chi2 (2-dof pair),
        ok, cost."""
        tr = self.tracker
        K = tr.K
        fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
        slot = jnp.clip(ln_slot_row, 0)
        Rp = poses[:, None, :3, :3]
        tp = poses[:, None, :3, 3]
        a, b = lobs[..., 0], lobs[..., 1]
        c = lobs[..., 2]

        def endpoint(Xw):
            X = Xw[slot]  # [R, L, 3]
            xx, yy, zz = X[..., 0], X[..., 1], X[..., 2]
            P = jnp.stack(
                [
                    Rp[..., 0, 0] * xx + Rp[..., 0, 1] * yy + Rp[..., 0, 2] * zz + tp[..., 0],
                    Rp[..., 1, 0] * xx + Rp[..., 1, 1] * yy + Rp[..., 1, 2] * zz + tp[..., 1],
                    Rp[..., 2, 0] * xx + Rp[..., 2, 1] * yy + Rp[..., 2, 2] * zz + tp[..., 2],
                ],
                -1,
            )
            Z = P[..., 2]
            okz = Z > 1e-3
            iz = 1.0 / jnp.where(okz, Z, 1.0)
            iz2 = iz * iz
            u = fx * P[..., 0] * iz + cx
            v = fy * P[..., 1] * iz + cy
            r = a * u + b * v + c  # point-to-line distance (l is normalized)
            zero = jnp.zeros_like(Z)
            du = jnp.stack([fx * iz, zero, -fx * P[..., 0] * iz2], -1)
            dv = jnp.stack([zero, fy * iz, -fy * P[..., 1] * iz2], -1)
            g = a[..., None] * du + b[..., None] * dv  # dr/dP_cam [R,L,3]
            # dr/d(dt) = g ; dr/d(dtheta) = -g @ hat(P)  (left-mult update)
            Jc = jnp.concatenate([g, -_rot_cols(g, P)], -1)  # [R,L,6]
            Jp = _times_R(g, Rp)  # [R,L,3]
            return r, Jc, Jp, okz

        r1, Jc1, Jp1, okz1 = endpoint(sw)
        r2, Jc2, Jp2, okz2 = endpoint(ew)
        ok = ln_feat_ok & okz1 & okz2
        chi2 = r1 * r1 + r2 * r2  # line info = identity (2-dof)
        delta2 = jnp.float32(C.CHI2_MONO)
        hub = jnp.where(
            chi2 <= delta2, 1.0, jnp.sqrt(delta2 / jnp.clip(chi2, 1e-12))
        )
        hub = jnp.where(robust, hub, 1.0)
        w = jnp.where(ok, hub, 0.0)
        rho = jnp.where(
            chi2 <= delta2, chi2, 2.0 * jnp.sqrt(delta2 * jnp.clip(chi2, 0)) - delta2
        )
        rho = jnp.where(robust, rho, chi2)
        cost = jnp.sum(jnp.where(ok, rho, 0.0)) + 1e7 * jnp.sum(
            ln_feat_ok & ~(okz1 & okz2)
        )
        return (r1, Jc1, Jp1), (r2, Jc2, Jp2), w, chi2, ok, cost

    def _run(self, m: MapState, k, iters1: int, iters2: int, erase: bool):
        tr = self.tracker
        (win_ids, win_mask, fix_ids, fix_valid, local_ids, local_valid,
         lm_slot, ln_ids, ln_sel_valid, ln_slot) = self._select(m, k)
        W, X, Pl, Ql = self.W, self.X, self.Pl, self.Ql
        Pt = Pl + 2 * Ql  # landmark axis: [points | line starts | line ends]

        rows_ids = jnp.concatenate([win_ids, fix_ids])  # [W+X]
        rows_mask = jnp.concatenate([win_mask, fix_valid])
        # gauge: KF 0 never moves
        movable = win_mask & (win_ids != 0)

        uv = m.kf_uv[rows_ids]  # [R, F, 3]
        oct_ = m.kf_octave[rows_ids]
        lm_idx_rows = m.kf_lm_idx[rows_ids]
        feat_ok = (
            m.kf_feat_valid[rows_ids]
            & rows_mask[:, None]
            & (lm_idx_rows >= 0)
        )
        lm_slot_row = jnp.where(feat_ok, lm_slot[jnp.clip(lm_idx_rows, 0)], -1)
        is_stereo = uv[..., 2] >= 0

        # line observation rows (EdgeLineProjectXYZ edges)
        ln_obs_rows = m.kf_ln_obs[rows_ids]  # [R, L, 3]
        ln_idx_rows = m.kf_ln_idx[rows_ids]
        ln_feat_ok = (
            m.kf_ln_valid[rows_ids] & rows_mask[:, None] & (ln_idx_rows >= 0)
        )
        ln_slot_row = jnp.where(ln_feat_ok, ln_slot[jnp.clip(ln_idx_rows, 0)], -1)

        poses0 = m.kf_pose[rows_ids]
        pos_all0 = jnp.concatenate(
            [m.pt_pos[local_ids], m.ln_sw[ln_ids], m.ln_ew[ln_ids]], 0
        )  # [Pt, 3]
        valid_all = jnp.concatenate([local_valid, ln_sel_valid, ln_sel_valid])

        def build(poses, pos_all, edge_active, ln_edge_active, robust):
            pos_local = pos_all[:Pl]
            r, Jc, Jp, w, chi2, ok, cost = self._edge_terms(
                poses, pos_local, uv, oct_, lm_slot_row, feat_ok & edge_active, is_stereo, robust
            )
            w = jnp.where(edge_active, w, 0.0)
            # zero camera Jacobian for fixed rows and immovable window KFs
            mov = jnp.concatenate([movable, jnp.zeros(X, bool)])
            Jc = jnp.where(mov[:, None, None, None], Jc, 0.0)

            Hcc = jnp.einsum("rfai,rf,rfaj->rij", Jc[:W], w[:W], Jc[:W])  # [W,6,6]
            bc = -jnp.einsum("rfai,rf,rfa->ri", Jc[:W], w[:W], r[:W])  # [W,6]
            slot = jnp.clip(lm_slot_row, 0)
            drop = jnp.where(lm_slot_row >= 0, slot, Pt)
            # per-edge outer products as BROADCAST multiplies (einsum here
            # lowers to thousands of tiny batched matmuls on TPU)
            Jpf = Jp.reshape(-1, 3, 3)
            wf = w.reshape(-1)
            rf = r.reshape(-1, 3)
            hpp_e = jnp.sum(
                (wf[:, None, None, None] * Jpf[:, :, :, None]) * Jpf[:, :, None, :], axis=1
            )  # [E, 3, 3]
            bp_e = -jnp.sum(wf[:, None, None] * Jpf * rf[:, :, None], axis=1)  # [E, 3]
            # landmark-block assembly: every (hpp 3x3 | bp 3) edge value,
            # points and line endpoints alike, summed into its landmark slot
            seg_vals = [jnp.concatenate([hpp_e.reshape(-1, 9), bp_e], -1)]
            seg_drop = [drop.reshape(-1)]
            # camera-landmark coupling stays in EDGE-FACTOR form: one [6,3]
            # block per observation edge, scattered into the Schur product
            # lazily inside solve(). A dense Hcp [W, Pt, 6, 3] would be
            # ~755 MB per live copy in global mode (W=256, Pt=41k) and OOMs
            # the chip; the edge list is 19 MB.
            hcp_e = jnp.sum(
                (w[:W][..., None, None, None] * Jc[:W][..., :, :, None])
                * Jp[:W][..., :, None, :],
                axis=2,
            )  # [W, F, 6, 3]
            edge_factors = [(hcp_e, drop[:W])]

            # --- line endpoint edges (two scalar edges per observation) ---
            e1, e2, wl, chi2_ln, ok_ln, cost_ln = self._line_edge_terms(
                poses, pos_all[Pl:Pl + Ql], pos_all[Pl + Ql:],
                ln_obs_rows, ln_slot_row, ln_feat_ok & ln_edge_active, robust,
            )
            wl = jnp.where(ln_edge_active, wl, 0.0)
            for off, (rl, Jcl, Jpl) in ((Pl, e1), (Pl + Ql, e2)):
                Jcl = jnp.where(mov[:, None, None], Jcl, 0.0)
                Hcc = Hcc + jnp.einsum(
                    "rli,rl,rlj->rij", Jcl[:W], wl[:W], Jcl[:W]
                )
                bc = bc - jnp.einsum("rli,rl,rl->ri", Jcl[:W], wl[:W], rl[:W])
                dropl = jnp.where(ln_slot_row >= 0, off + ln_slot_row, Pt)
                wlf = wl.reshape(-1)
                Jplf = Jpl.reshape(-1, 3)
                rlf = rl.reshape(-1)
                hpp_l = wlf[:, None, None] * Jplf[:, :, None] * Jplf[:, None, :]
                bp_l = -wlf[:, None] * Jplf * rlf[:, None]
                seg_vals.append(
                    jnp.concatenate([hpp_l.reshape(-1, 9), bp_l], -1)
                )
                seg_drop.append(dropl.reshape(-1))
                hcp_l = (
                    wl[:W][..., None, None]
                    * Jcl[:W][..., :, None]
                    * Jpl[:W][..., None, :]
                )  # [W, L, 6, 3]
                edge_factors.append((hcp_l, dropl[:W]))

            sv = jnp.concatenate(seg_vals, 0)
            sd = jnp.concatenate(seg_drop, 0)
            if self.global_mode:
                # scatter path: the one-hot contraction's [E, Pt/128 * 12]
                # staging buffer is ~50 GB at global scope
                acc = jnp.zeros((Pt + 1, 12)).at[sd].add(sv)[:Pt]
            else:
                acc = _onehot_segsum(sv, sd, Pt)
            Hpp = acc[:, :9].reshape(Pt, 3, 3)
            bp = acc[:, 9:]
            return (Hcc, bc, Hpp, bp, edge_factors, cost + cost_ln,
                    chi2, ok, chi2_ln, ok_ln)

        def cost_only(poses, pos_all, edge_active, ln_edge_active, robust):
            """Residual cost WITHOUT Hessian assembly — the LM accept test
            calls this once per iteration, and the round-4 version paid the
            full build() (Hpp scatter-add over 32k edges + edge-factor
            products) just to throw everything but the cost away. Measured:
            ~40% of the whole local-BA device time."""
            *_, cost = self._edge_terms(
                poses, pos_all[:Pl], uv, oct_, lm_slot_row,
                feat_ok & edge_active, is_stereo, robust,
            )
            *_, cost_ln = self._line_edge_terms(
                poses, pos_all[Pl:Pl + Ql], pos_all[Pl + Ql:],
                ln_obs_rows, ln_slot_row, ln_feat_ok & ln_edge_active, robust,
            )
            return cost + cost_ln

        def solve(Hcc, bc, Hpp, bp, edge_factors, lam):
            """Schur-complement solve from the per-edge factor lists.

            S = Hcc_diag - M M^T with M[w] = [.., Hcp[w,p] L_p, ..] where
            L_p chol(Hpp_d^-1): algebraically identical to the dense
            -Hcp Hpp^-1 Hcp^T (scatter-add into M sums the per-edge [6,3]
            blocks BEFORE the product), but the only [W x landmark]-sized
            buffer is M itself — one buffer instead of the dense Hcp + A
            pair, which OOMs in global mode."""
            I3 = jnp.eye(3)
            I6 = jnp.eye(6)
            Hpp_d = Hpp + lam * I3[None]
            # closed-form adjugate inverse of the [Pt,3,3] blocks: batched
            # linalg.inv/det over 41k tiny blocks lowers to an LU loop on
            # TPU (measured as a top local-BA cost); the cofactor form is
            # pure elementwise VPU code
            a = Hpp_d
            c00 = a[:, 1, 1] * a[:, 2, 2] - a[:, 1, 2] * a[:, 2, 1]
            c01 = a[:, 1, 2] * a[:, 2, 0] - a[:, 1, 0] * a[:, 2, 2]
            c02 = a[:, 1, 0] * a[:, 2, 1] - a[:, 1, 1] * a[:, 2, 0]
            det = a[:, 0, 0] * c00 + a[:, 0, 1] * c01 + a[:, 0, 2] * c02
            det_ok = det > 1e-12  # guard empty blocks (Hpp_d is PSD)
            idet = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
            c10 = a[:, 0, 2] * a[:, 2, 1] - a[:, 0, 1] * a[:, 2, 2]
            c11 = a[:, 0, 0] * a[:, 2, 2] - a[:, 0, 2] * a[:, 2, 0]
            c12 = a[:, 0, 1] * a[:, 2, 0] - a[:, 0, 0] * a[:, 2, 1]
            c20 = a[:, 0, 1] * a[:, 1, 2] - a[:, 0, 2] * a[:, 1, 1]
            c21 = a[:, 0, 2] * a[:, 1, 0] - a[:, 0, 0] * a[:, 1, 2]
            c22 = a[:, 0, 0] * a[:, 1, 1] - a[:, 0, 1] * a[:, 1, 0]
            G = jnp.stack(
                [
                    jnp.stack([c00, c10, c20], -1),
                    jnp.stack([c01, c11, c21], -1),
                    jnp.stack([c02, c12, c22], -1),
                ],
                -2,
            ) * idet[:, None, None]  # [Pt,3,3] PSD

            # closed-form batched 3x3 Cholesky of G (elementwise; a batched
            # linalg.cholesky over 41k tiny blocks lowers poorly on TPU)
            eps = 1e-20
            g11, g21, g31 = G[:, 0, 0], G[:, 1, 0], G[:, 2, 0]
            g22, g32, g33 = G[:, 1, 1], G[:, 2, 1], G[:, 2, 2]
            l11 = jnp.sqrt(jnp.clip(g11, 0.0))
            i11 = jnp.where(l11 > eps, 1.0 / jnp.where(l11 > eps, l11, 1.0), 0.0)
            l21 = g21 * i11
            l31 = g31 * i11
            l22 = jnp.sqrt(jnp.clip(g22 - l21 * l21, 0.0))
            i22 = jnp.where(l22 > eps, 1.0 / jnp.where(l22 > eps, l22, 1.0), 0.0)
            l32 = (g32 - l31 * l21) * i22
            l33 = jnp.sqrt(jnp.clip(g33 - l31 * l31 - l32 * l32, 0.0))
            zero = jnp.zeros_like(l11)
            L = jnp.stack(
                [
                    jnp.stack([l11, zero, zero], -1),
                    jnp.stack([l21, l22, zero], -1),
                    jnp.stack([l31, l32, l33], -1),
                ],
                -2,
            )  # [Pt, 3, 3] lower-triangular, L L^T = G

            # M layout [W, 6, (Pt+1)*3]: the landmark*xyz axis is FLAT and
            # minor so the tiled layout pads only the 6-sublane dim (a
            # [W, 6, Pt, 3] block form forces a 21x-padded transpose copy of
            # the Pt-major axis at the reshape — 15 GB in global mode).
            g_bp = jnp.sum(G * bp[:, None, :], -1)  # [Pt, 3] = G @ bp
            rhs_acc = bc
            Ts, drops = [], []
            for B, drop in edge_factors:  # B [W,N,6,3], drop [W,N]
                Le = L[jnp.clip(drop, 0, Pt - 1)]  # [W,N,3,3]
                # T = B @ L_e, elementwise expansion (batched tiny matmuls
                # are catastrophic on TPU)
                T = jnp.stack(
                    [
                        B[..., 0] * Le[..., None, 0, j]
                        + B[..., 1] * Le[..., None, 1, j]
                        + B[..., 2] * Le[..., None, 2, j]
                        for j in range(3)
                    ],
                    -1,
                )  # [W,N,6,3]
                Ts.append(T)
                drops.append(drop)
                # reduced rhs: bc - sum_e B_e (G_p bp_p)
                ge = g_bp[jnp.clip(drop, 0, Pt - 1)] * (drop < Pt)[..., None]
                rhs_acc = rhs_acc - jnp.sum(
                    jnp.sum(B * ge[:, :, None, :], -1), 1
                )
            drop_cat = jnp.concatenate(drops, 1)  # [W, Nt]
            T_cat = jnp.concatenate(Ts, 1)  # [W, Nt, 6, 3]
            if self.global_mode:
                # scatter path (one-hot staging would be GBs at global scope);
                # dropped edges land in the dummy landmark column — zero it
                # before the product (L there is 0 for point edges but line
                # edges can reach it with nonzero weight)
                Nt = drop_cat.shape[1]
                M = jnp.zeros((W, 6, (Pt + 1) * 3))
                wIdx = jnp.broadcast_to(
                    jnp.arange(W)[:, None, None], (W, Nt, 3)
                )
                colIdx = (
                    drop_cat[:, :, None] * 3 + jnp.arange(3)[None, None, :]
                )
                M = M.at[wIdx, :, colIdx].add(jnp.swapaxes(T_cat, -1, -2))
                M = M.at[:, :, Pt * 3:].set(0.0)
                M2 = M.reshape(W * 6, (Pt + 1) * 3)[:, : Pt * 3]
            else:
                M4 = _onehot_segsum_rows(
                    T_cat.reshape(W, -1, 18), drop_cat, Pt
                )  # [W, Pt, 18]
                M2 = (
                    M4.reshape(W, Pt, 6, 3)
                    .transpose(0, 2, 1, 3)
                    .reshape(W * 6, Pt * 3)
                )
            S = -jax.lax.dot_general(
                M2, M2, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            idx = jnp.arange(W * 6).reshape(W, 6)
            S = S.at[idx[:, :, None], idx[:, None, :]].add(Hcc + lam * I6[None])
            dc = jnp.linalg.solve(
                S + 1e-8 * jnp.eye(W * 6), rhs_acc.reshape(-1)
            ).reshape(W, 6)
            # back-substitute landmarks: dp = G (bp - sum_e B_e^T dc_w)
            s_cat = jnp.concatenate(
                [jnp.sum(B * dc[:, None, :, None], 2) for B, _ in edge_factors],
                1,
            )  # [W, Nt, 3]
            if self.global_mode:
                z = jnp.zeros((Pt + 1, 3)).at[drop_cat.reshape(-1)].add(
                    s_cat.reshape(-1, 3), mode="drop"
                )[:Pt]
            else:
                z = _onehot_segsum(
                    s_cat.reshape(-1, 3), drop_cat.reshape(-1), Pt
                )
            dp = jnp.sum(G * (bp - z)[:, None, :], -1)
            return dc, dp

        def lm_phase(poses, pos_all, edge_active, ln_edge_active, robust, iters):
            Hcc, bc, Hpp, bp, _, cost0, *_ = build(
                poses, pos_all, edge_active, ln_edge_active, robust
            )
            maxdiag = jnp.maximum(
                jnp.max(jnp.abs(jnp.einsum("wii->wi", Hcc))),
                jnp.max(jnp.abs(jnp.einsum("pii->pi", Hpp))),
            )
            lam0 = _TAU * maxdiag

            def body(_, carry):
                poses, pos_all, lam, nu, cost = carry
                Hcc, bc, Hpp, bp, edge_factors, *_ = build(
                    poses, pos_all, edge_active, ln_edge_active, robust
                )
                dc, dp = solve(Hcc, bc, Hpp, bp, edge_factors, lam)
                d_full = jnp.where(movable[:, None], dc, 0.0)
                poses_new_w = se3.compose(se3.exp(d_full), poses[:W])
                poses_new = jnp.concatenate([poses_new_w, poses[W:]], 0)
                pos_new = pos_all + jnp.where(valid_all[:, None], dp, 0.0)
                new_cost = cost_only(poses_new, pos_new, edge_active, ln_edge_active, robust)
                finite = jnp.isfinite(new_cost) & jnp.all(jnp.isfinite(dc)) & jnp.all(jnp.isfinite(dp))
                accept = (new_cost < cost) & finite
                poses = jnp.where(accept, poses_new, poses)
                pos_all = jnp.where(accept, pos_new, pos_all)
                cost = jnp.where(accept, new_cost, cost)
                lam = jnp.where(accept, lam / 3.0, lam * nu)
                nu = jnp.where(accept, 2.0, nu * 2.0)
                return poses, pos_all, lam, nu, cost

            poses, pos_all, _, _, _ = jax.lax.fori_loop(
                0, iters, body, (poses, pos_all, lam0, jnp.float32(2.0), cost0)
            )
            return poses, pos_all

        edge_active = jnp.ones_like(feat_ok)
        ln_edge_active = jnp.ones_like(ln_feat_ok)
        poses, pos = poses0, pos_all0
        delta2 = jnp.where(is_stereo, C.CHI2_STEREO, C.CHI2_MONO)
        delta2_ln = jnp.float32(C.CHI2_MONO)
        if iters1 > 0:
            poses, pos = lm_phase(
                poses, pos, edge_active, ln_edge_active, jnp.bool_(True), iters1
            )
        if iters2 > 0:
            # outlier pass (chi2 gate), then second phase w/o robust kernel
            *_, chi2, ok, chi2_ln, ok_ln = build(
                poses, pos, edge_active, ln_edge_active, jnp.bool_(True)
            )
            edge_active = ok & (chi2 <= delta2)
            ln_edge_active = ok_ln & (chi2_ln <= delta2_ln)
            poses, pos = lm_phase(
                poses, pos, edge_active, ln_edge_active, jnp.bool_(False), iters2
            )

        # ---- write back ----
        new_kf_pose = m.kf_pose.at[jnp.where(win_mask, win_ids, tr.max_kf)].set(
            poses[:W], mode="drop"
        )
        new_pt_pos = m.pt_pos.at[jnp.where(local_valid, local_ids, tr.max_pts)].set(
            pos[:Pl], mode="drop"
        )
        ln_sid = jnp.where(ln_sel_valid, ln_ids, tr.max_maplines)
        new_ln_sw = m.ln_sw.at[ln_sid].set(pos[Pl:Pl + Ql], mode="drop")
        new_ln_ew = m.ln_ew.at[ln_sid].set(pos[Pl + Ql:], mode="drop")
        m = m._replace(
            kf_pose=new_kf_pose, pt_pos=new_pt_pos,
            ln_sw=new_ln_sw, ln_ew=new_ln_ew,
        )
        if not erase:
            return m

        # final outliers -> erase observations from the map (kf_lm_idx = -1).
        # Evaluate over ALL real optimization edges (including ones excluded in
        # the first chi2 pass, like the reference's final vToErase sweep), but
        # ONLY edges that were part of the optimization: observations of
        # non-local landmarks (lm_slot_row == -1) were never edges and must
        # not be erased — erasing them strips old KFs' observations on every
        # KF insertion and destroys covisibility structure.
        *_, chi2, ok_all, chi2_ln, ok_ln_all = build(
            poses, pos, jnp.ones_like(feat_ok), jnp.ones_like(ln_feat_ok),
            jnp.bool_(False),
        )
        bad_edge = feat_ok & (lm_slot_row >= 0) & ((chi2 > delta2) | ~ok_all)
        bad_ln_edge = ln_feat_ok & (ln_slot_row >= 0) & (
            (chi2_ln > delta2_ln) | ~ok_ln_all
        )
        # erase outlier observations row by row
        row_sel = jnp.where(rows_mask, rows_ids, tr.max_kf)
        cur = m.kf_lm_idx[rows_ids]
        new_rows = jnp.where(bad_edge, -1, cur)
        new_kf_lm = m.kf_lm_idx.at[row_sel].set(new_rows, mode="drop")
        cur_ln = m.kf_ln_idx[rows_ids]
        new_ln_rows = jnp.where(bad_ln_edge, -1, cur_ln)
        new_kf_ln = m.kf_ln_idx.at[row_sel].set(new_ln_rows, mode="drop")
        return m._replace(kf_lm_idx=new_kf_lm, kf_ln_idx=new_kf_ln)
