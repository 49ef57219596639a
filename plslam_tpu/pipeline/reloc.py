"""Relocalization after tracking loss — standalone, loop-closing optional.

Replaces Tracking::Relocalization (src/Tracking.cc ~1300), which in the
reference lives INSIDE tracking and is always active, with or without the
LoopClosing thread. Round 2 had it reachable only through the loop-closing
module; this class is the always-on core — `LoopCloser` inherits from it and
adds detection/correction on top, and `System` instantiates a bare
`Relocalizer` when loop closing is disabled so LOST is never permanent.

Flow: BoW TF-IDF scoring of the lost frame against every keyframe's stored
BoW row -> top-5 candidates -> dense MXU descriptor matching against the
candidate's landmark-bearing features (ORBmatcher::SearchByBoW ~500) ->
init-free batched PnP RANSAC (solvers/pnp.py, the PnPsolver equivalent) ->
pose LM; >= MIN_INLIERS_AFTER_RELOC revives tracking.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from plslam_tpu import constants as C
from plslam_tpu.loopclosing.vocab import Vocabulary
from plslam_tpu.matching import points as match_ops
from plslam_tpu.matching.points import match_descriptors
from plslam_tpu.ops import brief
from plslam_tpu.slammap.state import MapState
from plslam_tpu.solvers.pose import PointObs, pose_optimization


class Relocalizer:
    """BoW database + PnP relocalization. The database (kf_bow, one BoW row
    per KF slot) is DEVICE-RESIDENT: a [MAX_KF, W] matrix in HBM updated by a
    jitted observe program — KeyFrameDatabase::add without a host round-trip
    (round-3 verdict: the per-KF device sync for BoW rows stalled tracking
    behind the whole mapper chain). Rebuilt on map load, cleared on reset."""

    def __init__(self, tracker, vocab: Vocabulary | None = None):
        self.tracker = tracker
        self.vocab = vocab or Vocabulary()
        self.kf_bow = jnp.zeros((tracker.max_kf, self.vocab.n_words), jnp.float32)
        # guided SearchByProjection top-up after a 30-50-inlier first solve
        # (Tracking::Relocalization tail); off switch exists for testing the
        # gate without it
        self.topup_enabled = True

    def reset(self):
        """Stale BoW rows of a discarded map must not score against the new
        map's keyframes in recycled slots (System::Reset)."""
        self.kf_bow = jnp.zeros_like(self.kf_bow)

    def load_database(self, rows: np.ndarray):
        """Restore BoW rows from a snapshot (System.load_map)."""
        self.kf_bow = jnp.asarray(rows, jnp.float32)

    # ------------------------------------------------------------ jit pieces
    @functools.cached_property
    def _bow_of_kf(self):
        def f(desc, valid):
            return self.vocab.bow(brief.unpack_bits_pm1(desc), valid)

        return jax.jit(f)

    @functools.cached_property
    def _match_kfs(self):
        def f(desc_a, valid_a, desc_b, valid_b):
            return match_descriptors(
                brief.unpack_bits_pm1(desc_a), valid_a,
                brief.unpack_bits_pm1(desc_b), valid_b,
                th_dist=C.TH_LOW, nn_ratio=0.75,
            )

        return jax.jit(f)

    @functools.cached_property
    def _pnp(self):
        from plslam_tpu.solvers.pnp import solve_pnp_ransac

        return jax.jit(solve_pnp_ransac)

    @functools.cached_property
    def _topup_match(self):
        """Guided SearchByProjection for the relocalization top-up
        (Tracking::Relocalization ~1300 tail: when the first solve lands at
        30-50 inliers the reference projects the candidate KF's landmarks
        through the solved pose and matches them into still-free keypoints —
        th=10/ORBdist=100 first, th=3/ORBdist=64 if still short — instead of
        dropping a marginal relocalization)."""

        def f(m: MapState, Tcw, cand, kp_uv, kp_octave, kp_pm1, kp_free,
              lm_free, radius, th_dist):
            tr = self.tracker
            row = m.kf_lm_idx[cand]  # i32[F]: landmark id per candidate-KF feature
            sid = jnp.clip(row, 0)
            has = (row >= 0) & m.pt_valid[sid] & lm_free
            uv_p, oct_p, vis, _ = tr._project_points_subset(
                m.pt_pos[sid], m.pt_normal[sid], m.pt_dist[sid], has, Tcw
            )
            lm_pm1 = brief.unpack_bits_pm1(m.pt_desc[sid])
            match_kp, _ = match_ops.search_by_projection(
                kp_uv, kp_octave, kp_pm1, kp_free,
                uv_p, oct_p, lm_pm1, vis,
                radius=radius, th_dist=th_dist,
            )
            return match_kp, row  # i32[F] kp slot per candidate feature, lm ids

        return jax.jit(f, static_argnames=("radius", "th_dist"))

    # --------------------------------------------------------------- database
    @functools.cached_property
    def _observe(self):
        """kf_bow.at[k] <- BoW(kf features), donated in-place in HBM."""

        def f(kf_bow, kf_desc_k, kf_feat_valid_k, k):
            row = self.vocab.bow(brief.unpack_bits_pm1(kf_desc_k), kf_feat_valid_k)
            return kf_bow.at[k].set(row)

        return jax.jit(f, donate_argnums=0)

    def observe_keyframe(self, m: MapState, k: int):
        """Add keyframe slot k to the BoW database (KeyFrameDatabase::add) —
        one async device dispatch, no host sync."""
        self.kf_bow = self._observe(
            self.kf_bow, m.kf_desc[k], m.kf_feat_valid[k], jnp.int32(k)
        )

    def rebuild_database(self, m: MapState):
        """Recompute BoW rows for every valid keyframe — required after
        System.load_map when the snapshot lacks stored rows."""
        self.kf_bow = jnp.zeros_like(self.kf_bow)
        for k in np.where(np.asarray(m.kf_valid))[0]:
            self.observe_keyframe(m, int(k))

    @staticmethod
    def tfidf_scores_device(kf_bow, bow, kf_valid):
        """DBoW2 L1 similarity with TF-IDF weighting (TemplatedVocabulary
        uses idf-weighted BowVectors; a plain-histogram scoring has no
        discriminative power over common words). idf is computed online over
        the CURRENT keyframes — equivalent in effect to the reference's
        corpus idf, and it adapts to the actual scene. Pure device fn
        ([K, W] x [W] -> [K]) shared by relocalization and loop detection."""
        df = jnp.sum((kf_bow > 0) & kf_valid[:, None], 0).astype(jnp.float32)
        n_docs = jnp.maximum(jnp.sum(kf_valid), 1).astype(jnp.float32)
        idf = jnp.maximum(jnp.log(n_docs / (1.0 + df)) + 1.0, 0.0)

        def norm(v):
            w = v * idf
            return w / jnp.maximum(jnp.sum(jnp.abs(w), -1, keepdims=True), 1e-9)

        q = norm(bow[None, :])[0]
        kw = norm(kf_bow)
        return 1.0 - 0.5 * jnp.sum(jnp.abs(kw - q[None, :]), -1)

    @functools.cached_property
    def _scores_jit(self):
        return jax.jit(self.tfidf_scores_device)

    def _tfidf_scores(self, bow, kf_valid: np.ndarray) -> np.ndarray:
        """Host wrapper (relocalization path — rare, so a readback is fine).
        Returns a WRITABLE copy (np.asarray of a jax.Array is read-only)."""
        return np.array(
            self._scores_jit(self.kf_bow, jnp.asarray(bow), jnp.asarray(kf_valid))
        )

    # ---------------------------------------------------------- relocalization
    def relocalize(self, state, frame):
        """Tracking::Relocalization (~1300): BoW candidates -> landmark
        matching -> pose solve. Returns (state, ok)."""
        m = state.m
        tr = self.tracker
        bow = np.asarray(self._bow_of_kf(frame.desc, frame.valid))
        scores = self._tfidf_scores(bow, np.asarray(m.kf_valid))
        scores[~np.asarray(m.kf_valid)] = -1  # culled/unallocated slots
        order = np.argsort(-scores)[:5]
        for cand in order:
            if scores[cand] <= 0:
                break
            mb, _ = self._match_kfs(
                frame.desc, frame.valid, m.kf_desc[cand], m.kf_feat_valid[cand]
            )
            mb = np.asarray(mb)
            lm_c = np.asarray(m.kf_lm_idx[cand])
            lm_of_kp = np.where((mb >= 0) & (lm_c[np.clip(mb, 0, None)] >= 0),
                                lm_c[np.clip(mb, 0, None)], -1).astype(np.int32)
            if (lm_of_kp >= 0).sum() < C.MIN_MATCHES_REF_KF:
                continue
            has = jnp.asarray(lm_of_kp >= 0) & frame.valid
            inv_s2 = jnp.asarray(tr.inv_sigma2)[
                jnp.clip(frame.octave, 0, tr.n_levels - 1)
            ]
            xw = m.pt_pos[jnp.clip(jnp.asarray(lm_of_kp), 0)]
            # init-free pose (PnPsolver): batched 3-point Horn RANSAC seeded
            # from the frame's own depth, scored by reprojection — works
            # even when the camera returns with a large offset from the
            # candidate KF's stored pose
            pnp = self._pnp(xw, frame.uvr[:, :2], frame.depth, inv_s2, has, tr.K)
            if not bool(pnp.ok):
                continue

            def solve(lm_ids: np.ndarray, T0):
                """Pose LM over the current landmark-per-keypoint assignment;
                -> (Tcw, surviving lm ids, inlier count)."""
                hv = jnp.asarray(lm_ids >= 0) & frame.valid
                pts = PointObs(
                    xw=m.pt_pos[jnp.clip(jnp.asarray(lm_ids), 0)],
                    obs=frame.uvr,
                    inv_sigma2=inv_s2,
                    is_stereo=frame.depth > 0,
                    valid=hv,
                )
                Tcw, inl, _ = pose_optimization(T0, pts, tr.K, tr.bf)
                keep = np.asarray(inl & hv)
                return Tcw, np.where(keep, lm_ids, -1), int(keep.sum())

            Tcw, lm_cur, n = solve(lm_of_kp, pnp.Tcw)
            if n < 10:
                continue
            if n < C.MIN_INLIERS_AFTER_RELOC and self.topup_enabled:
                # guided top-up (ref tail): two widening/narrowing passes
                for radius, th_dist in ((10.0, float(C.TH_HIGH)), (3.0, 64.0)):
                    if n >= C.MIN_INLIERS_AFTER_RELOC:
                        break
                    lm_cur = self._topup(
                        m, Tcw, int(cand), frame, lm_cur, radius, th_dist
                    )
                    Tcw, lm_cur, n = solve(lm_cur, Tcw)
            if n >= C.MIN_INLIERS_AFTER_RELOC:
                state = state._replace(
                    status=jnp.int32(1),
                    vel_ok=jnp.bool_(False),
                    ref_kf=jnp.int32(int(cand)),
                    last=state.last._replace(
                        uvr=frame.uvr, octave=frame.octave, angle=frame.angle,
                        desc=frame.desc, depth=frame.depth, valid=frame.valid,
                        lm_idx=jnp.asarray(lm_cur, dtype=jnp.int32),
                        Tcw=Tcw,
                    ),
                )
                return state, True
        return state, False

    def _topup(self, m: MapState, Tcw, cand: int, frame, lm_cur: np.ndarray,
               radius: float, th_dist: float) -> np.ndarray:
        """One guided-projection pass: bind the candidate KF's still-unmatched
        landmarks to still-free keypoints through the current pose estimate.
        Returns the augmented lm-id-per-keypoint array (host i32[N])."""
        row_np = np.asarray(m.kf_lm_idx[cand])
        lm_free = ~np.isin(row_np, lm_cur[lm_cur >= 0])
        kp_free = jnp.asarray(lm_cur < 0) & frame.valid
        match_kp, row = self._topup_match(
            m, Tcw, jnp.int32(cand),
            frame.uvr[:, :2], frame.octave,
            brief.unpack_bits_pm1(frame.desc), kp_free,
            jnp.asarray(lm_free), radius, th_dist,
        )
        match_kp = np.asarray(match_kp)
        row = np.asarray(row)
        out = lm_cur.copy()
        for j in np.where(match_kp >= 0)[0]:
            kp = int(match_kp[j])
            if out[kp] < 0 and row[j] >= 0:
                out[kp] = row[j]
        return out
