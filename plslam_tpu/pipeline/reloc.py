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
from plslam_tpu.matching.points import match_descriptors
from plslam_tpu.ops import brief
from plslam_tpu.slammap.state import MapState
from plslam_tpu.solvers.pose import PointObs, pose_optimization


class Relocalizer:
    """BoW database + PnP relocalization. Host state: one BoW row per KF
    slot (kf_bow) — rebuilt on map load, cleared on reset."""

    def __init__(self, tracker, vocab: Vocabulary | None = None):
        self.tracker = tracker
        self.vocab = vocab or Vocabulary()
        self.kf_bow = np.zeros((tracker.max_kf, self.vocab.n_words), np.float32)

    def reset(self):
        """Stale BoW rows of a discarded map must not score against the new
        map's keyframes in recycled slots (System::Reset)."""
        self.kf_bow[:] = 0.0

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

    # --------------------------------------------------------------- database
    def observe_keyframe(self, m: MapState, k: int):
        """Add keyframe slot k to the BoW database
        (KeyFrameDatabase::add). LoopCloser.detect() does this itself (it
        needs the row mid-flight); the bare Relocalizer calls this from
        System after every keyframe insertion."""
        self.kf_bow[k] = np.asarray(self._bow_of_kf(m.kf_desc[k], m.kf_feat_valid[k]))

    def rebuild_database(self, m: MapState):
        """Recompute BoW rows for every valid keyframe — required after
        System.load_map (the BoW rows are host state, not part of the
        snapshot pytree)."""
        self.kf_bow[:] = 0.0
        for k in np.where(np.asarray(m.kf_valid))[0]:
            self.observe_keyframe(m, int(k))

    def _tfidf_scores(self, bow: np.ndarray, kf_valid: np.ndarray) -> np.ndarray:
        """DBoW2 L1 similarity with TF-IDF weighting (TemplatedVocabulary
        uses idf-weighted BowVectors; the round-1 plain-histogram scoring had
        no discriminative power over common words). idf is computed online
        over the CURRENT keyframes — equivalent in effect to the reference's
        corpus idf, and it adapts to the actual scene."""
        rows = self.kf_bow
        df = ((rows > 0) & kf_valid[:, None]).sum(0).astype(np.float32)
        n_docs = max(int(kf_valid.sum()), 1)
        idf = np.log(n_docs / (1.0 + df)) + 1.0  # smoothed, >= ~0
        idf = np.maximum(idf, 0.0)

        def norm(v):
            w = v * idf
            s = np.abs(w).sum(axis=-1, keepdims=True)
            return w / np.maximum(s, 1e-9)

        q = norm(bow[None])[0]
        kw = norm(rows)
        return 1.0 - 0.5 * np.abs(kw - q[None]).sum(-1)

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
            pts = PointObs(
                xw=xw,
                obs=frame.uvr,
                inv_sigma2=inv_s2,
                is_stereo=frame.depth > 0,
                valid=has,
            )
            Tcw, inl, _ = pose_optimization(pnp.Tcw, pts, tr.K, tr.bf)
            n = int(np.asarray(inl & has).sum())
            if n >= C.MIN_INLIERS_AFTER_RELOC:
                state = state._replace(
                    status=jnp.int32(1),
                    vel_ok=jnp.bool_(False),
                    ref_kf=jnp.int32(int(cand)),
                    last=state.last._replace(
                        uvr=frame.uvr, octave=frame.octave, angle=frame.angle,
                        desc=frame.desc, depth=frame.depth, valid=frame.valid,
                        lm_idx=jnp.where(inl & has, jnp.asarray(lm_of_kp), -1),
                        Tcw=Tcw,
                    ),
                )
                return state, True
        return state, False
