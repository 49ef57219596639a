"""Local mapping: map maintenance + local bundle adjustment per keyframe.

Replaces the LocalMapping thread (src/LocalMapping.cc §Run ~30): the
reference polls a keyframe queue; here the host calls process() after each
keyframe insertion (the StepOut.new_kf flag is the queue). Stages, like the
reference's per-KF loop:

  * MapPointCulling (~180): found-ratio < 0.25 or too few observations
    shortly after creation -> invalidate (masked, no deletion).
  * (CreateNewMapPoints ~250 is mostly subsumed: RGB-D creates landmarks
    from depth at keyframe insertion, which the reference also does in
    CreateNewKeyFrame; epipolar triangulation for far points is a later
    phase.)
  * LocalBundleAdjustment (src/Optimizer.cc ~450) — solvers/local_ba.py.
  * KeyFrameCulling (~650) — later phase (needs covisibility bookkeeping).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from plslam_tpu import constants as C
from plslam_tpu.slammap.state import MapState


class LocalMapper:
    def __init__(self, tracker, enable_ba: bool = True):
        self.tracker = tracker
        self.enable_ba = enable_ba
        self._ba = None
        if enable_ba:
            try:
                from plslam_tpu.solvers.local_ba import LocalBA

                self._ba = LocalBA(tracker)
            except ImportError:  # BA module lands in a later phase
                self._ba = None

    @functools.cached_property
    def _cull(self):
        return jax.jit(self._cull_impl)

    def _cull_impl(self, m: MapState, kf_id) -> MapState:
        """MapPointCulling: the reference checks points created in the last
        2-3 keyframes; found ratio and observation count gates."""
        found_ratio = m.pt_found / jnp.clip(m.pt_visible, 1.0)
        age = kf_id - m.pt_first_kf  # in keyframes
        # Only RECENT points are cull candidates — the reference iterates
        # mlpRecentAddedMapPoints and drops survivors from the list after 3
        # KFs (MapPointCulling ~180); mature points are never re-examined.
        recent = (age >= 1) & (age <= 3) & (m.pt_first_kf < kf_id)
        bad = m.pt_valid & recent & (
            ((found_ratio < C.CULL_FOUND_RATIO) & (m.pt_visible > 2))
            | ((age >= 2) & (m.pt_nobs <= C.KF_CULL_MIN_OBS))
        )
        # MapLineCulling: same policy on the line twin
        ln_ratio = m.ln_found / jnp.clip(m.ln_visible, 1.0)
        ln_age = kf_id - m.ln_first_kf
        ln_recent = (ln_age >= 1) & (ln_age <= 3) & (m.ln_first_kf < kf_id)
        ln_bad = m.ln_valid & ln_recent & (
            ((ln_ratio < C.CULL_FOUND_RATIO) & (m.ln_visible > 2))
            | ((ln_age >= 2) & (m.ln_nobs <= C.KF_CULL_MIN_OBS))
        )
        return m._replace(
            pt_valid=m.pt_valid & ~bad, ln_valid=m.ln_valid & ~ln_bad
        )

    def process(self, m: MapState, kf_id: int) -> MapState:
        m = self._cull(m, jnp.int32(kf_id))
        if self._ba is not None:
            m = self._ba.run(m, jnp.int32(kf_id))
        return m
