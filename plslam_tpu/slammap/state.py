"""The map: a fixed-capacity struct-of-arrays pytree in HBM.

TPU-native replacement for the reference's pointer-graph map (src/Map.cc,
MapPoint.cc, MapLine.cc, KeyFrame.cc): no heap objects, no mutexes, no
observation lists — every entity lives at a fixed index in a preallocated
array with a validity mask, and "observations" are the per-keyframe
landmark-index arrays kf_lm_idx / kf_ln_idx (the functional analogue of
Frame::mvpMapPoints). Covisibility (KeyFrame::UpdateConnections ~330) is not
stored: it is one MXU matmul over the observation incidence matrix, computed
on demand (see covisibility()).

Capacity limits double as the reference's implicit "unbounded growth handled
by culling" policy (SURVEY.md §6 long-context row).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from plslam_tpu import constants as C


class MapState(NamedTuple):
    # --- keyframes ---
    kf_pose: jnp.ndarray  # f32[K, 4, 4] Tcw
    kf_valid: jnp.ndarray  # bool[K]
    kf_frame_id: jnp.ndarray  # i32[K]
    # monotonic creation sequence number per slot. Slot indices are NOT
    # creation order once the free list recycles slots, so any "age in
    # keyframes" logic (MapPointCulling ~180: cull at 2-3 KFs after
    # creation) must use this, never the slot id.
    kf_seq: jnp.ndarray  # i32[K]
    # (keyframe timestamps are host-side metadata: f32 cannot hold TUM epochs)
    # per-KF point features (BA edges + matching live here)
    kf_uv: jnp.ndarray  # f32[K, F, 3] undistorted (u, v, u_r); u_r<0: mono
    kf_octave: jnp.ndarray  # i32[K, F]
    kf_angle: jnp.ndarray  # f32[K, F]
    kf_desc: jnp.ndarray  # u8[K, F, 32]
    kf_feat_valid: jnp.ndarray  # bool[K, F]
    kf_lm_idx: jnp.ndarray  # i32[K, F] map-point id or -1
    # per-KF line features
    kf_ln_obs: jnp.ndarray  # f32[K, L, 3] observed 2D line (a, b, c) normalized
    kf_ln_idx: jnp.ndarray  # i32[K, L] map-line id or -1
    kf_ln_valid: jnp.ndarray  # bool[K, L]
    kf_ln_desc: jnp.ndarray  # u8[K, L, 32] LBD descriptors (line triangulation/fuse)
    kf_ln_sp: jnp.ndarray  # f32[K, L, 2] observed endpoint pixels
    kf_ln_ep: jnp.ndarray  # f32[K, L, 2]
    # --- map points ---
    pt_pos: jnp.ndarray  # f32[P, 3]
    pt_desc: jnp.ndarray  # u8[P, 32] distinctive descriptor
    pt_normal: jnp.ndarray  # f32[P, 3] mean viewing direction
    pt_dist: jnp.ndarray  # f32[P, 2] (dmin, dmax) scale-invariance band
    pt_valid: jnp.ndarray  # bool[P]
    pt_ref_kf: jnp.ndarray  # i32[P]
    pt_first_kf: jnp.ndarray  # i32[P]
    pt_first_seq: jnp.ndarray  # i32[P] kf_seq of the creating keyframe
    pt_nobs: jnp.ndarray  # i32[P]
    pt_visible: jnp.ndarray  # f32[P] IncreaseVisible counter
    pt_found: jnp.ndarray  # f32[P] IncreaseFound counter
    pt_replaced: jnp.ndarray  # i32[P] MapPoint::Replace forwarding (-1 none):
    # losers of a fuse point at their winner so stale references (e.g. the
    # last frame's lm_idx) can be rewritten — CheckReplacedInLastFrame
    # --- map lines ---
    ln_sw: jnp.ndarray  # f32[Q, 3] world start point
    ln_ew: jnp.ndarray  # f32[Q, 3] world end point
    ln_desc: jnp.ndarray  # u8[Q, 32] LBD descriptor
    ln_normal: jnp.ndarray  # f32[Q, 3] mean viewing direction of the midpoint
    # (MapLine::UpdateAverageDir — the MapPoint normal twin)
    ln_dist: jnp.ndarray  # f32[Q, 2] (dmin, dmax) midpoint scale band
    ln_valid: jnp.ndarray  # bool[Q]
    ln_ref_kf: jnp.ndarray  # i32[Q]
    ln_first_kf: jnp.ndarray  # i32[Q]
    ln_first_seq: jnp.ndarray  # i32[Q] kf_seq of the creating keyframe
    ln_nobs: jnp.ndarray  # i32[Q]
    ln_visible: jnp.ndarray  # f32[Q]
    ln_found: jnp.ndarray  # f32[Q]
    # --- counters ---
    n_kf: jnp.ndarray  # i32[] number of VALID keyframes (slots are reused)
    n_pt: jnp.ndarray  # i32[] number of valid map points
    n_ln: jnp.ndarray  # i32[] number of valid map lines
    next_kf_seq: jnp.ndarray  # i32[] monotonic keyframe creation counter


def empty_map(
    max_kf: int = C.MAX_KF,
    max_feat: int = C.MAX_FEAT,
    max_lines: int = C.MAX_LINES,
    max_pts: int = C.MAX_PTS,
    max_maplines: int = C.MAX_MAPLINES,
) -> MapState:
    K, F, L, P, Q = max_kf, max_feat, max_lines, max_pts, max_maplines
    f32, i32 = jnp.float32, jnp.int32
    return MapState(
        kf_pose=jnp.tile(jnp.eye(4, dtype=f32), (K, 1, 1)),
        kf_valid=jnp.zeros(K, bool),
        kf_frame_id=jnp.zeros(K, i32),
        kf_seq=jnp.zeros(K, i32),
        kf_uv=jnp.zeros((K, F, 3), f32),
        kf_octave=jnp.zeros((K, F), i32),
        kf_angle=jnp.zeros((K, F), f32),
        kf_desc=jnp.zeros((K, F, 32), jnp.uint8),
        kf_feat_valid=jnp.zeros((K, F), bool),
        kf_lm_idx=jnp.full((K, F), -1, i32),
        kf_ln_obs=jnp.zeros((K, L, 3), f32),
        kf_ln_idx=jnp.full((K, L), -1, i32),
        kf_ln_valid=jnp.zeros((K, L), bool),
        kf_ln_desc=jnp.zeros((K, L, 32), jnp.uint8),
        kf_ln_sp=jnp.zeros((K, L, 2), f32),
        kf_ln_ep=jnp.zeros((K, L, 2), f32),
        pt_pos=jnp.zeros((P, 3), f32),
        pt_desc=jnp.zeros((P, 32), jnp.uint8),
        pt_normal=jnp.zeros((P, 3), f32),
        pt_dist=jnp.zeros((P, 2), f32),
        pt_valid=jnp.zeros(P, bool),
        pt_ref_kf=jnp.zeros(P, i32),
        pt_first_kf=jnp.zeros(P, i32),
        pt_first_seq=jnp.zeros(P, i32),
        pt_nobs=jnp.zeros(P, i32),
        pt_visible=jnp.ones(P, f32),
        pt_found=jnp.ones(P, f32),
        pt_replaced=jnp.full(P, -1, i32),
        ln_sw=jnp.zeros((Q, 3), f32),
        ln_ew=jnp.zeros((Q, 3), f32),
        ln_desc=jnp.zeros((Q, 32), jnp.uint8),
        ln_normal=jnp.zeros((Q, 3), f32),
        ln_dist=jnp.zeros((Q, 2), f32),
        ln_valid=jnp.zeros(Q, bool),
        ln_ref_kf=jnp.zeros(Q, i32),
        ln_first_kf=jnp.zeros(Q, i32),
        ln_first_seq=jnp.zeros(Q, i32),
        ln_nobs=jnp.zeros(Q, i32),
        ln_visible=jnp.ones(Q, f32),
        ln_found=jnp.ones(Q, f32),
        n_kf=jnp.zeros((), i32),
        n_pt=jnp.zeros((), i32),
        n_ln=jnp.zeros((), i32),
        next_kf_seq=jnp.zeros((), i32),
    )


_LANES = 128


def _incidence_counts(ids, ok, P, w=None, reduce_rows=False):
    """Observation counts from per-row id lists: i32[K, P] with
    out[k, p] = sum_f w[k, f] * (ids[k, f] == p), masked by ok — or, with
    reduce_rows=True, the i32[P] column sums without materializing [K, P].

    NOT a scatter — a [K*F]-element indexed update lowers to a slow
    sort/serial loop on TPU (measured multi-ms per call, and the keyframe
    chain builds incidence ~10x). Split each id into (hi, lo) =
    (id >> 7, id & 127) one-hots and contract on the MXU (int8 operands,
    i32 accumulation — exact), the same trick as the tracking working-set
    covisibility scan (pipeline/tracking.py _compute_local_set)."""
    K, F = ids.shape
    R = (P + _LANES - 1) // _LANES
    idc = jnp.where(ok, ids, 0)
    oh_lo = (
        (idc & (_LANES - 1))[..., None]
        == jnp.arange(_LANES, dtype=jnp.int32)
    ).astype(jnp.int8)  # [K, F, 128]
    hi = (idc >> 7)[..., None] == jnp.arange(R, dtype=jnp.int32)
    wgt = ok.astype(jnp.int8) if w is None else jnp.where(ok, w, 0).astype(jnp.int8)
    oh_hi = hi.astype(jnp.int8) * wgt[..., None]  # [K, F, R]
    if reduce_rows:
        cnt = jax.lax.dot_general(
            oh_hi, oh_lo, (((0, 1), (0, 1)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [R, 128]
        return cnt.reshape(R * _LANES)[:P]
    cnt = jax.lax.dot_general(
        oh_hi, oh_lo, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )  # [K, R, 128]
    return cnt.reshape(K, R * _LANES)[:, :P]


def observation_matrix(m: MapState):
    """bool[K, P] incidence: keyframe k observes map point p.

    The covisibility graph, the inverted-index queries, and local-BA edge
    enumeration all derive from this one matrix (one-hot MXU contraction,
    see _incidence_counts)."""
    P = m.pt_valid.shape[0]
    ok = (m.kf_lm_idx >= 0) & m.kf_feat_valid & m.kf_valid[:, None]
    return _incidence_counts(m.kf_lm_idx, ok, P) > 0


def clear_dead_references(m: MapState) -> MapState:
    """Drop kf_lm_idx / kf_ln_idx references to invalidated landmarks.

    Required for slot reuse: a culled landmark's slot may be reallocated to
    a brand-new landmark, so stale references must not survive the cull
    (the reference's EraseObservation does this eagerly per observation)."""
    lm = m.kf_lm_idx
    lm_ok = (lm >= 0) & m.pt_valid[jnp.clip(lm, 0)]
    ln = m.kf_ln_idx
    ln_ok = (ln >= 0) & m.ln_valid[jnp.clip(ln, 0)]
    return m._replace(
        kf_lm_idx=jnp.where(lm_ok, lm, -1),
        kf_ln_idx=jnp.where(ln_ok, ln, -1),
    )


def refresh_counts(m: MapState) -> MapState:
    """n_kf / n_pt / n_ln = number of currently-valid entities (slots are
    reused, so these are live counts, not monotonic watermarks)."""
    return m._replace(
        n_kf=jnp.sum(m.kf_valid).astype(jnp.int32),
        n_pt=jnp.sum(m.pt_valid).astype(jnp.int32),
        n_ln=jnp.sum(m.ln_valid).astype(jnp.int32),
    )


def weighted_point_nobs(m: MapState):
    """i32[P]: reference nobs semantics (MapPoint::AddObservation
    src/MapPoint.cc ~80) — stereo observations (u_r >= 0) count 2, mono
    (depthless, e.g. epipolar-triangulated far points) count 1."""
    P = m.pt_valid.shape[0]
    ok = (m.kf_lm_idx >= 0) & m.kf_feat_valid & m.kf_valid[:, None]
    w = jnp.where(m.kf_uv[..., 2] >= 0, 2, 1).astype(jnp.int32)
    return _incidence_counts(m.kf_lm_idx, ok, P, w=w, reduce_rows=True)


def line_observation_matrix(m: MapState):
    """bool[K, Q] incidence: keyframe k observes map line q (kf_ln_idx
    analogue of observation_matrix)."""
    Q = m.ln_valid.shape[0]
    ok = (m.kf_ln_idx >= 0) & m.kf_ln_valid & m.kf_valid[:, None]
    return _incidence_counts(m.kf_ln_idx, ok, Q) > 0


def covisibility(m: MapState, obs=None):
    """i32[K, K] shared-landmark counts (KeyFrame::UpdateConnections ~330),
    zero diagonal. One bf16 matmul on the MXU."""
    if obs is None:
        obs = observation_matrix(m)
    o = obs.astype(jnp.bfloat16)
    w = jax.lax.dot_general(
        o, o, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(jnp.int32)
    return w * (1 - jnp.eye(w.shape[0], dtype=jnp.int32))


def point_obs_count(m: MapState, obs=None):
    """i32[P]: number of keyframes observing each point."""
    if obs is None:
        obs = observation_matrix(m)
    return jnp.sum(obs, 0).astype(jnp.int32)
