"""System facade: the reference's public API, frame-in / trajectory-out.

Mirrors include/System.h (SURVEY.md §8):
    System(settings, sensor="rgbd")            <- System::System (vocab is
        optional here: loop closing trains/loads its own compact vocab)
    track_rgbd(rgb, depth, t) -> 4x4 Tcw | None   <- System::TrackRGBD (~230)
    save_trajectory_tum(path)                     <- SaveTrajectoryTUM (~450)
    save_keyframe_trajectory_tum(path)            <- SaveKeyFrameTrajectoryTUM
    reset() / shutdown() / get_tracking_state()
    activate_localization_mode() / deactivate_localization_mode()

The reference spawns LocalMapping/LoopClosing threads in the ctor
(src/System.cc ~95-110); here those stages are device programs the host
invokes after keyframe insertion — same dataflow, no threads, deterministic.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from plslam_tpu import constants as C
from plslam_tpu.config import Settings, load_settings
from plslam_tpu.io import trajectory as traj_io

TRACKING_STATES = {0: "NOT_INITIALIZED", 1: "OK", 2: "LOST"}


class System:
    def __init__(
        self,
        settings: Settings | str | Path,
        sensor: str = "rgbd",
        use_local_mapping: bool = True,
        use_loop_closing: bool | None = None,
        max_kf: int = C.MAX_KF,
        max_pts: int = C.MAX_PTS,
        log_path: str | Path | None = None,
        pipeline_depth: int = 0,
    ):
        """log_path: append one JSON line per tracked frame (schema:
        frame, t, state, inliers, matches, new_kf, kf_slot, n_kf, n_pt,
        n_ln, loops_closed, gba_pending, ms).

        pipeline_depth: number of frames kept IN FLIGHT before host
        bookkeeping (keyframe chain, logging, trajectory rows) runs for a
        frame. 0 (default) = fully synchronous: track_rgbd returns THIS
        frame's pose. K>0 = the device->host telemetry round trip (~25-30 ms
        on the tunnel-attached TPU, independent of payload size) overlaps K
        frames of device compute, and track_rgbd returns the pose of the
        frame finalized during this call (None while the pipeline fills).
        This is the reference's OWN concurrency model — its LocalMapping/
        LoopClosing threads process keyframes a few frames late under load
        (src/System.cc ~95: mlNewKeyFrames queue) — expressed as explicit
        async dispatch instead of threads, so it stays deterministic."""
        if sensor.lower() != "rgbd":
            raise ValueError("only the RGB-D pipeline is supported (like the reference fork)")
        if not isinstance(settings, Settings):
            settings = load_settings(settings)
        self.settings = settings

        import jax

        from plslam_tpu.features.frame import FrameBuilder
        from plslam_tpu.pipeline.tracking import Tracker

        self._jax = jax
        self.builder = FrameBuilder(settings)
        self.use_local_mapping = use_local_mapping
        self.use_loop_closing = (
            settings.use_loop_closing if use_loop_closing is None else use_loop_closing
        )
        # System recomputes the tracking working set AFTER the mapper/loop
        # chain mutates landmarks (track_rgbd below), so the step's own
        # KF-frame refresh would be overwritten immediately — skip it (it is
        # the single most expensive piece of a KF frame's step, ~4.7 ms:
        # the covisibility scan's [MAX_KF, MAX_FEAT] membership gather).
        # Bare-Tracker users (bench.py) keep the in-step refresh.
        self.tracker = Tracker(
            settings, max_kf=max_kf, max_pts=max_pts,
            in_step_local_refresh=not (
                self.use_local_mapping or self.use_loop_closing
            ),
        )
        self.state = self.tracker.init_state()
        self._mapper = None
        if use_local_mapping:
            from plslam_tpu.pipeline.mapping import LocalMapper

            self._mapper = LocalMapper(self.tracker)
        self._loop = None
        if self.use_loop_closing:
            from plslam_tpu.pipeline.loopclosing import LoopCloser

            self._loop = LoopCloser(self.tracker)
            self._reloc = self._loop  # LoopCloser IS-A Relocalizer
        else:
            # relocalization is part of TRACKING in the reference
            # (Tracking::Relocalization ~1300) — always available, with or
            # without the loop-closing module
            from plslam_tpu.pipeline.reloc import Relocalizer

            self._reloc = Relocalizer(self.tracker)
        self.localization_only = False
        self.n_loops_closed = 0
        self.pipeline_depth = int(pipeline_depth)
        # in-flight frames: (telemetry, FrameData, timestamp, dispatch_ms)
        from collections import deque

        self._inflight: deque = deque()
        self._last_status = 0
        self._last_frame = None
        self._lost_pending = False
        # culled-KF rebase substitutions for rows not yet appended:
        # slot -> (surviving slot, Tcw_culled @ Twc_surviving); an entry
        # expires when a new keyframe reuses the slot (_finalize_one)
        self._recent_rebase: dict[int, tuple[int, np.ndarray]] = {}
        self.last_frame_was_kf = False
        # per-frame structured log (SURVEY.md §6 metrics row): one JSON line
        # per frame — the observability the reference only had via Pangolin
        self._log_fh = None
        if log_path is not None:
            self._log_fh = open(log_path, "a", buffering=1)
        # per-frame trajectory log (host side): SaveTrajectoryTUM replay data
        self._timestamps: list[float] = []
        self._kf_timestamps: dict[int, float] = {}
        self._rel_poses: list[np.ndarray] = []
        self._ref_ids: list[int] = []
        self._tracked: list[bool] = []

    # ------------------------------------------------------------------ track
    @property
    def _fused_step(self):
        """jit(frame build + tracking step): one device dispatch per frame.

        The previous TrackState is DONATED on the TPU backend — the masked
        keyframe/landmark scatters then update HBM in place (kf_desc alone
        is 8 MB; without donation every touched map array is copied each
        frame — same rationale as bench.py's chunk program). Donation is
        skipped on CPU (the test backend ignores it with a warning)."""
        f = getattr(self, "_fused_step_cache", None)
        if f is None:
            import functools

            import jax

            def fused(state, gray, depth, ln_sp, ln_ep, ln_valid):
                frame = self.builder._build(gray, depth, ln_sp, ln_ep, ln_valid)
                state, out = self.tracker._step(state, frame)
                return state, out, frame

            donate = (0,) if jax.default_backend() != "cpu" else ()
            f = jax.jit(fused, donate_argnums=donate)
            self._fused_step_cache = f
        return f

    def track_rgbd(self, rgb: np.ndarray, depth: np.ndarray, timestamp: float):
        """rgb u8[H,W,3] or gray [H,W]; depth f32[H,W] (meters, already scaled
        by 1/DepthMapFactor — TumSequence does this) -> Tcw f64[4,4] or None.

        The host loop ONLY dispatches device programs and enqueues the
        frame's telemetry (one packed f32 vector the step program emits —
        see tracking.TEL_*); every host decision (keyframe chain, logging,
        relocalization) happens in _finalize_one off that single read.
        With pipeline_depth=0 the frame is finalized before returning
        (synchronous semantics); with K>0 finalize lags K frames so the
        ~25-30 ms tunnel round trip overlaps device compute."""
        import time as _time

        import jax.numpy as jnp

        t_start = _time.perf_counter()

        gray = rgb
        if gray.ndim == 3:
            w = (
                np.array([0.299, 0.587, 0.114])
                if self.settings.rgb
                else np.array([0.114, 0.587, 0.299])
            )
            gray = (rgb.astype(np.float32) @ w).astype(np.float32)
        if self.builder.device_lines or not self.builder.use_lines:
            # constant empties (LSD runs inside the jitted program): reuse
            # the cached device arrays — re-uploading three host zeros per
            # frame costs three tunnel transfers
            zl = getattr(self, "_zl_dev", None)
            if zl is None:
                zl = self._zl_dev = self.builder.empty_lines()
            ln_sp, ln_ep, ln_valid = zl
        else:
            ln_sp, ln_ep, ln_valid = map(
                jnp.asarray, self.builder.detect_lines(np.asarray(gray))
            )
        # ONE fused dispatch per frame (frame build + tracking step in a
        # single jitted program): per-dispatch host+tunnel overhead measured
        # ~25 ms on the 1-core tunnel-attached host (bench.py chunk fit), so
        # the previous builder-then-step pair paid it twice. The fused
        # program is the same composition the official bench runs.
        self.state, out, frame = self._fused_step(
            self.state,
            jnp.asarray(gray, jnp.float32),
            jnp.asarray(depth, jnp.float32),
            ln_sp, ln_ep, ln_valid,
        )
        tel = out.telemetry
        try:
            tel.copy_to_host_async()  # start the D2H transfer NOW
        except AttributeError:  # pragma: no cover - backend without async
            pass
        self._inflight.append(
            (tel, frame, float(timestamp),
             (_time.perf_counter() - t_start) * 1e3)
        )
        ret = None
        while len(self._inflight) > self.pipeline_depth:
            ret = self._finalize_one()
        if self._lost_pending:
            # a finalized frame was LOST: drain the pipeline (later in-flight
            # frames attempt in-step recovery on-device) and only run the
            # host-side BoW+PnP relocalizer if the NEWEST frame is still lost
            # (Tracking::Track ~560 attempts Relocalization while
            # mState==LOST)
            while self._inflight:
                ret = self._finalize_one()
            self._lost_pending = False
            if self._last_status == 2 and self._last_frame is not None:
                self.state, recovered = self._reloc.relocalize(
                    self.state, self._last_frame
                )
                if recovered:
                    # the working set is stale wherever we got lost; rebuild
                    # it around the keyframe relocalization snapped to
                    self.state = self.tracker.refresh_local_set(self.state)
                    self._last_status = 1
        return ret

    def _finalize_one(self):
        """Run the host side of the OLDEST in-flight frame: ONE telemetry
        readback, then the keyframe chain (local mapping, loop closing,
        working-set refresh, GBA slice, culled-anchor rebase), trajectory
        rows and the JSONL record. Returns the frame's Tcw f64[4,4] (or None
        if it was not tracked)."""
        import time as _time

        from plslam_tpu.pipeline import tracking as T

        tel, frame, timestamp, disp_ms = self._inflight.popleft()
        t0 = _time.perf_counter()
        v = np.asarray(tel)  # the ONLY per-frame device->host round trip
        tracked = v[T.TEL_TRACKED] > 0
        new_kf = bool(v[T.TEL_NEW_KF] > 0)
        kf_id = int(v[T.TEL_KF_ID])
        ref_kf = int(v[T.TEL_REF_KF])
        status = int(v[T.TEL_STATUS])
        self.last_frame_was_kf = new_kf  # for latency attribution (bench)
        self._last_status = status
        self._last_frame = frame
        if new_kf:
            self._kf_timestamps[kf_id] = float(timestamp)
            self._recent_rebase.pop(kf_id, None)  # slot reused: subst stale
        loc = self.localization_only
        prev_kf_valid = (
            v[T.TEL_KF_VALID:].astype(bool) if new_kf and not loc else None
        )
        if new_kf and self._mapper is not None and not loc:
            self.state = self.state._replace(
                m=self._mapper.process(self.state.m, kf_id)
            )
        if self._loop is not None and new_kf and not loc:
            self.state, closed = self._loop.process(self.state, kf_id)
            if closed:
                self.n_loops_closed = self._loop.n_loops_closed
        if new_kf and not loc and (
            self._mapper is not None or self._loop is not None
        ):
            # mapper triangulation/fuse/culling and loop correction mutate
            # landmarks outside the step: recompute the tracking working set
            # (the in-step refresh at KF insertion predates those edits)
            self.state = self.tracker.refresh_local_set(self.state)
        if self._loop is not None and self._loop.gba_queue and not loc:
            # time-sliced global BA: one LM slice per frame — tracking
            # continues on the partially-optimized map, the reference's
            # transient-GBA-thread behavior (see LocalBA.slice_runner)
            self.state = self._loop.pump_gba(self.state)
            if not self._loop.gba_queue:
                self.state = self.tracker.refresh_local_set(self.state)
        if prev_kf_valid is not None:
            # keyframes culled by THIS frame's mapper/loop chain: re-anchor
            # replay rows now, before any later step reuses the slot (later
            # steps already dispatched could only allocate slots that were
            # free BEFORE this cull, so the comparison is race-free)
            self._rebase_culled_anchors(prev_kf_valid)
        if new_kf and self._loop is None and not loc:
            # keep the reloc BoW database current (LoopCloser.detect does
            # this itself when loop closing is on)
            self._reloc.observe_keyframe(self.state.m, kf_id)
        if status == 2:  # LOST — relocalize once the pipeline drains
            self._lost_pending = True

        rel_pose = np.asarray(v[T.TEL_REL_POSE], np.float64).reshape(4, 4)
        if ref_kf in self._recent_rebase:
            # this frame referenced a keyframe culled while it was in
            # flight: apply the same rebase _rebase_culled_anchors gave the
            # already-appended rows
            p, M = self._recent_rebase[ref_kf]
            rel_pose = rel_pose @ M
            ref_kf = p
        self._timestamps.append(float(timestamp))
        self._rel_poses.append(rel_pose)
        self._ref_ids.append(ref_kf)
        self._tracked.append(bool(tracked))
        if self._log_fh is not None:
            import json

            self._log_fh.write(json.dumps({
                "frame": len(self._timestamps) - 1,
                "t": float(timestamp),
                "state": TRACKING_STATES[status],
                "inliers": int(v[T.TEL_N_INLIERS]),
                "matches": int(v[T.TEL_N_MATCHES]),
                "new_kf": new_kf,
                "kf_slot": kf_id if new_kf else -1,
                "n_kf": int(v[T.TEL_N_KF]),
                "n_pt": int(v[T.TEL_N_PT]),
                "n_ln": int(v[T.TEL_N_LN]),
                "loops_closed": self.n_loops_closed,
                # slices of a time-sliced global BA still pending after this
                # frame — attributes a closure's spread-out frame-time cost
                # (LoopClosing::RunGlobalBundleAdjustment analogue)
                "gba_pending": len(self._loop.gba_queue) if self._loop else 0,
                # host cost attributable to this frame: its dispatch time
                # plus its finalize (keyframe chain + bookkeeping) time
                "ms": round(
                    disp_ms + (_time.perf_counter() - t0) * 1e3, 2
                ),
            }) + "\n")
        if not tracked:
            return None
        return np.asarray(v[T.TEL_TCW], np.float64).reshape(4, 4)

    # ------------------------------------------------------------------- mode
    def activate_localization_mode(self):
        """Tracking-only replay (System::ActivateLocalizationMode): the
        jitted step stops inserting keyframes/landmarks and stops mutating
        visibility counters — the map pytree stays bit-identical."""
        import jax.numpy as jnp

        self._flush_pending()  # finish any in-flight GBA before freezing
        self.localization_only = True
        self.state = self.state._replace(only_tracking=jnp.bool_(True))

    def deactivate_localization_mode(self):
        import jax.numpy as jnp

        self.localization_only = False
        self.state = self.state._replace(only_tracking=jnp.bool_(False))

    def get_tracking_state(self) -> str:
        return TRACKING_STATES[int(self.state.status)]

    @property
    def tracked_flags(self) -> list:
        """Per-frame tracked flags of every FINALIZED frame, in frame order
        (pipelined callers can't count track_rgbd return values — the first
        pipeline_depth calls return None while the pipeline fills)."""
        return list(self._tracked)

    def map_changed(self) -> bool:
        return bool(self.state.m.n_kf > 0)

    def get_tracked_map_points(self) -> np.ndarray:
        """World positions of landmarks tracked in the current frame."""
        lm = np.asarray(self.state.last.lm_idx)
        pos = np.asarray(self.state.m.pt_pos)
        return pos[lm[lm >= 0]]

    def _flush_pending(self):
        """Finalize every in-flight frame and drain any pending global-BA
        slices (see track_rgbd) — save/load/mode switches must see the
        fully-optimized map and complete replay rows."""
        while self._inflight:
            self._finalize_one()
        if self._loop is not None and self._loop.gba_queue:
            self.state = self._loop.flush_gba(self.state)

    def reset(self):
        self._inflight.clear()  # replay log is cleared below anyway
        self._recent_rebase = {}
        self._lost_pending = False
        self._last_status = 0
        self._last_frame = None
        self.state = self.tracker.init_state()
        self._timestamps, self._rel_poses = [], []
        self._ref_ids, self._tracked = [], []
        self._kf_timestamps = {}
        self._reloc.reset()  # stale BoW rows must not score vs the new map
        self.n_loops_closed = 0

    def shutdown(self):
        self._flush_pending()
        if hasattr(self, "_jax"):
            self._jax.block_until_ready(self.state)
        if self._log_fh is not None:
            self._log_fh.close()
            self._log_fh = None

    # ------------------------------------------------------------------- save
    def save_map(self, path: str | Path):
        """Snapshot the full SLAM state (map + tracking carry) to npz —
        a capability the reference lacks entirely (SURVEY.md §6). Host-side
        keyframe state travels with the pytree: per-slot timestamps (so
        save_keyframe_trajectory_tum after load_map writes real TUM
        timestamps, SURVEY.md §4.5) and the BoW database rows (so
        reloc/loop detection resume exactly, no rebuild drift)."""
        from plslam_tpu.io.snapshot import save_state

        self._flush_pending()  # the snapshot must be the fully-optimized map
        n = int(self.tracker.max_kf)
        kf_ts = np.zeros(n, np.float64)
        for slot, t in self._kf_timestamps.items():
            if 0 <= slot < n:
                kf_ts[slot] = t
        save_state(
            path, self.state,
            extra={"kf_timestamps": kf_ts, "kf_bow": np.asarray(self._reloc.kf_bow)},
        )

    def load_map(self, path: str | Path):
        """Restore a snapshot; combine with activate_localization_mode()
        for tracking-only replay against a prebuilt map."""
        from plslam_tpu.io.snapshot import load_state

        self._flush_pending()  # rebase against the OUTGOING map's poses
        was_loc = self.localization_only
        self.state, extras = load_state(path, self.state, want_extra=True)
        # the snapshot carries its own only_tracking flag — re-assert the
        # live System's mode over it
        (self.activate_localization_mode if was_loc
         else self.deactivate_localization_mode)()
        kf_valid = np.asarray(self.state.m.kf_valid)
        if "kf_timestamps" in extras:
            ts = np.asarray(extras["kf_timestamps"], np.float64)
            self._kf_timestamps = {
                int(i): float(ts[i])
                for i in np.where(kf_valid[: len(ts)])[0]
            }
        if "kf_bow" in extras and (
            extras["kf_bow"].shape == self._reloc.kf_bow.shape
        ):
            self._reloc.load_database(extras["kf_bow"])
        else:
            # older snapshot (or a vocabulary-size change): BoW rows are
            # recomputable from kf_desc — rebuild so relocalization (and
            # loop detection) work on the loaded map
            self._reloc.rebuild_database(self.state.m)
        # older snapshots predate the local_set field (the loader keeps the
        # template's empty set); always rebuild around the restored ref KF
        self.state = self.tracker.refresh_local_set(self.state)

    def _rebase_culled_anchors(self, prev_kf_valid: np.ndarray):
        """Re-anchor replay poses of frames whose reference KF was just
        culled (SaveTrajectoryTUM walks pKF->GetParent() for bad KFs; with
        recycled slots the rebase must happen EAGERLY, before the slot is
        reused by an unrelated keyframe — and a culled KF's frozen pose
        would also never receive loop corrections). Substitutions are also
        recorded in _recent_rebase so rows of frames still in flight get the
        same rebase when they finalize (entries expire when a new keyframe
        reuses the slot)."""
        m = self.state.m
        # start all three transfers before blocking: round trips overlap
        for a in (m.kf_valid, m.kf_pose, m.kf_frame_id):
            try:
                a.copy_to_host_async()
            except AttributeError:  # pragma: no cover
                break
        cur_valid = np.asarray(m.kf_valid)
        culled = prev_kf_valid[: len(cur_valid)] & ~cur_valid
        if not culled.any():
            return
        poses = np.asarray(m.kf_pose, np.float64)
        fids = np.asarray(m.kf_frame_id)
        valid_slots = np.where(cur_valid)[0]
        if len(valid_slots) == 0:
            return
        ref_arr = np.asarray(self._ref_ids)
        for j in np.where(culled)[0]:
            # nearest surviving keyframe in time; the culled slot still
            # holds j's (BA-consistent) pose at this point
            p = int(valid_slots[np.argmin(np.abs(fids[valid_slots] - fids[j]))])
            M = poses[j] @ np.linalg.inv(poses[p])  # Tcw_j * Twc_p
            for i in np.where(ref_arr == j)[0]:
                self._rel_poses[i] = self._rel_poses[i] @ M
                self._ref_ids[i] = p
            self._recent_rebase[int(j)] = (p, M)

    def save_trajectory_tum(self, path: str | Path):
        self._flush_pending()
        traj_io.save_trajectory_tum(
            path,
            self._timestamps,
            self._rel_poses,
            self._ref_ids,
            np.asarray(self.state.m.kf_pose),
            tracked_mask=self._tracked,
        )

    def save_keyframe_trajectory_tum(self, path: str | Path):
        # same flush as save_trajectory_tum: with GBA slices pending the two
        # save paths must write from the SAME (fully optimized) map
        self._flush_pending()
        m = self.state.m
        n = m.kf_pose.shape[0]
        stamps = np.array([self._kf_timestamps.get(i, 0.0) for i in range(n)])
        traj_io.save_keyframe_trajectory_tum(
            path, stamps, np.asarray(m.kf_pose), np.asarray(m.kf_valid)
        )

    def dump_debug_images(self, out_dir: str | Path, gray=None):
        """Headless Viewer/FrameDrawer/MapDrawer equivalent (io/viewer.py):
        writes frame.png (if gray given) and map.png."""
        import cv2

        from plslam_tpu.io import viewer

        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        if gray is not None:
            cv2.imwrite(str(out / "frame.png"), viewer.draw_frame(np.asarray(gray), self.state))
        cv2.imwrite(str(out / "map.png"), viewer.draw_map(self.state))

    # ------------------------------------------------------------------ state
    @property
    def n_keyframes(self) -> int:
        return int(self.state.m.n_kf)

    @property
    def n_map_points(self) -> int:
        return int(np.asarray(self.state.m.pt_valid).sum())
