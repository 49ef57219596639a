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


class _TelChunk:
    """One device->host telemetry read shared by every frame of a dispatch
    (single frame: [TEL]; chunked pipelined dispatch: [K, TEL]). The first
    finalize of the group pays the ~27 ms tunnel round trip; the rest read
    the cached host array for free."""

    __slots__ = ("dev", "host")

    def __init__(self, dev):
        self.dev = dev
        self.host = None

    def row(self, idx):
        if self.host is None:
            self.host = np.asarray(self.dev)
        return self.host if idx is None else self.host[idx]


def _rebase_aux(m, prev_valid):
    """Device-side culled-keyframe rebase info: which slots THIS chain
    culled, each one's nearest surviving keyframe (by frame id), and the
    rebase transform M = Tcw_culled @ Twc_survivor. Replaces the round-4
    host readback of kf_valid/kf_pose/kf_frame_id in
    System._rebase_culled_anchors (three ~27 ms tunnel round trips per
    keyframe, each blocking on the whole mapper chain)."""
    import jax
    import jax.numpy as jnp

    from plslam_tpu.geometry import se3

    cur_valid = m.kf_valid
    culled = prev_valid & ~cur_valid & jnp.any(cur_valid)
    fid = m.kf_frame_id
    BIG = jnp.int32(1 << 30)
    dist = jnp.where(
        cur_valid[None, :], jnp.abs(fid[:, None] - fid[None, :]), BIG
    )
    p_of = jnp.argmin(dist, axis=1).astype(jnp.int32)
    Minv = jax.vmap(se3.inverse)(m.kf_pose[p_of])
    M = jnp.einsum("kij,kjl->kil", m.kf_pose, Minv)
    return culled, p_of, M


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
        frame's pose (the reference's TrackRGBD contract, SURVEY.md §8).
        K>0 = PIPELINED mode: frames are dispatched K at a time as ONE
        chunked device program (results identical to per-frame dispatch —
        frames stay strictly sequential through the state carry), telemetry
        for the whole chunk comes back in one ~27 ms tunnel round trip, the
        per-keyframe chain is one fused dispatch whose readback overlaps
        the next frames' device compute, and track_rgbd returns the pose of
        the frame finalized during this call (None while the pipeline
        fills — exactly the first K calls). This is the reference's OWN
        concurrency model — its LocalMapping/LoopClosing threads process
        keyframes a few frames late under load (src/System.cc ~95:
        mlNewKeyFrames queue) — expressed as explicit async dispatch
        instead of threads, so it stays deterministic."""
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
        from collections import deque

        # in-flight finalizes: (_TelChunk, row_idx, frame_src, t, disp_ms)
        self._inflight: deque = deque()
        # pipelined mode: host inputs buffered until a chunk dispatch
        self._buf: list = []
        # per-keyframe chain results not yet read back: dicts with the aux
        # device array (async-copying), kf slot and loop counter snapshot
        self._pending_chain: deque = deque()
        self._last_status = 0
        self._last_frame = None
        self._lost_pending = False
        self._closure_ms_pending = 0.0  # closure wall time for the JSONL
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

        The previous TrackState is DONATED on accelerator backends — the
        masked keyframe/landmark scatters then update HBM in place (kf_desc
        alone is 8 MB; without donation every touched map array is copied
        each frame — same rationale as bench.py's chunk program). Donation
        is skipped when the state actually LIVES on CPU (derived from the
        state arrays' platform, not the process default backend — explicit
        device placement must not desynchronize the decision). Callers must
        not hold references to System.state leaves across track_rgbd calls
        on accelerators: the buffers are reused in place."""
        f = getattr(self, "_fused_step_cache", None)
        if f is None:
            import jax

            def fused(state, gray, depth, ln_sp, ln_ep, ln_valid):
                frame = self.builder._build(gray, depth, ln_sp, ln_ep, ln_valid)
                state, out = self.tracker._step(state, frame)
                return state, out, frame

            donate = (0,) if self._state_platform() != "cpu" else ()
            f = jax.jit(fused, donate_argnums=donate)
            self._fused_step_cache = f
        return f

    def _state_platform(self) -> str:
        """Platform the SLAM state actually lives on (donation decisions)."""
        try:
            return next(iter(self.state.m.kf_valid.devices())).platform
        except Exception:  # pragma: no cover - non-Array leaves
            return self._jax.default_backend()

    def _to_gray(self, rgb: np.ndarray) -> np.ndarray:
        if rgb.ndim != 3:
            return rgb
        w = (
            np.array([0.299, 0.587, 0.114])
            if self.settings.rgb
            else np.array([0.114, 0.587, 0.299])
        )
        return (rgb.astype(np.float32) @ w).astype(np.float32)

    def _device_empty_lines(self):
        # constant empties (LSD runs inside the jitted program): reuse the
        # cached device arrays — re-uploading three host zeros per frame
        # costs three tunnel transfers
        zl = getattr(self, "_zl_dev", None)
        if zl is None:
            zl = self._zl_dev = self.builder.empty_lines()
        return zl

    def _host_lines(self, gray):
        import jax.numpy as jnp

        return tuple(
            map(jnp.asarray, self.builder.detect_lines(np.asarray(gray)))
        )

    def _dispatch_single(self, gray, depth, lines, timestamp, t_start):
        """ONE fused dispatch (frame build + tracking step in a single
        jitted program) + enqueue the finalize entry. Dispatch itself is
        asynchronous and ~free; the only per-frame device->host cost is the
        telemetry read in _finalize_one."""
        import time as _time

        import jax.numpy as jnp

        ln_sp, ln_ep, ln_valid = (
            lines if lines is not None else self._device_empty_lines()
        )
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
        self._inflight.append((
            _TelChunk(tel), None, ("dev", frame), float(timestamp),
            (_time.perf_counter() - t_start) * 1e3,
        ))

    @property
    def _fused_chunk(self):
        """jit(K x (frame build + step)): the pipelined mode's dispatch unit.
        The state carry keeps the K frames strictly sequential — results are
        identical to K single-frame dispatches — but telemetry comes back as
        ONE stacked [K, TEL] array, so the whole chunk costs one tunnel
        round trip instead of K (bench.py's chunk program, promoted to the
        production path)."""
        f = getattr(self, "_fused_chunk_cache", None)
        if f is None:
            import jax
            import jax.numpy as jnp

            K = self.pipeline_depth
            per_frame_lines = self.builder.use_lines and not self.builder.device_lines

            def chunk(state, grays, depths, ln_sp, ln_ep, ln_valid):
                tels = []
                for i in range(K):
                    if per_frame_lines:
                        li = (ln_sp[i], ln_ep[i], ln_valid[i])
                    else:
                        li = (ln_sp, ln_ep, ln_valid)  # shared empties
                    frame = self.builder._build(grays[i], depths[i], *li)
                    state, out = self.tracker._step(state, frame)
                    tels.append(out.telemetry)
                return state, jnp.stack(tels)

            donate = (0,) if self._state_platform() != "cpu" else ()
            f = jax.jit(chunk, donate_argnums=donate)
            self._fused_chunk_cache = f
        return f

    def _dispatch_chunk(self):
        """Dispatch the buffered pipeline_depth frames as ONE device program
        and enqueue their finalize entries (sharing one telemetry read)."""
        import time as _time

        import jax.numpy as jnp

        K = self.pipeline_depth
        assert len(self._buf) == K
        grays = jnp.asarray(
            np.stack([b[0] for b in self._buf]), jnp.float32
        )
        depths = jnp.asarray(
            np.stack([b[1] for b in self._buf]), jnp.float32
        )
        if self.builder.use_lines and not self.builder.device_lines:
            ls = jnp.stack([b[2][0] for b in self._buf])
            le = jnp.stack([b[2][1] for b in self._buf])
            lv = jnp.stack([b[2][2] for b in self._buf])
        else:
            ls, le, lv = self._device_empty_lines()
        t0 = _time.perf_counter()
        self.state, tels = self._fused_chunk(
            self.state, grays, depths, ls, le, lv
        )
        try:
            tels.copy_to_host_async()
        except AttributeError:  # pragma: no cover
            pass
        disp_ms = (_time.perf_counter() - t0) * 1e3 / K
        tc = _TelChunk(tels)
        for i, (gray, depth, lines, ts, _) in enumerate(self._buf):
            self._inflight.append(
                (tc, i, ("host", gray, depth, lines), ts, disp_ms)
            )
        self._buf.clear()

    def track_rgbd(self, rgb: np.ndarray, depth: np.ndarray, timestamp: float):
        """rgb u8[H,W,3] or gray [H,W]; depth f32[H,W] (meters, already scaled
        by 1/DepthMapFactor — TumSequence does this) -> Tcw f64[4,4] or None.

        The host loop ONLY dispatches device programs (asynchronous, ~free);
        every host decision (keyframe chain, logging, relocalization)
        happens in _finalize_one off ONE packed telemetry read — see
        tracking.TEL_*. With pipeline_depth=0 the frame is finalized before
        returning (synchronous reference semantics: the return value is THIS
        frame's Tcw). With K>0 frames are dispatched K to a chunk program
        and finalization lags K frames, so each call returns the pose of the
        frame finalized during it (None while the pipeline fills) and the
        ~27 ms tunnel telemetry round trip is paid once per K frames."""
        import time as _time

        t_start = _time.perf_counter()
        gray = self._to_gray(rgb)
        lines = None
        if self.builder.use_lines and not self.builder.device_lines:
            lines = self._host_lines(gray)

        ret = None
        if self.pipeline_depth == 0:
            self._dispatch_single(gray, depth, lines, timestamp, t_start)
            while self._inflight:
                ret = self._finalize_one()
        else:
            self._buf.append((gray, depth, lines, float(timestamp), t_start))
            if len(self._buf) == self.pipeline_depth:
                self._dispatch_chunk()
            while (
                self._inflight
                and len(self._buf) + len(self._inflight) > self.pipeline_depth
            ):
                ret = self._finalize_one()
        if self._lost_pending:
            # a finalized frame was LOST: drain the pipeline (later in-flight
            # frames attempt in-step recovery on-device) and only run the
            # host-side BoW+PnP relocalizer if the NEWEST frame is still lost
            # (Tracking::Track ~560 attempts Relocalization while
            # mState==LOST)
            ret = self._drain_frames() or ret
            self._lost_pending = False
            if self._last_status == 2 and self._last_frame is not None:
                self.state, recovered = self._reloc.relocalize(
                    self.state, self._materialize_frame(self._last_frame)
                )
                if recovered:
                    # the working set is stale wherever we got lost; rebuild
                    # it around the keyframe relocalization snapped to
                    self.state = self.tracker.refresh_local_set(self.state)
                    self._last_status = 1
        return ret

    def _drain_frames(self):
        """Dispatch any buffered frames and finalize everything in flight."""
        import time as _time

        ret = None
        for gray, depth, lines, ts, _ in self._buf:
            self._dispatch_single(gray, depth, lines, ts, _time.perf_counter())
        self._buf.clear()
        while self._inflight:
            ret = self._finalize_one()
        return ret

    def _materialize_frame(self, fsrc):
        """FrameData of a finalized frame. Synchronous entries carry the
        device pytree; chunk entries carry the HOST inputs and rebuild on
        demand (only the rare relocalization path needs a past FrameData —
        stacking K FrameData pytrees per chunk would copy ~4 MB of descriptor
        arrays per dispatch for a path that almost never runs)."""
        if fsrc[0] == "dev":
            return fsrc[1]
        import jax.numpy as jnp

        _, gray, depth, lines = fsrc
        ln = lines if lines is not None else self._device_empty_lines()
        return self.builder._jitted(
            jnp.asarray(gray, jnp.float32), jnp.asarray(depth, jnp.float32),
            *ln,
        )

    @property
    def _kf_chain(self):
        """jit(the ENTIRE per-keyframe chain): local-mapper stages (cull,
        triangulate, fuse, local BA, refresh, keyframe cull, eviction) +
        tracking working-set refresh + BoW database row + loop-detection
        gate + culled-anchor rebase info — ONE device dispatch per keyframe
        where round 4 made ~20 plus four blocking readbacks (the 17-fps
        production-path stall, round-4 verdict Missing #1). The host reads
        back ONE packed aux vector, asynchronously, finalizes later.

        Layout of aux (K = max_kf):
          [0]                  gate fired (loop detection)
          [1,        1 +  K)   culled-by-this-chain mask
          [1 +  K,   1 + 2K)   nearest surviving KF per slot
          [1 + 2K,   1 + 18K)  rebase transforms M, row-major 4x4 per slot
          [1 + 18K,  1 + 19K)  enough-consistent candidate mask
          [1 + 19K,  1 + 20K)  BoW scores (candidate ordering)"""
        f = getattr(self, "_kf_chain_cache", None)
        if f is None:
            import jax
            import jax.numpy as jnp

            from plslam_tpu.ops import brief

            tracker = self.tracker
            mapper = self._mapper
            loop = self._loop
            reloc = self._reloc
            Kcap = tracker.max_kf

            def chain(ts, kf_bow, k, g_mask, g_consist, detect_on):
                prev_valid = ts.m.kf_valid
                m = ts.m
                if mapper is not None:
                    m = mapper._process_impl(m, k)
                # the mapper mutated landmarks after the step's in-step
                # refresh: recompute the tracking working set
                # (Tracking::UpdateLocalMap ~850)
                ts = ts._replace(
                    m=m, local_set=tracker._compute_local_set(m, ts.ref_kf)
                )
                # KeyFrameDatabase::add — BoW row for reloc + loop detect
                row = reloc.vocab.bow(
                    brief.unpack_bits_pm1(m.kf_desc[k]), m.kf_feat_valid[k]
                )
                kf_bow = kf_bow.at[k].set(row)
                if loop is not None:
                    has_any, enough, scores, g_mask, g_consist = (
                        loop._detect_gate_impl(kf_bow, m, k, g_mask, g_consist)
                    )
                    # within LOOP_MIN_KFS_SINCE_LAST of a closure: gate off,
                    # groups reset (DetectLoop ~80 early-out)
                    has_any &= detect_on
                    g_mask &= detect_on
                    g_consist = jnp.where(detect_on, g_consist, 0)
                else:
                    has_any = jnp.bool_(False)
                    enough = jnp.zeros(Kcap, bool)
                    scores = jnp.zeros(Kcap, jnp.float32)
                culled, p_of, M = _rebase_aux(m, prev_valid)
                aux = jnp.concatenate([
                    has_any.astype(jnp.float32)[None],
                    culled.astype(jnp.float32),
                    p_of.astype(jnp.float32),
                    M.reshape(-1),
                    enough.astype(jnp.float32),
                    scores,
                ])
                return ts, kf_bow, g_mask, g_consist, aux

            donate = (
                (0, 1, 3, 4) if self._state_platform() != "cpu" else ()
            )
            f = jax.jit(chain, donate_argnums=donate)
            self._kf_chain_cache = f
        return f

    def _dispatch_kf_chain(self, kf_id: int):
        """One async dispatch of the fused per-keyframe chain; the aux
        readback is deferred to _process_chain_results."""
        import jax.numpy as jnp

        loop = self._loop
        if loop is not None:
            detect_on = loop.begin_keyframe()
            g_mask, g_consist = loop._g_mask, loop._g_consist
            counter = loop._kf_counter
        else:
            detect_on = False
            dg = getattr(self, "_dummy_groups", None)
            if dg is None:
                dg = self._dummy_groups = (
                    jnp.zeros((1, self.tracker.max_kf), bool),
                    jnp.zeros(1, jnp.int32),
                )
            g_mask, g_consist = dg
            counter = 0
        self.state, self._reloc.kf_bow, g_mask, g_consist, aux = (
            self._kf_chain(
                self.state, self._reloc.kf_bow, jnp.int32(kf_id),
                g_mask, g_consist, jnp.bool_(detect_on),
            )
        )
        if loop is not None:
            loop._g_mask, loop._g_consist = g_mask, g_consist
        else:
            self._dummy_groups = (g_mask, g_consist)
        try:
            aux.copy_to_host_async()
        except AttributeError:  # pragma: no cover
            pass
        self._pending_chain.append(
            {"aux": aux, "kf_id": int(kf_id), "counter": counter}
        )

    def _process_chain_results(self, block: bool = True):
        """Host tail of dispatched keyframe chains: ONE aux readback each —
        culled-anchor rebase of replay rows, and (rarely) the loop-closure
        candidate tail when the device gate fired. With block=False only
        already-transferred aux vectors are consumed (pipelined mode: the
        readback overlaps the next frames' device compute; a forced drain
        happens at the next keyframe, LOST recovery, or flush)."""
        K = self.tracker.max_kf
        while self._pending_chain:
            e = self._pending_chain[0]
            if not block:
                ready = getattr(e["aux"], "is_ready", None)
                if ready is not None and not ready():
                    return
            self._pending_chain.popleft()
            v = np.asarray(e["aux"])
            culled = v[1:1 + K] > 0
            if culled.any():
                self._apply_rebase(
                    culled,
                    v[1 + K:1 + 2 * K].astype(np.int64),
                    v[1 + 2 * K:1 + 18 * K].reshape(K, 4, 4).astype(
                        np.float64
                    ),
                )
            loop = self._loop
            if (
                loop is not None
                and v[0] > 0
                and e["counter"] > loop.last_loop_kfn
                and bool(np.asarray(self.state.m.kf_valid)[e["kf_id"]])
            ):
                enough = v[1 + 18 * K:1 + 19 * K] > 0
                scores = v[1 + 19 * K:1 + 20 * K]
                cands = sorted(
                    np.where(enough)[0].tolist(), key=lambda c: -scores[c]
                )[: C.LOOP_MAX_CANDIDATES]
                self.state, closed = loop.try_candidates(
                    self.state, e["kf_id"], cands
                )
                if closed:
                    self.n_loops_closed = loop.n_loops_closed
                    self._closure_ms_pending += loop.last_closure_ms
                    # loop correction moved landmarks/keyframes: rebuild the
                    # tracking working set (the chain's refresh predates it)
                    self.state = self.tracker.refresh_local_set(self.state)

    def _apply_rebase(self, culled, p_of, M):
        """Re-anchor replay rows whose reference KF was culled
        (SaveTrajectoryTUM walks pKF->GetParent() for bad KFs; with recycled
        slots the rebase must land before an unrelated keyframe reuses the
        slot — _finalize_one force-drains pending chains at each new
        keyframe to guarantee that). Substitutions are recorded in
        _recent_rebase so rows of frames still in flight rebase the same way
        when they finalize."""
        ref_arr = np.asarray(self._ref_ids)
        for j in np.where(culled)[0]:
            p = int(p_of[j])
            Mj = M[j]
            for i in np.where(ref_arr == j)[0]:
                self._rel_poses[i] = self._rel_poses[i] @ Mj
                self._ref_ids[i] = p
            ref_arr[ref_arr == j] = p
            self._recent_rebase[int(j)] = (p, Mj)

    def _finalize_one(self):
        """Run the host side of the OLDEST in-flight frame: ONE telemetry
        readback (shared across a chunk), then — on keyframe frames — ONE
        fused keyframe-chain dispatch (local mapping + working-set refresh +
        BoW row + loop-detect gate + rebase info), the GBA slice pump,
        trajectory rows and the JSONL record. Returns the frame's Tcw
        f64[4,4] (or None if it was not tracked)."""
        import time as _time

        from plslam_tpu.pipeline import tracking as T

        telc, idx, fsrc, timestamp, disp_ms = self._inflight.popleft()
        t0 = _time.perf_counter()
        v = telc.row(idx)
        tracked = v[T.TEL_TRACKED] > 0
        new_kf = bool(v[T.TEL_NEW_KF] > 0)
        kf_id = int(v[T.TEL_KF_ID])
        ref_kf = int(v[T.TEL_REF_KF])
        status = int(v[T.TEL_STATUS])
        self.last_frame_was_kf = new_kf  # for latency attribution (bench)
        self._last_status = status
        self._last_frame = fsrc
        loc = self.localization_only
        if new_kf:
            # drain pending chain aux BEFORE touching the new keyframe: a
            # pending chain may have culled this very slot, and its rebase
            # must land while the slot still means the OLD keyframe
            self._process_chain_results(block=True)
            self._kf_timestamps[kf_id] = float(timestamp)
            self._recent_rebase.pop(kf_id, None)  # slot reused: subst stale
        else:
            self._process_chain_results(block=self.pipeline_depth == 0)
        if new_kf and not loc and (
            self._mapper is not None or self._loop is not None
        ):
            self._dispatch_kf_chain(kf_id)
            if self.pipeline_depth == 0:
                # synchronous semantics: the chain (incl. any loop closure)
                # settles before track_rgbd returns
                self._process_chain_results(block=True)
        elif new_kf and not loc:
            # mapper-less System: keep the reloc BoW database current
            self._reloc.observe_keyframe(self.state.m, kf_id)
        if self._loop is not None and self._loop.gba_queue and not loc:
            # time-sliced global BA: one LM slice per frame — tracking
            # continues on the partially-optimized map, the reference's
            # transient-GBA-thread behavior (see LocalBA.slice_runner)
            self.state = self._loop.pump_gba(self.state)
            if not self._loop.gba_queue:
                self.state = self.tracker.refresh_local_set(self.state)
        if status == 2:  # LOST — relocalize once the pipeline drains
            self._lost_pending = True

        rel_pose = np.asarray(v[T.TEL_REL_POSE], np.float64).reshape(4, 4)
        if ref_kf in self._recent_rebase:
            # this frame referenced a keyframe culled while it was in
            # flight: apply the same rebase _apply_rebase gave the
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
                # wall time of closures that landed during this finalize
                # (CorrectLoop end-to-end incl. device execution), 0 if none
                "closure_ms": round(self._closure_ms_pending, 1),
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
        self._closure_ms_pending = 0.0
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
        """Dispatch buffered frames, finalize every in-flight frame, settle
        pending keyframe-chain results, and drain any pending global-BA
        slices (see track_rgbd) — save/load/mode switches must see the
        fully-optimized map and complete replay rows."""
        self._drain_frames()
        self._process_chain_results(block=True)
        if self._loop is not None and self._loop.gba_queue:
            self.state = self._loop.flush_gba(self.state)

    def reset(self):
        self._inflight.clear()  # replay log is cleared below anyway
        self._buf.clear()
        self._pending_chain.clear()
        self._recent_rebase = {}
        self._lost_pending = False
        self._closure_ms_pending = 0.0
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
