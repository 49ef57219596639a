"""End-to-end tracking on the synthetic sequence (SURVEY.md §5 integration
tests; driver config 1 analogue: point-only tracking, no loop closure,
CPU-runnable)."""

import numpy as np
import pytest

import jax.numpy as jnp

from plslam_tpu.eval import ate_rmse
from plslam_tpu.io.synthetic import SyntheticSequence
from plslam_tpu.system import System


@pytest.fixture(scope="module")
def small_seq():
    return SyntheticSequence(n_frames=20, height=240, width=320, seed=3)


@pytest.fixture(scope="module")
def small_system_run(small_seq):
    slam = System(small_seq.settings, max_pts=4096, max_kf=32)
    poses = []
    for i in range(small_seq.n_frames):
        gray, depth, t = small_seq.frame(i)
        Tcw = slam.track_rgbd(gray, depth, t)
        poses.append(Tcw)
    return slam, poses


class TestE2ETracking:
    def test_all_frames_tracked(self, small_system_run):
        slam, poses = small_system_run
        assert all(p is not None for p in poses)
        assert slam.get_tracking_state() == "OK"
        assert slam.n_keyframes >= 1
        assert slam.n_map_points > 100

    def test_ate_small(self, small_system_run, small_seq, tmp_path):
        slam, _ = small_system_run
        out = tmp_path / "traj.txt"
        slam.save_trajectory_tum(out)
        from plslam_tpu.io.trajectory import load_trajectory_tum

        est = load_trajectory_tum(out)
        rmse, n = ate_rmse(est, small_seq.gt_trajectory())
        assert n == small_seq.n_frames
        assert rmse < 0.01, f"ATE {rmse * 100:.2f} cm"

    def test_trajectory_format(self, small_system_run, tmp_path):
        slam, _ = small_system_run
        out = tmp_path / "traj.txt"
        slam.save_trajectory_tum(out)
        lines = out.read_text().strip().splitlines()
        assert len(lines) == small_system_run[0].state.frame_id
        for ln in lines:
            parts = ln.split()
            assert len(parts) == 8  # t tx ty tz qx qy qz qw
            q = np.array([float(x) for x in parts[4:]])
            assert abs(np.linalg.norm(q) - 1.0) < 1e-4

    def test_keyframe_trajectory(self, small_system_run, tmp_path):
        slam, _ = small_system_run
        out = tmp_path / "kf.txt"
        slam.save_keyframe_trajectory_tum(out)
        lines = out.read_text().strip().splitlines()
        assert len(lines) == slam.n_keyframes


class TestDeterminism:
    def test_repeatable(self, small_seq):
        """Unlike the C++ reference (thread timing + RANSAC seeds), this
        pipeline is run-to-run deterministic."""
        def run():
            slam = System(small_seq.settings, max_pts=4096, max_kf=32)
            out = []
            for i in range(8):
                gray, depth, t = small_seq.frame(i)
                out.append(slam.track_rgbd(gray, depth, t))
            return np.stack(out)

        a, b = run(), run()
        np.testing.assert_array_equal(a, b)


class TestDegenerate:
    def test_no_depth_no_init(self, small_seq):
        slam = System(small_seq.settings, max_pts=4096, max_kf=32)
        gray, depth, t = small_seq.frame(0)
        out = slam.track_rgbd(gray, np.zeros_like(depth), t)
        assert out is None
        assert slam.get_tracking_state() == "NOT_INITIALIZED"
        # next frame with depth initializes fine
        out = slam.track_rgbd(gray, depth, t + 0.03)
        assert out is not None

    def test_black_frames_lose_tracking_without_nan(self, small_seq):
        slam = System(small_seq.settings, max_pts=4096, max_kf=32)
        for i in range(3):
            gray, depth, t = small_seq.frame(i)
            slam.track_rgbd(gray, depth, t)
        out = slam.track_rgbd(np.zeros_like(gray), depth, t + 0.03)
        assert out is None
        assert slam.get_tracking_state() == "LOST"
        assert np.isfinite(np.asarray(slam.state.m.pt_pos)).all()

    def test_relocalize_without_loop_closing(self, small_seq):
        """Relocalization is part of TRACKING (Tracking::Relocalization
        ~1300) — it must rescue a LOST run even with the loop-closing module
        disabled (driver configs 1-3). Black out 5 frames mid-run, then feed
        real frames again: the BoW+PnP path must recover."""
        slam = System(small_seq.settings, max_pts=4096, max_kf=32,
                      use_loop_closing=False)
        assert slam._loop is None  # the scenario under test
        for i in range(10):
            gray, depth, t = small_seq.frame(i)
            slam.track_rgbd(gray, depth, t)
        assert slam.get_tracking_state() == "OK"
        for j in range(5):
            slam.track_rgbd(np.zeros_like(gray), depth, t + 0.03 * (j + 1))
        assert slam.get_tracking_state() == "LOST"
        recovered = []
        for i in range(10, small_seq.n_frames):
            gray, depth, t = small_seq.frame(i)
            out = slam.track_rgbd(gray, depth, t + 0.5)
            recovered.append(out is not None)
        assert any(recovered), "never relocalized after blackout"
        assert slam.get_tracking_state() == "OK"


class TestRelocTopup:
    def test_guided_topup_rescues_marginal_reloc(self, small_system_run, small_seq):
        """Tracking::Relocalization (~1300) tail parity: when the first
        solve lands at 10-49 inliers the reference runs a guided
        SearchByProjection top-up (th=10/ORBdist=100 then th=3/64) and
        re-optimizes instead of rejecting. Build a marginal frame by
        flipping 60 descriptor bits on most keypoints: those keypoints fail
        the strict BoW matcher (Hamming 60 > TH_LOW=50, so the first solve
        is short of 50 inliers) but pass the top-up's ORBdist=100 projection
        window — so relocalization must FAIL with the top-up disabled and
        SUCCEED with it enabled."""
        slam, _ = small_system_run
        g, d, t = small_seq.frame(12)
        ln = slam.builder.detect_lines(np.asarray(g, np.float32))
        frame = slam.builder(
            jnp.asarray(g, jnp.float32), jnp.asarray(d, jnp.float32), *ln
        )
        rng = np.random.default_rng(7)
        desc = np.asarray(frame.desc).copy()  # u8[N, 32]
        n = desc.shape[0]
        # the clean subset must be drawn from VALID keypoints (desc rows are
        # a fixed-capacity [max_feat] buffer, most slots masked): ~70 clean
        # kps -> ~20 BoW matches with landmarks, enough to clear the
        # 15-match candidate gate and solve a pose, yet well short of the
        # 50-inlier accept — exactly the reference's 30-50 top-up window
        valid_idx = np.where(np.asarray(frame.valid))[0]
        keep = set(rng.permutation(valid_idx)[:70].tolist())
        for i in range(n):
            if i in keep:
                continue
            bits = rng.choice(256, size=60, replace=False)
            mask = np.zeros(32, np.uint8)
            for b in bits:
                mask[b // 8] |= np.uint8(1 << (b % 8))
            desc[i] ^= mask
        frame = frame._replace(desc=jnp.asarray(desc))
        lost = slam.state._replace(status=jnp.int32(2))

        reloc = slam._reloc
        try:
            reloc.topup_enabled = False
            _, ok_plain = reloc.relocalize(lost, frame)
            reloc.topup_enabled = True
            _, ok_topup = reloc.relocalize(lost, frame)
        finally:
            reloc.topup_enabled = True
        assert not ok_plain, "gate accepted without top-up; fixture too easy"
        assert ok_topup, "guided top-up failed to rescue marginal reloc"


class TestPipelined:
    """pipeline_depth=K (production mode on the tunnel-attached TPU: the
    telemetry round trip overlaps K frames of device compute; host
    bookkeeping — keyframe chain, logging, trajectory rows — lags K frames,
    the reference's own async-LocalMapping semantics made explicit)."""

    def _run(self, seq, tmp_path, tag, depth):
        slam = System(
            seq.settings, max_pts=4096, max_kf=32, pipeline_depth=depth,
        )
        poses = []
        for i in range(seq.n_frames):
            gray, d, t = seq.frame(i)
            poses.append(slam.track_rgbd(gray, d, t))
        out = tmp_path / f"traj_{tag}.txt"
        slam.save_trajectory_tum(out)  # drains the pipeline
        return slam, poses, out

    def test_tracks_and_ate(self, small_seq, tmp_path):
        slam, poses, out = self._run(small_seq, tmp_path, "p4", depth=4)
        # the first `depth` calls return None (pipeline filling); afterwards
        # each call returns the pose of the frame finalized during it
        assert all(p is None for p in poses[:4])
        assert all(p is not None for p in poses[4:])
        from plslam_tpu.io.trajectory import load_trajectory_tum

        est = load_trajectory_tum(out)
        assert len(est) == small_seq.n_frames  # save drained every row
        rmse, n = ate_rmse(est, small_seq.gt_trajectory())
        assert n == small_seq.n_frames
        # the mapper refines the map K frames late, so the trajectory is not
        # bit-identical to the synchronous run — but accuracy must hold
        assert rmse < 0.012, f"pipelined ATE {rmse * 100:.2f} cm"

    def test_deterministic(self, small_seq, tmp_path):
        _, _, out1 = self._run(small_seq, tmp_path, "d1", depth=4)
        _, _, out2 = self._run(small_seq, tmp_path, "d2", depth=4)
        assert out1.read_text() == out2.read_text()

    def test_returned_pose_is_lagged_frame(self, small_seq, tmp_path):
        """PINS the pipelined-API contract (round-4 verdict next #10, chosen
        and documented in System.__init__): with pipeline_depth=K, call i
        returns the pose of frame i-K — the frame FINALIZED during the call
        — not the current frame's. Verified geometrically: the returned
        translation must match the synchronous run's frame i-K pose and be
        far from frame i's (the fixture moves ~3 cm per 4 frames).

        WHICH frame was finalized is pinned exactly via the finalize-order
        timestamp list (the same order the JSONL/trajectory rows are
        appended in). The pose value itself is compared against the sync
        run only LOOSELY: pipelined runs are not bit-identical to sync (the
        mapper refines the map K frames late — see test_tracks_and_ate),
        so the check is that the return is geometrically the LAGGED frame's
        pose, not the current frame's (~3 cm apart in this fixture)."""
        slam_s, p_sync, _ = self._run(small_seq, tmp_path, "lag_s", depth=0)
        seen = []

        class SpySystem(System):
            def _finalize_one(self2):
                r = super()._finalize_one()
                seen.append(self2._timestamps[-1])
                return r

        slam_p = SpySystem(
            small_seq.settings, max_pts=4096, max_kf=32, pipeline_depth=4
        )
        checked = 0
        for i in range(small_seq.n_frames):
            gray, d, t = small_seq.frame(i)
            n0 = len(seen)
            p = slam_p.track_rgbd(gray, d, t)
            if p is None:
                assert i < 4, f"call {i} returned None after pipeline fill"
                continue
            # exactly one frame finalized during this call, and it is i-4
            assert len(seen) == n0 + 1
            assert seen[-1] == small_seq.timestamp(i - 4)
            # no absolute closeness bound vs the sync run: the two runs
            # legitimately diverge up to ~1.6 cm (late map refinement);
            # the timestamp pin above is the exact contract, the geometric
            # check below only discriminates lagged-vs-current
            d_lag = np.linalg.norm(p[:3, 3] - p_sync[i - 4][:3, 3])
            d_cur = np.linalg.norm(p[:3, 3] - p_sync[i][:3, 3])
            if d_cur > 0.02:  # frames far enough apart to discriminate
                assert d_lag < d_cur, f"call {i} returned the CURRENT pose"
                checked += 1
        assert checked >= 5, "fixture never discriminated lagged vs current"

    def test_blackout_recovery(self, small_seq, tmp_path):
        """LOST handling in pipelined mode: the lost flag drains the
        pipeline and relocalizes off the newest frame."""
        slam = System(
            small_seq.settings, max_pts=4096, max_kf=32, pipeline_depth=4,
        )
        for i in range(10):
            gray, depth, t = small_seq.frame(i)
            slam.track_rgbd(gray, depth, t)
        for j in range(5):
            slam.track_rgbd(
                np.zeros_like(gray), depth, t + 0.03 * (j + 1)
            )
        for i in range(10, 14):
            gray, depth, t2 = small_seq.frame(i)
            out = slam.track_rgbd(gray, depth, t2 + 0.5)
        slam._flush_pending()
        assert slam.get_tracking_state() == "OK"


class TestEvaluator:
    def test_ate_zero_on_identical(self, small_seq):
        gt = small_seq.gt_trajectory()
        rmse, n = ate_rmse(gt, gt)
        assert rmse < 1e-9 and n == len(gt)

    def test_ate_invariant_to_rigid_offset(self, small_seq):
        gt = small_seq.gt_trajectory()
        R = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
        off = np.eye(4)
        off[:3, :3] = R
        off[:3, 3] = [5, -2, 1]
        moved = [(t, off @ T) for t, T in gt]
        rmse, _ = ate_rmse(moved, gt)
        assert rmse < 1e-6


class TestSnapshot:
    def test_save_load_roundtrip(self, small_system_run, tmp_path):
        """Map checkpoint/resume (capability the reference lacks)."""
        import jax

        slam, _ = small_system_run
        f = tmp_path / "map.npz"
        slam.save_map(f)
        before = jax.tree.map(np.asarray, slam.state)
        slam.load_map(f)
        after = jax.tree.map(np.asarray, slam.state)
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
            np.testing.assert_array_equal(a, b)

    def test_snapshot_keyframe_timestamps(self, small_system_run, small_seq, tmp_path):
        """load_map into a FRESH System must restore keyframe timestamps:
        save_keyframe_trajectory_tum after the round trip writes the same
        real TUM timestamps as the original session (SURVEY.md §4.5 save-path
        bit-compatibility; a fresh System without the snapshot extras used to
        emit t=0.0 lines). The BoW rows must also round-trip exactly."""
        slam, _ = small_system_run
        f = tmp_path / "map.npz"
        orig_kf = tmp_path / "kf_orig.txt"
        slam.save_keyframe_trajectory_tum(orig_kf)
        slam.save_map(f)
        slam2 = System(small_seq.settings, max_pts=4096, max_kf=32)
        slam2.load_map(f)
        loaded_kf = tmp_path / "kf_loaded.txt"
        slam2.save_keyframe_trajectory_tum(loaded_kf)
        assert loaded_kf.read_text() == orig_kf.read_text()
        assert not orig_kf.read_text().startswith("0.0 ")
        np.testing.assert_array_equal(slam2._reloc.kf_bow, slam._reloc.kf_bow)

    def test_localization_on_loaded_map(self, small_system_run, small_seq, tmp_path):
        """Localization-only replay must track AND leave the loaded map
        bit-identical (Tracking.cc mbOnlyTracking: no keyframes, no landmark
        creation, no visibility-counter mutation)."""
        import jax

        slam, _ = small_system_run
        f = tmp_path / "map.npz"
        slam.save_map(f)
        from plslam_tpu.system import System

        slam2 = System(small_seq.settings, max_pts=4096, max_kf=32)
        slam2.load_map(f)
        slam2.activate_localization_mode()
        map_before = jax.tree.map(np.asarray, slam2.state.m)
        for i in (small_seq.n_frames - 3, small_seq.n_frames - 2, small_seq.n_frames - 1):
            g, d, t = small_seq.frame(i)
            out = slam2.track_rgbd(g, d, t + 0.05)
        assert out is not None
        assert slam2.get_tracking_state() == "OK"
        map_after = jax.tree.map(np.asarray, slam2.state.m)
        for name, a, b in zip(
            map_before._fields, jax.tree.leaves(map_before), jax.tree.leaves(map_after)
        ):
            np.testing.assert_array_equal(a, b, err_msg=f"map field {name} mutated")


class TestLocalWorkingSet:
    """The TrackLocalMap working set (Tracking::UpdateLocalKeyFrames +
    UpdateLocalPoints ~850): stage-2 matching runs over the ref KF's
    covisibility neighborhood, not all MAX_PTS slots."""

    def test_local_set_contents(self, small_system_run):
        slam, _ = small_system_run
        ws = np.asarray(slam.state.local_set)
        m = slam.state.m
        valid_ids = ws[ws >= 0]
        # unique, in-range, and pointing at live landmarks
        assert len(valid_ids) > 0
        assert len(np.unique(valid_ids)) == len(valid_ids)
        pt_valid = np.asarray(m.pt_valid)
        assert pt_valid[valid_ids].all()
        # covers the reference KF's own landmarks (always in the local map)
        ref = int(slam.state.ref_kf)
        row = np.asarray(m.kf_lm_idx[ref])
        row_ok = np.asarray(m.kf_feat_valid[ref]) & (row >= 0) & pt_valid[np.clip(row, 0, None)]
        assert np.isin(row[row_ok], valid_ids).all()

    def test_refresh_matches_step_refresh(self, small_system_run):
        # the host-callable refresh and the in-step cond compute the same set
        slam, _ = small_system_run
        st = slam.tracker.refresh_local_set(slam.state)
        a = np.asarray(st.local_set)
        b = np.asarray(
            slam.tracker._compute_local_set(slam.state.m, slam.state.ref_kf)
        )
        assert (a == b).all()
