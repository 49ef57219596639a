"""Loop-closing machinery: vocab/BoW, Sim3 RANSAC, essential graph,
relocalization (driver config 4 components)."""

import numpy as np
import pytest

import jax.numpy as jnp

from plslam_tpu.geometry import se3
from plslam_tpu.io.synthetic import SyntheticSequence
from plslam_tpu.loopclosing.vocab import Vocabulary, l1_score
from plslam_tpu.ops import brief
from plslam_tpu.solvers.pose_graph import correct_landmarks, optimize_essential_graph
from plslam_tpu.solvers.sim3_solver import solve_sim3_ransac

K_MAT = np.array([[517.3, 0, 318.6], [0, 516.5, 255.3], [0, 0, 1]], np.float32)


class TestVocabulary:
    def test_bow_self_similarity(self, rng):
        vocab = Vocabulary(n_words=512)
        d = rng.integers(0, 256, (200, 32)).astype(np.uint8)
        pm1 = brief.unpack_bits_pm1(jnp.asarray(d))
        v = jnp.ones(200, bool)
        b1 = vocab.bow(pm1, v)
        assert abs(float(jnp.sum(b1)) - 1.0) < 1e-5
        assert float(l1_score(b1, b1)) > 0.999
        d2 = rng.integers(0, 256, (200, 32)).astype(np.uint8)
        b2 = vocab.bow(brief.unpack_bits_pm1(jnp.asarray(d2)), v)
        assert float(l1_score(b1, b2)) < 0.9

    def test_similar_frames_score_higher(self, rng):
        """BoW of two views of the same scene >> BoW of different scenes."""
        from plslam_tpu.features.frame import FrameBuilder

        seq_a = SyntheticSequence(n_frames=3, height=240, width=320, seed=3)
        seq_b = SyntheticSequence(n_frames=3, height=240, width=320, seed=9)
        fb = FrameBuilder(seq_a.settings)
        vocab = Vocabulary()
        def bow_of(seq, i):
            g, d, _ = seq.frame(i)
            fr = fb(jnp.asarray(g), jnp.asarray(d))
            return vocab.bow(fr.pm1.astype(jnp.float32), fr.valid)

        same = float(l1_score(bow_of(seq_a, 0), bow_of(seq_a, 2)))
        diff = float(l1_score(bow_of(seq_a, 0), bow_of(seq_b, 0)))
        assert same > diff + 0.05, (same, diff)


class TestSim3Solver:
    def test_recovers_rigid_transform(self, rng):
        n = 80
        x2 = rng.uniform([-2, -2, 1.5], [2, 2, 5], (n, 3)).astype(np.float32)
        xi = np.array([0.3, -0.2, 0.1, 0.1, -0.15, 0.08], np.float32)
        T12 = np.asarray(se3.exp(jnp.asarray(xi)))  # cam1 <- cam2
        p1 = (T12[:3, :3] @ x2.T).T + T12[:3, 3]
        # world positions consistent with identity keyframe poses
        Tcw1 = jnp.asarray(np.eye(4, dtype=np.float32))
        Tcw2 = jnp.asarray(np.eye(4, dtype=np.float32))
        x1 = p1 + rng.normal(0, 0.002, (n, 3)).astype(np.float32)
        # 20% outliers
        out = rng.choice(n, n // 5, replace=False)
        x1[out] += rng.uniform(0.5, 1.0, (len(out), 3))
        res = solve_sim3_ransac(
            jnp.asarray(x1), jnp.asarray(x2), jnp.ones(n, bool),
            jnp.asarray(K_MAT), Tcw1, Tcw2,
        )
        assert bool(res.ok)
        T_est = np.eye(4)
        T_est[:3, :3] = np.asarray(res.R)
        T_est[:3, 3] = np.asarray(res.t)
        err = np.asarray(se3.log(jnp.asarray((T_est @ np.linalg.inv(T12)).astype(np.float32))))
        assert np.linalg.norm(err[:3]) < 0.01, err
        assert np.linalg.norm(err[3:]) < 0.01, err
        inl = np.asarray(res.inliers)
        assert not inl[out].any() or inl[out].mean() < 0.2


class TestEssentialGraph:
    def test_loop_correction_reduces_drift(self, rng):
        """Chain of 12 KFs with accumulated drift; a loop edge between last
        and first with the TRUE relative transform must pull the chain back."""
        K = 12
        true_step = np.asarray(se3.exp(jnp.asarray([0.1, 0, 0, 0, 0.02, 0], dtype=jnp.float32)))
        drift_step = np.asarray(
            se3.exp(jnp.asarray([0.105, 0.004, 0.002, 0, 0.023, 0.001], dtype=jnp.float32))
        )
        true_poses = [np.eye(4, dtype=np.float32)]
        drift_poses = [np.eye(4, dtype=np.float32)]
        for _ in range(K - 1):
            true_poses.append(true_step @ true_poses[-1])
            drift_poses.append(drift_step @ drift_poses[-1])
        true_poses = np.stack(true_poses)
        drift_poses = np.stack(drift_poses)

        edge = np.zeros((K, K), bool)
        Sm_R = np.tile(np.eye(3, dtype=np.float32), (K, K, 1, 1))
        Sm_t = np.zeros((K, K, 3), np.float32)
        Sm_s = np.ones((K, K), np.float32)
        # odometry edges measured from the DRIFTED chain. Contract: the
        # optimizer reads the UPPER triangle: S_meas[i, j] = S_i * S_j^-1
        # for i < j.
        for i in range(K - 1):
            edge[i, i + 1] = True
            M = drift_poses[i] @ np.linalg.inv(drift_poses[i + 1])
            Sm_R[i, i + 1] = M[:3, :3]; Sm_t[i, i + 1] = M[:3, 3]
        # loop edge with the TRUE relative transform
        edge[0, K - 1] = True
        M = true_poses[0] @ np.linalg.inv(true_poses[K - 1])
        Sm_R[0, K - 1] = M[:3, :3]; Sm_t[0, K - 1] = M[:3, 3]

        fixed = np.zeros(K, bool); fixed[0] = True
        out = np.asarray(
            optimize_essential_graph(
                jnp.asarray(drift_poses), jnp.ones(K, bool), jnp.asarray(fixed),
                jnp.asarray(np.triu(edge | edge.T, 1)),
                jnp.asarray(Sm_R), jnp.asarray(Sm_t), jnp.asarray(Sm_s),
                n_iters=10,
            )
        )
        err_before = np.linalg.norm(drift_poses[-1][:3, 3] - true_poses[-1][:3, 3])
        err_after = np.linalg.norm(out[-1][:3, 3] - true_poses[-1][:3, 3])
        assert err_after < err_before * 0.35, (err_before, err_after)

    def test_correct_landmarks_follows_refkf(self):
        poses_old = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
        poses_new = poses_old.copy()
        poses_new[1][:3, 3] = [0, 0, -1.0]  # cam 1 moved back 1m -> its
        # points (expressed in world) move +1 in z in world
        pts = jnp.asarray(np.array([[0, 0, 3], [1, 1, 4]], np.float32))
        out = np.asarray(
            correct_landmarks(
                pts, jnp.ones(2, bool), jnp.asarray([1, 1]),
                jnp.asarray(poses_old), jnp.asarray(poses_new),
            )
        )
        np.testing.assert_allclose(out[:, 2], [4.0, 5.0], atol=1e-5)


class TestRelocalization:
    def test_recover_after_lost(self):
        from plslam_tpu.system import System

        seq = SyntheticSequence(n_frames=12, height=240, width=320, seed=3)
        slam = System(seq.settings, max_pts=4096, max_kf=32, use_loop_closing=True)
        for i in range(6):
            g, d, t = seq.frame(i)
            slam.track_rgbd(g, d, t)
        assert slam.get_tracking_state() == "OK"
        # lose tracking with black frames
        for j in range(2):
            slam.track_rgbd(np.zeros_like(g), d, t + 0.03 * (j + 1))
        assert slam.get_tracking_state() == "LOST"
        # show a known view again -> relocalize
        g6, d6, t6 = seq.frame(5)
        out = slam.track_rgbd(g6, d6, t6 + 0.5)
        assert slam.get_tracking_state() == "OK"

    def test_relocalize_far_from_last_pose(self):
        """Init-free relocalization (PnPsolver twin): after LOST, teleport
        the internal pose estimate far away, then show a known view — the
        batched Horn/PnP RANSAC must recover with NO usable pose prior."""
        import jax.numpy as jnp

        from plslam_tpu.system import System

        seq = SyntheticSequence(n_frames=12, height=240, width=320, seed=3)
        slam = System(seq.settings, max_pts=4096, max_kf=32, use_loop_closing=True)
        for i in range(6):
            g, d, t = seq.frame(i)
            slam.track_rgbd(g, d, t)
        T_good = np.asarray(slam.state.last.Tcw).copy()
        # lose tracking, then corrupt the last pose AND every stored KF pose
        # the reloc path might read as an initialization: only the init-free
        # solve can recover (a solve seeded from these poses would fail)
        for j in range(2):
            slam.track_rgbd(np.zeros_like(g), d, t + 0.03 * (j + 1))
        assert slam.get_tracking_state() == "LOST"
        T_far = np.eye(4, dtype=np.float32)
        T_far[:3, 3] = [50.0, -30.0, 20.0]
        slam.state = slam.state._replace(
            last=slam.state.last._replace(Tcw=jnp.asarray(T_far))
        )
        g6, d6, t6 = seq.frame(5)
        out = slam.track_rgbd(g6, d6, t6 + 0.5)
        assert slam.get_tracking_state() == "OK"
        # next frame tracks normally and lands near the pre-lost pose
        g7, d7, t7 = seq.frame(6)
        out = slam.track_rgbd(g7, d7, t7 + 0.6)
        assert out is not None
        assert np.linalg.norm(out[:3, 3] - T_good[:3, 3]) < 0.5
