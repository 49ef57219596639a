"""Epipolar triangulation (CreateNewMapPoints): math oracles + the mapping
stage on constructed keyframes with a proper baseline."""

import numpy as np

import jax.numpy as jnp

from plslam_tpu.geometry import camera, se3
from plslam_tpu.solvers import triangulate as tri

K = np.array([[520.0, 0, 320], [0, 520, 240], [0, 0, 1]], np.float32)


class TestTriangulationMath:
    def test_epipolar_distance_zero_on_true_pairs(self, rng):
        pw = np.c_[rng.uniform(-3, 3, 40), rng.uniform(-2, 2, 40), rng.uniform(5, 12, 40)].astype(np.float32)
        T1 = se3.identity()
        T2 = se3.exp(jnp.asarray([0.3, 0.05, 0.0, 0.02, -0.01, 0.0], dtype=jnp.float32))
        uv1 = camera.project(jnp.asarray(K), se3.transform(T1, jnp.asarray(pw)))
        uv2 = camera.project(jnp.asarray(K), se3.transform(T2, jnp.asarray(pw)))
        D = np.asarray(tri.epipolar_distance(uv1, uv2, tri.fundamental_from_poses(T1, T2, jnp.asarray(K))))
        assert np.abs(np.diag(D)).max() < 1e-2

    def test_midpoint_accuracy_and_checks(self, rng):
        pw = np.c_[rng.uniform(-3, 3, 50), rng.uniform(-2, 2, 50), rng.uniform(6, 15, 50)].astype(np.float32)
        T1 = se3.identity()
        T2 = se3.exp(jnp.asarray([0.3, 0.02, 0.01, 0.01, -0.02, 0.005], dtype=jnp.float32))
        uv1 = camera.project(jnp.asarray(K), se3.transform(T1, jnp.asarray(pw)))
        uv2 = camera.project(jnp.asarray(K), se3.transform(T2, jnp.asarray(pw)))
        est, par = tri.triangulate_midpoint(T1, T2, jnp.asarray(K), uv1, uv2)
        err = np.linalg.norm(np.asarray(est) - pw, axis=1)
        assert err.max() < 0.05  # cm-level at 6-15 m
        ok = tri.triangulation_checks(T1, T2, jnp.asarray(K), uv1, uv2, est, par,
                                      jnp.ones(50), jnp.ones(50))
        assert np.asarray(ok).mean() > 0.9

    def test_checks_reject_degenerate(self, rng):
        """Near-zero baseline must be rejected by the parallax gate."""
        pw = np.c_[rng.uniform(-2, 2, 20), rng.uniform(-1, 1, 20), rng.uniform(5, 10, 20)].astype(np.float32)
        T1 = se3.identity()
        T2 = se3.exp(jnp.asarray([0.003, 0, 0, 0, 0, 0], dtype=jnp.float32))  # 3mm baseline
        uv1 = camera.project(jnp.asarray(K), se3.transform(T1, jnp.asarray(pw)))
        uv2 = camera.project(jnp.asarray(K), se3.transform(T2, jnp.asarray(pw)))
        est, par = tri.triangulate_midpoint(T1, T2, jnp.asarray(K), uv1, uv2)
        ok = tri.triangulation_checks(T1, T2, jnp.asarray(K), uv1, uv2, est, par,
                                      jnp.ones(20), jnp.ones(20))
        assert not np.asarray(ok).any()


class TestMappingTriangulationStage:
    def test_creates_far_landmarks_from_constructed_kfs(self, rng):
        """Two keyframes with a 30cm baseline observing the same far points
        (no depth) -> the stage must create landmarks near ground truth and
        bind both keyframes' observations."""
        from plslam_tpu.config import Settings
        from plslam_tpu.pipeline.mapping import LocalMapper
        from plslam_tpu.pipeline.tracking import Tracker
        from plslam_tpu.ops import brief

        settings = Settings(fx=520, fy=520, cx=320, cy=240, k1=0, k2=0, p1=0,
                            p2=0, k3=0, width=640, height=480, bf=40.0,
                            depth_map_factor=1.0)
        tr = Tracker(settings, max_kf=8, max_pts=1024, max_feat=256)
        mapper = LocalMapper(tr, enable_ba=False, enable_fuse=False, enable_kf_culling=False)
        m = tr.init_state().m

        n = 120
        pw = np.c_[rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
                   rng.uniform(6, 12, n)].astype(np.float32)
        desc = rng.integers(0, 256, (n, 32)).astype(np.uint8)
        T = [np.eye(4, dtype=np.float32),
             np.asarray(se3.exp(jnp.asarray([0.3, 0.0, 0.0, 0.0, -0.02, 0.0], dtype=jnp.float32)))]
        shared_lm = np.arange(30)  # 30 COMMON close landmarks for covisibility
        for kf in (0, 1):
            uv = np.asarray(camera.project(jnp.asarray(K), se3.transform(jnp.asarray(T[kf]), jnp.asarray(pw))))
            uvr = np.concatenate([uv, -np.ones((n, 1), np.float32)], -1)  # NO depth
            pad = tr.max_feat - n
            m = m._replace(
                kf_pose=m.kf_pose.at[kf].set(jnp.asarray(T[kf])),
                kf_valid=m.kf_valid.at[kf].set(True),
                kf_uv=m.kf_uv.at[kf].set(jnp.asarray(np.pad(uvr, ((0, pad), (0, 0))))),
                kf_desc=m.kf_desc.at[kf].set(jnp.asarray(np.pad(desc, ((0, pad), (0, 0))))),
                kf_feat_valid=m.kf_feat_valid.at[kf].set(jnp.asarray(np.r_[np.ones(n, bool), np.zeros(pad, bool)])),
                kf_lm_idx=m.kf_lm_idx.at[kf].set(
                    jnp.asarray(np.r_[shared_lm, -np.ones(n - 30, np.int64), -np.ones(pad, np.int64)].astype(np.int32))
                ),
            )
        m = m._replace(n_kf=jnp.int32(2), n_pt=jnp.int32(30),
                       pt_valid=m.pt_valid.at[:30].set(True))
        m2 = mapper._triangulate(m, jnp.int32(1))
        created = int(m2.n_pt) - 30
        assert created > 50, f"only {created} triangulated"
        new_pos = np.asarray(m2.pt_pos[30 : 30 + created])
        # each created landmark must be near one of the true far points
        d = np.linalg.norm(new_pos[:, None, :] - pw[None], axis=-1).min(1)
        assert np.median(d) < 0.1, np.median(d)
        # both rows gained bindings
        assert int((np.asarray(m2.kf_lm_idx[0]) >= 30).sum()) > 50
        assert int((np.asarray(m2.kf_lm_idx[1]) >= 30).sum()) > 50
