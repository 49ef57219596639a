"""Local bundle adjustment: perturbation recovery on a tracked map."""

import numpy as np
import pytest

import jax.numpy as jnp

from plslam_tpu.io.synthetic import SyntheticSequence


@pytest.fixture(scope="module")
def tracked_state():
    """Build a small map by tracking, WITHOUT BA (so we can test BA alone)."""
    import jax

    from plslam_tpu.features.frame import FrameBuilder
    from plslam_tpu.pipeline.mapping import LocalMapper
    from plslam_tpu.pipeline.tracking import Tracker

    seq = SyntheticSequence(n_frames=12, height=240, width=320, seed=3)
    fb = FrameBuilder(seq.settings)
    tr = Tracker(seq.settings, max_pts=4096, max_kf=32)
    mapper = LocalMapper(tr, enable_ba=False)
    st = tr.init_state()
    for i in range(12):
        g, d, _ = seq.frame(i)
        st, out = tr.step(st, fb(jnp.asarray(g), jnp.asarray(d)))
        if bool(out.new_kf):
            st = st._replace(m=mapper.process(st.m, int(out.kf_id)))
    return tr, st, seq


class TestLocalBA:
    def test_reduces_reprojection_error(self, tracked_state):
        from plslam_tpu.solvers.local_ba import LocalBA

        tr, st, seq = tracked_state
        m = st.m
        rng = np.random.default_rng(0)
        k = int(m.n_kf) - 1

        # perturb the non-first keyframe poses and all landmark positions
        kf_valid = np.asarray(m.kf_valid)
        poses = np.array(m.kf_pose)
        for i in range(1, int(m.n_kf)):
            poses[i][:3, 3] += rng.normal(0, 0.01, 3)
        pts = np.array(m.pt_pos)
        pts += rng.normal(0, 0.01, pts.shape) * np.asarray(m.pt_valid)[:, None]
        m_pert = m._replace(kf_pose=jnp.asarray(poses), pt_pos=jnp.asarray(pts))

        ba = LocalBA(tr, window=8, fixed=8, local_pts=2048)

        def total_chi2(mm_):
            """Reprojection chi2 of all KF observations."""
            import plslam_tpu.geometry.camera as cam
            import plslam_tpu.geometry.se3 as se3

            tot, cnt = 0.0, 0
            for i in range(int(mm_.n_kf)):
                lm = np.asarray(mm_.kf_lm_idx[i])
                ok = (lm >= 0) & np.asarray(mm_.kf_feat_valid[i])
                if ok.sum() == 0:
                    continue
                pos = np.asarray(mm_.pt_pos)[lm[ok]]
                p_c = np.asarray(
                    se3.transform(mm_.kf_pose[i], jnp.asarray(pos))
                )
                uv = np.asarray(cam.project(tr.K, jnp.asarray(p_c)))
                obs = np.asarray(mm_.kf_uv[i])[ok][:, :2]
                tot += float(((uv - obs) ** 2).sum())
                cnt += int(ok.sum())
            return tot / max(cnt, 1)

        err_before = total_chi2(m_pert)
        m_opt = ba.run(m_pert, jnp.int32(k))
        err_after = total_chi2(m_opt)
        assert err_after < err_before * 0.2, (err_before, err_after)

    def test_noop_on_converged_map(self, tracked_state):
        """BA on an already-consistent map must not blow it up."""
        from plslam_tpu.solvers.local_ba import LocalBA

        tr, st, seq = tracked_state
        m = st.m
        k = int(m.n_kf) - 1
        ba = LocalBA(tr, window=8, fixed=8, local_pts=2048)
        m_opt = ba.run(m, jnp.int32(k))
        dp = np.abs(np.asarray(m_opt.kf_pose) - np.asarray(m.kf_pose)).max()
        assert np.isfinite(np.asarray(m_opt.pt_pos)).all()
        assert dp < 0.05, dp  # poses move at most a few cm

    def test_gauge_kf0_fixed(self, tracked_state):
        from plslam_tpu.solvers.local_ba import LocalBA

        tr, st, _ = tracked_state
        m = st.m
        ba = LocalBA(tr, window=8, fixed=8, local_pts=2048)
        m_opt = ba.run(m, jnp.int32(int(m.n_kf) - 1))
        np.testing.assert_array_equal(
            np.asarray(m_opt.kf_pose[0]), np.asarray(m.kf_pose[0])
        )
