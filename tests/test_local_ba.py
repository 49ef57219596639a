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


class TestLineBA:
    """Line edges in local BA (the fork's EdgeLineProjectXYZ,
    src/Optimizer.cc ~450 line-edge blocks)."""

    def _with_lines(self, tr, m, rng, n_lines=6):
        """Inject ground-truth 3D lines + per-KF 2D line observations."""
        import plslam_tpu.geometry.se3 as se3

        import jax.numpy as jnp

        K_np = np.asarray(tr.K)
        n_kf = int(m.n_kf)
        # wipe the tracker's own lines first (device LSD populates real
        # lines during tracking; their observations must not constrain the
        # slots this test overwrites with synthetic ground truth)
        m = m._replace(
            ln_valid=jnp.zeros_like(m.ln_valid),
            kf_ln_valid=jnp.zeros_like(m.kf_ln_valid),
            kf_ln_idx=jnp.full_like(m.kf_ln_idx, -1),
        )
        sw = rng.normal(0, 0.4, (n_lines, 3)) + np.array([0.0, 0.0, 3.0])
        ew = sw + rng.normal(0, 0.6, (n_lines, 3))
        kf_ln_obs = np.asarray(m.kf_ln_obs).copy()
        kf_ln_idx = np.asarray(m.kf_ln_idx).copy()
        kf_ln_valid = np.asarray(m.kf_ln_valid).copy()
        for i in range(n_kf):
            T = np.asarray(m.kf_pose[i])
            for q in range(n_lines):
                ps = T[:3, :3] @ sw[q] + T[:3, 3]
                pe = T[:3, :3] @ ew[q] + T[:3, 3]
                if ps[2] < 0.1 or pe[2] < 0.1:
                    continue
                us = K_np @ (ps / ps[2])
                ue = K_np @ (pe / pe[2])
                l = np.cross(us, ue)
                l = l / np.linalg.norm(l[:2])
                kf_ln_obs[i, q] = l.astype(np.float32)
                kf_ln_idx[i, q] = q
                kf_ln_valid[i, q] = True
        m = m._replace(
            kf_ln_obs=jnp.asarray(kf_ln_obs),
            kf_ln_idx=jnp.asarray(kf_ln_idx),
            kf_ln_valid=jnp.asarray(kf_ln_valid),
            ln_sw=m.ln_sw.at[:n_lines].set(jnp.asarray(sw, jnp.float32)),
            ln_ew=m.ln_ew.at[:n_lines].set(jnp.asarray(ew, jnp.float32)),
            ln_valid=m.ln_valid.at[:n_lines].set(True),
            ln_ref_kf=m.ln_ref_kf.at[:n_lines].set(0),
            n_ln=jnp.int32(n_lines),
        )
        return m, sw, ew

    @staticmethod
    def _line_dist(p, a, b):
        """Distance of points p [N,3] to the infinite 3D line through a,b."""
        d = (b - a) / np.linalg.norm(b - a)
        v = p - a
        return np.linalg.norm(v - (v @ d)[:, None] * d, axis=-1)

    def test_perturbed_line_converges(self, tracked_state):
        from plslam_tpu.solvers.local_ba import LocalBA

        tr, st, _ = tracked_state
        rng = np.random.default_rng(7)
        m, sw_gt, ew_gt = self._with_lines(tr, st.m, rng)
        n_lines = sw_gt.shape[0]
        # perturb the endpoints off the true line
        pert = rng.normal(0, 0.05, (n_lines, 3)).astype(np.float32)
        m_pert = m._replace(
            ln_sw=m.ln_sw.at[:n_lines].add(jnp.asarray(pert)),
            ln_ew=m.ln_ew.at[:n_lines].add(jnp.asarray(-pert)),
        )
        ba = LocalBA(tr, window=8, fixed=8, local_pts=2048, local_lines=16)
        m_opt = ba.run(m_pert, jnp.int32(int(m.n_kf) - 1))

        def mean_dist(mm):
            sw = np.asarray(mm.ln_sw[:n_lines])
            ew = np.asarray(mm.ln_ew[:n_lines])
            ds = [
                self._line_dist(np.stack([sw[q], ew[q]]), sw_gt[q], ew_gt[q]).mean()
                for q in range(n_lines)
            ]
            return float(np.mean(ds))

        before, after = mean_dist(m_pert), mean_dist(m_opt)
        # 3D distance must not EXPLODE, but it is not the convergence
        # criterion: the synthetic camera baselines are ~2 cm, so the
        # back-projected planes are nearly coincident and the out-of-plane
        # direction is genuinely unconstrained — BA may trade 3D position
        # along it for pixel residual. The px-residual check below is the
        # quantity the optimizer controls and must go to ~0. The absolute
        # floor covers the case where "before" is tiny and a single line
        # slides along its null direction (observed 0.06 -> 0.20 m with a
        # perfectly converged px residual). Floor 0.25 m: just above the
        # observed 0.20 m slide, so a regression that drifts lines ~0.3 m in
        # 3D while still shrinking the px residual is caught (advisor r3).
        assert after < max(before * 3.0, 0.25), (before, after)

        # the quantity BA controls — the point-to-2D-line pixel residual —
        # must collapse (measured 10.6 px -> 0.09 px; assert a 50x
        # reduction rather than a knife-edge absolute)
        K_np = np.asarray(tr.K)

        def px_resid(mm):
            tot, cnt = 0.0, 0
            for i in range(int(mm.n_kf)):
                for q in range(n_lines):
                    if int(mm.kf_ln_idx[i, q]) < 0:
                        continue
                    l = np.asarray(mm.kf_ln_obs[i, q])
                    T = np.asarray(mm.kf_pose[i])
                    for X in (np.asarray(mm.ln_sw[q]), np.asarray(mm.ln_ew[q])):
                        P = T[:3, :3] @ X + T[:3, 3]
                        tot += abs(l @ (K_np @ (P / P[2])))
                        cnt += 1
            return tot / max(cnt, 1)

        r_before, r_after = px_resid(m_pert), px_resid(m_opt)
        assert r_before > 5.0
        assert r_after < r_before / 50.0, (r_before, r_after)
        # the point map must not be damaged by adding line edges
        assert np.isfinite(np.asarray(m_opt.pt_pos)).all()

    def test_line_outlier_observation_erased(self, tracked_state):
        from plslam_tpu.solvers.local_ba import LocalBA

        tr, st, _ = tracked_state
        rng = np.random.default_rng(8)
        m, sw_gt, ew_gt = self._with_lines(tr, st.m, rng)
        # corrupt one observation of line 0 in the newest KF: rotate the 2D
        # line far from the true projection
        k = int(m.n_kf) - 1
        bad = np.array([0.0, 1.0, -5000.0], np.float32)
        m = m._replace(kf_ln_obs=m.kf_ln_obs.at[k, 0].set(jnp.asarray(bad)))
        ba = LocalBA(tr, window=8, fixed=8, local_pts=2048, local_lines=16)
        m_opt = ba.run(m, jnp.int32(k))
        assert int(m_opt.kf_ln_idx[k, 0]) == -1  # erased as outlier
        # healthy observations survive
        assert int(np.asarray(m_opt.kf_ln_idx[k] >= 0).sum()) >= 4


class TestGlobalBA:
    """global_mode=True: GlobalBundleAdjustment over every valid keyframe
    (src/Optimizer.cc ~60) — 200+ KFs, dense Schur on the whole map."""

    def test_converges_over_200_kfs(self):
        import dataclasses

        import jax.numpy as jnp

        from plslam_tpu.io.synthetic import SyntheticSequence
        from plslam_tpu.pipeline.tracking import Tracker
        from plslam_tpu.slammap.state import refresh_counts
        from plslam_tpu.solvers.local_ba import LocalBA

        rng = np.random.default_rng(11)
        n_kf, n_pts, n_feat = 208, 1200, 48
        seq = SyntheticSequence(n_frames=2, height=240, width=320)
        settings = dataclasses.replace(seq.settings, n_features=n_feat)
        tr = Tracker(settings, max_kf=n_kf, max_pts=2048, max_feat=n_feat,
                     max_lines=4, max_maplines=8)
        K = np.asarray(tr.K)
        m = tr.init_state().m

        # ground truth: camera ring around a point cloud
        pts = rng.normal(0, 1.0, (n_pts, 3)).astype(np.float32) + [0, 0, 5]
        poses = np.tile(np.eye(4, dtype=np.float32), (n_kf, 1, 1))
        kf_uv = np.zeros((n_kf, n_feat, 3), np.float32)
        kf_lm = np.full((n_kf, n_feat), -1, np.int32)
        kf_ok = np.zeros((n_kf, n_feat), bool)
        for i in range(n_kf):
            th = 0.002 * i
            c, s = np.cos(th), np.sin(th)
            poses[i, :3, :3] = [[c, 0, s], [0, 1, 0], [-s, 0, c]]
            poses[i, :3, 3] = [0.01 * i, 0.002 * i, 0.0]
            pc = pts @ poses[i, :3, :3].T + poses[i, :3, 3]
            uv = (pc / pc[:, 2:]) @ K.T
            vis = np.where(
                (pc[:, 2] > 0.5) & (uv[:, 0] > 5) & (uv[:, 0] < 315)
                & (uv[:, 1] > 5) & (uv[:, 1] < 235)
            )[0]
            sel = rng.choice(vis, size=min(n_feat, len(vis)), replace=False)
            for f, p in enumerate(sel):
                kf_uv[i, f] = [uv[p, 0], uv[p, 1], -1.0]  # mono obs
                kf_lm[i, f] = p
                kf_ok[i, f] = True
        m = m._replace(
            kf_pose=jnp.asarray(poses), kf_valid=jnp.ones(n_kf, bool),
            kf_frame_id=jnp.arange(n_kf, dtype=jnp.int32),
            kf_uv=jnp.asarray(kf_uv), kf_lm_idx=jnp.asarray(kf_lm),
            kf_feat_valid=jnp.asarray(kf_ok),
            pt_pos=m.pt_pos.at[:n_pts].set(jnp.asarray(pts)),
            pt_valid=m.pt_valid.at[:n_pts].set(True),
        )
        m = refresh_counts(m)

        # perturb everything except KF 0 (gauge)
        poses_p = poses.copy()
        poses_p[1:, :3, 3] += rng.normal(0, 0.02, (n_kf - 1, 3))
        pts_p = pts + rng.normal(0, 0.02, pts.shape).astype(np.float32)
        m_pert = m._replace(
            kf_pose=jnp.asarray(poses_p),
            pt_pos=m.pt_pos.at[:n_pts].set(jnp.asarray(pts_p)),
        )

        def mean_reproj(mm):
            tot, cnt = 0.0, 0
            P = np.asarray(mm.kf_pose)
            X = np.asarray(mm.pt_pos)
            for i in range(0, n_kf, 16):
                sel = kf_lm[i][kf_ok[i]]
                pc = X[sel] @ P[i, :3, :3].T + P[i, :3, 3]
                uv = (pc / pc[:, 2:]) @ K.T
                tot += np.abs(uv[:, :2] - kf_uv[i][kf_ok[i]][:, :2]).sum()
                cnt += len(sel) * 2
            return tot / cnt

        gba = LocalBA(tr, global_mode=True, iters1=10, iters2=10)
        m_opt = gba.run(m_pert, jnp.int32(n_kf - 1))
        before, after = mean_reproj(m_pert), mean_reproj(m_opt)
        assert after < before * 0.1, (before, after)
        # gauge held
        np.testing.assert_array_equal(
            np.asarray(m_opt.kf_pose[0]), np.asarray(m_pert.kf_pose[0])
        )

        # the TIME-SLICED schedule (the transient-GBA-thread analogue that
        # System.track_rgbd pumps one slice per frame) must converge like
        # the monolithic run — same 10+10 iterations split 5/5/5/5, erase
        # only on the last slice
        m_sl = m_pert
        for i1, i2, er in ((5, 0, False), (5, 0, False), (0, 5, False), (0, 5, True)):
            m_sl = gba.slice_runner(i1, i2, er)(m_sl, jnp.int32(n_kf - 1))
        after_sl = mean_reproj(m_sl)
        assert after_sl < before * 0.1, (before, after_sl)
        np.testing.assert_array_equal(
            np.asarray(m_sl.kf_pose[0]), np.asarray(m_pert.kf_pose[0])
        )
