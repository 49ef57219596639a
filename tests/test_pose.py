"""Pose LM solver on synthetic scenes with known ground truth
(SURVEY.md §5 component tests: recover pose within tolerance; Jacobians vs
jax autodiff)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plslam_tpu.geometry import camera, se3
from plslam_tpu.solvers import pose as P

K = np.array([[517.3, 0, 318.6], [0, 516.5, 255.3], [0, 0, 1]], np.float32)
BF = 40.0


def make_scene(rng, n=200, noise_px=0.5, outlier_frac=0.0, stereo_frac=0.8):
    xw = np.stack(
        [
            rng.uniform(-2, 2, n),
            rng.uniform(-1.5, 1.5, n),
            rng.uniform(1.5, 6.0, n),
        ],
        -1,
    ).astype(np.float32)
    xi_gt = np.array([0.1, -0.08, 0.05, 0.04, -0.03, 0.02], np.float32)
    T_gt = np.asarray(se3.exp(jnp.asarray(xi_gt)))
    p_cam = np.asarray(se3.transform(jnp.asarray(T_gt), jnp.asarray(xw)))
    obs = np.array(camera.project_stereo(jnp.asarray(K), BF, jnp.asarray(p_cam)))
    obs[:, :2] += rng.normal(0, noise_px, (n, 2))
    n_out = int(n * outlier_frac)
    out_idx = rng.choice(n, n_out, replace=False)
    obs[out_idx, :2] += rng.uniform(20, 80, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    is_stereo = rng.uniform(size=n) < stereo_frac
    pts = P.PointObs(
        xw=jnp.asarray(xw),
        obs=jnp.asarray(obs),
        inv_sigma2=jnp.ones(n),
        is_stereo=jnp.asarray(is_stereo),
        valid=jnp.ones(n, bool),
    )
    return pts, T_gt, out_idx


def pose_err(T, T_gt):
    d = np.asarray(se3.log(se3.compose(jnp.asarray(T), se3.inverse(jnp.asarray(T_gt)))))
    return np.linalg.norm(d[:3]), np.linalg.norm(d[3:])


class TestPointJacobian:
    def test_matches_autodiff(self, rng):
        pts, T_gt, _ = make_scene(rng, n=20, noise_px=0.0)
        Tcw = np.asarray(se3.exp(jnp.asarray(np.zeros(6, np.float32))))
        _, J, _ = P._point_residual_jac(jnp.asarray(Tcw), pts, jnp.asarray(K), BF)

        def res_fn(xi):
            T = se3.compose(se3.exp(xi), jnp.asarray(Tcw))
            r, _, _ = P._point_residual_jac(T, pts, jnp.asarray(K), BF)
            return r

        J_ad = jax.jacfwd(res_fn)(jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_ad), atol=1e-2, rtol=1e-3)


class TestPoseOptimization:
    def test_clean_recovery(self, rng):
        pts, T_gt, _ = make_scene(rng, noise_px=0.2)
        T0 = se3.identity()
        T, inl, _ = jax.jit(lambda p, t: P.pose_optimization(t, p, jnp.asarray(K), BF))(pts, T0)
        et, er = pose_err(np.asarray(T), T_gt)
        assert et < 5e-3 and er < 2e-3, (et, er)
        assert np.asarray(inl).mean() > 0.95

    def test_outlier_rejection(self, rng):
        pts, T_gt, out_idx = make_scene(rng, noise_px=0.3, outlier_frac=0.2)
        T, inl, _ = P.pose_optimization(se3.identity(), pts, jnp.asarray(K), BF)
        et, er = pose_err(np.asarray(T), T_gt)
        assert et < 1e-2 and er < 5e-3, (et, er)
        inl = np.asarray(inl)
        assert not inl[out_idx].any()  # all outliers flagged
        assert inl.mean() > 0.7

    def test_mono_only(self, rng):
        pts, T_gt, _ = make_scene(rng, noise_px=0.2, stereo_frac=0.0)
        T, inl, _ = P.pose_optimization(se3.identity(), pts, jnp.asarray(K), BF)
        et, er = pose_err(np.asarray(T), T_gt)
        assert et < 2e-2 and er < 5e-3, (et, er)

    def test_with_lines(self, rng):
        pts, T_gt, _ = make_scene(rng, n=60, noise_px=0.3)
        # synthetic 3D segments; observed 2D line from projected gt endpoints
        L = 40
        sw = np.stack(
            [rng.uniform(-2, 2, L), rng.uniform(-1.5, 1.5, L), rng.uniform(2, 5, L)], -1
        ).astype(np.float32)
        ew = sw + rng.uniform(-1, 1, (L, 3)).astype(np.float32)
        ew[:, 2] = np.clip(ew[:, 2], 1.5, None)
        sp = np.asarray(camera.project(jnp.asarray(K), se3.transform(jnp.asarray(T_gt), jnp.asarray(sw))))
        ep = np.asarray(camera.project(jnp.asarray(K), se3.transform(jnp.asarray(T_gt), jnp.asarray(ew))))
        l = np.cross(np.c_[sp, np.ones(L)], np.c_[ep, np.ones(L)])
        l /= np.linalg.norm(l[:, :2], axis=1, keepdims=True)
        lines = P.LineObs(
            sw=jnp.asarray(sw), ew=jnp.asarray(ew), line2d=jnp.asarray(l.astype(np.float32)),
            inv_sigma2=jnp.ones(L), valid=jnp.ones(L, bool),
        )
        T, inl_p, inl_l = P.pose_optimization(se3.identity(), pts, jnp.asarray(K), BF, lines=lines)
        et, er = pose_err(np.asarray(T), T_gt)
        assert et < 5e-3 and er < 2e-3, (et, er)
        assert np.asarray(inl_l).mean() > 0.9

    def test_lines_constrain_pose(self, rng):
        """Points-poor scene: lines must carry the solve to a better pose
        than points alone."""
        pts, T_gt, _ = make_scene(rng, n=8, noise_px=1.5)
        L = 60
        sw = np.stack(
            [rng.uniform(-2, 2, L), rng.uniform(-1.5, 1.5, L), rng.uniform(2, 5, L)], -1
        ).astype(np.float32)
        ew = sw + rng.uniform(-1, 1, (L, 3)).astype(np.float32)
        ew[:, 2] = np.clip(ew[:, 2], 1.5, None)
        sp = np.asarray(camera.project(jnp.asarray(K), se3.transform(jnp.asarray(T_gt), jnp.asarray(sw))))
        ep = np.asarray(camera.project(jnp.asarray(K), se3.transform(jnp.asarray(T_gt), jnp.asarray(ew))))
        l = np.cross(np.c_[sp, np.ones(L)], np.c_[ep, np.ones(L)])
        l /= np.linalg.norm(l[:, :2], axis=1, keepdims=True)
        lines = P.LineObs(
            sw=jnp.asarray(sw), ew=jnp.asarray(ew), line2d=jnp.asarray(l.astype(np.float32)),
            inv_sigma2=jnp.ones(L), valid=jnp.ones(L, bool),
        )
        T_pts, _, _ = P.pose_optimization(se3.identity(), pts, jnp.asarray(K), BF)
        T_both, _, _ = P.pose_optimization(se3.identity(), pts, jnp.asarray(K), BF, lines=lines)
        e_pts = sum(pose_err(np.asarray(T_pts), T_gt))
        e_both = sum(pose_err(np.asarray(T_both), T_gt))
        assert e_both <= e_pts * 1.05


def _tpu_available():
    try:
        return any(d.platform == "tpu" for d in jax.devices("tpu"))
    except RuntimeError:
        return False


class TestPallasKernel:
    """The fused Pallas solve (solvers/pose_pallas.py) against this module's
    jnp path — same scene, full frame capacities (N=1024 points, L=128
    lines). Interpret mode runs everywhere; the real Mosaic kernel is
    asserted on the TPU runner."""

    def _padded_scene(self, rng):
        pts, T_gt, _ = make_scene(rng, n=1024, noise_px=0.5, outlier_frac=0.1)
        L = 128
        sw = np.stack(
            [rng.uniform(-2, 2, L), rng.uniform(-1.5, 1.5, L), rng.uniform(2, 5, L)], -1
        ).astype(np.float32)
        ew = sw + rng.uniform(-0.8, 0.8, (L, 3)).astype(np.float32)
        ew[:, 2] = np.clip(ew[:, 2], 1.5, None)
        sp = np.asarray(camera.project(jnp.asarray(K), se3.transform(jnp.asarray(T_gt), jnp.asarray(sw))))
        ep = np.asarray(camera.project(jnp.asarray(K), se3.transform(jnp.asarray(T_gt), jnp.asarray(ew))))
        l = np.cross(np.c_[sp, np.ones(L)], np.c_[ep, np.ones(L)])
        l /= np.linalg.norm(l[:, :2], axis=1, keepdims=True) + 1e-9
        lines = P.LineObs(
            sw=jnp.asarray(sw), ew=jnp.asarray(ew),
            line2d=jnp.asarray(l.astype(np.float32)),
            inv_sigma2=jnp.ones(L), valid=jnp.asarray(rng.uniform(size=L) < 0.6),
        )
        return pts, lines, T_gt

    @pytest.mark.parametrize("with_lines", [False, True])
    def test_interpret_matches_jnp(self, rng, with_lines):
        from plslam_tpu.solvers.pose_pallas import pose_optimization_pallas

        pts, lines, T_gt = self._padded_scene(rng)
        ln = lines if with_lines else None
        Tj, pj, lj = P.pose_optimization(se3.identity(), pts, jnp.asarray(K), BF, lines=ln)
        Tp, pp, lp = pose_optimization_pallas(
            se3.identity(), pts, jnp.asarray(K), BF, lines=ln, interpret=True
        )
        np.testing.assert_allclose(np.asarray(Tj), np.asarray(Tp), atol=1e-4)
        assert (np.asarray(pj) == np.asarray(pp)).mean() > 0.995
        if with_lines:
            assert (np.asarray(lj) == np.asarray(lp)).mean() > 0.99

    @pytest.mark.skipif(not _tpu_available(), reason="needs a TPU device")
    def test_mosaic_matches_jnp_on_tpu(self, rng):
        from plslam_tpu.solvers.pose_pallas import pose_optimization_pallas

        pts, lines, T_gt = self._padded_scene(rng)
        Tj, pj, lj = P.pose_optimization(se3.identity(), pts, jnp.asarray(K), BF, lines=lines)
        Tp, pp, lp = pose_optimization_pallas(
            se3.identity(), pts, jnp.asarray(K), BF, lines=lines
        )
        np.testing.assert_allclose(np.asarray(Tj), np.asarray(Tp), atol=1e-4)
        assert (np.asarray(pj) == np.asarray(pp)).mean() > 0.995
        assert (np.asarray(lj) == np.asarray(lp)).mean() > 0.99
