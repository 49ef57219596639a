"""Geometry library vs scipy/cv2 oracles (SURVEY.md §5 test plan: unit/golden)."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax
import jax.numpy as jnp

from plslam_tpu.geometry import camera, se3, sim3


def random_se3(rng, n=16, max_angle=3.0):
    rotvec = rng.normal(size=(n, 3))
    rotvec = rotvec / np.linalg.norm(rotvec, axis=-1, keepdims=True)
    rotvec *= rng.uniform(0, max_angle, size=(n, 1))
    R = Rotation.from_rotvec(rotvec).as_matrix()
    t = rng.normal(size=(n, 3))
    T = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    T[:, :3, :3] = R
    T[:, :3, 3] = t
    return T.astype(np.float32)


class TestSO3:
    def test_exp_matches_scipy(self, rng):
        phi = rng.normal(size=(64, 3)).astype(np.float32)
        R = np.asarray(se3.so3_exp(jnp.asarray(phi)))
        R_ref = Rotation.from_rotvec(phi).as_matrix()
        np.testing.assert_allclose(R, R_ref, atol=1e-5)

    def test_exp_small_angle(self):
        phi = jnp.array([[1e-10, 0, 0], [0.0, 0, 0]])
        R = se3.so3_exp(phi)
        np.testing.assert_allclose(np.asarray(R), np.tile(np.eye(3), (2, 1, 1)), atol=1e-6)

    def test_log_roundtrip(self, rng):
        phi = rng.normal(size=(64, 3)).astype(np.float32)
        phi = phi / np.linalg.norm(phi, axis=-1, keepdims=True)
        phi *= rng.uniform(0.01, 3.1, size=(64, 1)).astype(np.float32)
        R = se3.so3_exp(jnp.asarray(phi))
        phi2 = np.asarray(se3.so3_log(R))
        np.testing.assert_allclose(phi2, phi, atol=2e-3)


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = rng.normal(size=(32, 6)).astype(np.float32)
        T = se3.exp(jnp.asarray(xi))
        xi2 = np.asarray(se3.log(T))
        np.testing.assert_allclose(xi2, xi, atol=1e-3)

    def test_inverse(self, rng):
        T = jnp.asarray(random_se3(rng))
        TT = np.asarray(T @ se3.inverse(T))
        np.testing.assert_allclose(TT, np.tile(np.eye(4), (T.shape[0], 1, 1)), atol=1e-5)

    def test_transform_points(self, rng):
        T = random_se3(rng, n=4)
        p = rng.normal(size=(4, 10, 3)).astype(np.float32)
        out = np.asarray(se3.transform(jnp.asarray(T), jnp.asarray(p)))
        ref = np.einsum("bij,bnj->bni", T[:, :3, :3], p) + T[:, None, :3, 3]
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_quat_roundtrip(self, rng):
        T = random_se3(rng, n=32)
        q = np.asarray(se3.to_quat_xyzw(jnp.asarray(T[:, :3, :3])))
        q_ref = Rotation.from_matrix(T[:, :3, :3]).as_quat()  # scipy: xyzw
        # allow sign flip
        sign = np.sign(np.sum(q * q_ref, -1, keepdims=True))
        np.testing.assert_allclose(q, q_ref * sign, atol=1e-4)
        T2 = np.asarray(se3.from_quat_xyzw(jnp.asarray(q), jnp.asarray(T[:, :3, 3])))
        np.testing.assert_allclose(T2, T, atol=1e-4)

    def test_jit_and_grad(self):
        f = jax.jit(lambda xi: jnp.sum(se3.exp(xi)))
        g = jax.grad(lambda xi: jnp.sum(se3.exp(xi) ** 2))(jnp.ones(6) * 0.1)
        assert np.isfinite(f(jnp.ones(6) * 0.3))
        assert np.all(np.isfinite(np.asarray(g)))


class TestSim3:
    def test_exp_log_roundtrip(self, rng):
        xi = rng.normal(size=(32, 7)).astype(np.float32) * 0.8
        S = sim3.exp(jnp.asarray(xi))
        xi2 = np.asarray(sim3.log(S))
        np.testing.assert_allclose(xi2, xi, atol=2e-3)

    def test_exp_zero_rotation(self, rng):
        xi = np.zeros((4, 7), np.float32)
        xi[:, :3] = rng.normal(size=(4, 3))
        xi[:, 6] = rng.normal(size=4) * 0.5
        S = sim3.exp(jnp.asarray(xi))
        xi2 = np.asarray(sim3.log(S))
        np.testing.assert_allclose(xi2, xi, atol=1e-4)

    def test_compose_inverse(self, rng):
        xi = rng.normal(size=(8, 7)).astype(np.float32) * 0.5
        S = sim3.exp(jnp.asarray(xi))
        I = sim3.compose(S, sim3.inverse(S))
        np.testing.assert_allclose(np.asarray(I[0]), np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(I[1]), np.zeros((8, 3)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(I[2]), np.ones(8), atol=1e-5)

    def test_apply_matches_manual(self, rng):
        xi = rng.normal(size=(7,)).astype(np.float32) * 0.5
        S = sim3.exp(jnp.asarray(xi))
        p = rng.normal(size=(5, 3)).astype(np.float32)
        out = np.asarray(sim3.apply(S, jnp.asarray(p)))
        R, t, s = (np.asarray(x) for x in S)
        ref = s * p @ R.T + t
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestCamera:
    K = np.array([[517.3, 0, 318.6], [0, 516.5, 255.3], [0, 0, 1]], np.float32)
    dist = np.array([0.2624, -0.9531, -0.0054, 0.0026, 1.1633], np.float32)  # TUM1

    def test_project_backproject(self, rng):
        p = rng.uniform(-1, 1, size=(100, 3)).astype(np.float32)
        p[:, 2] = rng.uniform(0.5, 5.0, size=100)
        uv = camera.project(jnp.asarray(self.K), jnp.asarray(p))
        p2 = np.asarray(camera.backproject(jnp.asarray(self.K), uv, jnp.asarray(p[:, 2])))
        np.testing.assert_allclose(p2, p, atol=1e-4)

    def test_undistort_matches_cv2(self, rng):
        cv2 = pytest.importorskip("cv2")
        uv = rng.uniform([50, 50], [590, 430], size=(200, 2)).astype(np.float32)
        ours = np.asarray(
            camera.undistort_pixels(jnp.asarray(self.K), jnp.asarray(self.dist), jnp.asarray(uv))
        )
        ref = cv2.undistortPoints(
            uv.reshape(-1, 1, 2), self.K, self.dist, P=self.K
        ).reshape(-1, 2)
        np.testing.assert_allclose(ours, ref, atol=0.1)  # sub-0.1px parity

    def test_stereo_projection(self):
        bf = 40.0
        p = jnp.array([[0.5, 0.2, 2.0]])
        uvr = np.asarray(camera.project_stereo(jnp.asarray(self.K), bf, p))
        assert abs(uvr[0, 2] - (uvr[0, 0] - bf / 2.0)) < 1e-4
