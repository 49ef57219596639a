"""ORB feature pipeline vs cv2/NumPy oracles (SURVEY.md §5: unit/golden)."""

import numpy as np
import pytest

import jax.numpy as jnp

from plslam_tpu.ops import brief, fast, orientation, patches, pyramid, select
from plslam_tpu.features.orb import ORBExtractor, features_per_level


def make_test_image(rng, h=120, w=160, blur=3):
    cv2 = pytest.importorskip("cv2")
    img = rng.uniform(0, 255, (h, w)).astype(np.float32)
    img = cv2.GaussianBlur(img, (0, 0), blur)
    img = (img - img.min()) / (img.max() - img.min()) * 255.0
    return img.astype(np.float32)


class TestFAST:
    def test_segment_test_matches_cv2(self, rng):
        """The FAST-9/16 corner decision itself must be exact vs cv2
        (nonmax off). Compare away from the border (cv2 skips 3px)."""
        cv2 = pytest.importorskip("cv2")
        img = make_test_image(rng)
        th = 20
        det = cv2.FastFeatureDetector_create(
            threshold=th, nonmaxSuppression=False,
            type=cv2.FAST_FEATURE_DETECTOR_TYPE_9_16,
        )
        kps = det.detect(img.astype(np.uint8))
        ref_mask = np.zeros(img.shape, bool)
        for kp in kps:
            ref_mask[int(kp.pt[1]), int(kp.pt[0])] = True
        ours = np.asarray(fast.fast_scores(jnp.asarray(img.astype(np.uint8).astype(np.float32)), float(th))) > 0
        inner = (slice(3, -3), slice(3, -3))
        agree = ours[inner] == ref_mask[inner]
        assert agree.mean() > 0.999, f"FAST mismatch: {1 - agree.mean():.4%}"

    def test_fallback_threshold(self, rng):
        """Low-contrast cells must pick up corners at the fallback threshold."""
        img = make_test_image(rng, blur=2) * 0.2 + 100.0  # compress contrast
        s_hi = np.asarray(fast.fast_scores(jnp.asarray(img), 20.0))
        s_fb = np.asarray(
            fast.fast_with_fallback(jnp.asarray(img), 20.0, 7.0, 32, 19)
        )
        assert (s_hi > 0).sum() == 0 or (s_hi > 0).sum() < (s_fb > 0).sum()
        assert (s_fb > 0).sum() > 0

    def test_border_masked(self, rng):
        img = make_test_image(rng)
        s = np.asarray(fast.fast_with_fallback(jnp.asarray(img), 20.0, 7.0, 32, 19))
        assert s[:19, :].max() == 0 and s[-19:, :].max() == 0
        assert s[:, :19].max() == 0 and s[:, -19:].max() == 0


class TestSelect:
    def test_topk_spread_and_validity(self, rng):
        score = np.zeros((64, 64), np.float32)
        pts = [(10, 10, 5.0), (10, 40, 3.0), (40, 10, 7.0), (40, 40, 1.0)]
        for y, x, v in pts:
            score[y, x] = v
        yx, resp, valid = (np.asarray(a) for a in select.select_topk_grid(jnp.asarray(score), 6, cell=16))
        assert valid.sum() == 4
        got = {(int(y), int(x)) for (y, x), ok in zip(yx, valid) if ok}
        assert got == {(10, 10), (10, 40), (40, 10), (40, 40)}
        assert resp[0] == 7.0  # sorted by response

    def test_cell_top1(self):
        score = np.zeros((32, 32), np.float32)
        score[5, 5], score[6, 6] = 2.0, 9.0  # same 16px cell
        yx, resp, valid = (np.asarray(a) for a in select.select_topk_grid(jnp.asarray(score), 4, cell=16))
        assert valid.sum() == 1 and tuple(yx[0]) == (6, 6)


class TestOrientation:
    def test_matches_numpy_oracle(self, rng):
        img = make_test_image(rng)
        yx = jnp.asarray(rng.integers(25, 90, size=(20, 2)).astype(np.int32))
        p = patches.gather_patches(jnp.asarray(img), yx, 31)
        ours = np.asarray(orientation.ic_angle(p, radius=15))
        ys, xs = np.mgrid[-15:16, -15:16]
        circ = (ys**2 + xs**2) <= 225
        for i in range(20):
            patch = np.asarray(p[i])
            m10 = (patch * xs * circ).sum()
            m01 = (patch * ys * circ).sum()
            assert abs(np.arctan2(m01, m10) - ours[i]) < 1e-4

    def test_blurred_vs_raw_angle_equivalence(self, rng):
        """The extractor computes IC angle from the BLURRED patch (saves the
        raw-patch gather); isotropic blur must preserve the centroid
        direction to within a couple of degrees on textured patches (the
        matcher's rotation-consistency histogram bins are 12 degrees)."""
        cv2 = pytest.importorskip("cv2")
        img = make_test_image(rng)
        blurred = cv2.GaussianBlur(img, (7, 7), 2.0)
        yx = jnp.asarray(rng.integers(25, 90, size=(32, 2)).astype(np.int32))
        p_raw = patches.gather_patches(jnp.asarray(img), yx, 31)
        p_blur = patches.gather_patches(jnp.asarray(blurred), yx, 31)
        a_raw = np.asarray(orientation.ic_angle(p_raw, radius=15))
        a_blur = np.asarray(orientation.ic_angle(p_blur, radius=15))
        diff = np.abs(np.angle(np.exp(1j * (a_raw - a_blur))))
        assert np.median(diff) < np.deg2rad(2.5), np.rad2deg(np.median(diff))

    def test_gradient_image_angle(self):
        """On a pure horizontal ramp the centroid points along +x."""
        img = jnp.asarray(np.tile(np.arange(64, dtype=np.float32), (64, 1)))
        p = patches.gather_patches(img, jnp.asarray([[32, 32]], np.int32), 31)
        ang = float(orientation.ic_angle(p, radius=15)[0])
        assert abs(ang) < 0.05


class TestBrief:
    def test_deterministic_and_nonconstant(self, rng):
        img = make_test_image(rng)
        yx = jnp.asarray(rng.integers(25, 90, size=(16, 2)).astype(np.int32))
        p = patches.gather_patches(jnp.asarray(img), yx, brief.PATCH_D)
        ang = jnp.zeros(16)
        d1 = np.asarray(brief.steered_brief(p, ang))
        d2 = np.asarray(brief.steered_brief(p, ang))
        assert (d1 == d2).all()
        assert len({bytes(row) for row in d1}) > 8  # distinct descriptors

    def test_rotation_steering(self, rng):
        """Rotating the patch and steering by the same angle gives a much
        closer descriptor than not steering."""
        cv2 = pytest.importorskip("cv2")
        img = make_test_image(rng, 160, 160, blur=2)
        c = 80
        angle_deg = 30.0
        M = cv2.getRotationMatrix2D((c, c), -angle_deg, 1.0)
        rot = cv2.warpAffine(img, M, (160, 160), flags=cv2.INTER_LINEAR)
        yx = jnp.asarray([[c, c]], np.int32)
        p0 = patches.gather_patches(jnp.asarray(img), yx, brief.PATCH_D)
        p1 = patches.gather_patches(jnp.asarray(rot), yx, brief.PATCH_D)
        d0 = np.asarray(brief.steered_brief(p0, jnp.zeros(1)))
        d_steered = np.asarray(
            brief.steered_brief(p1, jnp.asarray([np.deg2rad(angle_deg)]))
        )
        d_unsteered = np.asarray(brief.steered_brief(p1, jnp.zeros(1)))

        def ham(a, b):
            return np.unpackbits(a ^ b).sum()

        assert ham(d0, d_steered) < ham(d0, d_unsteered)
        assert ham(d0, d_steered) < 60

    def test_rank1_matmul_matches_gather_oracle(self, rng):
        """The one-hot-matmul sampling must agree with a plain NumPy gather
        of the same rounded rotated positions (up to bf16 rounding ties)."""
        img = make_test_image(rng)
        yx = jnp.asarray(rng.integers(25, 90, size=(12, 2)).astype(np.int32))
        p = patches.gather_patches(jnp.asarray(img), yx, brief.PATCH_D)
        ang = rng.uniform(-np.pi, np.pi, 12).astype(np.float32)
        ours = np.asarray(brief.steered_brief(p, jnp.asarray(ang)))

        pa, pb = brief.pattern()
        pn = np.asarray(p)
        ref = np.zeros((12, 32), np.uint8)
        for i in range(12):
            ca, sa = np.cos(ang[i]), np.sin(ang[i])
            bits = np.zeros(256, np.uint8)
            for b in range(256):
                def sample(pt):
                    rx = int(np.round(pt[0] * ca - pt[1] * sa))
                    ry = int(np.round(pt[0] * sa + pt[1] * ca))
                    return pn[i, ry + brief.PATCH_R, rx + brief.PATCH_R]
                bits[b] = sample(pa[b]) < sample(pb[b])
            ref[i] = np.packbits(bits.reshape(32, 8)[:, ::-1], axis=-1).ravel()
        ham = np.unpackbits(ours ^ ref).sum(axis=-1) if ours.ndim == 1 else np.array(
            [np.unpackbits(ours[i] ^ ref[i]).sum() for i in range(12)]
        )
        assert ham.mean() < 6, f"rank-1 vs gather oracle hamming {ham}"

    def test_unpack_pm1_hamming_identity(self, rng):
        a = rng.integers(0, 256, (8, 32)).astype(np.uint8)
        b = rng.integers(0, 256, (8, 32)).astype(np.uint8)
        pa = np.asarray(brief.unpack_bits_pm1(jnp.asarray(a), jnp.float32))
        pb = np.asarray(brief.unpack_bits_pm1(jnp.asarray(b), jnp.float32))
        dot = pa @ pb.T
        ham = np.array([[np.unpackbits(x ^ y).sum() for y in b] for x in a])
        np.testing.assert_array_equal((256 - dot) / 2, ham)


class TestExtractor:
    def test_per_level_budget(self):
        pl = features_per_level(1000, 1.2, 8)
        assert sum(pl) == 1000 and pl[0] > pl[-1] > 0

    def test_end_to_end(self, rng):
        img = make_test_image(rng, 240, 320)
        ext = ORBExtractor(240, 320, n_features=500)
        fs = ext(jnp.asarray(img))
        valid = np.asarray(fs.valid)
        assert valid.sum() > 300, f"only {valid.sum()} features"
        uv = np.asarray(fs.uv)[valid]
        assert (uv[:, 0] < 320).all() and (uv[:, 1] < 240).all()
        oct_ = np.asarray(fs.octave)[valid]
        assert oct_.max() >= 4  # features found on upper pyramid levels
        desc = np.asarray(fs.desc)[valid]
        assert len({bytes(r) for r in desc}) > valid.sum() * 0.9

    def test_jit_stability(self, rng):
        img = make_test_image(rng, 120, 160)
        ext = ORBExtractor(120, 160, n_features=200)
        f1, f2 = ext(jnp.asarray(img)), ext(jnp.asarray(img))
        assert (np.asarray(f1.desc) == np.asarray(f2.desc)).all()
