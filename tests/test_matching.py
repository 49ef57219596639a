"""Matching ops: MXU Hamming identity, gates, mutual-nearest assignment."""

import numpy as np

import jax.numpy as jnp

from plslam_tpu.matching import points as M
from plslam_tpu.ops import brief


def _pm1(rng, n):
    d = rng.integers(0, 256, (n, 32)).astype(np.uint8)
    return d, np.asarray(brief.unpack_bits_pm1(jnp.asarray(d), jnp.float32))


class TestHamming:
    def test_matrix_exact(self, rng):
        da, pa = _pm1(rng, 64)
        db, pb = _pm1(rng, 48)
        D = np.asarray(M.hamming_matrix(jnp.asarray(pa), jnp.asarray(pb)))
        ref = np.array([[np.unpackbits(x ^ y).sum() for y in db] for x in da])
        np.testing.assert_array_equal(D, ref)


class TestMatchDescriptors:
    def test_recovers_permutation(self, rng):
        n = 100
        d, p = _pm1(rng, n)
        perm = rng.permutation(n)
        # b = shuffled a with a few flipped bits (distance ~8 << TH_LOW)
        db = d[perm].copy()
        flip = rng.integers(0, 32, (n, 1))
        for i in range(n):
            db[i, flip[i]] ^= 0x11
        pb = np.asarray(brief.unpack_bits_pm1(jnp.asarray(db), jnp.float32))
        valid = jnp.ones(n, bool)
        mb, dist = M.match_descriptors(
            jnp.asarray(p), valid, jnp.asarray(pb), valid, nn_ratio=0.9
        )
        mb = np.asarray(mb)
        matched = mb >= 0
        assert matched.mean() > 0.95
        # each matched a-row i must point at the b-row holding a[i]
        inv = np.argsort(perm)
        np.testing.assert_array_equal(mb[matched], inv[matched])

    def test_threshold_rejects(self, rng):
        _, pa = _pm1(rng, 30)
        _, pb = _pm1(rng, 30)  # unrelated: expected Hamming ~128
        valid = jnp.ones(30, bool)
        mb, _ = M.match_descriptors(jnp.asarray(pa), valid, jnp.asarray(pb), valid)
        assert (np.asarray(mb) == -1).all()


class TestSearchByProjection:
    def test_window_and_octave_gates(self, rng):
        n = 50
        d, p = _pm1(rng, n)
        kp_uv = rng.uniform(0, 640, (n, 2)).astype(np.float32)
        kp_oct = np.zeros(n, np.int32)
        # landmarks predicted exactly at keypoints, same descriptors
        match, dist = M.search_by_projection(
            jnp.asarray(kp_uv), jnp.asarray(kp_oct), jnp.asarray(p), jnp.ones(n, bool),
            jnp.asarray(kp_uv), jnp.asarray(kp_oct), jnp.asarray(p), jnp.ones(n, bool),
            radius=5.0,
        )
        np.testing.assert_array_equal(np.asarray(match), np.arange(n))
        # push predictions far away -> no matches
        match2, _ = M.search_by_projection(
            jnp.asarray(kp_uv), jnp.asarray(kp_oct), jnp.asarray(p), jnp.ones(n, bool),
            jnp.asarray(kp_uv + 100.0), jnp.asarray(kp_oct), jnp.asarray(p), jnp.ones(n, bool),
            radius=5.0,
        )
        assert (np.asarray(match2) == -1).all()
        # octave mismatch beyond tol -> no matches
        match3, _ = M.search_by_projection(
            jnp.asarray(kp_uv), jnp.asarray(kp_oct), jnp.asarray(p), jnp.ones(n, bool),
            jnp.asarray(kp_uv), jnp.asarray(kp_oct + 3), jnp.asarray(p), jnp.ones(n, bool),
            radius=5.0,
        )
        assert (np.asarray(match3) == -1).all()

    def test_rotation_histogram_rejects_inconsistent(self, rng):
        n = 60
        d, p = _pm1(rng, n)
        uv = rng.uniform(0, 640, (n, 2)).astype(np.float32)
        oct_ = np.zeros(n, np.int32)
        ang_a = np.zeros(n, np.float32)
        ang_b = np.zeros(n, np.float32)
        ang_b[:4] = 2.0  # 4/60 (<10% of max bin) claim a different rotation
        match, _ = M.search_by_projection(
            jnp.asarray(uv), jnp.asarray(oct_), jnp.asarray(p), jnp.ones(n, bool),
            jnp.asarray(uv), jnp.asarray(oct_), jnp.asarray(p), jnp.ones(n, bool),
            radius=5.0, kp_angle=jnp.asarray(ang_a), lm_angle=jnp.asarray(ang_b),
        )
        match = np.asarray(match)
        assert (match[:4] == -1).all()
        assert (match[4:] == np.arange(4, n)).all()
