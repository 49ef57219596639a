"""Device LSD (ops/lsd_device.py) vs geometric ground truth and the host
detector (the oracle, SURVEY.md §10.3e)."""

import numpy as np
import pytest

import jax.numpy as jnp

from plslam_tpu.ops import lsd_device


def render_rect(h=240, w=320, x0=80, y0=60, x1=240, y1=180, bg=40.0, fg=200.0):
    img = np.full((h, w), bg, np.float32)
    img[y0:y1, x0:x1] = fg
    # light blur so gradients are not single-pixel spikes
    k = np.array([1, 4, 6, 4, 1], np.float32)
    k = np.outer(k, k) / 256.0
    from scipy.signal import convolve2d

    return convolve2d(img, k, mode="same", boundary="symm").astype(np.float32)


def seg_endpoints(sp, ep, valid):
    return [
        (tuple(np.round(s).astype(int)), tuple(np.round(e).astype(int)))
        for s, e, v in zip(np.asarray(sp), np.asarray(ep), np.asarray(valid))
        if v
    ]


def dist_point_to_seg(p, a, b):
    p, a, b = map(np.asarray, (p, a, b))
    ab = b - a
    t = np.clip(np.dot(p - a, ab) / max(np.dot(ab, ab), 1e-9), 0, 1)
    return np.linalg.norm(p - (a + t * ab))


class TestDeviceLSD:
    def test_recovers_rectangle_edges(self):
        """All four edges of a high-contrast rectangle must be detected,
        each covered by a segment aligned with it."""
        img = render_rect()
        sp, ep, valid = lsd_device.detect_lines_device(jnp.asarray(img), 64)
        segs = seg_endpoints(sp, ep, valid)
        assert len(segs) >= 4, f"only {len(segs)} segments"
        # each rectangle edge midpoint must be near some detected segment
        edges = [
            ((80, 120), "vertical left"),
            ((240, 120), "vertical right"),
            ((160, 60), "horizontal top"),
            ((160, 180), "horizontal bottom"),
        ]
        for (mx, my), name in edges:
            d = min(dist_point_to_seg((mx, my), s, e) for s, e in segs)
            assert d < 4.0, f"{name} edge not covered (nearest seg {d:.1f}px)"

    def test_segment_orientation_and_length(self):
        img = render_rect()
        sp, ep, valid = lsd_device.detect_lines_device(jnp.asarray(img), 64)
        sp, ep = np.asarray(sp)[np.asarray(valid)], np.asarray(ep)[np.asarray(valid)]
        seg = ep - sp
        ang = np.arctan2(seg[:, 1], seg[:, 0]) % np.pi
        # rectangle edges: every segment is near-horizontal or near-vertical
        ok = (np.abs(ang) < 0.2) | (np.abs(ang - np.pi / 2) < 0.2) | (
            np.abs(ang - np.pi) < 0.2
        )
        assert ok.mean() > 0.8
        lengths = np.linalg.norm(seg, axis=-1)
        # output contract: longest first
        assert (np.diff(lengths) <= 1e-3).all()
        assert lengths.max() > 60

    def test_blank_image_no_lines(self):
        img = np.full((240, 320), 100.0, np.float32)
        sp, ep, valid = lsd_device.detect_lines_device(jnp.asarray(img), 64)
        assert np.asarray(valid).sum() == 0

    def test_jittable_and_deterministic(self):
        import jax

        img = jnp.asarray(render_rect())
        f = jax.jit(lambda g: lsd_device.detect_lines_device(g, 64))
        a = f(img)
        b = f(img)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_parity_with_host_detector(self):
        """Host LSD is the oracle: on the rectangle fixture, every host
        segment must be covered by a device segment (direction + distance)."""
        from plslam_tpu.ops import lsd

        img = render_rect()
        hsp, hep, hval = lsd.detect_lines_host(img, 64)
        if not hval.any():
            pytest.skip("host detector unavailable")
        dsp, dep, dval = lsd_device.detect_lines_device(jnp.asarray(img), 64)
        dsegs = seg_endpoints(dsp, dep, dval)
        assert dsegs
        n_cov = 0
        n_host = 0
        for s, e, v in zip(hsp, hep, hval):
            if not v:
                continue
            n_host += 1
            mid = 0.5 * (np.asarray(s) + np.asarray(e))
            d = min(dist_point_to_seg(mid, a, b) for a, b in dsegs)
            n_cov += d < 5.0
        assert n_cov >= 0.75 * n_host, f"covered {n_cov}/{n_host} host segments"
