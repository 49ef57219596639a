"""Image pyramid + Gaussian blur.

Replaces ORBextractor::ComputePyramid (8 bilinear resizes, scale 1.2) and the
per-level GaussianBlur(7x7, sigma=2) applied before descriptor sampling
(src/ORBextractor.cc §operator() ~1050). Level shapes are static Python ints
so everything stays jit-compatible.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def level_shapes(height: int, width: int, n_levels: int, scale_factor: float):
    """Static per-level (H, W) like the reference (round(W / s^l))."""
    shapes = []
    for l in range(n_levels):
        inv = 1.0 / scale_factor**l
        shapes.append((int(round(height * inv)), int(round(width * inv))))
    return shapes


def build_pyramid(img, n_levels: int, scale_factor: float):
    """img f32[H, W] -> list of f32[Hl, Wl]. Level 0 is the input."""
    H, W = img.shape
    shapes = level_shapes(H, W, n_levels, scale_factor)
    levels = [img]
    for l in range(1, n_levels):
        # reference resizes from the previous level (cv::resize INTER_LINEAR)
        levels.append(
            jax.image.resize(levels[-1], shapes[l], method="bilinear")
        )
    return levels


@functools.lru_cache(maxsize=8)
def _gauss_kernel(ksize: int, sigma: float):
    r = ksize // 2
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    k /= k.sum()
    return k.astype(np.float32)  # numpy: lru_cache must not hold tracers


def gaussian_blur(img, ksize: int = 7, sigma: float = 2.0):
    """Separable Gaussian, replicate borders (cv::GaussianBlur BORDER_REFLECT_101
    differs only within 3px of the edge; keypoints live >=19px inside)."""
    k = jnp.asarray(_gauss_kernel(ksize, sigma))
    r = ksize // 2
    x = jnp.pad(img, ((r, r), (r, r)), mode="edge")
    x = jax.lax.conv_general_dilated(
        x[None, None], k[None, None, :, None], (1, 1), "VALID"
    )[0, 0]
    x = jax.lax.conv_general_dilated(
        x[None, None], k[None, None, None, :], (1, 1), "VALID"
    )[0, 0]
    return x
