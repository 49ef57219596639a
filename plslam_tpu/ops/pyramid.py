"""Image pyramid + Gaussian blur.

Replaces ORBextractor::ComputePyramid (8 bilinear resizes, scale 1.2) and the
per-level GaussianBlur(7x7, sigma=2) applied before descriptor sampling
(src/ORBextractor.cc §operator() ~1050). Level shapes are static Python ints
so everything stays jit-compatible.

Two implementations:
  * build_pyramid: a chain of jax.image.resize calls, one array per level
    (the original per-level path; still the oracle for the stacked path).
  * build_pyramid_stack: ONE [L, H, W] tensor via two batched MXU matmuls
    with per-level COMPOSED interpolation matrices. Chained 2D bilinear
    resizing is separable and linear, so the whole resize chain collapses to
    (AH_l @ img @ AW_l^T) with AH_l = M_l ... M_1 precomputed in f64 on the
    host — mathematically identical to the resize chain, and the region
    beyond each level's true extent is filled by EDGE REPLICATION (encoded
    in the matrices) so downstream patch gathers never read garbage. The
    per-level XLA op soup (~435 kernels for 8 levels) is what capped the
    tracker at ~60 fps on the tunnel-attached TPU; the stacked form runs
    every stage as one batched kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

def _mm_img(a, b):
    """Image-plane matmul at HIGH precision (3-pass bf16x3 ≈ f32: ~1e-6
    relative error, <0.001 intensity units on 0-255 images — far below the
    FAST threshold of 7 and BRIEF's compare margins). The round-3 HIGHEST
    (6-pass) pinning measured 195+ us/frame across the pyramid/blur matmuls;
    HIGH halves that with no observable effect (geometry/solvers keep
    utils.precision.mm at HIGHEST — image resampling is not rotation
    algebra)."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGH)


mm = _mm_img


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


def _interp_1d(n_out: int, n_in: int):
    """1D resize matrix f64[n_out, n_in] matching jax.image.resize
    'bilinear': half-pixel-center sampling with the triangle kernel SCALED
    by the downsample factor (antialiasing), edge-clamped and re-normalized
    — the exact weights the per-level resize chain used."""
    M = np.zeros((n_out, n_in), np.float64)
    scale = n_in / n_out
    s = max(scale, 1.0)  # kernel width scaling (downsample only)
    for i in range(n_out):
        src = (i + 0.5) * scale - 0.5
        j_lo = int(np.floor(src - s)) - 1
        j_hi = int(np.ceil(src + s)) + 1
        for j in range(j_lo, j_hi + 1):
            w = max(0.0, 1.0 - abs(j - src) / s)
            if w > 0.0 and 0 <= j < n_in:  # out-of-bounds taps dropped,
                M[i, j] += w  # then renormalized (jax.image.resize edge rule)
        M[i] /= M[i].sum()
    return M


@functools.lru_cache(maxsize=8)
def pyramid_matrices(height: int, width: int, n_levels: int, scale_factor: float):
    """-> (AH f32[L, H, H], AW f32[L, W, W]) composed per-level interp
    matrices. Rows/cols beyond a level's true (h_l, w_l) replicate the last
    real row/col (edge extension for halo reads)."""
    shapes = level_shapes(height, width, n_levels, scale_factor)
    AH = np.zeros((n_levels, height, height), np.float64)
    AW = np.zeros((n_levels, width, width), np.float64)
    Ch = np.eye(height)
    Cw = np.eye(width)
    prev_h, prev_w = height, width
    for l, (h, w) in enumerate(shapes):
        if l > 0:
            Ch = _interp_1d(h, prev_h) @ Ch  # [h_l, H]
            Cw = _interp_1d(w, prev_w) @ Cw
            prev_h, prev_w = h, w
        AH[l, :h] = Ch
        AH[l, h:] = Ch[h - 1]  # edge replication
        AW[l, :w] = Cw
        AW[l, w:] = Cw[w - 1]
    return AH.astype(np.float32), AW.astype(np.float32)


@functools.lru_cache(maxsize=8)
def blur_matrices(height: int, width: int, ksize: int = 7, sigma: float = 2.0):
    """-> (BH f32[H, H], BW f32[W, W]) banded separable Gaussian with edge
    clamping, shared by every level (the blur is pixel-grid-local)."""
    k = _gauss_kernel(ksize, sigma).astype(np.float64)
    r = ksize // 2

    def band(n):
        B = np.zeros((n, n), np.float64)
        for i in range(n):
            for d in range(-r, r + 1):
                B[i, min(max(i + d, 0), n - 1)] += k[d + r]
        return B.astype(np.float32)

    return band(height), band(width)


def build_pyramid_stack(img, n_levels: int, scale_factor: float, via: str = "matmul"):
    """img f32[H, W] -> f32[L, H, W]: every level on one padded plane
    (area beyond a level's true extent is edge-replicated).

    via="matmul": two batched MXU matmuls with composed interp matrices.
    via="chain": the jax.image.resize chain, edge-padded onto the plane
    (bisection reference; numerically identical up to fp rounding)."""
    H, W = img.shape
    if via == "chain":
        levels = build_pyramid(img, n_levels, scale_factor)
        shapes = level_shapes(H, W, n_levels, scale_factor)
        padded = [
            jnp.pad(lv, ((0, H - h), (0, W - w)), mode="edge")
            for lv, (h, w) in zip(levels, shapes)
        ]
        return jnp.stack(padded, 0)
    AH, AW = pyramid_matrices(H, W, n_levels, scale_factor)
    y = mm(jnp.asarray(AH), img)  # [L, H, W]
    return mm(y, jnp.asarray(AW).transpose(0, 2, 1))


def blur_stack(stack, ksize: int = 7, sigma: float = 2.0):
    """f32[L, H, W] -> per-level Gaussian blur as two batched matmuls."""
    L, H, W = stack.shape
    BH, BW = blur_matrices(H, W, ksize, sigma)
    y = mm(jnp.asarray(BH)[None], stack)
    return mm(y, jnp.asarray(BW).T[None])


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
