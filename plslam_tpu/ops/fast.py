"""FAST-9/16 corner detection, fully vectorized (whole image at once).

Replaces the reference's per-30px-cell cv::FAST calls with threshold fallback
20 -> 7 (src/ORBextractor.cc §ComputeKeyPointsOctTree ~750). Instead of a cell
loop, we compute dense corner masks at BOTH thresholds in one pass and select
per cell: cells where the high threshold found nothing use the low-threshold
mask — bit-identical policy, batched.

Corner test: 16-pixel Bresenham circle of radius 3; corner iff >= 9 contiguous
circle pixels are all brighter than p + t or all darker than p - t.

Score: the reference uses cv::FAST's score (max threshold preserving
cornerness). We use the standard SAD proxy: max over (bright, dark) of the sum
of |I_i - I_p| - t over the qualifying circle pixels. Only the relative order
matters (NMS + top-k selection), and the SAD score is the canonical
FPGA/GPU-port choice (e.g. arXiv:1710.07312).
"""

from __future__ import annotations

import jax.numpy as jnp

# Bresenham circle radius 3 (dy, dx), clockwise from 12 o'clock — the
# standard FAST-16 ring.
CIRCLE = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)
ARC = 9  # contiguous run length for FAST-9


def _neighbors(img):
    """f32[H, W] -> f32[16, H, W] of circle-neighbor intensities."""
    p = jnp.pad(img, 3, mode="edge")
    H, W = img.shape
    nbs = [p[3 + dy : 3 + dy + H, 3 + dx : 3 + dx + W] for dy, dx in CIRCLE]
    return jnp.stack(nbs, 0)


def _arc_any(mask):
    """bool[16, H, W] -> bool[H, W]: any run of >= ARC contiguous true values
    on the circular ring. AND of ARC rotations, then any over positions."""
    acc = mask
    for k in range(1, ARC):
        acc = acc & jnp.roll(mask, -k, axis=0)
    return jnp.any(acc, axis=0)


def fast_scores(img, threshold):
    """Dense FAST response map. img f32[H, W] (0..255), scalar threshold.

    Returns f32[H, W]: 0 where not a corner, SAD score where corner.
    """
    nbs = _neighbors(img)
    d = nbs - img[None]
    bright = d > threshold
    dark = d < -threshold
    is_corner = _arc_any(bright) | _arc_any(dark)
    score_b = jnp.sum(jnp.where(bright, d - threshold, 0.0), axis=0)
    score_d = jnp.sum(jnp.where(dark, -d - threshold, 0.0), axis=0)
    score = jnp.maximum(score_b, score_d)
    return jnp.where(is_corner, score, 0.0)


def nms3(score):
    """3x3 non-max suppression: keep strict local maxima (ties broken toward
    the top-left via epsilon on raster order is unnecessary — float SAD ties
    are vanishingly rare; equal neighbors suppress each other). Works on
    [..., H, W] (leading batch dims allowed)."""
    pad = [(0, 0)] * (score.ndim - 2) + [(1, 1), (1, 1)]
    p = jnp.pad(score, pad, mode="constant", constant_values=-1.0)
    H, W = score.shape[-2], score.shape[-1]
    neigh = jnp.stack(
        [
            p[..., 1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W]
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
            if not (dy == 0 and dx == 0)
        ],
        0,
    )
    return jnp.where(score > jnp.max(neigh, 0), score, 0.0)


def fallback_nms_border_stack(s_hi, s_lo, level_hw, cell: int, border: int):
    """Batched tail of fast_with_fallback for a [L, H, W] pyramid stack:
    per-cell threshold fallback, 3x3 NMS, and PER-LEVEL border masking
    (each level's true extent level_hw[l] = (h, w) is smaller than the
    shared plane; everything beyond it is edge-replicated filler)."""
    L, H, W = s_hi.shape
    ch, cw = -(-H // cell), -(-W // cell)
    pad_h, pad_w = ch * cell - H, cw * cell - W
    hi_p = jnp.pad(s_hi, ((0, 0), (0, pad_h), (0, pad_w)))
    cell_has = (
        hi_p.reshape(L, ch, cell, cw, cell).max(axis=(2, 4)) > 0.0
    )  # bool[L, ch, cw]
    full = jnp.repeat(jnp.repeat(cell_has, cell, 1), cell, 2)[:, :H, :W]
    score = jnp.where(full, s_hi, s_lo)
    score = nms3(score)
    hs = jnp.asarray([h for h, _ in level_hw])[:, None, None]
    ws = jnp.asarray([w for _, w in level_hw])[:, None, None]
    ys = jnp.arange(H)[None, :, None]
    xs = jnp.arange(W)[None, None, :]
    inside = (
        (ys >= border) & (ys < hs - border) & (xs >= border) & (xs < ws - border)
    )
    return jnp.where(inside, score, 0.0)


def fast_with_fallback(img, ini_th, min_th, cell: int, border: int):
    """Dense score map with the reference's per-cell threshold fallback and
    border masking. Cells are `cell` x `cell` pixels; a cell with no corner at
    ini_th falls back to min_th. Scores within `border` of the edge are 0."""
    s_hi = fast_scores(img, ini_th)
    s_lo = fast_scores(img, min_th)
    H, W = img.shape
    ch, cw = -(-H // cell), -(-W // cell)  # ceil
    pad_h, pad_w = ch * cell - H, cw * cell - W
    hi_p = jnp.pad(s_hi, ((0, pad_h), (0, pad_w)))
    cell_has = (
        hi_p.reshape(ch, cell, cw, cell).max(axis=(1, 3)) > 0.0
    )  # bool[ch, cw]
    cell_has_full = jnp.repeat(jnp.repeat(cell_has, cell, 0), cell, 1)[:H, :W]
    score = jnp.where(cell_has_full, s_hi, s_lo)
    score = nms3(score)
    # border mask (EDGE_THRESHOLD=19: descriptor patch must fit)
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    inside = (ys >= border) & (ys < H - border) & (xs >= border) & (xs < W - border)
    return jnp.where(inside, score, 0.0)
