"""Spatially-spread keypoint selection: grid-cell top-1 + global top-k.

TPU-idiomatic replacement for ORBextractor::DistributeOctTree (~450 LoC
quadtree, src/ORBextractor.cc): instead of recursively splitting nodes and
keeping the max-response keypoint per leaf, we take the max-response corner
in each fixed grid cell and then the top-k cells by response. Both policies
pick "strongest corner per spatial bucket, capped at N" — statistically
equivalent spread (SURVEY.md §10.3c documents this as a deliberate design
deviation); the quadtree's data-dependent recursion is hostile to XLA.
"""

from __future__ import annotations

import jax.lax
import jax.numpy as jnp


def select_topk_grid(score, k: int, cell: int = 16):
    """score f32[H, W] -> (yx i32[k, 2], resp f32[k], valid bool[k]).

    Top-1 per `cell`x`cell` grid cell, then top-k cells by response.
    Invalid slots (fewer than k nonzero cells) have resp 0 and valid False.
    """
    H, W = score.shape
    ch, cw = -(-H // cell), -(-W // cell)
    pad_h, pad_w = ch * cell - H, cw * cell - W
    sp = jnp.pad(score, ((0, pad_h), (0, pad_w)))
    blocks = sp.reshape(ch, cell, cw, cell).transpose(0, 2, 1, 3).reshape(ch, cw, cell * cell)
    cell_best = jnp.max(blocks, -1)  # [ch, cw]
    cell_arg = jnp.argmax(blocks, -1)  # [ch, cw] index within cell
    flat_best = cell_best.reshape(-1)
    if flat_best.shape[0] < k:  # tiny top pyramid levels: fewer cells than k
        flat_best = jnp.pad(flat_best, (0, k - flat_best.shape[0]))
    resp, idx = jax.lax.top_k(flat_best, k)
    idx = jnp.minimum(idx, ch * cw - 1)
    cy, cx = idx // cw, idx % cw
    # barrier: without it XLA fuses the whole blocks/argmax producer chain
    # INTO the k-element kCustom gather and re-executes it per gathered
    # element (measured 351 us/frame; ~15 us with the plane materialized)
    cell_arg_flat = jax.lax.optimization_barrier(cell_arg.reshape(-1))
    within = jnp.take(cell_arg_flat, idx)
    y = cy * cell + within // cell
    x = cx * cell + within % cell
    valid = resp > 0.0
    yx = jnp.stack([y, x], -1).astype(jnp.int32)
    # clamp padded-region picks (can only happen when invalid)
    yx = jnp.minimum(yx, jnp.array([H - 1, W - 1], jnp.int32))
    return yx, resp, valid


def subpixel_refine(score, yx):
    """Parabolic subpixel refinement on the response map: [k, 2] integer
    (y, x) -> [k, 2] float offsets in [-0.5, 0.5] per axis.

    The reference keeps integer keypoints (cv::FAST has no subpixel); we
    refine because integer quantization noise is spatially correlated across
    frames and, projected onto weak pose directions (narrow FOV + shallow
    scene), it biases the per-frame pose optimum by ~0.5 cm — enough to
    destabilize the constant-velocity motion model."""
    H, W = score.shape
    y = jnp.clip(yx[:, 0], 1, H - 2)
    x = jnp.clip(yx[:, 1], 1, W - 2)
    # flat 1D gathers (2D advanced-index gathers lower poorly on this
    # backend); barrier so the score-map producer is not re-executed per
    # gathered element (see select_topk_grid)
    flat = jax.lax.optimization_barrier(score.reshape(-1))
    base = y * W + x

    def at(off):
        return flat[base + off]

    def axis_offset(sm, s0, sp):
        denom = 2.0 * s0 - sm - sp
        off = 0.5 * (sp - sm) / jnp.where(jnp.abs(denom) < 1e-6, 1.0, denom)
        return jnp.clip(jnp.where(jnp.abs(denom) < 1e-6, 0.0, off), -0.5, 0.5)

    s0 = at(0)
    oy = axis_offset(at(-W), s0, at(W))
    ox = axis_offset(at(-1), s0, at(1))
    return jnp.stack([oy, ox], -1)
