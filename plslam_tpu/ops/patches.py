"""Keypoint patch gathers.

Two implementations:

* `gather_patches` — dynamic_slice under vmap. Lowers to a sequential
  per-keypoint loop on the TPU runtime (~1.2 us per keypoint, measured via
  the device trace); the CPU/test path and the oracle. Still the fastest
  known XLA lowering: a row-sliced lax.gather (K*size [1, size] slices)
  measured 13x slower end-to-end, and scalar-element gathers are worse.

* `gather_patches_pallas` — Pallas TPU kernel: the whole (bf16) image stack
  resident in VMEM, keypoint coords scalar-prefetched into SMEM, patches
  read as VMEM dynamic slices inside a fori_loop and pipelined out in
  keypoint blocks. Replaces the XLA per-patch HBM round-trips with on-chip
  reads (SURVEY.md §4.2a hot loop: "BRIEF gather").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def gather_patches(img, yx, size: int):
    """img f32[H, W], yx i32[K, 2] (centers) -> f32[K, size, size].

    Patches are centered; callers guarantee centers are >= size//2 from the
    border (selection masks enforce EDGE_THRESHOLD). Out-of-range slices are
    clamped by dynamic_slice semantics (only reachable for invalid slots)."""
    r = size // 2
    start = yx - r

    def one(s):
        return jax.lax.dynamic_slice(img, (s[0], s[1]), (size, size))

    return jax.vmap(one)(start.astype(jnp.int32))


def gather_patches_pallas(img, yx, size: int, width: int = 48, block: int = 64,
                          interpret: bool = False):
    """img f32[H, W], yx i32[K, 2] (centers) -> bf16[K, size, width].

    The patch occupies columns [0, size); columns [size, width) are overread
    (width rounds the lane extent up so every read is one VMEM slice) —
    consumers must address the patch center at (size//2, size//2).
    Values are bf16 (halves VMEM residency; descriptor bits and the IC
    centroid direction are insensitive to the 8-bit mantissa, tested)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, W = img.shape
    K = yx.shape[0]
    r = size // 2
    Kp = -(-K // block) * block
    ys = jnp.clip(yx[:, 0] - r, 0, H - size).astype(jnp.int32)
    xs = jnp.clip(yx[:, 1] - r, 0, W - 1).astype(jnp.int32)
    ys = jnp.pad(ys, (0, Kp - K))
    xs = jnp.pad(xs, (0, Kp - K))
    # pad columns so x0 + width never leaves the array
    imgb = jnp.pad(img.astype(jnp.bfloat16), ((0, 0), (0, width)))

    def kernel(ys_ref, xs_ref, img_ref, out_ref):
        b = pl.program_id(0)

        def body(i, _):
            k = b * block + i
            out_ref[i] = img_ref[pl.ds(ys_ref[k], size), pl.ds(xs_ref[k], width)]
            return 0

        jax.lax.fori_loop(0, block, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Kp // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (block, size, width), lambda b, ys, xs: (b, 0, 0)
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Kp, size, width), jnp.bfloat16),
        interpret=interpret,
    )(ys, xs, imgb)
    return out[:K]
