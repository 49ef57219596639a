"""Keypoint patch gathers.

Two implementations:

* `gather_patches` — dynamic_slice under vmap. Lowers to a sequential
  per-keypoint loop on the TPU runtime (~1.2 us per keypoint, measured via
  the device trace); the CPU/test path and the oracle. Still the fastest
  known XLA lowering: a row-sliced lax.gather (K*size [1, size] slices)
  measured 13x slower end-to-end, and scalar-element gathers are worse.

* `gather_patches_pallas` — Pallas TPU kernel: per-keypoint HBM->VMEM DMAs
  of TILE-ALIGNED [48, 256] windows (Mosaic tiles HBM memrefs (8, 128) and
  requires provably-aligned slice offsets — `pl.multiple_of` carries the
  proof), pipelined `block` at a time so the tiny DMAs hide each other's
  latency, then a dynamic in-register rotate (`pltpu.roll`) normalizes each
  window so the keypoint lands at the fixed center (size//2, size//2).
  Replaces the XLA per-patch sequential HBM round-trips (SURVEY.md §4.2a
  hot loop: "BRIEF gather").
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


def gather_patches_pallas(img, yx, size: int, block: int = 64,
                          interpret: bool = False):
    """img f32[H, W], yx i32[K, 2] (centers) -> bf16[K, rows, 128].

    rows = size rounded up to 8. The keypoint center sits at
    (size//2, size//2); everything right of / below the [size, size] patch
    is overread garbage. Consumers take the center explicitly
    (ic_angle/steered_brief `center=`).

    Mechanics: the per-keypoint window top-left (y - r, x - r) is split into
    a tile-aligned base (8 | ys_al, 128 | xs_al) plus an in-tile offset
    (off_y in [0, 8+edge], off_x in [0, 256-size]); the DMA copies the
    aligned [rows+8, 256] superset window, and a lane/sublane rotate inside
    the kernel shifts the patch to the window origin. Values are bf16
    (halves DMA traffic; descriptor bits and the IC centroid direction are
    insensitive to the 8-bit mantissa, tested)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, W = img.shape
    K = yx.shape[0]
    r = size // 2
    rows = -(-size // 8) * 8          # output rows (40 for size 39)
    width = 128                        # output lanes
    dma_rows = rows + 8                # aligned window: off_y < 8 (+edge<=8)
    dma_width = 256                    # off_x <= 255 - (size-1) guaranteed
    assert dma_rows - 8 >= size and H >= dma_rows
    Kp = -(-K // block) * block
    # pad columns by >= 128 so xs_al + dma_width never leaves the array and
    # off_x stays <= dma_width - size (see bound below)
    Wp = (-(-(W + 128) // 128)) * 128
    imgb = jnp.pad(img.astype(jnp.bfloat16), ((0, 0), (0, Wp - W)))

    ys_t = jnp.clip(yx[:, 0] - r, 0, H - size).astype(jnp.int32)
    xs_t = jnp.clip(yx[:, 1] - r, 0, W - 1).astype(jnp.int32)
    ys_al = jnp.minimum(ys_t & ~7, H - dma_rows)
    xs_al = jnp.minimum(xs_t & ~127, Wp - dma_width)
    # off_y <= (H - size) - (H - dma_rows) = dma_rows - size <= 9
    # off_x <= (W - 1) - (Wp - dma_width) <= dma_width - 129 + (Wp >= W+128)
    off_y = ys_t - ys_al
    off_x = xs_t - xs_al
    pad1 = lambda a: jnp.pad(a, (0, Kp - K))
    ys_al, xs_al, off_y, off_x = map(pad1, (ys_al, xs_al, off_y, off_x))

    def kernel(ys_ref, xs_ref, oy_ref, ox_ref, img_ref, out_ref, buf, sems):
        b = pl.program_id(0)

        def copy(i):
            k = b * block + i
            ya = pl.multiple_of(ys_ref[k], 8)
            xa = pl.multiple_of(xs_ref[k], 128)
            return pltpu.make_async_copy(
                img_ref.at[pl.ds(ya, dma_rows), pl.ds(xa, dma_width)],
                buf.at[i],
                sems.at[i],
            )

        def issue(i, _):
            copy(i).start()
            return 0

        jax.lax.fori_loop(0, block, issue, 0)

        def fix(i, _):
            copy(i).wait()
            k = b * block + i
            # rotate the patch's top-left to the window origin: roll shifts
            # toward higher indices, so shift by (extent - off). The rotate
            # unit is 32-bit only — widen the bf16 window in registers (DMA
            # traffic stays bf16).
            w = buf[i].astype(jnp.float32)  # [dma_rows, dma_width]
            w = pltpu.roll(w, dma_rows - oy_ref[k], 0)
            w = pltpu.roll(w, dma_width - ox_ref[k], 1)
            out_ref[i] = w[:rows, :width].astype(jnp.bfloat16)
            return 0

        jax.lax.fori_loop(0, block, fix, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(Kp // block,),
        # the image stays in HBM; each aligned window is DMA'd on demand
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (block, rows, width), lambda b, *_: (b, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((block, dma_rows, dma_width), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((block,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Kp, rows, width), jnp.bfloat16),
        interpret=interpret,
    )(ys_al, xs_al, off_y, off_x, imgb)
    return out[:K]
