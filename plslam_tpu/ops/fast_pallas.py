"""Fused Pallas TPU kernel for FAST corner scoring.

The north-star design (BASELINE.json) makes the ORB front end "fused Pallas
kernels over batched image tiles". The XLA version in ops/fast.py
materializes ~36 full-image intermediates in HBM for the ring test alone
(16 neighbour maps x 2 thresholds + per-pixel masks and partial scores);
this kernel keeps a row band resident in VMEM and fuses the entire
dual-threshold FAST-9/16 ring computation — neighbour loads, brighter/darker
masks, contiguous-arc tests, SAD scores — into ONE pass over HBM (one image
read, two score-map writes).

Bands overlap by the ring radius; the overlap window is DMA'd from HBM by
the kernel itself (BlockSpec index_maps only address non-overlapping
blocks). The cheap downstream steps (per-cell threshold fallback, 3x3 NMS,
border mask) stay in XLA: they are one elementwise pass, and Mosaic does not
support the cell reshape in-kernel.

The jnp implementation (ops/fast.py) remains the CPU/test path and the
oracle: the two paths are asserted equal on TPU in tests/test_fast_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from plslam_tpu.ops.fast import ARC, CIRCLE, nms3

_HALO = 8  # ring radius 3, rounded up for sublane alignment


def _roll2(x, dy, dx):
    """Circular shift bringing (y+dy, x+dx) to (y, x); pltpu.roll wants
    non-negative shifts."""
    h, w = x.shape
    out = x
    if dy:
        out = pltpu.roll(out, (-dy) % h, 0)
    if dx:
        out = pltpu.roll(out, (-dx) % w, 1)
    return out


def _band_kernel(img_hbm, hi_ref, lo_ref, band_vmem, dma_sem, *, ini_th, min_th, band_h):
    """One row band: fused dual-threshold FAST ring scores."""
    i = pl.program_id(0)
    copy = pltpu.make_async_copy(
        img_hbm.at[pl.ds(i * band_h, band_h + 2 * _HALO), :], band_vmem, dma_sem
    )
    copy.start()
    copy.wait()
    img = band_vmem[:]

    # one set of neighbour loads serves BOTH thresholds
    nbs = [_roll2(img, dy, dx) for dy, dx in CIRCLE]
    diffs = [nb - img for nb in nbs]

    def ring_scores(th):
        masks_b = [d > th for d in diffs]
        masks_d = [-d > th for d in diffs]
        score_b = jnp.zeros_like(img)
        score_d = jnp.zeros_like(img)
        for d, b, k in zip(diffs, masks_b, masks_d):
            score_b = score_b + jnp.where(b, d - th, 0.0)
            score_d = score_d + jnp.where(k, -d - th, 0.0)

        def arc_any(masks):
            acc = None
            for s in range(16):
                run = masks[s]
                for k in range(1, ARC):
                    run = run & masks[(s + k) % 16]
                acc = run if acc is None else (acc | run)
            return acc

        is_corner = arc_any(masks_b) | arc_any(masks_d)
        return jnp.where(is_corner, jnp.maximum(score_b, score_d), 0.0)

    hi_ref[:] = ring_scores(ini_th)[_HALO : _HALO + band_h, :]
    lo_ref[:] = ring_scores(min_th)[_HALO : _HALO + band_h, :]


def fast_scores_pallas(img, ini_th: float, min_th: float, band_h: int = 64):
    """-> (s_hi, s_lo) dense FAST score maps, fused on TPU. img f32[H, W]."""
    H, W = img.shape
    Hp = -(-H // band_h) * band_h
    Wp = -(-W // 128) * 128
    imgp = jnp.pad(img, ((_HALO, Hp - H + _HALO), (0, Wp - W)), mode="edge")
    n_bands = Hp // band_h

    hi, lo = pl.pallas_call(
        functools.partial(
            _band_kernel, ini_th=float(ini_th), min_th=float(min_th), band_h=band_h
        ),
        grid=(n_bands,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],  # stays in HBM
        out_specs=(
            pl.BlockSpec((band_h, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((band_h, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Hp, Wp), img.dtype),
            jax.ShapeDtypeStruct((Hp, Wp), img.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((band_h + 2 * _HALO, Wp), img.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(imgp)
    return hi[:H, :W], lo[:H, :W]


def _gauss7():
    import numpy as np

    r = 3
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2.0 * 2.0 * 2.0))
    return (k / k.sum()).astype(np.float32)


def _arc_any(masks):
    """Any contiguous run of ARC=9 true values on the 16-ring.

    The 16 per-pixel masks are packed into ONE i32 lane word (bit i =
    masks[i]), the ring unrolled by doubling the low 16 bits, and the
    9-long-run test becomes 8 shift-ANDs: bit i of the result word is set
    iff bits i..i+8 are all set. ~50 integer ops vs ~80 boolean ops for the
    run-length-doubling AND tree — and i32 words pipeline better than pred
    vregs on the VPU. Same boolean function, bit-identical."""
    w = masks[0].astype(jnp.int32)
    for i in range(1, 16):
        w = w | (masks[i].astype(jnp.int32) << i)
    ww = w | (w << 16)
    r = ww
    for k in range(1, ARC):
        r = r & (ww >> k)
    return (r & 0xFFFF) != 0


def _band_kernel_stack(
    heights_ref, img_hbm, hi_ref, lo_ref, blur_ref, band_vmem, dma_sem,
    *, ini_th, min_th, band_h,
):
    """One (level, row-band) cell of the stacked-pyramid grid: FAST ring
    scores at both thresholds AND the 7-tap Gaussian blur (the BRIEF sampling
    image), all from one VMEM-resident band — one image read, three writes.

    Levels shrink geometrically but share the [H, W] plane; row bands
    entirely below a level's true height (heights_ref, scalar-prefetched)
    are zero-filled without the DMA or the ring test — 40 of 64 bands do
    real work at 8 levels x 480p (the padded-stack sweep wasted ~37% of the
    kernel's VPU time, device trace). Downstream masking already treats
    those regions as dead (fallback_nms_border_stack per-level borders)."""
    l = pl.program_id(0)
    i = pl.program_id(1)
    needed = i * band_h < heights_ref[l]

    @pl.when(jnp.logical_not(needed))
    def _zero():
        hi_ref[0] = jnp.zeros_like(hi_ref[0])
        lo_ref[0] = jnp.zeros_like(lo_ref[0])
        blur_ref[0] = jnp.zeros_like(blur_ref[0])

    @pl.when(needed)
    def _compute():
        copy = pltpu.make_async_copy(
            img_hbm.at[l, pl.ds(i * band_h, band_h + 2 * _HALO), :],
            band_vmem, dma_sem,
        )
        copy.start()
        copy.wait()
        img = band_vmem[:]

        # separable Gaussian 7x7 sigma=2 (cv::GaussianBlur before BRIEF). The
        # circular wrap of roll only pollutes rows/cols inside the discarded
        # halo / the 3px image border (keypoints live >= 19 px inside).
        gk = _gauss7()
        rowb = jnp.zeros_like(img)
        for d in range(-3, 4):
            rowb = rowb + gk[d + 3] * _roll2(img, d, 0)
        blur = jnp.zeros_like(img)
        for d in range(-3, 4):
            blur = blur + gk[d + 3] * _roll2(rowb, 0, d)
        blur_ref[0] = blur[_HALO : _HALO + band_h, :]

        nbs = [_roll2(img, dy, dx) for dy, dx in CIRCLE]
        diffs = [nb - img for nb in nbs]

        def ring_scores(th):
            # d - th is exact near the threshold (Sterbenz), so
            # (d - th > 0) == (d > th) bitwise and relu(d - th) ==
            # where(d > th, d - th, 0): one shared term per neighbour feeds
            # mask, score, and SAD accumulation. The per-neighbour terms are
            # STREAMED (computed and consumed inside the loop body) — a
            # persistent 16-element f32 list per polarity is ~3.2 MB of live
            # VMEM at band granularity and blows Mosaic's 16 MB scoped
            # limit once fused into the full frame program.
            score_b = jnp.zeros_like(img)
            score_d = jnp.zeros_like(img)
            masks_b, masks_d = [], []
            for d in diffs:
                x = d - th
                y = (-th) - d  # == fl(-d - th): IEEE sub is correctly rounded
                score_b = score_b + jnp.maximum(x, 0.0)
                score_d = score_d + jnp.maximum(y, 0.0)
                masks_b.append(x > 0)
                masks_d.append(y > 0)
            is_corner = _arc_any(masks_b) | _arc_any(masks_d)
            return jnp.where(is_corner, jnp.maximum(score_b, score_d), 0.0)

        hi_ref[0] = ring_scores(ini_th)[_HALO : _HALO + band_h, :]
        lo_ref[0] = ring_scores(min_th)[_HALO : _HALO + band_h, :]


def fast_scores_pallas_stack(
    stack, ini_th: float, min_th: float, band_h: int = 64, level_heights=None
):
    """[L, H, W] pyramid stack -> (s_hi, s_lo, blurred) [L, H, W], one
    pallas call with grid (L, bands) — the batched-stack twin of
    fast_scores_pallas, with the pre-BRIEF Gaussian blur fused in.
    level_heights: true per-level image heights (static); bands fully below
    a level's height are zero-filled, not computed."""
    import numpy as np

    L, H, W = stack.shape
    Hp = -(-H // band_h) * band_h
    Wp = -(-W // 128) * 128
    stackp = jnp.pad(
        stack, ((0, 0), (_HALO, Hp - H + _HALO), (0, Wp - W)), mode="edge"
    )
    n_bands = Hp // band_h
    if level_heights is None:
        level_heights = [H] * L
    heights = jnp.asarray(np.asarray(level_heights, np.int32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, n_bands),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(
            pl.BlockSpec((1, band_h, Wp), lambda l, i, hs: (l, i, 0)),
            pl.BlockSpec((1, band_h, Wp), lambda l, i, hs: (l, i, 0)),
            pl.BlockSpec((1, band_h, Wp), lambda l, i, hs: (l, i, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((band_h + 2 * _HALO, Wp), stack.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    hi, lo, blur = pl.pallas_call(
        functools.partial(
            _band_kernel_stack,
            ini_th=float(ini_th), min_th=float(min_th), band_h=band_h,
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((L, Hp, Wp), stack.dtype),
            jax.ShapeDtypeStruct((L, Hp, Wp), stack.dtype),
            jax.ShapeDtypeStruct((L, Hp, Wp), stack.dtype),
        ),
    )(heights, stackp)
    return hi[:, :H, :W], lo[:, :H, :W], blur[:, :H, :W]


def fast_with_fallback_pallas(
    img, ini_th: float, min_th: float, cell: int = 32, border: int = 19, band_h: int = 64
):
    """Drop-in for ops.fast.fast_with_fallback, TPU path: Pallas-fused ring
    scores + the same XLA fallback/NMS/border tail as the jnp reference."""
    s_hi, s_lo = fast_scores_pallas(img, ini_th, min_th, band_h)
    H, W = img.shape
    ch, cw = -(-H // cell), -(-W // cell)
    pad_h, pad_w = ch * cell - H, cw * cell - W
    hi_p = jnp.pad(s_hi, ((0, pad_h), (0, pad_w)))
    cell_has = hi_p.reshape(ch, cell, cw, cell).max(axis=(1, 3)) > 0.0
    cell_has_full = jnp.repeat(jnp.repeat(cell_has, cell, 0), cell, 1)[:H, :W]
    score = jnp.where(cell_has_full, s_hi, s_lo)
    score = nms3(score)
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    inside = (ys >= border) & (ys < H - border) & (xs >= border) & (xs < W - border)
    return jnp.where(inside, score, 0.0)
