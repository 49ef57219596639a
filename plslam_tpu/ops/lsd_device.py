"""Device (on-TPU) line segment detection.

Replaces the host detector (ops/lsd.py -> native/lsd.cpp) for the live
pipeline: the reference wraps cv::line_descriptor::LSDDetector
(src/LineExtractor.cc), whose region-growing is data-dependent and
host-sequential — ~8 ms/frame on this host, longer than the ENTIRE device
frame. This is the TPU-native redesign (SURVEY.md §10.3e plan (a)): every
stage is dense, fixed-shape, and jit-traceable, so line detection fuses into
the same XLA program as ORB extraction (true intra-frame points ∥ lines,
SURVEY.md §3.3 — the reference needs two pthreads for this).

Algorithm (oriented-integration, an EDLines/LSD hybrid built for the MXU):
  1. central-difference gradients -> magnitude + orientation
  2. B direction bins (line direction, mod pi); per bin, an "aligned
     support" map: gradient strong AND perpendicular to the bin direction
     (LSD's level-line field, quantized)
  3. oriented integration: depthwise conv of each support map with a
     1 x LINE_INTEG line kernel along the bin direction — the response is
     the aligned density over a candidate segment through the pixel
     (replaces LSD's region-grow + NFA with a fixed-footprint test)
  4. 3x3 NMS + per-cell top-k anchors (reuses the FAST selection machinery)
  5. fixed-length bidirectional walk from each anchor along the bin
     direction, sampling the support map; the endpoint is the last sample
     before the first gap of >= GAP_BREAK consecutive empty pixels
     (EDLines' anchor-walk, with a bounded loop instead of while())
  6. overlap suppression (two anchors on one edge yield nested segments):
     a longer segment absorbs a shorter one whose midpoint lies near it
     with a similar angle; survivors sorted by length, capacity-capped —
     the host detector's output contract (ops/lsd.py).

The host detector remains the oracle: tests/test_lsd_device.py checks
edge-recovery on rendered rectangles and e2e ATE parity on the synthetic
sequence against the host path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from plslam_tpu import constants as C

N_DIRS = 8  # line-direction bins over [0, pi)
LINE_INTEG = 17  # oriented integration length (px)
WALK = 80  # max endpoint walk per side (px) -> max segment length 2*WALK
GAP_BREAK = 3  # consecutive empty support pixels that end a segment
DENSITY_TH = 0.6  # min aligned density over the integration window
ANGLE_TOL_DEG = 22.5
GRAD_TH = 5.0


@functools.lru_cache(maxsize=4)
def _dir_tables(n_dirs: int = N_DIRS, integ: int = LINE_INTEG):
    """Per-bin unit directions and oriented line kernels (numpy: lru_cache
    must not hold tracers)."""
    thetas = np.arange(n_dirs) * np.pi / n_dirs
    dirs = np.stack([np.cos(thetas), np.sin(thetas)], -1).astype(np.float32)
    r = integ // 2
    kernels = np.zeros((n_dirs, integ, integ), np.float32)
    cc = r
    for b, (dx, dy) in enumerate(dirs):
        for t in range(-r, r + 1):
            x = int(round(cc + t * dx))
            y = int(round(cc + t * dy))
            kernels[b, y, x] = 1.0
    kernels /= kernels.sum(axis=(1, 2), keepdims=True)
    return dirs, kernels


def support_maps(gray, grad_th: float = GRAD_TH, n_dirs: int = N_DIRS):
    """-> (support f32[B, H, W] aligned-gradient indicator, mag f32[H, W])."""
    gx = jnp.zeros_like(gray).at[:, 1:-1].set((gray[:, 2:] - gray[:, :-2]) * 0.5)
    gy = jnp.zeros_like(gray).at[1:-1, :].set((gray[2:, :] - gray[:-2, :]) * 0.5)
    mag = jnp.sqrt(gx * gx + gy * gy)
    # line direction is PERPENDICULAR to the gradient; fold into [0, pi)
    line_ang = jnp.arctan2(gy, gx) + jnp.pi / 2
    thetas = jnp.arange(n_dirs, dtype=jnp.float32) * (jnp.pi / n_dirs)
    # angular distance mod pi
    d = line_ang[None] - thetas[:, None, None]
    d = jnp.abs(jnp.remainder(d + jnp.pi / 2, jnp.pi) - jnp.pi / 2)
    tol = jnp.deg2rad(ANGLE_TOL_DEG)
    sup = (d < tol) & (mag > grad_th)[None]
    return sup.astype(jnp.float32), mag


def gather2d_mxu(plane, rows, cols):
    """plane [R, W] + rows/cols i32[K] -> f32[K] = plane[rows[k], cols[k]].

    TPU-native replacement for a K-point random gather. XLA lowers small
    scalar gathers to a latency-bound scalar-unit loop (~0.6 us/element
    through HBM — the anchor lookups cost 920 us/frame as one kCustom
    fusion, device trace). Here row selection is a one-hot matmul on the
    MXU and column selection a masked reduce: two dense ops, ~10 us, and
    the plane's producer chain fuses in exactly once. f32 one-hot matmul
    on TPU (bf16x3) keeps integer planes exact."""
    R, W = plane.shape
    k = rows.shape[0]
    oh_r = (rows[:, None] == jnp.arange(R, dtype=rows.dtype)[None, :]).astype(
        jnp.float32
    )
    sel = jnp.dot(oh_r, plane.astype(jnp.float32),
                  preferred_element_type=jnp.float32)  # [K, W]
    oh_c = cols[:, None] == jnp.arange(W, dtype=cols.dtype)[None, :]
    return jnp.sum(jnp.where(oh_c, sel, 0.0), axis=1)


def detect_lines_device(
    gray,
    capacity: int = C.MAX_LINES,
    min_length_frac: float = C.MIN_LINE_LENGTH_FRAC,
    n_candidates: int = 256,
    cell: int = 32,
    downscale: int | None = None,
):
    """gray f32[H, W] (0..255) -> (sp f32[L, 2], ep f32[L, 2], valid bool[L]).

    Endpoints in (x, y) FULL-RES pixel coords, longest first — the
    detect_lines_host contract. Fully jittable.

    downscale: detection resolution divisor. Lines are long structures, so
    the whole-plane stages (support maps, oriented integration, extent
    planes — ~35 HBM passes over [8, H, W]) run at half resolution by
    default: 4x less traffic (920 -> ~230 us/frame on v5e, device trace)
    for <=downscale px endpoint quantization, well inside the LBD band
    width and the reprojection gates at VGA scale. LBD sampling stays
    full-res (features/frame.py passes the original image).

    `None` auto-selects: 2 when min(H, W) >= 320 (the 640x480 production
    shape), else 1 — on small images the half-res endpoint quantization
    is proportionally ~2.5x coarser and measurably degrades the pose
    solve (tiny-caps soak: tracking lost 5 frames early at 192x256)."""
    from plslam_tpu.ops import select

    if downscale is None:
        downscale = 2 if min(gray.shape) >= 320 else 1

    if downscale > 1:
        d = downscale
        Hf, Wf = gray.shape
        gray = gray[: (Hf // d) * d, : (Wf // d) * d]
        gray = gray.reshape(Hf // d, d, Wf // d, d).mean((1, 3))
        sp, ep, ok = detect_lines_device(
            gray, capacity, min_length_frac, n_candidates,
            cell=max(8, cell // d), downscale=1,
        )
        # pixel-center mapping: half-res (x, y) -> full-res (d*x + (d-1)/2)
        off = (d - 1) * 0.5
        return sp * d + off, ep * d + off, ok

    H, W = gray.shape
    dirs_np, kern_np = _dir_tables()
    dirs = jnp.asarray(dirs_np)
    sup, mag = support_maps(gray)

    # 3. oriented integration. NOT a conv: XLA lowers the 8-channel
    # depthwise 17x17 conv to eight ~2 ms fusions (15.7 ms/frame, device
    # trace) — the tiny channel count starves the MXU. The kernels are
    # 17-tap LINES, so integrate as tap-count static shifted adds over a
    # padded support map; XLA fuses each bin's chain into one ~VPU pass.
    r_i = LINE_INTEG // 2
    sup_p = jnp.pad(sup, ((0, 0), (r_i, r_i), (r_i, r_i)))
    dens_l = []
    for b in range(N_DIRS):
        taps = np.argwhere(kern_np[b] > 0)  # [(oy, ox)] dedup'd by table
        acc = None
        for oy, ox in taps:
            sl = sup_p[b, oy : oy + H, ox : ox + W]
            acc = sl if acc is None else acc + sl
        dens_l.append(acc * (1.0 / len(taps)))
    dens = jnp.stack(dens_l)  # [B, H, W]

    score = jnp.max(dens, 0)
    bbest = jnp.argmax(dens, 0).astype(jnp.int32)
    score = jnp.where(score >= DENSITY_TH, score, 0.0)
    # density is a plateau ACROSS the edge (support spans the blur
    # transition, wider in half-res pixels), and plain argmax tie-breaks
    # toward the lower index — a systematic ~plateau-width anchor bias.
    # Perturb by a magnitude term far below the 1/LINE_INTEG density
    # quantum so the gradient peak wins within a plateau without ever
    # reordering distinct densities.
    score = jnp.where(
        score > 0.0, score + mag * (0.02 / (LINE_INTEG * 100.0)), 0.0
    )
    # border: walks sample with clipping; keep anchors off the frame edge
    bmask = jnp.zeros((H, W), bool).at[3 : H - 3, 3 : W - 3].set(True)
    score = jnp.where(bmask, score, 0.0)

    # 4. spread selection: per-cell argmax + global top-k (the FAST
    # selection machinery). NO 3x3 NMS here — line responses are constant
    # plateaus ALONG the edge and strict non-max would erase them; one
    # anchor per cell is the right granularity (the walk + overlap
    # suppression merge anchors that share an edge).
    yx, resp, cand_ok = select.select_topk_grid(score, n_candidates, cell=cell)

    # 5. bidirectional endpoint walk -> per-bin EXTENT PLANES.
    # A [K, 2*WALK] random gather from the support plane is 40960 scalar
    # reads = 1.38 ms/frame (kCustom gather, ~34 ns/element, device trace).
    # Replace it with whole-plane math: for each bin, dilate the support
    # along the walk direction by GAP_BREAK-1 steps
    # (D[p] = G[p+o(1)] | G[p+o(2)] | G[p+o(3)]); a consecutive run of D of
    # length L starting at the anchor equals the original walk extent
    # EXACTLY (G at step L is supported, steps L+1..L+3 are the first
    # >=GAP_BREAK gap). Run lengths come from log2 pointer DOUBLING with
    # STATIC shifts o(2^k) — 7 vectorized VPU passes per bin/side instead
    # of per-anchor sampling — and the only gathers left are K scalars per
    # side. Deviations from the gather walk: (a) zero padding means walks
    # die at the image border instead of re-sampling the border pixel;
    # (b) doubling composes rounded offsets (o(a)+o(b) vs o(a+b), <=1 px
    # drift per level), absorbed by a 1 px perpendicular dilation of D.
    b_of = jnp.round(gather2d_mxu(bbest, yx[:, 0], yx[:, 1])).astype(jnp.int32)
    # tiny-table lookup as one-hot contraction, NOT dirs[clip(b_of)]: XLA
    # fuses the [K] gather with gather2d_mxu's whole-plane one-hot matmul
    # producer and re-executes it per gathered element (measured 350
    # us/frame for an 8-entry table read, device trace)
    oh_b = (
        b_of[:, None] == jnp.arange(N_DIRS, dtype=jnp.int32)[None, :]
    ).astype(jnp.float32)
    d_of = oh_b @ dirs.astype(jnp.float32)  # [K, 2]

    def shift(plane, oy, ox):
        """plane sampled at p + (oy, ox); zeros outside the frame."""
        py0, py1 = max(oy, 0), max(-oy, 0)
        px0, px1 = max(ox, 0), max(-ox, 0)
        p = jnp.pad(plane, ((py1, py0), (px1, px0)))
        return p[py0 : py0 + H, px0 : px0 + W]

    def o_of(t, dx, dy):
        return int(round(t * dy)), int(round(t * dx))  # (rows, cols)

    n_levels_walk = int(np.ceil(np.log2(WALK)))  # run cap 2^n >= WALK

    def extent_plane(g, dx, dy):
        """i32[H, W]: walk extent from every pixel along +(dx, dy)."""
        d1 = shift(g, *o_of(1, dx, dy))
        for t in range(2, GAP_BREAK + 1):
            d1 = d1 | shift(g, *o_of(t, dx, dy))
        # perpendicular 1 px dilation tolerates doubling's rounding drift
        poy, pox = int(round(dx)), int(round(-dy))
        if (poy, pox) != (0, 0):
            d1 = d1 | shift(d1, poy, pox) | shift(d1, -poy, -pox)
        r = d1.astype(jnp.int32)  # min(run, 1)
        for k in range(n_levels_walk):
            step = 1 << k
            r = r + jnp.where(r == step, shift(r, *o_of(step, dx, dy)), 0)
        return jnp.minimum(r, WALK)

    sup_b = sup > 0
    ext_pos_l, ext_neg_l = [], []
    for b in range(N_DIRS):
        dx, dy = float(dirs_np[b, 0]), float(dirs_np[b, 1])
        ext_pos_l.append(extent_plane(sup_b[b], dx, dy))
        ext_neg_l.append(extent_plane(sup_b[b], -dx, -dy))
    # per-anchor extent lookup from the [B, H, W] planes, viewed as one
    # [B*H, W] plane with row b*H + y — MXU one-hot read (gather2d_mxu)
    ext_pos_2d = jnp.stack(ext_pos_l).reshape(N_DIRS * H, W)
    ext_neg_2d = jnp.stack(ext_neg_l).reshape(N_DIRS * H, W)
    anchor_row = b_of * H + yx[:, 0]  # [K]
    t_pos = gather2d_mxu(ext_pos_2d, anchor_row, yx[:, 1])
    t_neg = gather2d_mxu(ext_neg_2d, anchor_row, yx[:, 1])
    length = t_pos + t_neg
    diag = float(np.hypot(H, W))
    min_len = max(min_length_frac * diag, float(LINE_INTEG))
    ok = cand_ok & (length >= min_len)

    # subpixel: parabolic fit of gradient magnitude across the line at the
    # anchor recovers the perpendicular quantization lost to `downscale`
    # (the along-line coordinate needs no refinement — endpoints are gap
    # breaks, not extrema). 3 MXU one-hot reads.
    n_y = jnp.round(d_of[:, 0]).astype(jnp.int32)  # normal = (dx, dy) rot90
    n_x = jnp.round(-d_of[:, 1]).astype(jnp.int32)
    yy, xx = yx[:, 0], yx[:, 1]

    def mag_at(dy_i, dx_i):
        yi = jnp.clip(yy + dy_i, 0, H - 1)
        xi = jnp.clip(xx + dx_i, 0, W - 1)
        return gather2d_mxu(mag, yi, xi)

    m0 = mag_at(0, 0)
    mm = mag_at(-n_y, -n_x)
    mp = mag_at(n_y, n_x)
    denom = mm - 2.0 * m0 + mp
    delta = jnp.where(
        jnp.abs(denom) > 1e-6, 0.5 * (mm - mp) / jnp.where(denom == 0, 1.0, denom), 0.0
    )
    delta = jnp.clip(delta, -1.0, 1.0)
    off_x = delta * (-d_of[:, 1])
    off_y = delta * d_of[:, 0]

    cy = yx[:, 0].astype(jnp.float32) + off_y
    cx = yx[:, 1].astype(jnp.float32) + off_x
    sp = jnp.stack([cx - t_neg * d_of[:, 0], cy - t_neg * d_of[:, 1]], -1)
    ep = jnp.stack([cx + t_pos * d_of[:, 0], cy + t_pos * d_of[:, 1]], -1)

    # 6. overlap suppression: longest-first; a segment dies if its midpoint
    # is within suppress_r of a longer surviving segment's midpoint-line
    # with a similar direction. One masked [K, K] pass (K = n_candidates).
    # SORT-FREE: precedence is the pairwise predicate "longer, ties by
    # index" instead of an argsort + 5-array reorder (the reorder gathers
    # pulled the whole support-map producer chain into one 1.4 ms/frame
    # re-materializing fusion on TPU, device trace).
    idx = jnp.arange(sp.shape[0])
    prec = (length[:, None] > length[None, :]) | (
        (length[:, None] == length[None, :]) & (idx[:, None] < idx[None, :])
    )
    mid = 0.5 * (sp + ep)
    # distance from mid_j to the infinite line through segment i
    n_i = jnp.stack([-d_of[:, 1], d_of[:, 0]], -1)  # unit normals [K, 2]
    diff = mid[None, :, :] - mid[:, None, :]  # [K_i, K_j, 2]
    perp = jnp.abs(jnp.sum(diff * n_i[:, None, :], -1))
    along = jnp.abs(jnp.sum(diff * d_of[:, None, :], -1))
    cosang = jnp.abs(jnp.sum(d_of[:, None, :] * d_of[None, :, :], -1))
    covered = (
        (perp < 3.0)
        & (cosang > 0.966)  # within ~15 deg
        & (along < 0.5 * length[:, None] + 2.0)
        & ok[:, None]
        & ok[None, :]
        & prec
    )
    # iterate twice so a suppressed segment cannot itself suppress
    alive = ok
    for _ in range(2):
        suppressed = jnp.any(covered & alive[:, None], axis=0)
        alive = ok & ~suppressed
    ok = alive

    # pack survivors into the fixed-capacity output, longest first:
    # slot j = number of surviving segments that precede j
    rank = jnp.sum(prec & ok[:, None], axis=0).astype(jnp.int32)
    slot = jnp.where(ok & (rank < capacity), rank, capacity)
    out_sp = jnp.zeros((capacity + 1, 2), jnp.float32).at[slot].set(sp, mode="drop")[:capacity]
    out_ep = jnp.zeros((capacity + 1, 2), jnp.float32).at[slot].set(ep, mode="drop")[:capacity]
    out_ok = jnp.zeros(capacity + 1, bool).at[slot].set(ok, mode="drop")[:capacity]
    return out_sp, out_ep, out_ok
