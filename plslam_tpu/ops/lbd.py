"""LBD (Line Band Descriptor), device-side.

The reference uses cv::line_descriptor::BinaryDescriptor (32-byte binary LBD
over 9 bands x 7 px of the line support region; SURVEY.md §9). That contrib
module has no cv2 oracle in this environment (SURVEY.md §5), so this is a
from-spec implementation with a NumPy reference oracle in the tests:

  1. Line support region: S longitudinal samples along the segment x
     (BANDS * BAND_W) perpendicular offsets, sampled bilinearly from the
     image gradients (gx, gy).
  2. Gradients are rotated into the line frame (d_parallel, d_perp).
  3. Per band: mean and std of g_perp and g_parallel over the band's rows
     -> BANDS * 4 floats, L2-normalized (the classical LBD vector).
  4. Binarized to 256 bits by a fixed seeded set of coordinate pairs
     (bit = v[i] > v[j]) -> u8[32], so line descriptors ride the exact same
     MXU Hamming machinery as ORB (matching/points.hamming_matrix).

Like the ORB BRIEF pattern, the binarization pairs are our own fixed data:
descriptors are internally consistent which is all the system needs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from plslam_tpu import constants as C

N_SAMPLES = 16  # longitudinal samples along the segment. 24 -> 16 measured:
# the [L*S*63] nearest-neighbor gather is the single biggest op in the frame
# program (1.38 ms at S=24, ~7 ns per gathered element, device trace) and
# scales linearly with S; band statistics over 16x7 samples keep the
# fast-vs-exact Hamming gap and the cross-frame stability margins
# (tests/test_lines.py) with ~0.45 ms/frame saved.
BANDS = C.LBD_BANDS  # 9
BAND_W = C.LBD_BAND_WIDTH  # 7
N_BITS = 256
_PAIR_SEED = 0x1BD

# fast-path sampling grid: the [L*S*offs] nearest gather is STILL the single
# biggest op in the frame program (round-4 device trace: 351 us/frame at the
# 12 x 32 stride-2 grid — XLA lowers small random gathers to a latency-bound
# scalar loop, cost linear in element count). Band statistics are averages,
# so subsample the SAME physical 63 px support region: 12 longitudinal x 16
# stride-4 perpendicular taps = 24.5k elements (half of stride-2, ~175 us).
# Per-band means/stds come from a static [16, BANDS] assignment matmul
# instead of the uniform reshape. Descriptor deviation vs the exact path is
# gated by tests/test_lines.py (mean < 24 bits, cross-frame stability); the
# exact path keeps the full 16 x 63 bilinear grid — the NumPy-oracle
# contract.
_FAST_S = 12
_FAST_OFFS = np.arange(-30.0, 31.0, 4.0).astype(np.float32)  # 16 taps


@functools.lru_cache(maxsize=1)
def _band_assign():
    """A f32[32, BANDS]: column b averages the taps that fall in band b."""
    half = (BANDS * BAND_W - 1) / 2.0
    b = np.clip(((_FAST_OFFS + half) // BAND_W).astype(np.int64), 0, BANDS - 1)
    A = np.zeros((len(_FAST_OFFS), BANDS), np.float32)
    A[np.arange(len(_FAST_OFFS)), b] = 1.0
    A /= np.maximum(A.sum(0, keepdims=True), 1.0)
    return A


@functools.lru_cache(maxsize=1)
def _pairs():
    dim = BANDS * 4
    rs = np.random.RandomState(_PAIR_SEED)
    pairs = set()
    while len(pairs) < N_BITS:
        i, j = rs.randint(0, dim), rs.randint(0, dim)
        if i != j and (i, j) not in pairs:
            pairs.add((i, j))
    arr = np.asarray(sorted(pairs), np.int32)
    rs.shuffle(arr)
    return arr[:, 0], arr[:, 1]  # numpy: lru_cache must not hold tracers


def image_gradients(img):
    """Central-difference gradients, f32[H, W] -> (gx, gy)."""
    gx = jnp.zeros_like(img).at[:, 1:-1].set((img[:, 2:] - img[:, :-2]) * 0.5)
    gy = jnp.zeros_like(img).at[1:-1, :].set((img[2:, :] - img[:-2, :]) * 0.5)
    return gx, gy


def _bilinear(img, x, y):
    H, W = img.shape
    x = jnp.clip(x, 0.0, W - 1.001)
    y = jnp.clip(y, 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    ax, ay = x - x0, y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (1 - ay) * ((1 - ax) * v00 + ax * v01) + ay * ((1 - ax) * v10 + ax * v11)


def lbd_vector(gx, gy, sp, ep, valid, exact: bool = False):
    """Float LBD band vectors. sp/ep f32[L, 2] (x, y) -> f32[L, BANDS*4].

    exact=False (the pipeline default) packs (gx, gy) as two bf16 halves of
    one u32 image and nearest-neighbor samples it with a SINGLE flat gather
    per point — 8x fewer gathered elements than the bilinear path (4 corners
    x 2 images), which measured 5.9 ms/frame on the TPU device trace at the
    128-line capacity. Band mean/std statistics over 24x7 samples are
    insensitive to both the 0.5 px snap and the bf16 mantissa (the
    cross-frame stability test runs on this path). exact=True keeps f32
    bilinear — the NumPy-oracle contract."""
    d = ep - sp
    length = jnp.linalg.norm(d, axis=-1, keepdims=True)
    d = d / jnp.clip(length, 1e-6)
    n = jnp.stack([-d[:, 1], d[:, 0]], -1)  # left normal

    n_s = N_SAMPLES if exact else _FAST_S
    t = jnp.linspace(0.0, 1.0, n_s)  # [S]
    half = (BANDS * BAND_W - 1) / 2.0
    if exact:
        off = jnp.arange(BANDS * BAND_W, dtype=jnp.float32) - half  # [B*W]
    else:
        off = jnp.asarray(_FAST_OFFS)  # [16] stride-4, same 63 px support
    base = sp[:, None, :] + (ep - sp)[:, None, :] * t[None, :, None]  # [L,S,2]
    pts = base[:, :, None, :] + n[:, None, None, :] * off[None, None, :, None]
    x, y = pts[..., 0], pts[..., 1]  # [L, S, n_off]

    if exact:
        gxs = _bilinear(gx, x.reshape(-1), y.reshape(-1)).reshape(x.shape)
        gys = _bilinear(gy, x.reshape(-1), y.reshape(-1)).reshape(x.shape)
    else:
        H, W = gx.shape
        hi = jax.lax.bitcast_convert_type(
            gx.astype(jnp.bfloat16), jnp.uint16
        ).astype(jnp.uint32)
        lo = jax.lax.bitcast_convert_type(
            gy.astype(jnp.bfloat16), jnp.uint16
        ).astype(jnp.uint32)
        packed = ((hi << 16) | lo).reshape(-1)
        xi = jnp.clip(jnp.round(x).astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(jnp.round(y).astype(jnp.int32), 0, H - 1)
        v = packed[(yi * W + xi).reshape(-1)]
        gxs = jax.lax.bitcast_convert_type(
            (v >> 16).astype(jnp.uint16), jnp.bfloat16
        ).astype(jnp.float32).reshape(x.shape)
        gys = jax.lax.bitcast_convert_type(
            (v & 0xFFFF).astype(jnp.uint16), jnp.bfloat16
        ).astype(jnp.float32).reshape(x.shape)
    g_par = gxs * d[:, None, None, 0] + gys * d[:, None, None, 1]
    g_prp = gxs * n[:, None, None, 0] + gys * n[:, None, None, 1]

    if exact:
        # [L, S, BANDS, BAND_W] -> band stats over (S, BAND_W)
        def stats(g):
            gb = g.reshape(g.shape[0], N_SAMPLES, BANDS, BAND_W)
            return gb.mean(axis=(1, 3)), gb.std(axis=(1, 3))
    else:
        # band stats over the subsampled grid via the assignment matmul
        A = jnp.asarray(_band_assign())  # [n_off, BANDS]

        def stats(g):
            mean = jnp.einsum("lso,ob->lb", g, A) / n_s
            e2 = jnp.einsum("lso,ob->lb", g * g, A) / n_s
            return mean, jnp.sqrt(jnp.maximum(e2 - mean * mean, 0.0))

    m_prp, s_prp = stats(g_prp)
    m_par, s_par = stats(g_par)
    v = jnp.concatenate([m_prp, s_prp, m_par, s_par], -1)  # [L, BANDS*4]
    v = v / jnp.clip(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-6)
    return jnp.where(valid[:, None], v, 0.0)


@functools.lru_cache(maxsize=1)
def _pair_sign_matrix():
    """S f32[BANDS*4, N_BITS] with column b = e_ii[b] - e_jj[b]: the pair
    comparisons v[ii] > v[jj] become sign(v @ S) — one MXU matmul instead
    of two fancy-index gathers (each gather op costs ~2 ms on this TPU's
    lowering regardless of size, device trace). The sign of an IEEE
    subtraction is exact, so bits are identical to the gather form."""
    ii, jj = _pairs()
    S = np.zeros((BANDS * 4, N_BITS), np.float32)
    S[ii, np.arange(N_BITS)] += 1.0
    S[jj, np.arange(N_BITS)] -= 1.0
    return S


def lbd_descriptor(gx, gy, sp, ep, valid, exact: bool | None = None):
    """-> u8[L, 32] binary LBD.

    exact=None auto-selects: the subsampled fast grid (mean 6.2-bit
    deviation from the oracle) only at production resolution
    (min(H, W) >= 320, the 640x480 shape the 920->351 us saving was
    measured on); small images take the exact path — there the absolute
    saving is negligible and the descriptor deviation measurably costs
    tracking robustness (tiny-caps soak at 192x256 lost 3 extra frames
    on the fast path)."""
    if exact is None:
        exact = min(gx.shape[-2:]) < 320
    v = lbd_vector(gx, gy, sp, ep, valid, exact=exact)
    diff = v @ jnp.asarray(_pair_sign_matrix())  # [L, N_BITS]
    bits = (diff > 0).astype(jnp.uint32).reshape(v.shape[0], 32, 8)
    pw = jnp.asarray((1 << np.arange(8, dtype=np.uint32)).astype(np.uint32))
    return jnp.sum(bits * pw[None, None, :], -1).astype(jnp.uint8)
