"""Steered BRIEF-256 descriptors.

Replaces ORBextractor::computeOrbDescriptor (src/ORBextractor.cc ~100):
256 intensity comparisons of pattern point-pairs, rotated by the keypoint's
IC angle, sampled from the Gaussian-blurred pyramid level; bit b =
I(p_a) < I(p_b), packed into 32 bytes.

Pattern: the reference embeds OpenCV's learned `bit_pattern_31_` table. That
table is a data asset we do not have offline (the mount is empty and copying
is disallowed anyway), so we generate a fixed, seeded Gaussian pattern
(sigma = patch/5, the original BRIEF paper's G-II distribution) once at import.
Descriptors are internally consistent — extractor and matcher share the
pattern — they are just not bit-compatible with OpenCV's (nothing requires
that: the reference never exchanges descriptors with other systems).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from plslam_tpu import constants as C

N_BITS = 256
_PATTERN_SEED = 0x5151
_MAX_OFF = 13  # pattern offsets clipped to +-13 so rotated points stay
# within radius ceil(13*sqrt(2)) = 19 = EDGE_THRESHOLD / patch radius.


@functools.lru_cache(maxsize=1)
def pattern():
    """(a i8[256, 2], b i8[256, 2]) pattern point pairs, (x, y) order."""
    rs = np.random.RandomState(_PATTERN_SEED)
    sigma = C.PATCH_SIZE / 5.0
    pts = rs.normal(0.0, sigma, size=(2, N_BITS, 2))
    pts = np.clip(np.round(pts), -_MAX_OFF, _MAX_OFF).astype(np.int8)
    return pts[0], pts[1]  # numpy: lru_cache must not hold tracers


PATCH_R = 19  # gather radius: rotated pattern points stay inside
PATCH_D = 2 * PATCH_R + 1


@functools.lru_cache(maxsize=1)
def _pow2():
    return (1 << np.arange(8, dtype=np.uint32)).astype(np.uint32)


def steered_brief(patches, angles, center: int | None = None):
    """patches f32[K, 39, 39] (blurred level image, centered on keypoints),
    angles f32[K] radians -> desc u8[K, 32].

    The rotated sample positions are rounded to the nearest pixel, exactly
    like the reference's cvRound on (x cos - y sin, x sin + y cos).

    Sampling is formulated as rank-1 one-hot matmuls instead of gathers:
    sample(r, c) = e_r^T P e_c, batched as (R @ P) * C summed over columns,
    with R/C the [512, D] one-hot row/column selectors of the rotated
    pattern. XLA's scattered-gather lowering costs ~7.6 ns/element on TPU
    (~4 ms/frame for K*512 samples, 36% of the whole frame, measured via the
    device trace); the matmul form rides the MXU at ~0.2 ms for the same
    sampling and is value-identical up to bf16 rounding of the compared
    pixel intensities (ties may break differently — both paths are
    internally consistent, which is all ORB matching needs)."""
    pa, pb = (jnp.asarray(x) for x in pattern())
    ca, sa = jnp.cos(angles), jnp.sin(angles)  # [K]
    p = jnp.concatenate([pa, pb], 0)  # [512, 2] both halves in one pass
    x = p[:, 0].astype(jnp.float32)[None, :]
    y = p[:, 1].astype(jnp.float32)[None, :]
    # center defaults to (Dr//2, Dr//2) for centered square patches; the
    # Pallas gather's [rows, 128] windows overread right/below and pass
    # their true center (size//2) explicitly
    c = patches.shape[-2] // 2 if center is None else center
    rows = jnp.round(x * sa[:, None] + y * ca[:, None]).astype(jnp.int32) + c
    cols = jnp.round(x * ca[:, None] - y * sa[:, None]).astype(jnp.int32) + c
    Dr, Dc = patches.shape[-2], patches.shape[-1]
    R = (rows[..., None] == jnp.arange(Dr, dtype=jnp.int32)).astype(jnp.bfloat16)
    Cm = (cols[..., None] == jnp.arange(Dc, dtype=jnp.int32)).astype(jnp.bfloat16)
    # hi + residual split: one bf16 matmul loses ~8 mantissa bits, and the
    # comparisons below flip on close pixel pairs (near-tie bits are ~2% of
    # the descriptor; enough to cost ~3 tracked frames on the tiny-caps
    # soak). Two rank-1 passes recover ~16 bits at double the (cheap) MXU
    # cost; the one-hot selectors make each pass an exact pixel readout.
    p32 = patches.astype(jnp.float32)
    p_hi = p32.astype(jnp.bfloat16)
    p_lo = (p32 - p_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    vals = jnp.float32(0)
    for part in (p_hi, p_lo):
        RP = jnp.einsum(
            "ksr,krc->ksc", R, part, preferred_element_type=jnp.float32,
        )
        vals = vals + jnp.sum(RP * Cm.astype(jnp.float32), -1)  # [K, 512]
    ia, ib = vals[:, :N_BITS], vals[:, N_BITS:]
    bits = (ia < ib).astype(jnp.uint32).reshape(-1, 32, 8)
    return jnp.sum(bits * jnp.asarray(_pow2())[None, None, :], axis=-1).astype(jnp.uint8)


def unpack_bits_pm1(desc, dtype=jnp.bfloat16):
    """u8[..., 32] -> +-1 floats [..., 256] for the MXU Hamming matmul:
    dot(a, b) = 256 - 2 * hamming(a, b)."""
    bits = jnp.bitwise_and(
        desc[..., :, None].astype(jnp.uint8) >> np.arange(8, dtype=np.uint8),
        jnp.uint8(1),
    )
    pm1 = bits.astype(dtype) * 2 - 1
    return pm1.reshape(desc.shape[:-1] + (N_BITS,))
