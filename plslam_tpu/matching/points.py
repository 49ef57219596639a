"""Point-descriptor matching as dense masked MXU matmuls.

Replaces src/ORBmatcher.cc: instead of per-landmark grid-window candidate
loops with popcount Hamming (DescriptorDistance, SearchByProjection ~1380,
SearchByBoW ~480), we compute the full N x M Hamming matrix on the MXU via
the +-1 bit trick — dot(a_pm1, b_pm1) = 256 - 2 * hamming — then apply the
reference's gates (window radius, octave, threshold, best/second ratio,
rotation-consistency histogram) as masks, and resolve assignments
mutual-nearest. The reference's 64x48 feature grid (Frame::
AssignFeaturesToGrid) exists only to prune candidates on a CPU; the dense
masked matrix IS the TPU-native equivalent, so no grid is kept.

Thresholds: TH_LOW=50 / TH_HIGH=100 / 30-bin rotation histogram keep-top-3,
all from ORBmatcher.cc header constants.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from plslam_tpu import constants as C

BIG = np.float32(1e9)  # numpy, NOT jnp: a module-level jnp constant creates
# a device array at import time, initializing the jax backend before tooling
# (train_vocab, tests) can force the CPU platform


def hamming_matrix(pm1_a, pm1_b):
    """pm1 descriptors [N, 256] x [M, 256] (+-1, bf16) -> Hamming f32[N, M].

    bf16 is exact here: products are +-1 and the MXU accumulates in f32."""
    dot = jax.lax.dot_general(
        pm1_a.astype(jnp.bfloat16),
        pm1_b.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (256.0 - dot) * 0.5


def best_two(dist, axis):
    """(best, second_best, argbest) along `axis` of a masked distance matrix.

    Implemented as min/argmin + masked second min: three fused VPU
    reductions. (lax.top_k over 32k-wide rows lowers to a sort on TPU and
    dominated the matching cost — 4x slower than this.)"""
    best = jnp.min(dist, axis)
    arg = jnp.argmin(dist, axis).astype(jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, dist.shape, axis)
    second = jnp.min(
        jnp.where(iota == jnp.expand_dims(arg, axis), BIG, dist), axis
    )
    return best, second, arg


def rotation_consistency_mask(rot_diff, match_valid, n_bins=C.HISTO_LENGTH, keep=3):
    """ORBmatcher's rotation histogram (ComputeThreeMaxima): bin the
    keypoint-angle differences of the valid matches into 30 bins, keep only
    matches in the 3 most populated bins."""
    two_pi = 2.0 * np.pi
    frac = jnp.mod(rot_diff, two_pi) / two_pi
    bins = jnp.clip((frac * n_bins).astype(jnp.int32), 0, n_bins - 1)
    hist = jnp.zeros(n_bins, jnp.int32).at[bins].add(match_valid.astype(jnp.int32))
    counts, top_bins = jax.lax.top_k(hist, keep)
    # ComputeThreeMaxima: secondary bins below 10% of the max are discarded
    top_bins = jnp.where(counts.astype(jnp.float32) >= 0.1 * counts[0], top_bins, -1)
    in_top = (bins[:, None] == top_bins[None, :]).any(-1)
    return match_valid & in_top


def search_by_projection(
    kp_uv,
    kp_octave,
    kp_pm1,
    kp_valid,
    pred_uv,
    pred_octave,
    lm_pm1,
    lm_valid,
    radius: float,
    scale_factor: float = C.SCALE_FACTOR,
    th_dist: float = C.TH_LOW,
    nn_ratio: float | None = None,
    kp_angle=None,
    lm_angle=None,
    octave_tol: int = 1,
):
    """Windowed projection matching (ORBmatcher::SearchByProjection family).

    kp_*: current-frame keypoints [N]; pred_uv/pred_octave/lm_*: landmarks
    projected into the current frame [M]. Search window per landmark is
    radius * scale^pred_octave pixels (radius may be a scalar or a
    per-landmark [M] array — e.g. RadiusByViewingCos-modulated); keypoint
    octave must be within octave_tol of the prediction. Assignment is mutual-nearest (the
    TPU-native stand-in for the reference's sequential claim-marking).

    Returns (match_kp i32[M] with -1 for unmatched, dist f32[M]).
    """
    D = hamming_matrix(kp_pm1, lm_pm1)  # [N, M]

    du = kp_uv[:, None, 0] - pred_uv[None, :, 0]
    dv = kp_uv[:, None, 1] - pred_uv[None, :, 1]
    r = radius * jnp.power(scale_factor, pred_octave.astype(jnp.float32))[None, :]
    in_window = (jnp.abs(du) <= r) & (jnp.abs(dv) <= r)
    oct_ok = jnp.abs(kp_octave[:, None] - pred_octave[None, :]) <= octave_tol
    pair_ok = in_window & oct_ok & kp_valid[:, None] & lm_valid[None, :]
    Dm = jnp.where(pair_ok, D, BIG)

    best, second, best_kp = best_two(Dm, axis=0)  # per landmark [M]
    ok = best < th_dist
    if nn_ratio is not None:
        ok &= best < nn_ratio * second
    # mutual-nearest: that keypoint's best landmark must be this landmark
    best_lm_of_kp = jnp.argmin(Dm, 1).astype(jnp.int32)  # per keypoint [N]
    mutual = jnp.take(best_lm_of_kp, best_kp) == jnp.arange(Dm.shape[1])
    ok &= mutual

    if kp_angle is not None and lm_angle is not None:
        rot = jnp.take(kp_angle, best_kp) - lm_angle
        ok = rotation_consistency_mask(rot, ok)

    match_kp = jnp.where(ok, best_kp, -1)
    return match_kp, jnp.where(ok, best, BIG)


def match_descriptors(
    pm1_a,
    valid_a,
    pm1_b,
    valid_b,
    th_dist: float = C.TH_LOW,
    nn_ratio: float | None = C.NN_RATIO_DEFAULT,
    angle_a=None,
    angle_b=None,
    pair_mask=None,
):
    """Unconstrained brute-force matching with ratio test + mutual check
    (ORBmatcher::SearchByBoW semantics without the vocab-node gating — the
    node gating is a CPU pruning trick; dense MXU distance is cheaper than
    maintaining the direct index).

    Returns match_b i32[A] (index into b, -1 unmatched) and dist f32[A]."""
    D = hamming_matrix(pm1_a, pm1_b)
    pair_ok = valid_a[:, None] & valid_b[None, :]
    if pair_mask is not None:  # e.g. epipolar gating (SearchForTriangulation)
        pair_ok &= pair_mask
    Dm = jnp.where(pair_ok, D, BIG)
    best, second, best_b = best_two(Dm, axis=1)  # per a-row
    ok = best < th_dist
    if nn_ratio is not None:
        ok &= best < nn_ratio * second
    best_a_of_b = jnp.argmin(Dm, 0).astype(jnp.int32)
    mutual = jnp.take(best_a_of_b, best_b) == jnp.arange(Dm.shape[0])
    ok &= mutual
    if angle_a is not None and angle_b is not None:
        rot = angle_a - jnp.take(angle_b, best_b)
        ok = rotation_consistency_mask(rot, ok)
    return jnp.where(ok, best_b, -1), jnp.where(ok, best, BIG)
