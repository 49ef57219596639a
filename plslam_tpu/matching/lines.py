"""Line matching: LBD Hamming + geometric gates as dense masked ops.

Replaces src/LSDmatcher.cc (SearchByProjection for frame<->map lines,
SearchByDescriptor, lineDescriptorMAD): the reference brute-forces LBD
distances with cv::BFMatcher and gates with angle/overlap/endpoint-distance
checks plus a median-absolute-deviation adaptive threshold. Here: one MXU
Hamming matmul over the frame-line x map-line descriptors, masked by

  * midpoint distance between the observed segment and the projected map
    line (window radius),
  * direction difference modulo pi (segments are orientation-ambiguous),
  * MAD-adaptive distance threshold over the candidate best distances
    (lineDescriptorMAD parity),

resolved mutual-nearest.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from plslam_tpu.matching.points import BIG, best_two, hamming_matrix


def search_lines_by_projection(
    ln_mid,
    ln_angle,
    ln_pm1,
    ln_valid,
    pred_mid,
    pred_angle,
    ml_pm1,
    ml_valid,
    radius: float = 30.0,
    angle_tol: float = np.deg2rad(30.0),
    th_dist: float = 100.0,
    use_mad: bool = True,
):
    """frame keylines [L] vs projected map lines [M].

    Returns (match_ln i32[M] frame-line index per map line, dist f32[M])."""
    D = hamming_matrix(ln_pm1, ml_pm1)  # [L, M]
    du = ln_mid[:, None, 0] - pred_mid[None, :, 0]
    dv = ln_mid[:, None, 1] - pred_mid[None, :, 1]
    in_window = (jnp.abs(du) <= radius) & (jnp.abs(dv) <= radius)
    dang = jnp.abs(ln_angle[:, None] - pred_angle[None, :])
    dang = jnp.minimum(dang % np.pi, np.pi - dang % np.pi)
    ang_ok = dang <= angle_tol
    pair_ok = in_window & ang_ok & ln_valid[:, None] & ml_valid[None, :]
    Dm = jnp.where(pair_ok, D, BIG)

    best, second, best_ln = best_two(Dm, axis=0)  # per map line
    ok = best < th_dist
    if use_mad:
        # lineDescriptorMAD: adaptive gate = median + 1.4826 * MAD of the
        # candidate best distances (masked median via sorting valid-first)
        cand = jnp.where(ok, best, jnp.nan)
        med = jnp.nanmedian(cand)
        mad = 1.4826 * jnp.nanmedian(jnp.abs(cand - med))
        gate = jnp.where(jnp.isfinite(med), med + 2.0 * mad + 1.0, th_dist)
        ok &= best <= jnp.minimum(gate, th_dist)
    best_ml_of_ln = jnp.argmin(Dm, 1).astype(jnp.int32)
    mutual = jnp.take(best_ml_of_ln, best_ln) == jnp.arange(Dm.shape[1])
    ok &= mutual
    return jnp.where(ok, best_ln, -1), jnp.where(ok, best, BIG)
