"""IC (intensity-centroid) keypoint orientation.

Replaces ORBextractor::IC_Angle (src/ORBextractor.cc ~70): moments m01, m10
over the circular 31-diameter patch around each keypoint on the (unblurred)
pyramid level; theta = atan2(m01, m10).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from plslam_tpu import constants as C


@functools.lru_cache(maxsize=4)
def _moment_masks(radius: int):
    d = 2 * radius + 1
    ys, xs = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    circ = (ys * ys + xs * xs) <= radius * radius
    # numpy (not jnp): lru_cache must not capture tracers/arrays from a trace
    return (xs * circ).astype(np.float32), (ys * circ).astype(np.float32)


def ic_angle(patches, radius: int = C.HALF_PATCH_SIZE, center: int | None = None):
    """patches f32[K, dr, dc] -> rad f32[K].

    `center` is the keypoint's (row, col) position in the patch (same for
    both axes); defaults to dr//2 — correct for centered square patches.
    The Pallas gather's [rows, 128] windows overread right/below, so its
    consumers pass center=size//2 explicitly."""
    d = 2 * radius + 1
    if patches.shape[-1] != d or patches.shape[-2] != d or center is not None:
        c = patches.shape[-2] // 2 if center is None else center
        patches = patches[:, c - radius : c + radius + 1, c - radius : c + radius + 1]
    mx, my = (jnp.asarray(a) for a in _moment_masks(radius))
    m10 = jnp.sum(patches * mx, axis=(-2, -1))
    m01 = jnp.sum(patches * my, axis=(-2, -1))
    return jnp.arctan2(m01, m10)
