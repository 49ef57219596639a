"""ORB keypoint + descriptor extraction, end to end on device.

Replaces src/ORBextractor.cc §operator() (~1050): pyramid -> per-level FAST
with cell fallback -> spatial selection -> IC angle -> blurred steered BRIEF
-> coords scaled back to level 0. The reference runs a sequential per-level /
per-cell loop; here every level is a batched dense computation and all levels
are traced into one XLA program (SURVEY.md §3.3 "per-cell/per-level
parallelism" row).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from plslam_tpu import constants as C
from plslam_tpu.ops import brief, fast, orientation, patches, pyramid, select


class FeatureSet(NamedTuple):
    """Fixed-capacity per-frame keypoints (padded to `capacity`)."""

    uv: jnp.ndarray  # f32[N, 2] (x, y) level-0 pixel coords
    response: jnp.ndarray  # f32[N]
    angle: jnp.ndarray  # f32[N] radians
    octave: jnp.ndarray  # i32[N]
    desc: jnp.ndarray  # u8[N, 32]
    valid: jnp.ndarray  # bool[N]


def features_per_level(n_features: int, scale_factor: float, n_levels: int):
    """Geometric split of the feature budget over levels, like
    ORBextractor::ORBextractor (factor = 1/scaleFactor; last level absorbs
    the rounding remainder)."""
    factor = 1.0 / scale_factor
    n_first = n_features * (1 - factor) / (1 - factor**n_levels)
    out, acc = [], 0
    for l in range(n_levels - 1):
        k = int(round(n_first * factor**l))
        out.append(k)
        acc += k
    out.append(max(n_features - acc, 0))
    return out


class ORBExtractor:
    """Callable extractor; all shape-determining config is static."""

    def __init__(
        self,
        height: int,
        width: int,
        n_features: int = C.N_FEATURES,
        scale_factor: float = C.SCALE_FACTOR,
        n_levels: int = C.N_LEVELS,
        ini_th_fast: float = C.INI_TH_FAST,
        min_th_fast: float = C.MIN_TH_FAST,
        capacity: int = C.MAX_FEAT,
    ):
        self.height, self.width = height, width
        self.n_features = n_features
        self.scale_factor = scale_factor
        self.n_levels = n_levels
        self.ini_th, self.min_th = float(ini_th_fast), float(min_th_fast)
        self.capacity = capacity
        self.per_level = features_per_level(n_features, scale_factor, n_levels)
        # Levels too small to host a descriptor patch (min dim <= 2*border)
        # get their budget folded into the last usable level. Only reachable
        # for tiny images — 640x480 keeps all 8 levels.
        shapes = pyramid.level_shapes(height, width, n_levels, scale_factor)
        usable = [min(s) > 2 * C.EDGE_THRESHOLD + 1 for s in shapes]
        last_ok = max(i for i, u in enumerate(usable) if u)
        for l in range(n_levels):
            if not usable[l]:
                self.per_level[last_ok] += self.per_level[l]
                self.per_level[l] = 0
        assert sum(self.per_level) <= capacity
        self.scales = [scale_factor**l for l in range(n_levels)]

    @functools.cached_property
    def _jitted(self):
        return jax.jit(self._extract)

    def __call__(self, gray):
        """gray f32[H, W] (0..255) -> FeatureSet (capacity-padded)."""
        return self._jitted(gray)

    def _extract(self, gray) -> FeatureSet:
        levels = pyramid.build_pyramid(gray, self.n_levels, self.scale_factor)
        uv_all, resp_all, ang_all, oct_all, desc_all, valid_all = [], [], [], [], [], []
        for l, img in enumerate(levels):
            k = self.per_level[l]
            if k == 0:
                continue
            if jax.default_backend() == "tpu":
                from plslam_tpu.ops.fast_pallas import fast_with_fallback_pallas

                score = fast_with_fallback_pallas(
                    img, self.ini_th, self.min_th, C.FAST_CELL, C.EDGE_THRESHOLD
                )
            else:  # CPU/test path (also the oracle for the Pallas kernel)
                score = fast.fast_with_fallback(
                    img, self.ini_th, self.min_th, C.FAST_CELL, C.EDGE_THRESHOLD
                )
            yx, resp, valid = select.select_topk_grid(score, k, cell=16)
            sub = select.subpixel_refine(score, yx)
            raw_patch = patches.gather_patches(img, yx, brief.PATCH_D)
            ang = orientation.ic_angle(raw_patch)
            blurred = pyramid.gaussian_blur(img)
            blur_patch = patches.gather_patches(blurred, yx, brief.PATCH_D)
            desc = brief.steered_brief(blur_patch, ang)
            uv0 = (yx[:, ::-1].astype(jnp.float32) + sub[:, ::-1]) * self.scales[l]
            uv_all.append(uv0)
            resp_all.append(resp)
            ang_all.append(ang)
            oct_all.append(jnp.full((k,), l, jnp.int32))
            desc_all.append(desc)
            valid_all.append(valid)

        uv = jnp.concatenate(uv_all, 0)
        n = uv.shape[0]
        pad = self.capacity - n

        def padded(x, fill=0):
            width = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, width, constant_values=fill)

        return FeatureSet(
            uv=padded(uv),
            response=padded(jnp.concatenate(resp_all, 0)),
            angle=padded(jnp.concatenate(ang_all, 0)),
            octave=padded(jnp.concatenate(oct_all, 0)),
            desc=padded(jnp.concatenate(desc_all, 0)),
            valid=padded(jnp.concatenate(valid_all, 0)),
        )


@functools.lru_cache(maxsize=2)
def inv_sigma2_table(n_levels: int = C.N_LEVELS, scale: float = C.SCALE_FACTOR):
    """Per-octave information weights 1/1.2^(2*octave) (g2o edge info,
    src/Optimizer.cc)."""
    return np.asarray(
        [1.0 / scale ** (2 * l) for l in range(n_levels)], np.float32
    )  # numpy: callers jnp.asarray at use site (lru_cache must not hold tracers)
