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
        """Batched-stack extraction: every stage runs ONCE over the whole
        [L, H, W] pyramid stack instead of per level. The per-level op soup
        was ~435 XLA kernels (12+ ms/frame of pure per-kernel overhead on a
        tunnel-attached chip); the stacked form is ~60. Selection semantics
        are unchanged: top-k_max per level sorted by response, of which the
        first k_l slots are kept — identical to the old per-level top-k_l."""
        import os

        Lv = self.n_levels
        stack = pyramid.build_pyramid_stack(
            gray, Lv, self.scale_factor,
            via=os.environ.get("PLSLAM_RESIZE", "matmul"),
        )
        if jax.default_backend() == "tpu" and not os.environ.get("PLSLAM_NO_PALLAS"):
            from plslam_tpu.ops.fast_pallas import fast_scores_pallas_stack

            s_hi, s_lo, blurred = fast_scores_pallas_stack(
                stack, self.ini_th, self.min_th,
                level_heights=[
                    h for h, _ in pyramid.level_shapes(
                        self.height, self.width, Lv, self.scale_factor
                    )
                ],
            )
        else:  # CPU/test path (also the oracle for the Pallas kernel)
            s_hi = jax.vmap(fast.fast_scores, (0, None))(stack, self.ini_th)
            s_lo = jax.vmap(fast.fast_scores, (0, None))(stack, self.min_th)
            blurred = pyramid.blur_stack(stack)
        shapes = pyramid.level_shapes(
            self.height, self.width, Lv, self.scale_factor
        )
        score = fast.fallback_nms_border_stack(
            s_hi, s_lo, shapes, C.FAST_CELL, C.EDGE_THRESHOLD
        )

        k_max = max(self.per_level)
        yx, resp, valid = jax.vmap(
            lambda s: select.select_topk_grid(s, k_max, cell=16)
        )(score)  # [L, k_max, ...]

        # assemble FIRST: level l owns slots [off_l, off_l + k_l) — static
        # slices, free. The per-keypoint stage (subpixel, patches, angle,
        # BRIEF) then runs ONCE over the true capacity instead of the
        # padded L * k_max grid (1736 vs 1000 at the default budget; the
        # per-keypoint gathers are the most expensive ops in the frame).
        yx_l, resp_l, val_l, oct_l = [], [], [], []
        for l in range(Lv):
            k = self.per_level[l]
            if k == 0:
                continue
            yx_l.append(yx[l, :k])
            resp_l.append(resp[l, :k])
            val_l.append(valid[l, :k])
            oct_l.append(jnp.full((k,), l, jnp.int32))
        yx_f = jnp.concatenate(yx_l, 0)  # [N, 2] plane coords
        resp_f = jnp.concatenate(resp_l, 0)
        val_f = jnp.concatenate(val_l, 0)
        oct_f = jnp.concatenate(oct_l, 0)

        H = stack.shape[1]
        # flat-stack coords: row = level * H + y (patches never cross level
        # planes: the border mask keeps 19 <= y <= h_l - 20)
        yx_flat = jnp.stack([oct_f * H + yx_f[:, 0], yx_f[:, 1]], -1)
        score_flat = score.reshape(Lv * H, -1)
        sub = select.subpixel_refine(score_flat, yx_flat)
        D = brief.PATCH_D
        # ONLY the blurred patches are gathered (the dynamic-slice sweep
        # lowers to a sequential per-patch loop, ~1.2 us/patch — halving the
        # patch count halves the dominant extractor cost). IC angle is
        # computed from the blurred patch rather than the raw level: the
        # Gaussian blur is isotropic, so the intensity-centroid direction is
        # preserved (equivalence vs the raw-patch oracle is tested to ~1.5
        # deg in test_orb.py); the reference uses the raw level only because
        # its IC pass predates its blur pass (src/ORBextractor.cc ~1050).
        blur_flat = blurred.reshape(Lv * H, -1)
        if jax.default_backend() == "tpu" and not os.environ.get("PLSLAM_NO_PALLAS"):
            # pipelined per-keypoint aligned HBM->VMEM DMAs with
            # scalar-prefetched coords + in-register rotate: the XLA
            # dynamic-slice sweep costs ~1.2 us/patch of serialized HBM
            # round-trips (~1.7 ms/frame, device trace)
            blur_patch = patches.gather_patches_pallas(blur_flat, yx_flat, D)
            ctr = D // 2  # window top-left is (y - D//2, x - D//2)
        else:
            blur_patch = patches.gather_patches(blur_flat, yx_flat, D)
            ctr = None
        ang = orientation.ic_angle(blur_patch, center=ctr)
        desc = brief.steered_brief(blur_patch, ang, center=ctr)
        scales = jnp.asarray(self.scales, jnp.float32)
        uv0 = (
            (yx_f[:, ::-1].astype(jnp.float32) + sub[:, ::-1])
            * scales[oct_f][:, None]
        )

        pad = self.capacity - uv0.shape[0]

        def padded(x, fill=0):
            width = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, width, constant_values=fill)

        return FeatureSet(
            uv=padded(uv0),
            response=padded(resp_f),
            angle=padded(ang),
            octave=padded(oct_f),
            desc=padded(desc),
            valid=padded(val_f),
        )


@functools.lru_cache(maxsize=2)
def inv_sigma2_table(n_levels: int = C.N_LEVELS, scale: float = C.SCALE_FACTOR):
    """Per-octave information weights 1/1.2^(2*octave) (g2o edge info,
    src/Optimizer.cc)."""
    return np.asarray(
        [1.0 / scale ** (2 * l) for l in range(n_levels)], np.float32
    )  # numpy: callers jnp.asarray at use site (lru_cache must not hold tracers)
