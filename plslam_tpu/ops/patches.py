"""Keypoint patch gathers (dynamic_slice under vmap).

This lowers to a sequential per-keypoint loop on the TPU runtime (~1.2 us
per keypoint, measured via the device trace) — still the fastest known
lowering: a row-sliced lax.gather (K*size [1, size] slices) measured 13x
slower end-to-end, and scalar-element gathers are worse again."""

from __future__ import annotations

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
