"""Map-state checkpoint/resume.

The reference CANNOT save or load maps (SURVEY.md §6: only trajectories at
exit). With a functional map this is free: the whole TrackState pytree is a
dict of arrays -> one npz file. Round-trips exactly (bit-identical arrays),
so a session can be resumed, inspected offline, or used for
localization-only replay against a prebuilt map.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _flatten(prefix: str, tree) -> dict:
    out = {}
    if hasattr(tree, "_asdict"):
        for k, v in tree._asdict().items():
            out.update(_flatten(f"{prefix}{k}.", v))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def save_state(path: str | Path, state, extra: dict | None = None) -> None:
    """TrackState (or any NamedTuple pytree of arrays) -> npz.

    extra: host-side arrays stored alongside the pytree under an `extra.`
    prefix (keyframe timestamps, BoW database rows — state the reference
    keeps in KeyFrame members, SURVEY.md §4.5 save-path completeness)."""
    flat = _flatten("", state)
    for k, v in (extra or {}).items():
        flat[f"extra.{k}"] = np.asarray(v)
    np.savez_compressed(path, **flat)


def load_state(path: str | Path, template, want_extra: bool = False):
    """npz -> pytree with the structure of `template` (a live TrackState:
    provides both the tree structure and the target dtypes).

    want_extra=True -> (pytree, extras dict) where extras holds every
    `extra.`-prefixed array in the file (empty for older snapshots)."""
    import jax.numpy as jnp

    data = np.load(path)

    def rebuild(prefix: str, node):
        if hasattr(node, "_asdict"):
            return type(node)(
                **{k: rebuild(f"{prefix}{k}.", v) for k, v in node._asdict().items()}
            )
        key = prefix[:-1]
        if key not in data.files:  # snapshot from an older schema: keep the
            return jnp.asarray(node)  # live template's value for new fields
        return jnp.asarray(data[key])

    tree = rebuild("", template)
    if not want_extra:
        return tree
    extras = {
        k[len("extra."):]: data[k] for k in data.files if k.startswith("extra.")
    }
    return tree, extras
