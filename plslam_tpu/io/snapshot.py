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


def save_state(path: str | Path, state) -> None:
    """TrackState (or any NamedTuple pytree of arrays) -> npz."""
    np.savez_compressed(path, **_flatten("", state))


def load_state(path: str | Path, template):
    """npz -> pytree with the structure of `template` (a live TrackState:
    provides both the tree structure and the target dtypes)."""
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

    return rebuild("", template)
