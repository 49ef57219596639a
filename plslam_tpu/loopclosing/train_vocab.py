"""Vocabulary training: hierarchical k-medians over binary descriptors.

The reference ships a DBoW2 tree trained offline on Bovisa/TUM imagery
(Vocabulary/ORBvoc.txt, k=10, L=6 — SURVEY.md §3.2). That asset does not
exist here, so this module trains our own: hierarchical k-medians
(k = C.VOCAB_K, depth = C.VOCAB_L) over descriptors harvested from rendered
synthetic scenes, with the LEAVES flattened into the MXU codebook that
`Vocabulary` matches against. Flat nearest-leaf quantization is a strict
upgrade over DBoW2's greedy tree descent (globally nearest leaf vs
branch-committed descent); the tree only matters for training structure.

Binary k-medians: cluster center = per-bit majority vote (the median in
Hamming space); assignment = nearest center by Hamming distance. Empty
clusters are reseeded from the farthest points.

Run `python -m plslam_tpu.loopclosing.train_vocab` to regenerate the asset
(plslam_tpu/assets/orbvoc_tpu.npz). `Vocabulary.trained()` loads it.
"""

from __future__ import annotations

from pathlib import Path

if __name__ == "__main__":
    # training is offline tooling: force CPU BEFORE any jax backend use
    # (something in the import chain touches a device; the config update
    # must land first — JAX_PLATFORMS env is ignored under the axon plugin)
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from plslam_tpu import constants as C

ASSET = Path(__file__).resolve().parent.parent / "assets" / "orbvoc_tpu.npz"


def _unpack(desc_u8: np.ndarray) -> np.ndarray:
    """u8[N, 32] -> u8[N, 256] bits (LSB-first per byte, matching
    ops/brief.py's packing)."""
    bits = (desc_u8[:, :, None] >> np.arange(8, dtype=np.uint8)) & 1
    return bits.reshape(desc_u8.shape[0], -1)


def _pack(bits: np.ndarray) -> np.ndarray:
    """u8[K, 256] bits -> u8[K, 32]."""
    b = bits.reshape(bits.shape[0], 32, 8).astype(np.uint16)
    return (b << np.arange(8, dtype=np.uint16)).sum(-1).astype(np.uint8)


def kmedians(bits: np.ndarray, k: int, rng, n_iter: int = 8):
    """Binary k-medians on u8[N, 256] bit rows -> (centers u8[k, 256],
    assign i32[N])."""
    N = bits.shape[0]
    k = min(k, N)
    centers = bits[rng.choice(N, k, replace=False)].astype(np.uint8)
    b = bits.astype(np.int32)
    for _ in range(n_iter):
        # Hamming distance via dot products on 0/1 bits
        d = (
            b @ (1 - 2 * centers.astype(np.int32)).T
            + centers.astype(np.int32).sum(1)[None, :]
        )
        assign = d.argmin(1)
        new = np.zeros_like(centers)
        for j in range(k):
            sel = bits[assign == j]
            if len(sel) == 0:  # reseed from the farthest point
                new[j] = bits[d.min(1).argmax()]
            else:
                new[j] = (sel.mean(0) >= 0.5).astype(np.uint8)
        if (new == centers).all():
            break
        centers = new
    d = (
        b @ (1 - 2 * centers.astype(np.int32)).T
        + centers.astype(np.int32).sum(1)[None, :]
    )
    return centers, d.argmin(1)


def train_tree(desc_u8: np.ndarray, k: int = C.VOCAB_K, depth: int = C.VOCAB_L,
               seed: int = 0, min_node: int = 20) -> np.ndarray:
    """-> leaf centers u8[W, 32] (the flat codebook)."""
    rng = np.random.default_rng(seed)
    bits = _unpack(desc_u8)
    leaves: list[np.ndarray] = []

    def split(rows: np.ndarray, level: int):
        if level == depth or len(rows) < max(min_node, k):
            center = (bits[rows].mean(0) >= 0.5).astype(np.uint8)
            leaves.append(center)
            return
        centers, assign = kmedians(bits[rows], k, rng)
        for j in range(centers.shape[0]):
            sub = rows[assign == j]
            if len(sub):
                split(sub, level + 1)

    split(np.arange(len(bits)), 0)
    return _pack(np.stack(leaves))


def harvest_descriptors(n_seeds: int = 16, frames_per_seed: int = 8,
                        height: int = 240, width: int = 320,
                        seed_base: int = 100) -> np.ndarray:
    """Render varied synthetic scenes and extract ORB descriptors — the
    training corpus (the reference trained on Bovisa; any diverse imagery
    serves, what matters is the descriptor distribution of OUR extractor).

    Corpus breadth (round-3 verdict: 6 same-renderer seeds was narrow):
    16 seed-distinct scenes mixing xyz and loop trajectories, every third
    low-texture, each frame photometrically augmented (gamma 0.6-1.6 +
    brightness scale cycling deterministically) so word clusters are not
    keyed to one illumination. seed_base=100 keeps the training family
    disjoint from every eval fixture's seeds (tests use <50)."""
    import jax.numpy as jnp

    from plslam_tpu.features.orb import ORBExtractor
    from plslam_tpu.io.synthetic import SyntheticSequence

    ext = ORBExtractor(height, width, n_features=500)  # one jit, all scenes
    gammas = (0.6, 1.0, 1.6)
    gains = (0.7, 1.0, 1.25)
    out = []
    for si in range(n_seeds):
        seq = SyntheticSequence(
            n_frames=frames_per_seed, height=height, width=width,
            seed=seed_base + si,
            low_texture=bool(si % 3 == 2),
            trajectory="loop" if si % 2 else "xyz",
        )
        for i in range(frames_per_seed):
            g, _, _ = seq.frame(i)
            g = np.asarray(g, np.float32)
            gamma = gammas[(si + i) % len(gammas)]
            gain = gains[(si * 2 + i) % len(gains)]
            g = np.clip(255.0 * gain * (g / 255.0) ** gamma, 0, 255)
            fs = ext(jnp.asarray(g))
            v = np.asarray(fs.valid)
            out.append(np.asarray(fs.desc)[v])
    return np.concatenate(out, 0)


def harvest_descriptors_tum(tum_dir: str | Path, max_frames: int = 120) -> np.ndarray:
    """Harvest from real TUM RGB-D sequences under tum_dir (each containing
    rgb.txt) — the retrain hook fired by tests/data/fetch_tum.sh the moment
    real data exists (SURVEY.md §3.2 DBoW2 row: the reference's ORBvoc was
    trained on real imagery)."""
    import cv2
    import jax.numpy as jnp

    from plslam_tpu.features.orb import ORBExtractor

    tum_dir = Path(tum_dir)
    seqs = sorted(p.parent for p in tum_dir.glob("*/rgb.txt"))
    if not seqs:
        raise FileNotFoundError(f"no TUM sequences (rgb.txt) under {tum_dir}")
    ext = None
    out = []
    for seq in seqs:
        rels = [
            ln.split()[1]
            for ln in (seq / "rgb.txt").read_text().splitlines()
            if ln.strip() and not ln.startswith("#")
        ]
        step = max(1, len(rels) // max_frames)
        for rel in rels[::step]:
            img = cv2.imread(str(seq / rel), cv2.IMREAD_GRAYSCALE)
            if img is None:
                continue
            if ext is None:
                ext = ORBExtractor(img.shape[0], img.shape[1], n_features=500)
            fs = ext(jnp.asarray(img, jnp.float32))
            v = np.asarray(fs.valid)
            out.append(np.asarray(fs.desc)[v])
    return np.concatenate(out, 0)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tum", default=None, metavar="DIR",
                    help="harvest from real TUM sequences under DIR instead "
                         "of (only) the synthetic renderer")
    args = ap.parse_args(argv)

    print("harvesting descriptors from synthetic scenes ...")
    desc = harvest_descriptors()
    if args.tum:
        print(f"harvesting descriptors from TUM data under {args.tum} ...")
        desc = np.concatenate([desc, harvest_descriptors_tum(args.tum)], 0)
    print(f"training on {len(desc)} descriptors "
          f"(k={C.VOCAB_K}, L={C.VOCAB_L}) ...")
    words = train_tree(desc)
    ASSET.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        ASSET, words=words, k=C.VOCAB_K, depth=C.VOCAB_L, n_train=len(desc)
    )
    print(f"wrote {words.shape[0]} words -> {ASSET}")


if __name__ == "__main__":
    main()
