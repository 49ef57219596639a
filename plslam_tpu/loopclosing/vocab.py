"""Bag-of-words vocabulary + keyframe database, TPU-native.

Replaces DBoW2 (Thirdparty/DBoW2: TemplatedVocabulary k=10/L=6 tree,
BowVector, inverted index in KeyFrameDatabase — SURVEY.md §3.2). The
reference walks a 1e6-leaf vocabulary tree per descriptor (6 sequential
10-way Hamming argmins); the pre-trained ORBvoc.txt asset does not exist in
this offline environment and a tree walk is branch-heavy on TPU anyway.

TPU-native redesign: the vocabulary is a FIXED seeded codebook of W binary
words; quantization of all 1024 frame descriptors is ONE MXU Hamming matmul
[N, 256] x [W, 256] + argmin. BoW vector = normalized word histogram
(segment-sum); similarity = DBoW2's L1 score s(u, v) = 1 - 0.5 * |u - v|_1;
the KeyFrameDatabase inverted index becomes a dense [MAX_KF, W] BoW matrix
(one row per keyframe) queried by a single broadcast reduction.

A seeded random codebook is an LSH codebook: words are coarser than a
trained tree's leaves, but scoring only needs consistent quantization, which
is guaranteed by construction. (A k-medians-trained codebook can be dropped
in later via `Vocabulary(words=...)`.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from plslam_tpu.matching.points import hamming_matrix
from plslam_tpu.ops import brief

_VOCAB_SEED = 0xB0C4B


class Vocabulary:
    def __init__(self, n_words: int = 4096, words: np.ndarray | None = None):
        if words is None:
            words = trained_words()  # k-medians asset (ORBvoc equivalent)
        if words is None:  # no asset: seeded LSH codebook
            rs = np.random.RandomState(_VOCAB_SEED)
            words = rs.randint(0, 256, (n_words, 32)).astype(np.uint8)
        self.words = words
        self.n_words = words.shape[0]
        self._pm1 = jnp.asarray(
            np.asarray(brief.unpack_bits_pm1(jnp.asarray(words), jnp.float32))
        ).astype(jnp.bfloat16)

    def quantize(self, desc_pm1, valid):
        """[N, 256] pm1 descriptors -> word ids i32[N] (-1 for invalid)."""
        D = hamming_matrix(desc_pm1, self._pm1)  # [N, W]
        wid = jnp.argmin(D, axis=1).astype(jnp.int32)
        return jnp.where(valid, wid, -1)

    def bow(self, desc_pm1, valid):
        """-> L1-normalized BoW vector f32[W]."""
        wid = self.quantize(desc_pm1, valid)
        hist = jnp.zeros(self.n_words, jnp.float32).at[
            jnp.where(wid >= 0, wid, self.n_words)
        ].add(1.0, mode="drop")
        return hist / jnp.clip(jnp.sum(hist), 1.0)

    @functools.cached_property
    def bow_jit(self):
        return jax.jit(self.bow)


@functools.lru_cache(maxsize=1)
def trained_words() -> np.ndarray | None:
    """The trained k-medians codebook asset (loopclosing/train_vocab.py) —
    the equivalent of the reference's Vocabulary/ORBvoc.txt. None if the
    asset is absent (then a seeded LSH codebook is used)."""
    from plslam_tpu.loopclosing.train_vocab import ASSET

    if not ASSET.exists():
        return None
    return np.load(ASSET)["words"]


def random_vocabulary(n_words: int = 4096) -> "Vocabulary":
    """The untrained seeded-LSH baseline (for A/B tests)."""
    rs = np.random.RandomState(_VOCAB_SEED)
    return Vocabulary(words=rs.randint(0, 256, (n_words, 32)).astype(np.uint8))


def l1_score(bow_a, bow_b):
    """DBoW2 L1 similarity: s = 1 - 0.5 |u - v|_1 in [0, 1].

    bow_a f32[W] or [K, W]; bow_b f32[W] or [K, W] — broadcasts."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(bow_a - bow_b), axis=-1)
