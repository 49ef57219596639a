"""Vocabulary quality: loop-detection precision/recall on a
perceptual-aliasing fixture, trained vs random codebook (SURVEY.md §10.6;
reference: DBoW2 trained tree, Thirdparty/DBoW2).

Fixture: two synthetic scenes with IDENTICAL geometry and camera paths but
DIFFERENT wall textures (seeds) — the classic corridor failure: every image
is "a textured wall with patches", so an undiscriminative vocabulary scores
cross-scene pairs as high as true revisits.

Positives: same-scene frame pairs with overlapping views (|i - j| <= 2).
Negatives: every cross-scene pair. Scoring matches the live pipeline's
TF-IDF L1 (pipeline/reloc.py _tfidf_scores).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from plslam_tpu.loopclosing import vocab as V
from plslam_tpu.ops import brief


@pytest.fixture(scope="module", params=[(3, 11), (17, 23)],
                ids=["seeds-3-11", "seeds-17-23"])
def aliasing_bows(request):
    """-> dict vocab_name -> (bows f32[2, F, W]) for both scenes.

    Parameterized over TWO seed families (round-3 verdict: a single fixture
    left the P/R claim fragile); the vocabulary's training seeds start at
    100 (train_vocab.harvest_descriptors seed_base) so neither family is in
    the training corpus."""
    from plslam_tpu.features.orb import ORBExtractor
    from plslam_tpu.io.synthetic import SyntheticSequence

    H, W, F = 240, 320, 8
    ext = ORBExtractor(H, W, n_features=500)
    descs = []  # [scene][frame] -> (desc, valid)
    for seed in request.param:
        seq = SyntheticSequence(n_frames=F, height=H, width=W, seed=seed)
        rows = []
        for i in range(F):
            g, _, _ = seq.frame(i)
            fs = ext(jnp.asarray(g))
            rows.append((np.asarray(fs.desc), np.asarray(fs.valid)))
        descs.append(rows)

    out = {}
    vocabs = {"random": V.random_vocabulary()}
    if V.trained_words() is not None:
        vocabs["trained"] = V.Vocabulary()
    for name, voc in vocabs.items():
        bows = np.zeros((2, F, voc.n_words), np.float32)
        for s in range(2):
            for i in range(F):
                d, val = descs[s][i]
                bows[s, i] = np.asarray(
                    voc.bow_jit(brief.unpack_bits_pm1(jnp.asarray(d)), jnp.asarray(val))
                )
        out[name] = bows
    return out


def tfidf_scores(query, rows):
    """Replicates Relocalizer._tfidf_scores (the live scoring)."""
    df = (rows > 0).sum(0).astype(np.float32)
    idf = np.maximum(np.log(len(rows) / (1.0 + df)) + 1.0, 0.0)

    def norm(v):
        w = v * idf
        return w / np.maximum(np.abs(w).sum(-1, keepdims=True), 1e-9)

    return 1.0 - 0.5 * np.abs(norm(rows) - norm(query[None])).sum(-1)


def pr_curve(bows):
    """-> (pos_scores, neg_scores) for the aliasing fixture."""
    F = bows.shape[1]
    rows = bows.reshape(-1, bows.shape[-1])  # database: all frames
    pos, neg = [], []
    for s in range(2):
        for i in range(F):
            scores = tfidf_scores(bows[s, i], rows)
            for j in range(F):
                if j == i:
                    continue
                sc = scores[s * F + j]
                if abs(i - j) <= 2:
                    pos.append(sc)
            for j in range(F):
                neg.append(scores[(1 - s) * F + j])
    return np.array(pos), np.array(neg)


def best_f1(pos, neg):
    ths = np.unique(np.concatenate([pos, neg]))
    best = (0.0, 0.0, 0.0, 0.0)
    for th in ths:
        tp = (pos >= th).sum()
        fp = (neg >= th).sum()
        fn = (pos < th).sum()
        p = tp / max(tp + fp, 1)
        r = tp / max(tp + fn, 1)
        f1 = 2 * p * r / max(p + r, 1e-9)
        if f1 > best[0]:
            best = (f1, p, r, th)
    return best


class TestVocabulary:
    def test_trained_asset_exists_and_loads(self):
        words = V.trained_words()
        if words is None:
            pytest.skip("vocabulary asset not trained yet")
        assert words.dtype == np.uint8 and words.shape[1] == 32
        assert words.shape[0] >= 500  # k=10 L=4 tree: up to 10^4 leaves
        # leaves must be distinct (degenerate training would collapse them)
        assert len({bytes(w) for w in words}) > 0.9 * words.shape[0]

    def test_precision_recall_aliasing(self, aliasing_bows):
        """P/R on the aliasing fixture; the trained vocabulary must separate
        true revisits from cross-scene aliases at least as well as the
        random LSH codebook, and usefully well in absolute terms."""
        results = {}
        for name, bows in aliasing_bows.items():
            pos, neg = pr_curve(bows)
            f1, p, r, th = best_f1(pos, neg)
            results[name] = (f1, p, r, th)
            print(f"{name}: best F1={f1:.3f} (P={p:.2f} R={r:.2f} @th={th:.3f}) "
                  f"pos median={np.median(pos):.3f} neg p95={np.percentile(neg, 95):.3f}")
        f1_r = results["random"][0]
        assert f1_r > 0 or "trained" in results
        if "trained" in results:
            f1_t = results["trained"][0]
            assert f1_t >= min(f1_r, 0.95) - 0.02, results
            assert f1_t >= 0.8, results

    def test_min_score_fallback_below_true_match_scores(self, aliasing_bows):
        """The detect() fallback min_score (used when a KF has no covisible
        neighbours) must sit BELOW typical true-revisit scores (else real
        loops are rejected) — justifies the constant in loopclosing.detect."""
        from plslam_tpu import constants as C

        name = "trained" if "trained" in aliasing_bows else "random"
        pos, neg = pr_curve(aliasing_bows[name])
        fallback = getattr(C, "LOOP_MIN_SCORE_FALLBACK", 0.05)
        assert fallback < np.median(pos), (
            f"fallback {fallback} rejects typical revisits (median {np.median(pos):.3f})"
        )
