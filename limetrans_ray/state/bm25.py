"""BM25 scoring math (k1=1.2, b=0.75) — shared by the distributed engine,
the block-max pruned scorer and the single-process oracle.

Formula (Lucene-style, the scorer the reference delegates to via
Elasticsearch — reference core/src/main/java/hbz/limetrans/
ElasticsearchClient.java search path):

    idf(t)        = ln(1 + (N - df + 0.5) / (df + 0.5))
    impact(tf,dl) = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    score(d, q)   = Σ_t idf(t) * impact(tf_td, dl_d)

Determinism contract: the per-term ``idf`` is computed with scalar
``math.log`` (never a vectorized log, whose ulp behavior may differ);
per-doc accumulation always iterates terms in **ascending term order**
so float64 summation order is identical in every implementation and at
every parallelism level. ``impact`` uses only IEEE-exact elementwise
ops (*, +, /), so numpy float64 and scalar Python agree bitwise.
"""

from __future__ import annotations

import math

import numpy as np

K1 = 1.2
B = 0.75


def idf(df: int, n_docs: int) -> float:
    """Scalar BM25 idf; ``math.log`` for cross-implementation determinism."""
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def impact(tfs: np.ndarray, dls: np.ndarray, avgdl: float, k1: float = K1, b: float = B) -> np.ndarray:
    """Vectorized idf-independent impact, float64 (also used to build
    block-max metadata at index time)."""
    tf = np.asarray(tfs, dtype=np.float64)
    dl = np.asarray(dls, dtype=np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * (dl / avgdl)))


def impact_scalar(tf: int, dl: int, avgdl: float, k1: float = K1, b: float = B) -> float:
    """Scalar impact — bitwise-identical to :func:`impact` elementwise."""
    tff = float(tf)
    return tff * (k1 + 1.0) / (tff + k1 * (1.0 - b + b * (float(dl) / avgdl)))


def max_impact(k1: float = K1) -> float:
    """Upper bound of impact as tf→∞ (used for pruning bounds)."""
    return k1 + 1.0


def top_k_from_scores(doc_ids: np.ndarray, scores: np.ndarray, k: int) -> list[tuple[int, float]]:
    """Deterministic top-k with tie-break (score desc, doc_id asc)."""
    n = len(doc_ids)
    if n == 0:
        return []
    k = min(k, n)
    if n > k:
        # keep every doc scoring >= the k-th largest score (ties included,
        # so the doc_id-asc tie-break sees all contenders), then sort.
        kth = np.partition(scores, n - k)[n - k]
        cand = np.flatnonzero(scores >= kth)
        doc_ids, scores = doc_ids[cand], scores[cand]
    order = np.lexsort((doc_ids, -scores))[:k]
    return [(int(doc_ids[i]), float(scores[i])) for i in order]
