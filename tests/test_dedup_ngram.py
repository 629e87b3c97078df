"""Exact n-gram Jaccard near-dup: hand-computed oracles for the pair
math, the minhash-agreement invariant (the exact operator must find a
superset of what LSH finds at the same threshold), and the
max_shingle_df restricted-Jaccard cap path."""

import numpy as np
import pyarrow as pa
import pytest

from limetrans_ray.pipelines.dedup import (
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
)


def _ds(texts):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
        )
    )


def _py_jaccard(a: str, b: str, k: int = 3) -> float:
    def sh(t):
        toks = t.split()
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


def test_planted_pair_exact_value(ray_session):
    base = " ".join(f"w{i}" for i in range(40))
    near = base.replace("w20", "changed")  # 3 of 38 shingles differ
    far = " ".join(f"z{i}" for i in range(40))
    out = ngram_jaccard_pairs(_ds([base, near, far]), threshold=0.5)
    assert out[["a_id", "b_id"]].values.tolist() == [[0, 1]]
    assert out["jaccard"].iloc[0] == pytest.approx(_py_jaccard(base, near))


def test_threshold_excludes_weak_overlap(ray_session):
    a = " ".join(f"w{i}" for i in range(10))
    b = " ".join(f"w{i}" for i in range(5)) + " " + " ".join(
        f"y{i}" for i in range(5)
    )
    j = _py_jaccard(a, b)
    out = ngram_jaccard_pairs(_ds([a, b]), threshold=j + 0.01)
    assert len(out) == 0
    out = ngram_jaccard_pairs(_ds([a, b]), threshold=j - 0.01)
    assert len(out) == 1 and out["jaccard"].iloc[0] == pytest.approx(j)


def test_superset_of_minhash(ray_session):
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(300)]
    texts = [" ".join(rng.choice(vocab, size=60)) for _ in range(60)]
    for i in range(12):
        words = texts[i].split()
        if i % 2:
            words[5] = "changed"
        texts.append(" ".join(words))
    exact = ngram_jaccard_pairs(_ds(texts), threshold=0.8)
    lsh = minhash_lsh_candidates(_ds(texts), threshold=0.8, shingle_k=3)
    exact_pairs = set(map(tuple, exact[["a_id", "b_id"]].values.tolist()))
    lsh_pairs = set(map(tuple, lsh[["a_id", "b_id"]].values.tolist()))
    assert lsh_pairs <= exact_pairs
    # on this corpus banding at 128/32 should miss nothing
    assert lsh_pairs == exact_pairs
    assert len(exact_pairs) >= 12


def test_max_shingle_df_restricted_jaccard(ray_session):
    # one boilerplate sentence shared by ALL docs + a unique tail;
    # with the cap, the boilerplate shingles drop from both numerator
    # and denominator, so only the unique tails matter
    boiler = " ".join(f"b{i}" for i in range(10))
    texts = [boiler + " " + " ".join(f"u{d}x{i}" for i in range(6)) for d in range(8)]
    texts.append(boiler + " " + " ".join(f"u0x{i}" for i in range(6)))  # dup of doc 0's tail
    uncapped = ngram_jaccard_pairs(_ds(texts), threshold=0.99)
    assert len(uncapped) == 1  # full-text dup only
    capped = ngram_jaccard_pairs(_ds(texts), threshold=0.99, max_shingle_df=4)
    # boilerplate-only overlap pairs vanish entirely; the planted tail
    # dup still scores 1.0 on its surviving (rare) shingles
    assert capped[["a_id", "b_id"]].values.tolist() == [[0, 8]]
    assert capped["jaccard"].iloc[0] == pytest.approx(1.0)


def test_empty_and_short_docs(ray_session):
    out = ngram_jaccard_pairs(_ds(["", "one two", "", "x y z w"]), threshold=0.1)
    # docs with <k tokens have empty shingle sets and are never paired
    assert len(out) == 0
