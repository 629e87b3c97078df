"""Phrase query conformance (ElasticsearchQueryTest phrase cases,
FIXTURES.md §3 "quoted phrases"): positional index round-trip, oracle
parity, and the family-doc matrix for consecutive-position semantics."""

import os

import pyarrow.parquet as pq
import pytest

from limetrans_ray.functions.analyzer import parse_query, tokenize_positions
from limetrans_ray.pipelines.search import SearchEngine
from limetrans_ray.sources.webtext import family_url


class TestParseQuery:
    def test_plain_terms(self):
        assert parse_query("holzbau atlas") == [
            {"type": "term", "variants": ("holzbau",)},
            {"type": "term", "variants": ("atlas",)},
        ]

    def test_phrase_and_terms(self):
        out = parse_query('web "drei zinnen" atlas')
        assert [c["type"] for c in out] == ["term", "phrase", "term"]
        # each phrase slot is a variant group — with stemming, inflected
        # slot words also admit the stem at that position
        assert out[1]["slots"] == [("drei",), ("zinnen", "zinn")]
        assert parse_query('web "drei zinnen" atlas', stem=False)[1]["slots"] == [
            ("drei",), ("zinnen",)
        ]

    def test_single_word_phrase_degrades_to_term(self):
        assert parse_query('"holzbau"') == [{"type": "term", "variants": ("holzbau",)}]

    def test_stopword_only_phrase_vanishes(self):
        assert parse_query('"der die"') == []


class TestPositions:
    def test_tokenize_positions_matches_tf(self):
        pos = tokenize_positions("payment market payment e-payment")
        assert pos["payment"] == [0, 2, 3]  # e-payment contributes pos 3
        assert pos["epayment"] == [3]
        assert pos["market"] == [1]
        assert pos["e"] == [3]
        assert sum(len(p) for p in pos.values()) == 6  # doclen


@pytest.fixture(scope="module")
def engine(built_index):
    return SearchEngine(built_index[0])


def _urls(built_index, doc_ids):
    root, stats = built_index
    docs = pq.read_table(
        os.path.join(root, "builds", stats["build_id"], "docs"),
        columns=["doc_id", "url"],
    )
    m = dict(zip(docs.column("doc_id").to_pylist(), docs.column("url").to_pylist()))
    return {m[d] for d in doc_ids}


class TestPhraseSearch:
    @pytest.mark.parametrize(
        "query,in_family,out_family",
        [
            # split-form docs match the phrase; hyphenated docs have all
            # variants at ONE position, so no consecutive pair exists
            ('"drei zinnen"', {10, 13}, {9, 11}),
            ('"zinnen gebiet"', {10, 12}, {9, 11}),
            ('"holzbau atlas"', {5}, {3, 4}),
            ('"e payment"', {2}, {0, 1}),
            # three-slot phrase
            ('"drei zinnen gebiet"', {10}, {9, 11, 12, 13}),
        ],
    )
    def test_phrase_family_matrix(self, built_index, engine, query, in_family, out_family):
        hits = {d for d, _ in engine.search(query, 100)}
        urls = _urls(built_index, hits)
        for i in in_family:
            assert family_url(i) in urls, f"{query}: doc {i} should match"
        for i in out_family:
            assert family_url(i) not in urls, f"{query}: doc {i} must NOT match"

    def test_phrase_oracle_parity(self, engine, oracle_engine):
        for q in ['"drei zinnen"', '"holzbau atlas"', 'web "search engine"',
                  '"payment market"', '"modern web" systems']:
            assert engine.search(q, 10) == oracle_engine.search(q, 10), q
            assert engine.search(q, 10, mode="or") == oracle_engine.search(
                q, 10, mode="or"
            ), q

    def test_phrase_filters_but_scores_like_terms(self, engine):
        """A phrase result set ⊆ the AND result set for the same words,
        and surviving docs keep identical scores."""
        loose = dict(engine.search("payment market", 10**6))
        strict = engine.search('"payment market"', 10**6)
        for d, s in strict:
            assert d in loose and s == loose[d]

    def test_nonexistent_phrase(self, engine):
        assert engine.search('"xylophone zinnen"', 10) == []


def test_quote_adjacent_to_word_still_phrases():
    out = parse_query('web"drei zinnen" atlas')
    assert [c["type"] for c in out] == ["term", "phrase", "term"]


class TestSortedSetAlgebra:
    """The sorted-array set kernels behind search_phrases must agree
    with np.intersect1d/union1d/unique on sorted-unique inputs."""

    def test_against_numpy_reference(self):
        import numpy as np

        from limetrans_ray.pipelines.search import (
            _dedupe_sorted,
            _intersect_sorted,
            _union_sorted,
        )

        rng = np.random.default_rng(3)
        for na, nb in [(0, 0), (0, 5), (1, 1), (100, 3), (1000, 1000)]:
            a = np.unique(rng.integers(0, 500, na)).astype(np.int64)
            b = np.unique(rng.integers(0, 500, nb)).astype(np.int64)
            assert np.array_equal(
                _intersect_sorted(a, b), np.intersect1d(a, b, assume_unique=True)
            )
            assert np.array_equal(_union_sorted([a, b]), np.union1d(a, b))
        # dedupe of an already-sorted array == unique
        s = np.sort(rng.integers(0, 50, 300)).astype(np.int64)
        assert np.array_equal(_dedupe_sorted(s), np.unique(s))
        # dedupe=False requires pairwise-disjoint inputs; result is the
        # radix-merged concatenation
        a = np.array([1, 4, 9], dtype=np.int64)
        b = np.array([2, 5], dtype=np.int64)
        assert list(_union_sorted([a, b], dedupe=False)) == [1, 2, 4, 5, 9]
