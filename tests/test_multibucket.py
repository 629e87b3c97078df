"""Multi-bucket index coverage: force a tiny ``bucket_width`` so terms
split into many chunks (the hot-term salting layout actually used at
scale) and assert oracle parity and pruned/exhaustive equality there.

Regression context: a variable-shadowing bug in the pruned scorer's
block-run loop only manifested with ≥2 buckets — the default test
corpus fits one bucket and never caught it."""

import pytest

from limetrans_ray.pipelines.build_index import IndexBuildConfig, build_index
from limetrans_ray.pipelines.search import SearchEngine

from .conftest import REFERENCE_QUERIES


@pytest.fixture(scope="module")
def bucketed_index(ray_session, webtext_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("index_bucketed"))
    stats = build_index(
        webtext_dir, root, config=IndexBuildConfig(bucket_width=128)
    )
    return root, stats


def test_many_buckets_exist(bucketed_index):
    import os

    import pyarrow.parquet as pq

    root, stats = bucketed_index
    segs = pq.read_table(
        os.path.join(root, "builds", stats["build_id"], "segments"),
        columns=["term", "bucket"],
    )
    buckets = set(segs.column("bucket").to_pylist())
    assert len(buckets) > 5  # genuinely multi-chunk terms
    # at least one term spans several buckets
    from collections import Counter

    per_term = Counter(segs.column("term").to_pylist())
    assert max(per_term.values()) > 3


def test_oracle_parity_multibucket(bucketed_index, oracle_engine):
    eng = SearchEngine(bucketed_index[0])
    assert eng.n_docs == oracle_engine.n_docs
    for q in REFERENCE_QUERIES:
        oracle = oracle_engine.search(q, 10)
        assert eng.search_exhaustive(q, 10) == oracle, q
        assert eng.search_pruned(q, 10) == oracle, q


def test_pruned_warm_cache_path(bucketed_index):
    """Second identical query goes through the decoded-postings cache —
    results must be bit-identical to the cold path."""
    eng = SearchEngine(bucketed_index[0])
    for q in ["payment market", "page", "web search engine", "drei zinnen gebiet"]:
        cold = eng.search_pruned(q, 10)
        warm = eng.search_pruned(q, 10)
        assert cold == warm == eng.search_exhaustive(q, 10), q


def test_or_mode_multibucket(bucketed_index, oracle_engine):
    eng = SearchEngine(bucketed_index[0])
    for q in ["payment market", "uber die strasse", "web search engine"]:
        assert eng.search_pruned(q, 10, mode="or") == oracle_engine.search(
            q, 10, mode="or"
        ), q
