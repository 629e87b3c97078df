"""Cross-parallelism determinism: builds with different batch/block
boundaries must produce logically identical indexes and identical query
results (SURVEY.md §7.4 — the sandbox analogue of building on N vs 4N
nodes; result identity across ``num_cpus`` levels is additionally
asserted by ``bench.py --scaling`` in fresh processes)."""

import os

import pyarrow.parquet as pq
import pytest

from limetrans_ray.pipelines.build_index import IndexBuildConfig, build_index
from limetrans_ray.pipelines.search import SearchEngine

from .conftest import REFERENCE_QUERIES


@pytest.fixture(scope="module")
def second_build(ray_session, webtext_dir, tmp_path_factory):
    """Same corpus, very different execution granularity."""
    root = str(tmp_path_factory.mktemp("index_alt"))
    cfg = IndexBuildConfig(batch_size=97)  # vs default 2048
    stats = build_index(webtext_dir, root, config=cfg)
    return root, stats


def _read_sorted(root, stats, sub, columns, keys):
    tbl = pq.read_table(
        os.path.join(root, "builds", stats["build_id"], sub), columns=columns
    )
    import pyarrow.compute as pc

    return tbl.take(pc.sort_indices(tbl, sort_keys=[(k, "ascending") for k in keys]))


def test_docs_identical(built_index, second_build):
    (r1, s1), (r2, s2) = built_index, second_build
    t1 = _read_sorted(r1, s1, "docs", ["doc_id", "url", "canon", "doclen"], ["doc_id"])
    t2 = _read_sorted(r2, s2, "docs", ["doc_id", "url", "canon", "doclen"], ["doc_id"])
    assert t1.equals(t2)


def test_segments_logically_identical(built_index, second_build):
    (r1, s1), (r2, s2) = built_index, second_build
    cols = ["term", "bucket", "df", "cf", "first_doc", "last_doc", "ids_enc", "tfs_enc"]
    t1 = _read_sorted(r1, s1, "segments", cols, ["term", "bucket"])
    t2 = _read_sorted(r2, s2, "segments", cols, ["term", "bucket"])
    assert t1.num_rows == t2.num_rows
    assert t1.equals(t2)  # byte-identical encoded postings


def test_term_stats_identical(built_index, second_build):
    (r1, s1), (r2, s2) = built_index, second_build
    t1 = _read_sorted(r1, s1, "term_stats", ["term", "df", "cf"], ["term"])
    t2 = _read_sorted(r2, s2, "term_stats", ["term", "df", "cf"], ["term"])
    assert t1.equals(t2)


def test_query_results_identical(built_index, second_build):
    e1, e2 = SearchEngine(built_index[0]), SearchEngine(second_build[0])
    for q in REFERENCE_QUERIES:
        assert e1.search(q, 10) == e2.search(q, 10), q


@pytest.fixture(scope="module")
def scale_path_build(ray_session, webtext_dir, tmp_path_factory):
    """The 100 TB code paths forced on: distributed winner computation
    (key-range groupby + offset cumsum) and multi-slice doclen sharding
    in the posting merge."""
    root = str(tmp_path_factory.mktemp("index_scale"))
    cfg = IndexBuildConfig(
        winners_mode="distributed",
        winner_partitions=8,
        bucket_width=128,        # many buckets → several bucket groups
        merge_bucket_groups=4,
    )
    stats = build_index(webtext_dir, root, config=cfg)
    return root, stats


def test_distributed_winners_identical_docs(built_index, scale_path_build):
    (r1, s1), (r2, s2) = built_index, scale_path_build
    t1 = _read_sorted(r1, s1, "docs", ["doc_id", "url", "canon", "doclen"], ["doc_id"])
    t2 = _read_sorted(r2, s2, "docs", ["doc_id", "url", "canon", "doclen"], ["doc_id"])
    assert t1.equals(t2)  # same dedup winners AND same dense ids


def test_scale_paths_identical_results(built_index, scale_path_build):
    e1, e2 = SearchEngine(built_index[0]), SearchEngine(scale_path_build[0])
    for q in REFERENCE_QUERIES:
        r1, r2 = e1.search(q, 10), e2.search(q, 10)
        assert [d for d, _ in r1] == [d for d, _ in r2], q
        for (_, a), (_, b) in zip(r1, r2):
            assert a == pytest.approx(b, rel=1e-12), q
