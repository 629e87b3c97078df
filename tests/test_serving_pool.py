"""Doc-range-sharded serving pool: scatter-gather top-k must equal the
single-engine results exactly (the ES shard fan-out analogue)."""

import pytest

from limetrans_ray.pipelines.build_index import IndexBuildConfig, build_index
from limetrans_ray.pipelines.search import SearchEngine, ServingPool

from .conftest import REFERENCE_QUERIES


@pytest.fixture(scope="module")
def pool_and_engine(ray_session, webtext_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_pool"))
    # small buckets → enough buckets to split across 4 shards
    build_index(webtext_dir, root, config=IndexBuildConfig(bucket_width=128))
    pool = ServingPool(root, n_shards=4)
    engine = SearchEngine(root)
    yield pool, engine
    pool.shutdown()


def test_pool_spans_shards(pool_and_engine):
    pool, _ = pool_and_engine
    assert pool.n_shards == 4


def test_shard_preload_reads_only_its_slices(pool_and_engine):
    """The hive ``bslice=`` doc-range layout: a bucket-range shard's
    file listing (what _preload_segments reads) must touch only slice
    dirs overlapping its range — bytes-read ≪ whole index."""
    import os

    _, engine = pool_and_engine
    bounds = engine.stats["segment_slice_bounds"]
    assert len(bounds) > 2  # layout actually sliced at this bucket_width
    full_files = engine._segment_files()
    n_buckets = int(engine.stats["max_doc"]) // int(engine.stats["bucket_width"]) + 1
    lo, hi = 0, max(1, n_buckets // 4)
    shard = SearchEngine(
        os.path.dirname(os.path.dirname(engine.bdir)), bucket_range=(lo, hi)
    )
    shard_files = shard._segment_files()
    assert len(shard_files) < len(full_files)
    for f in shard_files:  # every listed sliced file overlaps the range
        part = [p for p in f.split(os.sep) if p.startswith("bslice=")]
        if part:
            s = int(part[0].split("=")[1])
            assert bounds[s] < hi and bounds[s + 1] > lo, f


def test_pool_equals_single_engine(pool_and_engine):
    pool, engine = pool_and_engine
    for q in REFERENCE_QUERIES:
        assert pool.search(q, 10) == engine.search(q, 10), q


def test_pool_or_mode_and_phrases(pool_and_engine):
    pool, engine = pool_and_engine
    for q in ["payment market", "web search engine"]:
        assert pool.search(q, 10, mode="or") == engine.search(q, 10, mode="or"), q
    for q in ['"drei zinnen"', '"payment market"']:
        assert pool.search(q, 10) == engine.search(q, 10), q


def test_search_many(pool_and_engine):
    pool, engine = pool_and_engine
    qs = REFERENCE_QUERIES[:6]
    out = pool.search_many(qs, k=5)
    for q in qs:
        assert out[q] == engine.search(q, 5), q


def test_pool_respects_tombstones(ray_session, webtext_dir, tmp_path_factory):
    """Range-sharded tombstone slices: a deleted doc vanishes from the
    scatter-gather result exactly as from the single engine."""
    from limetrans_ray.pipelines.build_index import build_index
    from limetrans_ray.pipelines.search import SearchEngine, ServingPool
    from limetrans_ray.pipelines.update_index import delete_documents

    root = str(tmp_path_factory.mktemp("idx_pool_tomb"))
    build_index(webtext_dir, root)
    eng = SearchEngine(root)
    top = eng.search("payment market", 3)
    victim = top[0][0]
    assert delete_documents(root, doc_ids=[victim]) == 1
    eng2 = SearchEngine(root)
    pool = ServingPool(root, n_shards=3)
    try:
        got = pool.search("payment market", 10)
        want = eng2.search("payment market", 10)
        assert got == want
        assert victim not in [d for d, _ in got]
    finally:
        pool.shutdown()
