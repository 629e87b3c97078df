"""Build lifecycle: resume from checkpoint, manifests/lineage, atomic
publish + retention, zero-doc refusal (the reference's index-lifecycle
semantics — ElasticsearchClient.java alias switch/retention; SURVEY.md
§2.2 and FIXTURES.md §4 "manifests / resume")."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from limetrans_ray.pipelines.build_index import build_index
from limetrans_ray.pipelines.search import SearchEngine
from limetrans_ray.state.manifest import current_build


def test_manifests_and_lineage(built_index):
    root, stats = built_index
    bdir = os.path.join(root, "builds", stats["build_id"])
    for stage in ["fwd", "docs", "segments", "term_stats"]:
        mpath = os.path.join(bdir, "manifests", f"{stage}.json")
        assert os.path.exists(mpath)
        with open(mpath) as fh:
            m = json.load(fh)
        assert m["input_fingerprint"] == stats["input_fingerprint"]
        assert m["partitions"], f"{stage} manifest has no partition lineage"
        assert all("bytes" in p for p in m["partitions"])
        assert os.path.exists(os.path.join(bdir, f"_DONE_{stage}"))


def test_full_resume_skips_all_stages(ray_session, webtext_dir, built_index):
    root, stats = built_index
    stats2 = build_index(webtext_dir, root)
    assert stats2["build_id"] == stats["build_id"]
    assert stats2["metrics"] == {}  # nothing re-ran


def test_partial_resume_reruns_only_invalidated(ray_session, webtext_dir, built_index):
    root, stats = built_index
    bdir = os.path.join(root, "builds", stats["build_id"])
    os.remove(os.path.join(bdir, "_DONE_term_stats"))
    stats2 = build_index(webtext_dir, root)
    assert list(stats2["metrics"]) == ["term_stats_s"]
    # results unchanged after the resumed rebuild
    eng = SearchEngine(root)
    assert eng.search("payment market", 5)


def test_current_pointer(built_index):
    root, stats = built_index
    assert current_build(root) == stats["build_id"]


def test_zero_docs_refused(ray_session, tmp_path):
    empty = tmp_path / "empty"
    empty.mkdir()
    pq.write_table(
        pa.table(
            {
                "url": pa.array([], pa.string()),
                "warc_ts": pa.array([], pa.timestamp("us")),
                "html": pa.array([], pa.binary()),
                "text": pa.array([], pa.string()),
                "lang": pa.array([], pa.string()),
            }
        ),
        str(empty / "e.parquet"),
    )
    root = str(tmp_path / "idx")
    with pytest.raises(ValueError, match="zero documents"):
        build_index(str(empty), root)
    assert not os.path.exists(os.path.join(root, "CURRENT"))


def test_retention(ray_session, webtext_dir, tmp_path):
    root = str(tmp_path / "idx")
    for i in range(4):
        build_index(webtext_dir, root, build_id=f"b-{i}")
    kept = sorted(os.listdir(os.path.join(root, "builds")))
    assert kept == ["b-1", "b-2", "b-3"]  # current + 2 previous
    assert current_build(root) == "b-3"


def test_adaptive_invert_batch_resolution():
    """Adaptive SPIMI batch size: ~4 invert tasks per CPU within the
    measured [4096, 12288] clamp; explicit config wins."""
    from limetrans_ray.pipelines.build_index import IndexBuildConfig

    cfg = IndexBuildConfig()
    assert cfg.resolved_invert_batch_size(600_000, 32) == 600_000 // 128
    assert cfg.resolved_invert_batch_size(100_000, 32) == 4096      # floor
    assert cfg.resolved_invert_batch_size(10_000_000, 32) == 12288  # cap
    assert IndexBuildConfig(invert_batch_size=7777).resolved_invert_batch_size(
        600_000, 32
    ) == 7777


def test_projected_dir_bytes(tmp_path):
    """The small-aggregate gate must see only the bytes of the columns
    the aggregation reads: a directory dominated by blob columns must
    still route a 3-small-column groupby to the driver path."""
    import numpy as np

    from limetrans_ray.pipelines.build_index import (
        _dir_bytes,
        _projected_dir_bytes,
    )

    rng = np.random.default_rng(5)
    for i in range(3):
        blob = [rng.bytes(20_000) for _ in range(50)]
        t = pa.table(
            {
                "term": pa.array([f"t{j}" for j in range(50)]),
                "df": pa.array(np.arange(50, dtype=np.int64)),
                "blob": pa.array(blob, pa.binary()),
            }
        )
        pq.write_table(t, tmp_path / f"part-{i}.parquet", compression="none")
    total = _dir_bytes(str(tmp_path))
    proj = _projected_dir_bytes(str(tmp_path), ["term", "df"])
    assert proj < total * 0.05          # blobs dominate the files
    assert proj > 0
    full = _projected_dir_bytes(str(tmp_path), ["term", "df", "blob"])
    assert total * 0.9 <= full <= total * 1.1
    assert _projected_dir_bytes(str(tmp_path / "missing"), ["term"]) == 0
