"""Fused extract→invert contract (IndexBuildConfig.fuse_invert).

The fused path (default at fwd_partition_groups == 1 with the direct
exchange) must be a pure execution-plan change: identical index stats
and identical ranked results to the classic write-then-re-read path,
with the fused partials actually consumed by the merge on a clean
build, and the docs-stage winners-count guard falling back to the
classic invert when duplicate rows invalidate them.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from limetrans_ray.pipelines.build_index import IndexBuildConfig, build_index
from limetrans_ray.pipelines.search import SearchEngine

_HTML = "<html><body><p>{body}</p></body></html>"


def _write(path, rows):
    urls, tss, htmls, texts, langs = zip(*rows)
    pq.write_table(
        pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(np.array(tss, dtype=np.int64), pa.timestamp("us")),
                "html": pa.array([h.encode() for h in htmls], pa.binary()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
            }
        ),
        path,
    )


def _rows(n=60, seed=3):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        words = " ".join(f"w{int(x)}" for x in rng.integers(0, 50, size=15))
        rows.append(
            (
                f"https://fuse{i % 7}.example/p{i}",
                1_500_000_000_000 + i * 1_000,
                _HTML.format(body=words),
                words,
                "en",
            )
        )
    return rows


def _queries(rows):
    return sorted({r[3].split()[0] for r in rows})[:8]


def test_fused_identical_to_classic(ray_session, tmp_path):
    f = str(tmp_path / "a.parquet")
    rows = _rows()
    _write(f, rows)
    stats, engines = {}, {}
    for mode in ("classic", "fused"):
        root = str(tmp_path / f"idx_{mode}")
        stats[mode] = build_index(
            [f], root, config=IndexBuildConfig(fuse_invert=mode)
        )
        engines[mode] = SearchEngine(root)
    for k in ("n_docs", "total_terms", "avgdl", "bucket_width"):
        assert stats["fused"][k] == stats["classic"][k], k
    # the merge consumed the fused partials (not a silent classic rerun)
    assert stats["fused"]["metrics"]["merge_used_fused_partials"] == 1.0
    assert stats["classic"]["metrics"]["merge_used_fused_partials"] == 0.0
    for q in _queries(rows):
        assert engines["fused"].search(q, 10) == engines["classic"].search(q, 10), q
    # pruned == exhaustive still holds on the fused index
    q = _queries(rows)[0]
    assert engines["fused"].search(q, 10) == engines["fused"].search_exhaustive(q, 10)


def test_fused_falls_back_on_duplicate_rows(ray_session, tmp_path):
    """Exact duplicate input rows (same url AND warc_ts) invalidate the
    fused partials — the winners-count guard repairs fwd/ and the merge
    re-inverts from disk, producing the same index as a clean input."""
    rows = _rows(40, seed=9)
    dup_rows = rows + [rows[3], rows[3], rows[12]]
    fd = str(tmp_path / "dup.parquet")
    fc = str(tmp_path / "clean.parquet")
    _write(fd, dup_rows)
    _write(fc, rows)
    sd = build_index(
        [fd], str(tmp_path / "idx_d"), config=IndexBuildConfig(fuse_invert="fused")
    )
    sc = build_index([fc], str(tmp_path / "idx_c"))
    assert sd["metrics"]["fwd_dup_rows_dropped"] == 3
    assert sd["metrics"]["merge_used_fused_partials"] == 0.0  # fell back
    assert sd["n_docs"] == sc["n_docs"]
    assert sd["total_terms"] == sc["total_terms"]
    ed, ec = SearchEngine(str(tmp_path / "idx_d")), SearchEngine(str(tmp_path / "idx_c"))
    q = rows[3][3].split()[0]
    assert ed.search(q, 10) == ec.search(q, 10)


def test_groups_gt_one_stays_classic(ray_session, tmp_path):
    """fwd_partition_groups > 1 (the 100 TB partials-window knob) keeps
    the classic windowed path under fuse_invert='auto'."""
    f1, f2 = str(tmp_path / "g1.parquet"), str(tmp_path / "g2.parquet")
    rows = _rows(50, seed=5)
    _write(f1, rows[:25])
    _write(f2, rows[25:])
    cfg = IndexBuildConfig(fwd_partition_groups=2)
    s = build_index([f1, f2], str(tmp_path / "idx_g"), config=cfg)
    assert s["metrics"]["merge_used_fused_partials"] == 0.0
    s1 = build_index([f1, f2], str(tmp_path / "idx_1"))
    assert s1["metrics"]["merge_used_fused_partials"] == 1.0
    assert s["n_docs"] == s1["n_docs"]
    assert s["total_terms"] == s1["total_terms"]
