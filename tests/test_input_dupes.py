"""Duplicate-input handling + dedup tie-break contract.

The winner key (doc_key, win_ts, url_hash) cannot discriminate exact
duplicate input rows (same url AND warc_ts): every copy satisfies
is_winner, so without repair each copy reaches fwd/ with the SAME
doc_id, inflating n_docs/avgdl/df and duplicating postings. The ES
reference collapses such rows via ``_id`` (ElasticsearchIndexer
addBulkIndex(id, doc)). These tests pin:

- the same file listed twice builds the same index as listed once;
- genuine duplicate rows inside one file are collapsed (n_docs = the
  distinct-key count, postings not doubled);
- on a warc_ts tie between two URL variants the winner is the row with
  the smaller stable_hash64(url) — the compute_winners lexsort contract.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from limetrans_ray.functions.textstats import stable_hash64
from limetrans_ray.pipelines.build_index import build_index
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


def _rows(n=30, seed=7):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        words = " ".join(f"w{int(x)}" for x in rng.integers(0, 40, size=12))
        rows.append(
            (
                f"https://dup{i % 5}.example/p{i}",
                1_000_000_000_000 + i * 1_000,
                _HTML.format(body=words),
                words,
                "en",
            )
        )
    return rows


def test_same_file_twice_is_one_build(ray_session, tmp_path):
    f = str(tmp_path / "a.parquet")
    _write(f, _rows())
    r1 = str(tmp_path / "idx1")
    r2 = str(tmp_path / "idx2")
    s1 = build_index([f], r1)
    s2 = build_index([f, f], r2)
    assert s2["n_docs"] == s1["n_docs"]
    assert s2["total_terms"] == s1["total_terms"]


def test_identical_rows_collapsed(ray_session, tmp_path):
    rows = _rows()
    # duplicate three rows verbatim (same url AND warc_ts AND content)
    dup_rows = rows + [rows[2], rows[2], rows[7]]
    fd = str(tmp_path / "dup.parquet")
    fc = str(tmp_path / "clean.parquet")
    _write(fd, dup_rows)
    _write(fc, rows)
    sd = build_index([fd], str(tmp_path / "idx_d"))
    sc = build_index([fc], str(tmp_path / "idx_c"))
    assert sd["n_docs"] == sc["n_docs"]
    assert sd["total_terms"] == sc["total_terms"]
    assert sd["avgdl"] == sc["avgdl"]
    # postings not doubled: identical top-k ids AND scores on a term
    # from the duplicated documents
    ed = SearchEngine(str(tmp_path / "idx_d"))
    ec = SearchEngine(str(tmp_path / "idx_c"))
    q = rows[2][3].split()[0]
    assert ed.search(q, 10) == ec.search(q, 10)


def test_warc_ts_tie_break_on_url_hash(ray_session, tmp_path):
    rows = _rows(10)
    # two URL variants of one canonical url, identical warc_ts,
    # different content — winner must be min stable_hash64(url)
    ts = 2_000_000_000_000
    u_a = "https://tie.example/page?utm_source=a"  # canon: https://tie.example/page
    u_b = "https://tie.example/page#frag"          # same canon
    rows.append((u_a, ts, _HTML.format(body="alpha body"), "alpha body", "en"))
    rows.append((u_b, ts, _HTML.format(body="beta body"), "beta body", "en"))
    f = str(tmp_path / "tie.parquet")
    _write(f, rows)
    root = str(tmp_path / "idx")
    stats = build_index([f], root)
    assert stats["n_docs"] == len(rows) - 1  # the variant pair collapsed
    expected_url = u_a if stable_hash64(u_a) < stable_hash64(u_b) else u_b
    docs = pq.read_table(
        os.path.join(root, "builds", stats["build_id"], "docs"),
        columns=["url", "canon"],
    )
    got = [
        u
        for u, c in zip(docs.column("url").to_pylist(), docs.column("canon").to_pylist())
        if c == "https://tie.example/page"
    ]
    assert got == [expected_url]


def test_identical_rows_collapsed_distributed_winners(ray_session, tmp_path):
    """The duplicate-input repair composes with the distributed winner
    computation (the 100 TB path): same result as the driver path."""
    from limetrans_ray.pipelines.build_index import IndexBuildConfig

    rows = _rows()
    dup_rows = rows + [rows[4], rows[11]]
    f = str(tmp_path / "d.parquet")
    _write(f, dup_rows)
    cfg = IndexBuildConfig(winners_mode="distributed", winner_partitions=4)
    sd = build_index([f], str(tmp_path / "idx_dist"), config=cfg)
    sc = build_index([f], str(tmp_path / "idx_drv"))
    assert sd["n_docs"] == sc["n_docs"] == len(rows)
    assert sd["total_terms"] == sc["total_terms"]


def test_all_rows_duplicated_distributed_repair(ray_session, tmp_path):
    """EVERY input row duplicated (the crawl-flood case the repair
    exists for): the keep-min-digest repair runs as a distributed
    groupby — no duplicated row visits the driver — and the result
    equals the clean build exactly (n_docs, stats, scores)."""
    rows = _rows(25, seed=13)
    dup_rows = rows + rows + rows  # 3 copies of everything
    fd = str(tmp_path / "flood.parquet")
    fc = str(tmp_path / "clean.parquet")
    _write(fd, dup_rows)
    _write(fc, rows)
    sd = build_index([fd], str(tmp_path / "idx_flood"))
    sc = build_index([fc], str(tmp_path / "idx_clean"))
    assert sd["n_docs"] == sc["n_docs"] == len(rows)
    assert sd["total_terms"] == sc["total_terms"]
    assert sd["avgdl"] == sc["avgdl"]
    ed = SearchEngine(str(tmp_path / "idx_flood"))
    ec = SearchEngine(str(tmp_path / "idx_clean"))
    for q in ("w1", "w7 w13"):
        assert ed.search(q, 10) == ec.search(q, 10)
