"""Dedup suite + similarity search over synthetic corpora with planted
duplicates (the FIXTURES.md §4 oracles for the training-data ops)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from limetrans_ray.pipelines.ann import brute_force_topk, lsh_topk
from limetrans_ray.pipelines.dedup import (
    embedding_near_dups,
    exact_dedup,
    minhash_lsh_candidates,
    simhash_near_dups,
)


@pytest.fixture(scope="module")
def doc_ds(ray_session):
    """120 docs; 100-119 are near/exact duplicates of 0-19."""
    import ray.data as rd

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(300)]
    texts = [" ".join(rng.choice(vocab, size=60)) for _ in range(100)]
    for i in range(20):
        words = texts[i].split()
        if i % 2 == 0:
            texts.append(" ".join(words))  # exact dup
        else:
            words[5] = "changed"
            texts.append(" ".join(words))  # near dup (~59/61 jaccard)
    return rd.from_arrow(
        pa.table({"doc_id": pa.array(range(120), pa.int64()), "text": texts})
    )


def test_exact_dedup(ray_session, doc_ds):
    out = exact_dedup(doc_ds).to_pandas().sort_values("doc_id")
    # 10 exact dups collapse onto their originals
    assert len(out) == 110
    dup_groups = out[out["n_dups"] > 1]
    assert len(dup_groups) == 10
    assert (dup_groups["doc_id"] < 20).all()  # keep-first = min doc_id


def test_minhash_finds_planted_neardups(ray_session, doc_ds):
    pairs = minhash_lsh_candidates(doc_ds, threshold=0.8)
    found = set(zip(pairs["a_id"], pairs["b_id"]))
    for i in range(20):
        assert (i, 100 + i) in found, f"planted dup pair ({i},{100+i}) missed"
    # jaccard values are exact (verification step)
    exact = pairs[(pairs["a_id"] < 20) & (pairs["b_id"] == pairs["a_id"] + 100)]
    assert (exact[exact["a_id"] % 2 == 0]["jaccard"] == 1.0).all()
    assert (exact[exact["a_id"] % 2 == 1]["jaccard"] < 1.0).all()


def test_minhash_distributed_verify_parity(ray_session, doc_ds):
    """driver_verify_max=0 forces the join-based verify; output must be
    row- and value-identical to the driver-merge fast path."""
    fast = minhash_lsh_candidates(doc_ds, threshold=0.8)
    dist = minhash_lsh_candidates(doc_ds, threshold=0.8, driver_verify_max=0)
    pd.testing.assert_frame_equal(fast, dist)


def test_minhash_scale_candidates_distributed(ray_session):
    """>10k candidate pairs (above driver_verify_max) — the verify runs
    distributed (shingle rows never collected on the driver) and the
    planted clusters come back fully verified at exact Jaccard 1.0."""
    import ray.data as rd

    rng = np.random.default_rng(11)
    vocab = [f"t{i}" for i in range(4000)]
    texts, ids = [], []
    n_clusters, csize = 700, 6  # 700 * C(6,2) = 10,500 exact-dup pairs
    for c in range(n_clusters):
        base = " ".join(rng.choice(vocab, size=40))
        for m in range(csize):
            ids.append(c * csize + m)
            texts.append(base)
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
    )
    pairs = minhash_lsh_candidates(
        ds, threshold=0.8, num_perm=32, bands=8, driver_verify_max=4096
    )
    assert len(pairs) >= 10_000
    assert (pairs["jaccard"] == 1.0).all()
    # spot-check one full cluster's pair closure
    c0 = pairs[(pairs["a_id"] < csize) & (pairs["b_id"] < csize)]
    assert len(c0) == csize * (csize - 1) // 2


def test_simhash_finds_exact_dups(ray_session, doc_ds):
    pairs = simhash_near_dups(doc_ds, max_hamming=3)
    found = set(zip(pairs["a_id"], pairs["b_id"]))
    for i in range(0, 20, 2):  # exact dups have hamming 0
        assert (i, 100 + i) in found
    assert (pairs["hamming"] <= 3).all()


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    # clustered corpus: 8 clusters × 10 points (near neighbors are truly
    # similar — the regime hyperplane LSH is built for)
    centers = rng.standard_normal((8, 32)) * 3.0
    base = np.repeat(centers, 10, axis=0) + 0.3 * rng.standard_normal((80, 32))
    # 80-89 are tiny perturbations of 0-9 (near-dups)
    near = base[:10] + 0.01 * rng.standard_normal((10, 32))
    mat = np.vstack([base, near]).astype(np.float32)
    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(90), pa.int64()),
                "embedding": pa.array([v.tolist() for v in mat], pa.list_(pa.float32())),
            }
        )
    ), mat


def test_embedding_near_dups(ray_session, emb_ds):
    ds, _ = emb_ds
    pairs = embedding_near_dups(ds, threshold=0.99)
    found = set(zip(pairs["a_id"], pairs["b_id"]))
    for i in range(10):
        assert (i, 80 + i) in found


def test_brute_force_topk_matches_numpy(ray_session, emb_ds):
    ds, mat = emb_ds
    q = mat[:3].astype(np.float64)
    out = brute_force_topk(ds, q, [0, 1, 2], k=5)
    m = mat.astype(np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    for qi in range(3):
        sims = mn @ mn[qi]
        expect = np.lexsort((np.arange(90), -sims))[:5].tolist()
        got = out[out["query_id"] == qi].sort_values("rank")["vec_id"].tolist()
        assert got == expect, qi
    assert set(out.columns) == {"query_id", "rank", "vec_id", "cosine"}


def test_lsh_topk_recall(ray_session, emb_ds):
    ds, mat = emb_ds
    q = mat[:5].astype(np.float64)
    exact = brute_force_topk(ds, q, list(range(5)), k=5)
    approx = lsh_topk(ds, q, list(range(5)), k=5, n_planes=10, probe_hamming=3)
    hits = 0
    for qi in range(5):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        hits += len(e & a)
    assert hits / 25 >= 0.8  # recall floor for the probe budget
    # the perturbed twin must be found (cosine ≈ 1)
    top1 = approx[(approx["query_id"] == 0) & (approx["rank"] <= 2)]["vec_id"].tolist()
    assert 80 in top1 or 0 in top1


def test_degenerate_bucket_capped_and_connected(ray_session, caplog):
    """A pathological corpus (200 identical docs → every band bucket
    holds all of them) must complete in bounded time: over-cap buckets
    use star expansion (O(B) pairs, logged), and the duplicate CLUSTER
    stays connected through the anchor doc."""
    import logging

    import ray.data as rd

    n = 200
    text = "boilerplate page with the same words everywhere " * 3
    ds = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(n), pa.int64()), "text": [text] * n}
        )
    )
    with caplog.at_level(logging.WARNING, logger="limetrans_ray.pipelines.dedup"):
        out = minhash_lsh_candidates(ds, threshold=0.8, shingle_k=3)
    # star expansion: every doc pairs with the anchor (min id) — the
    # cluster is one connected component over all 200 docs
    assert set(out["a_id"]) == {0}
    assert set(out["b_id"]) == set(range(1, n))
    assert (out["jaccard"] == 1.0).all()
    assert any("star expansion" in r.message for r in caplog.records)


def test_degenerate_bucket_simhash(ray_session, caplog):
    import logging

    import ray.data as rd

    n = 150
    text = "identical simhash content words " * 4
    ds = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(n), pa.int64()), "text": [text] * n}
        )
    )
    with caplog.at_level(logging.WARNING, logger="limetrans_ray.pipelines.dedup"):
        out = simhash_near_dups(ds, max_hamming=3)
    assert set(out["a_id"]) == {0}
    assert set(out["b_id"]) == set(range(1, n))
    assert (out["hamming"] == 0).all()
    assert any("star expansion" in r.message for r in caplog.records)


def test_lsh_indexed_prunes_reads(ray_session, emb_ds, tmp_path):
    """The bucket-partitioned LSH index: identical results to the
    single-pass lsh_topk at the same params, with per-query IO limited
    to the probed buckets (scanned_rows < total_rows)."""
    from limetrans_ray.pipelines.ann import build_lsh_index, lsh_topk_indexed

    ds, mat = emb_ds
    idx_dir = str(tmp_path / "lsh_idx")
    meta = build_lsh_index(ds, idx_dir, n_planes=10, seed=42)
    assert meta["n_planes"] == 10

    q = mat[:5].astype(np.float64)
    exact = brute_force_topk(ds, q, list(range(5)), k=5)
    out, io = lsh_topk_indexed(
        idx_dir, q, list(range(5)), k=5, probe_hamming=3
    )
    assert io["total_rows"] == 90
    assert 0 < io["scanned_rows"] < io["total_rows"]  # pruned read
    hits = 0
    for qi in range(5):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(out[out["query_id"] == qi]["vec_id"])
        hits += len(e & a)
    assert hits / 25 >= 0.8
    # parity with the scan-everything LSH at identical params
    approx = lsh_topk(ds, q, list(range(5)), k=5, n_planes=10, probe_hamming=3)
    a = approx.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a["vec_id"].tolist() == b["vec_id"].tolist()


def test_embedding_near_dups_lsh(ray_session, emb_ds):
    """The banded-LSH embedding near-dup (scale path): finds the
    planted near-identical pairs without any O(n^2) driver matmul, and
    every emitted pair is exact-cosine-verified."""
    from limetrans_ray.pipelines.dedup import embedding_near_dups_lsh

    ds, _ = emb_ds
    pairs = embedding_near_dups_lsh(ds, threshold=0.99)
    found = set(zip(pairs["a_id"], pairs["b_id"]))
    for i in range(10):
        assert (i, 80 + i) in found, i
    assert (pairs["cosine"] >= 0.99).all()
    # subset of the brute-force result (verification removes all FPs)
    brute = embedding_near_dups(ds, threshold=0.99)
    assert found <= set(zip(brute["a_id"], brute["b_id"]))


def test_ivf_topk_recall_and_pruning(ray_session, emb_ds, tmp_path):
    """IVF path: k-means coarse quantizer (deterministic), hive
    list_id partitions, per-query nprobe pruned reads, recall vs the
    exact baseline."""
    from limetrans_ray.pipelines.ann import build_ivf_index, ivf_topk

    ds, mat = emb_ds
    idx = str(tmp_path / "ivf")
    meta = build_ivf_index(ds, idx, n_lists=8, seed=7)
    assert meta["n_lists"] == 8

    q = mat[:5].astype(np.float64)
    exact = brute_force_topk(ds, q, list(range(5)), k=5)
    out, io = ivf_topk(idx, q, list(range(5)), k=5, nprobe=3)
    assert io["total_rows"] == 90
    assert 0 < io["scanned_rows"] < io["total_rows"]
    hits = 0
    for qi in range(5):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(out[out["query_id"] == qi]["vec_id"])
        hits += len(e & a)
    assert hits / 25 >= 0.8


def test_lsh_index_files_carry_no_pandas_metadata(ray_session, emb_ds, tmp_path):
    """Index partition files must be PLAIN Arrow: pandas/tensor-extension
    schema metadata written by a pandas assign stage intermittently
    crashed the read-side Arrow->pandas conversion (ValueError: format
    number 1 of "numpy.ndarray(...)" is not recognized)."""
    import glob

    import pyarrow.parquet as pq

    from limetrans_ray.pipelines.ann import build_lsh_index

    ds, _ = emb_ds
    idx_dir = str(tmp_path / "lsh_meta")
    build_lsh_index(ds, idx_dir, n_planes=6, seed=7)
    files = glob.glob(f"{idx_dir}/vectors/**/*.parquet", recursive=True)
    assert files
    for f in files:
        meta = pq.read_schema(f).metadata or {}
        assert b"pandas" not in meta, f
