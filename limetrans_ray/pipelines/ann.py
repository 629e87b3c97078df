"""Similarity search over an embedding column (``list<float>``).

Two paths per the task spec:

- :func:`brute_force_topk` — the exact baseline: L2-normalize the query
  matrix once, ``ray.put`` it, one numpy matmul per batch, keep the
  per-batch top-k, merge the (tiny) candidate set on the driver.
- :func:`lsh_topk` — the scale path: seeded random-hyperplane LSH
  assigns every vector to a bucket; the query probes only buckets
  within a Hamming radius of its own signature, so the matmul touches a
  fraction of the corpus. Recall vs the exact baseline is asserted in
  tests (tests/test_dedup_ann.py).

Determinism: hyperplanes are seeded; ties broken by ascending id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _normalize(m: np.ndarray) -> np.ndarray:
    m = m.astype(np.float64)
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def brute_force_topk(
    ds: rd.Dataset,
    queries: np.ndarray,
    query_ids: list[int],
    *,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = False,
) -> pd.DataFrame:
    """Exact cosine top-k for each query vector.

    Returns (query_id, rank, vec_id, cosine) with rank 1..k and
    deterministic tie-break (cosine desc, vec_id asc).
    """
    qn = _normalize(np.asarray(queries))
    ref = ray.put((qn, np.asarray(query_ids, dtype=np.int64)))

    def batch_topk(batch: pd.DataFrame) -> pd.DataFrame:
        q, qids = ray.get(ref)
        ids = batch[id_col].to_numpy().astype(np.int64)
        v = _normalize(np.stack(batch[vec_col].to_numpy()))
        sims = q @ v.T  # (n_q, n_batch)
        rows = []
        for qi in range(len(qids)):
            s = sims[qi]
            mask = np.ones(len(ids), dtype=bool)
            if exclude_self:
                mask &= ids != qids[qi]
            idx = np.flatnonzero(mask)
            if len(idx) == 0:
                continue
            top = idx[np.lexsort((ids[idx], -s[idx]))[: min(k, len(idx))]]
            for j in top:
                rows.append((int(qids[qi]), int(ids[j]), float(s[j])))
        return pd.DataFrame(rows, columns=["query_id", id_col, "cosine"])

    cand = ds.map_batches(batch_topk, batch_format="pandas").to_pandas()
    return _finalize_topk(cand, k, id_col)


def _finalize_topk(cand: pd.DataFrame, k: int, id_col: str) -> pd.DataFrame:
    if len(cand) == 0:
        return pd.DataFrame(
            {"query_id": [], "rank": [], id_col: [], "cosine": []}
        ).astype({"query_id": np.int64, "rank": np.int64, id_col: np.int64, "cosine": np.float64})
    cand = cand.sort_values(
        ["query_id", "cosine", id_col], ascending=[True, False, True]
    )
    cand["rank"] = cand.groupby("query_id").cumcount() + 1
    out = cand[cand["rank"] <= k][["query_id", "rank", id_col, "cosine"]]
    return out.reset_index(drop=True)


def lsh_topk(
    ds: rd.Dataset,
    queries: np.ndarray,
    query_ids: list[int],
    *,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 12,
    probe_hamming: int = 2,
    seed: int = 42,
) -> pd.DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH bucketing.

    Vectors land in ``sign(v·H)`` buckets (``n_planes`` bits); each
    query scores only vectors whose bucket is within ``probe_hamming``
    bits of its own — a tunable recall/cost dial. Output schema matches
    :func:`brute_force_topk`.
    """
    qn = _normalize(np.asarray(queries))
    dim = qn.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    qsig = (qn @ planes > 0).astype(np.uint32)
    qsig_int = (qsig << np.arange(n_planes, dtype=np.uint32)).sum(axis=1)
    # allowed buckets per query (all signatures within the Hamming radius)
    all_sigs = np.arange(1 << n_planes, dtype=np.uint32)
    popcount = np.unpackbits(all_sigs.view(np.uint8).reshape(-1, 4), axis=1).sum(axis=1)
    del popcount
    allowed = []
    for s in qsig_int:
        x = all_sigs ^ s
        ham = np.zeros(len(all_sigs), dtype=np.int32)
        v = x.copy()
        while v.any():
            ham += (v & 1).astype(np.int32)
            v >>= 1
        allowed.append(frozenset(all_sigs[ham <= probe_hamming].tolist()))
    ref = ray.put((qn, np.asarray(query_ids, dtype=np.int64), planes, allowed))

    def batch_topk(batch: pd.DataFrame) -> pd.DataFrame:
        q, qids, pl, allow = ray.get(ref)
        ids = batch[id_col].to_numpy().astype(np.int64)
        v = _normalize(np.stack(batch[vec_col].to_numpy()))
        sig = (v @ pl > 0).astype(np.uint32)
        sig_int = (sig << np.arange(pl.shape[1], dtype=np.uint32)).sum(axis=1)
        rows = []
        for qi in range(len(qids)):
            mask = np.fromiter((int(s) in allow[qi] for s in sig_int), dtype=bool, count=len(ids))
            idx = np.flatnonzero(mask)
            if len(idx) == 0:
                continue
            s = v[idx] @ q[qi]
            top = np.lexsort((ids[idx], -s))[: min(k, len(idx))]
            for j in top:
                rows.append((int(qids[qi]), int(ids[idx[j]]), float(s[j])))
        return pd.DataFrame(rows, columns=["query_id", id_col, "cosine"])

    cand = ds.map_batches(batch_topk, batch_format="pandas").to_pandas()
    return _finalize_topk(cand, k, id_col)
