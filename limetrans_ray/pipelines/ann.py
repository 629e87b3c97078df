"""Similarity search over an embedding column (``list<float>``).

Three paths per the task spec:

- :func:`brute_force_topk` — the exact baseline: L2-normalize the query
  matrix once, ``ray.put`` it, one numpy matmul per batch, keep the
  per-batch top-k, merge the (tiny) candidate set on the driver.
- :func:`lsh_topk` — single-pass approximate: seeded random-hyperplane
  LSH buckets every vector; a query scores only vectors whose bucket is
  within a Hamming radius of its own (vectorized via a boolean
  (n_queries × 2^n_planes) probe table — no per-row Python).
- :func:`build_lsh_index` + :func:`lsh_topk_indexed` — the scale path:
  vectors are WRITTEN bucket-partitioned (hive ``bucket=`` parquet
  dirs); a query reads ONLY its probed buckets' partitions, so
  bytes-read per query is the probed fraction of the corpus, not a full
  scan. Recall vs the exact baseline is asserted in tests
  (tests/test_dedup_ann.py).

Determinism: hyperplanes are seeded; ties broken by ascending id.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _normalize(m: np.ndarray) -> np.ndarray:
    m = m.astype(np.float64)
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _vec_matrix(col) -> np.ndarray:
    """(n, dim) matrix from an Arrow vector column (list, large_list,
    fixed-size list, or a tensor-extension array)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return np.stack(col.to_numpy(zero_copy_only=False))


def _plain_vec_column(col, mat: np.ndarray):
    """The vector column as a PLAIN Arrow list array for parquet.

    Index partitions must never carry pandas/tensor-extension schema
    metadata: a pandas batch whose cells are np.ndarrays round-trips
    through Ray as a tensor extension whose embedded pandas metadata
    ("numpy.ndarray(shape=..)") intermittently crashes the read-side
    Arrow→pandas conversion. Plain list input passes through zero-copy;
    anything else is rebuilt from the already-extracted matrix."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return col
    return pa.array(list(mat), type=pa.list_(pa.from_numpy_dtype(mat.dtype)))


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
        if len(batch) == 0:  # Ray may emit empty blocks under splits
            return _typed_rows_frame([], id_col)
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
        return _typed_rows_frame(rows, id_col)

    cand = ds.map_batches(batch_topk, batch_format="pandas").to_pandas()
    return _finalize_topk(cand, k, id_col)


def _typed_rows_frame(rows: list, id_col: str) -> pd.DataFrame:
    """Candidate frame with stable dtypes even when empty (an untyped
    empty object frame trips Ray's block size estimation)."""
    out = pd.DataFrame(rows, columns=["query_id", id_col, "cosine"])
    if not rows:
        out = out.astype(
            {"query_id": np.int64, id_col: np.int64, "cosine": np.float64}
        )
    return out


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
    allow = _probe_table(qn @ planes > 0, probe_hamming)  # (n_q, 2^planes)
    ref = ray.put((qn, np.asarray(query_ids, dtype=np.int64), planes, allow))

    def batch_topk(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return _typed_rows_frame([], id_col)
        q, qids, pl, allow_tbl = ray.get(ref)
        ids = batch[id_col].to_numpy().astype(np.int64)
        v = _normalize(np.stack(batch[vec_col].to_numpy()))
        sig_int = _sig_ints(v @ pl > 0)
        mask = allow_tbl[:, sig_int]  # (n_q, n_batch) — one fancy-index
        rows = []
        for qi in range(len(qids)):
            idx = np.flatnonzero(mask[qi])
            if len(idx) == 0:
                continue
            s = v[idx] @ q[qi]
            top = np.lexsort((ids[idx], -s))[: min(k, len(idx))]
            for j in top:
                rows.append((int(qids[qi]), int(ids[idx[j]]), float(s[j])))
        return _typed_rows_frame(rows, id_col)

    cand = ds.map_batches(batch_topk, batch_format="pandas").to_pandas()
    return _finalize_topk(cand, k, id_col)


def _sig_ints(bits: np.ndarray) -> np.ndarray:
    """Pack a (n, n_planes) sign-bit matrix into integer signatures."""
    n_planes = bits.shape[1]
    return (
        bits.astype(np.uint32) << np.arange(n_planes, dtype=np.uint32)
    ).sum(axis=1)


def _probe_table(qbits: np.ndarray, probe_hamming: int) -> np.ndarray:
    """Boolean (n_queries, 2^n_planes) table: allow[q, sig] iff sig is
    within ``probe_hamming`` bits of query q's signature — turns the
    per-row membership test into one vectorized fancy-index."""
    n_planes = qbits.shape[1]
    qsig = _sig_ints(qbits)
    all_sigs = np.arange(1 << n_planes, dtype=np.uint32)
    xors = all_sigs[None, :] ^ qsig[:, None]          # (n_q, 2^planes)
    pop = np.unpackbits(
        xors.astype(np.uint32).view(np.uint8).reshape(len(qsig), -1, 4), axis=2
    ).sum(axis=2)
    return pop <= probe_hamming


def build_lsh_index(
    ds: rd.Dataset,
    index_dir: str,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 12,
    seed: int = 42,
) -> dict:
    """Write a bucket-partitioned LSH index: one pass assigns every
    vector its hyperplane signature and writes hive-partitioned parquet
    (``bucket=<sig>/``). Queries then read ONLY probed buckets
    (:func:`lsh_topk_indexed`) — the per-query IO is the probed
    fraction of the corpus. Metadata (planes, params) persists next to
    the partitions; the layout is deterministic (seeded planes)."""
    probe_dim = None
    rng = np.random.default_rng(seed)
    # peek the dimension from one row (cheap driver read)
    first = ds.take(1)[0]
    probe_dim = len(first[vec_col])
    planes = rng.standard_normal((probe_dim, n_planes))
    planes_ref = ray.put(planes)

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    id_col: batch.column(id_col),
                    vec_col: batch.column(vec_col),
                    "bucket": pa.array([], pa.int64()),
                }
            )
        pl = ray.get(planes_ref)
        m = _vec_matrix(batch.column(vec_col))
        bucket = pa.array(_sig_ints(_normalize(m) @ pl > 0).astype(np.int64))
        return pa.table(
            {
                id_col: batch.column(id_col),
                vec_col: _plain_vec_column(batch.column(vec_col), m),
                "bucket": bucket,
            }
        )

    vec_dir = os.path.join(index_dir, "vectors")
    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        vec_dir, partition_cols=["bucket"]
    )
    os.makedirs(index_dir, exist_ok=True)
    meta = {
        "n_planes": n_planes, "seed": seed, "dim": probe_dim,
        # row count recorded ONCE at build — queries must not pay a
        # footer walk proportional to the whole index
        "total_rows": _count_partition_rows(vec_dir),
    }
    with open(os.path.join(index_dir, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    np.save(os.path.join(index_dir, "planes.npy"), planes)
    return meta


def _count_partition_rows(vec_dir: str) -> int:
    import pyarrow.parquet as _pq

    n = 0
    for root, _dirs, fs in os.walk(vec_dir):
        n += sum(
            _pq.read_metadata(os.path.join(root, f)).num_rows
            for f in fs if f.endswith(".parquet")
        )
    return int(n)


def _partition_dirs(vec_dir: str, prefix: str) -> dict[int, str]:
    """``{partition_value: path}`` for hive ``<prefix>=<v>`` dirs."""
    return {
        int(d.split("=", 1)[1]): os.path.join(vec_dir, d)
        for d in os.listdir(vec_dir)
        if d.startswith(prefix + "=")
    }


def _probed_files(dirs: dict[int, str], wanted) -> list[str]:
    return [
        os.path.join(dirs[b], f)
        for b in wanted
        if b in dirs
        for f in sorted(os.listdir(dirs[b]))
        if f.endswith(".parquet")
    ]


def _scan_pruned_topk(
    files: list[str],
    qn: np.ndarray,
    query_ids,
    allow: np.ndarray,
    assign_fn,
    *,
    k: int,
    vec_col: str,
    id_col: str,
) -> tuple[pd.DataFrame, int]:
    """Shared pruned-read scorer for the partitioned ANN indexes:
    read only ``files``, recompute each row's partition value with
    ``assign_fn(v_normalized, assign_state)`` (never trust hive column
    recovery on subdir reads), mask by ``allow[(n_q, n_partitions)]``,
    per-batch top-k. ``assign_fn`` must be a module-level function; its
    (possibly large) state ships once via the broadcast ref. Returns
    (candidate frame, scanned row count)."""
    assign_fn, assign_state = assign_fn
    qref = ray.put((qn, np.asarray(query_ids, dtype=np.int64), allow, assign_state))

    def batch_topk(batch: pa.Table) -> pd.DataFrame:
        # pyarrow in (never Arrow→pandas: written partitions may carry
        # foreign pandas metadata — see _plain_vec_column), pandas out
        if batch.num_rows == 0:
            return _typed_rows_frame([], id_col)
        q, qids, allow_tbl, state = ray.get(qref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        v = _normalize(_vec_matrix(batch.column(vec_col)))
        part = assign_fn(v, state)
        mask = allow_tbl[:, part]
        rows = []
        for qi in range(len(qids)):
            idx = np.flatnonzero(mask[qi])
            if len(idx) == 0:
                continue
            s = v[idx] @ q[qi]
            top = np.lexsort((ids[idx], -s))[: min(k, len(idx))]
            for j in top:
                rows.append((int(qids[qi]), int(ids[idx[j]]), float(s[j])))
        return _typed_rows_frame(rows, id_col)

    scanned = rd.read_parquet(files)
    n_scanned = scanned.count()
    cand = scanned.map_batches(batch_topk, batch_format="pyarrow").to_pandas()
    return cand, int(n_scanned)


def lsh_topk_indexed(
    index_dir: str,
    queries: np.ndarray,
    query_ids: list[int],
    *,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_hamming: int = 2,
) -> tuple[pd.DataFrame, dict]:
    """Approximate top-k against a :func:`build_lsh_index` layout,
    reading only the probed buckets' partitions. Returns
    ``(result_frame, io_stats)`` where io_stats reports the probed
    bucket count and the scanned-row fraction (the no-silent-caps
    transparency knob)."""
    with open(os.path.join(index_dir, "meta.json")) as fh:
        meta = json.load(fh)
    planes = np.load(os.path.join(index_dir, "planes.npy"))
    qn = _normalize(np.asarray(queries))
    allow = _probe_table(qn @ planes > 0, probe_hamming)
    probed = np.flatnonzero(allow.any(axis=0))  # union over queries
    vec_dir = os.path.join(index_dir, "vectors")
    dirs = _partition_dirs(vec_dir, "bucket")
    files = _probed_files(dirs, probed)
    n_total = int(meta.get("total_rows", -1))
    if n_total < 0:  # pre-metadata index layout
        n_total = _count_partition_rows(vec_dir)
    if not files:
        return (
            _finalize_topk(pd.DataFrame(), k, id_col),
            {"probed_buckets": 0, "scanned_rows": 0, "total_rows": n_total},
        )
    cand, n_scanned = _scan_pruned_topk(
        files, qn, query_ids, allow, (_assign_lsh, planes),
        k=k, vec_col=vec_col, id_col=id_col,
    )
    return (
        _finalize_topk(cand, k, id_col),
        {
            "probed_buckets": int(len(probed)),
            "scanned_rows": n_scanned,
            "total_rows": n_total,
        },
    )


def _assign_lsh(v: np.ndarray, planes: np.ndarray) -> np.ndarray:
    # recompute the signature (cheap matmul) rather than trusting hive
    # partition-column recovery on subdirectory reads
    return _sig_ints(v @ planes > 0)


def _assign_ivf(v: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    return (v @ centroids.T).argmax(axis=1)


# ------------------------------------------------------------------- IVF

def _kmeans(vecs: np.ndarray, k: int, *, iters: int = 12, seed: int = 42) -> np.ndarray:
    """Deterministic spherical k-means (seeded init, fixed iterations,
    cosine assignment) — the coarse quantizer for the IVF index. Pure
    numpy; empty clusters keep their previous centroid."""
    v = _normalize(vecs)
    rng = np.random.default_rng(seed)
    cent = v[rng.choice(len(v), size=min(k, len(v)), replace=False)]
    for _ in range(iters):
        assign = (v @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            members = v[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 1e-12:
                    cent[c] = m / n
    return cent


def build_ivf_index(
    ds: rd.Dataset,
    index_dir: str,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_lists: int = 16,
    train_sample: int = 10_000,
    seed: int = 42,
) -> dict:
    """IVF index: train a coarse quantizer on a bounded sample (driver-
    side k-means over ≤``train_sample`` vectors — at 10^12 scale the
    sample, not the corpus, bounds driver memory), then one assignment
    pass writes hive ``list_id=`` partitions. Queries probe only their
    ``nprobe`` nearest lists (:func:`ivf_topk`)."""
    sample = ds.limit(train_sample).to_pandas()
    train = np.stack(sample[vec_col].to_numpy()).astype(np.float64)
    cent = _kmeans(train, n_lists, seed=seed)
    cref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    id_col: batch.column(id_col),
                    vec_col: batch.column(vec_col),
                    "list_id": pa.array([], pa.int64()),
                }
            )
        c = ray.get(cref)
        m = _vec_matrix(batch.column(vec_col))
        list_id = pa.array(
            (_normalize(m) @ c.T).argmax(axis=1).astype(np.int64)
        )
        return pa.table(
            {
                id_col: batch.column(id_col),
                vec_col: _plain_vec_column(batch.column(vec_col), m),
                "list_id": list_id,
            }
        )

    vec_dir = os.path.join(index_dir, "vectors")
    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        vec_dir, partition_cols=["list_id"]
    )
    os.makedirs(index_dir, exist_ok=True)
    np.save(os.path.join(index_dir, "centroids.npy"), cent)
    meta = {
        "n_lists": int(len(cent)), "seed": seed, "dim": int(cent.shape[1]),
        "total_rows": _count_partition_rows(vec_dir),
    }
    with open(os.path.join(index_dir, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def ivf_topk(
    index_dir: str,
    queries: np.ndarray,
    query_ids: list[int],
    *,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nprobe: int = 4,
) -> tuple[pd.DataFrame, dict]:
    """Approximate cosine top-k probing only each query's ``nprobe``
    nearest inverted lists. Returns (result_frame, io_stats) like
    :func:`lsh_topk_indexed`."""
    with open(os.path.join(index_dir, "meta.json")) as fh:
        meta = json.load(fh)
    cent = np.load(os.path.join(index_dir, "centroids.npy"))
    qn = _normalize(np.asarray(queries))
    sims = qn @ cent.T                       # (n_q, n_lists)
    nprobe = min(nprobe, sims.shape[1])
    # stable sort (not argpartition): similarity ties probe the LOWER
    # list index — deterministic and SQL-mirrorable (ORDER BY sim DESC,
    # list ASC); n_lists is small, the sort cost is noise
    probe = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
    allow = np.zeros((len(qn), len(cent)), dtype=bool)
    allow[np.arange(len(qn))[:, None], probe] = True
    vec_dir = os.path.join(index_dir, "vectors")
    dirs = _partition_dirs(vec_dir, "list_id")
    wanted = np.flatnonzero(allow.any(axis=0))
    files = _probed_files(dirs, wanted)
    n_total = int(meta.get("total_rows", -1))
    if n_total < 0:  # pre-metadata index layout
        n_total = _count_partition_rows(vec_dir)
    if not files:
        return (
            _finalize_topk(pd.DataFrame(), k, id_col),
            {"probed_lists": 0, "scanned_rows": 0, "total_rows": n_total},
        )
    cand, n_scanned = _scan_pruned_topk(
        files, qn, query_ids, allow, (_assign_ivf, cent),
        k=k, vec_col=vec_col, id_col=id_col,
    )
    return (
        _finalize_topk(cand, k, id_col),
        {
            "probed_lists": int(len(wanted)),
            "scanned_rows": n_scanned,
            "total_rows": n_total,
        },
    )
