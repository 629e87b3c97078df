"""Incremental index updates: add documents and delete (tombstone)
documents on a published build — the analogue of the reference's
update mode (``deletionLiteral`` flips a record to a delete op,
reference main/src/main/java/hbz/limetrans/ElasticsearchIndexer.java:
80-86; update configs Limetrans.java:394-422).

Semantics (last-write-wins, like ES bulk):

- :func:`add_documents` ingests a new webtext batch INTO an existing
  build: new pages get doc ids starting at the next empty bucket
  boundary (so new posting chunks never overlap existing chunk
  doc-ranges — the pruned scorer's bucket map stays valid); pages whose
  canonical url already exists win over the old copy (the old doc id is
  tombstoned). Corpus stats (n_docs, avgdl) and term_stats merge
  additively.
- :func:`delete_documents` appends doc ids (or urls) to the build's
  tombstone set; the engine filters tombstoned docs out of every
  result.

BM25 safety under stale statistics: existing segments' block-max
impacts were computed with the OLD avgdl. ``impact`` is increasing in
avgdl, and ``impact(a_new)/impact(a_old) ≤ a_new/a_old`` for tf ≥ 1,
so the engine scales stale chunk bounds by ``max(1, avgdl_now /
chunk_avgdl)`` (each segment row records the avgdl it was encoded
with) — pruning stays provably score-safe. Scores themselves always
use the CURRENT stats, matching the single-process oracle over the
merged corpus exactly.

Deleted docs still count in df/avgdl until a full rebuild compacts
them — the same staleness window Lucene has between delete and merge.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..functions.textstats import stable_hash64
from ..stages.indexing import ExtractTokenizeStage, InvertStage, KeyStage, MergeShardGroup
from ..state import manifest as mf

TOMBSTONE_FILE = "tombstones.json"


def compact_index(index_root: str, *, build_id: str | None = None, retain: int = 2) -> dict:
    """Physically drop tombstoned documents into a NEW build (the
    Lucene-merge / reference full-rebuild analogue): docs and posting
    chunks are rewritten without deleted ids, corpus and term statistics
    are recomputed exactly (fresh n_docs/avgdl/df — the staleness window
    closes), block maxima are re-derived under the fresh avgdl, the
    tombstone set empties, and CURRENT flips atomically.

    Segment rewriting is one independent task per segment file (a pure
    filter — no shuffle), submitted as raw Ray tasks: per-file in/out
    with mixed on-disk schemas is the one shape the Dataset API doesn't
    express cleanly. Doc ids are preserved (no remap), so external
    references stay valid.
    """
    import shutil

    src_id = build_id or mf.current_build(index_root)
    src = mf.build_dir(index_root, src_id)
    with open(os.path.join(src, "stats.json")) as fh:
        stats = json.load(fh)
    deleted = _load_tombstones(src)
    dst_id = f"{src_id}-compact{int(stats.get('compactions', 0)) + 1}"
    dst = mf.build_dir(index_root, dst_id)
    _ = shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(os.path.join(dst, "segments"), exist_ok=True)
    os.makedirs(os.path.join(dst, "docs"), exist_ok=True)

    # ---- docs minus deleted; fresh corpus stats
    docs = pq.read_table(os.path.join(src, "docs"))
    if deleted:
        keep = ~np.isin(docs.column("doc_id").to_numpy(), np.fromiter(deleted, dtype=np.int64))
        docs = docs.filter(pa.array(keep))
    pq.write_table(docs, os.path.join(dst, "docs", "docs.parquet"))
    n_docs = docs.num_rows
    if n_docs == 0:
        raise ValueError("refusing to compact to an empty index")
    doclen_col = docs.column("doclen").to_numpy()
    max_doc = int(docs.column("doc_id").to_numpy().max())
    total_terms = int(doclen_col.sum())
    avgdl = total_terms / n_docs
    doclens = np.zeros(max_doc + 1, dtype=np.int64)
    doclens[docs.column("doc_id").to_numpy()] = doclen_col
    doclens_ref = ray.put(doclens)
    deleted_arr = np.fromiter(deleted, dtype=np.int64) if deleted else np.zeros(0, np.int64)
    deleted_ref = ray.put(np.sort(deleted_arr))
    block_size = int(stats.get("config", {}).get("block_size", 128))
    base_avgdl = float(stats.get("base_avgdl", stats["avgdl"]))

    seg_files = []
    for root_, _d, fs in os.walk(os.path.join(src, "segments")):
        seg_files.extend(os.path.join(root_, f) for f in fs if f.endswith(".parquet"))

    @ray.remote
    def compact_file(path: str, out_path: str) -> tuple[int, int]:
        from limetrans_ray.functions import codec as _codec
        from limetrans_ray.state import bm25 as _bm25

        dele = ray.get(deleted_ref)
        dls = ray.get(doclens_ref)
        tbl = pq.read_table(path)
        has_pos = "pos_enc" in tbl.schema.names
        has_codec = "ids_codec" in tbl.schema.names
        rows = {c: [] for c in tbl.schema.names}
        rows.setdefault("enc_avgdl", [])
        kept_rows = 0
        for i in range(tbl.num_rows):
            if has_codec and tbl.column("ids_codec")[i].as_py() == "for":
                # FOR-packed base rows decode via their own codec;
                # compaction re-encodes varint and normalizes the tag
                ids = _codec.for_decode_chunk_ids(
                    tbl.column("ids_enc")[i].as_py(),
                    int(tbl.column("first_doc")[i].as_py()),
                    int(tbl.column("df")[i].as_py()),
                    block_size,
                )
                tfs = _codec.varint_decode(
                    tbl.column("tfs_enc")[i].as_py()
                ).astype(np.int64)
            else:
                ids, tfs = _codec.decode_chunk(
                    tbl.column("ids_enc")[i].as_py(), tbl.column("tfs_enc")[i].as_py()
                )
            pos = None
            if has_pos and tbl.column("pos_enc")[i].as_py() is not None:
                pdeltas = _codec.varint_decode(tbl.column("pos_enc")[i].as_py()).astype(np.int64)
                vst = np.zeros(len(tfs), dtype=np.int64)
                np.cumsum(tfs[:-1], out=vst[1:])
                pos = _codec.segmented_delta_decode(pdeltas, vst)
            keep = ~np.isin(ids, dele) if len(dele) else np.ones(len(ids), bool)
            if not keep.any():
                continue
            ids2, tfs2 = ids[keep], tfs[keep]
            impacts = _bm25.impact(tfs2, dls[ids2], avgdl)
            chunk = _codec.encode_chunk(ids2, tfs2, impacts, block_size)
            if pos is not None:
                starts = np.zeros(len(tfs), dtype=np.int64)
                np.cumsum(tfs[:-1], out=starts[1:])
                pos_parts = [
                    pos[starts[j] : starts[j] + tfs[j]] for j in np.flatnonzero(keep)
                ]
                pos2 = np.concatenate(pos_parts) if pos_parts else np.zeros(0, np.int64)
                pst = np.zeros(len(tfs2), dtype=np.int64)
                np.cumsum(tfs2[:-1], out=pst[1:])
                rows_pos = _codec.varint_encode(
                    _codec.segmented_delta_encode(pos2, pst)
                )
            else:
                rows_pos = None
            kept_rows += 1
            for c in tbl.schema.names:
                if c == "ids_enc":
                    rows[c].append(chunk["ids_enc"])
                elif c == "tfs_enc":
                    rows[c].append(chunk["tfs_enc"])
                elif c == "pos_enc":
                    rows[c].append(rows_pos)
                elif c == "df":
                    rows[c].append(chunk["df"])
                elif c == "cf":
                    rows[c].append(chunk["cf"])
                elif c == "first_doc":
                    rows[c].append(chunk["first_doc"])
                elif c == "last_doc":
                    rows[c].append(chunk["last_doc"])
                elif c == "block_last":
                    rows[c].append(chunk["block_last"].tolist())
                elif c == "block_max":
                    rows[c].append(chunk["block_max"].tolist())
                elif c == "ids_boff":
                    rows[c].append(chunk["ids_boff"].tolist())
                elif c == "tfs_boff":
                    rows[c].append(chunk["tfs_boff"].tolist())
                elif c == "enc_avgdl":
                    rows[c].append(avgdl)
                elif c == "ids_codec":
                    rows[c].append("varint")  # compaction re-encodes varint
                else:
                    rows[c].append(tbl.column(c)[i].as_py())
        if "enc_avgdl" not in tbl.schema.names:
            rows["enc_avgdl"] = [avgdl] * kept_rows
        if kept_rows:
            out_cols = dict(rows)
            out = pa.table(out_cols)
            pq.write_table(out, out_path)
        return kept_rows, tbl.num_rows

    futures = [
        compact_file.remote(f, os.path.join(dst, "segments", f"seg-{i:05d}.parquet"))
        for i, f in enumerate(sorted(seg_files))
    ]
    results = ray.get(futures)

    # ---- fresh term stats from the rewritten chunks
    ts_rows = []
    for root_, _d, fs in os.walk(os.path.join(dst, "segments")):
        for f in fs:
            if f.endswith(".parquet"):
                ts_rows.append(
                    pq.read_table(os.path.join(root_, f), columns=["term", "df", "cf"]).to_pandas()
                )
    ts = (
        pd.concat(ts_rows).groupby("term", as_index=False).agg(df=("df", "sum"), cf=("cf", "sum"))
        if ts_rows
        else pd.DataFrame({"term": [], "df": [], "cf": []})
    )
    os.makedirs(os.path.join(dst, "term_stats"), exist_ok=True)
    pq.write_table(
        pa.Table.from_pandas(ts, preserve_index=False),
        os.path.join(dst, "term_stats", "term_stats.parquet"),
    )

    new_stats = dict(stats)
    # compacted segment files are rewritten flat (no bslice dirs) — drop
    # the doc-range layout key so shard preloads don't prune wrongly
    new_stats.pop("segment_slice_bounds", None)
    new_stats.update(
        {
            "n_docs": n_docs,
            "max_doc": max_doc,
            "total_terms": total_terms,
            "avgdl": avgdl,
            "base_avgdl": avgdl,
            "build_id": dst_id,
            "compactions": int(stats.get("compactions", 0)) + 1,
            "deltas": 0,
        }
    )
    with open(os.path.join(dst, "stats.json"), "w") as fh:
        json.dump(new_stats, fh, indent=1)
    mf.write_stage_manifest(
        dst,
        "compact",
        input_fingerprint=f"compact-of-{src_id}",
        rows_out=n_docs,
        partitions=mf.partition_lineage(os.path.join(dst, "segments")),
        metrics={
            "dropped_docs": int(len(deleted)),
            "chunks_before": int(sum(r[1] for r in results)),
            "chunks_after": int(sum(r[0] for r in results)),
        },
    )
    mf.publish_current(index_root, dst_id, retain=retain)
    return new_stats


def _load_tombstones(bdir: str) -> set[int]:
    path = os.path.join(bdir, TOMBSTONE_FILE)
    if not os.path.exists(path):
        return set()
    with open(path) as fh:
        return set(json.load(fh)["doc_ids"])


def _write_tombstones(bdir: str, doc_ids: set[int]) -> None:
    path = os.path.join(bdir, TOMBSTONE_FILE)
    with open(path + ".tmp", "w") as fh:
        json.dump({"doc_ids": sorted(doc_ids), "updated_at": time.time()}, fh)
    os.replace(path + ".tmp", path)


def delete_documents(
    index_root: str,
    *,
    doc_ids: list[int] | None = None,
    urls: list[str] | None = None,
    build_id: str | None = None,
) -> int:
    """Tombstone documents by doc id or by url. Returns the number of
    newly tombstoned ids."""
    build_id = build_id or mf.current_build(index_root)
    bdir = mf.build_dir(index_root, build_id)
    ids = set(int(i) for i in (doc_ids or []))
    if urls:
        docs = pq.read_table(os.path.join(bdir, "docs"), columns=["doc_id", "url", "canon"])
        want = set(urls)
        for did, url, canon in zip(
            docs.column("doc_id").to_pylist(),
            docs.column("url").to_pylist(),
            docs.column("canon").to_pylist(),
        ):
            if url in want or canon in want:
                ids.add(int(did))
    existing = _load_tombstones(bdir)
    new = ids - existing
    if new:
        _write_tombstones(bdir, existing | new)
    return len(new)


def add_documents(
    input_paths: list[str] | str,
    index_root: str,
    *,
    build_id: str | None = None,
    batch_size: int = 2048,
    invert_batch_size: int = 16384,
) -> dict:
    """Incrementally ingest a webtext parquet batch into an existing
    build. Returns the updated stats dict."""
    build_id = build_id or mf.current_build(index_root)
    bdir = mf.build_dir(index_root, build_id)
    with open(os.path.join(bdir, "stats.json")) as fh:
        stats = json.load(fh)
    from .. import ANALYZER_VERSION

    if int(stats.get("analyzer_version", 0)) != ANALYZER_VERSION:
        raise ValueError(
            f"base build used analyzer v{stats.get('analyzer_version')}, "
            f"code is v{ANALYZER_VERSION}: an incremental delta would mix "
            "tokenizations — rebuild the index instead"
        )
    w = int(stats["bucket_width"])
    block_size = int(stats.get("config", {}).get("block_size", 128))
    n_shards = int(stats.get("config", {}).get("n_term_shards", 256))

    if isinstance(input_paths, str):
        input_paths = [input_paths]
    files: list[str] = []
    for p in input_paths:
        if os.path.isdir(p):
            files.extend(
                os.path.join(p, f) for f in sorted(os.listdir(p)) if f.endswith(".parquet")
            )
        else:
            files.append(p)

    # ---- dedup of the delta batch itself + against the existing corpus
    keys_ds = rd.read_parquet(files, columns=["url", "warc_ts"]).map_batches(
        KeyStage(), batch_format="pyarrow", batch_size=65536
    )
    keys_tbl = pa.concat_tables([ray.get(r) for r in keys_ds.materialize().to_arrow_refs()])
    if keys_tbl.num_rows == 0 or "doc_key" not in keys_tbl.schema.names:
        return stats
    from ..stages.indexing import compute_winners

    winners = compute_winners(keys_tbl)

    old_docs = pq.read_table(
        os.path.join(bdir, "docs"), columns=["doc_id", "canon"]
    )
    old_keys = np.fromiter(
        (stable_hash64(c) for c in old_docs.column("canon").to_pylist()),
        dtype=np.uint64,
        count=old_docs.num_rows,
    )
    old_ids = old_docs.column("doc_id").to_numpy()
    order = np.argsort(old_keys)
    old_keys_sorted, old_ids_sorted = old_keys[order], old_ids[order]

    # last-write-wins: a delta page whose canonical already exists
    # replaces the old copy → tombstone the old doc id
    pos = np.searchsorted(old_keys_sorted, winners["doc_key"])
    pos_c = np.clip(pos, 0, max(0, len(old_keys_sorted) - 1))
    clash = (
        (old_keys_sorted[pos_c] == winners["doc_key"])
        if len(old_keys_sorted)
        else np.zeros(len(winners["doc_key"]), dtype=bool)
    )
    replaced_old_ids = old_ids_sorted[pos_c[clash]] if clash.any() else np.array([], dtype=np.int64)

    # new ids start at the next empty bucket boundary → chunk ranges of
    # the delta never overlap existing chunks
    base = ((int(stats["max_doc"]) // w) + 1) * w
    winners = dict(winners)
    winners["doc_id"] = winners["doc_id"] + base
    winners_ref = ray.put(winners)
    n_new = len(winners["doc_id"])

    # ---- extract+tokenize the delta → append a new fwd partition
    delta_dir = os.path.join(bdir, "fwd", f"delta-{int(stats.get('deltas', 0)):04d}")
    ds = rd.read_parquet(files, columns=["url", "warc_ts", "html", "text", "lang"])
    fwd = ds.map_batches(
        ExtractTokenizeStage(winners_ref), batch_format="pyarrow", batch_size=batch_size
    )
    if os.path.isdir(delta_dir):
        import shutil

        shutil.rmtree(delta_dir)
    fwd.write_parquet(delta_dir)

    # ---- merged doc metadata + stats
    delta_meta = pq.read_table(delta_dir, columns=["doc_id", "url", "canon", "lang", "doclen"])
    docs_dir = os.path.join(bdir, "docs")
    pq.write_table(delta_meta, os.path.join(docs_dir, f"docs-delta-{stats.get('deltas', 0):04d}.parquet"))
    delta_terms = int(np.sum(delta_meta.column("doclen").to_numpy()))
    stats["n_docs"] = int(stats["n_docs"]) + n_new
    stats["max_doc"] = int(delta_meta.column("doc_id").to_numpy().max()) if n_new else stats["max_doc"]
    stats["total_terms"] = int(stats["total_terms"]) + delta_terms
    stats["avgdl"] = stats["total_terms"] / stats["n_docs"]
    stats["deltas"] = int(stats.get("deltas", 0)) + 1

    # ---- invert+merge the delta → append segment rows (tagged with the
    # avgdl they were encoded under, for safe pruning bounds)
    doclens = np.zeros(stats["max_doc"] + 1, dtype=np.int64)
    all_docs = pq.read_table(docs_dir, columns=["doc_id", "doclen"])
    doclens[all_docs.column("doc_id").to_numpy()] = all_docs.column("doclen").to_numpy()
    doclens_ref = ray.put(doclens)
    partials = rd.read_parquet(delta_dir, columns=["doc_id", "terms", "tfs", "pos"]).map_batches(
        InvertStage(w, n_shards), batch_format="pyarrow", batch_size=invert_batch_size
    )
    # delta batches are incremental-update-sized: one doclen group
    # (a 100 TB base build range-shards this — see build_index stage 3)
    merger = MergeShardGroup(
        {0: doclens_ref}, stats["avgdl"], block_size, bg_doc_base=np.array([0]),
        bucket_width=w,
    )

    def merge_shard_group(group: pa.Table) -> pa.Table:
        return merger(group)

    segs = partials.groupby("shard").map_groups(merge_shard_group, batch_format="pyarrow")
    seg_dir = os.path.join(bdir, "segments")
    delta_seg_dir = os.path.join(seg_dir, f"delta-{stats['deltas'] - 1:04d}")
    segs.write_parquet(delta_seg_dir)
    # tag every segment row with its encode-time avgdl (base rows without
    # the column default to the build avgdl at engine load)
    for f in os.listdir(delta_seg_dir):
        if f.endswith(".parquet"):
            t = pq.read_table(os.path.join(delta_seg_dir, f))
            if "enc_avgdl" not in t.schema.names:
                t = t.append_column(
                    "enc_avgdl", pa.array(np.full(t.num_rows, stats["avgdl"]))
                )
                pq.write_table(t, os.path.join(delta_seg_dir, f))

    # ---- merged term stats (additive df/cf)
    ts_dir = os.path.join(bdir, "term_stats")
    base_ts = pq.read_table(ts_dir).to_pandas()
    delta_ts = (
        pq.read_table(delta_seg_dir, columns=["term", "df", "cf"])
        .to_pandas()
        .groupby("term", as_index=False)
        .agg(df=("df", "sum"), cf=("cf", "sum"))
    )
    merged = (
        pd.concat([base_ts, delta_ts])
        .groupby("term", as_index=False)
        .agg(df=("df", "sum"), cf=("cf", "sum"))
    )
    pq.write_table(
        pa.Table.from_pandas(merged, preserve_index=False),
        os.path.join(ts_dir, "term_stats.parquet"),
    )
    for f in os.listdir(ts_dir):
        if f.endswith(".parquet") and f != "term_stats.parquet":
            os.remove(os.path.join(ts_dir, f))

    # ---- stats + tombstones for replaced docs, manifest
    stats_path = os.path.join(bdir, "stats.json")
    with open(stats_path + ".tmp", "w") as fh:
        json.dump(stats, fh, indent=1)
    os.replace(stats_path + ".tmp", stats_path)
    if len(replaced_old_ids):
        existing = _load_tombstones(bdir)
        _write_tombstones(bdir, existing | set(int(i) for i in replaced_old_ids))
    mf.write_stage_manifest(
        bdir,
        f"delta-{stats['deltas'] - 1:04d}",
        input_fingerprint=mf.fingerprint_paths(files),
        rows_out=n_new,
        partitions=mf.partition_lineage(delta_dir) + mf.partition_lineage(delta_seg_dir),
        metrics={"n_new": n_new, "replaced": int(len(replaced_old_ids))},
    )
    return stats
