"""End-to-end inverted-index build pipeline (Ray Data).

The analogue of the reference's production run (``hbz.limetrans.Main`` →
``Limetrans.process()``, reference main/src/main/java/hbz/limetrans/
Limetrans.java:431-501) with the Elasticsearch sink replaced by our own
SPIMI posting-list builder (SURVEY.md §7):

    read_parquet (url, warc_ts only)  → KeyStage            [~2% of bytes]
      → dedup winners + dense doc ids (key-only exchange)   [shuffle #1*]
    read_parquet (full columns)
      → map_batches(ExtractTokenizeStage)                   [shuffle-free]
      → write fwd/ parquet                                  [checkpoint]
    fwd → corpus stats (n_docs, avgdl) + docs/ parquet
    fwd → map_batches(InvertStage)                          [SPIMI partials]
      → groupby(term, bucket).map_groups(MergeEncodeGroup)  [shuffle #2]
      → write segments/ parquet
    segments meta → term_stats (df/cf per term)
    publish: manifests + atomic CURRENT pointer flip        [alias switch]

Default execution fuses the two fwd-facing passes
(``IndexBuildConfig.fuse_invert``): extract→invert run as ONE
streaming pipeline (fwd/ side-written per batch as the checkpoint,
never re-read), valid because ``max_doc`` — and with it the whole
merge layout — is fixed by the winner table before extraction. The
diagram above remains the semantic spec and the classic path
(``fwd_partition_groups > 1``, ``merge_exchange="groupby"``, resume
from an existing fwd/).

(*) The dedup/rank exchange intentionally moves ONLY the key columns —
canonical-url hash, timestamp, url hash (~40 B/row) — never document
text, then broadcasts the winner table into the single heavy pass. An
earlier design that co-partitioned full rows by hash spent most of its
wall time sorting text through the object store; keying the exchange on
2% of the bytes removed that bottleneck (see BENCH notes).

Every stage records a manifest (input fingerprint + per-partition
lineage + metrics) and a done marker; re-running ``build_index`` on the
same input resumes after the last completed stage. The build is
parallelism-invariant: doc ids derive from (hash(canonical_url), canon)
order, chunk boundaries from data-dependent bucket widths — never from
task/batch boundaries — so builds at different CPU counts produce
logically identical indexes (tests/test_determinism.py, bench --scaling
result-identity check).

Scale notes (100 TB / 10^12 docs): ``bucket_width`` bounds the largest
posting-merge group (hot-term skew); metadata aggregates switch from
driver-side pandas to distributed groupbys past ``SMALL_AGG_BYTES``;
past the same threshold the winner table stays doc_key-range SHARDED in
the object store (ShardedWinners — never concatenated on the driver,
never one broadcast object) and ExtractTokenizeStage joins each batch
to its key-range shards; ``fwd/`` on disk is the classic SPIMI spill
and what makes the build resumable without re-tokenizing.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import asdict, dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd
from ray.data.aggregate import Max, Sum

from .. import ANALYZER_VERSION, FORMAT_VERSION
from ..functions import codec
from ..functions.analyzer import (
    BatchTokenizer,
    simple_terms,
    tokenize_fields,
    tokenize_fields_simple,
)
from ..stages.indexing import (
    ExtractTokenizeStage,
    InvertStage,
    KeyStage,
    MergeShardGroup,
    compute_winners,
    compute_winners_distributed,
)
from ..state import manifest as mf


@dataclass
class IndexBuildConfig:
    n_term_shards: int = 256        # term-hash merge groups (also the segment
                                    # layout fan-out): bounds merge parallelism
    block_size: int = codec.BLOCK_SIZE
    bucket_width: int | None = None  # posting-chunk doc-range; None → from corpus size
    batch_size: int = 2048          # rows per extract/tokenize batch
    invert_batch_size: int | None = None  # rows per SPIMI invert batch;
                                    # None → adaptive (see
                                    # resolved_invert_batch_size): the batch
                                    # size IS the map-task granularity, so it
                                    # balances two pressures — large enough to
                                    # amortize per-(term,bucket) cell overhead
                                    # (doc ids are hash-ordered, every batch
                                    # spans most buckets), small enough that
                                    # the invert stage runs ≥4 task waves per
                                    # CPU (45 monolithic 7-s tasks over 32
                                    # CPUs = 1.3 ragged waves and ~2× the
                                    # wall; measured in BASELINE.md §4c)
    fwd_partition_groups: int = 1   # >1: the extract+tokenize pass runs as G
                                    # input-file groups, each with its own
                                    # fwd/group-* dir, manifest and done
                                    # marker — a killed build resumes at the
                                    # first incomplete group (per-partition
                                    # checkpointing; costs one barrier per
                                    # group, so bench keeps 1 and a 100 TB
                                    # run would use input-shard-sized groups)
    actor_pool_size: int | tuple | None = None  # concurrency for the
                                    # extract+tokenize stage: None → stateless
                                    # tasks; N or (min,max) → actor pool
    retain: int = 2                 # previous builds kept after publish
    winners_mode: str = "auto"      # "driver" | "distributed" | "auto":
                                    # dedup/rank on the driver (one lexsort —
                                    # cheapest while the ~24 B/row key table
                                    # fits one machine) vs the key-range
                                    # groupby form; auto switches on estimated
                                    # key bytes (see _winner_keys_too_big)
    winner_partitions: int = 64     # key-range partitions for the
                                    # distributed winner computation
                                    # (data-dependent split of the doc_key
                                    # space — never parallelism-dependent)
    postings_codec: str = "varint"  # doc-id gap encoding of the final
                                    # segments: "varint" (LEB128) or
                                    # "for" (frame-of-reference
                                    # bit-packing — the PForDelta-family
                                    # codec the north rule names;
                                    # ~2-4x smaller id streams on dense
                                    # postings, branch-free block decode)
    merge_bucket_groups: int | None = None  # doc-range groups for the posting
                                    # merge: each merge task holds ONLY its
                                    # range's doclen slice (never the dense
                                    # max_doc+1 array). None → from corpus
                                    # size at ~1 GiB of doclens per slice
                                    # (1 at sandbox scale, ~8000 at 10^12)
    merge_exchange: str = "direct"  # posting-exchange transport:
                                    # "direct" — raw-Ray object-store
                                    # exchange (split tasks hash-partition
                                    # the encoded partials, one merge task
                                    # per partition fetches its slices and
                                    # writes its segment files; the ONE
                                    # deliberate drop below the Dataset
                                    # API, justified by measurement: Ray's
                                    # sort-based groupby barrier cost 12 s
                                    # of wall on 3 core-seconds of compute
                                    # at the 600k tier — see BASELINE.md);
                                    # "groupby" — the Dataset
                                    # groupby().map_groups form (identical
                                    # output; the semantic spec and
                                    # conformance fallback)
    fuse_invert: str = "auto"       # fuse extract+tokenize with the SPIMI
                                    # invert into ONE streaming pipeline
                                    # (fwd/ is side-written per batch as the
                                    # checkpoint instead of written+re-read):
                                    # removes the fwd re-read and the stage
                                    # barrier — possible because bucket_width
                                    # and the slice layout are pure functions
                                    # of max_doc, which the winner table
                                    # fixes BEFORE extraction (doc ids are
                                    # dense ranks). "auto" fuses when
                                    # fwd_partition_groups == 1 and
                                    # merge_exchange == "direct" (groups > 1
                                    # exists precisely to bound the partials
                                    # window, and the groupby form needs the
                                    # Dataset); "fused" | "classic" force
    doclen_slice_mode: str = "auto" # construction of the per-bucket-group
                                    # doclen slices the merge broadcasts:
                                    # "driver" — one columnar read + dense
                                    # array on the driver (cheapest while
                                    # (max_doc+1)*8 fits comfortably);
                                    # "distributed" — split/combine Ray
                                    # tasks over docs/ blocks, the driver
                                    # holds only n_bg ObjectRefs (the
                                    # 10^11-doc path: a dense array would
                                    # be 0.8-8 TB of driver RAM); "auto"
                                    # switches on SMALL_AGG_BYTES

    def resolved_invert_batch_size(self, n_rows: int, n_cpus: int) -> int:
        """Adaptive SPIMI batch size: ~4 invert tasks per CPU for wave
        packing, clamped to [4096, 12288] (below ~4k the per-cell
        overhead dominates; above ~12k one task outlasts the wave —
        both measured, BASELINE.md §4c / §5)."""
        if self.invert_batch_size:
            return int(self.invert_batch_size)
        return min(12288, max(4096, n_rows // max(1, 4 * n_cpus)))

    def resolved_merge_bucket_groups(self, max_doc: int) -> int:
        if self.merge_bucket_groups:
            return int(self.merge_bucket_groups)
        return max(1, -(-(max_doc + 1) * 8 // DOCLEN_SLICE_BYTES))

    def resolved_bucket_width(self, max_doc: int) -> int:
        if self.bucket_width:
            return int(self.bucket_width)
        # data-dependent (never parallelism-dependent): ~64 buckets over
        # the id space, power of two, at least 4096 docs per bucket.
        return 1 << max(12, max(1, max_doc).bit_length() - 6)


def _clean_dir(path: str) -> None:
    if os.path.isdir(path):
        shutil.rmtree(path)


# Metadata aggregates far below this size run single-threaded on the
# driver: a distributed all-to-all barrier costs seconds of fixed
# overhead and buys nothing for kilobytes of input. Above it, the same
# aggregation runs as a Ray groupby (the 100 TB path).
SMALL_AGG_BYTES = 512 << 20

# Target bytes of doclen state per merge-task / serving-shard slice.
DOCLEN_SLICE_BYTES = 1 << 30


def _dir_bytes(directory: str) -> int:
    size = 0
    for root, _dirs, fs in os.walk(directory):
        size += sum(os.path.getsize(os.path.join(root, f)) for f in fs)
    return size


def _projected_dir_bytes(directory: str, columns: list[str]) -> int:
    """Estimated on-disk bytes of just ``columns`` under ``directory``:
    total dir bytes scaled by the projected columns' share of compressed
    bytes in a spread sample of parquet footers (O(1) footer reads at
    any directory size). The small-aggregate threshold must see what
    the aggregation actually READS — posting-blob / text columns
    dominate segment and fwd files, so gating on whole-file bytes sent
    10k-row term aggregates down the distributed path (a 2000-file Ray
    job + all-to-all barrier for a sub-second pandas groupby)."""
    files: list[str] = []
    total = 0
    for root, _dirs, fs in os.walk(directory):
        for f in fs:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                files.append(p)
                total += os.path.getsize(p)
    if not files:
        return 0
    sample = files[:: max(1, len(files) // 8)][:8]
    proj = whole = 0
    for p in sample:
        md = pq.ParquetFile(p).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                whole += col.total_compressed_size
                if col.path_in_schema.split(".")[0] in columns:
                    proj += col.total_compressed_size
    if whole == 0:
        return total
    return int(total * (proj / whole))


def _fwd_row_digest(row: dict) -> bytes:
    """Deterministic content digest that picks ONE representative among
    fwd/ rows sharing a doc_id (min digest wins — data-dependent, never
    scheduling-dependent)."""
    import hashlib

    h = hashlib.blake2b(digest_size=16)
    h.update(
        repr((row["doclen"], row["url"], row["canon"], row["lang"],
              row["terms"], row["tfs"], row["pos"])).encode()
    )
    return h.digest()


def _dedupe_fwd_doc_ids(fwd_dir: str) -> int:
    """Collapse fwd/ rows that share a doc_id.

    Genuine crawl duplicates — the same url AND warc_ts as distinct
    input rows — all satisfy the winner key (doc_key, win_ts, url_hash),
    so each copy reaches fwd/ with the SAME doc_id, which would inflate
    n_docs/avgdl/df and duplicate postings (the ES reference collapses
    such rows via ``_id``). The repair is fully distributed — it holds
    even when MOST rows are crawl duplicates (the very input this path
    exists for): repeated ids come from a pruned doc_id aggregation,
    the duplicated rows go through a ``groupby("doc_id").map_groups``
    keep-min-digest (each group is one doc_id's few copies; no
    duplicated row ever visits the driver), and fwd/ is rewritten as
    the union of the clean stream and the chosen representatives.
    Returns the number of rows dropped.
    """

    def _dup_ids_pandas(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["doc_id"].value_counts()
        vc = vc[vc > 1]
        return pd.DataFrame(
            {"doc_id": vc.index.to_numpy(), "n": vc.to_numpy()}
        )

    def _dup_ids_ray(ds: rd.Dataset):  # pragma: no cover — >SMALL_AGG_BYTES path
        from ray.data.aggregate import Count

        cnt = ds.groupby("doc_id").aggregate(Count(alias_name="n"))
        return cnt.filter(lambda r: r["n"] > 1).to_pandas()[["doc_id", "n"]]

    dups = _small_groupby(fwd_dir, ["doc_id"], _dup_ids_pandas, _dup_ids_ray)
    if not isinstance(dups, pd.DataFrame):  # pragma: no cover
        dups = dups.to_pandas()
    dup_ids = np.sort(dups["doc_id"].to_numpy().astype(np.int64))
    if len(dup_ids) == 0:
        return 0
    n_dup_rows = int(dups["n"].sum())
    dup_ref = ray.put(dup_ids)

    def only_dups(batch: pa.Table) -> pa.Table:
        d = ray.get(dup_ref)
        return batch.filter(pa.array(np.isin(batch.column("doc_id").to_numpy(), d)))

    def drop_dups(batch: pa.Table) -> pa.Table:
        d = ray.get(dup_ref)
        return batch.filter(pa.array(~np.isin(batch.column("doc_id").to_numpy(), d)))

    def keep_min_digest(group: pa.Table) -> pa.Table:
        rows = group.to_pylist()
        best = min(range(len(rows)), key=lambda i: _fwd_row_digest(rows[i]))
        return group.slice(best, 1)

    chosen = (
        rd.read_parquet(fwd_dir)
        .map_batches(only_dups, batch_format="pyarrow")
        .groupby("doc_id")
        .map_groups(keep_min_digest, batch_format="pyarrow")
    )

    tmp = fwd_dir + ".dedup"
    _clean_dir(tmp)
    rd.read_parquet(fwd_dir).map_batches(
        drop_dups, batch_format="pyarrow"
    ).union(chosen).write_parquet(tmp)
    _clean_dir(fwd_dir)
    os.replace(tmp, fwd_dir)
    return int(n_dup_rows - len(dup_ids))


@ray.remote
def _split_partials(tbl: pa.Table, n_bg: int, n_ms: int, npid: int) -> list:
    """Hash-partition one invert block by merge-group id: gid =
    ((shard · n_bg + bgroup) · n_ms + mslice), pid = gid % npid. One
    stable sort + npid zero-copy slices; rows carry gid for the merge
    task's per-group segmentation."""
    shard = tbl.column("shard").to_numpy().astype(np.int64)
    bg = tbl.column("bgroup").to_numpy().astype(np.int64)
    ms = tbl.column("mslice").to_numpy().astype(np.int64)
    gid = (shard * n_bg + bg) * n_ms + ms
    pid = gid % npid
    order = np.argsort(pid, kind="stable")
    t2 = tbl.take(pa.array(order)).append_column("gid", pa.array(gid[order]))
    bounds = np.searchsorted(pid[order], np.arange(npid + 1))
    return [
        t2.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
        for i in range(npid)
    ]


class FwdSideWriteStage(ExtractTokenizeStage):
    """Extract+tokenize that persists each output batch to ``fwd/`` as
    its own parquet file (the SPIMI spill / resume checkpoint) before
    handing the rows to the downstream invert operator — the fused
    form of the fwd stage (``IndexBuildConfig.fuse_invert``): one
    streaming pipeline instead of write-barrier-re-read. File names
    are content-free uuids (names carry no meaning in the fwd/
    layout); if a task retry ever double-writes a batch, the duplicate
    rows share their doc_ids and the docs-stage winners-count guard
    detects and repairs them exactly like duplicate input rows
    (``_dedupe_fwd_doc_ids``), invalidating the fused partials."""

    def __init__(self, winners_ref, out_dir: str):
        super().__init__(winners_ref)
        self._out_dir = out_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = super().__call__(batch)
        if out.num_rows:
            pq.write_table(
                out,
                os.path.join(self._out_dir, f"fwd-{uuid.uuid4().hex}.parquet"),
            )
        return out


@ray.remote
def _merge_partition(
    merger, seg_dir: str, pid: int, sliced: bool, *subtables
) -> int:
    """One merge partition: concat its per-block slices, segment by
    gid, run the (term, bucket) merge per group, and write this
    partition's segment file(s) straight into the hive layout — the
    reduce side of the direct exchange (no Dataset sort barrier). Rows
    written are returned for the stage metric."""
    import pyarrow.parquet as _pq

    parts = [t for t in subtables if t.num_rows]
    if not parts:
        return 0
    tbl = pa.concat_tables(parts)
    gids = tbl.column("gid").to_numpy()
    order = np.argsort(gids, kind="stable")
    tbl = tbl.take(pa.array(order))
    gs = gids[order]
    starts = np.flatnonzero(np.concatenate([[True], gs[1:] != gs[:-1]]))
    ends = np.append(starts[1:], len(gs))
    by_slice: dict[object, list] = {}
    for s, e in zip(starts, ends):
        out = merger(tbl.slice(int(s), int(e - s)))
        if out.num_rows == 0:
            continue
        if sliced:
            bslice = int(out.column("bslice")[0].as_py())
            out = out.drop_columns(["bslice"])
        else:
            bslice = None
        by_slice.setdefault(bslice, []).append(out)
    written = 0
    for bslice, outs in by_slice.items():
        d = seg_dir if bslice is None else os.path.join(seg_dir, f"bslice={bslice}")
        os.makedirs(d, exist_ok=True)
        merged = pa.concat_tables(outs)
        _pq.write_table(merged, os.path.join(d, f"merge-{pid:05d}.parquet"))
        written += merged.num_rows
    return written


@ray.remote
def _split_doclen_block(
    tbl: pa.Table, bg_doc_base: np.ndarray, max_doc: int, n_bg: int
):
    """Range-partition one docs/ block's (doc_id, doclen) pairs by merge
    bucket-group: one argsort on doc_id + n_bg zero-copy slices
    (num_returns=n_bg — output bg feeds combine task bg directly, so the
    exchange never routes through the driver)."""
    ids = tbl.column("doc_id").to_numpy().astype(np.int64, copy=False)
    dls = tbl.column("doclen").to_numpy().astype(np.int64, copy=False)
    order = np.argsort(ids, kind="stable")
    ids, dls = ids[order], dls[order]
    edges = np.minimum(bg_doc_base[: n_bg + 1], max_doc + 1)
    bounds = np.searchsorted(ids, edges)
    out = [
        (ids[bounds[i] : bounds[i + 1]], dls[bounds[i] : bounds[i + 1]])
        for i in range(n_bg)
    ]
    return tuple(out) if n_bg > 1 else out[0]


@ray.remote
def _combine_doclen_slice(base: int, end: int, *parts) -> np.ndarray:
    """Build one bucket-group's dense doclen slice from its per-block
    partitions. The returned array lives in the object store under this
    task's return ref — it IS the broadcast object the merge tasks
    fetch, byte-identical to the driver-built ray.put slice."""
    out = np.zeros(end - base, dtype=np.int64)
    for ids, dls in parts:
        out[ids - base] = dls
    return out


def _small_groupby(directory: str, columns: list[str], pandas_fn, ray_fn):
    """Run a metadata aggregation on the driver (pandas) when the pruned
    input columns are small, else distributed (Ray groupby). Returns a
    pandas DataFrame or a Ray Dataset respectively."""
    if _projected_dir_bytes(directory, columns) <= SMALL_AGG_BYTES:
        tbl = pq.read_table(directory, columns=columns)
        return pandas_fn(tbl.to_pandas())
    return ray_fn(rd.read_parquet(directory, columns=columns))


def build_index(
    input_paths: list[str] | str,
    index_root: str,
    *,
    config: IndexBuildConfig | None = None,
    build_id: str | None = None,
    publish: bool = True,
) -> dict:
    """Run (or resume) a full webtext index build. Returns final stats.

    ``input_paths``: parquet file(s)/dir(s) with the webtext schema
    (url, warc_ts, html, text, lang).
    """
    cfg = config or IndexBuildConfig()
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
    # the same file listed twice would make every one of its rows a
    # "duplicate input row" (identical url AND warc_ts) that the winner
    # key cannot discriminate — collapse the listing up front
    files = list(dict.fromkeys(os.path.abspath(f) for f in files))
    fp = mf.fingerprint_paths(files)
    if build_id is None:
        build_id = f"b{fp[:12]}"
    bdir = mf.build_dir(index_root, build_id)
    os.makedirs(bdir, exist_ok=True)
    metrics: dict[str, float] = {}

    # ---- stage 1: key-only dedup/rank → winners; extract+tokenize → fwd/
    fwd_dir = os.path.join(bdir, "fwd")
    partial_refs = partial_meta = None  # set by the fused-invert path
    if not mf.stage_done(bdir, "fwd", fp):
        t0 = time.perf_counter()
        # parquet footers give the input row count for free (no scan)
        n_input = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        if n_input == 0:
            raise ValueError(
                "refusing to build an index over zero documents "
                "(the reference skips the alias switch on zero docs, "
                "ElasticsearchClient.java:284-295)"
            )
        # per-block batches (no batch_size): coalescing to 64k rows cut
        # the key pass to ~9 tasks at the 600k tier — under-parallelized
        # on 32 CPUs (measured 2.7-3.0 s vs 1.7-1.9 s per-block)
        keys_ds = rd.read_parquet(files, columns=["url", "warc_ts"]).map_batches(
            KeyStage(), batch_format="pyarrow"
        )
        # ~24 B of key per input row: one driver lexsort is cheapest
        # until the key table itself outgrows a machine, then the same
        # computation runs as a key-range groupby (identical output —
        # tests/test_determinism.py pins the parity)
        distributed = cfg.winners_mode == "distributed" or (
            cfg.winners_mode == "auto" and n_input * 24 > SMALL_AGG_BYTES
        )
        if distributed:
            winners = compute_winners_distributed(keys_ds, cfg.winner_partitions)
        else:
            keys_tbl = pa.concat_tables(
                [ray.get(ref) for ref in keys_ds.materialize().to_arrow_refs()]
            )
            winners = compute_winners(keys_tbl)
            del keys_tbl
        metrics["dedup_keys_s"] = time.perf_counter() - t0
        # dict form: one small broadcast; ShardedWinners: the handle is
        # tiny — shard bytes stay in the object store (no monolith)
        winners_ref = ray.put(winners)
        n_docs_expected = (
            len(winners["doc_id"]) if isinstance(winners, dict) else len(winners)
        )

        t0 = time.perf_counter()

        def _run_fwd(group_files: list[str], out_dir: str) -> None:
            ds = rd.read_parquet(
                group_files, columns=["url", "warc_ts", "html", "text", "lang"]
            )
            if cfg.actor_pool_size is not None:
                fwd = ds.map_batches(
                    ExtractTokenizeStage,
                    fn_constructor_args=(winners_ref,),
                    concurrency=cfg.actor_pool_size,
                    batch_format="pyarrow",
                    batch_size=cfg.batch_size,
                )
            else:
                fwd = ds.map_batches(
                    ExtractTokenizeStage(winners_ref),
                    batch_format="pyarrow",
                    batch_size=cfg.batch_size,
                )
            _clean_dir(out_dir)
            fwd.write_parquet(out_dir)

        groups = max(1, min(cfg.fwd_partition_groups, len(files)))
        fuse = cfg.fuse_invert == "fused" or (
            cfg.fuse_invert == "auto"
            and groups == 1
            and cfg.merge_exchange == "direct"
        )
        if fuse:
            # fused extract→invert: doc ids are dense ranks of the
            # winner table, so max_doc — and with it bucket_width, the
            # bucket-group bounds and the slice layout (all pure
            # functions of max_doc, mirrored from the docs stage) — is
            # known BEFORE extraction. The invert consumes extract
            # output in-stream; fwd/ is side-written per batch as the
            # checkpoint, saving its full re-read and one barrier.
            max_doc_pre = n_docs_expected - 1
            w_pre = cfg.resolved_bucket_width(max_doc_pre)
            nb_pre = max_doc_pre // w_pre + 1
            n_bg_pre = min(cfg.resolved_merge_bucket_groups(max_doc_pre), nb_pre)
            bg_bounds_pre = np.linspace(0, nb_pre, n_bg_pre + 1).astype(np.int64)
            slice_bounds_pre = (
                np.linspace(0, nb_pre, min(nb_pre, 16) + 1).astype(int).tolist()
            )
            _clean_dir(fwd_dir)
            os.makedirs(fwd_dir, exist_ok=True)
            ds = rd.read_parquet(
                files, columns=["url", "warc_ts", "html", "text", "lang"]
            )
            if cfg.actor_pool_size is not None:
                fwd = ds.map_batches(
                    FwdSideWriteStage,
                    fn_constructor_args=(winners_ref, fwd_dir),
                    concurrency=cfg.actor_pool_size,
                    batch_format="pyarrow",
                    batch_size=cfg.batch_size,
                )
            else:
                fwd = ds.map_batches(
                    FwdSideWriteStage(winners_ref, fwd_dir),
                    batch_format="pyarrow",
                    batch_size=cfg.batch_size,
                )
            partials = fwd.map_batches(
                InvertStage(
                    w_pre, cfg.n_term_shards,
                    bucket_group_bounds=bg_bounds_pre,
                    slice_bounds=(
                        slice_bounds_pre if len(slice_bounds_pre) > 2 else None
                    ),
                ),
                batch_format="pyarrow",
                batch_size=cfg.resolved_invert_batch_size(
                    n_docs_expected, int(ray.cluster_resources().get("CPU", 8))
                ),
            )
            partial_refs = partials.materialize().to_arrow_refs()
            partial_meta = {
                "bucket_width": w_pre,
                "slice_bounds": slice_bounds_pre,
                "bg_bounds": bg_bounds_pre.tolist(),
                "n_term_shards": cfg.n_term_shards,
            }
        elif groups == 1:
            _clean_dir(fwd_dir)
            _run_fwd(files, fwd_dir)
        else:
            # per-partition checkpointing: one file group per sub-dir,
            # skipped on resume when its marker matches the fingerprint
            os.makedirs(fwd_dir, exist_ok=True)
            for g in range(groups):
                gfiles = files[g::groups]
                gdir = os.path.join(fwd_dir, f"group-{g:04d}")
                gstage = f"fwd_group{g:04d}"
                gfp = mf.fingerprint_paths(gfiles)
                if mf.stage_done(bdir, gstage, gfp):
                    continue
                _run_fwd(gfiles, gdir)
                mf.write_stage_manifest(
                    bdir,
                    gstage,
                    input_fingerprint=gfp,
                    partitions=mf.partition_lineage(gdir),
                    metrics={"files": len(gfiles)},
                )
        metrics["fwd_s"] = time.perf_counter() - t0
        mf.write_stage_manifest(
            bdir,
            "fwd",
            input_fingerprint=fp,
            rows_out=n_docs_expected,
            partitions=mf.partition_lineage(fwd_dir),
            metrics={
                "seconds": metrics["fwd_s"],
                "dedup_keys_seconds": metrics["dedup_keys_s"],
                "input_files": len(files),
                "input_rows": n_input,
                "duplicates_dropped": n_input - n_docs_expected,
                "partition_groups": groups,
                "fused_invert": bool(fuse),
            },
        )

    stats = _finish_from_fwd(
        index_root, build_id, fp, cfg, publish,
        partial_refs=partial_refs, partial_meta=partial_meta,
    )
    stats.setdefault("metrics", {}).update(metrics)
    return stats


def build_index_from_documents(
    ds: rd.Dataset,
    index_root: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    fields: list[tuple[str, str, str]] | None = None,
    analyzer: str = "full",
    config: IndexBuildConfig | None = None,
    build_id: str = "docs-build",
    publish: bool = True,
    fingerprint: str = "inline",
) -> dict:
    """Build an index over an arbitrary document Dataset (e.g. the
    driver's ``documents.parquet``): ids come from ``id_col`` verbatim
    (unique non-negative ints — the ES ``_id``/idKey analogue, reference
    Limetrans.java:572-584), no extraction/dedup. Shares stages 2-4 with
    :func:`build_index` via the fwd/ checkpoint layout.

    ``fields``: optional multi-field mapping — a list of
    ``(field_name, column, analyzer)`` with analyzer ``"text"`` or
    ``"keyword"`` (the reference's typed search-field projection,
    hbztitle-mapping-v8.json:27-88). Text fields index BOTH
    field-qualified terms (``field\\x1fterm`` — query as
    ``field:term``) and unqualified catch-all terms; keyword fields one
    normalized qualified term. Default (None) = the single unqualified
    ``text_col``.

    ``analyzer``: ``"full"`` (the shared analyzer chain — hyphen
    multiplexing, folding, stop words, German2 stemming) or ``"simple"``
    (:func:`~limetrans_ray.functions.analyzer.simple_terms` — lowercase
    alnum split, deliberately ANSI-SQL-expressible so a DuckDB oracle
    can mirror the ENTIRE index-then-query round trip exactly; the
    reference's index-then-query conformance discipline,
    ElasticsearchQueryTest.java:315-354, expressed in the driver's hard
    signal). The profile is recorded in stats.json and the query side
    follows it. ``"simple"`` composes with ``fields=`` via
    :func:`~limetrans_ray.functions.analyzer.tokenize_fields_simple`
    (text/keyword/keyword_ocn field analyzers), giving fielded search a
    fully SQL-mirrorable round trip too."""
    cfg = config or IndexBuildConfig()
    if analyzer not in ("full", "simple"):
        raise ValueError(f"unknown analyzer profile {analyzer!r}")
    bdir = mf.build_dir(index_root, build_id)
    os.makedirs(bdir, exist_ok=True)
    fwd_dir = os.path.join(bdir, "fwd")
    fp = fingerprint

    if not mf.stage_done(bdir, "fwd", fp):
        t0 = time.perf_counter()
        bt = BatchTokenizer() if (analyzer == "full" and fields is None) else None

        def tokenize_batch(batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_numpy().astype(np.int64)
            n = len(ids)
            if bt is not None:
                # single-text full-analyzer fast path: batched tokenizer
                # (identical output to the per-row tokenize_fields form)
                texts = batch.column(text_col).to_pylist()
                terms_col, tfs_col, pos_col, doclens = bt.tokenize_texts(texts)
                sid = [str(i) for i in ids]
                return pa.table(
                    {
                        "doc_id": pa.array(ids),
                        "url": pa.array(sid, pa.string()),
                        "canon": pa.array(sid, pa.string()),
                        "lang": pa.array([""] * n, pa.string()),
                        "doclen": pa.array(doclens),
                        "terms": terms_col,
                        "tfs": tfs_col,
                        "pos": pos_col,
                    }
                )
            if analyzer == "simple" and fields is not None:
                cols = {col: batch.column(col).to_pylist() for _f, col, _a in fields}
                per_row = (
                    tokenize_fields_simple(
                        [(f, a, cols[col][i]) for f, col, a in fields]
                    )
                    for i in range(n)
                )
            elif analyzer == "simple":
                def rows_simple():
                    for t in batch.column(text_col).to_pylist():
                        posmap: dict[str, list[int]] = {}
                        toks = simple_terms(t or "")
                        for p, term in enumerate(toks):
                            posmap.setdefault(term, []).append(p)
                        yield posmap, len(toks)
                per_row = rows_simple()
            else:
                cols = {col: batch.column(col).to_pylist() for _f, col, _a in fields}
                per_row = (
                    tokenize_fields([(f, a, cols[col][i]) for f, col, a in fields])
                    for i in range(n)
                )
            terms_col, tfs_col, pos_col = [], [], []
            doclens = np.empty(n, dtype=np.int64)
            for i, (posmap, dl) in enumerate(per_row):
                items = sorted(posmap.items())
                terms_col.append([k for k, _ in items])
                tfs_col.append([len(p) for _, p in items])
                pos_col.append([p for _, p in items])
                doclens[i] = dl
            sid = [str(i) for i in ids]
            return pa.table(
                {
                    "doc_id": pa.array(ids),
                    "url": pa.array(sid, pa.string()),
                    "canon": pa.array(sid, pa.string()),
                    "lang": pa.array([""] * n, pa.string()),
                    "doclen": pa.array(doclens),
                    "terms": pa.array(terms_col, pa.list_(pa.string())),
                    "tfs": pa.array(tfs_col, pa.list_(pa.int32())),
                    "pos": pa.array(pos_col, pa.list_(pa.list_(pa.int32()))),
                }
            )

        fwd = ds.map_batches(tokenize_batch, batch_format="pyarrow", batch_size=cfg.batch_size)
        _clean_dir(fwd_dir)
        fwd.write_parquet(fwd_dir)
        mf.write_stage_manifest(
            bdir,
            "fwd",
            input_fingerprint=fp,
            partitions=mf.partition_lineage(fwd_dir),
            metrics={"seconds": time.perf_counter() - t0},
        )

    return _finish_from_fwd(
        index_root, build_id, fp, cfg, publish, analyzer_profile=analyzer,
        fields_map={f: a for f, _c, a in fields} if fields else None,
    )


def _finish_from_fwd(
    index_root: str,
    build_id: str,
    fp: str,
    cfg: IndexBuildConfig,
    publish: bool,
    *,
    analyzer_profile: str = "full",
    fields_map: dict[str, str] | None = None,
    partial_refs: list | None = None,
    partial_meta: dict | None = None,
) -> dict:
    """Stages 2-4 over an existing fwd/ checkpoint (see module doc).

    ``partial_refs``/``partial_meta``: posting partials already
    materialized by the fused extract→invert path
    (``IndexBuildConfig.fuse_invert``). Used only when the docs stage
    confirms the fused run was clean (no duplicate-row repair) and the
    stats-derived merge layout matches ``partial_meta`` exactly;
    otherwise the classic invert re-runs from fwd/ on disk."""
    bdir = mf.build_dir(index_root, build_id)
    fwd_dir = os.path.join(bdir, "fwd")
    docs_dir = os.path.join(bdir, "docs")
    stats_path = os.path.join(bdir, "stats.json")
    metrics: dict[str, float] = {}

    # ---- stage 2: corpus stats + docs/ projection
    if not mf.stage_done(bdir, "docs", fp):
        t0 = time.perf_counter()
        # an empty input writes no fwd files at all — refuse cleanly, like
        # the reference skips the alias switch on zero docs
        has_fwd = os.path.isdir(fwd_dir) and any(
            f.endswith(".parquet")
            for _root, _dirs, fs in os.walk(fwd_dir)
            for f in fs
        )
        if not has_fwd:
            raise ValueError(
                "refusing to build an index over zero documents "
                "(the reference skips the alias switch on zero docs, "
                "ElasticsearchClient.java:284-295)"
            )
        def _ray_corpus_stats(meta):  # pragma: no cover — >SMALL_AGG_BYTES path
            agg = meta.aggregate(
                Sum("doclen", alias_name="terms"), Max("doc_id", alias_name="max_doc")
            )
            return pd.DataFrame(
                {"n": [meta.count()], "terms": [agg["terms"]], "max_doc": [agg["max_doc"]]}
            )

        def _corpus_stats():
            return _small_groupby(
                fwd_dir,
                ["doc_id", "doclen"],
                lambda df: pd.DataFrame(
                    {
                        "n": [len(df)],
                        "terms": [df["doclen"].sum()],
                        "max_doc": [df["doc_id"].max()],
                    }
                ),
                _ray_corpus_stats,
            )

        pdf = _corpus_stats()
        n_docs = int(pdf["n"].iloc[0])
        # duplicate-input guard: identical input rows (same url AND
        # warc_ts — e.g. genuine crawl duplicates) all satisfy the
        # winner key and reach fwd/ under one doc_id; detect via the
        # expected winner count recorded in the fwd manifest and repair
        # (zero cost on the clean path — just this count compare)
        fwd_m = mf.stage_manifest(bdir, "fwd")
        expected = fwd_m.get("rows_out") if fwd_m else None
        if expected is not None and n_docs != expected:
            dropped = _dedupe_fwd_doc_ids(fwd_dir)
            metrics["fwd_dup_rows_dropped"] = dropped
            pdf = _corpus_stats()
            n_docs = int(pdf["n"].iloc[0])
            if n_docs != expected:
                raise ValueError(
                    f"fwd row count {n_docs} != expected winners {expected} "
                    "after doc_id dedup — input/winner accounting bug"
                )
        total_terms = int(pdf["terms"].iloc[0])
        max_doc = int(pdf["max_doc"].iloc[0])
        if n_docs == 0:
            raise ValueError("refusing to build an index over zero documents")
        # docs/ = metadata projection of fwd. Small corpora: one direct
        # columnar copy on the driver (a distributed pass costs more in
        # fixed overhead than it moves in bytes); large: Ray projection
        # (the copy is O(n) and must not serialize on the driver).
        doc_cols = ["doc_id", "url", "canon", "lang", "doclen"]
        _clean_dir(docs_dir)
        if _projected_dir_bytes(fwd_dir, doc_cols) <= SMALL_AGG_BYTES:
            os.makedirs(docs_dir, exist_ok=True)
            pq.write_table(
                pq.read_table(fwd_dir, columns=doc_cols),
                os.path.join(docs_dir, "docs.parquet"),
            )
        else:
            rd.read_parquet(fwd_dir, columns=doc_cols).write_parquet(docs_dir)
        stats = {
            "n_docs": n_docs,
            "max_doc": max_doc,
            "total_terms": total_terms,
            "avgdl": total_terms / n_docs,
            "base_avgdl": total_terms / n_docs,  # encode-time avgdl of base
                                                 # segments (never touched by
                                                 # incremental updates)
            "bucket_width": cfg.resolved_bucket_width(max_doc),
            # on-disk doc-range layout of segments/: hive ``bslice=``
            # partitions over these bucket bounds, so a doc-range
            # serving shard lists (and reads) ONLY its overlapping
            # slices instead of scanning the whole index at startup
            "segment_slice_bounds": np.linspace(
                0,
                max_doc // cfg.resolved_bucket_width(max_doc) + 1,
                min(max_doc // cfg.resolved_bucket_width(max_doc) + 1, 16) + 1,
            ).astype(int).tolist(),
            "analyzer_version": ANALYZER_VERSION,
            "analyzer_profile": analyzer_profile,
            "postings_codec": cfg.postings_codec,
            # per-field SEARCH analyzer map (ES search_analyzer analogue)
            "fields": fields_map,
            "format_version": FORMAT_VERSION,
            "build_id": build_id,
            "input_fingerprint": fp,
            "config": asdict(cfg),
            "k1": 1.2,
            "b": 0.75,
        }
        with open(stats_path + ".tmp", "w") as fh:
            json.dump(stats, fh, indent=1)
        os.replace(stats_path + ".tmp", stats_path)
        metrics["docs_s"] = time.perf_counter() - t0
        mf.write_stage_manifest(
            bdir,
            "docs",
            input_fingerprint=fp,
            rows_out=n_docs,
            partitions=mf.partition_lineage(docs_dir),
            metrics={"seconds": metrics["docs_s"], "n_docs": n_docs},
        )
    with open(stats_path) as fh:
        stats = json.load(fh)

    # ---- stage 3: SPIMI partials → (term, bucket) merge → segments/
    seg_dir = os.path.join(bdir, "segments")
    if not mf.stage_done(bdir, "segments", fp):
        t0 = time.perf_counter()
        # doclen state for block-max impacts, RANGE-SHARDED: one slice
        # per merge bucket-group, each its own broadcast object — a
        # merge task fetches only its doc range's slice (~1 GiB cap),
        # never a dense max_doc+1 array on ANY worker. Construction is
        # gated like every other metadata aggregate: a columnar driver
        # read while the dense array AND the pruned columns fit
        # SMALL_AGG_BYTES, else a split/combine Ray exchange over docs/
        # blocks whose combine-task return refs ARE the broadcast
        # objects (at 10^11-10^12 docs the dense array is 0.8-8 TB —
        # it must never exist on the driver).
        max_doc = int(stats["max_doc"])
        w = int(stats["bucket_width"])
        n_buckets = max_doc // w + 1
        n_bg = min(cfg.resolved_merge_bucket_groups(max_doc), n_buckets)
        bg_bucket_bounds = np.linspace(0, n_buckets, n_bg + 1).astype(np.int64)
        bg_doc_base = bg_bucket_bounds * w  # doc-id base per bucket-group
        dl_distributed = cfg.doclen_slice_mode == "distributed" or (
            cfg.doclen_slice_mode == "auto"
            and (
                (max_doc + 1) * 8 > SMALL_AGG_BYTES
                or _projected_dir_bytes(docs_dir, ["doc_id", "doclen"])
                > SMALL_AGG_BYTES
            )
        )
        if not dl_distributed:
            dl_tbl = pq.read_table(docs_dir, columns=["doc_id", "doclen"])
            doclens = np.zeros(max_doc + 1, dtype=np.int64)
            doclens[dl_tbl.column("doc_id").to_numpy()] = dl_tbl.column("doclen").to_numpy()
            dl_refs = {
                bg: ray.put(doclens[bg_doc_base[bg] : min(bg_doc_base[bg + 1], max_doc + 1)])
                for bg in range(n_bg)
            }
            del doclens, dl_tbl
        else:
            dl_blocks = rd.read_parquet(
                docs_dir, columns=["doc_id", "doclen"]
            ).to_arrow_refs()
            dl_split = [
                _split_doclen_block.options(num_returns=n_bg).remote(
                    r, bg_doc_base, max_doc, n_bg
                )
                for r in dl_blocks
            ]
            if n_bg == 1:  # options(num_returns=1) returns a bare ref
                dl_split = [[r] for r in dl_split]
            dl_refs = {
                bg: _combine_doclen_slice.remote(
                    int(bg_doc_base[bg]),
                    int(min(bg_doc_base[bg + 1], max_doc + 1)),
                    *[s[bg] for s in dl_split],
                )
                for bg in range(n_bg)
            }
            del dl_blocks, dl_split
        slice_bounds = stats.get("segment_slice_bounds")
        have_slices = bool(slice_bounds) and len(slice_bounds) > 2
        # fused-invert partials are valid only when the docs stage saw a
        # clean fwd (no duplicate repair — repaired rows would leave
        # stale postings) and the stats-derived layout equals what the
        # fused invert actually used (it always does when max_doc ==
        # n_winners - 1; the compare is the safety net, not a branch)
        fused_ok = (
            partial_refs is not None
            and cfg.merge_exchange == "direct"
            and not metrics.get("fwd_dup_rows_dropped")
            and partial_meta == {
                "bucket_width": int(stats["bucket_width"]),
                "slice_bounds": list(slice_bounds or []),
                "bg_bounds": bg_bucket_bounds.tolist(),
                "n_term_shards": cfg.n_term_shards,
            }
        )
        metrics["merge_used_fused_partials"] = float(fused_ok)
        partials = None
        if not fused_ok:
            partials = rd.read_parquet(
                fwd_dir, columns=["doc_id", "terms", "tfs", "pos"]
            ).map_batches(
                InvertStage(
                    stats["bucket_width"], cfg.n_term_shards,
                    bucket_group_bounds=bg_bucket_bounds,
                    slice_bounds=slice_bounds if have_slices else None,
                ),
                batch_format="pyarrow",
                batch_size=cfg.resolved_invert_batch_size(
                    int(stats["n_docs"]), int(ray.cluster_resources().get("CPU", 8))
                ),
            )
        merger = MergeShardGroup(
            dl_refs, stats["avgdl"], cfg.block_size, bg_doc_base=bg_doc_base,
            slice_bounds=slice_bounds, ids_codec=cfg.postings_codec,
            bucket_width=w,
        )

        def merge_shard_group(group: pa.Table) -> pa.Table:
            return merger(group)

        # merge groups: term-hash shard × doc-range slice. The slice key
        # splits a hot term's buckets across merge tasks — one group per
        # term made the Zipf head a 4x-the-mean straggler task that WAS
        # the stage wall at 32 CPUs (and its multi-GB working set
        # thrashed caches); slice-sized groups balance the waves. bgroup
        # joins the key only when >1 doclen slice exists (10^12 scale) so
        # each task still fetches a single doclen range.
        _clean_dir(seg_dir)
        if cfg.merge_exchange == "direct":
            # raw-Ray object-store exchange: Ray Data's sort-based
            # groupby barrier measured 12 s of wall for 3 core-seconds
            # of compute at the 600k tier (BASELINE.md §round-4) — the
            # merge key space is small and known, so split tasks
            # hash-partition the encoded partials and one merge task
            # per partition fetches exactly its slices zero-copy and
            # writes its own segment files. Partials materialize in
            # the object store (same bytes the sort shuffle holds;
            # spill-backed); fwd_partition_groups bounds the window at
            # 100 TB scale.
            n_ms = len(slice_bounds) - 1 if have_slices else 1
            ncpu = int(ray.cluster_resources().get("CPU", 8))
            npid = int(min(cfg.n_term_shards * n_bg * n_ms, max(32, 4 * ncpu)))
            block_refs = (
                partial_refs if fused_ok else partials.materialize().to_arrow_refs()
            )
            split_refs = [
                _split_partials.options(num_returns=npid).remote(
                    r, n_bg, n_ms, npid
                )
                for r in block_refs
            ]
            if npid == 1:  # options(num_returns=1) returns a bare ref
                split_refs = [[r] for r in split_refs]
            ray.get(
                [
                    _merge_partition.remote(
                        merger, seg_dir, pid, have_slices,
                        *(s[pid] for s in split_refs),
                    )
                    for pid in range(npid)
                ]
            )
            os.makedirs(seg_dir, exist_ok=True)  # zero-doc partitions only
        else:
            group_keys = ["shard"] if n_bg == 1 else ["shard", "bgroup"]
            if have_slices:
                group_keys = group_keys + ["mslice"]
            segs = partials.groupby(group_keys).map_groups(
                merge_shard_group, batch_format="pyarrow"
            )
            if have_slices:
                # hive doc-range layout: serving shards read only their
                # slices
                segs.write_parquet(seg_dir, partition_cols=["bslice"])
            else:
                segs.write_parquet(seg_dir)
            if os.environ.get("GRAFT_DUMP_STAGE_STATS"):  # perf diagnostics
                print(segs.stats(), flush=True)
        metrics["segments_s"] = time.perf_counter() - t0
        mf.write_stage_manifest(
            bdir,
            "segments",
            input_fingerprint=fp,
            partitions=mf.partition_lineage(seg_dir),
            metrics={"seconds": metrics["segments_s"]},
        )

    # ---- stage 4: per-term global stats (df/cf summed over chunks)
    ts_dir = os.path.join(bdir, "term_stats")
    if not mf.stage_done(bdir, "term_stats", fp):
        t0 = time.perf_counter()
        ts_pdf = _small_groupby(
            seg_dir,
            ["term", "df", "cf"],
            lambda df: df.groupby("term", as_index=False).agg(
                df=("df", "sum"), cf=("cf", "sum")
            ),
            lambda seg: seg.groupby("term").aggregate(
                Sum("df", alias_name="df"), Sum("cf", alias_name="cf")
            ),
        )
        _clean_dir(ts_dir)
        if isinstance(ts_pdf, pd.DataFrame):
            os.makedirs(ts_dir, exist_ok=True)
            pq.write_table(
                pa.Table.from_pandas(ts_pdf, preserve_index=False),
                os.path.join(ts_dir, "term_stats.parquet"),
            )
        else:
            ts_pdf.write_parquet(ts_dir)
        metrics["term_stats_s"] = time.perf_counter() - t0
        mf.write_stage_manifest(
            bdir,
            "term_stats",
            input_fingerprint=fp,
            partitions=mf.partition_lineage(ts_dir),
            metrics={"seconds": metrics["term_stats_s"]},
        )

    if publish:
        mf.publish_current(index_root, build_id, retain=cfg.retain)
    stats["metrics"] = metrics
    return stats
