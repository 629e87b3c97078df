"""End-to-end inverted-index build pipeline (Ray Data).

The analogue of the reference's production run (``hbz.limetrans.Main`` →
``Limetrans.process()``, reference main/src/main/java/hbz/limetrans/
Limetrans.java:431-501) with the Elasticsearch sink replaced by our own
SPIMI posting-list builder (SURVEY.md §7):

    read_parquet (webtext)                                 [pruned columns]
      → map_batches(ExtractNormalizeStage)                 [drop html early]
      → groupby(part).map_groups(dedup+rank+tokenize)      [shuffle #1]
      → write fwd/ parquet                                 [stage checkpoint]
    read fwd → per-partition counts → dense doc_id offsets [tiny aggregate]
      → write docs/ parquet + stats.json
    read fwd → map_batches(InvertStage)                    [SPIMI partials]
      → groupby(term, bucket).map_groups(MergeEncodeGroup) [shuffle #2]
      → write segments/ parquet
    read segments meta → groupby(term) Sum(df/cf)          [term_stats]
    publish: manifests + atomic CURRENT pointer flip       [alias switch]

Every stage records a manifest (input fingerprint + per-partition
lineage + metrics) and a done marker; re-running ``build_index`` on the
same input resumes after the last completed stage. The build is
parallelism-invariant: doc ids derive from (hash(canonical_url), url)
order, chunk boundaries from data-dependent bucket widths — never from
task/batch boundaries — so two builds at different CPU counts produce
logically identical indexes (tests/test_determinism.py).

Scale notes (100 TB / 10^12 docs): ``part_bits`` bounds the dedup/rank
group size — raise it so one group (≈N/2^part_bits docs) fits a worker;
``bucket_width`` bounds the largest posting-merge group (hot-term skew:
a stop-word-scale term becomes one chunk per bucket instead of one
giant ``groupby`` value — the salted-key design of SURVEY.md §4);
``fwd/`` on disk is the classic SPIMI spill and what makes the build
resumable without re-tokenizing.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections import Counter
from dataclasses import asdict, dataclass

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Sum

from .. import ANALYZER_VERSION, FORMAT_VERSION
from ..functions import codec
from ..functions.analyzer import tokenize_index
from ..stages.indexing import (
    AssignDocIdStage,
    ExtractNormalizeStage,
    InvertStage,
    MergeEncodeGroup,
    dedup_rank_tokenize_group,
)
from ..state import manifest as mf


@dataclass
class IndexBuildConfig:
    part_bits: int = 6              # 2^part_bits dedup/doc-id hash partitions
    n_term_shards: int = 16         # segment layout fan-out (term-hash dirs)
    block_size: int = codec.BLOCK_SIZE
    bucket_width: int | None = None  # posting-chunk doc-range; None → from corpus size
    batch_size: int = 2048          # rows per extract/tokenize batch
    retain: int = 2                 # previous builds kept after publish

    def resolved_bucket_width(self, max_doc: int) -> int:
        if self.bucket_width:
            return int(self.bucket_width)
        # data-dependent (never parallelism-dependent): ~64 buckets over
        # the id space, power of two, at least 4096 docs per bucket.
        return 1 << max(12, max(1, max_doc).bit_length() - 6)


def _clean_dir(path: str) -> None:
    if os.path.isdir(path):
        shutil.rmtree(path)


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
    fp = mf.fingerprint_paths(files)
    if build_id is None:
        build_id = f"b{fp[:12]}"
    bdir = mf.build_dir(index_root, build_id)
    os.makedirs(bdir, exist_ok=True)
    metrics: dict[str, float] = {}

    # ---- stage 1: extract → normalize → dedup → rank → tokenize → fwd/
    fwd_dir = os.path.join(bdir, "fwd")
    if not mf.stage_done(bdir, "fwd", fp):
        t0 = time.perf_counter()
        ds = rd.read_parquet(files, columns=["url", "warc_ts", "html", "text", "lang"])
        ds = ds.map_batches(
            ExtractNormalizeStage(cfg.part_bits),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
        )
        fwd = ds.groupby("part").map_groups(
            dedup_rank_tokenize_group, batch_format="pyarrow"
        )
        _clean_dir(fwd_dir)
        fwd.write_parquet(fwd_dir)
        metrics["fwd_s"] = time.perf_counter() - t0
        mf.write_stage_manifest(
            bdir,
            "fwd",
            input_fingerprint=fp,
            partitions=mf.partition_lineage(fwd_dir),
            metrics={"seconds": metrics["fwd_s"], "input_files": len(files)},
        )

    stats = _finish_from_fwd(index_root, build_id, fp, cfg, publish, dense_ids=True)
    stats.setdefault("metrics", {}).update(metrics)
    return stats


def build_index_from_documents(
    ds: rd.Dataset,
    index_root: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    config: IndexBuildConfig | None = None,
    build_id: str = "docs-build",
    publish: bool = True,
    fingerprint: str = "inline",
) -> dict:
    """Build an index over an arbitrary document Dataset (e.g. the
    driver's ``documents.parquet``): ids come from ``id_col`` verbatim
    (unique non-negative ints — the ES ``_id``/idKey analogue, reference
    Limetrans.java:572-584), no extraction/dedup. Shares stages 2-4 with
    :func:`build_index` via the fwd/ checkpoint layout."""
    cfg = config or IndexBuildConfig()
    bdir = mf.build_dir(index_root, build_id)
    os.makedirs(bdir, exist_ok=True)
    fwd_dir = os.path.join(bdir, "fwd")
    fp = fingerprint

    if not mf.stage_done(bdir, "fwd", fp):
        t0 = time.perf_counter()

        def tokenize_batch(batch: pa.Table) -> pa.Table:
            texts = batch.column(text_col).to_pylist()
            ids = batch.column(id_col).to_numpy().astype(np.int64)
            terms_col, tfs_col = [], []
            doclens = np.empty(len(texts), dtype=np.int64)
            for i, t in enumerate(texts):
                cnt = Counter(tokenize_index(t))
                items = sorted(cnt.items())
                terms_col.append([k for k, _ in items])
                tfs_col.append([v for _, v in items])
                doclens[i] = sum(cnt.values())
            return pa.table(
                {
                    # provided ids ARE the doc ids: one part, rank = id
                    "part": pa.array(np.zeros(len(texts), dtype=np.int32)),
                    "local_rank": pa.array(ids),
                    "url": pa.array([str(i) for i in ids], pa.string()),
                    "canon": pa.array([str(i) for i in ids], pa.string()),
                    "lang": pa.array([""] * len(texts), pa.string()),
                    "doclen": pa.array(doclens),
                    "terms": pa.array(terms_col, pa.list_(pa.string())),
                    "tfs": pa.array(tfs_col, pa.list_(pa.int32())),
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

    return _finish_from_fwd(index_root, build_id, fp, cfg, publish, dense_ids=False)


def _finish_from_fwd(
    index_root: str,
    build_id: str,
    fp: str,
    cfg: IndexBuildConfig,
    publish: bool,
    *,
    dense_ids: bool,
) -> dict:
    """Stages 2-4 over an existing fwd/ checkpoint (see module doc)."""
    bdir = mf.build_dir(index_root, build_id)
    fwd_dir = os.path.join(bdir, "fwd")
    docs_dir = os.path.join(bdir, "docs")
    stats_path = os.path.join(bdir, "stats.json")
    metrics: dict[str, float] = {}

    # ---- stage 2: doc-id offsets + docs/ + stats.json
    if not mf.stage_done(bdir, "docs", fp):
        t0 = time.perf_counter()
        # an empty input writes no fwd files at all — refuse cleanly, like
        # the reference skips the alias switch on zero docs
        if not os.path.isdir(fwd_dir) or not any(
            f.endswith(".parquet") for f in os.listdir(fwd_dir)
        ):
            raise ValueError(
                "refusing to build an index over zero documents "
                "(the reference skips the alias switch on zero docs, "
                "ElasticsearchClient.java:284-295)"
            )
        meta = rd.read_parquet(fwd_dir, columns=["part", "local_rank", "doclen"])
        agg = meta.groupby("part").aggregate(
            Count(alias_name="n"),
            Sum("doclen", alias_name="terms"),
            Max("local_rank", alias_name="max_rank"),
        )
        pdf = agg.to_pandas().sort_values("part")
        n_parts = 1 << cfg.part_bits
        counts = np.zeros(n_parts, dtype=np.int64)
        counts[pdf["part"].to_numpy()] = pdf["n"].to_numpy()
        n_docs = int(counts.sum())
        total_terms = int(pdf["terms"].sum())
        if n_docs == 0:
            raise ValueError(
                "refusing to build an index over zero documents "
                "(the reference skips the alias switch on zero docs, "
                "ElasticsearchClient.java:284-295)"
            )
        if dense_ids:
            offsets = np.zeros(n_parts, dtype=np.int64)
            offsets[1:] = np.cumsum(counts)[:-1]
            max_doc = n_docs - 1
        else:
            offsets = np.zeros(n_parts, dtype=np.int64)
            max_doc = int(pdf["max_rank"].max())
        offsets_ref = ray.put(offsets)
        docs = (
            rd.read_parquet(
                fwd_dir, columns=["part", "local_rank", "url", "canon", "lang", "doclen"]
            )
            .map_batches(AssignDocIdStage(offsets_ref), batch_format="pyarrow", batch_size=65536)
            .select_columns(["doc_id", "url", "canon", "lang", "doclen"])
        )
        _clean_dir(docs_dir)
        docs.write_parquet(docs_dir)
        stats = {
            "n_docs": n_docs,
            "max_doc": max_doc,
            "total_terms": total_terms,
            "avgdl": total_terms / n_docs,
            "part_offsets": offsets.tolist(),
            "bucket_width": cfg.resolved_bucket_width(max_doc),
            "analyzer_version": ANALYZER_VERSION,
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
        offsets_ref = ray.put(np.asarray(stats["part_offsets"], dtype=np.int64))
        dl_tbl = rd.read_parquet(docs_dir, columns=["doc_id", "doclen"]).to_pandas()
        doclens = np.zeros(stats["max_doc"] + 1, dtype=np.int64)
        doclens[dl_tbl["doc_id"].to_numpy()] = dl_tbl["doclen"].to_numpy()
        doclens_ref = ray.put(doclens)
        partials = rd.read_parquet(
            fwd_dir, columns=["part", "local_rank", "terms", "tfs"]
        ).map_batches(
            InvertStage(offsets_ref, stats["bucket_width"]),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
        )
        merger = MergeEncodeGroup(
            doclens_ref, stats["avgdl"], cfg.n_term_shards, cfg.block_size
        )

        def merge_encode_group(group: pa.Table) -> pa.Table:
            return merger(group)

        segs = partials.groupby(["term", "bucket"]).map_groups(
            merge_encode_group, batch_format="pyarrow"
        )
        _clean_dir(seg_dir)
        segs.write_parquet(seg_dir)
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
        ts = (
            rd.read_parquet(seg_dir, columns=["term", "df", "cf"])
            .groupby("term")
            .aggregate(Sum("df", alias_name="df"), Sum("cf", alias_name="cf"))
        )
        _clean_dir(ts_dir)
        ts.write_parquet(ts_dir)
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
