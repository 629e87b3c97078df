"""Index-build stage callables (map_batches / map_groups bodies).

Each class follows the reference's state-loaded-once pattern
(SURVEY.md §2.5: lookup maps loaded per process, used per record —
reference main/src/main/java/hbz/limetrans/Limetrans.java:335-366): all
setup (regex compile, broadcast ``ray.get``) happens in ``__init__`` /
first call, per-batch work is vectorized.
"""

from __future__ import annotations

import unicodedata
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..functions.analyzer import tokenize_index
from ..functions.extract import extract_text
from ..functions.textstats import detect_language, stable_hash64
from ..functions.urlnorm import canonical_url
from ..functions import codec
from ..state import bm25


class ExtractNormalizeStage:
    """html→text extraction + url canonicalization + language tagging.

    The per-record transform analogue (Metafix normalization, SURVEY.md
    §2.3): populates ``text`` (byte-identical to ``extract_text`` for
    rows without pre-supplied text), ``canon`` (dedup key), fills empty
    ``lang`` via :func:`detect_language`, computes the 64-bit ``doc_key``
    and its hash partition, and drops the heavy ``html`` column
    immediately (SURVEY.md §7.4 "very wide records").
    """

    def __init__(self, part_bits: int = 6):
        self.part_shift = np.uint64(64 - part_bits)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()
        htmls = batch.column("html")
        out_text: list[str] = []
        out_lang: list[str] = []
        canons: list[str] = []
        for i, (u, t, lg) in enumerate(zip(urls, texts, langs)):
            if not t:
                t = extract_text(htmls[i].as_py())
            else:
                t = unicodedata.normalize("NFC", t)
            out_text.append(t)
            out_lang.append(lg if lg else detect_language(t))
            canons.append(canonical_url(u))
        doc_key = np.fromiter(
            (stable_hash64(c) for c in canons), dtype=np.uint64, count=len(canons)
        )
        part = (doc_key >> self.part_shift).astype(np.int32)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "canon": pa.array(canons, pa.string()),
                "warc_ts": batch.column("warc_ts"),
                "text": pa.array(out_text, pa.string()),
                "lang": pa.array(out_lang, pa.string()),
                "doc_key": pa.array(doc_key, pa.uint64()),
                "part": pa.array(part, pa.int32()),
            }
        )


def dedup_rank_tokenize_group(group: pa.Table) -> pa.Table:
    """Per hash-partition group: exact dedup on ``canon`` (representative
    = min (warc_ts, url), the deterministic keep-first — SURVEY.md §2.9),
    canonical ordering by (doc_key, canon) → ``local_rank``, then
    tokenize once producing the forward index (terms, tfs, doclen).

    Runs as ``groupby("part").map_groups``; the result is
    parallelism-invariant because ordering depends only on data.
    """
    order = pc.sort_indices(
        group,
        sort_keys=[("canon", "ascending"), ("warc_ts", "ascending"), ("url", "ascending")],
    )
    g = group.take(order)
    canon = g.column("canon").to_pylist()
    keep = np.ones(len(canon), dtype=bool)
    for i in range(1, len(canon)):
        if canon[i] == canon[i - 1]:
            keep[i] = False
    g = g.filter(pa.array(keep))
    order2 = pc.sort_indices(
        g, sort_keys=[("doc_key", "ascending"), ("canon", "ascending")]
    )
    g = g.take(order2)

    texts = g.column("text").to_pylist()
    terms_col: list[list[str]] = []
    tfs_col: list[list[int]] = []
    doclens = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        cnt = Counter(tokenize_index(t))
        # ascending term order inside each doc row — canonical layout
        items = sorted(cnt.items())
        terms_col.append([k for k, _ in items])
        tfs_col.append([v for _, v in items])
        doclens[i] = sum(cnt.values())

    return pa.table(
        {
            "part": g.column("part"),
            "local_rank": pa.array(np.arange(len(texts), dtype=np.int64)),
            "url": g.column("url"),
            "canon": g.column("canon"),
            "lang": g.column("lang"),
            "warc_ts": g.column("warc_ts"),
            "doclen": pa.array(doclens),
            "terms": pa.array(terms_col, pa.list_(pa.string())),
            "tfs": pa.array(tfs_col, pa.list_(pa.int32())),
        }
    )


class AssignDocIdStage:
    """fwd row (part, local_rank) → global dense ``doc_id`` via the
    driver-computed per-partition offsets (broadcast once via
    ``ray.put``, fetched zero-copy from the worker's local object store
    on first use — never shipped inside the task closure; SURVEY.md §7.4
    parallelism-invariant doc ids)."""

    def __init__(self, offsets_ref):
        self._ref = offsets_ref
        self._offsets: np.ndarray | None = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._offsets is None:
            self._offsets = np.asarray(ray.get(self._ref), dtype=np.int64)
        part = batch.column("part").to_numpy()
        rank = batch.column("local_rank").to_numpy()
        doc_id = self._offsets[part] + rank
        return batch.append_column("doc_id", pa.array(doc_id, pa.int64()))


class InvertStage:
    """Forward-index batch → posting partials keyed (term, bucket).

    The SPIMI partial step (SURVEY.md §7.1 M5): per batch an in-memory
    ``(term, bucket) → [postings]`` map is built and emitted as one
    Arrow row per key. ``bucket = doc_id // bucket_width`` makes chunk
    doc-ranges disjoint, so the downstream ``groupby(["term","bucket"])``
    merge is skew-bounded (a stop-word-scale term becomes one group per
    bucket, each ≤ bucket_width postings — the salted-hot-key design of
    SURVEY.md §4) and chunks concatenate in bucket order at query time.
    """

    def __init__(self, offsets_ref, bucket_width: int):
        self._ref = offsets_ref
        self._offsets: np.ndarray | None = None
        self.w = int(bucket_width)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._offsets is None:
            self._offsets = np.asarray(ray.get(self._ref), dtype=np.int64)
        part = batch.column("part").to_numpy()
        rank = batch.column("local_rank").to_numpy()
        doc_ids = self._offsets[part] + rank
        terms = batch.column("terms")
        tfs = batch.column("tfs")
        acc: dict[tuple[str, int], tuple[list[int], list[int]]] = {}
        for i in range(len(batch)):
            did = int(doc_ids[i])
            bucket = did // self.w
            row_terms = terms[i].as_py()
            row_tfs = tfs[i].as_py()
            for t, f in zip(row_terms, row_tfs):
                cell = acc.get((t, bucket))
                if cell is None:
                    acc[(t, bucket)] = ([did], [f])
                else:
                    cell[0].append(did)
                    cell[1].append(f)
        keys = list(acc.keys())
        return pa.table(
            {
                "term": pa.array([k[0] for k in keys], pa.string()),
                "bucket": pa.array([k[1] for k in keys], pa.int64()),
                "doc_ids": pa.array([acc[k][0] for k in keys], pa.list_(pa.int64())),
                "tfs": pa.array([acc[k][1] for k in keys], pa.list_(pa.int32())),
            }
        )


class MergeEncodeGroup:
    """Per (term, bucket) group: merge partials → sorted postings →
    delta+varint encoded chunk with block-max metadata (SURVEY.md §7.1
    M5/M6). Needs the doclen array + avgdl (broadcast) to precompute
    idf-independent per-block max impacts."""

    def __init__(self, doclens_ref, avgdl: float, n_term_shards: int, block_size: int):
        self._ref = doclens_ref
        self._doclens: np.ndarray | None = None
        self.avgdl = float(avgdl)
        self.n_shards = int(n_term_shards)
        self.block_size = int(block_size)

    @property
    def doclens(self) -> np.ndarray:
        if self._doclens is None:
            # zero-copy read from the local object store (broadcast side)
            self._doclens = ray.get(self._ref)
        return self._doclens

    def __call__(self, group: pa.Table) -> pa.Table:
        term = group.column("term")[0].as_py()
        bucket = int(group.column("bucket")[0].as_py())
        ids = np.concatenate([np.asarray(x, dtype=np.int64) for x in group.column("doc_ids").to_pylist()])
        tfs = np.concatenate([np.asarray(x, dtype=np.int64) for x in group.column("tfs").to_pylist()])
        order = np.argsort(ids, kind="stable")
        ids, tfs = ids[order], tfs[order]
        impacts = bm25.impact(tfs, self.doclens[ids], self.avgdl)
        chunk = codec.encode_chunk(ids, tfs, impacts, self.block_size)
        return pa.table(
            {
                "term": pa.array([term], pa.string()),
                "bucket": pa.array([bucket], pa.int64()),
                "shard": pa.array([stable_hash64(term) % self.n_shards], pa.int32()),
                "df": pa.array([chunk["df"]], pa.int64()),
                "cf": pa.array([chunk["cf"]], pa.int64()),
                "first_doc": pa.array([chunk["first_doc"]], pa.int64()),
                "last_doc": pa.array([chunk["last_doc"]], pa.int64()),
                "ids_enc": pa.array([chunk["ids_enc"]], pa.binary()),
                "tfs_enc": pa.array([chunk["tfs_enc"]], pa.binary()),
                "block_last": pa.array([chunk["block_last"].tolist()], pa.list_(pa.int64())),
                "block_max": pa.array([chunk["block_max"].tolist()], pa.list_(pa.float64())),
                "ids_boff": pa.array([chunk["ids_boff"].tolist()], pa.list_(pa.int64())),
                "tfs_boff": pa.array([chunk["tfs_boff"].tolist()], pa.list_(pa.int64())),
            }
        )
