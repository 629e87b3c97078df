"""BM25 top-k query path over a published index build.

Replaces the reference's Elasticsearch search round-trip (reference
es8/src/main/java/hbz/limetrans/ElasticsearchClientV8.java:243-246,
``MAX_HITS`` core/.../ElasticsearchClient.java:30) with two scorers that
must (and do — tests/test_index_query.py) return identical top-k:

- :meth:`SearchEngine.search_exhaustive` — decode every posting of every
  query term, vectorized float64 accumulation in ascending term order
  (the canonical summation order shared with the oracle engine);
- :meth:`SearchEngine.search_pruned` — block-max pruning in the WAND
  family: posting chunks are bucket-aligned doc ranges; buckets are
  processed in descending upper-bound order and skipped once their bound
  drops below the running top-k threshold θ; inside a surviving bucket,
  a term's posting *block* is decoded only if its own block-max bound
  plus the other terms' bucket bounds can still beat θ. Skips are
  provably score-safe (a skipped doc's total ≤ the skipped bound < θ),
  so results are exactly the exhaustive top-k.

Determinism: θ only prunes provably-losing docs, and final selection is
``top_k_from_scores`` (score desc, doc_id asc) over exact float64 scores
accumulated in ascending term order — identical across scorers, runs and
build parallelism levels.

Scale notes: a ``bucket_range`` engine (the ServingPool shard) loads
only its doc range's posting chunks, doclen slice and tombstone slice,
and scores in range-local coordinates — per-shard memory is O(range),
never O(max_doc). The full-range engine (bucket_range=None) keeps the
dense layout, appropriate for single-node serving up to ~10^8 docs;
term_stats stay corpus-global everywhere so shard-local scores equal
whole-index scores exactly.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions import codec
from ..functions.analyzer import (
    MAX_PREFIX_EXPANSIONS,
    _extract_wildcards,
    parse_query,
    parse_simple_query,
    simple_terms,
)
from ..state import bm25
from ..state.manifest import build_dir, current_build

logger = logging.getLogger(__name__)


def _intersect_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Intersection of two sorted-unique int64 arrays. Binary-searches
    the smaller into the larger — O(min·log max) and no allocation of a
    concat copy, vs np.intersect1d's full sort of the concatenation
    (which dominates when postings reach 10^6+ entries)."""
    if len(a) > len(b):
        a, b = b, a
    if len(a) == 0:
        return a
    idx = np.searchsorted(b, a)
    idx[idx == len(b)] = 0
    return a[b[idx] == a]


def _union_sorted(arrs: list[np.ndarray], dedupe: bool = True) -> np.ndarray:
    """Union of pre-sorted int64 arrays. numpy's stable sort on integer
    dtypes is a radix sort (O(n), comparison-free), so concat+stable-sort
    beats np.union1d's quicksort; duplicates are dropped with one
    neighbor-compare pass instead of np.unique's sort. Pass
    ``dedupe=False`` when the inputs are known pairwise-disjoint."""
    arrs = [a for a in arrs if len(a)]
    if not arrs:
        return np.zeros(0, dtype=np.int64)
    if len(arrs) == 1:
        return arrs[0]
    out = np.concatenate(arrs)
    out.sort(kind="stable")
    return _dedupe_sorted(out) if dedupe else out


def _dedupe_sorted(a: np.ndarray) -> np.ndarray:
    """np.unique for an already-sorted array — one vectorized
    neighbor-compare, no sort."""
    if len(a) < 2:
        return a
    keep = np.empty(len(a), dtype=bool)
    keep[0] = True
    np.not_equal(a[1:], a[:-1], out=keep[1:])
    return a[keep]


@dataclass
class _Chunk:
    first_doc: int
    last_doc: int
    ids_enc: bytes
    tfs_enc: bytes
    block_last: np.ndarray
    block_max: np.ndarray  # effective: encode-time maxima × stale-avgdl scale
    ids_boff: np.ndarray
    tfs_boff: np.ndarray
    pos_enc: bytes | None = None  # per-posting position runs (phrase support)
    df: int = 0  # posting count (FOR block sizing needs it)
    ids_codec: str = "varint"  # doc-id gap encoding: "varint" | "for"


def _decode_chunk(c: _Chunk, block_size: int) -> tuple[np.ndarray, np.ndarray]:
    """Whole-chunk decode → (ids int64, tfs int64), dispatching on the
    chunk's id codec (varint LEB128 or FOR bit-packing)."""
    if c.ids_codec == "for":
        ids = codec.for_decode_chunk_ids(c.ids_enc, c.first_doc, c.df, block_size)
        return ids, codec.varint_decode(c.tfs_enc).astype(np.int64)
    return codec.decode_chunk(c.ids_enc, c.tfs_enc)


def _decode_chunk_blocks(
    c: _Chunk, blo: int, bhi: int, block_size: int
) -> tuple[np.ndarray, np.ndarray]:
    """Partial decode of blocks ``blo:bhi`` only (block-max pruning path),
    dispatching on the chunk's id codec."""
    if c.ids_codec == "for":
        ids = codec.for_decode_block_ids(
            c.ids_enc, c.ids_boff, c.block_last, c.first_doc, c.df,
            blo, bhi, block_size,
        )
        t_end = int(c.tfs_boff[bhi]) if bhi < len(c.tfs_boff) else len(c.tfs_enc)
        tfs = codec.varint_decode(
            memoryview(c.tfs_enc)[int(c.tfs_boff[blo]) : t_end]
        ).astype(np.int64)
        return ids, tfs
    return codec.decode_blocks(
        c.ids_enc, c.tfs_enc, c.ids_boff, c.tfs_boff, c.block_last, blo, bhi
    )


class SearchEngine:
    """Loads a published build (CURRENT pointer) and serves top-k BM25."""

    def __init__(
        self,
        index_root: str,
        build_id: str | None = None,
        *,
        preload: bool = True,
        bucket_range: tuple[int, int] | None = None,
    ):
        """``bucket_range=(lo, hi)``: load only posting chunks whose doc
        range falls in buckets [lo, hi) — the doc-partitioned serving
        shard used by :class:`ServingPool`. Global stats (N, avgdl, df,
        doclens) stay corpus-wide, so shard-local scores equal the
        whole-index scores and scatter-gather merge is exact."""
        import json

        self._bucket_range = bucket_range
        build_id = build_id or current_build(index_root)
        self.bdir = build_dir(index_root, build_id)
        with open(os.path.join(self.bdir, "stats.json")) as fh:
            self.stats = json.load(fh)
        self.n_docs = int(self.stats["n_docs"])
        self.max_doc = int(self.stats.get("max_doc", self.n_docs - 1))
        self.avgdl = float(self.stats["avgdl"])
        # index-then-query analyzer contract: the query side MUST use
        # the profile the index was built with (recorded in stats.json),
        # including per-field search analyzers (ES search_analyzer)
        self.analyzer_profile = self.stats.get("analyzer_profile", "full")
        self.field_analyzers = self.stats.get("fields") or None
        self._block_size = int(
            self.stats.get("config", {}).get("block_size", codec.BLOCK_SIZE)
        )

        # doc-range-local state: a bucket_range shard holds ONLY its
        # range's doclen/tombstone slices and scores in range-local
        # coordinates (global id - _base) — no dense max_doc+1 arrays
        # per serving shard (the 10^12-doc memory contract)
        w_cfg = int(self.stats["bucket_width"])
        if bucket_range is not None:
            lo, hi = bucket_range
            self._base = int(lo) * w_cfg
            self._span = max(0, min(int(hi) * w_cfg, self.max_doc + 1) - self._base)
        else:
            self._base = 0
            self._span = self.max_doc + 1

        doc_filters = None
        if bucket_range is not None:
            doc_filters = [
                ("doc_id", ">=", self._base),
                ("doc_id", "<", self._base + self._span),
            ]
        docs = pq.read_table(
            os.path.join(self.bdir, "docs"),
            columns=["doc_id", "doclen"],
            filters=doc_filters,
        )
        self.doclens = np.zeros(self._span, dtype=np.int64)
        self.doclens[docs.column("doc_id").to_numpy() - self._base] = docs.column(
            "doclen"
        ).to_numpy()

        ts = pq.read_table(os.path.join(self.bdir, "term_stats"))
        self.df = dict(
            zip(ts.column("term").to_pylist(), ts.column("df").to_numpy().tolist())
        )
        self._sorted_terms: list[str] | None = None  # built on first wildcard

        # deletion tombstones (update mode): filtered out of every result
        self._deleted = np.zeros(self._span, dtype=bool)
        tomb_path = os.path.join(self.bdir, "tombstones.json")
        if os.path.exists(tomb_path):
            import json as _json

            with open(tomb_path) as fh:
                ids = _json.load(fh)["doc_ids"]
            if ids:
                ids = np.asarray(ids, dtype=np.int64)
                ids = ids[(ids >= self._base) & (ids < self._base + self._span)]
                self._deleted[ids - self._base] = True

        self._seg_dir = os.path.join(self.bdir, "segments")
        self._segments: pa.Table | None = None
        self._term_rows: dict[str, list[int]] | None = None
        self._lazy_term_files: dict[str, list[str]] | None = None
        # warmed-serving caches (the ES filesystem/query-cache analogue):
        # parsed chunk metadata per term, and decoded postings per term
        # bounded by a postings budget (LRU).
        self._chunk_cache: dict[str, list[_Chunk]] = {}
        self._pos_cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        self._full_cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        self._decoded_cache: "dict[str, list[tuple[np.ndarray, np.ndarray]]]" = {}
        self._decoded_postings = 0
        # cache budgets scale with the engine's doc slice: a term can
        # legally appear in every doc (~41% df was observed in bench
        # webtext), so a fixed budget thrashes the moment a handful of
        # hot query terms outgrow it — every query then re-decodes ≈the
        # whole working set (measured 6×+ warm-latency cliff at the 3.2M
        # tier). 16 postings/doc of budget holds ~a dozen worst-case
        # terms; serving shards are doc-range-partitioned, so per-shard
        # n_docs — and therefore this cache — stays bounded at fleet
        # scale.
        slice_docs = min(self.n_docs, self._span)
        self._decoded_budget = max(20_000_000, 16 * max(slice_docs, 1))
        # per-chunk decoded positions (doc-repeated ids + raw positions)
        # for terms whose range-pruned queries never decode every chunk —
        # without this, chunk pruning re-decodes the same hot chunks on
        # every phrase query; occurrence-budgeted LRU over terms
        self._poschunk_cache: "dict[str, list] " = {}
        self._poschunk_occ = 0
        self._poschunk_budget = max(20_000_000, 16 * max(slice_docs, 1))
        # promoted full decodes share the same occurrence budget — a
        # long-lived shard serving many distinct phrase terms must not
        # grow without bound
        self._pos_occ = 0
        if preload:
            self._preload_segments()

    # ------------------------------------------------------------------ io

    def _segment_files(self) -> list[str]:
        """All segment parquet files — pruned to this shard's doc range
        when the build wrote the hive ``bslice=`` doc-range layout: a
        slice dir disjoint from ``bucket_range`` is skipped entirely, so
        a shard's startup IO is its slice fraction of the index, not a
        full scan. Files OUTSIDE slice dirs (incremental delta segments,
        pre-layout builds) are always listed and range-filtered in
        memory as before."""
        import re as _re

        bounds = self.stats.get("segment_slice_bounds")
        br = self._bucket_range
        out = []
        for root, _dirs, fs in os.walk(self._seg_dir):
            if br is not None and bounds:
                m = _re.search(r"bslice=(\d+)", os.path.relpath(root, self._seg_dir))
                if m:
                    s = int(m.group(1))
                    if s + 1 < len(bounds) and (
                        bounds[s + 1] <= br[0] or bounds[s] >= br[1]
                    ):
                        continue
            out.extend(os.path.join(root, f) for f in fs if f.endswith(".parquet"))
        return sorted(out)

    def _with_enc_avgdl(self, tbl: pa.Table) -> pa.Table:
        """Base-build segment rows predate incremental updates and carry
        no ``enc_avgdl`` column — they were encoded under the build's
        original avgdl (stats ``base_avgdl``). Pre-positions builds lack
        ``pos_enc`` (phrase queries then raise)."""
        if "enc_avgdl" not in tbl.schema.names:
            base = float(self.stats.get("base_avgdl", self.avgdl))
            tbl = tbl.append_column(
                "enc_avgdl", pa.array(np.full(tbl.num_rows, base))
            )
        if "pos_enc" not in tbl.schema.names:
            tbl = tbl.append_column(
                "pos_enc", pa.array([None] * tbl.num_rows, pa.binary())
            )
        if "ids_codec" not in tbl.schema.names:
            # pre-FOR builds and incremental update deltas are varint
            tbl = tbl.append_column(
                "ids_codec", pa.array(["varint"] * tbl.num_rows, pa.string())
            )
        return tbl

    _SEG_COLS = [
        "term", "first_doc", "last_doc", "df", "ids_enc", "tfs_enc", "pos_enc",
        "block_last", "block_max", "ids_boff", "tfs_boff", "enc_avgdl",
        "ids_codec",
    ]

    _READ_THREADS = 16

    def _read_tables(self, files: list[str], **kw) -> list[pa.Table]:
        """Read many segment files concurrently — parquet decode releases
        the GIL, and the hive ``bslice=`` layout legitimately fans out to
        O(merge tasks × slices) small files, so serial per-file reads
        would dominate engine startup."""
        from concurrent.futures import ThreadPoolExecutor

        if len(files) <= 2:
            return [pq.read_table(f, **kw) for f in files]
        with ThreadPoolExecutor(max_workers=self._READ_THREADS) as ex:
            return list(ex.map(lambda f: pq.read_table(f, **kw), files))

    def _preload_segments(self) -> None:
        tables = [
            self._with_enc_avgdl(t).select(self._SEG_COLS)
            for t in self._read_tables(self._segment_files())
        ]
        tbl = pa.concat_tables(tables)
        if self._bucket_range is not None:
            w = int(self.stats["bucket_width"])
            buckets = pc.divide(tbl.column("first_doc"), w)
            lo, hi = self._bucket_range
            tbl = tbl.filter(
                pc.and_(pc.greater_equal(buckets, lo), pc.less(buckets, hi))
            )
        self._segments = tbl
        rows: dict[str, list[int]] = {}
        for i, t in enumerate(tbl.column("term").to_pylist()):
            rows.setdefault(t, []).append(i)
        self._term_rows = rows

    def _chunks(self, term: str) -> list[_Chunk]:
        cached = self._chunk_cache.get(term)
        if cached is not None:
            return cached
        if self._segments is not None:
            idxs = self._term_rows.get(term, [])
            rows = [self._segments.slice(i, 1) for i in idxs]
        else:
            if self._lazy_term_files is None:
                # one threaded pass over just the term columns builds a
                # term → files map, so each lazy term read opens only
                # its own files instead of every segment file
                tf: dict[str, list[str]] = {}
                files = self._segment_files()
                for f, t in zip(
                    files, self._read_tables(files, columns=["term"])
                ):
                    for term_s in set(t.column("term").to_pylist()):
                        tf.setdefault(term_s, []).append(f)
                self._lazy_term_files = tf
            rows = []
            for f in self._lazy_term_files.get(term, ()):
                tbl = self._with_enc_avgdl(
                    pq.read_table(f, filters=[("term", "==", term)])
                )
                if self._bucket_range is not None:
                    # lazy path must honor the shard's doc range too —
                    # unfiltered chunks would index out of the
                    # range-local doclen/accumulator arrays
                    w = int(self.stats["bucket_width"])
                    buckets = pc.divide(tbl.column("first_doc"), w)
                    lo, hi = self._bucket_range
                    tbl = tbl.filter(
                        pc.and_(
                            pc.greater_equal(buckets, lo), pc.less(buckets, hi)
                        )
                    )
                rows.extend(tbl.slice(i, 1) for i in range(len(tbl)))
        chunks = []
        for r in rows:
            # stale-stats safety: impact is increasing in avgdl and
            # impact(a_now)/impact(a_enc) ≤ a_now/a_enc for tf ≥ 1, so
            # scaling encode-time block maxima keeps pruning score-safe
            # after incremental updates changed avgdl.
            enc_avgdl = r.column("enc_avgdl")[0].as_py()
            scale = max(1.0, self.avgdl / float(enc_avgdl))
            chunks.append(
                _Chunk(
                    first_doc=r.column("first_doc")[0].as_py(),
                    last_doc=r.column("last_doc")[0].as_py(),
                    ids_enc=r.column("ids_enc")[0].as_py(),
                    tfs_enc=r.column("tfs_enc")[0].as_py(),
                    block_last=np.asarray(r.column("block_last")[0].as_py(), dtype=np.int64),
                    block_max=np.asarray(r.column("block_max")[0].as_py(), dtype=np.float64)
                    * scale,
                    ids_boff=np.asarray(r.column("ids_boff")[0].as_py(), dtype=np.int64),
                    tfs_boff=np.asarray(r.column("tfs_boff")[0].as_py(), dtype=np.int64),
                    pos_enc=r.column("pos_enc")[0].as_py(),
                    df=int(r.column("df")[0].as_py()),
                    ids_codec=r.column("ids_codec")[0].as_py() or "varint",
                )
            )
        chunks.sort(key=lambda c: c.first_doc)
        self._chunk_cache[term] = chunks
        return chunks

    def _decoded(self, term: str) -> list[tuple[np.ndarray, np.ndarray]]:
        """Decoded (ids, tfs) per chunk, LRU-cached under a postings
        budget — repeat queries on hot terms skip the varint decode."""
        cached = self._decoded_cache.get(term)
        if cached is not None:
            # true LRU: refresh recency so hot terms survive eviction
            self._decoded_cache[term] = self._decoded_cache.pop(term)
            return cached
        parts = [_decode_chunk(c, self._block_size) for c in self._chunks(term)]
        n = sum(len(p[0]) for p in parts)
        if n and self._decoded_postings + n > self._decoded_budget:
            while self._decoded_cache and self._decoded_postings + n > self._decoded_budget:
                oldest = next(iter(self._decoded_cache))
                v = self._decoded_cache.pop(oldest)
                self._decoded_postings -= sum(len(x[0]) for x in v)
        self._decoded_cache[term] = parts
        self._decoded_postings += n
        return parts

    _FULL_CACHE_TERMS = 128

    def _postings(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        """Full decoded postings of ``term`` (concatenated chunks),
        LRU-cached — hot query terms skip the per-query concat copy
        (~16 MB for a stop-word-scale term)."""
        got = self._full_cache.get(term)
        if got is not None:
            self._full_cache[term] = self._full_cache.pop(term)
            return got
        parts = self._decoded(term)
        if not parts:
            out = (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64))
        else:
            out = (
                np.concatenate([p[0] for p in parts]),
                np.concatenate([p[1] for p in parts]),
            )
        while len(self._full_cache) >= self._FULL_CACHE_TERMS:
            self._full_cache.pop(next(iter(self._full_cache)))
        self._full_cache[term] = out
        return out

    # ------------------------------------------------------------ wildcards

    # ES simple_query_string analyze_wildcard default-ish cap: expansion
    # is the LEXICOGRAPHICALLY FIRST N dictionary terms under the prefix
    # (deterministic, oracle-mirrorable); over-cap expansions are logged,
    # never silent
    MAX_PREFIX_EXPANSIONS = MAX_PREFIX_EXPANSIONS

    def _expand_prefix(self, prefix: str, field: str | None) -> tuple[str, ...]:
        """Term-dictionary prefix expansion (the analyze_wildcard
        analogue, reference ElasticsearchQueryTest.java:315-354): all
        indexed terms starting with the (field-qualified) prefix,
        capped. The sorted dictionary is built once per engine on first
        use; the scan after the bisect touches matches only."""
        from bisect import bisect_left

        from ..functions.analyzer import qualify

        p = qualify(field, prefix)
        st = self._sorted_terms
        if st is None:
            st = self._sorted_terms = sorted(self.df)
        lo = bisect_left(st, p)
        hi = lo
        n = len(st)
        limit = self.MAX_PREFIX_EXPANSIONS
        while hi < n and st[hi].startswith(p):
            hi += 1
            if hi - lo > limit:
                logger.warning(
                    "wildcard %s* expands past %d dictionary terms — "
                    "capped at the lexicographically first %d",
                    p, limit, limit,
                )
                break
        return tuple(st[lo : lo + limit][: hi - lo])

    def _expand_clauses(self, clauses: list[dict]) -> list[dict]:
        """Rewrite prefix clauses into expanded term clauses; the
        scorers then see only term/phrase clauses. An expansion with no
        dictionary hits yields an empty variant group — exactly a term
        with zero postings (AND yields no matches, OR contributes
        nothing)."""
        out = []
        for c in clauses:
            if c["type"] == "prefix":
                out.append(
                    {
                        "type": "term",
                        "variants": self._expand_prefix(
                            c["prefix"], c.get("field")
                        ),
                    }
                )
            else:
                out.append(c)
        return out

    # -------------------------------------------------------------- scoring

    def _prepare(self, query: str):
        # parse_query handles field-scoped clauses (field:term) too —
        # qualified variants are ordinary terms to the scorers. Phrase
        # clauses degrade to their slot term groups here: search_pruned /
        # search_exhaustive are public scorers, and a quoted query passed
        # to them directly scores the words as plain AND terms (use
        # search() / search_phrases for positional phrase semantics).
        if self.analyzer_profile == "simple":
            if self.field_analyzers:
                # fielded simple profile: field-scoped clauses qualify,
                # keyword fields match their normalized whole value;
                # phrase clauses degrade to their slot term groups here
                # (same public-scorer contract as the full profile)
                groups = []
                for c in self._expand_clauses(
                    parse_simple_query(query, field_analyzers=self.field_analyzers)
                ):
                    if c["type"] == "term":
                        groups.append(c["variants"])
                    else:
                        groups.extend(tuple(g) for g in c["slots"])
            else:
                # simple profile: one single-variant group per token (no
                # hyphen multiplexing / stemming / stop words); trailing
                # stars expand over the dictionary like the full profile
                body, wilds = _extract_wildcards(query)
                groups = [(t,) for t in simple_terms(body)]
                for w in wilds:
                    toks = simple_terms(w)
                    groups.extend((t,) for t in toks[:-1])
                    if toks:
                        groups.append(self._expand_prefix(toks[-1], None))
        else:
            groups = []
            for c in self._expand_clauses(
                parse_query(query, field_analyzers=self.field_analyzers)
            ):
                if c["type"] == "term":
                    groups.append(c["variants"])
                else:
                    groups.extend(tuple(g) for g in c["slots"])
        terms = sorted({t for g in groups for t in g if t in self.df})
        idfs = {t: bm25.idf(self.df[t], self.n_docs) for t in terms}
        return groups, terms, idfs

    def search(self, query: str, k: int = 10, mode: str = "and", pruned: bool = True):
        if '"' in query:
            clauses = self._expand_clauses(
                parse_simple_query(query, field_analyzers=self.field_analyzers)
                if self.analyzer_profile == "simple"
                else parse_query(query, field_analyzers=self.field_analyzers)
            )
            if any(c["type"] == "phrase" for c in clauses):
                return self.search_phrases(clauses, k, mode)
        if pruned:
            return self.search_pruned(query, k, mode)
        return self.search_exhaustive(query, k, mode)

    # -------------------------------------------------------------- phrases

    def _doc_positions(
        self, term: str, doc_range: tuple[int, int] | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Flat (doc_id repeated per occurrence, raw position) arrays
        for ``term``, doc-ascending. Fully decoded results are cached;
        with ``doc_range=(lo, hi)`` (inclusive) and a cold cache, only
        chunks overlapping the range are decoded (positional chunk
        pruning — candidate-driven phrase queries touch a doc range far
        smaller than the term's full posting list)."""
        cached = self._pos_cache.get(term)
        if cached is not None:
            self._pos_cache[term] = self._pos_cache.pop(term)  # LRU touch
            if doc_range is None:
                return cached
            d, p = cached
            lo = np.searchsorted(d, doc_range[0], side="left")
            hi = np.searchsorted(d, doc_range[1], side="right")
            return d[lo:hi], p[lo:hi]
        chunks = self._chunks(term)
        parts = self._poschunk_cache.get(term)
        if parts is not None:  # LRU recency refresh
            self._poschunk_cache[term] = self._poschunk_cache.pop(term)
        else:
            parts = [None] * len(chunks)
            self._poschunk_cache[term] = parts
        ids_all, pos_all = [], []
        partial = False
        for ci, c in enumerate(chunks):
            if c.pos_enc is None:
                raise ValueError(
                    "this index was built without positions (pre-phrase "
                    "format); rebuild to run phrase queries"
                )
            if doc_range is not None and (
                c.last_doc < doc_range[0] or c.first_doc > doc_range[1]
            ):
                partial = True  # pruned a chunk — decode it another day
                continue
            part = parts[ci]
            if part is None:
                ids, tfs = self._decoded(term)[ci]
                vstarts = np.zeros(len(tfs), dtype=np.int64)
                np.cumsum(tfs[:-1], out=vstarts[1:])
                deltas = codec.varint_decode(c.pos_enc).astype(np.int64)
                pos = codec.segmented_delta_decode(deltas, vstarts)
                part = (np.repeat(ids, tfs), pos)
                parts[ci] = part
                self._poschunk_occ += len(pos)
                # evict other terms' chunk decodes, oldest first, to keep
                # decoded positions under the budget (the term being
                # assembled stays — it is the recency head by definition)
                while (
                    self._poschunk_occ > self._poschunk_budget
                    and len(self._poschunk_cache) > 1
                ):
                    oldest = next(iter(self._poschunk_cache))
                    if oldest == term:
                        break
                    dropped = self._poschunk_cache.pop(oldest)
                    self._poschunk_occ -= sum(
                        len(x[1]) for x in dropped if x is not None
                    )
            ids_all.append(part[0])
            pos_all.append(part[1])
        out = (
            np.concatenate(ids_all) if ids_all else np.zeros(0, dtype=np.int64),
            np.concatenate(pos_all) if pos_all else np.zeros(0, dtype=np.int64),
        )
        if not partial:
            # every chunk decoded: promote to the flat cache (O(log)
            # range slicing from here on) and release the chunk parts
            self._pos_cache[term] = out
            self._pos_occ += len(out[1])
            self._poschunk_cache.pop(term, None)
            self._poschunk_occ -= len(out[1])
            while (
                self._pos_occ > self._poschunk_budget
                and len(self._pos_cache) > 1
            ):
                oldest = next(iter(self._pos_cache))
                if oldest == term:
                    break
                self._pos_occ -= len(self._pos_cache.pop(oldest)[1])
        return out

    _POS_K = np.int64(1) << np.int64(32)  # (doc, pos) packing base

    def search_phrases(self, clauses: list[dict], k: int = 10, mode: str = "and"):
        """Scoring with phrase clauses (parse_query contract: phrases
        FILTER — consecutive raw positions, any variant per slot — and
        BM25 still sums over every clause's variant terms).

        Candidate-driven: clause match sets are SORTED doc-id arrays,
        position keys are built only for candidate docs, and BM25
        accumulates into a len(final)-sized vector — memory is
        O(postings touched), never O(max_doc), so the path serves at
        shard scale. Set algebra avoids comparison sorts: postings and
        (doc,pos) keys arrive pre-sorted, so intersections are binary
        searches (`_intersect_sorted`) and unions are radix-sort merges
        (`_union_sorted`) — np.intersect1d/union1d re-sort their concat
        every call, which dominated warm phrase latency at 10^6+ doc
        posting sizes (observed 6× per index doubling)."""
        if not clauses:
            return []
        clauses = self._expand_clauses(clauses)  # public entry — idempotent
        groups: list[tuple[str, ...]] = []
        for c in clauses:
            if c["type"] == "phrase":
                groups.extend(c["slots"])
                if c.get("alt"):
                    groups.append(c["alt"])
            else:
                groups.append(c["variants"])
        terms = sorted({t for g in groups for t in g if t in self.df})
        idfs = {t: bm25.idf(self.df[t], self.n_docs) for t in terms}

        def union_ids(variants) -> np.ndarray:
            arrs = [self._postings(t)[0] for t in variants if t in self.df]
            return _union_sorted(arrs)

        def phrase_docs(slots) -> np.ndarray:
            # candidate pre-filter: docs containing every slot,
            # intersected rarest-first so the running set collapses as
            # early as the most selective slot allows
            unions = [union_ids(s) for s in slots]
            cand = None
            for s in sorted(unions, key=len):
                if len(s) == 0:
                    return np.zeros(0, dtype=np.int64)
                cand = s if cand is None else _intersect_sorted(cand, s)
                if len(cand) == 0:
                    return np.zeros(0, dtype=np.int64)
            # (doc, pos - slot_index) keys over candidate docs only; the
            # phrase exists iff some shifted key survives intersection.
            # Membership via a _span-sized bool mask — the same memory
            # envelope as the doclen slice, O(|postings|) instead of
            # |postings|·log|candidates|. Slots are processed rarest
            # union first (intersection is commutative; each slot's
            # position shift uses its ORIGINAL index) and the mask is
            # re-tightened to the surviving anchor docs after every
            # slot, so a selective slot shrinks the postings the common
            # slots must key.
            cand_mask = np.zeros(self._span, dtype=bool)
            cand_mask[cand - self._base] = True
            lo, hi = int(cand[0]), int(cand[-1])
            anchor = None
            L = len(slots)  # +L keeps the shifted position positive, so
            # packed (doc, pos) keys never borrow into the doc part
            order = sorted(range(L), key=lambda j: len(unions[j]))
            for i in order:
                keys_i = []
                for t in slots[i]:
                    if t not in self.df:
                        continue
                    d, p = self._doc_positions(t, doc_range=(lo, hi))
                    keep = cand_mask[d - self._base]
                    d, p = d[keep], p[keep]
                    keys_i.append(d * self._POS_K + (p - i + L))
                if not keys_i:
                    return np.zeros(0, dtype=np.int64)
                # per-term keys are sorted (postings are doc-ascending
                # with ascending positions) and disjoint ACROSS variants
                # (one raw token per (doc, position)) — a radix-sort
                # merge with no dedupe is exact
                ks = _union_sorted(keys_i, dedupe=False)
                anchor = ks if anchor is None else _intersect_sorted(anchor, ks)
                if len(anchor) == 0:
                    return np.zeros(0, dtype=np.int64)
                docs = _dedupe_sorted(anchor // self._POS_K)
                if len(docs) < len(cand):  # tighten for remaining slots
                    cand_mask[:] = False
                    cand_mask[docs - self._base] = True
                    cand = docs
                    lo, hi = int(docs[0]), int(docs[-1])
            return _dedupe_sorted(anchor // self._POS_K)

        final = None
        for c in clauses:
            if c["type"] == "phrase":
                ids = phrase_docs(c["slots"])
                if c.get("alt"):
                    # keyword-field alternative: exact normalized value
                    ids = _union_sorted([ids, union_ids(c["alt"])])
            else:
                ids = union_ids(c["variants"])
            if final is None:
                final = ids
            elif mode == "and":
                final = _intersect_sorted(final, ids)
            else:
                final = _union_sorted([final, ids])
            if mode == "and" and len(final) == 0:
                return []
        final = final[~self._deleted[final - self._base]]
        if len(final) == 0:
            return []
        # BM25 over the final docs only, ascending term order (the
        # canonical float summation order — identical to the oracle)
        scores = np.zeros(len(final), dtype=np.float64)
        for t in terms:
            ids, tfs = self._postings(t)
            idx = np.searchsorted(final, ids)
            idx[idx == len(final)] = 0
            hit = final[idx] == ids
            if not hit.any():
                continue
            scores[idx[hit]] += idfs[t] * bm25.impact(
                tfs[hit], self.doclens[ids[hit] - self._base], self.avgdl
            )
        return bm25.top_k_from_scores(final, scores, k)

    def search_exhaustive(self, query: str, k: int = 10, mode: str = "and"):
        groups, terms, idfs = self._prepare(query)
        if not groups:
            return []
        # range-local accumulators (span == max_doc+1 for a full engine)
        acc = np.zeros(self._span, dtype=np.float64)
        seen = np.zeros(self._span, dtype=bool)
        postings = {}
        for t in terms:  # ascending term order — canonical float summation
            ids, tfs = self._postings(t)
            local = ids - self._base
            postings[t] = local
            imp = bm25.impact(tfs, self.doclens[local], self.avgdl)
            acc[local] += idfs[t] * imp
            seen[local] = True
        # group coverage for AND/OR
        mask = None
        for g in groups:
            gmask = np.zeros(self._span, dtype=bool)
            any_term = False
            for t in g:
                if t in postings:
                    gmask[postings[t]] = True
                    any_term = True
            if not any_term:
                gmask[:] = False
            if mask is None:
                mask = gmask
            elif mode == "and":
                mask &= gmask
            else:
                mask |= gmask
        final = mask if mask is not None else seen
        final &= ~self._deleted  # tombstoned docs never surface
        docs = np.flatnonzero(final)
        return bm25.top_k_from_scores(docs + self._base, acc[docs], k)

    def search_pruned(self, query: str, k: int = 10, mode: str = "and"):
        groups, terms, idfs = self._prepare(query)
        if not groups:
            return []
        if not terms:
            return []
        w = int(self.stats["bucket_width"])
        bsz = int(self.stats.get("config", {}).get("block_size", codec.BLOCK_SIZE))
        term_chunks: dict[str, dict[int, tuple[int, _Chunk]]] = {}
        buckets: set[int] = set()
        for t in terms:
            by_bucket = {
                c.first_doc // w: (ci, c) for ci, c in enumerate(self._chunks(t))
            }
            term_chunks[t] = by_bucket
            buckets.update(by_bucket)
        if not buckets:
            return []
        # per-bucket upper bound: Σ_t idf_t * max block impact in bucket
        blist = sorted(buckets)
        ub = np.zeros(len(blist), dtype=np.float64)
        bpos = {b: i for i, b in enumerate(blist)}
        for t in terms:
            for b, (_ci, c) in term_chunks[t].items():
                ub[bpos[b]] += idfs[t] * float(c.block_max.max())
        # process buckets in (ub desc, bucket asc) order
        order = np.lexsort((np.asarray(blist), -ub))
        results: list[tuple[int, float]] = []
        theta = -np.inf
        for oi in order:
            b = blist[oi]
            if len(results) >= k and ub[oi] < theta:
                break  # all remaining buckets have even lower bounds
            lo = b * w
            acc = np.zeros(w, dtype=np.float64)
            gmasks = [np.zeros(w, dtype=bool) for _ in groups]
            for t in terms:  # ascending term order
                entry = term_chunks[t].get(b)
                if entry is None:
                    continue
                ci, c = entry
                # block-level refinement: decode only blocks whose own
                # bound + other terms' bucket bound can still beat θ
                other_ub = ub[bpos[b]] - idfs[t] * float(c.block_max.max())
                nblocks = len(c.block_last)
                want = np.flatnonzero(idfs[t] * c.block_max + other_ub >= theta) \
                    if len(results) >= k else np.arange(nblocks)
                if len(want) == 0:
                    continue
                cached = self._decoded_cache.get(t)
                runs = np.split(want, np.flatnonzero(np.diff(want) > 1) + 1)
                ids_all, tfs_all = [], []
                for run in runs:
                    blo, bhi = int(run[0]), int(run[-1]) + 1
                    if cached is not None:
                        ids_r = cached[ci][0][blo * bsz : bhi * bsz]
                        tfs_r = cached[ci][1][blo * bsz : bhi * bsz]
                    else:
                        ids_r, tfs_r = _decode_chunk_blocks(c, blo, bhi, bsz)
                    ids_all.append(ids_r)
                    tfs_all.append(tfs_r)
                ids = np.concatenate(ids_all)
                tfs = np.concatenate(tfs_all)
                imp = bm25.impact(tfs, self.doclens[ids - self._base], self.avgdl)
                local = ids - lo
                acc[local] += idfs[t] * imp
                for gi, g in enumerate(groups):
                    if t in g:
                        gmasks[gi][local] = True
            if mode == "and":
                mask = np.ones(w, dtype=bool)
                for gi, gm in enumerate(gmasks):
                    mask &= gm
            else:
                mask = np.zeros(w, dtype=bool)
                for gm in gmasks:
                    mask |= gm
            dslice = self._deleted[lo - self._base : lo - self._base + w]
            mask[: len(dslice)] &= ~dslice
            local_docs = np.flatnonzero(mask)
            if len(local_docs) == 0:
                continue
            cand = bm25.top_k_from_scores(local_docs + lo, acc[local_docs], k)
            results = _merge_topk(results, cand, k)
            if len(results) >= k:
                theta = results[-1][1]
        return results[:k]


def _merge_topk(a: list[tuple[int, float]], b: list[tuple[int, float]], k: int):
    merged = sorted(a + b, key=lambda x: (-x[1], x[0]))
    return merged[:k]


class ServingPool:
    """Doc-range-sharded distributed serving (the multi-node query path).

    N Ray actors each load only the posting chunks of their bucket range
    (the bucket layout partitions doc ids, so a doc lives wholly in one
    shard); every query scatters to all shards and the per-shard top-k
    merge under (score desc, doc_id asc) is exactly the single-engine
    top-k, because BM25 stats stay corpus-global per shard. This is the
    ES shard scatter-gather analogue (reference ElasticsearchClient
    search path); each actor holds only its range's doclen/tombstone
    slices and scores in range-local coordinates (O(range) memory).

    Determinism: shard results are merged in shard order with the same
    tie-break as every other scorer; tests assert pool == single engine.
    """

    def __init__(self, index_root: str, n_shards: int = 4, *, build_id: str | None = None):
        import json as _json

        import ray as _ray

        build_id = build_id or current_build(index_root)
        bdir = build_dir(index_root, build_id)
        with open(os.path.join(bdir, "stats.json")) as fh:
            stats = _json.load(fh)
        w = int(stats["bucket_width"])
        n_buckets = int(stats["max_doc"]) // w + 1
        n_shards = max(1, min(n_shards, n_buckets))
        bounds = np.linspace(0, n_buckets, n_shards + 1).astype(int)

        @_ray.remote
        class _ShardServer:
            def __init__(self, root, bid, lo, hi):
                self.engine = SearchEngine(
                    root, bid, preload=True, bucket_range=(int(lo), int(hi))
                )

            def search(self, query: str, k: int, mode: str):
                return self.engine.search(query, k, mode=mode)

        self._shards = [
            _ShardServer.remote(index_root, build_id, bounds[i], bounds[i + 1])
            for i in range(n_shards)
        ]
        self._ray = _ray
        self.n_shards = n_shards

    def search(self, query: str, k: int = 10, mode: str = "and"):
        futures = [s.search.remote(query, k, mode) for s in self._shards]
        out: list[tuple[int, float]] = []
        for part in self._ray.get(futures):
            out = _merge_topk(out, [tuple(r) for r in part], k)
        return out

    def search_many(self, queries: list[str], k: int = 10, mode: str = "and"):
        """Pipelined scatter-gather over a query batch."""
        futures = {
            q: [s.search.remote(q, k, mode) for s in self._shards] for q in queries
        }
        results = {}
        for q, fs in futures.items():
            out: list[tuple[int, float]] = []
            for part in self._ray.get(fs):
                out = _merge_topk(out, [tuple(r) for r in part], k)
            results[q] = out
        return results

    def shutdown(self) -> None:
        for s in self._shards:
            self._ray.kill(s)
        self._shards = []
