"""Index-build stage callables (map_batches / map_groups bodies).

Each class follows the reference's state-loaded-once pattern
(SURVEY.md §2.5: lookup maps loaded per process, used per record —
reference main/src/main/java/hbz/limetrans/Limetrans.java:335-366): all
setup (regex compile, broadcast ``ray.get``) happens in ``__init__`` /
first call, per-batch work is vectorized.

Shuffle design (SURVEY.md §4 / §7.3): the dedup + doc-id assignment
exchange moves ONLY keys — ``(canon, doc_key, warc_ts, url_hash)``,
~40 bytes/row — never the document text. The winner/rank table is then
broadcast and the heavy extract+tokenize pass is shuffle-free
map_batches. The posting merge keys on ``(term, bucket)`` where
``bucket = doc_id // bucket_width`` bounds hot-term group sizes (the
salted-key treatment for stop-word-scale skew).
"""

from __future__ import annotations

import unicodedata

import numpy as np
import pyarrow as pa
import ray

from ..functions.analyzer import BatchTokenizer
from ..functions.extract import extract_text
from ..functions.textstats import detect_language, stable_hash64
from ..functions.urlnorm import canonical_url_batch
from ..functions import codec
from ..state import bm25


class KeyStage:
    """(url, warc_ts) → dedup-key rows. Reads only two tiny columns of
    the input (prune-at-the-read); the downstream dedup/rank exchange
    therefore moves ~2% of the corpus bytes."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        canon = canonical_url_batch(batch.column("url"))
        doc_key = np.fromiter(
            (stable_hash64(c) for c in canon), dtype=np.uint64, count=len(canon)
        )
        url_hash = np.fromiter(
            (stable_hash64(u) for u in urls), dtype=np.uint64, count=len(urls)
        )
        return pa.table(
            {
                "doc_key": pa.array(doc_key, pa.uint64()),
                "warc_ts": batch.column("warc_ts"),
                "url_hash": pa.array(url_hash, pa.uint64()),
            }
        )


def _select_winners(
    doc_key: np.ndarray, ts: np.ndarray, url_hash: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Winner VALUES per distinct ``doc_key``: the row minimizing
    ``(warc_ts, url_hash)``. Equivalent to
    ``np.lexsort((url_hash, ts, doc_key))`` + first-per-key, but runs
    ONE stable argsort on ``doc_key`` and confines the (ts, url_hash)
    tie-break lexsort to rows of duplicate groups only (~10% of a web
    crawl) instead of three full stable sort passes — ~2.6× less
    driver-serial time at the 1.6M tier. Returns
    ``(distinct doc_key ascending, win_ts, win_url_hash)``."""
    n = len(doc_key)
    if n == 0:
        return doc_key[:0], ts[:0], url_hash[:0]
    order = np.argsort(doc_key, kind="stable")
    key_s = doc_key[order]
    first = np.ones(n, dtype=bool)
    np.not_equal(key_s[1:], key_s[:-1], out=first[1:])
    starts = np.flatnonzero(first)
    counts = np.diff(np.append(starts, n))
    # singleton groups (the vast majority after url canonicalization)
    # win by default; only duplicate groups pay the (ts, url_hash)
    # tie-break lexsort — on ~10% of rows, not all of them
    widx = order[starts]
    dupg = counts > 1
    if dupg.any():
        rmask = np.repeat(dupg, counts)
        rows = order[rmask]          # original indices, doc_key-grouped
        sub_key = key_s[rmask]
        so = np.lexsort((url_hash[rows], ts[rows]))
        so = so[np.argsort(sub_key[so], kind="stable")]
        sk = sub_key[so]
        sfirst = np.ones(len(sk), dtype=bool)
        np.not_equal(sk[1:], sk[:-1], out=sfirst[1:])
        widx[dupg] = rows[so[sfirst]]
    return doc_key[widx], ts[widx], url_hash[widx]


def compute_winners(keys: pa.Table) -> dict[str, np.ndarray]:
    """Driver-side dedup + rank over the key table (pure numpy sorts —
    no Python-object comparisons in the hot path).

    Dedup is keyed on ``doc_key`` = 64-bit hash of the canonical url
    (collision odds ≈ n²/2^65 — two distinct canonical urls colliding
    would merge as duplicates; documented accepted risk, mirrored by the
    test oracle). Winner per key = min (warc_ts, url_hash); doc ids are
    the dense ranks of the distinct keys in ascending doc_key order —
    parallelism-invariant because the ordering depends only on data
    (SURVEY.md §7.4). Returns parallel arrays sorted by doc_key.

    :func:`compute_winners_distributed` is the same computation as a
    key-range ``groupby`` for key tables too big for one machine; the
    byte-threshold gate lives in pipelines/build_index.py.
    """
    doc_key = keys.column("doc_key").to_numpy().astype(np.uint64)
    ts = keys.column("warc_ts").cast(pa.int64()).to_numpy()
    url_hash = keys.column("url_hash").to_numpy().astype(np.uint64)

    # winner per doc_key = min (warc_ts, url_hash); ascending doc_key
    wkey, wts, wuh = _select_winners(doc_key, ts, url_hash)
    return {
        "doc_key": wkey,
        "win_ts": wts,
        "win_url_hash": wuh,
        "doc_id": np.arange(len(wkey), dtype=np.int64),
    }


class ShardedWinners:
    """Winner table kept as doc_key-range shards in the OBJECT STORE —
    the full table never materializes on the driver or in any single
    broadcast object (the 10^12-doc memory contract).

    ``bounds_lo[i] ≤ doc_key ≤ bounds_hi[i]`` locates a key's shard
    (ranges are disjoint and ascending — each shard covers whole
    top-bit partitions); ``refs[i]`` is the shard's object ref (a dict
    of doc_key-sorted parallel arrays, same layout as
    :func:`compute_winners`). Lookup = searchsorted over bounds, then
    searchsorted inside the shard (:meth:`ExtractTokenizeStage`).
    The handle itself is tiny and broadcasts cheaply; shard bytes live
    in (and spill from) the object store, fetched zero-copy per node.
    """

    def __init__(self, bounds_lo, bounds_hi, refs, total: int):
        self.bounds_lo = np.asarray(bounds_lo, dtype=np.uint64)
        self.bounds_hi = np.asarray(bounds_hi, dtype=np.uint64)
        self.refs = list(refs)
        self.total = int(total)

    def __len__(self) -> int:
        return self.total


@ray.remote
def _winner_block_counts(block: pa.Table):
    # materialized groupby output may include a zero-row block carrying
    # the pre-map schema (no "part" column) — contributes no winners
    if block.num_rows == 0 or "part" not in block.schema.names:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    part = block.column("part").to_numpy()
    u, c = np.unique(part, return_counts=True)
    return u.astype(np.int64), c.astype(np.int64)


@ray.remote(num_returns=2)
def _finalize_winner_block(block: pa.Table, offsets: np.ndarray):
    """Attach global doc ids (partition offset + local rank) and sort
    the shard by doc_key. Returns (shard arrays, (lo, hi, n)) — the
    arrays stay in the object store; only the tiny bounds tuple is
    fetched by the driver."""
    part = block.column("part").to_numpy()
    local_rank = block.column("local_rank").to_numpy()
    dk = block.column("doc_key").to_numpy().astype(np.uint64)
    doc_id = offsets[part] + local_rank
    order = np.argsort(dk)
    out = {
        "doc_key": dk[order],
        "win_ts": block.column("win_ts").to_numpy()[order],
        "win_url_hash": block.column("win_url_hash").to_numpy().astype(np.uint64)[order],
        "doc_id": doc_id[order],
    }
    return out, (int(out["doc_key"][0]), int(out["doc_key"][-1]), len(dk))


def compute_winners_distributed(
    keys_ds, n_partitions: int = 64
) -> ShardedWinners:
    """Distributed dedup + rank: the 100 TB form of
    :func:`compute_winners`, logically identical output (tests pin the
    parity through the built index).

    Partitions on the TOP bits of ``doc_key`` (``n_partitions`` ordered
    key ranges — data-dependent, never parallelism-dependent), computes
    each partition's winners + dense local ranks in a vectorized
    ``map_groups`` (coarse groups: ~n/64 rows each, no tiny-group
    overhead), then assembles global doc ids with a driver-side cumsum
    over the tiny per-partition count vector. Because partitions are
    ordered key ranges, ``offset[part] + local_rank`` IS the global
    ascending-doc_key rank.

    The winner rows themselves NEVER visit the driver: per-block Ray
    tasks report (partition, count) pairs (tiny), the driver cumsums
    offsets, and a second per-block task attaches global ids in place —
    the results stay in the object store as doc_key-range shards
    (:class:`ShardedWinners`). ExtractTokenizeStage then joins each
    batch to its shards by key range — the doc_key-range hash join the
    broadcast form degrades into past one machine's memory.
    """
    import math

    import ray as _ray

    n_partitions = 1 << max(1, int(math.log2(max(2, n_partitions))))
    shift = np.uint64(64 - (n_partitions.bit_length() - 1))

    def add_part(batch: pa.Table) -> pa.Table:
        part = (batch.column("doc_key").to_numpy().astype(np.uint64) >> shift).astype(
            np.int64
        )
        return batch.append_column("part", pa.array(part))

    def part_winners(group: pa.Table) -> pa.Table:
        doc_key = group.column("doc_key").to_numpy().astype(np.uint64)
        ts = group.column("warc_ts").cast(pa.int64()).to_numpy()
        url_hash = group.column("url_hash").to_numpy().astype(np.uint64)
        wkey, wts, wuh = _select_winners(doc_key, ts, url_hash)
        n = len(wkey)
        part = group.column("part").to_numpy()
        return pa.table(
            {
                "part": pa.array(np.full(n, part[0] if len(part) else 0,
                                         dtype=np.int64)),
                "doc_key": pa.array(wkey, pa.uint64()),
                "win_ts": pa.array(wts, pa.int64()),
                "win_url_hash": pa.array(wuh, pa.uint64()),
                "local_rank": pa.array(np.arange(n, dtype=np.int64)),
            }
        )

    parts_ds = (
        keys_ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(part_winners, batch_format="pyarrow")
    )
    block_refs = parts_ds.materialize().to_arrow_refs()
    metas = _ray.get([_winner_block_counts.remote(r) for r in block_refs])
    counts = np.zeros(n_partitions, dtype=np.int64)
    for u, c in metas:
        counts[u] += c
    offsets = np.zeros(n_partitions, dtype=np.int64)
    np.cumsum(counts[:-1], out=offsets[1:])
    off_ref = _ray.put(offsets)
    data_refs, bound_refs = [], []
    for r, (u, _c) in zip(block_refs, metas):
        if len(u) == 0:
            continue  # empty block
        d, b = _finalize_winner_block.remote(r, off_ref)
        data_refs.append(d)
        bound_refs.append(b)
    bounds = _ray.get(bound_refs)
    order = np.argsort([b[0] for b in bounds])
    lo = [bounds[i][0] for i in order]
    hi = [bounds[i][1] for i in order]
    if any(hi[i] >= lo[i + 1] for i in range(len(lo) - 1)):  # pragma: no cover
        raise AssertionError(
            "winner shards have overlapping doc_key ranges — a groupby "
            "block split a partition group (Ray contract violation)"
        )
    return ShardedWinners(
        lo, hi, [data_refs[i] for i in order], int(counts.sum())
    )


class ExtractTokenizeStage:
    """The heavy, shuffle-free pass: html→text extraction (byte-exact,
    NFC), language tagging, winner filtering (drop URL-variant
    duplicates), doc-id attachment via the broadcast winner arrays
    (binary search on doc_key), and tokenization into the forward index
    row (doc_id, url, canon, lang, doclen, terms, tfs).

    Winner state is fetched zero-copy from the local object store on
    first use (never shipped in the task closure). Two forms: the dense
    broadcast arrays (small corpora — one ``ray.put``), or a
    :class:`ShardedWinners` handle whose doc_key-range shards are
    fetched per batch as needed (the hash-join form: no single object
    ever holds the whole winner table, per-worker residency is governed
    by the object store, which spills cold shards).
    """

    def __init__(self, winners_ref):
        self._ref = winners_ref
        self._w = None
        self._shard_cache: dict[int, dict] = {}
        self._shard_bytes = 0
        # per-actor batched tokenizer (memoized analyzer chain + direct
        # Arrow list-column construction — see BatchTokenizer)
        self._bt = BatchTokenizer()

    _TS_SENTINEL = np.int64(-(1 << 62))  # never equals a real warc_ts
    # LRU byte budget for pinned winner shards: ray.get'd numpy arrays
    # are zero-copy views that pin their plasma objects, so an unbounded
    # cache would pin the WHOLE winner table per worker (doc_keys are
    # uniform hashes — every batch touches most ranges). Evicting drops
    # the pin and lets the object store spill cold shards; a re-touched
    # shard is a cheap local-store re-get.
    _SHARD_CACHE_BYTES = 2 << 30

    @staticmethod
    def _shard_nbytes(shard: dict) -> int:
        return sum(a.nbytes for a in shard.values())

    def _shard(self, w: "ShardedWinners", i: int) -> dict:
        got = self._shard_cache.get(i)
        if got is not None:
            self._shard_cache[i] = self._shard_cache.pop(i)  # LRU refresh
            return got
        got = ray.get(w.refs[i])
        n = self._shard_nbytes(got)
        while (
            self._shard_cache
            and self._shard_bytes + n > self._SHARD_CACHE_BYTES
        ):
            old = self._shard_cache.pop(next(iter(self._shard_cache)))
            self._shard_bytes -= self._shard_nbytes(old)
        self._shard_cache[i] = got
        self._shard_bytes += n
        return got

    def _lookup_sharded(self, w: "ShardedWinners", doc_key: np.ndarray):
        """Per-row winner columns via the range join: locate each key's
        shard (searchsorted over the handle's bounds), then binary-search
        inside just the shards this batch touches."""
        n = len(doc_key)
        win_key = np.zeros(n, dtype=np.uint64)
        win_ts = np.full(n, self._TS_SENTINEL, dtype=np.int64)
        win_uh = np.zeros(n, dtype=np.uint64)
        win_id = np.full(n, -1, dtype=np.int64)
        if len(w.bounds_lo) == 0:
            return win_key, win_ts, win_uh, win_id
        blk = np.searchsorted(w.bounds_lo, doc_key, side="right") - 1
        valid = (blk >= 0) & (
            doc_key <= w.bounds_hi[np.clip(blk, 0, len(w.bounds_hi) - 1)]
        )
        for b in np.unique(blk[valid]):
            rows = np.flatnonzero(valid & (blk == b))
            shard = self._shard(w, int(b))
            pos = np.searchsorted(shard["doc_key"], doc_key[rows])
            pos = np.clip(pos, 0, len(shard["doc_key"]) - 1)
            win_key[rows] = shard["doc_key"][pos]
            win_ts[rows] = shard["win_ts"][pos]
            win_uh[rows] = shard["win_url_hash"][pos]
            win_id[rows] = shard["doc_id"][pos]
        return win_key, win_ts, win_uh, win_id

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._w is None:
            self._w = ray.get(self._ref)
        w = self._w
        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()
        htmls = batch.column("html")
        ts = batch.column("warc_ts").cast(pa.int64()).to_numpy()

        canons = canonical_url_batch(batch.column("url"))
        doc_key = np.fromiter(
            (stable_hash64(c) for c in canons), dtype=np.uint64, count=len(canons)
        )
        url_hash = np.fromiter(
            (stable_hash64(u) for u in urls), dtype=np.uint64, count=len(urls)
        )
        if isinstance(w, ShardedWinners):
            win_key, win_ts, win_uh, doc_ids = self._lookup_sharded(w, doc_key)
        else:
            pos = np.searchsorted(w["doc_key"], doc_key)
            pos = np.clip(pos, 0, len(w["doc_key"]) - 1)
            win_key = w["doc_key"][pos]
            win_ts = w["win_ts"][pos]
            win_uh = w["win_url_hash"][pos]
            doc_ids = w["doc_id"][pos]
        # NOTE: duplicate doc_keys (hash collision between distinct
        # canons) resolve to the first slot; the winner filter below
        # then keeps exactly one row — collision odds are ~n²/2^64.
        is_winner = (win_key == doc_key) & (win_ts == ts) & (win_uh == url_hash)

        win_rows = np.flatnonzero(is_winner)
        out_doc = doc_ids[win_rows].astype(np.int64)
        out_url, out_canon, out_lang, out_texts = [], [], [], []
        for i in win_rows:
            t = texts[i]
            if not t:
                t = extract_text(htmls[int(i)].as_py())
            else:
                t = unicodedata.normalize("NFC", t)
            out_texts.append(t)
            out_url.append(urls[i])
            out_canon.append(canons[i])
            out_lang.append(langs[i] if langs[i] else detect_language(t))

        terms_col, tfs_col, pos_col, doclens = self._bt.tokenize_texts(out_texts)
        return pa.table(
            {
                "doc_id": pa.array(out_doc),
                "url": pa.array(out_url, pa.string()),
                "canon": pa.array(out_canon, pa.string()),
                "lang": pa.array(out_lang, pa.string()),
                "doclen": pa.array(doclens),
                "terms": terms_col,
                "tfs": tfs_col,
                "pos": pos_col,
            }
        )


class InvertStage:
    """Forward-index batch → posting partials keyed (term, bucket).

    The SPIMI partial step (SURVEY.md §7.1 M5), fully vectorized: the
    batch's (terms, tfs) list columns are flattened once, terms are
    dictionary-encoded, and one ``np.lexsort`` groups the flat postings
    by (term, bucket, doc_id). Each cell is emitted delta+varint
    ENCODED, so the posting-merge shuffle moves ~2.5 bytes/posting
    instead of 12 (pre-aggregate + compress before the exchange —
    SURVEY.md §4 skew/shuffle rules).

    ``bucket = doc_id // bucket_width`` makes chunk doc-ranges disjoint,
    so the downstream ``groupby(["term","bucket"])`` merge is
    skew-bounded (a stop-word-scale term becomes one group per bucket,
    each ≤ bucket_width postings — the salted-hot-key design) and
    chunks concatenate in bucket order at query time. Use large batches
    here (cfg.invert_batch_size): doc ids are hash-ordered, so every
    batch touches most buckets and bigger batches amortize the
    per-(term,bucket) row overhead.

    TERM-ID EXCHANGE: the shuffle carries a fixed-width ``tid``
    (uint64 blake2b-8 of the term) per cell, NOT the term string — a
    hot term's string would otherwise be copied once per (term,
    bucket) cell through the object store, and the merge would re-hash
    every string to group. The id→string mapping rides the SAME
    exchange as sidecar dictionary rows, one per distinct (term,
    bgroup, mslice) the batch touches (i.e. once per merge group that
    will need the string, not once per cell): a dictionary row is
    discriminated by ``pdf == 0`` (real cells always have pdf ≥ 1) and
    smuggles the term's utf-8 bytes in the ``ids_enc`` binary column,
    so the exchange schema stays fixed-width + binaries. The merge
    strips dictionary rows, groups cells by integer tid, and re-attaches
    strings at output — the ON-DISK segment format is unchanged.
    64-bit collision risk: P(any collision) ≈ n²/2⁶⁵; at 10⁹ distinct
    terms that is ~3%, and a collision is DETECTED at merge time
    (two strings mapping to one tid raise), never silent.
    """

    def __init__(
        self,
        bucket_width: int,
        n_merge_shards: int,
        bucket_group_bounds: np.ndarray | None = None,
        slice_bounds: np.ndarray | None = None,
    ):
        self.w = int(bucket_width)
        self.n_merge_shards = int(n_merge_shards)
        # bucket → coarse doc-range group (``bgroup``): the merge
        # grouping key includes it so each merge task touches one doc
        # range and needs only that range's doclen slice
        self.bg_bounds = (
            np.asarray(bucket_group_bounds, dtype=np.int64)
            if bucket_group_bounds is not None
            else None
        )
        # bucket → on-disk doc-range slice (``mslice``): including it in
        # the merge grouping key splits a hot term's buckets across
        # ~n_slices merge groups. With shard-only groups, one group =
        # one term's ENTIRE posting run; at 3.2M docs the hottest groups
        # reached 4x the mean (Zipf), and with ~6 task waves at 32 CPUs
        # that one 90 s task WAS the stage wall — finer, cache-sized
        # groups cut both the tail and the per-task working set.
        self.slice_bounds = (
            np.asarray(slice_bounds, dtype=np.int64)
            if slice_bounds is not None
            else None
        )
        self._tid_cache: dict[str, int] = {}

    def _tids_for(self, vocab) -> np.ndarray:
        """uint64 term ids (blake2b-8) per vocab entry; shard = tid %
        n_merge_shards, so the shard assignment is the hash the string
        form used, just without re-hashing cached terms per batch."""
        cache = self._tid_cache
        out = np.empty(len(vocab), dtype=np.uint64)
        for i, term in enumerate(vocab.to_pylist()):
            t = cache.get(term)
            if t is None:
                t = stable_hash64(term)
                if len(cache) < 2_000_000:
                    cache[term] = t
            out[i] = t
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        empty = pa.table(
            {
                "shard": pa.array([], pa.int32()),
                "bgroup": pa.array([], pa.int32()),
                "mslice": pa.array([], pa.int32()),
                "tid": pa.array([], pa.uint64()),
                "bucket": pa.array([], pa.int64()),
                "pdf": pa.array([], pa.int64()),
                "ids_enc": pa.array([], pa.binary()),
                "tfs_enc": pa.array([], pa.binary()),
                "pos_enc": pa.array([], pa.binary()),
            }
        )
        if batch.num_rows == 0:
            return empty
        doc_ids = batch.column("doc_id").to_numpy()
        terms_arr = batch.column("terms").combine_chunks()
        lens = pc.list_value_length(terms_arr).to_numpy()
        flat_terms = pc.list_flatten(terms_arr)
        flat_tfs = pc.list_flatten(batch.column("tfs").combine_chunks()).to_numpy()
        pos_outer = pc.list_flatten(batch.column("pos").combine_chunks())
        # 32-bit flat arrays wherever the values fit: this stage is
        # memory-bandwidth-bound at full parallelism (measured task
        # inflation ~6x over solo runs at 32 workers), so every halved
        # array halves wall time; the fit checks are data-dependent,
        # never parallelism-dependent, and the varint bytes produced are
        # identical for identical values
        pos_flat = pc.list_flatten(pos_outer).to_numpy()
        if pos_flat.dtype != np.int32 and (
            len(pos_flat) == 0 or pos_flat.max() < 2**31
        ):
            pos_flat = pos_flat.astype(np.int32)
        if doc_ids.max() < 2**31:
            doc_rep = np.repeat(doc_ids.astype(np.int32), lens)
        else:
            doc_rep = np.repeat(doc_ids, lens)
        if len(doc_rep) == 0:
            return empty
        dict_arr = pc.dictionary_encode(flat_terms)
        codes = dict_arr.indices.to_numpy()  # int32 from Arrow — kept
        # narrow: this stage is bandwidth-bound at full parallelism
        vocab = dict_arr.dictionary
        bucket = doc_rep // self.w
        limit = int(bucket.max()) + 1  # per-batch key packing base
        key_max = (len(vocab) - 1) * limit + limit - 1
        if key_max < 2**31:
            key = codes * np.int32(limit) + bucket.astype(np.int32)
        else:
            key = codes.astype(np.int64) * limit + bucket.astype(np.int64)
        # (key, doc) composite keys are UNIQUE (one posting per
        # (term, doc), doc-in-bucket offset preserves doc order within
        # a key), so packing them into one int64 lets a single unstable
        # argsort replace the two-pass lexsort — ~4x less sort wall on
        # the bandwidth-bound path (see BASELINE.md). Data-dependent
        # fallback when the packed key would overflow.
        if (key_max + 1) * self.w < 2**63:
            order = np.argsort(key.astype(np.int64) * self.w + (doc_rep % self.w))
        else:  # pragma: no cover — >2^50 distinct (term,bucket) cells
            order = np.lexsort((doc_rep, key))
        k_s, d_s, t_s = key[order], doc_rep[order], flat_tfs[order]
        starts = np.flatnonzero(np.concatenate([[True], k_s[1:] != k_s[:-1]]))
        ends = np.append(starts[1:], len(k_s))
        cell_codes = k_s[starts] // limit
        cell_buckets = (k_s[starts] % limit).astype(np.int64)
        # one batched varint pass for the whole batch, sliced per cell
        deltas = codec.segmented_delta_encode(d_s, starts)
        ibuf, ioffs = codec.varint_encode_all(deltas)
        tbuf, toffs = codec.varint_encode_all(
            t_s if t_s.dtype == np.int32 else t_s.astype(np.uint64)
        )
        # cell slices are contiguous in cell order — build the binary
        # columns straight from the batch buffers + offset bounds (no
        # per-cell bytes objects on this bandwidth-bound stage)
        cell_bounds = np.append(starts, len(k_s))
        ids_enc = codec.binary_from_slices(ibuf, ioffs[cell_bounds])
        tfs_enc = codec.binary_from_slices(tbuf, toffs[cell_bounds])
        # positions: delta+varint encode the per-posting runs ONCE in
        # original order (each run resets its delta, so a run's bytes
        # are order-independent), then permute the ENCODED byte runs
        # into posting-sorted order — moving ~1-2 encoded bytes/value
        # through the gather instead of 8-byte ints
        ovstarts = np.zeros(len(flat_tfs) + 1, dtype=np.int64)
        np.cumsum(flat_tfs, out=ovstarts[1:])
        pdeltas = codec.segmented_delta_encode(pos_flat, ovstarts[:-1])
        pbuf, poffs = codec.varint_encode_all(pdeltas)
        run_blen = poffs[ovstarts[1:]] - poffs[ovstarts[:-1]]
        pbuf_s, pboffs = codec.reorder_segments(pbuf, run_blen, order)
        pos_enc = codec.binary_from_slices(pbuf_s, pboffs[cell_bounds])
        vocab_tids = self._tids_for(vocab)
        cell_tids = vocab_tids[cell_codes]
        shards = (vocab_tids % np.uint64(self.n_merge_shards)).astype(np.int32)[
            cell_codes
        ]
        if self.bg_bounds is not None:
            bgroups = (
                np.searchsorted(self.bg_bounds, cell_buckets, side="right") - 1
            ).astype(np.int32)
        else:
            bgroups = np.zeros(len(cell_buckets), dtype=np.int32)
        if self.slice_bounds is not None:
            mslices = (
                np.searchsorted(self.slice_bounds, cell_buckets, side="right")
                - 1
            ).astype(np.int32)
        else:
            mslices = np.zeros(len(cell_buckets), dtype=np.int32)
        # sidecar dictionary rows: one (tid → term string) per distinct
        # (term, bgroup, mslice) this batch touches, so every merge
        # group that receives a cell of the term also receives its
        # string exactly once per invert batch (class docstring:
        # TERM-ID EXCHANGE). Discriminated by pdf == 0; the term's
        # utf-8 bytes ride the ids_enc binary column.
        n_bg_span = int(bgroups.max()) + 1 if len(bgroups) else 1
        n_ms_span = int(mslices.max()) + 1 if len(mslices) else 1
        dkey = (
            cell_codes * (n_bg_span * n_ms_span)
            + bgroups.astype(np.int64) * n_ms_span
            + mslices.astype(np.int64)
        )
        duniq = np.unique(dkey)
        d_codes = duniq // (n_bg_span * n_ms_span)
        d_bg = (duniq // n_ms_span % n_bg_span).astype(np.int32)
        d_ms = (duniq % n_ms_span).astype(np.int32)
        d_terms_bin = vocab.take(pa.array(d_codes)).cast(pa.binary())
        zero_bin = pa.array([b""] * len(duniq), pa.binary())
        dict_rows = pa.table(
            {
                "shard": pa.array(
                    (vocab_tids % np.uint64(self.n_merge_shards)).astype(
                        np.int32
                    )[d_codes]
                ),
                "bgroup": pa.array(d_bg),
                "mslice": pa.array(d_ms),
                "tid": pa.array(vocab_tids[d_codes]),
                "bucket": pa.array(np.zeros(len(duniq), dtype=np.int64)),
                "pdf": pa.array(np.zeros(len(duniq), dtype=np.int64)),
                "ids_enc": d_terms_bin,
                "tfs_enc": zero_bin,
                "pos_enc": zero_bin,
            }
        )
        cells = pa.table(
            {
                "shard": pa.array(shards, pa.int32()),
                "bgroup": pa.array(bgroups, pa.int32()),
                "mslice": pa.array(mslices, pa.int32()),
                "tid": pa.array(cell_tids),
                "bucket": pa.array(cell_buckets),
                "pdf": pa.array((ends - starts).astype(np.int64)),
                "ids_enc": ids_enc,
                "tfs_enc": tfs_enc,
                "pos_enc": pos_enc,
            }
        )
        return pa.concat_tables([cells, dict_rows])


class MergeShardGroup:
    """Per (term-hash shard × doc-range bgroup) group: merge every
    (term, bucket) cell's partials → sorted postings → delta+varint
    encoded chunks with block-max metadata (SURVEY.md §7.1 M5/M6),
    fully vectorized.

    Grouping by (shard, bgroup) (not by (term, bucket)) turns
    ~vocab×buckets tiny per-group calls into a few hundred large ones;
    inside, ALL partials of the group are decoded in one segmented
    varint pass, re-grouped by (term, bucket, doc_id) with one lexsort,
    and re-encoded in one pass — per-cell work is numpy slicing, never
    per-cell numpy calls. The doclen state for the idf-independent
    per-block max impacts is RANGE-SHARDED: the task fetches only its
    bgroup's slice (zero-copy from the local object store), so no task
    ever holds a dense max_doc+1 array.
    """

    def __init__(
        self,
        dl_refs: dict,
        avgdl: float,
        block_size: int,
        *,
        bg_doc_base,
        slice_bounds=None,
        ids_codec: str = "varint",
        bucket_width: int | None = None,
    ):
        self._refs = dl_refs
        self._slices: dict[int, np.ndarray] = {}
        self.bg_doc_base = np.asarray(bg_doc_base, dtype=np.int64)
        self.avgdl = float(avgdl)
        self.block_size = int(block_size)
        # enables the packed-key single-argsort posting sort (doc offset
        # within a cell's bucket is < bucket_width); None falls back to
        # the two-pass lexsort
        self.bucket_width = int(bucket_width) if bucket_width else None
        # doc-id gap encoding of the emitted chunks: "varint" (LEB128,
        # the default) or "for" (frame-of-reference bit-packing — the
        # PForDelta-family codec, codec.py). Per-row ``ids_codec`` tags
        # let both coexist within one index (update deltas stay varint).
        if ids_codec not in ("varint", "for"):
            raise ValueError(f"unknown postings codec {ids_codec!r}")
        self.ids_codec = ids_codec
        # on-disk doc-range layout: chunks are tagged with the slice of
        # their bucket (hive ``bslice=`` partition key at write time)
        self.slice_bounds = (
            np.asarray(slice_bounds, dtype=np.int64)
            if slice_bounds is not None
            else None
        )

    def doclens_slice(self, bg: int) -> np.ndarray:
        got = self._slices.get(bg)
        if got is None:
            # zero-copy read from the local object store (broadcast side)
            got = self._slices[bg] = ray.get(self._refs[bg])
        return got

    def __call__(self, group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        shard = int(group.column("shard")[0].as_py())
        bg = int(group.column("bgroup")[0].as_py())
        dl_slice = self.doclens_slice(bg)
        dl_base = int(self.bg_doc_base[bg])
        # split sidecar dictionary rows (pdf == 0, tid→string in
        # ids_enc — InvertStage TERM-ID EXCHANGE) from posting cells
        pdf_all = group.column("pdf").to_numpy()
        dmask = pdf_all == 0
        d_part = group.filter(pa.array(dmask))
        d_tids = d_part.column("tid").to_numpy()
        d_order = np.argsort(d_tids, kind="stable")
        dt_s = d_tids[d_order]
        d_terms_s = (
            d_part.column("ids_enc").combine_chunks().take(pa.array(d_order))
        )
        if len(dt_s) > 1:
            # a 64-bit tid collision (two distinct strings, one tid)
            # always yields an adjacent differing pair under tid sort —
            # detect it rather than silently merging two terms' postings
            same_tid = dt_s[1:] == dt_s[:-1]
            if same_tid.any():
                neq = pc.not_equal(
                    d_terms_s.slice(1), d_terms_s.slice(0, len(dt_s) - 1)
                ).to_numpy(zero_copy_only=False)
                if (same_tid & neq).any():
                    i = int(np.flatnonzero(same_tid & neq)[0])
                    raise ValueError(
                        "64-bit term-id collision: "
                        f"{d_terms_s[i].as_py()!r} and "
                        f"{d_terms_s[i + 1].as_py()!r} share tid {dt_s[i]}"
                    )
        d_firsts = (
            np.flatnonzero(np.concatenate([[True], dt_s[1:] != dt_s[:-1]]))
            if len(dt_s)
            else np.zeros(0, dtype=np.int64)
        )
        dict_tids = dt_s[d_firsts]
        dict_terms = d_terms_s.take(pa.array(d_firsts)).cast(pa.string())
        group = group.filter(pa.array(~dmask))
        pdf = pdf_all[~dmask]
        assert group.num_rows > 0, "merge group contained only dict rows"
        seg_starts = np.zeros(len(pdf), dtype=np.int64)
        np.cumsum(pdf[:-1], out=seg_starts[1:])
        # decode ALL partials in segmented passes; the encoded-partial
        # columns are read as zero-copy Arrow buffer views (the former
        # b"".join(to_pylist()) cost two full copies per column on this
        # bandwidth-bound path)
        # 32-bit decode end to end when the group's doc range fits
        # (always, until a single bgroup spans ≥2^32 docs): half the
        # traffic of the int64 form on this bandwidth-bound stage —
        # values are exact by the mod-2^32 argument in
        # codec.segmented_delta_decode
        use32 = dl_base + len(dl_slice) < 2**32
        ibuf = codec.binary_concat_view(group.column("ids_enc"))
        tbuf = codec.binary_concat_view(group.column("tfs_enc"))
        deltas = codec.varint_decode(
            ibuf, dtype=np.uint32 if use32 else np.uint64
        )
        ids = codec.segmented_delta_decode(deltas, seg_starts)
        tfs = codec.varint_decode(tbuf, dtype=np.uint32)
        # positions are NEVER decoded here: each posting's delta+varint
        # run is self-contained (delta resets per posting), so the merge
        # only needs to permute the encoded byte runs into the merged
        # posting order. One boundary scan (terminator bytes are <0x80)
        # replaces decode + delta-decode + re-encode of the largest
        # column in the exchange.
        pbuf = codec.binary_concat_view(group.column("pos_enc"))
        pvstarts = np.zeros(len(tfs) + 1, dtype=np.int64)
        np.cumsum(tfs, out=pvstarts[1:])
        vend = np.flatnonzero(pbuf < 128).astype(np.int64) + 1
        post_bstart = np.zeros(len(tfs) + 1, dtype=np.int64)
        if len(tfs):
            post_bstart[1:] = vend[pvstarts[1:] - 1]
        pos_run_blen = post_bstart[1:] - post_bstart[:-1]

        # (term, bucket) cell key per posting — grouped by integer tid
        # (no string re-hash on the merge side; vocab order is tid-sorted,
        # which only permutes output rows within the group)
        tid_vocab, codes = np.unique(
            group.column("tid").to_numpy(), return_inverse=True
        )
        codes = codes.astype(np.int64, copy=False)
        buckets = group.column("bucket").to_numpy()
        limit = int(buckets.max()) + 1
        cell_key_per_partial = codes * limit + buckets
        key_p = np.repeat(cell_key_per_partial, pdf)
        # composite (cell, doc) keys are unique across partials (a doc
        # lives in exactly one invert batch), so one packed-int64
        # unstable argsort replaces the lexsort where the in-bucket doc
        # offset fits (same trick as InvertStage — ~4x less sort wall)
        w = self.bucket_width
        key_p_max = (len(tid_vocab) - 1) * limit + limit - 1
        if w is not None and (key_p_max + 1) * w < 2**63:
            order = np.argsort(key_p * w + (ids % ids.dtype.type(w)))
        else:
            order = np.lexsort((ids, key_p))
        k_s, id_s, tf_s = key_p[order], ids[order], tfs[order]

        # cell boundaries
        cstarts = np.flatnonzero(np.concatenate([[True], k_s[1:] != k_s[:-1]]))
        cends = np.append(cstarts[1:], len(k_s))
        ccounts = cends - cstarts
        cell_codes = k_s[cstarts] // limit
        cell_buckets = (k_s[cstarts] % limit).astype(np.int64)
        # re-attach term strings from the sidecar dictionary (every
        # batch that emitted a cell for this group also emitted the
        # term's dict row for it — InvertStage TERM-ID EXCHANGE)
        out_tids = tid_vocab[cell_codes]
        didx = np.searchsorted(dict_tids, out_tids)
        if len(out_tids) and (
            didx.max(initial=0) >= len(dict_tids)
            or not np.array_equal(dict_tids[didx], out_tids)
        ):
            raise ValueError(
                "posting cell without a term-dictionary row in its "
                "merge group — exchange routing bug"
            )
        cell_terms = dict_terms.take(pa.array(didx))

        # per-posting impact; block grid aligned to cell starts
        impacts = bm25.impact(
            tf_s, dl_slice[id_s - id_s.dtype.type(dl_base)], self.avgdl
        )
        # block-start grid computed per BLOCK (cell start + j·B), not by
        # scanning a per-posting position array — two fewer per-posting
        # int64 temporaries on this bandwidth-bound stage
        nblocks = (ccounts + self.block_size - 1) // self.block_size
        nb_total = int(nblocks.sum())
        blk_ord = np.arange(nb_total, dtype=np.int64)
        blk_cell_starts = np.repeat(cstarts, nblocks)
        blk_cell_base = np.repeat(
            np.concatenate([[0], np.cumsum(nblocks[:-1])]).astype(np.int64),
            nblocks,
        )
        bs = blk_cell_starts + self.block_size * (blk_ord - blk_cell_base)
        block_max = np.maximum.reduceat(impacts, bs) if len(bs) else np.zeros(0)
        block_end_idx = np.append(bs[1:], len(k_s)) - 1
        block_last = id_s[block_end_idx] if len(bs) else np.zeros(0, dtype=np.int64)

        # one batched encode; per-cell and per-block slices by byte offset
        enc_deltas = codec.segmented_delta_encode(id_s, cstarts)
        if self.ids_codec == "for":
            # FOR bit-packing wants pure gaps: the cell's first value is
            # recorded in first_doc metadata, so its slot packs as 0
            gaps = enc_deltas.astype(np.uint64, copy=True)
            gaps[cstarts] = 0
        else:
            ibuf2, ioffs = codec.varint_encode_all(enc_deltas)
        # tfs are never re-encoded either: each tf is a one-value varint
        # run whose byte length follows from its decoded value, so the
        # encoded runs permute like the position runs (bytes identical
        # to a re-encode by construction)
        tf_blen = codec.varint_lengths(tfs)  # already uint32
        tbuf2, toffs = codec.reorder_segments(np.asarray(tbuf), tf_blen, order)
        pbuf2, pboffs = codec.reorder_segments(pbuf, pos_run_blen, order)

        # int64 accumulate — a cell's collection frequency may overflow
        # the uint32 the tfs are carried in
        cf = (
            np.add.reduceat(tf_s.astype(np.int64), cstarts)
            if len(cstarts)
            else np.zeros(0, dtype=np.int64)
        )
        first_doc = id_s[cstarts]
        last_doc = id_s[cends - 1]

        # per-cell encoded slices are contiguous in cell order, so the
        # binary columns are built straight from the batch buffers +
        # offset bounds (no per-cell bytes objects); the block-metadata
        # list columns likewise come from one flat array + the block
        # cumsum (no per-cell .tolist())
        bcum = np.zeros(len(cstarts) + 1, dtype=np.int64)
        np.cumsum(nblocks, out=bcum[1:])
        cell_ends = np.append(cstarts, len(k_s))
        if self.ids_codec == "for":
            # one batched bit-pack over the whole group's block grid;
            # byte bounds per cell come from the block-ordinal cumsum
            fbuf, foffs = codec.for_encode_segmented(gaps, bs)
            ids_enc = codec.binary_from_slices(fbuf, foffs[bcum])
            blk_base_i = np.repeat(foffs[bcum[:-1]], nblocks)
            ibo_col = codec.list_from_offsets(foffs[:-1] - blk_base_i, bcum, pa.int64())
        else:
            ids_enc = codec.binary_from_slices(ibuf2, ioffs[cell_ends])
            cell_base_i = np.repeat(ioffs[cstarts], nblocks)
            ibo_col = codec.list_from_offsets(ioffs[bs] - cell_base_i, bcum, pa.int64())
        tfs_enc = codec.binary_from_slices(tbuf2, toffs[cell_ends])
        pos_enc = codec.binary_from_slices(pbuf2, pboffs[cell_ends])
        bl_col = codec.list_from_offsets(
            block_last.astype(np.int64), bcum, pa.int64()
        )
        bm_col = codec.list_from_offsets(
            block_max.astype(np.float64), bcum, pa.float64()
        )
        cell_base_t = np.repeat(toffs[cstarts], nblocks)
        tbo_col = codec.list_from_offsets(toffs[bs] - cell_base_t, bcum, pa.int64())

        out_cols = {
                "term": cell_terms,
                "bucket": pa.array(cell_buckets),
                "shard": pa.array(np.full(len(cstarts), shard, dtype=np.int32)),
                "df": pa.array(ccounts.astype(np.int64)),
                "cf": pa.array(cf.astype(np.int64)),
                "first_doc": pa.array(first_doc.astype(np.int64)),
                "last_doc": pa.array(last_doc.astype(np.int64)),
                "ids_enc": ids_enc,
                "tfs_enc": tfs_enc,
                "pos_enc": pos_enc,
                "block_last": bl_col,
                "block_max": bm_col,
                "ids_boff": ibo_col,
                "tfs_boff": tbo_col,
        }
        if self.ids_codec != "varint":
            # per-row codec tag; absent column = varint (old builds and
            # incremental update deltas backfill on read)
            out_cols["ids_codec"] = pa.array(
                [self.ids_codec] * len(cstarts), pa.string()
            )
        if self.slice_bounds is not None:
            out_cols["bslice"] = pa.array(
                (
                    np.searchsorted(self.slice_bounds, cell_buckets, side="right") - 1
                ).astype(np.int32)
            )
        return pa.table(out_cols)
