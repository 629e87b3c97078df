"""Cross-document deduplication suite (exact + near-dup families).

The reference dedups only *within* a record (``dedup``/``uniq`` fix
commands, reference main/src/main/java/hbz/limetrans/function/
Dedup.java:19-24) and across documents implicitly via the ES ``_id``
(SURVEY.md §2.9). A training-data pipeline needs explicit cross-corpus
dedup; each operator here is a Ray Data pipeline over a document table:

- :func:`exact_dedup`            — hash-group keep-first (deterministic)
- :func:`minhash_lsh_candidates` — shingle → MinHash → banded LSH
  buckets → candidate pairs → exact-Jaccard verification
- :func:`ngram_jaccard_pairs`   — EXACT all-pairs word-k-gram Jaccard
  (shingle co-group + distributed intersection counts; no sketching)
- :func:`simhash_near_dups`     — 64-bit SimHash, 4-band blocking,
  Hamming-distance verification
- :func:`embedding_near_dups`   — cosine ≥ τ against an embedding
  column (brute force per batch vs a normalized broadcast matrix;
  exact small-corpus baseline)
- :func:`embedding_near_dups_lsh` — the embedding scale path: banded
  hyperplane buckets → capped candidates → exact cosine verification

Scale notes: within-bucket pair expansion is bounded by
``BUCKET_PAIR_CAP`` (star expansion + logged overflow — no O(B²)
blowup on degenerate buckets); candidate-pair verification joins
texts/vectors back by doc id via a broadcast lookup — fine while
candidates ≪ corpus (the common case after banding); at 10^12 docs the
verify step becomes a second hash-join keyed on doc_id, which the
band-bucket `groupby` layout already supports.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Min

logger = logging.getLogger(__name__)

# A band bucket larger than this (e.g. thousands of empty/boilerplate
# documents sharing a band hash) would emit O(B²) candidate pairs in one
# group; capped buckets fall back to STAR expansion — every member pairs
# with the bucket's smallest doc id only, keeping duplicate CLUSTERS
# connected (transitively) at O(B) pairs. Overflows are logged, never
# silent (no-silent-caps rule).
BUCKET_PAIR_CAP = 64


# coarse co-location width for banded-bucket stages: ``map_groups``
# costs ~tens of ms per GROUP CALL, so grouping by the raw (band, hash)
# key — potentially billions of buckets at web scale — pays that
# overhead per bucket. Grouping by ``band_hash % N_COARSE_GROUPS``
# instead gives a few hundred large calls; exact per-bucket
# segmentation happens vectorized inside (identical pair sets).
N_COARSE_GROUPS = 256

_EMPTY_PAIRS = pd.DataFrame({"a_id": [], "b_id": [], "capped": []}).astype(
    {"a_id": np.int64, "b_id": np.int64, "capped": bool}
)


def _segment_starts(keys: np.ndarray) -> np.ndarray:
    """Start offsets of equal-key runs in a row-sorted 2-D key array."""
    change = np.ones(len(keys), dtype=bool)
    if len(keys) > 1:
        change[1:] = (keys[1:] != keys[:-1]).any(axis=1)
    return np.flatnonzero(change)


def _capped_bucket_pairs_frame(id_col: str, seg_cols: list[str]):
    """The shared map_groups body for every banded-bucket candidate
    stage (MinHash / embedding LSH), applied to a COARSE group holding
    many buckets: rows are segmented by ``seg_cols`` (the exact bucket
    key) and each multi-member segment emits its capped pairs + the
    ``capped`` flag the caller logs (the one place the cap semantics
    live). Singleton buckets — the vast majority — are skipped without
    touching Python."""

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([*seg_cols, id_col], kind="stable")
        ids = g[id_col].to_numpy().astype(np.int64)
        keys = g[seg_cols].to_numpy()
        starts = _segment_starts(keys)
        ends = np.append(starts[1:], len(g))
        a_parts, b_parts, cap_parts = [], [], []
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue
            seg_ids = ids[s:e]  # ascending (sorted above)
            if n <= BUCKET_PAIR_CAP:
                ai, bi = np.triu_indices(n, k=1)
                a_parts.append(seg_ids[ai])
                b_parts.append(seg_ids[bi])
                cap_parts.append(np.zeros(len(ai), dtype=bool))
            else:
                # star expansion vs the smallest id keeps the cluster
                # connected at O(n) pairs; flagged for the overflow log
                a_parts.append(np.full(n - 1, seg_ids[0], dtype=np.int64))
                b_parts.append(seg_ids[1:])
                cap_parts.append(np.ones(n - 1, dtype=bool))
        if not a_parts:
            return _EMPTY_PAIRS
        return pd.DataFrame(
            {
                "a_id": np.concatenate(a_parts),
                "b_id": np.concatenate(b_parts),
                "capped": np.concatenate(cap_parts),
            }
        )

    return bucket_pairs

from ..functions.textstats import (
    hash64_column,
    minhash_params,
    minhash_signature,
    simhash64,
    stable_hash64,
    word_shingles,
)


# --------------------------------------------------------------------- exact

def exact_dedup(ds: rd.Dataset, col: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    """Keep the smallest ``id_col`` per distinct ``col`` value.

    Pattern: add a stable content hash in a vectorized ``map_batches``
    (so the shuffle key is 8 bytes, not the document), then a grouped
    Min — the pre-aggregated exact-dedup of SURVEY.md §2.9. Returns
    (doc_id, n_dups) — one row per distinct content.
    """

    def add_hash(batch: pa.Table) -> pa.Table:
        h = hash64_column(batch.column(col).to_pylist()).astype(np.int64)
        return pa.table(
            {"content_hash": pa.array(h), id_col: batch.column(id_col)}
        )

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    return (
        hashed.groupby("content_hash")
        .aggregate(Min(id_col, alias_name=id_col), Count(alias_name="n_dups"))
        .select_columns([id_col, "n_dups"])
    )


def _grouped_sum_pairs(part: rd.Dataset, n_coarse: int = 64) -> rd.Dataset:
    """``groupby(a_id, b_id).sum(n)`` via coarse co-location + one
    vectorized pandas sum per coarse group. Ray's native
    ``groupby().aggregate()`` pays per-GROUP overhead (~tens of ms per
    distinct key — measured 259 s for 14.7k pair groups vs 0.3 s for
    this shape), which no pair-count reduction survives at scale."""

    def add_pg(t: pa.Table) -> pa.Table:
        pg = (
            (t.column("a_id").to_numpy() * 31 + t.column("b_id").to_numpy())
            % n_coarse
        ).astype(np.int32)
        return t.append_column("pg", pa.array(pg))

    def sum_groups(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["a_id", "b_id"], as_index=False)["n"].sum()

    return (
        part.map_batches(add_pg, batch_format="pyarrow")
        .groupby("pg")
        .map_groups(sum_groups, batch_format="pandas")
    )


# ------------------------------------------------------------------- minhash

def _verify_counts_distributed(
    sh: rd.Dataset, cand: pd.DataFrame, *, id_col: str, n_buckets: int = 256
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact-Jaccard verification counts WITHOUT a driver shingle frame.

    ``sh`` is the exploded (doc_id, shingle) Dataset of candidate docs
    (distinct shingles per doc); ``cand`` the candidate pairs. Shingles
    co-locate by COARSE hash bucket (``shingle % n_buckets``) — a few
    hundred large ``map_groups`` calls instead of one per distinct
    shingle (per-group overhead dominated that shape) — and inside a
    bucket everything is vectorized pandas:

    1. self-merge on ``shingle`` → all co-occurring doc pairs, inner-
       joined against the broadcast candidate frame (only candidate
       pairs survive), grouped count → partial |A∩B|
    2. per-doc row count → partial |A| (shingles are distinct per doc)
    3. a final :func:`_grouped_sum_pairs` over the per-bucket partials;
       membership partials ride along under b_id = −1.

    Only O(pairs + candidate docs) count rows reach the driver. The
    in-bucket self-merge costs Σ_shingle df² over CANDIDATE docs only —
    the same exactness cost ngram_jaccard_pairs documents, bounded here
    by the banding cap upstream. Returns (n_a, n_b, n_i) float arrays
    aligned with ``cand`` rows — absent docs (zero shingles) count 0,
    matching the merge path.
    """
    cand_ref = ray.put(cand[["a_id", "b_id"]].reset_index(drop=True))

    def add_bucket(t: pa.Table) -> pa.Table:
        b = (t.column("shingle").to_numpy() % n_buckets).astype(np.int32)
        return t.append_column("sbucket", pa.array(b))

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        cpairs = ray.get(cand_ref)
        left = g[[id_col, "shingle"]].rename(columns={id_col: "a_id"})
        right = g[[id_col, "shingle"]].rename(columns={id_col: "b_id"})
        m = left.merge(right, on="shingle")
        m = m[m["a_id"] < m["b_id"]]
        m = m.merge(cpairs, on=["a_id", "b_id"])
        inter = m.groupby(["a_id", "b_id"], as_index=False).size()
        inter = inter.rename(columns={"size": "n"})
        per_doc = g.groupby(id_col, as_index=False).size()
        sizes = pd.DataFrame(
            {
                "a_id": per_doc[id_col].astype(np.int64),
                "b_id": np.int64(-1),
                "n": per_doc["size"],
            }
        )
        out = pd.concat([inter, sizes], ignore_index=True)
        return out.astype({"a_id": np.int64, "b_id": np.int64, "n": np.int64})

    counts = _grouped_sum_pairs(
        sh.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("sbucket")
        .map_groups(bucket_counts, batch_format="pandas")
    ).to_pandas()
    sizes = counts.loc[counts["b_id"] == -1].set_index("a_id")["n"]
    imap = counts.loc[counts["b_id"] >= 0].set_index(["a_id", "b_id"])["n"]
    n_a = sizes.reindex(cand["a_id"]).fillna(0).to_numpy(dtype=np.float64)
    n_b = sizes.reindex(cand["b_id"]).fillna(0).to_numpy(dtype=np.float64)
    n_i = (
        imap.reindex(pd.MultiIndex.from_frame(cand[["a_id", "b_id"]]))
        .fillna(0)
        .to_numpy(dtype=np.float64)
    )
    return n_a, n_b, n_i


def minhash_lsh_candidates(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 1,
    threshold: float = 0.8,
    seed: int = 42,
    driver_verify_max: int = 4096,
) -> pd.DataFrame:
    """Near-duplicate pairs with exact Jaccard ≥ ``threshold``.

    Stages (the classic MinHash-LSH shape over Ray Data):
    1. per batch: shingle sets → minhash signatures → explode to one
       row per (band_id, band_hash, doc_id)  [vectorized, stateless]
    2. ``groupby(band_id, band_hash)`` → emit candidate pairs from
       buckets with ≥2 docs  [the only shuffle; bucket sizes are small
       for any sane banding]
    3. verify candidates with exact shingle Jaccard (false-positive
       removal; the textbook miss bound for j≥0.8 at 128/32 banding is
       ≈5e-8 — indicative only, since minhash_signature is an ad-hoc
       deterministic mix rather than a true universal hash family;
       empirical recall is pinned by the planted-duplicate test).

    Verification has two arithmetically identical forms, gated by
    ``driver_verify_max``: up to that many candidate pairs, the
    (doc_id, shingle) rows of candidate docs are collected and the
    intersections computed as pandas merges (fastest for the common
    tiny-candidate case); past it — a boilerplate-heavy crawl where
    banding floods — the shingle rows STAY a Dataset and the counts
    come from a per-shingle ``groupby().map_groups`` + grouped Count
    (:func:`_verify_counts_distributed`), so driver memory is
    O(pairs), never O(candidate shingles).

    Returns a pandas DataFrame (a_id, b_id, jaccard) sorted by ids —
    the verified-pair volume is tiny relative to the corpus.
    """
    a_params, b_params = minhash_params(num_perm, seed)
    rows_per_band = num_perm // bands
    a_ref = ray.put((a_params, b_params))

    def to_band_rows(batch: pa.Table) -> pa.Table:
        ap, bp = ray.get(a_ref)
        ids = batch.column(id_col).to_numpy()
        texts = batch.column(text_col).to_pylist()
        band_ids, band_hashes, doc_ids = [], [], []
        for i, t in enumerate(texts):
            sig = minhash_signature(word_shingles(t, shingle_k), ap, bp)
            bh = sig.reshape(bands, rows_per_band)
            for b in range(bands):
                band_ids.append(b)
                band_hashes.append(stable_hash64(bh[b].tobytes()) & 0x7FFFFFFFFFFFFFFF)
                doc_ids.append(int(ids[i]))
        bh = np.asarray(band_hashes, dtype=np.int64)
        return pa.table(
            {
                "band_id": pa.array(band_ids, pa.int32()),
                "band_hash": pa.array(bh),
                "cg": pa.array((bh % N_COARSE_GROUPS).astype(np.int32)),
                id_col: pa.array(doc_ids, pa.int64()),
            }
        )

    band_rows = ds.map_batches(to_band_rows, batch_format="pyarrow")

    cand = (
        band_rows.groupby("cg")
        .map_groups(
            _capped_bucket_pairs_frame(id_col, ["band_id", "band_hash"]),
            batch_format="pandas",
        )
        .to_pandas()
    )
    if len(cand) == 0:
        return pd.DataFrame({"a_id": [], "b_id": [], "jaccard": []}).astype(
            {"a_id": np.int64, "b_id": np.int64, "jaccard": np.float64}
        )
    # Dedupe across bands keeping the uncapped flag when any band emitted
    # the pair normally, so the overflow count below reports pairs that
    # ONLY exist thanks to star expansion (counting before dedup would
    # over-count pairs re-emitted from several bands).
    cand = (
        cand.sort_values("capped")
        .drop_duplicates(["a_id", "b_id"], keep="first")
        .reset_index(drop=True)
    )
    n_capped = int(cand["capped"].sum())
    if n_capped:
        logger.warning(
            "minhash LSH: %d candidate pairs exist only via over-cap "
            "buckets (> %d docs share a band hash) and used star "
            "expansion — clusters stay connected but some within-bucket "
            "pairs were not emitted",
            n_capped,
            BUCKET_PAIR_CAP,
        )
    cand = cand[["a_id", "b_id"]].astype(np.int64)

    # Verification: exact Jaccard over exploded (doc_id, shingle) rows.
    # Shingling runs inside map_batches (texts never reach the driver —
    # at most candidate docs' shingle hashes do, and above
    # driver_verify_max not even those).
    needed = np.unique(np.concatenate([cand["a_id"], cand["b_id"]])).astype(np.int64)
    needed_ref = ray.put(needed)

    def shingle_rows(batch: pa.Table) -> pa.Table:
        want = ray.get(needed_ref)
        ids = batch.column(id_col).to_numpy()
        mask = np.isin(ids, want)
        sub = batch.filter(pa.array(mask))
        sids = sub.column(id_col).to_numpy()
        texts = sub.column(text_col).to_pylist()
        id_parts, sh_parts = [], []
        for did, txt in zip(sids, texts):
            sh = word_shingles(txt, shingle_k)
            id_parts.append(np.full(len(sh), did, dtype=np.int64))
            sh_parts.append(sh.view(np.int64))
        if not id_parts:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "shingle": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                id_col: pa.array(np.concatenate(id_parts)),
                "shingle": pa.array(np.concatenate(sh_parts)),
            }
        )

    sh = ds.map_batches(shingle_rows, batch_format="pyarrow")
    if len(cand) > driver_verify_max:
        n_a, n_b, n_i = _verify_counts_distributed(sh, cand, id_col=id_col)
    else:
        # tiny-candidate fast path: vectorized double merge + grouped
        # count on the driver (arithmetically identical to the
        # distributed form — test_dedup_ann pins the parity)
        sh_df = sh.to_pandas()
        sizes = sh_df.groupby(id_col).size()
        cand = cand.assign(pair=np.arange(len(cand)))
        ea = cand[["pair", "a_id"]].merge(
            sh_df.rename(columns={id_col: "a_id"}), on="a_id"
        )
        eb = cand[["pair", "b_id"]].merge(
            sh_df.rename(columns={id_col: "b_id"}), on="b_id"
        )
        inter = ea.merge(eb, on=["pair", "shingle"]).groupby("pair").size()
        n_a = sizes.reindex(cand["a_id"]).fillna(0).to_numpy()
        n_b = sizes.reindex(cand["b_id"]).fillna(0).to_numpy()
        n_i = inter.reindex(cand["pair"]).fillna(0).to_numpy()
    union = n_a + n_b - n_i
    # union == 0 ⇔ both shingle sets empty ⇔ Jaccard 1.0 (matches jaccard())
    jac = np.where(union > 0, n_i / np.maximum(union, 1), 1.0)
    out = cand[["a_id", "b_id"]].assign(jaccard=jac)
    out = out[out["jaccard"] >= threshold].sort_values(["a_id", "b_id"])
    return out.reset_index(drop=True)


# ------------------------------------------------------------ n-gram jaccard

def ngram_jaccard_pairs(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
) -> pd.DataFrame:
    """EXACT all-pairs word-``k``-gram Jaccard near-dup — no sketching.

    The sketch-free sibling of :func:`minhash_lsh_candidates` (which has
    a nonzero analytic miss rate): every pair whose distinct k-shingle
    sets overlap at Jaccard ≥ ``threshold`` is returned, which makes the
    output mirrorable 1:1 by a brute-force SQL oracle.

    Shape (one shuffle chain; neither texts nor shingle sets ever reach
    the driver):

    1. ``map_batches``: explode each doc to distinct
       (doc_id, shingle-hash) rows  [vectorized, stateless]
    2. ``groupby(shingle)`` → emit (a_id, b_id) for every in-group pair
       plus one (doc_id, −1) membership row per member  [the shuffle;
       a group's document frequency bounds its pair fan-out]
    3. ``groupby(a_id, b_id)`` count → pair rows count |A∩B|, membership
       rows count |A|; only candidate pairs and THEIR sizes are
       collected (sizes filtered by a broadcast candidate-id set).

    Cost is Σ_shingle df² — exact, and right up to mid-size corpora or
    as a post-LSH verifier. At web scale set ``max_shingle_df``:
    shingle groups with document frequency above the cap are dropped
    from BOTH the intersection and the set sizes ("restricted Jaccard"
    over rare-enough shingles — boilerplate shingles carry no dedup
    signal), and the number of dropped shingles is logged, never silent;
    or switch to :func:`minhash_lsh_candidates`.

    Pairs sharing zero (kept) shingles are never emitted (their Jaccard
    is 0, or 0/0 for two empty sets) — matching the SQL mirror's inner
    join on shared shingles.
    """

    def shingle_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        texts = batch.column(text_col).to_pylist()
        id_parts, sh_parts = [], []
        for did, txt in zip(ids, texts):
            sh = word_shingles(txt, shingle_k)
            if len(sh):
                id_parts.append(np.full(len(sh), did, dtype=np.int64))
                sh_parts.append(sh.view(np.int64))
        if not id_parts:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "shingle": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                id_col: pa.array(np.concatenate(id_parts)),
                "shingle": pa.array(np.concatenate(sh_parts)),
            }
        )

    def group_rows(group: pd.DataFrame) -> pd.DataFrame:
        """One COARSE group = many shingles' doc groups (grouping by
        the raw shingle would pay per-group-call overhead once per
        DISTINCT shingle — untenable at web scale); segments emit all
        in-group pairs + one (doc, −1) membership row per member; an
        over-cap segment emits a single (−2, df) sentinel counted into
        the overflow log."""
        g = group.sort_values(["shingle", id_col], kind="stable")
        ids = g[id_col].to_numpy().astype(np.int64)
        keys = g[["shingle"]].to_numpy()
        starts = _segment_starts(keys)
        ends = np.append(starts[1:], len(g))
        seg_len = ends - starts
        # membership rows (doc, −1): one per row of a KEPT shingle —
        # over-cap shingles leave sizes AND intersections (restricted
        # Jaccard), exactly like the per-shingle form
        row_len = np.repeat(seg_len, seg_len)
        kept = (
            row_len <= max_shingle_df
            if max_shingle_df is not None
            else np.ones(len(ids), dtype=bool)
        )
        a_parts = [ids[kept]]
        b_parts = [np.full(int(kept.sum()), -1, dtype=np.int64)]
        for s, e in zip(starts[seg_len >= 2], ends[seg_len >= 2]):
            n = e - s
            if max_shingle_df is not None and n > max_shingle_df:
                a_parts.append(np.array([-2], dtype=np.int64))
                b_parts.append(np.array([n], dtype=np.int64))
                continue
            ai, bi = np.triu_indices(n, k=1)
            a_parts.append(ids[s:e][ai])
            b_parts.append(ids[s:e][bi])
        return pd.DataFrame(
            {"a_id": np.concatenate(a_parts), "b_id": np.concatenate(b_parts)}
        )

    counts = _grouped_sum_pairs(
        ds.map_batches(shingle_rows, batch_format="pyarrow")
        .map_batches(
            lambda t: t.append_column(
                "cg",
                pa.array(
                    (t.column("shingle").to_numpy() % N_COARSE_GROUPS).astype(
                        np.int32
                    )
                ),
            ),
            batch_format="pyarrow",
        )
        .groupby("cg")
        .map_groups(group_rows, batch_format="pandas")
        .map_batches(
            lambda t: t.append_column(
                "n", pa.array(np.ones(t.num_rows, dtype=np.int64))
            ),
            batch_format="pyarrow",
        )
    ).materialize()  # consumed three times below; O(pairs + docs) rows

    if max_shingle_df is not None:
        dropped = counts.map_batches(
            lambda t: t.filter(pc.equal(t.column("a_id"), -2)),
            batch_format="pyarrow",
        ).to_pandas()
        n_dropped = int(dropped["n"].sum()) if len(dropped) else 0
        if n_dropped:
            logger.warning(
                "ngram jaccard: %d shingles with document frequency > %d "
                "dropped from intersections AND set sizes (restricted "
                "Jaccard over rare shingles)",
                n_dropped,
                max_shingle_df,
            )

    pairs = counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("b_id"), 0)),
        batch_format="pyarrow",
    ).to_pandas()
    if len(pairs) == 0:
        return pd.DataFrame({"a_id": [], "b_id": [], "jaccard": []}).astype(
            {"a_id": np.int64, "b_id": np.int64, "jaccard": np.float64}
        )

    needed_ref = ray.put(
        np.unique(np.concatenate([pairs["a_id"], pairs["b_id"]])).astype(np.int64)
    )

    def keep_needed_sizes(t: pa.Table) -> pa.Table:
        want = ray.get(needed_ref)
        t = t.filter(pc.equal(t.column("b_id"), -1))
        mask = np.isin(t.column("a_id").to_numpy(), want)
        return t.filter(pa.array(mask))

    sizes_df = counts.map_batches(
        keep_needed_sizes, batch_format="pyarrow"
    ).to_pandas()
    sizes = sizes_df.set_index("a_id")["n"]
    na = sizes.reindex(pairs["a_id"]).to_numpy(dtype=np.float64)
    nb = sizes.reindex(pairs["b_id"]).to_numpy(dtype=np.float64)
    inter = pairs["n"].to_numpy(dtype=np.float64)
    jac = inter / (na + nb - inter)
    out = pairs[["a_id", "b_id"]].assign(jaccard=jac)
    out = out[out["jaccard"] >= threshold].sort_values(["a_id", "b_id"])
    return out.reset_index(drop=True).astype(
        {"a_id": np.int64, "b_id": np.int64, "jaccard": np.float64}
    )


# ------------------------------------------------------------------- simhash

def simhash_near_dups(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> pd.DataFrame:
    """Pairs whose 64-bit SimHash differs by ≤ ``max_hamming`` bits.

    Blocking: split the fingerprint into 4 16-bit bands; any pair within
    Hamming ≤ 3 shares at least one exact band (pigeonhole) →
    ``groupby(band_id, band_value)`` then verify Hamming distance.
    """

    def to_bands(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        texts = batch.column(text_col).to_pylist()
        fps = np.array([simhash64(t) for t in texts], dtype=np.uint64)
        n = len(ids)
        band_ids = np.repeat(np.arange(4, dtype=np.int32), n)
        band_vals = np.concatenate(
            [((fps >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64) for b in range(4)]
        )
        return pa.table(
            {
                "band_id": pa.array(band_ids),
                "band_val": pa.array(band_vals),
                "cg": pa.array(
                    ((band_vals + band_ids) % N_COARSE_GROUPS).astype(np.int32)
                ),
                id_col: pa.array(np.tile(ids, 4), pa.int64()),
                "fp": pa.array(np.tile(fps.astype(np.int64), 4)),
            }
        )

    def _popcount64(x: np.ndarray) -> np.ndarray:
        d = np.zeros(len(x), dtype=np.int64)
        v = x.copy()
        for _ in range(64):
            if not v.any():
                break
            d += (v & np.uint64(1)).astype(np.int64)
            v >>= np.uint64(1)
        return d

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        """One COARSE group = many (band_id, band_val) buckets;
        segmented inside (see _capped_bucket_pairs_frame), Hamming
        verified with vectorized XOR + popcount per segment."""
        g = group.sort_values(["band_id", "band_val", id_col], kind="stable")
        ids = g[id_col].to_numpy().astype(np.int64)
        fps = g["fp"].to_numpy().astype(np.uint64)
        keys = g[["band_id", "band_val"]].to_numpy()
        starts = _segment_starts(keys)
        ends = np.append(starts[1:], len(g))
        frames = []
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue
            seg_ids, seg_fps = ids[s:e], fps[s:e]
            if n > BUCKET_PAIR_CAP:
                # star expansion against the smallest id; logged
                # downstream via the capped flag
                ai = np.zeros(n - 1, dtype=np.int64)
                bi = np.arange(1, n, dtype=np.int64)
                capped = True
            else:
                ai, bi = np.triu_indices(n, k=1)
                capped = False
            d = _popcount64(seg_fps[ai] ^ seg_fps[bi])
            keep = d <= max_hamming
            if keep.any():
                frames.append(
                    pd.DataFrame(
                        {
                            "a_id": seg_ids[ai[keep]],
                            "b_id": seg_ids[bi[keep]],
                            "hamming": d[keep],
                            "capped": capped,
                        }
                    )
                )
        if not frames:
            return pd.DataFrame(
                {"a_id": [], "b_id": [], "hamming": [], "capped": []}
            ).astype(
                {
                    "a_id": np.int64,
                    "b_id": np.int64,
                    "hamming": np.int64,
                    "capped": bool,
                }
            )
        return pd.concat(frames, ignore_index=True)

    pairs = (
        ds.map_batches(to_bands, batch_format="pyarrow")
        .groupby("cg")
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    if len(pairs) and pairs["capped"].any():
        logger.warning(
            "simhash blocking: %d pairs from over-cap buckets (> %d docs "
            "share a 16-bit band) used star expansion",
            int(pairs["capped"].sum()),
            BUCKET_PAIR_CAP,
        )
    if len(pairs):
        pairs = pairs[["a_id", "b_id", "hamming"]]
    if len(pairs) == 0:
        return pd.DataFrame({"a_id": [], "b_id": [], "hamming": []}).astype(
            {"a_id": np.int64, "b_id": np.int64, "hamming": np.int64}
        )
    return (
        pairs.drop_duplicates(subset=["a_id", "b_id"])
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
        .astype({"a_id": np.int64, "b_id": np.int64, "hamming": np.int64})
    )


# ----------------------------------------------------------------- embedding

def embedding_near_dups_lsh(
    ds: rd.Dataset,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 24,
    bands: int = 4,
    seed: int = 42,
) -> pd.DataFrame:
    """Cosine ≥ ``threshold`` pairs via banded hyperplane LSH — the
    scale path :func:`embedding_near_dups` lacks: no corpus matrix on
    the driver, no O(n²) matmul. Signatures (``n_planes`` sign bits)
    split into ``bands``; a pair collides in a band with probability
    ``(1−θ/π)^(n_planes/bands)`` (θ = the threshold angle), so genuine
    near-dups share ≥1 band w.h.p. while far pairs rarely do. Stages:

    1. per batch: normalize → sign bits → one row per (band, value, id)
    2. ``groupby(band, value)`` → candidate pairs (star-capped like the
       MinHash path, overflow logged)
    3. exact cosine verification over candidate vectors only.
    """
    from .ann import _normalize, _sig_ints

    first = ds.take(1)[0]
    dim = len(first[vec_col])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    r = n_planes // bands
    pref = ray.put(planes)

    def to_bands(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:  # Ray may emit empty blocks under splits
            return pd.DataFrame(
                {
                    "band_id": np.array([], dtype=np.int64),
                    "band_val": np.array([], dtype=np.int64),
                    "cg": np.array([], dtype=np.int32),
                    id_col: np.array([], dtype=np.int64),
                }
            )
        pl = ray.get(pref)
        ids = batch[id_col].to_numpy().astype(np.int64)
        bits = _normalize(np.stack(batch[vec_col].to_numpy())) @ pl > 0
        frames = []
        for b in range(bands):
            val = _sig_ints(bits[:, b * r : (b + 1) * r]).astype(np.int64)
            frames.append(
                pd.DataFrame(
                    {
                        "band_id": b,
                        "band_val": val,
                        "cg": ((val + b) % N_COARSE_GROUPS).astype(np.int32),
                        id_col: ids,
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    cand = (
        ds.map_batches(to_bands, batch_format="pandas")
        .groupby("cg")
        .map_groups(
            _capped_bucket_pairs_frame(id_col, ["band_id", "band_val"]),
            batch_format="pandas",
        )
        .to_pandas()
    )
    empty = pd.DataFrame({"a_id": [], "b_id": [], "cosine": []}).astype(
        {"a_id": np.int64, "b_id": np.int64, "cosine": np.float64}
    )
    if len(cand) == 0:
        return empty
    if cand["capped"].any():
        logger.warning(
            "embedding LSH: %d pairs from over-cap buckets used star expansion",
            int(cand["capped"].sum()),
        )
    cand = cand[["a_id", "b_id"]].drop_duplicates().astype(np.int64)

    needed = np.unique(np.concatenate([cand["a_id"], cand["b_id"]]))
    need_ref = ray.put(needed)

    def project_needed(batch: pd.DataFrame) -> pd.DataFrame:
        want = ray.get(need_ref)
        m = np.isin(batch[id_col].to_numpy(), want)
        return batch.loc[m, [id_col, vec_col]]

    vecs = ds.map_batches(project_needed, batch_format="pandas").to_pandas()
    mat = np.stack(vecs[vec_col].to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    pos = {int(i): j for j, i in enumerate(vecs[id_col].to_numpy())}
    a = np.array([pos[i] for i in cand["a_id"]])
    b = np.array([pos[i] for i in cand["b_id"]])
    cos = np.einsum("ij,ij->i", mat[a], mat[b])
    out = cand.assign(cosine=cos)
    out = out[out["cosine"] >= threshold].sort_values(["a_id", "b_id"])
    return out.reset_index(drop=True) if len(out) else empty


def embedding_near_dups(
    ds: rd.Dataset,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
) -> pd.DataFrame:
    """Pairs with cosine similarity ≥ ``threshold``.

    The corpus embedding matrix is L2-normalized once, broadcast via
    ``ray.put``, and each batch does one float64 matmul against it —
    brute force O(n²) compute but O(n·d) memory per task. This is the
    exact small-corpus baseline; :func:`embedding_near_dups_lsh` is the
    banded-bucket scale path (no driver matrix, no all-pairs matmul).
    """
    full = ds.select_columns([id_col, vec_col]).to_pandas()
    ids_all = full[id_col].to_numpy().astype(np.int64)
    mat = np.stack(full[vec_col].to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids_all, mat))

    def batch_pairs(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame(
                {
                    "a_id": np.array([], dtype=np.int64),
                    "b_id": np.array([], dtype=np.int64),
                    "cosine": np.array([], dtype=np.float64),
                }
            )
        ids_a, m = ray.get(ref)
        ids = batch[id_col].to_numpy().astype(np.int64)
        v = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        sims = v @ m.T
        rows = []
        for i in range(len(ids)):
            hits = np.flatnonzero(sims[i] >= threshold)
            for j in hits:
                if ids[i] < ids_a[j]:
                    rows.append((int(ids[i]), int(ids_a[j]), float(sims[i, j])))
        out = pd.DataFrame(rows, columns=["a_id", "b_id", "cosine"])
        if not rows:  # typed even when a non-empty batch has no hits —
            # an all-object empty frame mixes dtypes across blocks
            out = out.astype(
                {"a_id": np.int64, "b_id": np.int64, "cosine": np.float64}
            )
        return out

    pairs = ds.map_batches(batch_pairs, batch_format="pandas").to_pandas()
    if len(pairs) == 0:
        return pd.DataFrame({"a_id": [], "b_id": [], "cosine": []}).astype(
            {"a_id": np.int64, "b_id": np.int64, "cosine": np.float64}
        )
    return pairs.sort_values(["a_id", "b_id"]).reset_index(drop=True)
