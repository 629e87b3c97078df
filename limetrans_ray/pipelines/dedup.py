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


def _bucket_pairs_capped(ids: np.ndarray, cap: int) -> tuple[list, bool]:
    ids = np.sort(ids)
    if len(ids) <= cap:
        return [(int(a), int(b)) for i, a in enumerate(ids) for b in ids[i + 1 :]], False
    anchor = int(ids[0])
    return [(anchor, int(b)) for b in ids[1:]], True


def _capped_bucket_pairs_frame(id_col: str):
    """The shared map_groups body for every banded-bucket candidate
    stage (MinHash / embedding LSH): capped pairs + the ``capped`` flag
    the caller logs (the one place the cap semantics live)."""

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = group[id_col].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"a_id": [], "b_id": [], "capped": []}).astype(
                {"a_id": np.int64, "b_id": np.int64, "capped": bool}
            )
        pairs, capped = _bucket_pairs_capped(ids, BUCKET_PAIR_CAP)
        out = pd.DataFrame(pairs, columns=["a_id", "b_id"])
        out["capped"] = capped
        return out

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


# ------------------------------------------------------------------- minhash

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

    Returns a pandas DataFrame (a_id, b_id, jaccard) sorted by ids —
    candidate volume is tiny relative to the corpus.
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
        return pa.table(
            {
                "band_id": pa.array(band_ids, pa.int32()),
                "band_hash": pa.array(band_hashes, pa.int64()),
                id_col: pa.array(doc_ids, pa.int64()),
            }
        )

    band_rows = ds.map_batches(to_band_rows, batch_format="pyarrow")

    cand = (
        band_rows.groupby(["band_id", "band_hash"])
        .map_groups(_capped_bucket_pairs_frame(id_col), batch_format="pandas")
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
    # only candidate docs' shingle hashes do) and the per-pair
    # intersection is a vectorized double merge + grouped count, no
    # per-row Python on the driver. Documented scale path for
    # candidates ≫ driver memory: same two merges as Ray hash joins.
    needed = set(cand["a_id"]).union(cand["b_id"])
    needed_ref = ray.put(needed)

    def shingle_rows(batch: pa.Table) -> pa.Table:
        want = ray.get(needed_ref)
        ids = batch.column(id_col).to_numpy()
        mask = np.fromiter((int(i) in want for i in ids), dtype=bool, count=len(ids))
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

    sh_df = ds.map_batches(shingle_rows, batch_format="pyarrow").to_pandas()
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

    _EMPTY = pd.DataFrame({"a_id": [], "b_id": []}).astype(
        {"a_id": np.int64, "b_id": np.int64}
    )

    def group_rows(group: pd.DataFrame) -> pd.DataFrame:
        """Rows for one shingle's doc group: all in-group pairs + one
        (doc, −1) membership row per member; an over-cap group emits a
        single (−2, df) sentinel counted into the overflow log."""
        ids = np.sort(group[id_col].to_numpy().astype(np.int64))
        n = len(ids)
        if n == 0:
            return _EMPTY
        if max_shingle_df is not None and n > max_shingle_df:
            return pd.DataFrame(
                {"a_id": np.array([-2], dtype=np.int64),
                 "b_id": np.array([n], dtype=np.int64)}
            )
        ai, bi = np.triu_indices(n, k=1)
        return pd.DataFrame(
            {
                "a_id": np.concatenate([ids[ai], ids]),
                "b_id": np.concatenate([ids[bi], np.full(n, -1, dtype=np.int64)]),
            }
        )

    counts = (
        ds.map_batches(shingle_rows, batch_format="pyarrow")
        .groupby("shingle")
        .map_groups(group_rows, batch_format="pandas")
        .groupby(["a_id", "b_id"])
        .aggregate(Count(alias_name="n"))
        .materialize()  # consumed three times below; O(pairs + docs) rows
    )

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

    needed_ref = ray.put(set(pairs["a_id"]).union(pairs["b_id"]))

    def keep_needed_sizes(t: pa.Table) -> pa.Table:
        want = ray.get(needed_ref)
        t = t.filter(pc.equal(t.column("b_id"), -1))
        ids = t.column("a_id").to_numpy()
        mask = np.fromiter(
            (int(i) in want for i in ids), dtype=bool, count=len(ids)
        )
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
                id_col: pa.array(np.tile(ids, 4), pa.int64()),
                "fp": pa.array(np.tile(fps.astype(np.int64), 4)),
            }
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(id_col)
        ids = g[id_col].to_numpy()
        fps = g["fp"].to_numpy().astype(np.uint64)
        if len(ids) > BUCKET_PAIR_CAP:
            # star expansion against the smallest id (vectorized XOR +
            # popcount); logged downstream via the capped flag
            x = fps[0] ^ fps[1:]
            d = np.zeros(len(x), dtype=np.int64)
            v = x.copy()
            for _ in range(64):
                d += (v & np.uint64(1)).astype(np.int64)
                v >>= np.uint64(1)
                if not v.any():
                    break
            keep = d <= max_hamming
            out = pd.DataFrame(
                {
                    "a_id": np.full(int(keep.sum()), ids[0], dtype=np.int64),
                    "b_id": ids[1:][keep].astype(np.int64),
                    "hamming": d[keep],
                }
            )
            out["capped"] = True
            return out
        rows = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = bin(int(fps[i]) ^ int(fps[j])).count("1")
                if d <= max_hamming:
                    rows.append((int(ids[i]), int(ids[j]), d))
        out = pd.DataFrame(rows, columns=["a_id", "b_id", "hamming"]).astype(
            {"a_id": np.int64, "b_id": np.int64, "hamming": np.int64}
        )
        out["capped"] = False
        return out

    pairs = (
        ds.map_batches(to_bands, batch_format="pyarrow")
        .groupby(["band_id", "band_val"])
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
                pd.DataFrame({"band_id": b, "band_val": val, id_col: ids})
            )
        return pd.concat(frames, ignore_index=True)

    cand = (
        ds.map_batches(to_bands, batch_format="pandas")
        .groupby(["band_id", "band_val"])
        .map_groups(_capped_bucket_pairs_frame(id_col), batch_format="pandas")
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
