"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (documents → inverted index →
BM25 top-k) on sf0.001; ``queries()`` exposes one callable per
implemented operator family from SURVEY.md §2 (+ the training-data
extensions); ``oracle_sql()`` gives the DuckDB-verifiable ANSI-SQL
mirror for every SQL-expressible entry (same column names, rounded
floats where engines differ in summation order). Ray is initialised by
the driver BEFORE this module is imported — nothing here calls
``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np

# BM25 reference query set over the documents-table vocabulary
# (FIXTURES.md §3 spirit: single terms, multi-term AND, frequency
# discrimination, tie cases).
BM25_QUERY_SET = [
    "spark",
    "query join",
    "window agg",
    "customer order line",
    "hash merge",
    "stream batch",
    "table scan filter",
    "slow fast",
    "big small value",
    "sort group key",
]


def _index_root(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return f"/tmp/limetrans_ray_index/{tag}"


def _bm25_topk(sf_dir: str, k: int = 10):
    """Flagship: build (or resume) the inverted index over the documents
    table, then run the reference query set through the block-max pruned
    scorer. Returns (query, rank, doc_id, score)."""
    import pandas as pd
    import ray.data as rd

    from limetrans_ray.pipelines.build_index import build_index_from_documents
    from limetrans_ray.pipelines.search import SearchEngine
    from limetrans_ray.state.manifest import fingerprint_paths

    from limetrans_ray import ANALYZER_VERSION, FORMAT_VERSION

    doc_path = f"{sf_dir}/documents.parquet"
    root = _index_root(sf_dir)
    ds = rd.read_parquet(doc_path, columns=["doc_id", "text"])
    # format+analyzer versions in the fingerprint: a code upgrade
    # invalidates the cached /tmp build instead of resuming onto an old
    # layout
    build_index_from_documents(
        ds, root,
        fingerprint=f"{fingerprint_paths([doc_path])}-v{FORMAT_VERSION}-a{ANALYZER_VERSION}",
    )
    eng = SearchEngine(root)
    rows = []
    for q in BM25_QUERY_SET:
        for rank, (doc_id, score) in enumerate(eng.search(q, k, mode="and"), 1):
            rows.append((q, rank, doc_id, round(score, 6)))
    return pd.DataFrame(rows, columns=["query", "rank", "doc_id", "score"])


def _bm25_simple_topk(sf_dir: str, k: int = 10):
    """Flagship with a DRIVER-VERIFIABLE oracle: the index is built with
    the ``simple`` analyzer profile (lowercase alnum split —
    ``simple_terms``, deliberately ANSI-SQL-expressible), so the ENTIRE
    index-then-query round trip (tokenize → tf/df/dl/avgdl → BM25 idf ×
    impact → AND semantics → (score desc, doc_id asc) top-k) is mirrored
    exactly in DuckDB. This is the reference's index-then-query
    conformance discipline (ElasticsearchQueryTest.java:315-354)
    expressed in the driver's hard signal; the full-analyzer flagship
    (``bm25_topk``) keeps its pytest rank-identity oracle."""
    import pandas as pd
    import ray.data as rd

    from limetrans_ray.pipelines.build_index import build_index_from_documents
    from limetrans_ray.pipelines.search import SearchEngine
    from limetrans_ray.state.manifest import fingerprint_paths
    from limetrans_ray import ANALYZER_VERSION, FORMAT_VERSION

    doc_path = f"{sf_dir}/documents.parquet"
    root = _index_root(sf_dir) + "-simple"
    ds = rd.read_parquet(doc_path, columns=["doc_id", "text"])
    build_index_from_documents(
        ds, root, analyzer="simple",
        fingerprint=f"{fingerprint_paths([doc_path])}-v{FORMAT_VERSION}-a{ANALYZER_VERSION}-s",
    )
    eng = SearchEngine(root)
    rows = []
    for q in BM25_QUERY_SET:
        for rank, (doc_id, score) in enumerate(eng.search(q, k, mode="and"), 1):
            rows.append((q, rank, doc_id, round(score, 6)))
    return pd.DataFrame(rows, columns=["query", "rank", "doc_id", "score"])


WILDCARD_QUERY_SET = [
    "s*",
    "qu* window",
    "c* hash",
    "ta* sc*",
    "gr* key join",
]


def _wildcard_simple_topk(sf_dir: str, k: int = 10):
    """Wildcard (trailing-star prefix) queries through the driver's hard
    signal — the ``analyze_wildcard`` analogue (reference
    ElasticsearchQueryTest.java:315-354): each ``pref*`` clause expands
    over the simple-profile index's term dictionary (lexicographically
    first MAX_PREFIX_EXPANSIONS — corpus-derived, so DuckDB re-derives
    the identical expansion with LIKE + row_number), expanded variants
    score OR-within-group / AND-across-groups with BM25 summed over
    distinct matched terms. Shares the cached simple index build with
    ``bm25_simple_topk``."""
    import pandas as pd
    import ray.data as rd

    from limetrans_ray.pipelines.build_index import build_index_from_documents
    from limetrans_ray.pipelines.search import SearchEngine
    from limetrans_ray.state.manifest import fingerprint_paths
    from limetrans_ray import ANALYZER_VERSION, FORMAT_VERSION

    doc_path = f"{sf_dir}/documents.parquet"
    root = _index_root(sf_dir) + "-simple"
    ds = rd.read_parquet(doc_path, columns=["doc_id", "text"])
    build_index_from_documents(
        ds, root, analyzer="simple",
        fingerprint=f"{fingerprint_paths([doc_path])}-v{FORMAT_VERSION}-a{ANALYZER_VERSION}-s",
    )
    eng = SearchEngine(root)
    rows = []
    for q in WILDCARD_QUERY_SET:
        for rank, (doc_id, score) in enumerate(eng.search(q, k, mode="and"), 1):
            rows.append((q, rank, doc_id, round(score, 6)))
    return pd.DataFrame(rows, columns=["query", "rank", "doc_id", "score"])


BM25_PHRASE_SET = [
    '"table part"',
    '"query join"',
    '"slow fast" table',
    '"customer order line"',
    '"key value" scan',
]


def _bm25_phrase_topk(sf_dir: str, k: int = 10):
    """Phrase-query flagship variant: positional index, quoted clauses
    filter to consecutive-position matches. Driver-verified against the
    full-analyzer SQL mirror (``_bm25_phrase_full_sql``); additionally
    pinned by tests/test_phrase.py oracle parity."""
    import pandas as pd
    import ray.data as rd

    from limetrans_ray.pipelines.build_index import build_index_from_documents
    from limetrans_ray.pipelines.search import SearchEngine
    from limetrans_ray.state.manifest import fingerprint_paths
    from limetrans_ray import ANALYZER_VERSION, FORMAT_VERSION

    doc_path = f"{sf_dir}/documents.parquet"
    root = _index_root(sf_dir)
    ds = rd.read_parquet(doc_path, columns=["doc_id", "text"])
    build_index_from_documents(
        ds, root,
        fingerprint=f"{fingerprint_paths([doc_path])}-v{FORMAT_VERSION}-a{ANALYZER_VERSION}",
    )
    eng = SearchEngine(root)
    rows = []
    for q in BM25_PHRASE_SET:
        for rank, (doc_id, score) in enumerate(eng.search(q, k, mode="and"), 1):
            rows.append((q, rank, doc_id, round(score, 6)))
    return pd.DataFrame(rows, columns=["query", "rank", "doc_id", "score"])


def _bm25_phrase_simple_topk(sf_dir: str, k: int = 10):
    """Phrase flagship with a DRIVER-VERIFIABLE oracle: the positional
    index uses the ``simple`` profile, so phrase filtering (contiguous
    token runs) AND the BM25 arithmetic both mirror exactly in DuckDB
    (substring containment over the space-joined token stream). Shares
    the cached simple index build with ``bm25_simple_topk``."""
    import pandas as pd
    import ray.data as rd

    from limetrans_ray.pipelines.build_index import build_index_from_documents
    from limetrans_ray.pipelines.search import SearchEngine
    from limetrans_ray.state.manifest import fingerprint_paths
    from limetrans_ray import ANALYZER_VERSION, FORMAT_VERSION

    doc_path = f"{sf_dir}/documents.parquet"
    root = _index_root(sf_dir) + "-simple"
    ds = rd.read_parquet(doc_path, columns=["doc_id", "text"])
    build_index_from_documents(
        ds, root, analyzer="simple",
        fingerprint=f"{fingerprint_paths([doc_path])}-v{FORMAT_VERSION}-a{ANALYZER_VERSION}-s",
    )
    eng = SearchEngine(root)
    rows = []
    for q in BM25_PHRASE_SET:
        for rank, (doc_id, score) in enumerate(eng.search(q, k, mode="and"), 1):
            rows.append((q, rank, doc_id, round(score, 6)))
    return pd.DataFrame(rows, columns=["query", "rank", "doc_id", "score"])


FIELDED_SIMPLE_FIELDS = [
    ("body", "text", "text"),
    ("lang", "lang", "keyword"),
    ("source", "source", "keyword"),
]
FIELDED_SIMPLE_QUERY_SET = [
    "body:spark",
    "spark lang:en",
    "source:src3",
    "body:query lang:de",
    'body:"query join"',
    "body:join source:src12",
]


def _fielded_simple_search(sf_dir: str, k: int = 10):
    """Field-scoped search with a DRIVER-VERIFIABLE oracle: the
    multi-field index (text body + keyword lang/source) is built under
    the ``simple`` profile, so qualified-term postings, keyword
    normalization, phrase filtering and BM25 all mirror exactly in
    DuckDB. The full-analyzer variant (``fielded_search``) keeps its
    pytest rank-identity oracle."""
    import pandas as pd
    import ray.data as rd

    from limetrans_ray.pipelines.build_index import build_index_from_documents
    from limetrans_ray.pipelines.search import SearchEngine
    from limetrans_ray.state.manifest import fingerprint_paths
    from limetrans_ray import ANALYZER_VERSION, FORMAT_VERSION

    doc_path = f"{sf_dir}/documents.parquet"
    root = _index_root(sf_dir) + "-fsimple"
    ds = rd.read_parquet(doc_path, columns=["doc_id", "text", "lang", "source"])
    build_index_from_documents(
        ds, root, analyzer="simple", fields=FIELDED_SIMPLE_FIELDS,
        fingerprint=f"{fingerprint_paths([doc_path])}-v{FORMAT_VERSION}-a{ANALYZER_VERSION}-fs",
    )
    eng = SearchEngine(root)
    rows = []
    for q in FIELDED_SIMPLE_QUERY_SET:
        for rank, (doc_id, score) in enumerate(eng.search(q, k, mode="and"), 1):
            rows.append((q, rank, doc_id, round(score, 6)))
    return pd.DataFrame(rows, columns=["query", "rank", "doc_id", "score"])


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001."""
    return _bm25_topk("/root/testdata/sf0.001")


# ---------------------------------------------------------------- queries

def _ann_topk(sf_dir: str):
    import pyarrow.parquet as pq
    import ray.data as rd

    from limetrans_ray.pipelines.ann import brute_force_topk

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    qdf = tbl[tbl["vec_id"] < 5].sort_values("vec_id")
    queries = np.stack(qdf["embedding"].to_numpy())
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    out = brute_force_topk(ds, queries, qdf["vec_id"].tolist(), k=10)
    out["cosine"] = out["cosine"].round(6)
    return out


def _ann_lsh_topk(sf_dir: str):
    """Pruned-read ANN: queries run against the bucket-partitioned LSH
    index (hive ``bucket=`` layout) and read ONLY probed partitions —
    the scale path, with io transparency (scanned/total rows) carried in
    the result frame. The index build is cached per input fingerprint."""
    import json
    import shutil

    import pyarrow.parquet as pq
    import ray.data as rd

    from limetrans_ray.pipelines.ann import build_lsh_index, lsh_topk_indexed
    from limetrans_ray.state.manifest import fingerprint_paths

    emb_path = f"{sf_dir}/embeddings.parquet"
    tbl = pq.read_table(emb_path).to_pandas()
    qdf = tbl[tbl["vec_id"] < 5].sort_values("vec_id")

    idx_dir = _index_root(sf_dir) + "-annlsh"
    fp = fingerprint_paths([emb_path])
    marker = os.path.join(idx_dir, "fingerprint.json")
    fresh = False
    if os.path.exists(marker):
        with open(marker) as fh:
            fresh = json.load(fh).get("fp") == fp
    if not fresh:
        shutil.rmtree(idx_dir, ignore_errors=True)
        ds = rd.read_parquet(emb_path)
        build_lsh_index(ds, idx_dir)
        with open(marker, "w") as fh:
            json.dump({"fp": fp}, fh)
    out, io_stats = lsh_topk_indexed(
        idx_dir, np.stack(qdf["embedding"].to_numpy()), qdf["vec_id"].tolist(), k=10
    )
    out["cosine"] = out["cosine"].round(6)
    out["scanned_rows"] = np.int64(io_stats["scanned_rows"])
    out["total_rows"] = np.int64(io_stats["total_rows"])
    return out


def _dedup_exact(sf_dir: str):
    import ray.data as rd

    from limetrans_ray.pipelines.dedup import exact_dedup

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return exact_dedup(ds)


def _neardup_minhash(sf_dir: str):
    import ray.data as rd

    from limetrans_ray.pipelines.dedup import minhash_lsh_candidates

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    # word 3-gram shingles: the documents table shares a tiny vocabulary,
    # so unigram sets would make every pair "similar" — sequences do not
    out = minhash_lsh_candidates(ds, threshold=0.8, shingle_k=3)
    out["jaccard"] = out["jaccard"].round(6)
    return out


def _neardup_ngram(sf_dir: str):
    import ray.data as rd

    from limetrans_ray.pipelines.dedup import ngram_jaccard_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    # the EXACT sketch-free sibling of neardup_minhash: same word-3-gram
    # shingles and τ=0.8, but all-pairs via shingle co-grouping, so the
    # brute-force SQL mirror is the literal definition, not a bound
    out = ngram_jaccard_pairs(ds, threshold=0.8, shingle_k=3)
    out["jaccard"] = out["jaccard"].round(6)
    return out


def _embedding_sim_pairs(sf_dir: str):
    import ray.data as rd

    from limetrans_ray.pipelines.dedup import embedding_near_dups

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    # pairwise cosine similarity join (near-dup when τ is high; the
    # synthetic embeddings are well-spread, so the driver query uses
    # τ=0.4 to exercise the pipeline on non-trivial output sizes)
    out = embedding_near_dups(ds, threshold=0.4)
    out["cosine"] = out["cosine"].round(6)
    return out


# the Metafix text program behind fix_pipeline — parsed and compiled by
# fixparser at query time (this IS the artifact a limetrans user owns;
# if/elsif routing + map lookup + paste, the alma.fix shape in miniature)
_FIX_PROGRAM = """
put_map("langs", "de": "German", "en": "English")
if any_match("source", "src1[02468]")
  add_field("bucket", "even-teens")
elsif any_match("source", "src[0-9]")
  add_field("bucket", "single")
else
  add_field("bucket", "other")
end
lookup("lang", "langs", default: "Other")
paste("label", "bucket", "lang", join_char: "-")
retain("label")
"""


def _fix_pipeline(sf_dir: str):
    """A Metafix TEXT program end-to-end: documents rows → flat records
    → fixparser.compile_fix(_FIX_PROGRAM) → RecordOps → grouped counts,
    CASE-mirrored in DuckDB. The sibling of recordops_pipeline with the
    program as fix text instead of Python op tuples."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Count

    from limetrans_ray.functions.fixparser import compile_fix
    from limetrans_ray.functions.recordops import RecordOps

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "source"]
    )

    def to_rows(batch: pa.Table) -> pa.Table:
        ids = [str(i) for i in batch.column("doc_id").to_pylist()]
        langs = batch.column("lang").to_pylist()
        srcs = batch.column("source").to_pylist()
        n = len(ids)
        return pa.table(
            {
                "record_id": pa.array(ids + ids, pa.string()),
                "field": pa.array(["lang"] * n + ["source"] * n, pa.string()),
                "subfield": pa.array([None] * (2 * n), pa.string()),
                "occurrence": pa.array([0] * (2 * n), pa.int32()),
                "value": pa.array(langs + srcs, pa.string()),
            }
        )

    ops = RecordOps(compile_fix(_FIX_PROGRAM))
    rows = ds.map_batches(to_rows, batch_format="pyarrow").map_batches(
        ops, batch_format="pyarrow"
    )
    return (
        rows.groupby(["field", "value"])
        .aggregate(Count(alias_name="n"))
        .select_columns(["field", "value", "n"])
    )


# the array-command program behind fix_array_pipeline — split_field /
# filter / join_field (the marc/_facet_type-2.fix:130-144 array-value
# shape) through the driver's hard signal
_FIX_ARRAY_PROGRAM = """
split_field("tags", ",")
filter("tags", "^(de|en|src)")
join_field("tags", "|")
retain("tags")
"""


def _fix_array_pipeline(sf_dir: str):
    """The Metafix ARRAY-value commands end-to-end: each documents row
    becomes a record whose ``tags`` value is ``lang,source``; the fix
    program splits it, regex-filters the values (only de/en langs and
    every source survive) and joins the remainder — CASE-mirrored in
    DuckDB as string concatenation."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Count

    from limetrans_ray.functions.fixparser import compile_fix
    from limetrans_ray.functions.recordops import RecordOps

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "source"]
    )

    def to_rows(batch: pa.Table) -> pa.Table:
        ids = [str(i) for i in batch.column("doc_id").to_pylist()]
        langs = batch.column("lang").to_pylist()
        srcs = batch.column("source").to_pylist()
        return pa.table(
            {
                "record_id": pa.array(ids, pa.string()),
                "field": pa.array(["tags"] * len(ids), pa.string()),
                "subfield": pa.array([None] * len(ids), pa.string()),
                "occurrence": pa.array([0] * len(ids), pa.int32()),
                "value": pa.array(
                    [f"{l},{s}" for l, s in zip(langs, srcs)], pa.string()
                ),
            }
        )

    ops = RecordOps(compile_fix(_FIX_ARRAY_PROGRAM))
    rows = ds.map_batches(to_rows, batch_format="pyarrow").map_batches(
        ops, batch_format="pyarrow"
    )
    return (
        rows.groupby(["field", "value"])
        .aggregate(Count(alias_name="n"))
        .select_columns(["field", "value", "n"])
    )


# the RDF Turtle source behind rdfmap_pipeline — exercises @prefix
# expansion, ";" continuation predicates, target-predicate filtering and
# IRI objects (the put_rdfmap surface; reference map loaders documented
# in bin/maps/*.sh + alma.fix map usage)
_RDF_LANG_TTL = """\
@prefix ex: <http://example.org/> .
@prefix skos: <http://www.w3.org/2004/02/skos/core#> .
ex:de skos:prefLabel "German" ;
  skos:altLabel "Deutsch" .
ex:en skos:prefLabel "English" .
ex:es skos:prefLabel "Spanish" .
ex:fr skos:prefLabel "French" .
ex:zz skos:broader ex:root .
"""


def _rdfmap_pipeline(sf_dir: str):
    """put_rdfmap end-to-end through the driver's hard signal: a Turtle
    vocabulary file loads as a subject→prefLabel lookup map inside a
    Metafix TEXT program (put_rdfmap + prepend-to-IRI + lookup with
    default), applied to documents records, grouped counts CASE-mirrored
    in DuckDB. The RDF sibling of fix_pipeline."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Count

    from limetrans_ray.functions.fixparser import compile_fix
    from limetrans_ray.functions.recordops import RecordOps

    ttl = "/tmp/limetrans_ray_rdfmap/langs.ttl"
    os.makedirs(os.path.dirname(ttl), exist_ok=True)
    with open(ttl, "w", encoding="utf-8") as fh:
        fh.write(_RDF_LANG_TTL)

    fix_text = f"""
put_rdfmap("{ttl}", "langnames", target: "skos:prefLabel")
prepend("lang", "http://example.org/")
lookup("lang", "langnames", default: "Other")
copy_field("source", "collection")
retain("lang", "collection")
"""
    ops = RecordOps(compile_fix(fix_text))

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "source"]
    )

    def to_rows(batch: pa.Table) -> pa.Table:
        ids = [str(i) for i in batch.column("doc_id").to_pylist()]
        langs = batch.column("lang").to_pylist()
        srcs = batch.column("source").to_pylist()
        n = len(ids)
        return pa.table(
            {
                "record_id": pa.array(ids + ids, pa.string()),
                "field": pa.array(["lang"] * n + ["source"] * n, pa.string()),
                "subfield": pa.array([None] * (2 * n), pa.string()),
                "occurrence": pa.array([0] * (2 * n), pa.int32()),
                "value": pa.array(langs + srcs, pa.string()),
            }
        )

    rows = ds.map_batches(to_rows, batch_format="pyarrow").map_batches(
        ops, batch_format="pyarrow"
    )
    return (
        rows.groupby(["field", "value"])
        .aggregate(Count(alias_name="n"))
        .select_columns(["field", "value", "n"])
    )


_VERIFY_KEYS = frozenset({"src1", "src3", "src5", "de", "en"})
_VERIFY_SKIP = frozenset({"src5"})


def _verify_links_docs(sf_dir: str):
    """The reference's verify_links record contract as a driver query
    (VerifyLinks.java:112-197): documents rows become records whose
    HostItemEntry / PrecedingEntry entities carry link identifiers
    (source / lang values), the verify_links op annotates each with
    verifying*/verified* rows against a key set + skip set, and the
    output is the grouped (field, subfield, value) counts over the
    annotation rows — the aggregated form of the reference's per-path
    LongAdder counters, membership-mirrorable in DuckDB."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Count

    from limetrans_ray.functions.recordops import RecordOps

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "source"]
    )

    def to_rows(batch: pa.Table) -> pa.Table:
        ids = [str(i) for i in batch.column("doc_id").to_pylist()]
        langs = batch.column("lang").to_pylist()
        srcs = batch.column("source").to_pylist()
        n = len(ids)
        return pa.table(
            {
                "record_id": pa.array(ids + ids, pa.string()),
                "field": pa.array(
                    ["HostItemEntry"] * n + ["PrecedingEntry"] * n, pa.string()
                ),
                "subfield": pa.array(
                    ["identifierForLinkingEntry"] * (2 * n), pa.string()
                ),
                "occurrence": pa.array([0] * (2 * n), pa.int32()),
                "value": pa.array(srcs + langs, pa.string()),
            }
        )

    ops = RecordOps(
        [
            (
                "verify_links",
                {
                    "entries": ["HostItemEntry", "PrecedingEntry"],
                    "source": "identifierForLinkingEntry",
                    "suffix": "IdentifierForLinkingEntry",
                    "keys": _VERIFY_KEYS,
                    "skip": _VERIFY_SKIP,
                },
            ),
            (
                "remove_field",
                {"field": "HostItemEntry", "subfield": "identifierForLinkingEntry"},
            ),
            (
                "remove_field",
                {"field": "PrecedingEntry", "subfield": "identifierForLinkingEntry"},
            ),
        ]
    )
    rows = ds.map_batches(to_rows, batch_format="pyarrow").map_batches(
        ops, batch_format="pyarrow"
    )
    return (
        rows.groupby(["field", "subfield", "value"])
        .aggregate(Count(alias_name="n"))
        .select_columns(["field", "subfield", "value", "n"])
    )


def _embedding_lsh_pairs(sf_dir: str):
    """The banded-hyperplane SCALE path of embedding_sim_pairs: no
    corpus matrix on the driver, no O(n²) matmul. Same τ=0.4 as the
    brute sibling; the SQL mirror reproduces the LSH banding itself
    (seeded planes as literals), so banding misses match exactly —
    the oracle checks the algorithm, not the ideal recall."""
    import ray.data as rd

    from limetrans_ray.pipelines.dedup import embedding_near_dups_lsh

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    out = embedding_near_dups_lsh(ds, threshold=0.4)
    out["cosine"] = out["cosine"].round(6)
    return out


def _ivf_topk(sf_dir: str):
    """IVF ANN: k-means coarse quantizer (seeded, deterministic), hive
    ``list_id=`` partitions, queries probe their nprobe nearest lists
    and read ONLY those partitions — pruned-read IO accounting carried
    in the result like ann_lsh_topk. Index cached per fingerprint."""
    import json
    import shutil

    import pyarrow.parquet as pq
    import ray.data as rd

    from limetrans_ray.pipelines.ann import build_ivf_index, ivf_topk
    from limetrans_ray.state.manifest import fingerprint_paths

    emb_path = f"{sf_dir}/embeddings.parquet"
    tbl = pq.read_table(emb_path).to_pandas()
    qdf = tbl[tbl["vec_id"] < 5].sort_values("vec_id")

    idx_dir = _index_root(sf_dir) + "-ivf"
    fp = fingerprint_paths([emb_path])
    marker = os.path.join(idx_dir, "fingerprint.json")
    fresh = False
    if os.path.exists(marker):
        with open(marker) as fh:
            fresh = json.load(fh).get("fp") == fp
    if not fresh:
        shutil.rmtree(idx_dir, ignore_errors=True)
        ds = rd.read_parquet(emb_path)
        build_ivf_index(ds, idx_dir)
        with open(marker, "w") as fh:
            json.dump({"fp": fp}, fh)
    out, io_stats = ivf_topk(
        idx_dir, np.stack(qdf["embedding"].to_numpy()), qdf["vec_id"].tolist(), k=10
    )
    out["cosine"] = out["cosine"].round(6)
    out["scanned_rows"] = np.int64(io_stats["scanned_rows"])
    out["total_rows"] = np.int64(io_stats["total_rows"])
    return out


def _simhash_pairs(sf_dir: str):
    import ray.data as rd

    from limetrans_ray.pipelines.dedup import simhash_near_dups

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return simhash_near_dups(ds, max_hamming=3)


def _langid_docs(sf_dir: str):
    import ray.data as rd

    from limetrans_ray.stages.textstats import LangIdStage

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(
        LangIdStage(), batch_format="pyarrow", batch_size=512
    ).select_columns(["doc_id", "lang_pred"])


def _quality_docs(sf_dir: str):
    import ray.data as rd

    from limetrans_ray.stages.textstats import QualityStage

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(QualityStage(), batch_format="pyarrow", batch_size=512)
    return out.select_columns(
        ["doc_id", "q_n_chars", "q_n_tokens", "q_stop_ratio", "q_quality"]
    )


def _fingerprint_docs(sf_dir: str):
    import ray.data as rd

    from limetrans_ray.stages.textstats import FingerprintStage

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    # md5 token-stream fingerprint: exactly recomputable by the DuckDB
    # oracle (the rolling-hash variant keeps pytest-only coverage)
    return ds.map_batches(
        FingerprintStage(algo="md5"), batch_format="pyarrow", batch_size=512
    ).select_columns(["doc_id", "fingerprint"])


_LANG_NAMES = {"de": "German", "en": "English", "es": "Spanish"}


def _recordops_pipeline(sf_dir: str):
    """Decode→transform conformance through the driver's hard signal:
    each documents row becomes a JSONL record, the JSON decoder
    explodes it onto the flat-row model, a fix program (lookup with
    default, copy_field, retain) transforms it, and the grouped
    (field, value) counts must equal the oracle's direct CASE/GROUP BY
    over the base table — the reference's TransformationTestCase
    discipline (event-stream in → expected record out) as a driver
    row/hash check. The JSONL round trip is the point here (this IS
    the decoder's conformance harness), not the hot-path shape."""
    import json

    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Count

    from limetrans_ray.functions.jsonrec import decode_batch
    from limetrans_ray.functions.recordops import RecordOps

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "source"]
    )

    def to_jsonl(batch: pa.Table) -> pa.Table:
        blob = "\n".join(
            json.dumps({"id": i, "lang": l, "source": s})
            for i, l, s in zip(
                batch.column("doc_id").to_pylist(),
                batch.column("lang").to_pylist(),
                batch.column("source").to_pylist(),
            )
        )
        return pa.table({"json": pa.array([blob], pa.string())})

    ops = RecordOps(
        [
            ("lookup", {"field": "lang", "table": dict(_LANG_NAMES), "default": "Other"}),
            ("copy_field", {"src": "source", "dst": "collection"}),
            ("retain", {"fields": ["lang", "collection"]}),
        ]
    )
    rows = (
        ds.map_batches(to_jsonl, batch_format="pyarrow")
        .map_batches(
            lambda b: decode_batch(b, lines=True), batch_format="pyarrow"
        )
        .map_batches(ops, batch_format="pyarrow")
    )
    return (
        rows.groupby(["field", "value"])
        .aggregate(Count(alias_name="n"))
        .select_columns(["field", "value", "n"])
    )


FIELDED_QUERY_SET = [
    "body:spark",
    "spark lang:en",
    "source:src3",
    "body:query lang:de",
    "body:join source:src12",
]


def _fielded_search(sf_dir: str, k: int = 10):
    """Field-scoped BM25 (the multi-field mapping analogue): documents
    indexed with a text body field plus keyword lang/source fields;
    queries mix scoped and catch-all clauses. Driver-verified against
    the full-analyzer SQL mirror (``_fielded_full_sql``); additionally
    pinned by tests/test_fields.py oracle parity."""
    import pandas as pd
    import ray.data as rd

    from limetrans_ray.pipelines.build_index import build_index_from_documents
    from limetrans_ray.pipelines.search import SearchEngine
    from limetrans_ray.state.manifest import fingerprint_paths
    from limetrans_ray import ANALYZER_VERSION, FORMAT_VERSION

    doc_path = f"{sf_dir}/documents.parquet"
    root = _index_root(sf_dir) + "-fielded"
    ds = rd.read_parquet(doc_path, columns=["doc_id", "text", "lang", "source"])
    build_index_from_documents(
        ds,
        root,
        fields=[("body", "text", "text"), ("lang", "lang", "keyword"),
                ("source", "source", "keyword")],
        fingerprint=f"{fingerprint_paths([doc_path])}-v{FORMAT_VERSION}-a{ANALYZER_VERSION}-f",
    )
    eng = SearchEngine(root)
    rows = []
    for q in FIELDED_QUERY_SET:
        for rank, (doc_id, score) in enumerate(eng.search(q, k, mode="and"), 1):
            rows.append((q, rank, doc_id, round(score, 6)))
    return pd.DataFrame(rows, columns=["query", "rank", "doc_id", "score"])


def _standard_numbers(sf_dir: str):
    """standard_number normalization with a DuckDB oracle: each doc_id
    deterministically becomes a checksum-valid ISBN-10, the pipeline
    validates + converts it (StandardNumberStage), and the oracle
    derives the ISBN-13 independently (lpad + EAN checksum in SQL) —
    two implementations of the public algorithms must agree."""
    import pyarrow as pa
    import ray.data as rd

    from limetrans_ray.stages.textstats import StandardNumberStage

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def make_raw(batch: pa.Table) -> pa.Table:
        raws = []
        for i in batch.column("doc_id").to_pylist():
            body = f"{int(i):09d}"
            s = sum((10 - j) * int(body[j]) for j in range(9))
            c = (11 - s % 11) % 11
            raws.append(body + ("X" if c == 10 else str(c)))
        return batch.append_column("raw", pa.array(raws, pa.string()))

    return (
        ds.map_batches(make_raw, batch_format="pyarrow")
        .map_batches(StandardNumberStage("ISBN", "raw"), batch_format="pyarrow")
        .select_columns(["doc_id", "preferred_isbn"])
    )


def _transformation_goldens(_sf_dir: str):
    """The reference's OWN transformation golden suites, end-to-end:
    each suite's MARC-XML inputs run through the engine's rule loaders
    (Metafix text / Metamorph XML incl. the collector stream engine)
    and compare structurally against the expected JSON records
    (pipelines/goldens.py). The oracle pins the suite sizes and EXACT
    parity as literals — the row hashes only while the engine keeps
    reproducing the reference bit-for-bit. DE-836 (3349 records) runs
    in pytest instead to keep this driver query fast; input is the
    mounted reference checkout, so sf_dir is unused."""
    import os

    import pyarrow as pa

    from limetrans_ray.pipelines.goldens import SUITES_DIR, run_suite

    rows = []
    if os.path.isdir(SUITES_DIR):
        for suite, engine in (
            ("DE-2382", "xml"),
            ("DE-2524", "xml"),
            ("DE-380", "xml"),
            ("DE-708-deposit", "fix"),
            ("DE-708-deposit", "xml"),
        ):
            r = run_suite(suite, engine=engine)
            rows.append(
                {
                    "suite": suite,
                    "engine": engine,
                    "records": r["records"],
                    "equal_records": r["equal_records"],
                }
            )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("suite", pa.string()),
                ("engine", pa.string()),
                ("records", pa.int64()),
                ("equal_records", pa.int64()),
            ]
        ),
    )


def queries() -> dict[str, Callable[[str], Any]]:
    from limetrans_ray.pipelines import relational as rel

    return {
        # relational / per-record operator analogues (SQL-checked)
        "doc_stats": rel.doc_stats,
        "filter_docs": rel.filter_docs,
        "lineitem_agg": rel.lineitem_agg,
        "topk_docs": rel.topk_docs,
        "lookup_region": rel.lookup_region,
        "lookup_delete_miss": rel.lookup_delete_miss,
        "semi_join_orders": rel.semi_join_orders,
        "anti_join_customers": rel.anti_join_customers,
        "term_df": rel.term_df,
        "token_counts": rel.token_counts,
        "events_window": rel.events_window,
        "hash_join_orders": rel.hash_join_orders,
        "session_windows": rel.session_windows,
        "user_rolling": rel.user_rolling,
        # training-data operators
        "standard_numbers": _standard_numbers,
        "dedup_exact": _dedup_exact,
        "ann_topk": _ann_topk,
        # fulltext flagship: SQL-mirrored simple-profile round trips
        # (term, phrase and fielded search each driver-verified)…
        "bm25_simple_topk": _bm25_simple_topk,
        "bm25_phrase_simple_topk": _bm25_phrase_simple_topk,
        "fielded_simple_search": _fielded_simple_search,
        # …+ the full-analyzer variants, driver-verified since round 5
        # against the SQL re-implementation of the stemming chain
        "bm25_topk": _bm25_topk,
        "bm25_phrase_topk": _bm25_phrase_topk,
        "fielded_search": _fielded_search,
        "ann_lsh_topk": _ann_lsh_topk,
        "neardup_minhash": _neardup_minhash,
        "neardup_ngram": _neardup_ngram,
        "embedding_sim_pairs": _embedding_sim_pairs,
        "embedding_lsh_pairs": _embedding_lsh_pairs,
        "ivf_topk": _ivf_topk,
        "verify_links_docs": _verify_links_docs,
        "fix_pipeline": _fix_pipeline,
        "rdfmap_pipeline": _rdfmap_pipeline,
        "fix_array_pipeline": _fix_array_pipeline,
        "wildcard_simple_topk": _wildcard_simple_topk,
        "simhash_pairs": _simhash_pairs,
        "langid_docs": _langid_docs,
        "quality_docs": _quality_docs,
        "fingerprint_docs": _fingerprint_docs,
        "recordops_pipeline": _recordops_pipeline,
        "transformation_goldens": _transformation_goldens,
    }


# -------------------------------------------------------------- oracle SQL

_SIMPLE_SPLIT = "string_split_regex(lower(text), '[^0-9a-z]+')"
_TOKENS = f"list_filter({_SIMPLE_SPLIT}, x -> x <> '')"

# All-pairs word-3-gram Jaccard at τ=0.8 — the literal definition of
# neardup_ngram, and the exact mirror the (probabilistically complete)
# neardup_minhash is checked against.
_NGRAM_JACCARD_SQL = f"""
    WITH toks AS (
      SELECT doc_id, {_TOKENS} AS tk FROM documents),
    sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(tk) >= 3
               THEN list_transform(generate_series(1, len(tk) - 2),
                      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
               ELSE CAST([] AS VARCHAR[]) END) AS shingles
      FROM toks),
    ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    cnt AS (SELECT doc_id, len(shingles) AS n FROM sh),
    inter AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT a_id, b_id,
           round(CAST(i AS DOUBLE) / (ca.n + cb.n - i), 6) AS jaccard
    FROM inter
    JOIN cnt ca ON ca.doc_id = a_id
    JOIN cnt cb ON cb.doc_id = b_id
    WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.8
"""


def _sql_words(words) -> str:
    """SQL list literal from a Python word set (single source of truth:
    the engine's own marker/stop lists)."""
    return "[" + ", ".join(f"'{w}'" for w in sorted(words)) + "]"


def _bm25_simple_sql() -> str:
    """Exact DuckDB mirror of the simple-profile index+query round trip
    (single source of truth for query tokenization: the engine's own
    ``simple_terms``). BM25 arithmetic mirrors state/bm25.py term by
    term: idf = ln(1 + (N - df + 0.5)/(df + 0.5)), impact =
    tf*(k1+1)/(tf + k1*(1 - b + b*dl/avgdl)), k1=1.2, b=0.75; AND mode
    = every distinct query term present; top-k tie-break
    (score desc, doc_id asc)."""
    from limetrans_ray.functions.analyzer import simple_terms

    qrows = ", ".join(
        f"('{q}', '{t}')"
        for q in BM25_QUERY_SET
        for t in sorted(set(simple_terms(q)))
    )
    return f"""
        WITH q(query, term) AS (VALUES {qrows}),
        qn AS (SELECT query, count(*) AS n_terms FROM q GROUP BY query),
        toks AS (
          SELECT doc_id, unnest({_TOKENS}) AS term FROM documents),
        tf AS (
          SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        st AS (
          SELECT count(*) AS n,
                 CAST(sum(len({_TOKENS})) AS DOUBLE) / count(*) AS avgdl
          FROM documents),
        dl AS (SELECT doc_id, len({_TOKENS}) AS dl FROM documents),
        hits AS (
          SELECT q.query, tf.doc_id,
                 sum(ln(1 + (st.n - df.df + 0.5) / (df.df + 0.5))
                     * (tf.tf * 2.2)
                     / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl.dl / st.avgdl))))
                   AS score,
                 count(*) AS matched
          FROM q
          JOIN tf ON tf.term = q.term
          JOIN df ON df.term = q.term
          JOIN dl ON dl.doc_id = tf.doc_id, st
          GROUP BY q.query, tf.doc_id),
        anded AS (
          SELECT h.query, h.doc_id, h.score
          FROM hits h JOIN qn ON qn.query = h.query
          WHERE h.matched = qn.n_terms)
        SELECT query,
               CAST(row_number() OVER (PARTITION BY query
                    ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
               doc_id, round(score, 6) AS score
        FROM anded
        QUALIFY rank <= 10
        ORDER BY query, rank
    """


def _wildcard_group_rows():
    """Enumerate each wildcard query's AND groups with the ENGINE's own
    tokenizer/extractor (single source of truth — mirrors the simple
    non-fielded branch of SearchEngine._prepare): literal rows
    ``(query, gid, term)`` and prefix rows ``(query, gid, prefix)``;
    gid uniqueness per query is all the semantics need."""
    from limetrans_ray.functions.analyzer import _extract_wildcards, simple_terms

    lits, prefs = [], []
    for q in WILDCARD_QUERY_SET:
        gid = 0
        body, wilds = _extract_wildcards(q)
        for t in simple_terms(body):
            lits.append((q, gid, t))
            gid += 1
        for w in wilds:
            toks = simple_terms(w)
            for t in toks[:-1]:
                lits.append((q, gid, t))
                gid += 1
            if toks:
                prefs.append((q, gid, toks[-1]))
                gid += 1
    return lits, prefs


def _wildcard_simple_sql() -> str:
    """DuckDB mirror of the simple-profile WILDCARD round trip: prefix
    groups expand over the corpus term dictionary (identical to the
    engine's index dictionary under the simple profile) via LIKE,
    capped at the lexicographically first MAX_PREFIX_EXPANSIONS; BM25
    sums over DISTINCT matched terms; AND = every group covered by at
    least one of its variants."""
    from limetrans_ray.functions.analyzer import MAX_PREFIX_EXPANSIONS

    lit_rows, pref_rows = _wildcard_group_rows()
    lrows = ", ".join(f"('{q}', {g}, '{t}')" for q, g, t in lit_rows)
    prows = ", ".join(f"('{q}', {g}, '{t}')" for q, g, t in pref_rows)
    return f"""
        WITH ql(query, gid, term) AS (VALUES {lrows}),
        qp(query, gid, prefix) AS (VALUES {prows}),
        toks AS (
          SELECT doc_id, unnest({_TOKENS}) AS term FROM documents),
        tf AS (
          SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        st AS (
          SELECT count(*) AS n,
                 CAST(sum(len({_TOKENS})) AS DOUBLE) / count(*) AS avgdl
          FROM documents),
        dl AS (SELECT doc_id, len({_TOKENS}) AS dl FROM documents),
        exp AS (
          SELECT qp.query, qp.gid, df.term
          FROM qp JOIN df ON df.term LIKE qp.prefix || '%'
          QUALIFY row_number() OVER (PARTITION BY qp.query, qp.gid
                     ORDER BY df.term) <= {MAX_PREFIX_EXPANSIONS}),
        gterms AS (
          SELECT query, gid, term FROM ql
          UNION SELECT query, gid, term FROM exp),
        qn AS (
          SELECT query, count(DISTINCT gid) AS n_groups
          FROM (SELECT query, gid FROM ql UNION SELECT query, gid FROM qp)
          GROUP BY query),
        qt AS (SELECT DISTINCT query, term FROM gterms),
        hits AS (
          SELECT qt.query, tf.doc_id,
                 sum(ln(1 + (st.n - df.df + 0.5) / (df.df + 0.5))
                     * (tf.tf * 2.2)
                     / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl.dl / st.avgdl))))
                   AS score
          FROM qt
          JOIN tf ON tf.term = qt.term
          JOIN df ON df.term = qt.term
          JOIN dl ON dl.doc_id = tf.doc_id, st
          GROUP BY qt.query, tf.doc_id),
        cov AS (
          SELECT g.query, g.gid, tf.doc_id
          FROM gterms g JOIN tf ON tf.term = g.term
          GROUP BY 1, 2, 3),
        covn AS (SELECT query, doc_id, count(*) AS m FROM cov GROUP BY 1, 2),
        anded AS (
          SELECT h.query, h.doc_id, h.score
          FROM hits h
          JOIN covn ON covn.query = h.query AND covn.doc_id = h.doc_id
          JOIN qn ON qn.query = h.query
          WHERE covn.m = qn.n_groups)
        {_BM25_TAIL}"""


def _simple_clause_rows(query_set, field_analyzers=None):
    """Parse each query with the ENGINE's own parse_simple_query (single
    source of truth) and flatten to oracle VALUES rows:
    ``(query, field_or_None, term)`` for every distinct scored term and
    ``(query, ' t1 t2 … ')`` (space-padded unqualified token run) per
    phrase clause."""
    from limetrans_ray.functions.analyzer import FIELD_SEP, parse_simple_query

    def split(term):
        return term.split(FIELD_SEP, 1) if FIELD_SEP in term else (None, term)

    term_rows, phrase_rows = [], []
    for q in query_set:
        clauses = parse_simple_query(q, field_analyzers=field_analyzers)
        terms = sorted(
            {
                t
                for c in clauses
                for g in ([c["variants"]] if c["type"] == "term" else c["slots"])
                for t in g
            }
        )
        term_rows.extend((q, *split(t)) for t in terms)
        for c in clauses:
            if c["type"] == "phrase":
                toks = [split(g[0])[1] for g in c["slots"]]
                phrase_rows.append((q, " " + " ".join(toks) + " "))
    return term_rows, phrase_rows


_BM25_TAIL = """
        SELECT query,
               CAST(row_number() OVER (PARTITION BY query
                    ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
               doc_id, round(score, 6) AS score
        FROM anded
        QUALIFY rank <= 10
        ORDER BY query, rank
    """


def _bm25_phrase_simple_sql() -> str:
    """DuckDB mirror of the simple-profile PHRASE round trip: BM25
    arithmetic identical to ``_bm25_simple_sql``; each phrase clause
    additionally requires the space-padded phrase token run to appear
    contiguously in the doc's space-joined simple token stream (exactly
    the engine's consecutive-raw-position semantics — one token per
    position under the simple profile)."""
    term_rows, phrase_rows = _simple_clause_rows(BM25_PHRASE_SET)
    qrows = ", ".join(f"('{q}', '{t}')" for q, _f, t in term_rows)
    prows = ", ".join(f"('{q}', '{p}')" for q, p in phrase_rows)
    return f"""
        WITH q(query, term) AS (VALUES {qrows}),
        qp(query, phrase) AS (VALUES {prows}),
        qn AS (SELECT query, count(*) AS n_terms FROM q GROUP BY query),
        pn AS (SELECT query, count(*) AS n_ph FROM qp GROUP BY query),
        toks AS (
          SELECT doc_id, unnest({_TOKENS}) AS term FROM documents),
        tf AS (
          SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        st AS (
          SELECT count(*) AS n,
                 CAST(sum(len({_TOKENS})) AS DOUBLE) / count(*) AS avgdl
          FROM documents),
        dl AS (SELECT doc_id, len({_TOKENS}) AS dl FROM documents),
        stream AS (
          SELECT doc_id, ' ' || array_to_string({_TOKENS}, ' ') || ' ' AS s
          FROM documents),
        pmc AS (
          SELECT qp.query, stream.doc_id, count(*) AS m
          FROM qp JOIN stream ON position(qp.phrase IN stream.s) > 0
          GROUP BY 1, 2),
        hits AS (
          SELECT q.query, tf.doc_id,
                 sum(ln(1 + (st.n - df.df + 0.5) / (df.df + 0.5))
                     * (tf.tf * 2.2)
                     / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl.dl / st.avgdl))))
                   AS score,
                 count(*) AS matched
          FROM q
          JOIN tf ON tf.term = q.term
          JOIN df ON df.term = q.term
          JOIN dl ON dl.doc_id = tf.doc_id, st
          GROUP BY q.query, tf.doc_id),
        anded AS (
          SELECT h.query, h.doc_id, h.score
          FROM hits h
          JOIN qn ON qn.query = h.query
          JOIN pn ON pn.query = h.query
          JOIN pmc ON pmc.query = h.query AND pmc.doc_id = h.doc_id
          WHERE h.matched = qn.n_terms AND pmc.m = pn.n_ph)
        {_BM25_TAIL}"""


# keyword_normalize mirror for ASCII keyword columns (fold beyond
# casefold is a no-op on the testdata's ASCII lang/source values)
def _KW(col: str) -> str:
    return f"trim(regexp_replace(lower({col}), '[^0-9a-z]+', ' ', 'g'))"


def _fielded_simple_sql() -> str:
    """DuckDB mirror of the FIELDED simple-profile round trip. The
    ``body`` text field is the only catch-all contributor, so
    field-qualified body terms share tf/df/dl with the unqualified
    token stream exactly; keyword fields post one normalized term per
    doc with tf=1 (and contribute nothing to doclen) — all mirrored in
    the unified ``post`` CTE below."""
    fa = {f: a for f, _c, a in FIELDED_SIMPLE_FIELDS}
    term_rows, phrase_rows = _simple_clause_rows(
        FIELDED_SIMPLE_QUERY_SET, field_analyzers=fa
    )
    kinds = {None: "text", "body": "text", "lang": "lang", "source": "source"}
    # a (kind, term) SQL key must identify exactly one engine term per
    # query: `spark` and `body:spark` are DISTINCT engine terms (each
    # scored) but both map to the text posting stream — such a query
    # would dedupe wrongly in the mirror, so reject it at build time
    for q in FIELDED_SIMPLE_QUERY_SET:
        mine = [(kinds[f], t) for qq, f, t in term_rows if qq == q]
        assert len(set(mine)) == len(mine), f"ambiguous mirror terms in {q!r}"
    qrows = ", ".join(
        f"('{q}', '{kinds[f]}', '{t}')" for q, f, t in term_rows
    )
    prows = ", ".join(f"('{q}', '{p}')" for q, p in phrase_rows)
    return f"""
        WITH q(query, kind, term) AS (VALUES {qrows}),
        qp(query, phrase) AS (VALUES {prows}),
        qn AS (SELECT query, count(*) AS n_terms FROM q GROUP BY query),
        pn AS (SELECT query, count(*) AS n_ph FROM qp GROUP BY query),
        toks AS (
          SELECT doc_id, unnest({_TOKENS}) AS term FROM documents),
        post AS (
          SELECT doc_id, 'text' AS kind, term, count(*) AS tf
          FROM toks GROUP BY doc_id, term
          UNION ALL
          SELECT doc_id, 'lang', {_KW('lang')}, 1
          FROM documents WHERE {_KW('lang')} <> ''
          UNION ALL
          SELECT doc_id, 'source', {_KW('source')}, 1
          FROM documents WHERE {_KW('source')} <> ''),
        pdf AS (SELECT kind, term, count(*) AS df FROM post GROUP BY kind, term),
        st AS (
          SELECT count(*) AS n,
                 CAST(sum(len({_TOKENS})) AS DOUBLE) / count(*) AS avgdl
          FROM documents),
        dl AS (SELECT doc_id, len({_TOKENS}) AS dl FROM documents),
        stream AS (
          SELECT doc_id, ' ' || array_to_string({_TOKENS}, ' ') || ' ' AS s
          FROM documents),
        pmc AS (
          SELECT qp.query, stream.doc_id, count(*) AS m
          FROM qp JOIN stream ON position(qp.phrase IN stream.s) > 0
          GROUP BY 1, 2),
        hits AS (
          SELECT q.query, p.doc_id,
                 sum(ln(1 + (st.n - pdf.df + 0.5) / (pdf.df + 0.5))
                     * (p.tf * 2.2)
                     / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl.dl / st.avgdl))))
                   AS score,
                 count(*) AS matched
          FROM q
          JOIN post p ON p.kind = q.kind AND p.term = q.term
          JOIN pdf ON pdf.kind = q.kind AND pdf.term = q.term
          JOIN dl ON dl.doc_id = p.doc_id, st
          GROUP BY q.query, p.doc_id),
        anded AS (
          SELECT h.query, h.doc_id, h.score
          FROM hits h
          JOIN qn ON qn.query = h.query
          LEFT JOIN pn ON pn.query = h.query
          LEFT JOIN pmc ON pmc.query = h.query AND pmc.doc_id = h.doc_id
          WHERE h.matched = qn.n_terms
            AND coalesce(pmc.m, 0) = coalesce(pn.n_ph, 0))
        {_BM25_TAIL}"""


# ------------------------------------------ full-analyzer oracle SQL
#
# The FULL analyzer chain (tokenize → fold → word-delimiter variants →
# stop filter → German2 snowball stem, keyword_repeat semantics) was a
# declared `no_oracle` through round 4 ("stemming chain not
# SQL-expressible"). It IS expressible: the chain below re-implements
# it as pure DuckDB SQL — a char-scan prelude via list_transform, R1/R2
# Snowball regions via regexp match lengths, the three suffix steps as
# CASE chains — and is validated token-for-token against the Python
# chain (tests/test_sql_full_analyzer.py: 37k-token stem fuzz incl.
# umlauts/ß/q-rules, plus whole-corpus tokenize_positions parity at
# sf0.001/sf0.01 and accent/ligature fuzz docs). Only the STOPWORD list
# and the TOKEN/DELIM patterns are shared constants with
# functions/analyzer.py; all logic is re-derived in SQL, so this is a
# second independent implementation, like the ISBN oracle.

_FA_VOWELS = "aeiouyäöü"
_FA_VLIST = ",".join(f"'{c}'" for c in _FA_VOWELS)

# icu_folding analogue: lower + strip_accents + the analyzer's frozen
# single-char fold map (functions/analyzer.py _FOLD_MAP)
_FA_FOLD = (
    "replace(replace(replace(replace(replace(replace(replace(replace("
    "replace(strip_accents(lower({x})), 'ß','ss'), 'æ','ae'), 'œ','oe'),"
    " 'ø','o'), 'đ','d'), 'ð','d'), 'þ','th'), 'ł','l'), 'ı','i')"
)


def _full_toks_ctes(source: str = "documents") -> str:
    """CTE block ``<source docs> → toks(doc_id, pos, term)``: the
    full-analyzer token stream with raw-token positions (1-based).
    Every raw token emits its deduped variant set (split parts +
    catenated form, folded, stop-filtered, each variant plus its
    German2 stem) at the raw position — the word_delimiter_graph +
    keyword_repeat convention of functions/analyzer.py
    token_variants/tokenize_positions."""
    from limetrans_ray.functions.analyzer import STOPWORDS, TOKEN_PATTERN

    tokpat = (
        TOKEN_PATTERN.replace(r"[^\W_]", r"[\p{L}\p{N}]").replace("'", "''")
    )
    delimpat = "[''’‐-]+"
    stop_sql = ",".join("'" + w + "'" for w in sorted(STOPWORDS))
    V = _FA_VOWELS
    return f"""
        fa_raw AS (
          SELECT doc_id,
                 unnest(range(1, len(rs)+1)) AS pos,
                 unnest(rs) AS raw
          FROM (SELECT doc_id,
                       regexp_extract_all(text, '{tokpat}') AS rs
                FROM {source})),
        fa_var0 AS (
          SELECT doc_id, pos,
            CASE WHEN len(ps) > 1
                 THEN list_append(ps, list_aggregate(ps, 'string_agg', ''))
                 ELSE ps END AS vs
          FROM (SELECT doc_id, pos,
                  list_filter(
                    string_split_regex({_FA_FOLD.format(x='raw')},
                                       '{delimpat}'),
                    x -> x <> '') AS ps
                FROM fa_raw)),
        fa_pre AS (
          SELECT DISTINCT doc_id, pos, v FROM (
            SELECT doc_id, pos, unnest(vs) AS v FROM fa_var0)
          WHERE v NOT IN ({stop_sql})),
        fa_in AS (SELECT v AS tok, v AS w
                  FROM (SELECT DISTINCT v FROM fa_pre)),
        fa_p0 AS (SELECT tok, replace(w, 'ß', 'ss') AS w FROM fa_in),
        fa_p1 AS (
          -- Snowball prelude: protect u/y between vowels (uppercase);
          -- context-free per position, neighbors from the original
          SELECT tok, list_aggregate(list_transform(range(1, length(w)+1),
            i -> CASE WHEN substr(w,i,1) IN ('u','y')
                       AND i > 1 AND i < length(w)
                       AND substr(w,i-1,1) IN ({_FA_VLIST})
                       AND substr(w,i+1,1) IN ({_FA_VLIST})
                 THEN upper(substr(w,i,1)) ELSE substr(w,i,1) END),
            'string_agg', '') AS w
          FROM fa_p0),
        fa_p2 AS (
          -- German2 pairs ae→ä oe→ö ue→ü (not after q); the consumed
          -- 'e' is dropped. Pair starts are context-free: a consumed
          -- char is always 'e', which can never start a pair
          SELECT tok, list_aggregate(list_transform(range(1, length(w)+1),
            i -> CASE
              WHEN substr(w,i,1) = 'a' AND substr(w,i+1,1) = 'e' THEN 'ä'
              WHEN substr(w,i,1) = 'o' AND substr(w,i+1,1) = 'e' THEN 'ö'
              WHEN substr(w,i,1) = 'u' AND substr(w,i+1,1) = 'e'
                   AND (i = 1 OR substr(w,i-1,1) <> 'q') THEN 'ü'
              WHEN substr(w,i,1) = 'e' AND i > 1 AND (
                     substr(w,i-1,1) IN ('a','o')
                     OR (substr(w,i-1,1) = 'u'
                         AND (i = 2 OR substr(w,i-2,1) <> 'q'))) THEN ''
              ELSE substr(w,i,1) END),
            'string_agg', '') AS w
          FROM fa_p1),
        fa_reg AS (
          -- R1 = end of first nonvowel-after-vowel run = length of the
          -- regexp match ^[nonvowel]*[vowel]+[nonvowel] (R1 >= 3, the
          -- German adjustment); protected U/Y are consonants here
          SELECT tok, w,
            greatest(CASE WHEN m1 = '' THEN length(w) ELSE length(m1) END,
                     3) AS r1,
            CASE WHEN m1 = '' THEN length(w) ELSE length(m1) END AS r1raw
          FROM (SELECT tok, w,
                  regexp_extract(w, '^[^{V}]*[{V}]+[^{V}]') AS m1
                FROM fa_p2)),
        fa_reg2 AS (
          SELECT tok, w, r1,
            r1raw + (CASE WHEN m2 = '' THEN length(w) - r1raw
                          ELSE length(m2) END) AS r2
          FROM (SELECT tok, w, r1, r1raw,
                  regexp_extract(substr(w, r1raw + 1),
                                 '^[^{V}]*[{V}]+[^{V}]') AS m2
                FROM fa_reg)),
        fa_s1 AS (
          SELECT tok, r1, r2,
            CASE
              WHEN w LIKE '%ern' AND length(w)-3 >= r1 THEN w[:-4]
              WHEN (w LIKE '%em' OR w LIKE '%er') AND length(w)-2 >= r1
                THEN w[:-3]
              WHEN (w LIKE '%en' OR w LIKE '%es') AND length(w)-2 >= r1
                THEN CASE WHEN w[:-3] LIKE '%niss' THEN w[:-4]
                          ELSE w[:-3] END
              WHEN w LIKE '%e' AND length(w)-1 >= r1
                THEN CASE WHEN w[:-2] LIKE '%niss' THEN w[:-3]
                          ELSE w[:-2] END
              WHEN w LIKE '%s' AND length(w)-1 >= r1 AND length(w) >= 2
                   AND lower(substr(w, length(w)-1, 1)) IN
                       ('b','d','f','g','h','k','l','m','n','r','t')
                THEN w[:-2]
              ELSE w END AS w
          FROM fa_reg2),
        fa_s2 AS (
          SELECT tok, r1, r2,
            CASE
              WHEN w LIKE '%est' AND length(w)-3 >= r1 THEN w[:-4]
              WHEN (w LIKE '%en' OR w LIKE '%er') AND length(w)-2 >= r1
                THEN w[:-3]
              WHEN w LIKE '%st' AND length(w)-2 >= r1 AND length(w) >= 6
                   AND lower(substr(w, length(w)-2, 1)) IN
                       ('b','d','f','g','h','k','l','m','n','t')
                THEN w[:-3]
              ELSE w END AS w
          FROM fa_s1),
        fa_s3 AS (
          SELECT tok,
            CASE
              WHEN (w LIKE '%end' OR w LIKE '%ung') AND length(w)-3 >= r2
                THEN CASE WHEN w[:-4] LIKE '%ig' AND length(w)-5 >= r2
                               AND (length(w)-3 < 3
                                    OR substr(w, length(w)-5, 1) <> 'e')
                          THEN w[:-6] ELSE w[:-4] END
              WHEN w LIKE '%isch' AND length(w)-4 >= r2
                   AND (length(w) < 5 OR substr(w, length(w)-4, 1) <> 'e')
                THEN w[:-5]
              WHEN (w LIKE '%ig' OR w LIKE '%ik') AND length(w)-2 >= r2
                   AND (length(w) < 3 OR substr(w, length(w)-2, 1) <> 'e')
                THEN w[:-3]
              WHEN (w LIKE '%lich' OR w LIKE '%heit') AND length(w)-4 >= r2
                THEN CASE WHEN (w[:-5] LIKE '%er' OR w[:-5] LIKE '%en')
                               AND length(w)-6 >= r1
                          THEN w[:-7] ELSE w[:-5] END
              WHEN w LIKE '%keit' AND length(w)-4 >= r2
                THEN CASE WHEN w[:-5] LIKE '%lich' AND length(w)-8 >= r2
                          THEN w[:-9]
                          WHEN w[:-5] LIKE '%ig' AND length(w)-6 >= r2
                          THEN w[:-7]
                          ELSE w[:-5] END
              ELSE w END AS w
          FROM fa_s2),
        fa_stem AS (
          SELECT tok,
            replace(replace(replace(replace(replace(w,
              'U','u'), 'Y','y'), 'ä','a'), 'ö','o'), 'ü','u') AS stem
          FROM fa_s3),
        toks AS (
          SELECT doc_id, pos, v AS term FROM fa_pre
          UNION
          SELECT p.doc_id, p.pos, s.stem
          FROM fa_pre p JOIN fa_stem s ON s.tok = p.v)
    """.replace("{V}", V)


# shared tf/df/dl/st CTEs over the full-analyzer toks stream: tf counts
# raw-token POSITIONS per (doc, term); doclen = total variants emitted
_FA_STATS = """
        tf AS (
          SELECT doc_id, term, count(*) AS tf FROM toks
          GROUP BY doc_id, term),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
        st AS (
          SELECT (SELECT count(*) FROM documents) AS n,
                 CAST((SELECT count(*) FROM toks) AS DOUBLE)
                   / (SELECT count(*) FROM documents) AS avgdl)
"""


def _full_clause_rows(query_set, field_analyzers=None):
    """Engine-parsed clause rows for the FULL-analyzer mirrors (single
    source of truth for query tokenization — the same contract as
    ``_simple_clause_rows``): term-group rows ``(query, gid, field,
    variant)`` (AND = every gid covered by ≥1 variant) and phrase slot
    rows ``(query, ph, sidx, n_slots, field, variant)``."""
    from limetrans_ray.functions.analyzer import FIELD_SEP, parse_query

    def split(term):
        return term.split(FIELD_SEP, 1) if FIELD_SEP in term else (None, term)

    grows, prows = [], []
    for q in query_set:
        clauses = parse_query(q, field_analyzers=field_analyzers)
        gid = 0
        ph = 0
        for c in clauses:
            if c["type"] == "term":
                for t in c["variants"]:
                    grows.append((q, gid, *split(t)))
                gid += 1
            elif c["type"] == "phrase":
                assert not c.get("alt"), (
                    f"keyword-alt phrase in {q!r} not mirrored"
                )
                for sidx, slot in enumerate(c["slots"]):
                    for t in slot:
                        prows.append(
                            (q, ph, sidx, len(c["slots"]), *split(t))
                        )
                ph += 1
            else:  # pragma: no cover — query sets contain no wildcards
                raise AssertionError(f"unsupported clause {c['type']}")
    return grows, prows


_FA_GROUP_TAIL = """
        qt AS (SELECT DISTINCT query, term FROM ql),
        hits AS (
          SELECT qt.query, tf.doc_id,
                 sum(ln(1 + (st.n - df.df + 0.5) / (df.df + 0.5))
                     * (tf.tf * 2.2)
                     / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl.dl / st.avgdl))))
                   AS score
          FROM qt
          JOIN tf ON tf.term = qt.term
          JOIN df ON df.term = qt.term
          JOIN dl ON dl.doc_id = tf.doc_id, st
          GROUP BY qt.query, tf.doc_id),
        cov AS (
          SELECT g.query, g.gid, tf.doc_id
          FROM ql g JOIN tf ON tf.term = g.term
          GROUP BY 1, 2, 3),
        covn AS (SELECT query, doc_id, count(*) AS m FROM cov GROUP BY 1, 2),
        qn AS (SELECT query, count(DISTINCT gid) AS n_groups
               FROM ql GROUP BY query)
"""


def _bm25_full_sql() -> str:
    """DuckDB mirror of the FULL-analyzer index+query round trip: the
    document side runs the SQL analyzer chain (``_full_toks_ctes``);
    query variants come from the engine's ``parse_query``; BM25 sums
    over DISTINCT variant terms; AND = every clause group covered by at
    least one of its variants (keyword_repeat makes a query token a
    variant GROUP, not a single term)."""
    grows, _ = _full_clause_rows(BM25_QUERY_SET)
    qrows = ", ".join(f"('{q}', {g}, '{t}')" for q, g, _f, t in grows)
    return f"""
        WITH {_full_toks_ctes()},
        {_FA_STATS},
        ql(query, gid, term) AS (VALUES {qrows}),
        {_FA_GROUP_TAIL},
        anded AS (
          SELECT h.query, h.doc_id, h.score
          FROM hits h
          JOIN covn ON covn.query = h.query AND covn.doc_id = h.doc_id
          JOIN qn ON qn.query = h.query
          WHERE covn.m = qn.n_groups)
        {_BM25_TAIL}"""


def _bm25_phrase_full_sql() -> str:
    """DuckDB mirror of the FULL-analyzer PHRASE round trip: scoring and
    group-AND as in ``_bm25_full_sql``; each phrase clause additionally
    requires a start position p where every slot j is matched at raw
    position p+j by at least one of its variants (the engine's
    consecutive-raw-position semantics with per-position variant sets —
    word_delimiter_graph positions)."""
    grows, prows = _full_clause_rows(BM25_PHRASE_SET)
    qrows = ", ".join(f"('{q}', {g}, '{t}')" for q, g, _f, t in grows)
    srows = ", ".join(
        f"('{q}', {p}, {s}, {n}, '{t}')" for q, p, s, n, _f, t in prows
    )
    return f"""
        WITH {_full_toks_ctes()},
        {_FA_STATS},
        ql(query, gid, term) AS (VALUES {qrows}),
        qs(query, ph, sidx, nslots, term) AS (VALUES {srows}),
        qt AS (  -- BM25 sums over the distinct variants of ALL clauses,
                 -- phrase slots included (the shared scoring contract)
          SELECT DISTINCT query, term FROM ql
          UNION SELECT DISTINCT query, term FROM qs),
        hits AS (
          SELECT qt.query, tf.doc_id,
                 sum(ln(1 + (st.n - df.df + 0.5) / (df.df + 0.5))
                     * (tf.tf * 2.2)
                     / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl.dl / st.avgdl))))
                   AS score
          FROM qt
          JOIN tf ON tf.term = qt.term
          JOIN df ON df.term = qt.term
          JOIN dl ON dl.doc_id = tf.doc_id, st
          GROUP BY qt.query, tf.doc_id),
        cov AS (
          SELECT g.query, g.gid, tf.doc_id
          FROM ql g JOIN tf ON tf.term = g.term
          GROUP BY 1, 2, 3),
        covn AS (SELECT query, doc_id, count(*) AS m FROM cov GROUP BY 1, 2),
        qn AS (SELECT query, count(DISTINCT gid) AS n_groups
               FROM ql GROUP BY query),
        sm AS (
          SELECT DISTINCT s.query, s.ph, t.doc_id,
                 t.pos - s.sidx AS p0, s.sidx, s.nslots
          FROM qs s JOIN toks t ON t.term = s.term),
        phit AS (
          SELECT DISTINCT query, ph, doc_id FROM (
            SELECT query, ph, doc_id, p0
            FROM sm GROUP BY query, ph, doc_id, p0, nslots
            HAVING count(*) = nslots)),
        pmc AS (
          SELECT query, doc_id, count(*) AS m FROM phit GROUP BY 1, 2),
        pn AS (
          SELECT query, count(DISTINCT ph) AS n_ph FROM qs GROUP BY query),
        anded AS (  -- pure-phrase queries have no term groups: LEFT
                    -- JOIN + coalesce keeps them gated by phrases only
          SELECT h.query, h.doc_id, h.score
          FROM hits h
          LEFT JOIN covn ON covn.query = h.query AND covn.doc_id = h.doc_id
          LEFT JOIN qn ON qn.query = h.query
          LEFT JOIN pn ON pn.query = h.query
          LEFT JOIN pmc ON pmc.query = h.query AND pmc.doc_id = h.doc_id
          WHERE coalesce(covn.m, 0) = coalesce(qn.n_groups, 0)
            AND coalesce(pmc.m, 0) = coalesce(pn.n_ph, 0))
        {_BM25_TAIL}"""


def _fielded_full_sql() -> str:
    """DuckDB mirror of the FULL-analyzer FIELDED round trip: the body
    text field (full analyzer chain, catch-all contributor) plus
    keyword lang/source fields, unified in a (kind, term) posting CTE
    exactly like ``_fielded_simple_sql``."""
    fa = {f: a for f, _c, a in FIELDED_SIMPLE_FIELDS}
    grows, prows = _full_clause_rows(FIELDED_QUERY_SET, field_analyzers=fa)
    assert not prows, "FIELDED_QUERY_SET carries no phrase clauses"
    kinds = {None: "text", "body": "text", "lang": "lang", "source": "source"}
    for q in FIELDED_QUERY_SET:
        mine = [(g, kinds[f], t) for qq, g, f, t in grows if qq == q]
        assert len(set(mine)) == len(mine), f"ambiguous mirror terms in {q!r}"
    qrows = ", ".join(
        f"('{q}', {g}, '{kinds[f]}', '{t}')" for q, g, f, t in grows
    )
    return f"""
        WITH {_full_toks_ctes()},
        ql(query, gid, kind, term) AS (VALUES {qrows}),
        tf AS (
          SELECT doc_id, term, count(*) AS tf FROM toks
          GROUP BY doc_id, term),
        post AS (
          SELECT doc_id, 'text' AS kind, term, tf FROM tf
          UNION ALL
          SELECT doc_id, 'lang', {_KW('lang')}, 1
          FROM documents WHERE {_KW('lang')} <> ''
          UNION ALL
          SELECT doc_id, 'source', {_KW('source')}, 1
          FROM documents WHERE {_KW('source')} <> ''),
        pdf AS (SELECT kind, term, count(*) AS df FROM post
                GROUP BY kind, term),
        dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
        st AS (
          SELECT (SELECT count(*) FROM documents) AS n,
                 CAST((SELECT count(*) FROM toks) AS DOUBLE)
                   / (SELECT count(*) FROM documents) AS avgdl),
        qt AS (SELECT DISTINCT query, kind, term FROM ql),
        hits AS (
          SELECT qt.query, p.doc_id,
                 sum(ln(1 + (st.n - pdf.df + 0.5) / (pdf.df + 0.5))
                     * (p.tf * 2.2)
                     / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl.dl / st.avgdl))))
                   AS score
          FROM qt
          JOIN post p ON p.kind = qt.kind AND p.term = qt.term
          JOIN pdf ON pdf.kind = qt.kind AND pdf.term = qt.term
          JOIN dl ON dl.doc_id = p.doc_id, st
          GROUP BY qt.query, p.doc_id),
        cov AS (
          SELECT g.query, g.gid, p.doc_id
          FROM ql g JOIN post p ON p.kind = g.kind AND p.term = g.term
          GROUP BY 1, 2, 3),
        covn AS (SELECT query, doc_id, count(*) AS m FROM cov GROUP BY 1, 2),
        qn AS (SELECT query, count(DISTINCT gid) AS n_groups
               FROM ql GROUP BY query),
        anded AS (
          SELECT h.query, h.doc_id, h.score
          FROM hits h
          JOIN covn ON covn.query = h.query AND covn.doc_id = h.doc_id
          JOIN qn ON qn.query = h.query
          WHERE covn.m = qn.n_groups)
        {_BM25_TAIL}"""


def _ann_lsh_sql() -> str:
    """Exact DuckDB mirror of the partitioned-LSH ANN path
    (``build_lsh_index`` + ``lsh_topk_indexed``; seed=42, n_planes=12,
    probe_hamming=2 — the engine defaults). Every vector's bucket is
    the packed sign pattern of its dot products with the seeded
    hyperplane matrix, embedded below as exact float64 literals
    (sign(v·H) is scale-invariant, so the engine's L2 normalization
    drops out of the bucket computation); a query's candidates are
    vectors within Hamming distance 2 of its own bucket
    (``bit_count(xor(...))`` — no 2^n_planes enumeration needed);
    candidates re-rank by exact cosine with the brute-force mirror's
    arithmetic. ``scanned_rows`` mirrors the pruned-read IO
    accounting: every vector living in a bucket probed by ANY query."""
    rng = np.random.default_rng(42)
    planes = rng.standard_normal((64, 12))
    pl_rows = ", ".join(
        f"({i + 1}, {j}, {float(planes[i, j])!r})"
        for i in range(64)
        for j in range(12)
    )
    return f"""
        WITH pl(i, j, w) AS (VALUES {pl_rows}),
        dots AS (
          SELECT e.vec_id, pl.j,
                 sum(CAST(e.embedding[pl.i] AS DOUBLE) * pl.w) AS d
          FROM embeddings e, pl
          GROUP BY e.vec_id, pl.j),
        sig AS (
          SELECT vec_id,
                 CAST(sum(CASE WHEN d > 0 THEN (1::BIGINT << j) ELSE 0 END)
                      AS BIGINT) AS bucket
          FROM dots GROUP BY vec_id),
        qs AS (SELECT vec_id AS query_id, bucket FROM sig WHERE vec_id < 5),
        cand AS (
          SELECT qs.query_id, s.vec_id
          FROM qs JOIN sig s ON bit_count(xor(qs.bucket, s.bucket)) <= 2),
        dims AS (SELECT unnest(generate_series(1, 64)) AS i),
        flat AS (
          SELECT c.query_id, c.vec_id,
                 sum(CAST(q.embedding[dims.i] AS DOUBLE)
                     * CAST(v.embedding[dims.i] AS DOUBLE)) AS dot,
                 sqrt(sum(CAST(q.embedding[dims.i] AS DOUBLE)
                          * CAST(q.embedding[dims.i] AS DOUBLE))) AS nq,
                 sqrt(sum(CAST(v.embedding[dims.i] AS DOUBLE)
                          * CAST(v.embedding[dims.i] AS DOUBLE))) AS ne
          FROM cand c
          JOIN embeddings q ON q.vec_id = c.query_id
          JOIN embeddings v ON v.vec_id = c.vec_id, dims
          GROUP BY c.query_id, c.vec_id),
        io AS (
          SELECT
            (SELECT count(*) FROM sig s WHERE EXISTS (
               SELECT 1 FROM qs
               WHERE bit_count(xor(qs.bucket, s.bucket)) <= 2))
              AS scanned_rows,
            (SELECT count(*) FROM embeddings) AS total_rows)
        SELECT query_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY dot / (nq * ne) DESC, vec_id)
                 AS rank,
               vec_id, round(dot / (nq * ne), 6) AS cosine,
               io.scanned_rows, io.total_rows
        FROM flat, io
        QUALIFY rank <= 10
    """


def _embedding_lsh_sql() -> str:
    """Exact DuckDB mirror of embedding_near_dups_lsh (defaults:
    seed=42, n_planes=24, bands=4, τ=0.4): the seeded hyperplanes are
    embedded as float64 literals, each vector's four 6-bit band values
    are the packed sign patterns (sign(v·H) is scale-invariant, so the
    engine's normalization drops out), candidate pairs share ≥1 band
    value, and survivors re-rank by exact double cosine. The mirror
    reproduces the BANDING itself, so LSH misses match exactly. Valid
    while no band bucket exceeds BUCKET_PAIR_CAP=64 (sf0.01 max bucket:
    23) — past the cap the engine star-expands, which this plain
    pair-join does not model."""
    rng = np.random.default_rng(42)
    planes = rng.standard_normal((64, 24))
    pl_rows = ", ".join(
        f"({i + 1}, {j}, {float(planes[i, j])!r})"
        for i in range(64)
        for j in range(24)
    )
    return f"""
        WITH pl(i, j, w) AS (VALUES {pl_rows}),
        dots AS (
          SELECT e.vec_id, pl.j,
                 sum(CAST(e.embedding[pl.i] AS DOUBLE) * pl.w) AS d
          FROM embeddings e, pl
          GROUP BY e.vec_id, pl.j),
        bands AS (
          SELECT vec_id, j // 6 AS band_id,
                 CAST(sum(CASE WHEN d > 0 THEN (1::BIGINT << (j % 6))
                          ELSE 0 END) AS BIGINT) AS band_val
          FROM dots GROUP BY vec_id, j // 6),
        cand AS (
          SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
          FROM bands a
          JOIN bands b ON a.band_id = b.band_id
                      AND a.band_val = b.band_val
                      AND a.vec_id < b.vec_id),
        dims AS (SELECT unnest(generate_series(1, 64)) AS i),
        nrm AS (
          SELECT vec_id,
                 sqrt(sum(CAST(embedding[dims.i] AS DOUBLE)
                          * CAST(embedding[dims.i] AS DOUBLE))) AS nv
          FROM embeddings, dims GROUP BY vec_id),
        flat AS (
          SELECT c.a_id, c.b_id,
                 sum(CAST(va.embedding[dims.i] AS DOUBLE)
                     * CAST(vb.embedding[dims.i] AS DOUBLE)) AS dot
          FROM cand c
          JOIN embeddings va ON va.vec_id = c.a_id
          JOIN embeddings vb ON vb.vec_id = c.b_id, dims
          GROUP BY c.a_id, c.b_id)
        SELECT f.a_id, f.b_id, round(f.dot / (na.nv * nb.nv), 6) AS cosine
        FROM flat f
        JOIN nrm na ON na.vec_id = f.a_id
        JOIN nrm nb ON nb.vec_id = f.b_id
        WHERE f.dot / (na.nv * nb.nv) >= 0.4
    """


def _ivf_sql() -> str:
    """Exact DuckDB mirror of the IVF ANN path (build_ivf_index +
    ivf_topk; defaults n_lists=16, nprobe=4, seed=42). The coarse
    quantizer is ITERATIVE k-means, not SQL-expressible, so the mirror
    embeds the centroids as float64 literals — derived HERE by the same
    seeded, deterministic _kmeans over the same ≤10k-row sample (file
    order) of the embeddings table the driver registers as the
    ``embeddings`` view (the driver compares at sf0.01 —
    ``GRAFT_ORACLE_SF_DIR`` overrides for the sf0.001 pytest mirror).
    Given those centroids the oracle RE-DERIVES everything downstream
    in SQL: per-vector list assignment (argmax dot, ties to the lower
    list — the engine's argmax/stable-argsort contract), per-query
    nprobe probing, candidate re-rank by exact double cosine, and the
    pruned-read IO accounting."""
    import pyarrow.parquet as pq

    from limetrans_ray.pipelines.ann import _kmeans

    sf_dir = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    sample = np.stack(
        tbl.column("embedding").to_pandas().to_numpy()[:10_000]
    ).astype(np.float64)
    cent = _kmeans(sample, 16, seed=42)
    c_rows = ", ".join(
        f"({c}, {i + 1}, {float(cent[c, i])!r})"
        for c in range(cent.shape[0])
        for i in range(cent.shape[1])
    )
    return f"""
        WITH cent(c, i, w) AS (VALUES {c_rows}),
        cdots AS (
          SELECT e.vec_id, cent.c,
                 sum(CAST(e.embedding[cent.i] AS DOUBLE) * cent.w) AS d
          FROM embeddings e, cent
          GROUP BY e.vec_id, cent.c),
        assign AS (
          SELECT vec_id, c AS list_id
          FROM (SELECT vec_id, c,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY d DESC, c) AS rn
                FROM cdots)
          WHERE rn = 1),
        probe AS (
          SELECT vec_id AS query_id, c AS list_id
          FROM (SELECT vec_id, c,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY d DESC, c) AS rn
                FROM cdots WHERE vec_id < 5)
          WHERE rn <= 4),
        cand AS (
          SELECT p.query_id, a.vec_id
          FROM probe p JOIN assign a ON a.list_id = p.list_id),
        dims AS (SELECT unnest(generate_series(1, 64)) AS i),
        flat AS (
          SELECT c.query_id, c.vec_id,
                 sum(CAST(q.embedding[dims.i] AS DOUBLE)
                     * CAST(v.embedding[dims.i] AS DOUBLE)) AS dot,
                 sqrt(sum(CAST(q.embedding[dims.i] AS DOUBLE)
                          * CAST(q.embedding[dims.i] AS DOUBLE))) AS nq,
                 sqrt(sum(CAST(v.embedding[dims.i] AS DOUBLE)
                          * CAST(v.embedding[dims.i] AS DOUBLE))) AS ne
          FROM cand c
          JOIN embeddings q ON q.vec_id = c.query_id
          JOIN embeddings v ON v.vec_id = c.vec_id, dims
          GROUP BY c.query_id, c.vec_id),
        io AS (
          SELECT
            (SELECT count(*) FROM assign a WHERE EXISTS (
               SELECT 1 FROM probe p WHERE p.list_id = a.list_id))
              AS scanned_rows,
            (SELECT count(*) FROM embeddings) AS total_rows)
        SELECT query_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY dot / (nq * ne) DESC, vec_id)
                 AS rank,
               vec_id, round(dot / (nq * ne), 6) AS cosine,
               io.scanned_rows, io.total_rows
        FROM flat, io
        QUALIFY rank <= 10
    """


def oracle_sql() -> dict[str, str]:
    from limetrans_ray.functions.textstats import _LANG_MARKERS, _QUALITY_STOPWORDS

    de = _sql_words(_LANG_MARKERS["de"])
    en = _sql_words(_LANG_MARKERS["en"])
    fr = _sql_words(_LANG_MARKERS["fr"])
    stop = _sql_words(_QUALITY_STOPWORDS)
    return {
        "transformation_goldens": """
            SELECT * FROM (VALUES
              ('DE-2382', 'xml', CAST(39 AS BIGINT), CAST(39 AS BIGINT)),
              ('DE-2524', 'xml', 11, 11),
              ('DE-380', 'xml', 22, 22),
              ('DE-708-deposit', 'fix', 12, 12),
              ('DE-708-deposit', 'xml', 12, 12)
            ) AS t(suite, engine, records, equal_records)
        """,
        "bm25_simple_topk": _bm25_simple_sql(),
        "bm25_phrase_simple_topk": _bm25_phrase_simple_sql(),
        "fielded_simple_search": _fielded_simple_sql(),
        "wildcard_simple_topk": _wildcard_simple_sql(),
        # FULL-analyzer round trips — the German2 stemming chain
        # re-implemented in pure SQL (see _full_toks_ctes), flipping the
        # last three no_oracle rows to hash-checked
        "bm25_topk": _bm25_full_sql(),
        "bm25_phrase_topk": _bm25_phrase_full_sql(),
        "fielded_search": _fielded_full_sql(),
        # split_field/filter/join_field as string concatenation
        "fix_array_pipeline": """
            SELECT 'tags' AS field,
                   CASE WHEN lang IN ('de', 'en')
                        THEN lang || '|' || source
                        ELSE source END AS value,
                   count(*) AS n
            FROM documents GROUP BY value
        """,
        # put_rdfmap's prefLabel map + default-miss lookup as one CASE
        "rdfmap_pipeline": """
            WITH base AS (
              SELECT CASE lang WHEN 'de' THEN 'German'
                               WHEN 'en' THEN 'English'
                               WHEN 'es' THEN 'Spanish'
                               WHEN 'fr' THEN 'French'
                               ELSE 'Other' END AS lang_v,
                     source FROM documents),
            u AS (
              SELECT 'lang' AS field, lang_v AS value FROM base
              UNION ALL
              SELECT 'collection', source FROM base)
            SELECT field, value, count(*) AS n FROM u GROUP BY field, value
        """,
        "ann_lsh_topk": _ann_lsh_sql(),
        "embedding_lsh_pairs": _embedding_lsh_sql(),
        "ivf_topk": _ivf_sql(),
        # the fix TEXT program's routing/lookup/paste as one CASE chain
        "fix_pipeline": """
            SELECT 'label' AS field,
                   (CASE
                      WHEN regexp_full_match(source, 'src1[02468]')
                        THEN 'even-teens'
                      WHEN regexp_full_match(source, 'src[0-9]')
                        THEN 'single'
                      ELSE 'other' END)
                   || '-' ||
                   (CASE lang WHEN 'de' THEN 'German'
                              WHEN 'en' THEN 'English'
                              ELSE 'Other' END) AS value,
                   count(*) AS n
            FROM documents
            GROUP BY value
        """,
        # verify_links membership mirror: annotation rows re-derived as
        # a UNION of the verifying (all values) and verified (keys minus
        # skip) populations, grouped like the Ray side
        "verify_links_docs": """
            WITH base AS (
              SELECT 'HostItemEntry' AS field, source AS value FROM documents
              UNION ALL
              SELECT 'PrecedingEntry', lang FROM documents),
            ann AS (
              SELECT field,
                     'verifyingIdentifierForLinkingEntry' AS subfield, value
              FROM base
              UNION ALL
              SELECT field, 'verifiedIdentifierForLinkingEntry', value
              FROM base
              WHERE value IN ('src1', 'src3', 'de', 'en'))
            SELECT field, subfield, value, count(*) AS n
            FROM ann GROUP BY field, subfield, value
        """,
        "doc_stats": """
            SELECT lang, source, count(*) AS n,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM documents GROUP BY lang, source
        """,
        "filter_docs": """
            SELECT doc_id, source, n_chars FROM documents
            WHERE lang = 'en'
              AND regexp_matches(text, 'spark')
              AND regexp_matches(CAST(n_chars AS VARCHAR), '^[0-9]{3}$')
        """,
        "lineitem_agg": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_revenue,
                   count(*) AS n
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "topk_docs": """
            SELECT doc_id, n_chars FROM documents
            ORDER BY n_chars DESC, doc_id ASC LIMIT 10
        """,
        "lookup_region": """
            SELECT r.r_name AS region_name, count(*) AS n_customers,
                   round(sum(c.c_acctbal), 2) AS sum_acctbal
            FROM customer c
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name
        """,
        "lookup_delete_miss": """
            SELECT n.n_name AS nation_name, count(*) AS n
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE n.n_nationkey < 13
            GROUP BY n.n_name
        """,
        "semi_join_orders": """
            SELECT o_orderstatus, count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS sum_price
            FROM orders
            WHERE o_custkey IN (
                SELECT c_custkey FROM customer
                JOIN nation ON c_nationkey = n_nationkey
                WHERE n_name = 'NATION_7')
            GROUP BY o_orderstatus
        """,
        "anti_join_customers": """
            SELECT c_mktsegment, count(*) AS n
            FROM customer
            WHERE c_custkey NOT IN (
                SELECT DISTINCT o_custkey FROM orders
                WHERE o_totalprice > 400000.0)
            GROUP BY c_mktsegment
        """,
        "term_df": f"""
            SELECT term, count(*) AS df FROM (
                SELECT DISTINCT doc_id, unnest({_TOKENS}) AS term
                FROM documents)
            GROUP BY term
        """,
        "token_counts": f"""
            SELECT doc_id, len({_TOKENS}) AS n_tokens,
                   len(list_distinct({_TOKENS})) AS n_uniq_tokens
            FROM documents
        """,
        "events_window": """
            SELECT event_type,
                   CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS w_start,
                   count(*) AS n, round(sum(value), 2) AS sum_value
            FROM events GROUP BY event_type, w_start
        """,
        "hash_join_orders": """
            SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
                   o_orderstatus, count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS sum_price
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_nationkey, o_orderstatus
        """,
        "session_windows": """
            WITH o AS (
              SELECT user_id, ts, value,
                     CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                              > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS brk
              FROM events),
            s AS (
              SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS sess
              FROM o)
            SELECT user_id, CAST(sess + 1 AS BIGINT) AS session_no,
                   count(*) AS n_events,
                   CAST(floor(epoch(min(ts))) AS BIGINT) AS start_s,
                   CAST(floor(epoch(max(ts))) AS BIGINT) AS end_s,
                   round(sum(value), 2) AS sum_value
            FROM s GROUP BY user_id, sess
        """,
        "user_rolling": """
            SELECT event_id, user_id,
                   round(SUM(value) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING), 2)
                       AS running_value
            FROM events
        """,
        "dedup_exact": """
            SELECT min(doc_id) AS doc_id, count(*) AS n_dups
            FROM documents GROUP BY text
        """,
        # exact brute-force mirrors of the near-dup / textstat pipelines.
        # The SAME all-pairs word-3-gram Jaccard SQL backs two queries:
        # for neardup_ngram it is the literal operator definition; for
        # neardup_minhash the LSH banding's analytic miss rate ≈5e-8 at
        # j≥0.8 is the only divergence channel.
        "neardup_minhash": _NGRAM_JACCARD_SQL,
        "neardup_ngram": _NGRAM_JACCARD_SQL,
        # pairwise cosine-similarity join over the embedding column
        # (double-precision mirror like ann_topk's)
        "embedding_sim_pairs": """
            WITH dims AS (SELECT unnest(generate_series(1,
                        (SELECT max(len(embedding)) FROM embeddings))) AS i),
            nrm AS (
              SELECT vec_id,
                     sqrt(sum(CAST(embedding[dims.i] AS DOUBLE)
                              * CAST(embedding[dims.i] AS DOUBLE))) AS nv
              FROM embeddings, dims GROUP BY vec_id),
            dots AS (
              SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                     sum(CAST(a.embedding[dims.i] AS DOUBLE)
                         * CAST(b.embedding[dims.i] AS DOUBLE)) AS dot
              FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id, dims
              GROUP BY a.vec_id, b.vec_id)
            SELECT d.a_id, d.b_id, round(d.dot / (na.nv * nb.nv), 6) AS cosine
            FROM dots d
            JOIN nrm na ON na.vec_id = d.a_id
            JOIN nrm nb ON nb.vec_id = d.b_id
            WHERE d.dot / (na.nv * nb.nv) >= 0.4
        """,
        "simhash_pairs": f"""
            WITH th AS (
              SELECT doc_id, md5_number_lower(t) AS h
              FROM (SELECT doc_id, unnest({_TOKENS}) AS t FROM documents)),
            bits AS (
              SELECT doc_id, b,
                     sum(CASE WHEN (h >> CAST(b AS UBIGINT)) & 1 = 1
                         THEN 1 ELSE -1 END) AS acc
              FROM th, (SELECT unnest(generate_series(0, 63)) AS b)
              GROUP BY doc_id, b),
            fp AS (
              SELECT doc_id,
                CAST(sum(CASE WHEN acc > 0 AND b < 32
                     THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS lo,
                CAST(sum(CASE WHEN acc > 0 AND b >= 32
                     THEN (1::BIGINT << (b - 32)) ELSE 0 END) AS BIGINT) AS hi
              FROM bits GROUP BY doc_id)
            SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                   CAST(bit_count(xor(a.lo, b.lo))
                        + bit_count(xor(a.hi, b.hi)) AS BIGINT) AS hamming
            FROM fp a, fp b
            WHERE a.doc_id < b.doc_id
              AND bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3
        """,
        "langid_docs": f"""
            WITH w AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text),
                       '[a-zàâäéèêëîïôöùûüçß]+') AS words
              FROM documents),
            h AS (
              SELECT doc_id,
                len(list_filter(words, x -> list_contains({de}, x))) AS de_h,
                len(list_filter(words, x -> list_contains({en}, x))) AS en_h,
                len(list_filter(words, x -> list_contains({fr}, x))) AS fr_h
              FROM w)
            SELECT doc_id,
              CASE WHEN greatest(de_h, en_h, fr_h) <= 1 THEN 'und'
                   WHEN de_h = greatest(de_h, en_h, fr_h) THEN 'de'
                   WHEN en_h = greatest(de_h, en_h, fr_h) THEN 'en'
                   ELSE 'fr' END AS lang_pred
            FROM h
        """,
        "quality_docs": f"""
            WITH t AS (
              SELECT doc_id, text, {_TOKENS} AS tk FROM documents),
            f AS (
              SELECT doc_id,
                length(text) AS n_chars,
                len(tk) AS nt,
                len(regexp_extract_all(text,
                    '[^0-9A-Za-z_\\s\\x{{00C0}}-\\x{{024F}}]')) AS n_punct,
                len(regexp_extract_all(text, '[0-9]')) AS n_digits,
                len(list_filter(tk, x -> list_contains({stop}, x))) AS stop_hits,
                CASE WHEN len(tk) = 0 THEN 0.0
                     ELSE CAST(list_sum(list_transform(tk, x -> length(x)))
                               AS DOUBLE) / len(tk) END AS mean_tok
              FROM t),
            g AS (
              SELECT doc_id, n_chars, nt, mean_tok,
                CASE WHEN n_chars = 0 THEN 0.0
                     ELSE CAST(n_punct AS DOUBLE) / n_chars END AS pr,
                CASE WHEN n_chars = 0 THEN 0.0
                     ELSE CAST(n_digits AS DOUBLE) / n_chars END AS dr,
                CASE WHEN nt = 0 THEN 0.0
                     ELSE CAST(stop_hits AS DOUBLE) / nt END AS sr
              FROM f)
            SELECT doc_id, n_chars AS q_n_chars, nt AS q_n_tokens,
                   sr AS q_stop_ratio,
                   ((CASE WHEN nt < 10 THEN nt / 10.0 ELSE 1.0 END)
                    * (CASE WHEN mean_tok < 2.0 OR mean_tok > 12.0
                            THEN 0.5 ELSE 1.0 END))
                   * (greatest(0.0, 1.0 - 2.0 * pr)
                      * greatest(0.0, 1.0 - 2.0 * dr)) AS q_quality
            FROM g
        """,
        "fingerprint_docs": f"""
            SELECT doc_id, md5(array_to_string({_TOKENS}, ' ')) AS fingerprint
            FROM documents
        """,
        # decode→fix-program conformance: CASE mirrors the lookup table
        # (generated from _LANG_NAMES — single source of truth), the
        # copy_field+retain mirror is the collection branch
        "recordops_pipeline": f"""
            SELECT field, value, count(*) AS n FROM (
              SELECT 'lang' AS field,
                     CASE lang {' '.join(f"WHEN '{k}' THEN '{v}'" for k, v in sorted(_LANG_NAMES.items()))} ELSE 'Other' END AS value
              FROM documents
              UNION ALL
              SELECT 'collection' AS field, source AS value FROM documents
            ) GROUP BY field, value
        """,
        "standard_numbers": """
            WITH b AS (
              SELECT doc_id,
                     '978' || lpad(CAST(doc_id AS VARCHAR), 9, '0') AS b12
              FROM documents),
            k AS (
              SELECT doc_id, b12,
                (10 - (list_sum(list_transform(generate_series(1, 12),
                    i -> CAST(b12[i] AS INT)
                         * (CASE WHEN i % 2 = 1 THEN 1 ELSE 3 END))) % 10))
                % 10 AS chk
              FROM b)
            SELECT doc_id, b12 || CAST(chk AS VARCHAR) AS preferred_isbn
            FROM k
        """,
        "ann_topk": """
            WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
            dims AS (SELECT unnest(generate_series(1,
                        (SELECT max(len(embedding)) FROM embeddings))) AS i),
            flat AS (
              SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
                     sum(CAST(q.embedding[dims.i] AS DOUBLE)
                         * CAST(e.embedding[dims.i] AS DOUBLE)) AS dot,
                     sqrt(sum(CAST(q.embedding[dims.i] AS DOUBLE)
                              * CAST(q.embedding[dims.i] AS DOUBLE))) AS nq,
                     sqrt(sum(CAST(e.embedding[dims.i] AS DOUBLE)
                              * CAST(e.embedding[dims.i] AS DOUBLE))) AS ne
              FROM q, embeddings e, dims
              GROUP BY q.vec_id, e.vec_id
            )
            SELECT query_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY dot/(nq*ne) DESC, vec_id) AS rank,
                   vec_id, round(dot / (nq * ne), 6) AS cosine
            FROM flat QUALIFY rank <= 10
        """,
    }
