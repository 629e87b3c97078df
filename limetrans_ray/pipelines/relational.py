"""Relational analogues of the reference's per-record operator surface,
expressed Ray-Data-first over the driver's synthetic star schema.

Each function here implements one operator family from SURVEY.md §2 as
a Dataset pipeline and has an exact ANSI-SQL mirror in
``__ray_entry__.oracle_sql`` (DuckDB verifies row counts + schemas +
value hashes at sf=0.01):

- projections/filters  → the Metafix ``copy_field``/``if any_match``
  surface (SURVEY.md §2.3) via the LimetransFilter grammar;
- broadcast lookups    → ``lookup(path, map)`` (§2.6): small dimension
  dicts shipped once via ``ray.put``;
- semi/anti joins      → ``verify_links`` membership and skip sets
  (§2.6): broadcast key sets, vectorized isin masks;
- grouped aggregates   → Counter / RepeatedFieldsLogger analogues
  (§2.7), pre-aggregated per batch where the key space is small;
- sort/top-k           → §2.8;
- windowed aggregates  → the streaming-shaped events table, tumbling
  1-hour windows (ray_guide streaming pattern).

Functions never call ``ray.init`` — the driver owns the session.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from ..functions.filter import filter_dataset


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


# ----------------------------------------------------------- agg / projection

def doc_stats(sf_dir: str) -> rd.Dataset:
    """Grouped counts over documents (RepeatedFieldsLogger analogue)."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["lang", "source", "n_chars"])
    return ds.groupby(["lang", "source"]).aggregate(
        Count(alias_name="n"), Sum("n_chars", alias_name="sum_chars")
    )


def filter_docs(sf_dir: str) -> rd.Dataset:
    """LimetransFilter grammar atoms, vectorized: equals + regex +
    regex-on-casted-int (all three atom kinds)."""
    ds = rd.read_parquet(
        _t(sf_dir, "documents"), columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    out = filter_dataset(ds, ["lang=en", "text=~spark", "n_chars=~^[0-9]{3}$"], op="all")
    return out.select_columns(["doc_id", "source", "n_chars"])


def lineitem_agg(sf_dir: str) -> rd.Dataset:
    """TPC-H Q1-style wide aggregate.

    Combiner-before-shuffle: each batch pre-aggregates its rows to one
    row per (flag, status) in a vectorized pandas groupby, so the
    groupby exchange moves ~6 rows per BLOCK instead of every lineitem
    row — at 100 TB the shuffle volume is #blocks × #groups, never the
    fact table. Partials enter the aggregate as ARROW blocks (the
    pandas-block path of ``aggregate()`` accumulates per row — measured
    ~0.6 ms/row vs the vectorized Arrow path)."""
    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    partial_schema = pa.schema(
        [
            ("l_returnflag", pa.string()),
            ("l_linestatus", pa.string()),
            ("qty_raw", pa.float64()),
            ("rev_raw", pa.float64()),
            ("n", pa.int64()),
        ]
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["revenue"] = df["l_extendedprice"] * (1.0 - df["l_discount"])
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            qty_raw=("l_quantity", "sum"),
            rev_raw=("revenue", "sum"),
            n=("l_quantity", "size"),
        )
        g["qty_raw"] = g["qty_raw"].astype(np.float64)
        return pa.Table.from_pandas(g, schema=partial_schema, preserve_index=False)

    # (flag, status) has ~6 combinations — bounded, so the final combine
    # is one small task over ≤6-row-per-block partials (tree reduce);
    # unbounded keys would flip back to groupby().aggregate()
    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            qty_raw=("qty_raw", "sum"), rev_raw=("rev_raw", "sum"), n=("n", "sum")
        )
        out["sum_qty"] = out["qty_raw"].round(2)
        out["sum_revenue"] = out["rev_raw"].round(2)
        return out[["l_returnflag", "l_linestatus", "sum_qty", "sum_revenue", "n"]]

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(combine, batch_format="pandas", batch_size=None)
    )


def topk_docs(sf_dir: str) -> rd.Dataset:
    """Deterministic top-k (n_chars desc, doc_id asc) — §2.8."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "n_chars"])
    return ds.sort(["n_chars", "doc_id"], descending=[True, False]).limit(10)


# --------------------------------------------------------------- joins

def lookup_region(sf_dir: str) -> rd.Dataset:
    """Broadcast dimension lookup (the ``lookup(path, map)`` pattern):
    nation+region are tiny → one dict shipped via ray.put, applied per
    batch; only the small aggregate shuffles."""
    nation = rd.read_parquet(_t(sf_dir, "nation")).to_pandas()
    region = rd.read_parquet(_t(sf_dir, "region")).to_pandas()
    r_name = dict(zip(region["r_regionkey"], region["r_name"]))
    nat_to_region = {
        int(r.n_nationkey): r_name[r.n_regionkey] for r in nation.itertuples()
    }
    lookup_ref = ray.put(nat_to_region)

    partial_schema = pa.schema(
        [
            ("region_name", pa.string()),
            ("n_customers", pa.int64()),
            ("bal_raw", pa.float64()),
        ]
    )

    def add_region(batch: pd.DataFrame) -> pa.Table:
        # lookup + combiner in one pass; Arrow partials out (the
        # pandas-block aggregate path accumulates per row)
        lut = ray.get(lookup_ref)
        g = pd.DataFrame(
            {
                "region_name": batch["c_nationkey"].map(lut),
                "c_acctbal": batch["c_acctbal"],
            }
        ).groupby("region_name", as_index=False).agg(
            n_customers=("c_acctbal", "size"), bal_raw=("c_acctbal", "sum")
        )
        return pa.Table.from_pandas(g, schema=partial_schema, preserve_index=False)

    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_nationkey", "c_acctbal"])

    # 5 regions — bounded key space, tree-reduce combine in one task
    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("region_name", as_index=False).agg(
            n_customers=("n_customers", "sum"), bal_raw=("bal_raw", "sum")
        )
        out["sum_acctbal"] = out["bal_raw"].round(2)
        return out[["region_name", "n_customers", "sum_acctbal"]]

    return (
        cust.map_batches(add_region, batch_format="pandas")
        .repartition(1)
        .map_batches(combine, batch_format="pandas", batch_size=None)
    )


def lookup_delete_miss(sf_dir: str, max_nation: int = 13) -> rd.Dataset:
    """``lookup(path, map, delete)`` semantics (SURVEY.md §2.3): map
    customers' nation key through a PARTIAL broadcast map (nations
    < ``max_nation`` only) and DROP rows whose key misses — the
    reference's drop-on-miss option, equivalent to an inner join
    against the map's key set."""
    from ..functions.lookup import LookupStage

    nation = rd.read_parquet(_t(sf_dir, "nation")).to_pandas()
    lut = {
        int(r.n_nationkey): r.n_name
        for r in nation.itertuples()
        if r.n_nationkey < max_nation
    }
    ref = ray.put(lut)
    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_nationkey"])
    out = cust.map_batches(
        LookupStage("c_nationkey", "nation_name", table_ref=ref, on_miss="delete"),
        batch_format="pyarrow",
    )
    return out.groupby("nation_name").aggregate(Count(alias_name="n"))


def semi_join_orders(sf_dir: str, nation_name: str = "NATION_7") -> rd.Dataset:
    """Semi-join (verify_links membership analogue): orders whose
    customer belongs to one nation — key set broadcast, isin mask."""
    nation = rd.read_parquet(_t(sf_dir, "nation")).to_pandas()
    nk = int(nation.loc[nation["n_name"] == nation_name, "n_nationkey"].iloc[0])
    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    keys = cust.to_pandas()
    keyset = set(keys.loc[keys["c_nationkey"] == nk, "c_custkey"].astype(int))
    keys_ref = ray.put(np.fromiter(keyset, dtype=np.int64, count=len(keyset)))

    def member(batch: pa.Table) -> pa.Table:
        k = ray.get(keys_ref)
        mask = np.isin(batch.column("o_custkey").to_numpy(), k)
        return batch.filter(pa.array(mask))

    orders = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_custkey", "o_orderstatus", "o_totalprice"]
    )
    agg = orders.map_batches(member, batch_format="pyarrow").groupby(
        "o_orderstatus"
    ).aggregate(Count(alias_name="n_orders"), Sum("o_totalprice", alias_name="p_raw"))

    def round_p(df: pd.DataFrame) -> pd.DataFrame:
        df["sum_price"] = df["p_raw"].round(2)
        return df[["o_orderstatus", "n_orders", "sum_price"]]

    return agg.map_batches(round_p, batch_format="pandas")


def anti_join_customers(sf_dir: str, min_price: float = 400_000.0) -> rd.Dataset:
    """Anti-join (the ``skip*`` set analogue): customers with no
    high-value order (> ``min_price``).

    The qualifying-customer key set is distilled to a compact int64
    array and broadcast (at 10^12 scale this becomes a Bloom filter
    with the same pipeline shape)."""
    okeys = (
        rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
        .map_batches(
            lambda t: t.filter(pc.greater(t.column("o_totalprice"), min_price)),
            batch_format="pyarrow",
        )
        .unique("o_custkey")
    )
    arr = np.sort(np.array(okeys, dtype=np.int64))
    keys_ref = ray.put(arr)

    def not_member(batch: pa.Table) -> pa.Table:
        k = ray.get(keys_ref)
        mask = ~np.isin(batch.column("c_custkey").to_numpy(), k)
        return batch.filter(pa.array(mask))

    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])
    return (
        cust.map_batches(not_member, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Count(alias_name="n"))
    )


# --------------------------------------------------------------- text / terms

def _doc_token_codes(batch: pa.Table, text_col: str = "text"):
    """Vectorized ``simple_terms`` over a batch: one Arrow
    lower+split+flatten pass, then dictionary-encoded token codes with
    their row index — no Python loop over rows or tokens. Returns
    (doc_idx, codes, vocab) with empty tokens already dropped."""
    toks = pc.split_pattern_regex(
        pc.utf8_lower(batch.column(text_col)), pattern="[^0-9a-z]+"
    )
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    lens = pc.list_value_length(toks).to_numpy()
    flat = pc.list_flatten(toks)
    enc = pc.dictionary_encode(flat)
    codes = enc.indices.to_numpy().astype(np.int64)
    vocab = enc.dictionary
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    nonempty = pc.not_equal(vocab, "").to_numpy(zero_copy_only=False)
    keep = nonempty[codes]
    return doc_idx[keep], codes[keep], vocab


def term_df(sf_dir: str) -> rd.Dataset:
    """Document frequency per term, simplified SQL-mirrorable tokenizer.

    Pre-aggregated AND vectorized: each batch lowers/splits/encodes its
    texts in Arrow kernels, dedups (doc, term) pairs with one np.unique,
    and emits (term, partial_df) rows — the shuffle moves term partials,
    never raw tokens (SURVEY.md §4 skew rule)."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def partial_df(batch: pa.Table) -> pa.Table:
        doc_idx, codes, vocab = _doc_token_codes(batch)
        if len(codes) == 0:
            return pa.table(
                {"term": pa.array([], pa.string()), "pdf": pa.array([], pa.int64())}
            )
        pair = doc_idx * len(vocab) + codes
        uniq_codes = (np.unique(pair) % len(vocab)).astype(np.int64)
        counts = np.bincount(uniq_codes, minlength=len(vocab))
        present = np.flatnonzero(counts)
        return pa.table(
            {
                "term": vocab.take(pa.array(present)),
                "pdf": pa.array(counts[present].astype(np.int64)),
            }
        )

    return (
        ds.map_batches(partial_df, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("pdf", alias_name="df"))
    )


def token_counts(sf_dir: str) -> rd.Dataset:
    """Per-doc token counts with the SQL-mirrorable tokenizer —
    vectorized (shared Arrow split/encode pass, bincounts per doc)."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def count_tokens(batch: pa.Table) -> pa.Table:
        doc_idx, codes, vocab = _doc_token_codes(batch)
        nrows = batch.num_rows
        n = np.bincount(doc_idx, minlength=nrows).astype(np.int64)
        pair = np.unique(doc_idx * len(vocab) + codes)
        u = np.bincount(pair // len(vocab), minlength=nrows).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(n),
                "n_uniq_tokens": pa.array(u),
            }
        )

    return ds.map_batches(count_tokens, batch_format="pyarrow")


def hash_join_orders(sf_dir: str) -> rd.Dataset:
    """Both-sides-large hash join (``Dataset.join``, hash-partitioned on
    the key — SURVEY.md §2.6 "both sides large" row; the SisisSuperFilter
    parent-child join analogue): orders ⋈ customer, aggregated per
    nation and order status."""
    orders = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_custkey", "o_orderstatus", "o_totalprice"]
    )
    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    joined = orders.join(
        cust, join_type="inner", num_partitions=16, on=("o_custkey",), right_on=("c_custkey",)
    )
    agg = joined.groupby(["c_nationkey", "o_orderstatus"]).aggregate(
        Count(alias_name="n_orders"), Sum("o_totalprice", alias_name="p_raw")
    )

    def round_p(df: pd.DataFrame) -> pd.DataFrame:
        df["sum_price"] = df["p_raw"].round(2)
        return df[["c_nationkey", "o_orderstatus", "n_orders", "sum_price"]]

    return agg.map_batches(round_p, batch_format="pandas")


# --------------------------------------------------------------- events

def events_window(sf_dir: str) -> rd.Dataset:
    """Tumbling 1-hour window aggregate over the events stream table
    (ordered-log treatment per the streaming-shaped-workloads pattern).

    Combiner-before-shuffle: each batch collapses to one row per
    (event_type, window) before the groupby, and partials enter the
    aggregate as ARROW blocks — the pandas-block ``aggregate()`` path
    accumulates per row (measured ~0.6 ms/row), the Arrow path is
    vectorized."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts", "event_type", "value"])

    partial_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("w_start", pa.int64()),
            ("n", pa.int64()),
            ("v_raw", pa.float64()),
        ]
    )

    def partial(batch: pd.DataFrame) -> pa.Table:
        # unit-independent epoch seconds (parquet gives datetime64[us])
        w = (batch["ts"].dt.floor("h") - pd.Timestamp(0)) // pd.Timedelta(seconds=1)
        g = pd.DataFrame(
            {"event_type": batch["event_type"], "w_start": w, "value": batch["value"]}
        ).groupby(["event_type", "w_start"], as_index=False).agg(
            n=("value", "size"), v_raw=("value", "sum")
        )
        return pa.Table.from_pandas(g, schema=partial_schema, preserve_index=False)

    # the combined key space is bounded (#event_types × #hours), so the
    # final combine is one small task over the partials — the same
    # tree-reduce shape as the sort-groupby without its barrier; at an
    # unbounded key space this would flip back to groupby().aggregate()
    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["event_type", "w_start"], as_index=False).agg(
            n=("n", "sum"), v_raw=("v_raw", "sum")
        )
        out["sum_value"] = out["v_raw"].round(2)
        return out[["event_type", "w_start", "n", "sum_value"]]

    return (
        ds.map_batches(partial, batch_format="pandas")
        .repartition(1)
        .map_batches(combine, batch_format="pandas", batch_size=None)
    )


def session_windows(sf_dir: str, gap_minutes: int = 30) -> rd.Dataset:
    """Session windowing per user (streaming-shaped op): events of one
    user sorted by ts; a gap > ``gap_minutes`` starts a new session.
    ``groupby(user).map_groups`` over the ordered log — the documented
    Ray Data treatment of event streams (ordering assumption: per-user
    in-group sort, no cross-user order needed). Returns one row per
    session (user_id, session_no, n_events, epoch-second bounds)."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts", "value"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts"], kind="mergesort")
        new = (g["ts"].diff() > gap).cumsum()
        out = g.groupby(new).agg(
            user_id=("user_id", "first"),
            n_events=("ts", "size"),
            start=("ts", "min"),
            end=("ts", "max"),
            sum_value=("value", "sum"),
        )
        out["session_no"] = range(1, len(out) + 1)
        epoch = pd.Timestamp(0)
        out["start_s"] = (out["start"] - epoch) // pd.Timedelta(seconds=1)
        out["end_s"] = (out["end"] - epoch) // pd.Timedelta(seconds=1)
        out["sum_value"] = out["sum_value"].round(2)
        return out[["user_id", "session_no", "n_events", "start_s", "end_s", "sum_value"]]

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")


def user_rolling(sf_dir: str) -> rd.Dataset:
    """Per-key running aggregate (windowed cumulative sum): events per
    user ordered by ts with a cumulative value column — mirrors SQL
    ``SUM(value) OVER (PARTITION BY user_id ORDER BY ts)``."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"])

    def rolling(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        g["running_value"] = g["value"].cumsum().round(2)
        return g[["event_id", "user_id", "running_value"]]

    return ds.groupby("user_id").map_groups(rolling, batch_format="pandas")
