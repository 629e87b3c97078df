"""Mirror of the driver's correctness gate at sf0.001: run every
``__ray_entry__.queries()`` entry and compare row count, schema and
values against its ``oracle_sql()`` DuckDB mirror (order-insensitive,
columns sorted by name — the driver's comparison shape)."""

import math

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry_mod

import os

SF_DIR = "/root/testdata/sf0.001"
# data-derived oracles (ivf_topk centroid literals) must derive from
# the SAME tier this mirror compares at
os.environ["GRAFT_ORACLE_SF_DIR"] = SF_DIR
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(obj, rd.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


SQL_CHECKED = sorted(entry_mod.oracle_sql())


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(ray_session, duck, name):
    ray_result = _normalize(_to_pandas(entry_mod.queries()[name](SF_DIR)))
    sql_result = _normalize(duck.sql(entry_mod.oracle_sql()[name]).df())
    assert list(ray_result.columns) == list(sql_result.columns), name
    assert len(ray_result) == len(sql_result), name
    for c in ray_result.columns:
        a, b = ray_result[c], sql_result[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            assert all(
                math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9)
                for x, y in zip(a, b)
            ), f"{name}.{c}"
        else:
            assert a.astype("int64" if a.dtype.kind in "iu" else str).tolist() == \
                b.astype("int64" if b.dtype.kind in "iu" else str).tolist(), f"{name}.{c}"


def test_all_sql_keys_have_queries():
    assert set(entry_mod.oracle_sql()) <= set(entry_mod.queries())


def test_rows_only_queries_run(ray_session):
    """Non-SQL-expressible entries must still execute and return rows
    with a stable schema (the driver's weaker check)."""
    q = entry_mod.queries()
    for name in sorted(set(q) - set(entry_mod.oracle_sql())):
        out = _to_pandas(q[name](SF_DIR))
        assert isinstance(out, pd.DataFrame), name
        assert list(out.columns), name


def test_entry_returns_rows(ray_session):
    out = _to_pandas(entry_mod.entry())
    assert len(out) > 0
    assert list(out.columns) == ["query", "rank", "doc_id", "score"]
    # ranks are 1..k per query, scores non-increasing
    for _q, grp in out.groupby("query"):
        assert grp["rank"].tolist() == list(range(1, len(grp) + 1))
        assert all(s1 >= s2 for s1, s2 in zip(grp["score"], grp["score"][1:]))
