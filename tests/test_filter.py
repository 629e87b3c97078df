"""Filter grammar conformance (LimetransFilter.java:18-28 atom grammar,
filter/reference golden style — SURVEY.md §3.2)."""

import pyarrow as pa
import pytest

from limetrans_ray.functions.filter import filter_dataset, parse_atom, parse_filter


@pytest.fixture()
def batch():
    return pa.table(
        {
            "lang": ["en", "de", "", "en"],
            "title": ["web search", "holzbau atlas", "payment", None],
            "n": [10, 250, 999, 42],
        }
    )


def test_atom_parse():
    assert parse_atom("@lang").kind == "exists"
    assert parse_atom("!lang").kind == "missing"
    a = parse_atom("lang=en")
    assert (a.kind, a.field, a.value) == ("equals", "lang", "en")
    r = parse_atom("title=~holz.*")
    assert (r.kind, r.field, r.value) == ("regex", "title", "holz.*")
    assert parse_atom("payment").kind == "anyfield"


def test_exists_missing(batch):
    f = parse_filter(["@lang"])
    assert f(batch).num_rows == 3  # empty string counts as missing
    f = parse_filter(["!title"])
    assert f(batch).num_rows == 1  # null title


def test_equals_regex(batch):
    assert parse_filter(["lang=en"])(batch).num_rows == 2
    assert parse_filter(["title=~^holz"])(batch).num_rows == 1
    # regex over a casted int column
    assert parse_filter(["n=~^[0-9]{3}$"])(batch).num_rows == 2


def test_anyfield(batch):
    assert parse_filter(["payment"])(batch).num_rows == 1
    # bare value is substring-contains over every column: matches the
    # two lang=="en" rows AND "paym(en)t"
    assert parse_filter(["en"])(batch).num_rows == 3
    assert parse_filter(["holzbau"])(batch).num_rows == 1


def test_operators(batch):
    assert parse_filter(["lang=en", "lang=de"], op="any")(batch).num_rows == 3
    assert parse_filter(["lang=en", "title=~web"], op="all")(batch).num_rows == 1
    assert parse_filter(["lang=en", "lang=de"], op="none")(batch).num_rows == 1


def test_missing_column(batch):
    assert parse_filter(["@nope"])(batch).num_rows == 0
    assert parse_filter(["!nope"])(batch).num_rows == 4


def test_bad_operator():
    with pytest.raises(ValueError):
        parse_filter(["x=1"], op="xor")
    with pytest.raises(ValueError):
        parse_filter([])


def test_filter_dataset(ray_session, batch):
    import ray.data as rd

    ds = rd.from_arrow(batch)
    out = filter_dataset(ds, ["lang=en"], op="all").to_pandas()
    assert len(out) == 2
