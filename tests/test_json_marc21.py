"""JSON/JSONL and MARC21 (ISO 2709) decoders: hand-written expectations
in the reference's transformation-test spirit, plus the Ray
decode→RecordOps composition both decoders share with MARC-XML."""

import json

import pyarrow as pa
import pytest

from limetrans_ray.functions.jsonrec import (
    decode_batch as decode_json_batch,
    decode_json_records,
    strip_json_comments,
)
from limetrans_ray.functions.marc21 import (
    FT,
    RT,
    SF,
    decode_batch as decode_marc_batch,
    parse_marc21,
)


def _as_map(rows):
    return {
        (r["record_id"], r["field"], r["subfield"], r["occurrence"]): r["value"]
        for r in rows
    }


class TestJsonDecoder:
    def test_flatten_and_arrays(self):
        rec = {
            "title": "Der Holzbau-Atlas",
            "year": 1980,
            "available": True,
            "missing": None,
            "lang": ["ger", "eng"],
            "person": {"name": "Person, One", "role": "aut"},
            "nested": {"a": {"b": "deep"}},
            "freq": [{"interval": "weekly"}, {"interval": "monthly"}],
        }
        m = _as_map(decode_json_records(json.dumps(rec), id_prefix="r"))
        rid = "r-0"
        assert m[(rid, "title", None, 0)] == "Der Holzbau-Atlas"
        assert m[(rid, "year", None, 0)] == "1980"
        assert m[(rid, "available", None, 0)] == "true"
        assert (rid, "missing", None, 0) not in m  # null leaf dropped
        # arrayName "": repeated path, successive occurrences
        assert m[(rid, "lang", None, 0)] == "ger"
        assert m[(rid, "lang", None, 1)] == "eng"
        # one-level nesting = subfields; deeper joins with '.'
        assert m[(rid, "person", "name", 0)] == "Person, One"
        assert m[(rid, "person", "role", 0)] == "aut"
        assert m[(rid, "nested.a", "b", 0)] == "deep"
        # array-of-objects: element i = occurrence-i row set
        assert m[(rid, "freq", "interval", 0)] == "weekly"
        assert m[(rid, "freq", "interval", 1)] == "monthly"

    def test_top_level_array_and_id_field(self):
        blob = json.dumps([{"id": "A1", "t": "x"}, {"id": "A2", "t": "y"}])
        rows = decode_json_records(blob, id_field="id")
        assert {r["record_id"] for r in rows} == {"A1", "A2"}
        # reference config recordId(""): no id from content by default
        rows = decode_json_records(blob, id_prefix="p")
        assert {r["record_id"] for r in rows} == {"p-0", "p-1"}

    def test_comments_allowed(self):
        # FileQueue.java:105 setAllowComments(true): Java/C++ style
        blob = (
            '{\n  // line comment\n  "t": "a//b", /* block\n comment */'
            ' "u": "c/*d*/"\n}'
        )
        m = _as_map(decode_json_records(blob, id_prefix="r"))
        assert m[("r-0", "t", None, 0)] == "a//b"  # strings untouched
        assert m[("r-0", "u", None, 0)] == "c/*d*/"
        assert strip_json_comments("// all\n1") .strip() == "1"

    def test_jsonl_batch(self, ray_session):
        import ray.data as rd

        lines = "\n".join(
            json.dumps({"t": f"rec {i}", "n": i}) for i in range(3)
        )
        tbl = pa.table({"json": pa.array([lines], pa.string())})
        out = decode_json_batch(tbl, lines=True).to_pylist()
        assert len(out) == 6  # 3 records x 2 fields
        assert len({r["record_id"] for r in out}) == 3  # no id collisions
        # and through Ray, composing with RecordOps like every decoder
        from limetrans_ray.functions.recordops import RecordOps

        ds = rd.from_arrow(pa.table({"json": pa.array([lines], pa.string())}))
        ops = RecordOps([("retain", {"fields": ["t"]})])
        res = (
            ds.map_batches(
                lambda b: decode_json_batch(b, lines=True),
                batch_format="pyarrow",
            )
            .map_batches(ops, batch_format="pyarrow")
            .to_pandas()
        )
        assert sorted(res["value"]) == ["rec 0", "rec 1", "rec 2"]


def _build_iso2709(fields):
    """Assemble a well-formed ISO 2709 record from (tag, body) pairs —
    the directory/base-address arithmetic the decoder must invert."""
    bodies = [body + FT for _tag, body in fields]
    directory = ""
    start = 0
    for (tag, _), b in zip(fields, bodies):
        directory += f"{tag}{len(b):04d}{start:05d}"
        start += len(b)
    directory += FT
    base = 24 + len(directory)
    data = "".join(bodies) + RT
    total = base + len(data)
    leader = f"{total:05d}nam a22{base:05d}   4500"
    assert len(leader) == 24
    return leader + directory + data


class TestMarc21Decoder:
    FIELDS = [
        ("001", "HT001"),
        ("008", "210101s1980    gw            00 0 ger d"),
        ("245", f"10{SF}aDer Holzbau-Atlas{SF}bein Atlas"),
        ("700", f"1 {SF}aPerson, One"),
        ("700", f"1 {SF}aPerson, Two"),
    ]

    def test_directory_walk(self):
        rec = _build_iso2709(self.FIELDS)
        m = _as_map(parse_marc21(rec))
        rid = "HT001"  # record_id from 001
        assert m[(rid, "001", None, 0)] == "HT001"
        assert m[(rid, "008", None, 0)].startswith("210101s1980")
        assert m[(rid, "24510", "a", 0)] == "Der Holzbau-Atlas"
        assert m[(rid, "24510", "b", 0)] == "ein Atlas"
        # repeated field: occurrences in document order
        assert m[(rid, "7001 ", "a", 0)] == "Person, One"
        assert m[(rid, "7001 ", "a", 1)] == "Person, Two"
        # leader exploded into named positions (Marc21Decoder entity):
        # leader "NNNNNnam a22NNNNN   4500" → status='n' type='a'
        # bibliographicLevel='m' characterCodingScheme='a'
        assert m[(rid, "leader", "status", 0)] == "n"
        assert m[(rid, "leader", "type", 0)] == "a"
        assert m[(rid, "leader", "bibliographicLevel", 0)] == "m"
        assert m[(rid, "leader", "characterCodingScheme", 0)] == "a"

    def test_multi_record_and_fallback_id(self):
        no_id = _build_iso2709([("245", f"10{SF}aAnon")])
        rec = _build_iso2709(self.FIELDS)
        rows = parse_marc21(rec + no_id, id_prefix="p")
        ids = {r["record_id"] for r in rows}
        assert ids == {"HT001", "p-1"}

    def test_malformed_directory_fallback(self):
        # no directory at all: FT-separated fields that self-identify
        body = f"001HT009{FT}24510{SF}aTitle{FT}{RT}"
        rec = " " * 24 + body
        m = _as_map(parse_marc21(rec))
        assert m[("HT009", "24510", "a", 0)] == "Title"

    def test_batch_through_ray(self, ray_session):
        import ray.data as rd

        rec = _build_iso2709(self.FIELDS)
        ds = rd.from_arrow(
            pa.table({"marc": pa.array([rec, rec], pa.string())})
        )
        out = ds.map_batches(decode_marc_batch, batch_format="pyarrow").to_pandas()
        assert set(out["record_id"]) == {"HT001"}
        assert (out["field"] == "24510").sum() == 4  # a+b per blob


class TestDecoderRobustness:
    def test_marc21_false_directory_falls_back(self):
        # a 12-char first segment that is NOT a directory (e.g. a 001
        # control field with a 9-char id) must fall back to the
        # terminator-split walk, not crash on int('HT00')
        body = f"001HT0090012{FT}24510{SF}aT{FT}{RT}"
        rec = " " * 24 + body
        rows = parse_marc21(rec)
        m = _as_map(rows)
        assert m[("HT0090012", "001", None, 0)] == "HT0090012"
        assert m[("HT0090012", "24510", "a", 0)] == "T"

    def test_marc21_junk_line_no_phantom_record(self):
        rec = _build_iso2709([("001", "HT1"), ("245", f"10{SF}aT")])
        rows = parse_marc21(rec + "END OF FILE\n")
        assert {r["record_id"] for r in rows} == {"HT1"}

    def test_marc21_newline_inside_value(self):
        # RT-terminated stream: a field value containing a newline must
        # not split the record
        rec = _build_iso2709(
            [("001", "HT2"), ("500", f"  {SF}aline1\nline2")]
        )
        m = _as_map(parse_marc21(rec))
        assert m[("HT2", "500  ", "a", 0)] == "line1\nline2"
        assert len({r[0] for r in m}) == 1

    def test_jsonl_comment_only_line(self):
        blob = '// header comment\n{"t": "a"}\n  /* block */\n{"t": "b"}'
        tbl = pa.table({"json": pa.array([blob], pa.string())})
        out = decode_json_batch(tbl, lines=True).to_pylist()
        assert sorted(r["value"] for r in out) == ["a", "b"]

    def test_json_heterogeneous_object_array_occurrences(self):
        # element i = occurrence-i row set even with differing keys
        blob = json.dumps({"freq": [{"a": "1"}, {"b": "2"}, {"a": "3"}]})
        m = _as_map(decode_json_records(blob, id_prefix="r"))
        assert m[("r-0", "freq", "a", 0)] == "1"
        assert m[("r-0", "freq", "b", 1)] == "2"
        assert m[("r-0", "freq", "a", 2)] == "3"

    def test_recordops_required_keys_fail_fast(self):
        from limetrans_ray.functions.recordops import RecordOps

        with pytest.raises(ValueError, match="missing"):
            RecordOps([("add_hash", {"field": "f"})])
        with pytest.raises(ValueError, match="missing"):
            RecordOps([("lookup", {"field": "f"})])
