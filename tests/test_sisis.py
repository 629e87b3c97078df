"""SISIS multi-line decode + SISIS_SUPER parent-child stitch
(reference MultiLineDecoder.java:97-193 / SisisSuperFilter.java:60-147
re-expressed as explode + hash join)."""

import pyarrow as pa
import pytest

from limetrans_ray.functions.multiline import decode_batch, parse_multiline

SAMPLE = """\
0000:P1
0010:REC-P1
0331:Die Super-Serie
9999:x
0000:C1
0010:REC-C1
0004:P1
0331:Band Eins
9999:x
0000:C2
0010:REC-C2
0004:P1
0331:Band Zwei
9999:x
0000:S1
0010:REC-S1
0002:am-superwork
0004:P1
0331:Selbst ein Superwerk
9999:x
"""


class TestDecode:
    def test_parse_rows(self):
        rows = parse_multiline(SAMPLE)
        ids = {r["record_id"] for r in rows}
        assert ids == {"P1", "C1", "C2", "S1"}
        p1 = [r for r in rows if r["record_id"] == "P1"]
        assert {(r["field"], r["value"]) for r in p1} == {
            ("0010", "REC-P1"), ("0331", "Die Super-Serie"),
        }

    def test_subfield_and_occurrence(self):
        rows = parse_multiline("0000:R\n0100.a:x\n0100.b:y\n0100.a:z\n9999:e")
        got = [(r["field"], r["subfield"], r["occurrence"], r["value"]) for r in rows]
        assert got == [
            ("0100", "a", 0, "x"), ("0100", "b", 0, "y"), ("0100", "a", 1, "z"),
        ]

    def test_lines_outside_records_skipped(self):
        rows = parse_multiline("junk:1\n0000:R\n0010:v\n9999:e\ntail:2")
        assert [(r["record_id"], r["field"]) for r in rows] == [("R", "0010")]

    def test_decode_batch(self):
        tbl = pa.table({"blob": pa.array([SAMPLE, ""], pa.string())})
        out = decode_batch(tbl)
        assert out.num_rows == len(parse_multiline(SAMPLE))


def test_super_stitch(ray_session):
    import ray.data as rd

    from limetrans_ray.pipelines.sisis import stitch_parent_child

    tbl = pa.table({"blob": pa.array([SAMPLE], pa.string())})
    rows = rd.from_arrow(tbl).map_batches(decode_batch, batch_format="pyarrow")
    out = (
        stitch_parent_child(rows, num_partitions=2)
        .to_pandas()
        .sort_values("record_id")
        .reset_index(drop=True)
    )
    # C1+C2 stitched to P1; S1 excluded (it is itself a superwork)
    assert out["record_id"].tolist() == ["C1", "C2"]
    assert out["parent_title"].tolist() == ["Die Super-Serie"] * 2
    assert out["super_record_id"].tolist() == ["(DE-605)REC-P1"] * 2
    assert out["title"].tolist() == ["Band Eins", "Band Zwei"]


def test_supplement_map(ray_session):
    """SisisSupplement: id field -> joined value occurrences."""
    import ray.data as rd

    from limetrans_ray.pipelines.sisis import supplement_map

    text = (
        "0000:R1\n0010:ID-1\n0331:Titel Eins\n0331:Titel Zwei\n9999:e\n"
        "0000:R2\n0010:ID-2\n0331:Solo\n9999:e\n"
        "0000:R3\n0010:ID-3\n9999:e\n"
    )
    rows = rd.from_arrow(
        pa.table({"blob": pa.array([text], pa.string())})
    ).map_batches(decode_batch, batch_format="pyarrow")
    m = supplement_map(rows)
    assert m == {"ID-1": "Titel Eins ; Titel Zwei", "ID-2": "Solo"}
