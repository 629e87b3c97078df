"""StandardNumber conformance (the reference's StandardNumberTest /
ISBNTest analogue — reference main/src/test/java/hbz/limetrans/
function/StandardNumberTest.java): checksum validation, 10↔13
conversion, hyphenation via the range table, preferred/variant
contract."""

import pytest

from limetrans_ray.functions.standardnum import (
    IsbnRangeTable,
    isbn10_is_valid,
    isbn10_to13,
    isbn13_is_valid,
    isbn13_to10,
    normalize_zdb,
    standard_number,
)


class TestChecksums:
    def test_isbn10(self):
        assert isbn10_is_valid("0306406152")        # canonical example
        assert isbn10_is_valid("316148410X")
        assert not isbn10_is_valid("0306406153")
        assert not isbn10_is_valid("030640615")

    def test_isbn13(self):
        assert isbn13_is_valid("9780306406157")
        assert isbn13_is_valid("9783161484100")
        assert not isbn13_is_valid("9780306406151")

    def test_conversion_roundtrip(self):
        assert isbn10_to13("0306406152") == "9780306406157"
        assert isbn13_to10("9780306406157") == "0306406152"
        assert isbn10_to13("316148410X") == "9783161484100"
        assert isbn13_to10("9783161484100") == "316148410X"
        assert isbn13_to10("9790000000000") is None  # 979: no ISBN-10


class TestIsbn:
    def test_isbn10_input(self):
        out = standard_number("ISBN 0-306-40615-2 (pbk.)", "ISBN")
        assert out["preferred"] == "9780306406157"
        assert "978-0-306-40615-7" in out["variants"]
        assert "0306406152" in out["variants"]

    def test_isbn13_input(self):
        out = standard_number("9783161484100", "ISBN")
        assert out["preferred"] == "9783161484100"
        assert "978-3-16-148410-0" in out["variants"]
        assert "316148410X" in out["variants"]
        assert "3-16-148410-X" in out["variants"]

    def test_invalid_checksum_rejected(self):
        assert standard_number("0-306-40615-3", "ISBN") is None

    def test_no_number(self):
        assert standard_number("no digits here", "ISBN") is None

    def test_unknown_range_degrades_to_no_hyphenated_variant(self):
        # group 99xx not in the default subset table → hyphenation
        # silently absent, preferred/unhyphenated variants still emitted
        table = IsbnRangeTable([])
        out = standard_number("9783161484100", "ISBN", ranges=table)
        assert out["preferred"] == "9783161484100"
        assert all("-" not in v for v in out["variants"])


class TestIssnZdb:
    def test_issn(self):
        out = standard_number("ISSN 0378-5955", "ISSN")
        assert out["preferred"] == "03785955"
        # the hyphenated variant equal to nothing else survives; the
        # raw spelling itself is excluded only on exact match
        assert "0378-5955" in out["variants"]

    def test_issn_x_check(self):
        # construct: weights 8..2 over 2434561 → find X case
        out = standard_number("2434-561X", "ISSN")
        assert out is None or out["preferred"].endswith("X")

    def test_issn_invalid(self):
        assert standard_number("0378-5956", "ISSN") is None

    def test_zdb(self):
        out = standard_number("20704-4", "ZDB")
        assert out["preferred"] == "207044"
        assert normalize_zdb("20704-4") == "207044"

    def test_zdb_invalid(self):
        assert standard_number("20704-5", "ZDB") is None
        assert normalize_zdb("nope") is None


def test_batch_stage(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from limetrans_ray.stages.textstats import StandardNumberStage

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "raw": [
                    "ISBN 0-306-40615-2",
                    "ISBN 9783161484100",
                    "garbage 123",
                ],
            }
        )
    )
    out = (
        ds.map_batches(StandardNumberStage("ISBN", "raw"), batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["preferred_isbn"].tolist() == [
        "9780306406157", "9783161484100", None,
    ]
    assert "978-0-306-40615-7" in out["variant_isbn"].iloc[0]
