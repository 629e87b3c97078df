"""MARC-XML decode conformance: namespace tolerance (MARC21 slim vs
ALMAXML's bare elements — reference FileQueue.java:42-50), id from
controlfield 001, indicator-qualified datafield names, subfield rows,
occurrence numbering, and the Ray map_batches explode."""

import pyarrow as pa

from limetrans_ray.functions.marcxml import decode_batch, parse_marcxml

NS = 'xmlns="http://www.loc.gov/MARC21/slim"'
RECORD = """
<record {ns}>
  <leader>00000nam a2200000 c 4500</leader>
  <controlfield tag="001">HT012345</controlfield>
  <controlfield tag="008">210101s2021</controlfield>
  <datafield tag="245" ind1="1" ind2="0">
    <subfield code="a">Der Holzbau-Atlas</subfield>
    <subfield code="b">ein Handbuch</subfield>
  </datafield>
  <datafield tag="700" ind1=" " ind2=" ">
    <subfield code="a">Person, One</subfield>
  </datafield>
  <datafield tag="700" ind1=" " ind2=" ">
    <subfield code="a">Person, Two</subfield>
  </datafield>
</record>
"""


def _rows(ns=""):
    return parse_marcxml(RECORD.format(ns=ns))


def test_record_id_from_001():
    rows = _rows()
    assert all(r["record_id"] == "HT012345" for r in rows)


def test_leader_control_and_datafields():
    rows = _rows()
    by = {(r["field"], r["subfield"], r["occurrence"]): r["value"] for r in rows}
    assert by[("leader", None, 0)].startswith("00000nam")
    assert by[("001", None, 0)] == "HT012345"
    assert by[("008", None, 0)] == "210101s2021"
    assert by[("24510", "a", 0)] == "Der Holzbau-Atlas"
    assert by[("24510", "b", 0)] == "ein Handbuch"
    # repeated 700 fields number their occurrences in document order
    assert by[("700  ", "a", 0)] == "Person, One"
    assert by[("700  ", "a", 1)] == "Person, Two"


def test_namespace_tolerant():
    assert _rows() == _rows(ns=NS)  # bare (ALMAXML) == MARC21 slim


def test_collection_wrapper_and_missing_001():
    xml = (
        "<collection><record><controlfield tag='001'>A</controlfield>"
        "</record><record><datafield tag='100' ind1=' ' ind2=' '>"
        "<subfield code='a'>x</subfield></datafield></record></collection>"
    )
    rows = parse_marcxml(xml)
    assert {r["record_id"] for r in rows} == {"A", "record-1"}


def test_decode_batch_explodes(ray_session):
    import ray.data as rd

    blobs = [RECORD.format(ns=""), RECORD.format(ns=NS), None]
    ds = rd.from_arrow(pa.table({"xml": pa.array(blobs, pa.string())}))
    out = ds.map_batches(decode_batch, batch_format="pyarrow").to_pandas()
    assert len(out) == 2 * len(parse_marcxml(RECORD.format(ns="")))
    assert set(out["record_id"]) == {"HT012345"}


def test_binary_blob_column():
    tbl = pa.table({"xml": pa.array([RECORD.format(ns="").encode()], pa.binary())})
    out = decode_batch(tbl)
    assert out.num_rows == len(parse_marcxml(RECORD.format(ns="")))


def test_idless_records_across_blobs_never_collide():
    """Fallback ids are namespaced per blob (content hash): two id-less
    records in different blobs must not merge downstream."""
    a = "<record><datafield tag='100' ind1=' ' ind2=' '><subfield code='a'>Alice</subfield></datafield></record>"
    b = "<record><datafield tag='100' ind1=' ' ind2=' '><subfield code='a'>Bob</subfield></datafield></record>"
    tbl = pa.table({"xml": pa.array([a, b], pa.string())})
    out = decode_batch(tbl).to_pylist()
    assert len({r["record_id"] for r in out}) == 2
