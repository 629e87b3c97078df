"""The reference's OWN transformation golden suites, end-to-end.

TransformationTestRunner.java:21-60 derives each suite's rule file from
the directory name under test/resources/transformation/<name>/ and runs
input MARC-XML through the stream pipe, comparing pretty-printed JSON
records against reference.{fix,xml}/. pipelines/goldens.py re-runs the
same fixtures through this engine (parse_marcxml → compile → apply_ops
→ nest) and compares structurally.

Pinned here: DE-708-deposit is EXACT under BOTH engines — 12/12
records structurally equal, leaf agreement 1.0 (Metamorph since round
5 start; Metafix after in-place loop merges, nested-loop entity
destinations, entity-level uniq, @arr.N index selectors, element-rank
standard_number sources, and the NUL-safe hash keys).
"""

import os

import pandas as pd
import pytest

from limetrans_ray.functions.recordops import apply_ops

SUITES = "/root/reference/main/src/test/resources/transformation"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SUITES), reason="reference golden suites not mounted"
)


def test_de708_xml_exact():
    from limetrans_ray.pipelines.goldens import run_suite

    r = run_suite("DE-708-deposit", engine="xml")
    assert r["records"] == 12
    assert r["equal_records"] == 12, r["per_record"]
    assert r["leaf_agreement"] == 1.0


def test_de708_fix_exact():
    from limetrans_ray.pipelines.goldens import run_suite

    r = run_suite("DE-708-deposit", engine="fix")
    assert r["records"] == 12
    assert r["equal_records"] == 12, [
        p for p in r["per_record"] if not p["equal"]
    ]
    assert r["leaf_agreement"] == 1.0


def test_real_morph_collector_programs_compile():
    """The full production Metamorph programs — collectors, includes,
    macros, maps — compile to the stream op."""
    from limetrans_ray.functions.morphparser import compile_morph

    R = "/root/reference/main/src/main/resources/transformation"
    ops = compile_morph(
        open(os.path.join(R, "DE-2382.xml"), encoding="utf-8").read(),
        base_dir=R,
    )
    assert [n for n, _kw in ops] == ["morph_stream"]


@pytest.mark.parametrize(
    "suite,n",
    [("DE-2382", 39), ("DE-2524", 11), ("DE-380", 22), ("DE-836", 3349)],
)
def test_collector_suites_exact(suite, n):
    """EVERY reference transformation golden suite reproduces exactly
    under the Metamorph stream engine — 3421 records across the four
    collector suites (plus DE-708-deposit's 12 pinned above)."""
    from limetrans_ray.pipelines.goldens import run_suite

    r = run_suite(suite, engine="xml")
    assert r["records"] == n
    assert r["equal_records"] == n, [
        p["index"] for p in r["per_record"] if not p["equal"]
    ][:10]
    assert r["leaf_agreement"] == 1.0


def _rows(*tuples):
    return pd.DataFrame(
        tuples,
        columns=["record_id", "field", "subfield", "occurrence", "value"],
    )


def test_take_occurrence_per_record():
    df = _rows(
        ("r1", "650", "a", 0, "x"),
        ("r1", "650", "a", 1, "y"),
        ("r1", "650", "a", 2, "z"),
        ("r2", "650", "a", 0, "q"),
    )
    out = apply_ops(df, [("take_occurrence", {"field": "650", "subfield": "a", "n": 2})])
    assert sorted(out["value"]) == ["y"]


def test_take_occurrence_same_entity():
    # two entities (occurrence 0 and 1), two 'a' rows each: only=1
    # sameEntity keeps the FIRST per entity
    df = _rows(
        ("r1", "689", "a", 0, "a0-first"),
        ("r1", "689", "a", 0, "a0-second"),
        ("r1", "689", "a", 1, "a1-first"),
        ("r1", "689", "a", 1, "a1-second"),
    )
    out = apply_ops(
        df,
        [("take_occurrence", {"field": "689", "subfield": "a", "n": 1,
                              "same_entity": True})],
    )
    assert sorted(out["value"]) == ["a0-first", "a1-first"]


def test_unique_values():
    df = _rows(
        ("r1", "041", "a", 0, "ger"),
        ("r1", "041", "a", 1, "ger"),
        ("r1", "041", "a", 2, "eng"),
        ("r2", "041", "a", 0, "ger"),
    )
    out = apply_ops(df, [("unique_values", {"field": "041", "subfield": "a"})])
    assert sorted(out["value"]) == ["eng", "ger", "ger"]


def test_morph_substring_occurrence_unique_split():
    from limetrans_ray.functions.morphparser import compile_morph

    xml = """<metamorph xmlns="http://www.culturegraph.org/metamorph" version="1">
      <rules>
        <data source="leader" name="pos6"><substring start="6" end="7"/></data>
        <data source="650.a" name="firstsub"><occurrence only="1"/></data>
        <data source="041.a" name="lang"><unique/></data>
        <data source="260.c" name="year"><split delimiter="[,-]"/><unique/></data>
      </rules>
    </metamorph>"""
    ops = compile_morph(xml)
    df = _rows(
        ("r1", "leader", None, 0, "01234cam a22"),
        ("r1", "650", "a", 0, "Alpha"),
        ("r1", "650", "a", 1, "Beta"),
        ("r1", "041", "a", 0, "ger"),
        ("r1", "041", "a", 1, "ger"),
        ("r1", "260", "c", 0, "1999,1999-2001"),
    )
    out = apply_ops(df, ops)
    got = dict(
        out.groupby("field")["value"].apply(lambda s: sorted(s))
    )
    assert got["pos6"] == ["a"]
    assert got["firstsub"] == ["Alpha"]
    assert got["lang"] == ["ger"]
    assert got["year"] == ["1999", "2001"]


def test_all_production_morph_programs_compile():
    """Every .xml rule program the reference ships — including the
    149-rule alma.xml flagship with its job vars (Limetrans.java:
    290-400 var setup, missing external maps as empty per the
    missing_maps conformance mode) — compiles through the loader."""
    from limetrans_ray.functions.morphparser import compile_morph

    R = "/root/reference/main/src/main/resources/transformation"
    alma_vars = {
        "member": "49HBZ_TEST", "isil": "DE-605", "catalogid": "DE-605",
        "institution-code": "6441", "network": "49HBZ", "sigel": "605",
        "id-suffix": "", "external-maps": "./maps",
        "regexp.description": ".*", "regexp.isil": "DE-605",
        "deletion-enabled": "false", "deletion-literal": "DEL",
        "deletion-source": "DEL", "deletion-value": "Y",
        "isil-path": ".",
    }
    for name, vars in (
        ("alma", alma_vars),
        ("DE-107-ebooks", {"isil": "DE-107"}),
        ("DE-69", {}),
        ("DE-709", {}),
        ("DE-2382", {}),
        ("DE-2524", {}),
        ("DE-380", {}),
        ("DE-836", {}),
        ("DE-708-deposit", {}),
    ):
        ops = compile_morph(
            open(os.path.join(R, name + ".xml"), encoding="utf-8").read(),
            base_dir=R,
            vars=dict(vars),
            missing_maps="empty",
        )
        assert ops, name


def test_alma_107_fixture():
    """The reference's FLAGSHIP fixture (Alma107TransformationTest):
    alma.xml.gz through the production alma.fix with the DE-107 job
    config — ALL 23 records structurally exact (leaf agreement 1.0),
    per-branch container shapes carried by runtime entity markers."""
    from limetrans_ray.pipelines.goldens import run_alma_fixture

    r = run_alma_fixture("107")
    assert r["records"] == 23
    assert r["equal_records"] == 23, [
        p["index"] for p in r["per_record"] if not p["equal"]
    ]
    assert r["leaf_agreement"] == 1.0


def test_alma_a96_fixture_floor():
    """The 530-record DE-A96 fixture (no deletion-literal: the
    noDeletionFilter excludes deletions, suppressed records reject()
    inside the rules). Floor stops regressions while the remaining
    records are ground down."""
    from limetrans_ray.pipelines.goldens import run_alma_fixture

    r = run_alma_fixture("a96")
    assert r["equal_records"] >= 480, r["equal_records"]
    assert r["leaf_agreement"] >= 0.93
