"""Metafix-analogue record ops: hand-written expectations in the
reference's transformation-test spirit (event-stream in → expected
record out — reference test/TransformationTestCase.java), over the
flat-row model, plus the Ray map_batches composition with the MARC-XML
decoder."""

import pandas as pd
import pyarrow as pa
import pytest

from limetrans_ray.functions.multiline import ROW_SCHEMA
from limetrans_ray.functions.recordops import RecordOps, apply_ops


def _rows(*tuples):
    return pd.DataFrame(
        tuples, columns=["record_id", "field", "subfield", "occurrence", "value"]
    )


BASE = _rows(
    ("r1", "001", None, 0, "(DE-605)HT001"),
    ("r1", "245", "a", 0, "Der Holzbau-Atlas"),
    ("r1", "041", None, 0, "ger"),
    ("r1", "700", "a", 0, "Person, One"),
    ("r1", "700", "a", 1, "Person, One"),
    ("r2", "001", None, 0, "(DE-605)HT002"),
    ("r2", "245", "a", 0, "Payment Systems"),
    ("r2", "041", None, 0, "eng"),
)


def _as_map(df):
    return {
        (r.record_id, r.field, r.subfield, r.occurrence): r.value
        for r in df.itertuples()
    }


def test_copy_move_remove_add():
    out = apply_ops(
        BASE.copy(),
        [
            ("copy_field", {"src": "245", "dst": "title"}),
            ("move_field", {"src": "041", "dst": "language"}),
            ("remove_field", {"field": "700"}),
            ("add_field", {"field": "collection", "value": "testset"}),
        ],
    )
    m = _as_map(out)
    assert m[("r1", "title", "a", 0)] == "Der Holzbau-Atlas"
    assert m[("r1", "245", "a", 0)] == "Der Holzbau-Atlas"  # copy keeps src
    assert m[("r1", "language", None, 0)] == "ger"
    assert ("r1", "700", "a", 0) not in m
    assert m[("r1", "collection", None, 0)] == "testset"
    assert m[("r2", "collection", None, 0)] == "testset"


def test_replace_all_strips_prefix():
    # the alma.fix idiom: strip "(DE-605)" prefixes (alma.fix:224-244)
    out = apply_ops(
        BASE.copy(),
        [("replace_all", {"field": "001", "pattern": r"^\(DE-605\)", "replacement": ""})],
    )
    m = _as_map(out)
    assert m[("r1", "001", None, 0)] == "HT001"
    assert m[("r2", "001", None, 0)] == "HT002"


def test_lookup_policies():
    table = {"ger": "German", "fre": "French"}
    keep = apply_ops(BASE.copy(), [("lookup", {"field": "041", "table": table})])
    assert _as_map(keep)[("r1", "041", None, 0)] == "German"
    assert _as_map(keep)[("r2", "041", None, 0)] == "eng"  # miss keeps value
    dflt = apply_ops(
        BASE.copy(), [("lookup", {"field": "041", "table": table, "default": "und"})]
    )
    assert _as_map(dflt)[("r2", "041", None, 0)] == "und"
    dele = apply_ops(
        BASE.copy(), [("lookup", {"field": "041", "table": table, "delete": True})]
    )
    m = _as_map(dele)
    assert m[("r1", "041", None, 0)] == "German"
    assert ("r2", "041", None, 0) not in m  # miss row dropped


def test_paste_and_uniq_and_occurrence_renumber():
    out = apply_ops(
        BASE.copy(),
        [
            ("uniq", {"field": "700"}),
            ("paste", {"dst": "display", "srcs": ["245", "041"], "join_char": " / "}),
        ],
    )
    m = _as_map(out)
    assert m[("r1", "display", None, 0)] == "Der Holzbau-Atlas / ger"
    assert m[("r2", "display", None, 0)] == "Payment Systems / eng"
    # the duplicate 700 row is gone and occurrences renumbered densely
    assert ("r1", "700", "a", 1) not in m
    assert m[("r1", "700", "a", 0)] == "Person, One"


def test_retain_and_reject():
    out = apply_ops(
        BASE.copy(),
        [
            ("reject_if", {"field": "041", "pattern": "^eng$"}),
            ("retain", {"fields": ["001", "245"]}),
        ],
    )
    assert set(out["record_id"]) == {"r1"}
    assert set(out["field"]) == {"001", "245"}


def test_unknown_op_rejected():
    with pytest.raises(ValueError, match="unknown record op"):
        RecordOps([("frobnicate", {})])
    with pytest.raises(ValueError):
        apply_ops(BASE.copy(), [("nope", {})])


def test_ray_composition_with_marcxml(ray_session):
    """decode_batch → RecordOps in one map_batches chain (whole records
    per batch — the documented partitioning assumption)."""
    import ray.data as rd

    from limetrans_ray.functions.marcxml import decode_batch

    xml = (
        "<record><controlfield tag='001'>(DE-605)X1</controlfield>"
        "<datafield tag='245' ind1='1' ind2='0'>"
        "<subfield code='a'>Ein Titel</subfield></datafield></record>"
    )
    ds = rd.from_arrow(pa.table({"xml": pa.array([xml], pa.string())}))
    ops = RecordOps(
        [
            ("replace_all", {"field": "001", "pattern": r"^\(DE-605\)", "replacement": ""}),
            ("copy_field", {"src": "24510", "dst": "title"}),
            ("retain", {"fields": ["001", "title"]}),
        ]
    )
    out = (
        ds.map_batches(decode_batch, batch_format="pyarrow")
        .map_batches(ops, batch_format="pyarrow")
        .to_pandas()
    )
    m = _as_map(out)
    # record_id keeps the decoder's original 001 (the idKey is assigned
    # at decode time, like RecordIdChanger before the transform); the
    # FIELD value is what replace_all rewrote
    assert m[("(DE-605)X1", "001", None, 0)] == "X1"
    assert m[("(DE-605)X1", "title", "a", 0)] == "Ein Titel"
    assert set(out["field"]) == {"001", "title"}


def test_add_array_and_add_hash():
    # the alma.fix:57-68 idiom: add_array creates the container (a no-op
    # in the flat-row model until values exist), repeated add_hash
    # appends hash elements distinguished by occurrence number
    out = apply_ops(
        BASE.copy(),
        [
            ("add_array", {"field": "keywords", "values": ["wood", "atlas"]}),
            ("add_array", {"field": "empty", "values": []}),
            ("add_hash", {"field": "freq", "entries": {"interval": "weekly", "since": "1990"}}),
            ("add_hash", {"field": "freq", "entries": {"interval": "monthly", "since": "2001"}}),
        ],
    )
    m = _as_map(out)
    assert m[("r1", "keywords", None, 0)] == "wood"
    assert m[("r1", "keywords", None, 1)] == "atlas"
    assert m[("r2", "keywords", None, 0)] == "wood"
    assert "empty" not in set(out["field"])
    # element 0 and element 1 of the hash array, per record
    assert m[("r1", "freq", "interval", 0)] == "weekly"
    assert m[("r1", "freq", "since", 0)] == "1990"
    assert m[("r1", "freq", "interval", 1)] == "monthly"
    assert m[("r2", "freq", "since", 1)] == "2001"


def test_vacuum_drops_empty_values():
    base = pd.concat(
        [BASE, _rows(("r1", "999", None, 0, ""), ("r2", "999", None, 0, None))],
        ignore_index=True,
    )
    out = apply_ops(base, [("vacuum", {})])
    assert "999" not in set(out["field"])
    assert len(out) == len(BASE)


def test_parse_text_named_groups():
    # the alma.fix:1090 linkage idiom: named groups become fields,
    # matched source rows are consumed, optional groups may be absent
    base = _rows(
        ("r1", "@linkage", None, 0, "100-01/r"),
        ("r2", "@linkage", None, 0, "245-02"),
        ("r3", "@linkage", None, 0, "not a linkage"),
    )
    out = apply_ops(
        base,
        [("parse_text", {
            "field": "@linkage",
            "pattern": r"^(?P<tag>\d{3})-(?P<occ>\d{2})(?:/(?P<script>.*))?$",
        })],
    )
    m = _as_map(out)
    assert m[("r1", "tag", None, 0)] == "100"
    assert m[("r1", "occ", None, 0)] == "01"
    assert m[("r1", "script", None, 0)] == "r"
    assert m[("r2", "tag", None, 0)] == "245"
    assert ("r2", "script", None, 0) not in m  # optional group absent
    # matched rows consumed; the unmatched record keeps its source row
    assert ("r1", "@linkage", None, 0) not in m
    assert m[("r3", "@linkage", None, 0)] == "not a linkage"


def test_parse_text_requires_capture_groups():
    with pytest.raises(ValueError, match="capture groups"):
        RecordOps([("parse_text", {"field": "x", "pattern": r"\d+"})])


def test_parse_text_plain_groups_replace_value():
    # Metafix ParseText without named groups: the value becomes the
    # array of plain captures (macros/alma.fix:24 last-4-chars idiom)
    out = apply_ops(
        _rows(
            ("r1", "x", None, 0, "990012345670006449"),
            ("r2", "x", None, 0, "abc"),  # no match → row kept as-is
        ),
        [("parse_text", {"field": "x", "pattern": r".*(.{4})$"})],
    )
    assert _as_map(out) == {
        ("r1", "x", None, 0): "6449",
        ("r2", "x", None, 0): "abc",
    }


def test_do_list_scopes_sub_program():
    # do list(path): sub-ops touch only the iterated field's rows
    out = apply_ops(
        BASE.copy(),
        [
            ("do_list", {
                "field": "700",
                "ops": [
                    ("uniq", {"field": "700"}),
                    ("replace_all", {"field": "700", "pattern": ", ", "replacement": "|"}),
                ],
            }),
        ],
    )
    m = _as_map(out)
    assert m[("r1", "700", "a", 0)] == "Person|One"
    assert ("r1", "700", "a", 1) not in m  # uniq ran inside the scope
    assert m[("r1", "245", "a", 0)] == "Der Holzbau-Atlas"  # untouched
    # sub-program validation happens at compile time too
    with pytest.raises(ValueError, match="unknown record op"):
        RecordOps([("do_list", {"field": "x", "ops": [("bogus", {})]})])


def test_scalar_ops():
    out = apply_ops(
        BASE.copy(),
        [
            ("prepend", {"field": "001", "value": "id:"}),
            ("append", {"field": "041", "value": "-lang"}),
            ("substring", {"field": "245", "start": 4, "length": 7}),
            ("upcase", {"field": "700"}),
        ],
    )
    m = _as_map(out)
    assert m[("r1", "001", None, 0)] == "id:(DE-605)HT001"
    assert m[("r1", "041", None, 0)] == "ger-lang"
    assert m[("r1", "245", "a", 0)] == "Holzbau"
    assert m[("r1", "700", "a", 0)] == "PERSON, ONE"
    t = apply_ops(
        _rows(("r1", "x", None, 0, "  pad  "), ("r1", "y", None, 0, "AbC")),
        [("trim", {"field": "x"}), ("downcase", {"field": "y"}),
         ("substring", {"field": "y", "start": 1})],
    )
    m = _as_map(t)
    assert m[("r1", "x", None, 0)] == "pad"
    assert m[("r1", "y", None, 0)] == "bc"


def test_drop_local_entity_semantics():
    """DropLocal.java:19-58 (alma.fix:23): a field occurrence whose
    subfield 9 is LOCAL (or matches [A-Z]:[0-9]+[a-z]?) AND whose
    subfield M names ANOTHER member is dropped; owned-by-us, no-9,
    no-M and non-matching-9 entities all survive."""
    rows = _rows(
        # local marker + other member -> dropped
        ("r1", "940", "a", 0, "note-a"),
        ("r1", "940", "9", 0, "LOCAL"),
        ("r1", "940", "M", 0, "DE-OTHER"),
        # local marker + OUR member -> kept (DropLocal: only != member drops)
        ("r1", "940", "a", 1, "note-b"),
        ("r1", "940", "9", 1, "A:123a"),
        ("r1", "940", "M", 1, "DE-605"),
        # local marker, no M at all -> kept (memberField == null)
        ("r1", "941", "9", 0, "LOCAL"),
        ("r1", "941", "a", 0, "note-c"),
        # 9 doesn't match the predicate -> kept even with foreign M
        ("r1", "942", "9", 0, "X:12B"),  # lowercase-suffix rule: B fails
        ("r1", "942", "M", 0, "DE-OTHER"),
        # unrelated field
        ("r1", "245", "a", 0, "Title"),
    )
    out = apply_ops(rows, [("drop_local", {"member": "DE-605"})])
    m = _as_map(out)
    assert ("r1", "940", "a", 0) in m and m[("r1", "940", "a", 0)] == "note-b"
    assert len(out[out["field"] == "940"]) == 3  # only the kept entity
    assert ("r1", "941", "a", 0) in m
    assert ("r1", "942", "9", 0) in m
    assert ("r1", "245", "a", 0) in m


def test_drop_local_regex_full_match_only():
    """The [A-Z]:[0-9]+[a-z]? pattern is a FULL match
    (Matcher.matches(), DropLocal.java:23-25) — a superstring value
    must not count as local."""
    rows = _rows(
        ("r1", "940", "9", 0, "A:123abc"),  # trailing junk -> not local
        ("r1", "940", "M", 0, "DE-OTHER"),
    )
    out = apply_ops(rows, [("drop_local", {"member": "DE-605"})])
    assert len(out) == 2


def test_drop_repeated_keeps_nth_occurrence():
    """DropRepeated.java:13-32 (alma.fix:24): a repeated field collapses
    to its index-th element (1-based, default 1); single-occurrence
    fields are untouched (the ifArray guard)."""
    rows = _rows(
        ("r1", "700", "a", 0, "First, Person"),
        ("r1", "700", "a", 1, "Second, Person"),
        ("r1", "700", "a", 2, "Third, Person"),
        ("r1", "245", "a", 0, "only"),
        ("r2", "700", "a", 0, "Solo, Person"),
    )
    out = apply_ops(rows, [("drop_repeated", {"field": "700"})])
    m = _as_map(out)
    assert m[("r1", "700", "a", 0)] == "First, Person"
    assert len(out[(out["record_id"] == "r1") & (out["field"] == "700")]) == 1
    assert m[("r2", "700", "a", 0)] == "Solo, Person"  # untouched
    out2 = apply_ops(rows, [("drop_repeated", {"field": "700", "index": 2})])
    m2 = _as_map(out2)
    assert m2[("r1", "700", "a", 0)] == "Second, Person"


def test_if_member_local_scopes_subprogram():
    """MemberLocal.java:15-35 (alma.fix:412,646): the guarded sub-ops
    run when field.M is absent OR any field.M equals the member var;
    records failing the predicate pass through unchanged."""
    rows = _rows(
        # r1: M == member -> predicate true
        ("r1", "940", "M", 0, "DE-605"),
        ("r1", "940", "a", 0, "x"),
        # r2: M exists, != member -> predicate false
        ("r2", "940", "M", 0, "DE-OTHER"),
        ("r2", "940", "a", 0, "x"),
        # r3: no M at all -> predicate true (Exists false branch)
        ("r3", "245", "a", 0, "x"),
    )
    out = apply_ops(
        rows,
        [("if_member_local", {
            "field": "940", "member": "DE-605",
            "ops": [("add_field", {"field": "flag", "value": "local"})],
        })],
    )
    flagged = set(out.loc[out["field"] == "flag", "record_id"])
    assert flagged == {"r1", "r3"}


def test_drop_local_through_recordops_class():
    """The new ops compile + validate through RecordOps (map_batches
    form) like every other op."""
    stage = RecordOps([
        ("drop_local", {"member": "DE-605"}),
        ("drop_repeated", {"field": "700", "index": 1}),
    ])
    tbl = pa.Table.from_pandas(
        _rows(
            ("r1", "940", "9", 0, "LOCAL"),
            ("r1", "940", "M", 0, "DE-X"),
            ("r1", "700", "a", 0, "A"),
            ("r1", "700", "a", 1, "B"),
        ),
        schema=ROW_SCHEMA, preserve_index=False,
    )
    out = stage(tbl).to_pandas()
    assert set(out["field"]) == {"700"}
    assert out["value"].tolist() == ["A"]
    with pytest.raises(ValueError):
        RecordOps([("if_member_local", {"field": "f", "member": "m",
                                        "ops": [("nope", {})]})])


def test_verify_links_annotations():
    """VerifyLinks.java:112-197 contract: every source value of an
    entry entity gets a verifying<Suffix> row; values in the key set
    and not in the skip set also a verified<Suffix> row."""
    df = _rows(
        ("r1", "HostItemEntry", "identifierForLinkingEntry", 0, "HT001"),
        ("r1", "HostItemEntry", "identifierForLinkingEntry", 1, "HT002"),
        ("r1", "PrecedingEntry", "identifierForLinkingEntry", 0, "HT003"),
        ("r1", "Other", "x", 0, "HT001"),
        ("r2", "HostItemEntry", "identifierForLinkingEntry", 0, "HTSKIP"),
    )
    out = apply_ops(
        df,
        [
            (
                "verify_links",
                {
                    "entries": ["HostItemEntry", "PrecedingEntry"],
                    "source": "identifierForLinkingEntry",
                    "suffix": "IdentifierForLinkingEntry",
                    "keys": {"HT001", "HT003", "HTSKIP"},
                    "skip": {"HTSKIP"},
                },
            )
        ],
    )
    ver = out[out["subfield"] == "verifyingIdentifierForLinkingEntry"]
    assert sorted(zip(ver["record_id"], ver["field"], ver["value"])) == [
        ("r1", "HostItemEntry", "HT001"),
        ("r1", "HostItemEntry", "HT002"),
        ("r1", "PrecedingEntry", "HT003"),
        ("r2", "HostItemEntry", "HTSKIP"),
    ]
    ok = out[out["subfield"] == "verifiedIdentifierForLinkingEntry"]
    assert sorted(zip(ok["record_id"], ok["field"], ok["value"])) == [
        ("r1", "HostItemEntry", "HT001"),
        ("r1", "PrecedingEntry", "HT003"),
    ]


def test_verify_links_record_source_super():
    """The SUPER form: record-level xbib.uid values tested against the
    superid set, annotations attached to each RecordIdentifier entity
    (VerifyLinks.java SUPER_SOURCE/SUPER_MAP)."""
    df = _rows(
        ("r1", "xbib", "uid", 0, "S1"),
        ("r1", "xbib", "uid", 1, "S9"),
        ("r1", "RecordIdentifier", None, 0, "rec-1"),
        ("r2", "xbib", "uid", 0, "S2"),
        ("r2", "RecordIdentifier", None, 0, "rec-2"),
    )
    out = apply_ops(
        df,
        [
            (
                "verify_links",
                {
                    "entries": ["RecordIdentifier"],
                    "record_source": "xbib",
                    "record_source_sub": "uid",
                    "suffix": "SuperIdentifier",
                    "keys": {"S1"},
                },
            )
        ],
    )
    ver = out[out["subfield"] == "verifyingSuperIdentifier"]
    assert sorted(zip(ver["record_id"], ver["value"])) == [
        ("r1", "S1"), ("r1", "S9"), ("r2", "S2"),
    ]
    ok = out[out["subfield"] == "verifiedSuperIdentifier"]
    assert list(zip(ok["record_id"], ok["field"], ok["value"])) == [
        ("r1", "RecordIdentifier", "S1")
    ]


def test_verify_links_counters(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from limetrans_ray.functions.recordops import verify_links_counters

    df = _rows(
        ("r1", "HostItemEntry", "identifierForLinkingEntry", 0, "HT001"),
        ("r1", "PrecedingEntry", "identifierForLinkingEntry", 0, "HT001"),
        ("r2", "HostItemEntry", "identifierForLinkingEntry", 0, "nope"),
    )
    out = apply_ops(
        df,
        [
            (
                "verify_links",
                {
                    "entries": ["HostItemEntry", "PrecedingEntry"],
                    "source": "identifierForLinkingEntry",
                    "suffix": "Id",
                    "keys": {"HT001"},
                },
            )
        ],
    )
    ds = rd.from_arrow(pa.Table.from_pandas(out, preserve_index=False))
    counters = verify_links_counters(ds, "Id")
    assert list(zip(counters["field"], counters["n_verified"])) == [
        ("HostItemEntry", 1), ("PrecedingEntry", 1),
    ]
