"""Formeta-style serialization round-trip (the reference's Formeta
writer / FORMETA decoder surface — Limetrans.java:536-549,
FileQueue.java:52-54 — over our flat-row record model)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from limetrans_ray.functions.formeta import (
    decode_formeta,
    encode_records,
)
from limetrans_ray.functions.multiline import parse_multiline

ROWS = [
    {"record_id": "R1", "field": "0010", "subfield": None, "occurrence": 0, "value": "REC-1"},
    {"record_id": "R1", "field": "0331", "subfield": None, "occurrence": 0, "value": "Ein Titel, mit: Sonderzeichen {und} 'Quotes'"},
    {"record_id": "R1", "field": "0100", "subfield": "a", "occurrence": 0, "value": "x y"},
    {"record_id": "R1", "field": "0100", "subfield": "b", "occurrence": 0, "value": "z\\w"},
    {"record_id": "R2", "field": "0010", "subfield": None, "occurrence": 0, "value": "REC-2"},
]


def test_round_trip_fixed():
    text = encode_records(ROWS)
    assert text.count("\n") == 1  # two records, one per line
    back = decode_formeta(text)
    assert back == ROWS


def test_decode_tolerates_whitespace():
    # only structural chars get spaced out (no specials in these rows)
    simple = [r for r in ROWS if r["record_id"] == "R2"]
    text = encode_records(simple).replace("{", " {\n ").replace(",", ", ")
    assert decode_formeta(text) == simple


def test_sisis_to_formeta_round_trip():
    """Decode a SISIS blob, serialize as Formeta, decode again —
    lossless across both record formats."""
    sisis = "0000:A\n0010:ID-A\n0100.a:v1\n0100.b:v2\n0331:T\n9999:e\n"
    rows = parse_multiline(sisis)
    assert decode_formeta(encode_records(rows)) == rows


name_st = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    min_size=1, max_size=12,
)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["R1", "R2"]),
            name_st,
            st.one_of(st.none(), name_st),
            name_st,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_round_trip_property(items):
    """Any value/name content (quotes, braces, backslashes, unicode)
    survives encode→decode; occurrence numbering is regenerated in
    stream order."""
    # build rows with consecutive-subfield grouping the encoder expects:
    # occurrences are assigned in order like the decoders do
    occ: dict = {}
    rows = []
    for rid, field, sub, value in items:
        key = (rid, field, sub)
        n = occ.get(key, 0)
        occ[key] = n + 1
        rows.append(
            {"record_id": rid, "field": field, "subfield": sub,
             "occurrence": n, "value": value}
        )
    # encoder groups CONSECUTIVE same-field subfield rows into one
    # entity; decode yields rows in serialized order with fresh
    # occurrence numbers — compare as multisets of (rid, field, sub,
    # value) with per-key counts
    back = decode_formeta(encode_records(rows))

    def key_multiset(rs):
        out: dict = {}
        for r in rs:
            k = (r["record_id"], r["field"], r["subfield"], r["value"])
            out[k] = out.get(k, 0) + 1
        return out

    assert key_multiset(back) == key_multiset(rows)


def test_repeated_subfield_groups_stay_distinct_entities():
    """person[0]{a,b} person[1]{a,b}: an occurrence change starts a new
    entity, so repeated subfielded groups round-trip as two entities
    instead of collapsing into one {a,b,a,b} blob."""
    rows = [
        {"record_id": "R1", "field": "0100", "subfield": "a",
         "occurrence": 0, "value": "p1a"},
        {"record_id": "R1", "field": "0100", "subfield": "b",
         "occurrence": 0, "value": "p1b"},
        {"record_id": "R1", "field": "0100", "subfield": "a",
         "occurrence": 1, "value": "p2a"},
        {"record_id": "R1", "field": "0100", "subfield": "b",
         "occurrence": 1, "value": "p2b"},
    ]
    enc = encode_records(rows)
    assert enc.count("0100{") == 2
    assert decode_formeta(enc) == rows
