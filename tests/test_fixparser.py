"""Metafix ``.fix`` parser/compiler tests.

Model: the reference's TransformationTestCase discipline (fix program +
input records → expected records, reference
main/src/test/java/hbz/limetrans/TransformationTest.java) — golden
fixtures built on the alma.fix:185-266 identifier-routing shape, plus
grammar/selector/map-loader unit coverage. No Ray needed: compiled
programs run through recordops.apply_ops directly (RecordOps wraps the
same function for map_batches).
"""

import textwrap

import pandas as pd
import pytest

from limetrans_ray.functions.fixparser import (
    FixCompileError,
    FixSyntaxError,
    _split_selector,
    compile_fix,
    load_filemap,
    load_fix_file,
    load_rdfmap,
    parse_fix,
)
from limetrans_ray.functions.recordops import RecordOps, apply_ops


def rows(*tuples):
    return pd.DataFrame(
        tuples, columns=["record_id", "field", "subfield", "occurrence", "value"]
    )


def got(df):
    """(record, field, subfield, occurrence, value) tuples, sorted."""
    return sorted(
        df[["record_id", "field", "subfield", "occurrence", "value"]]
        .fillna("")
        .itertuples(index=False, name=None)
    )


# ------------------------------------------------------------------ grammar

def test_parse_commands_comments_strings():
    ast = parse_fix(
        textwrap.dedent(
            """
            # line comment
            /* block
               comment */
            copy_field("a", "b")  // trailing comment style
            add_field("x", "hello \\"quoted\\" world")
            lookup("f", "map-name", delete: "true")
            """
        )
    )
    assert [s[1] for s in ast] == ["copy_field", "add_field", "lookup"]
    assert ast[1][2] == ["x", 'hello "quoted" world']
    assert ast[2][3] == {"delete": "true"}


def test_parse_if_elsif_else_and_do():
    ast = parse_fix(
        """
        do list(path: "035  .a", "var": "$i")
          if any_match("$i", "x.*")
            copy_field("$i", "X")
          elsif any_match("$i", "y.*")
            copy_field("$i", "Y")
          else
            copy_field("$i", "Z")
          end
        end
        """
    )
    assert ast[0][0] == "do"
    inner = ast[0][2]
    assert inner[0][0] == "if"
    branches, else_body = inner[0][1], inner[0][2]
    assert len(branches) == 2 and else_body is not None


def test_syntax_errors():
    with pytest.raises(FixSyntaxError):
        parse_fix('copy_field("a", "b"')  # unterminated args
    with pytest.raises(FixSyntaxError):
        parse_fix('do list(path: "x", "var": "$i")\ncopy_field("a","b")')  # no end


# ---------------------------------------------------------------- selectors

@pytest.mark.parametrize(
    "path,expected",
    [
        ("035  .a", ("035  ", "a")),
        ("348??", ("348??", None)),
        ("@hbzid", ("@hbzid", None)),
        ("IdentifierHBZ[].$append", ("IdentifierHBZ", None)),
        ("IdentifierHBZ[].$last.identifierHBZ", ("IdentifierHBZ", "identifierHBZ")),
        ("introx.music[]", ("introx.music", None)),
        ("RecordIdentifier.identifierForTheIndex",
         ("RecordIdentifier.identifierForTheIndex", None)),
        ("leader", ("leader", None)),
        ("008.0", ("008", "0")),
    ],
)
def test_split_selector(path, expected):
    assert _split_selector(path) == expected


# ----------------------------------------------------------------- compile

def test_compile_basic_program():
    ops = compile_fix(
        """
        copy_field("245??.a", "Title")
        remove_field("999")
        replace_all("Title", "\\\\s+$", "")
        """
    )
    assert ops[0] == (
        "copy_field",
        {"src": "245??", "src_sub": "a", "dst": "Title", "dst_sub": None},
    )
    assert ops[1] == ("remove_field", {"field": "999"})
    assert ops[2][1]["pattern"] == "\\s+$"


def test_compile_vars_and_undefined_var():
    ops = compile_fix(
        'add_field("x", "$[suffix]")', vars={"suffix": "049"}
    )
    assert ops[0][1]["value"] == "049"
    with pytest.raises(FixCompileError):
        compile_fix('add_field("x", "$[nope]")')


def test_compile_unknown_command_and_map():
    with pytest.raises(FixCompileError):
        compile_fix('frobnicate("x")')
    # Metafix resolves an undefined map to an EMPTY map (Metafacture
    # Maps.getMap default) rather than erroring — a lookup against it
    # with delete:"true" removes every value; warnings record it
    warnings = []
    ops = compile_fix(
        'lookup("f", "no-such-map", delete: "true")', warnings=warnings
    )
    assert ops[0][0] == "lookup" and ops[0][1]["table"] == {}
    assert any("no-such-map" in w for w in warnings)


def test_put_map_and_lookup_roundtrip():
    ops = compile_fix(
        """
        put_map("colors", "r": "red", "g": "green")
        lookup("c", "colors", default: "unknown")
        """
    )
    out = apply_ops(
        rows(("r1", "c", None, 0, "r"), ("r2", "c", None, 0, "x")), ops
    )
    assert got(out) == [("r1", "c", "", 0, "red"), ("r2", "c", "", 0, "unknown")]


def test_include_and_macro(tmp_path):
    (tmp_path / "inc.fix").write_text('add_field("from_include", "yes")\n')
    (tmp_path / "main.fix").write_text(
        """
        do put_macro("tag")
          add_field("tagged", "$[name]")
        end
        include("./inc.fix")
        call_macro("tag", name: "n1")
        call_macro("tag", name: "n2")
        """
    )
    ops = load_fix_file(str(tmp_path / "main.fix"))
    out = apply_ops(rows(("r1", "seed", None, 0, "s")), ops)
    vals = {(f, v) for _r, f, _s, _o, v in got(out)}
    assert ("from_include", "yes") in vals
    assert ("tagged", "n1") in vals and ("tagged", "n2") in vals


def test_include_cycle_detected(tmp_path):
    (tmp_path / "a.fix").write_text('include("./b.fix")\n')
    (tmp_path / "b.fix").write_text('include("./a.fix")\n')
    with pytest.raises(FixCompileError, match="cycle"):
        load_fix_file(str(tmp_path / "a.fix"))


def test_filemap_loader(tmp_path):
    import gzip

    p = tmp_path / "map.tsv.gz"
    with gzip.open(p, "wt") as fh:
        fh.write("HT001 0001-1\nHT002 0002-2\nbad\n")
    # reversed key/value columns like alma.fix:14 zdb-to-hbz
    table = load_filemap(str(p), sep_char=" ", key_column=1, value_column=0)
    assert table == {"0001-1": "HT001", "0002-2": "HT002"}


def test_rdfmap_loader(tmp_path):
    p = tmp_path / "m.ttl"
    p.write_text(
        textwrap.dedent(
            """
            @prefix skos: <http://www.w3.org/2004/02/skos/core#> .
            @prefix ex: <http://example.org/> .
            # a comment
            ex:n1 skos:prefLabel "Label One" .
            ex:n2 skos:prefLabel "Label Two"@de .
            ex:n3 skos:altLabel "Alt Only" .
            """
        )
    )
    table = load_rdfmap(str(p), target="skos:prefLabel")
    assert table == {
        "http://example.org/n1": "Label One",
        "http://example.org/n2": "Label Two",
    }


def test_put_rdfmap_fix_program_end_to_end(tmp_path):
    """put_rdfmap inside a fix TEXT program (the rdfmap_pipeline shape):
    ``;`` continuation predicates, target filtering, IRI objects, then
    prepend-to-IRI + lookup with default over hand rows."""
    p = tmp_path / "langs.ttl"
    p.write_text(
        textwrap.dedent(
            """
            @prefix ex: <http://example.org/> .
            @prefix skos: <http://www.w3.org/2004/02/skos/core#> .
            ex:de skos:prefLabel "German" ;
              skos:altLabel "Deutsch" .
            ex:en skos:prefLabel "English" .
            ex:zz skos:broader ex:root .
            """
        )
    )
    ops = compile_fix(
        f"""
        put_rdfmap("{p}", "langnames", target: "skos:prefLabel")
        prepend("lang", "http://example.org/")
        lookup("lang", "langnames", default: "Other")
        """
    )
    out = apply_ops(
        rows(
            ("r1", "lang", None, 0, "de"),
            ("r2", "lang", None, 0, "en"),
            ("r3", "lang", None, 0, "fr"),   # miss → default
            ("r4", "lang", None, 0, "zz"),   # wrong predicate → miss
        ),
        ops,
    )
    assert got(out) == [
        ("r1", "lang", "", 0, "German"),
        ("r2", "lang", "", 0, "English"),
        ("r3", "lang", "", 0, "Other"),
        ("r4", "lang", "", 0, "Other"),
    ]


def test_unless_exists():
    ops = compile_fix(
        """
        unless exists("id")
          add_field("id", "generated")
        end
        """
    )
    out = apply_ops(
        rows(("r1", "id", None, 0, "real"), ("r2", "x", None, 0, "v")), ops
    )
    t = got(out)
    assert ("r1", "id", "", 0, "real") in t
    assert ("r2", "id", "", 0, "generated") in t
    assert not any(r == "r1" and f == "id" and v == "generated" for r, f, _s, _o, v in t)


def test_reject_inside_if():
    ops = compile_fix(
        """
        if any_equal("status", "deleted")
          reject()
        end
        """
    )
    out = apply_ops(
        rows(
            ("r1", "status", None, 0, "deleted"),
            ("r1", "x", None, 0, "gone"),
            ("r2", "status", None, 0, "live"),
        ),
        ops,
    )
    assert set(out["record_id"]) == {"r2"}


# ------------------------------------------------ golden: identifier routing

_GOLDEN_FIX = """
do once("setup")
  put_map("zdb-to-hbz", "0001-1": "HT000001", "0002-2": "HT000002")
end

do list(path: "035  .a", "var": "$i")
  if any_match("$i", "\\\\(DE-600\\\\).*")
    replace_all("$i", "^\\\\(DE-600\\\\)", "")
    copy_field("$i", "IdentifierZDB[].$last.identifierZDB")
    lookup("$i", "zdb-to-hbz", delete: "true")
    if exists("$i")
      paste("IdentifierHBZ[].$last.identifierHBZFull", "~(DE-605)", "$i", join_char: "")
      copy_field("$i", "IdentifierHBZ[].$last.identifierHBZ")
    end
  elsif any_match("$i", "\\\\(DE-605\\\\).*")
    copy_field("$i", "IdentifierHBZ[].$last.identifierHBZFull")
    replace_all("$i", "^\\\\(DE-605\\\\)", "")
    copy_field("$i", "IdentifierHBZ[].$last.identifierHBZ")
  elsif any_match("$i", "\\\\(OCoLC\\\\).*")
    replace_all("$i", "^\\\\(OCoLC\\\\)", "")
    copy_field("$i", "IdentifierOCLC[].$last.identifierOCLC")
  end
end
uniq("IdentifierHBZ[]")
retain("IdentifierHBZ", "IdentifierZDB", "IdentifierOCLC")
"""


def _input_035(rid, values):
    return [(rid, "035  ", "a", i, v) for i, v in enumerate(values)]


def test_golden_identifier_routing():
    """The alma.fix:185-266 shape end-to-end: repeated 035.a values
    routed per element by prefix, ZDB ids translated through a lookup
    map with delete-on-miss, HBZ full/short pairs pasted with literal
    prefixes — expected records hand-derived."""
    ops = compile_fix(_GOLDEN_FIX)
    df = rows(
        *_input_035(
            "r1",
            ["(DE-600)0001-1", "(DE-605)HT999", "(OCoLC)4711", "(DE-599)skip"],
        ),
        ("r1", "leader", None, 0, "xxxxx"),
        *_input_035("r2", ["(DE-600)9999-9"]),  # ZDB id missing from map
    )
    out = apply_ops(df, ops)
    assert got(out) == [
        ("r1", "IdentifierHBZ", "identifierHBZ", 0, "HT000001"),
        ("r1", "IdentifierHBZ", "identifierHBZ", 1, "HT999"),
        ("r1", "IdentifierHBZ", "identifierHBZFull", 0, "(DE-605)HT000001"),
        ("r1", "IdentifierHBZ", "identifierHBZFull", 1, "(DE-605)HT999"),
        ("r1", "IdentifierOCLC", "identifierOCLC", 0, "4711"),
        ("r1", "IdentifierZDB", "identifierZDB", 0, "0001-1"),
        # r2: lookup miss deleted the value → no HBZ rows, but the ZDB
        # copy happened before the lookup
        ("r2", "IdentifierZDB", "identifierZDB", 0, "9999-9"),
    ]


def test_golden_through_recordops_batch(ray_session):
    """The compiled program as the map_batches callable (RecordOps) —
    identical output through the Ray batch path."""
    import pyarrow as pa
    import ray.data as rd

    ops = compile_fix(_GOLDEN_FIX)
    df = rows(*_input_035("r1", ["(DE-605)HT1", "(OCoLC)77"]))
    ds = rd.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)
    ).map_batches(RecordOps(ops), batch_format="pyarrow")
    out = ds.to_pandas()
    assert got(out) == got(apply_ops(df, ops))


def test_do_list_element_isolation():
    """Each element sees only itself: two 035 values where only the
    second matches must not leak the first into the branch."""
    ops = compile_fix(
        """
        do list(path: "035  .a", "var": "$i")
          if any_match("$i", "KEEP.*")
            copy_field("$i", "kept")
          end
        end
        """
    )
    out = apply_ops(
        rows(*_input_035("r1", ["drop-me", "KEEP-1", "drop-too", "KEEP-2"])), ops
    )
    kept = out[out["field"] == "kept"].sort_values("occurrence")
    assert list(kept["value"]) == ["KEEP-1", "KEEP-2"]
    assert list(kept["occurrence"]) == [0, 1]


def test_loop_var_outside_loop_rejected():
    with pytest.raises(FixCompileError, match="outside"):
        compile_fix('copy_field("$i", "X")')


def test_entity_loop_subfield_access():
    """Entity path loop (``MBD  `` with var subfield access) — the
    macros/alma.fix:11-15 shape."""
    ops = compile_fix(
        """
        do list(path: "MBD  ", "var": "$i")
          if any_equal("$i.M", "49HBZ_X")
            copy_field("$i.i", "@mmsiz")
          end
        end
        """
    )
    df = rows(
        ("r1", "MBD  ", "M", 0, "49HBZ_Y"),
        ("r1", "MBD  ", "i", 0, "id-y"),
        ("r1", "MBD  ", "M", 1, "49HBZ_X"),
        ("r1", "MBD  ", "i", 1, "id-x"),
    )
    out = apply_ops(df, ops)
    hit = out[out["field"] == "@mmsiz"]
    assert list(hit["value"]) == ["id-x"]


def test_verify_links_command_compiles():
    """verify_links as a fix command: key/skip sets come from the
    registered maps' key sets (the reference loads bgzf set files via
    setup(isil-path); filemaps are the loader here)."""
    ops = compile_fix(
        """
        put_map("links", "HT001": "x", "HT003": "x")
        put_map("skips", "HT003": "x")
        verify_links(entries: "HostItemEntry,PrecedingEntry",
                     source: "identifierForLinkingEntry",
                     suffix: "IdentifierForLinkingEntry",
                     keys: "links", skip: "skips")
        """
    )
    assert ops == [
        (
            "verify_links",
            {
                "entries": ["HostItemEntry", "PrecedingEntry"],
                "suffix": "IdentifierForLinkingEntry",
                "keys": {"HT001", "HT003"},
                "skip": {"HT003"},
                "source": "identifierForLinkingEntry",
            },
        )
    ]
    out = apply_ops(
        rows(("r1", "HostItemEntry", "identifierForLinkingEntry", 0, "HT001"),
             ("r1", "HostItemEntry", "identifierForLinkingEntry", 1, "HT003")),
        ops,
    )
    ok = out[out["subfield"] == "verifiedIdentifierForLinkingEntry"]
    assert list(ok["value"]) == ["HT001"]  # HT003 in skip set


# --------------------------------------------------- array-value commands


def test_join_field():
    ops = compile_fix('join_field("tags", ", ")')
    out = apply_ops(
        rows(
            ("r1", "tags", None, 0, "a"),
            ("r1", "tags", None, 1, "b"),
            ("r1", "x", None, 0, "k"),
            ("r2", "tags", None, 0, "z"),
        ),
        ops,
    )
    assert got(out) == [
        ("r1", "tags", "", 0, "a, b"),
        ("r1", "x", "", 0, "k"),
        ("r2", "tags", "", 0, "z"),
    ]


def test_join_field_default_separator_is_empty():
    out = apply_ops(
        rows(("r1", "t", None, 0, "a"), ("r1", "t", None, 1, "b")),
        compile_fix('join_field("t")'),
    )
    assert got(out) == [("r1", "t", "", 0, "ab")]


def test_split_field_regex():
    ops = compile_fix('split_field("csv", ",\\\\s*")')
    out = apply_ops(
        rows(("r1", "csv", None, 0, "a, b,c"), ("r1", "y", None, 0, "v")), ops
    )
    assert got(out) == [
        ("r1", "csv", "", 0, "a"),
        ("r1", "csv", "", 1, "b"),
        ("r1", "csv", "", 2, "c"),
        ("r1", "y", "", 0, "v"),
    ]


def test_split_then_join_roundtrip():
    ops = compile_fix(
        """
        split_field("t", "-")
        join_field("t", "-")
        """
    )
    out = apply_ops(rows(("r1", "t", None, 0, "a-b-c")), ops)
    assert got(out) == [("r1", "t", "", 0, "a-b-c")]


def test_filter_values_and_invert():
    ops = compile_fix('filter("tags", "^a")')
    out = apply_ops(
        rows(
            ("r1", "tags", None, 0, "apple"),
            ("r1", "tags", None, 1, "pear"),
            ("r1", "x", None, 0, "az"),  # other fields untouched
        ),
        ops,
    )
    assert got(out) == [
        ("r1", "tags", "", 0, "apple"),
        ("r1", "x", "", 0, "az"),
    ]
    inv = apply_ops(
        rows(("r1", "tags", None, 0, "apple"), ("r1", "tags", None, 1, "pear")),
        compile_fix('filter("tags", "^a", invert: "true")'),
    )
    assert got(inv) == [("r1", "tags", "", 0, "pear")]


def test_put_var_feeds_substitution():
    ops = compile_fix(
        """
        put_var("isil", "DE-605")
        add_field("owner", "$[isil]")
        """
    )
    out = apply_ops(rows(("r1", "x", None, 0, "v")), ops)
    assert ("r1", "owner", "", 0, "DE-605") in got(out)


def test_put_var_does_not_clobber_caller_vars():
    # caller-supplied vars act like the reference's job-config vars:
    # a file-level put_var is only a default (Limetrans.java:167-171)
    ops = compile_fix(
        """
        put_var("catalogid", "")
        add_field("owner", "$[catalogid]")
        """,
        vars={"catalogid": "DE-604"},
    )
    out = apply_ops(rows(("r1", "x", None, 0, "v")), ops)
    assert ("r1", "owner", "", 0, "DE-604") in got(out)


def test_split_field_drops_trailing_empties_like_java():
    # Java String.split drops TRAILING empty strings only
    ops = compile_fix('split_field("t", "\\\\u001f")')
    out = apply_ops(
        rows(("r1", "t", None, 0, "ab")), ops
    )
    assert got(out) == [
        ("r1", "t", "", 0, "a"),
        ("r1", "t", "", 1, ""),
        ("r1", "t", "", 2, "b"),
    ]


def test_split_field_unmatched_and_empty_inputs():
    ops = compile_fix('split_field("t", "-")')
    # no match: value returned whole (Java returns the input itself)
    out = apply_ops(rows(("r1", "t", None, 0, "abc")), ops)
    assert got(out) == [("r1", "t", "", 0, "abc")]
    # empty input: Java split("") -> [""] — the row survives as ""
    out2 = apply_ops(rows(("r2", "t", None, 0, "")), ops)
    assert got(out2) == [("r2", "t", "", 0, "")]
    # all-separator input: every part empty -> field disappears
    out3 = apply_ops(
        rows(("r3", "t", None, 0, "--"), ("r3", "k", None, 0, "v")), ops
    )
    assert got(out3) == [("r3", "k", "", 0, "v")]


def test_join_field_wildcard_joins_each_path_separately():
    # a '?' selector matching several fields must join PER FIELD, not
    # merge all matching fields' values into one row (ADVICE round 4)
    ops = compile_fix('join_field("tag?", "|")')
    out = apply_ops(
        rows(
            ("r1", "tagA", None, 0, "a1"),
            ("r1", "tagA", None, 1, "a2"),
            ("r1", "tagB", None, 0, "b1"),
            ("r1", "tagB", None, 1, "b2"),
        ),
        ops,
    )
    assert got(out) == [
        ("r1", "tagA", "", 0, "a1|a2"),
        ("r1", "tagB", "", 0, "b1|b2"),
    ]


def test_join_field_groups_by_subfield():
    ops = compile_fix('join_field("100  .?", "|")')
    out = apply_ops(
        rows(
            ("r1", "100  ", "a", 0, "x"),
            ("r1", "100  ", "a", 1, "y"),
            ("r1", "100  ", "b", 0, "z"),
        ),
        ops,
    )
    assert got(out) == [
        ("r1", "100  ", "a", 0, "x|y"),
        ("r1", "100  ", "b", 0, "z"),
    ]


# ------------------------------------------- quantifier predicate families


def _pred_records(fixtext):
    """ids of records carrying the 'hit' marker after the program."""
    out = apply_ops(
        rows(
            # r1: all lang=de; r2: mixed; r3: no lang field
            ("r1", "lang", None, 0, "de"),
            ("r1", "lang", None, 1, "de"),
            ("r2", "lang", None, 0, "de"),
            ("r2", "lang", None, 1, "en"),
            ("r3", "x", None, 0, "v"),
        ),
        compile_fix(fixtext),
    )
    return sorted(out.loc[out["field"] == "hit", "record_id"])


def test_all_equal_requires_field_and_every_value():
    assert _pred_records(
        'if all_equal("lang", "de")\n  add_field("hit", "y")\nend'
    ) == ["r1"]


def test_none_equal_absent_field_qualifies():
    assert _pred_records(
        'if none_equal("lang", "en")\n  add_field("hit", "y")\nend'
    ) == ["r1", "r3"]


def test_all_match_and_none_contain():
    assert _pred_records(
        'if all_match("lang", "d.")\n  add_field("hit", "y")\nend'
    ) == ["r1"]
    assert _pred_records(
        'if none_contain("lang", "e")\n  add_field("hit", "y")\nend'
    ) == ["r3"]  # both de and en contain "e"


# ----------------------------------------- Java regex dialect translation


def test_java_posix_class_in_lookbehind():
    # macros.fix:74 / marc/_person.fix:4: strip a trailing period only
    # when it does not follow an uppercase letter (initials survive)
    out = apply_ops(
        rows(
            ("r1", "t", None, 0, "Paris."),
            ("r2", "t", None, 0, "Mueller, T."),
            ("r3", "t", None, 0, "Bonn,"),
        ),
        compile_fix(
            'replace_all("t", "(?<!\\\\p{Upper})[.]$|[,]$", "")'
        ),
    )
    assert got(out) == [
        ("r1", "t", "", 0, "Paris"),
        ("r2", "t", "", 0, "Mueller, T."),
        ("r3", "t", "", 0, "Bonn"),
    ]


def test_java_dollar_group_replacement():
    # alma.fix:205: (DE-836)<7 digits>-49hbz_fhm → (DE-836)ocm0$1
    out = apply_ops(
        rows(("r1", "id", None, 0, "(DE-836)1234567-49hbz_fhm")),
        compile_fix(
            'replace_all("id", "^\\\\(DE-836\\\\)(\\\\d{7})-49hbz_fhm$",'
            ' "(DE-836)ocm0$1")'
        ),
    )
    assert got(out) == [("r1", "id", "", 0, "(DE-836)ocm01234567")]


def test_java_posix_class_inside_char_class_and_predicates():
    from limetrans_ray.functions.fixparser import _java_regex_to_python

    assert _java_regex_to_python(r"[\p{Alpha}0-9]+") == "[A-Za-z0-9]+"
    assert _java_regex_to_python(r"\p{Digit}{3}") == "[0-9]{3}"
    assert _java_regex_to_python(r"\P{Alnum}") == "[^A-Za-z0-9]"
    # unknown names pass through so the error keeps the Java spelling
    assert _java_regex_to_python(r"\p{IsGreek}") == r"\p{IsGreek}"
    # *_match predicates route through the translator too
    out = apply_ops(
        rows(
            ("r1", "v", None, 0, "ABC"),
            ("r2", "v", None, 0, "abc"),
        ),
        compile_fix(
            'if all_match("v", "\\\\p{Upper}+")\n  add_field("hit", "y")\nend'
        ),
    )
    assert sorted(out.loc[out["field"] == "hit", "record_id"]) == ["r1"]


def test_java_replacement_escapes():
    from limetrans_ray.functions.fixparser import _java_replacement_to_python

    assert _java_replacement_to_python(r"a$1b${2}c") == r"a\g<1>b\g<2>c"
    assert _java_replacement_to_python(r"\$1") == "$1"  # escaped dollar
    assert _java_replacement_to_python("\\\\x") == "\\\\x"  # literal backslash
