"""Metamorph XML engine-selection parity: the reference runs every
transformation under BOTH Metafix and Metamorph
(MetamorphTransformationTest / MetafixTransformationTest over shared
goldens; engine selection Limetrans.java:155-189). These tests load the
reference's own paired rule files
(main/src/test/resources/limetrans/rules/{noop,nonull,elasticsearch})
and assert the .fix and .xml programs produce identical output on the
same records — the TransformationTestCase discipline."""

import os

import pandas as pd
import pytest

from limetrans_ray.functions.fixparser import compile_fix
from limetrans_ray.functions.morphparser import (
    MorphCompileError,
    compile_morph,
    load_morph,
)
from limetrans_ray.functions.recordops import apply_ops

RULES = "/root/reference/main/src/test/resources/limetrans/rules"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(RULES), reason="reference rule corpus not mounted"
)


def _rows(*tuples):
    return pd.DataFrame(
        tuples, columns=["record_id", "field", "subfield", "occurrence", "value"]
    )


def _got(df):
    return sorted(
        df[["record_id", "field", "subfield", "occurrence", "value"]]
        .fillna("")
        .itertuples(index=False, name=None)
    )


BASE = _rows(
    ("r1", "001", None, 0, "  HT012345  "),
    ("r1", "type", None, 0, "bibliographicResource"),
    ("r1", "245", "a", 0, "Ein Titel"),
    ("r2", "001", None, 0, "HT099999"),
    ("r2", "type", None, 0, "item"),
)


def _pair(name, df):
    fix_ops = compile_fix(open(f"{RULES}/{name}.fix", encoding="utf-8").read())
    xml_ops = load_morph(f"{RULES}/{name}.xml")
    return apply_ops(df.copy(), fix_ops), apply_ops(df.copy(), xml_ops)


def test_noop_pair():
    """noop: <data source="*"/> keeps every literal; the fix twin
    removes a field that never exists."""
    fix_out, xml_out = _pair("noop", BASE)
    assert _got(fix_out) == _got(xml_out) == _got(BASE)


def test_nonull_pair():
    """nonull: switch-name-value → name-regexp(^(?!type)) →
    switch-name-value → trim drops `type` literals and trims the rest;
    the fix twin does it directly (remove_field + trim)."""
    fix_out, xml_out = _pair("nonull", BASE)
    assert _got(fix_out) == _got(xml_out)
    terms = {f for _r, f, _s, _o, _v in _got(xml_out)}
    assert "type" not in terms
    assert ("r1", "001", "", 0, "HT012345") in _got(xml_out)


def test_elasticsearch_pair():
    """elasticsearch: whitelist down to the trimmed 001."""
    fix_out, xml_out = _pair("elasticsearch", BASE)
    assert _got(fix_out) == _got(xml_out)
    assert _got(xml_out) == [
        ("r1", "001", "", 0, "HT012345"),
        ("r2", "001", "", 0, "HT099999"),
    ]


# ------------------------------------------------------------- subset units

def test_vars_include_map_macro(tmp_path):
    (tmp_path / "inc.xml").write_text(
        """<metamorph xmlns="http://www.culturegraph.org/metamorph">
             <map name="codes"><entry name="a" value="Alpha"/></map>
             <macro name="tagged">
               <data source="$[src]" name="$[dst]">
                 <compose prefix="[$[isil]] "/>
               </data>
             </macro>
           </metamorph>"""
    )
    xml = """<?xml version="1.0"?>
      <metamorph xmlns="http://www.culturegraph.org/metamorph"
                 xmlns:xi="http://www.w3.org/2001/XInclude" version="1">
        <vars><var name="isil" value="DE-999"/></vars>
        <xi:include href="inc.xml"/>
        <rules>
          <call-macro name="tagged" src="greeting" dst="Tagged"/>
          <data source="code" name="CodeName">
            <lookup in="codes"/>
          </data>
        </rules>
      </metamorph>"""
    ops = compile_morph(xml, base_dir=str(tmp_path))
    out = apply_ops(
        _rows(
            ("r1", "greeting", None, 0, "hello"),
            ("r1", "code", None, 0, "a"),
            ("r1", "code", None, 1, "zz"),  # lookup miss → dropped
            ("r1", "junk", None, 0, "x"),
        ),
        ops,
    )
    assert _got(out) == [
        ("r1", "CodeName", "", 0, "Alpha"),
        ("r1", "Tagged", "", 0, "[DE-999] hello"),
    ]


def test_regexp_extract_and_format():
    """<regexp> is extract+filter (Matcher.find): the value becomes the
    match, ${n} substitutes groups, non-matching literals drop."""
    xml = """<metamorph xmlns="http://www.culturegraph.org/metamorph">
      <rules>
        <data source="id" name="GND">
          <regexp match="\\(DE-588\\)(\\w+)" format="${1}"/>
        </data>
      </rules>
    </metamorph>"""
    out = apply_ops(
        _rows(
            ("r1", "id", None, 0, "(DE-588)11885328X"),
            ("r1", "id", None, 1, "(DE-101)0000"),
        ),
        compile_morph(xml),
    )
    assert _got(out) == [("r1", "GND", "", 0, "11885328X")]


def test_if_guard_and_case():
    xml = """<metamorph xmlns="http://www.culturegraph.org/metamorph">
      <rules>
        <data source="title" name="Title">
          <if><data source="lang"><equals string="de"/></data></if>
          <case to="upper"/>
        </data>
      </rules>
    </metamorph>"""
    out = apply_ops(
        _rows(
            ("r1", "title", None, 0, "buch"),
            ("r1", "lang", None, 0, "de"),
            ("r2", "title", None, 0, "book"),
            ("r2", "lang", None, 0, "en"),
        ),
        compile_morph(xml),
    )
    assert _got(out) == [("r1", "Title", "", 0, "BUCH")]


def test_entity_compiles_to_stream_op():
    # collector rules switch the whole program to the event-machine op
    # (functions/morphstream.py); plain data programs keep the
    # vectorized path
    xml = """<metamorph xmlns="http://www.culturegraph.org/metamorph">
      <rules><entity name="E" flushWith="record"><data source="x" name="k"/></entity></rules>
    </metamorph>"""
    ops = compile_morph(xml)
    assert [n for n, _kw in ops] == ["morph_stream"]
    df = _rows(("r1", "x", None, 0, "v"))
    out = apply_ops(df, ops)
    got = _got(out)
    assert got == [("r1", "E", "k", 0, "v")]
