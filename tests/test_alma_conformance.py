"""Conformance fixture: the reference's REAL rule corpus.

Parses and compiles the genuine ``alma.fix`` (1,299 lines + ~40
includes, macros, maps — reference
main/src/main/resources/transformation/, resolved per config by
Limetrans.java:229-247) through the engine's fix parser, and executes
the MARC/035 identifier-routing section (alma.fix:185-266) on synthetic
rows against hand-derived goldens.

The reference files are test INPUT read from /root/reference — nothing
is copied into the repo. External map data (TSV/LMDB/TTL behind
``$[external-maps]``, alma.fix:14-20) is not shipped with the rule
text; ``missing_maps="empty"`` registers those as empty maps and
records one warning each, which mirrors what the rules themselves
assume for undeclared maps (Metafacture ``Maps.getMap`` returns empty).
"""

import os

import pandas as pd
import pytest

from limetrans_ray.functions.fixparser import compile_fix
from limetrans_ray.functions.recordops import apply_ops
from limetrans_ray.state.isil import (
    ISIL_TABLE,
    alma_builtin_maps,
    alma_job_vars,
)

REF = "/root/reference/main/src/main/resources/transformation"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference rule corpus not mounted"
)


def _compile(name, vars_, maps=None):
    warnings = []
    ops = compile_fix(
        open(os.path.join(REF, name), encoding="utf-8").read(),
        vars=vars_,
        base_dir=REF,
        maps={**alma_builtin_maps(), **(maps or {})},
        missing_maps="empty",
        warnings=warnings,
    )
    return ops, warnings


# ------------------------------------------------------- full-file compiles

def test_alma_fix_compiles_completely():
    """Every command of the real alma.fix (incl. all includes) compiles —
    no skips, no unsupported commands."""
    ops, warnings = _compile("alma.fix", alma_job_vars())
    # 413 top-level ops observed; assert a floor so rule-file growth
    # doesn't break the test while regressions (dropped commands) do
    assert len(ops) >= 400
    names = {n for n, _ in ops}
    assert {"do_list_elements", "if", "uniq", "copy_field", "retain"} <= names
    # warnings are ONLY missing external map data / undefined maps —
    # both resolved to empty maps like the reference
    for w in warnings:
        assert "source missing" in w or "undefined lookup map" in w


def test_other_rule_files_compile():
    ops, _ = _compile(
        "DE-604-baybib.fix", alma_job_vars("DE-604", catalogid="DE-604")
    )
    # the whole file nests inside `if exists("@by")` → 2 top-level ops
    assert len(ops) == 2 and ops[1][0] == "if"
    ops, _ = _compile("DE-708-deposit.fix", alma_job_vars("DE-708"))
    assert len(ops) >= 200


def test_isil_table_matches_reference_enum():
    """Spot-check the ISIL → (institution code, member) registry against
    Limetrans.java:55-150."""
    assert ISIL_TABLE["DE-6"] == ("6449", "49HBZ_ULM")
    assert ISIL_TABLE["DE-605"] == ("6441", "49HBZ_NETWORK")
    v = alma_job_vars("DE-6")
    assert v["member"] == "49HBZ_ULM"
    assert v["institution-code"] == "6449"
    assert v["sigel"] == "6"
    assert v["network"] == "49HBZ_NETWORK"
    # deletion vars are ALWAYS bound (Limetrans.java:415-418 defaults)
    assert v["deletion-enabled"] == "false"
    assert v["deletion-literal"] == "-"


# ------------------------------------------- identifier routing golden

def _routing_ops(zdb_map):
    """Compile macros/alma.fix + the alma.fix:185-266 excerpt verbatim."""
    lines = open(os.path.join(REF, "alma.fix"), encoding="utf-8").read()
    excerpt = "\n".join(lines.splitlines()[184:266])
    program = 'include("./macros/alma.fix")\n' + excerpt
    return compile_fix(
        program,
        vars=alma_job_vars("DE-6"),
        base_dir=REF,
        maps={**alma_builtin_maps(), "zdb-to-hbz": zdb_map},
    )


def _rows(*tuples):
    return pd.DataFrame(
        tuples, columns=["record_id", "field", "subfield", "occurrence", "value"]
    )


def _vals(df, rec, field, sub):
    m = (df["record_id"] == rec) & (df["field"] == field)
    if sub is not None:
        m &= df["subfield"] == sub
    return sorted(df.loc[m, "value"])


def test_identifier_routing_golden():
    """alma.fix:185-266 on synthetic 001/035 rows, goldens hand-derived
    from the rule text (vars: isil=DE-6, catalogid=DE-605).

    r1 exercises the catalogid/@hbzid, DE-601/GBV and OCoLC branches;
    r2 the DE-600/ZDB join (zdb-to-hbz hit) and the @mmsid fallback.
    """
    ops = _routing_ops({"2531291-7": "HT999"})
    df = _rows(
        # r1: 001 ends 6449 → institution-code-to-isil → DE-6
        ("r1", "001", None, 0, "990012345670006449"),
        ("r1", "035  ", "a", 0, "(DE-605)HT018700000"),
        ("r1", "035  ", "a", 1, "(DE-601)GBV123"),
        ("r1", "035  ", "a", 2, "(OCoLC)ocm777"),
        # r2: only a ZDB-routed 035 → @id falls back to @mmsid
        ("r2", "001", None, 0, "990099999990006449"),
        ("r2", "035  ", "a", 0, "(DE-600)2531291-7"),
    )
    out = apply_ops(df, ops)

    # r1 — catalogid branch: @hbzid and @id carry the full (DE-605) id
    assert _vals(out, "r1", "@hbzid", None) == ["(DE-605)HT018700000"]
    assert _vals(out, "r1", "@id", None) == ["(DE-605)HT018700000"]
    # the catalogid branch strips the prefix into @sisis_supplement
    assert _vals(out, "r1", "@sisis_supplement", None) == ["HT018700000"]
    # the (DE-605) elsif of the second chain builds the HBZ entity
    assert _vals(out, "r1", "IdentifierHBZ", "identifierHBZFull") == [
        "(DE-605)HT018700000"
    ]
    assert _vals(out, "r1", "IdentifierHBZ", "identifierHBZ") == ["HT018700000"]
    # @hbzids collects from BOTH chains for a catalogid value (dup kept —
    # alma.fix appends in each chain and never uniq()s @hbzids here)
    assert _vals(out, "r1", "@hbzids", None) == [
        "(DE-605)HT018700000", "(DE-605)HT018700000"
    ]
    # DE-601 → GBV, OCoLC → OCLC, both prefix-stripped
    assert _vals(out, "r1", "IdentifierGBV", "identifierGBV") == ["GBV123"]
    assert _vals(out, "r1", "IdentifierOCLC", "identifierOCLC") == ["ocm777"]
    assert _vals(out, "r1", "IdentifierDNB", "identifierDNB") == []
    # alma-mms-and-isil: 001 tail 6449 → DE-6 → "(DE-6)<001>"
    assert _vals(out, "r1", "@mmsid", None) == ["(DE-6)990012345670006449"]

    # r2 — DE-600: DNB + ZDB copies keep the stripped number; the
    # zdb-to-hbz hit rewrites $i to HT999 and builds the HBZ entity
    assert _vals(out, "r2", "IdentifierDNB", "identifierDNB") == ["2531291-7"]
    assert _vals(out, "r2", "IdentifierZDB", "identifierZDB") == ["2531291-7"]
    assert _vals(out, "r2", "IdentifierHBZ", "identifierHBZ") == ["HT999"]
    assert _vals(out, "r2", "IdentifierHBZ", "identifierHBZFull") == [
        "(DE-605)HT999"
    ]
    assert _vals(out, "r2", "@sisis_supplement", None) == ["HT999"]
    assert _vals(out, "r2", "@hbzids", None) == ["(DE-605)HT999"]
    # no @hbzid / @sysid → @id = @mmsid
    assert _vals(out, "r2", "@hbzid", None) == []
    assert _vals(out, "r2", "@id", None) == ["(DE-6)990099999990006449"]


def test_identifier_routing_zdb_miss_deletes():
    """lookup(delete: "true") miss removes the element — no HBZ entity,
    no supplement, and the record falls back to @mmsid."""
    ops = _routing_ops({})  # empty zdb-to-hbz: every lookup misses
    df = _rows(
        ("r3", "001", None, 0, "990055555550006449"),
        ("r3", "035  ", "a", 0, "(DE-600)999999-x"),
    )
    out = apply_ops(df, ops)
    assert _vals(out, "r3", "IdentifierZDB", "identifierZDB") == ["999999-x"]
    assert _vals(out, "r3", "IdentifierHBZ", "identifierHBZ") == []
    assert _vals(out, "r3", "@sisis_supplement", None) == []
    assert _vals(out, "r3", "@id", None) == ["(DE-6)990055555550006449"]
