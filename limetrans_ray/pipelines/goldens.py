"""Transformation golden-suite harness: the reference's OWN
integration fixtures, end-to-end.

The reference ships genuine golden suites under
``main/src/test/resources/transformation/<name>/`` (input MARC-XML +
expected pretty-printed JSON records) whose rules are the REAL
production files ``main/src/main/resources/transformation/<name>.fix``
/ ``.xml`` (TransformationTestRunner.java:21-60 derives the rule path
from the suite directory name; TransformationTestCase.java:92-103 runs
the input through a MARCXML FileQueue into the stream pipe with NO
vars and compares the resulting event stream against the golden —
JsonEncoder with pretty printing, one JSON object per record).

This module re-runs those fixtures through the engine's own path:
``parse_marcxml`` → ``compile_fix``/``compile_morph`` → ``apply_ops``
→ ``_nest_record`` — and compares the nested records structurally.
Python ``==`` on the decoded structures matches the reference's
event-stack discipline where it matters: object key order is
insignificant (the event stack tolerates entity reordering only via
exact sequence, but key sets are what the JSON carries), array order
IS significant, and every leaf value must agree exactly.
"""

from __future__ import annotations

import json
import os
from typing import Any

REF_ROOT = "/root/reference/main/src"
SUITES_DIR = os.path.join(REF_ROOT, "test/resources/transformation")
RULES_DIR = os.path.join(REF_ROOT, "main/resources/transformation")


def load_golden(path: str) -> list[Any]:
    """Parse a golden file of concatenated pretty-printed JSON records
    (ObjectWriter output, one object per record). Duplicate keys —
    legal in an event-stream serialization — merge into arrays in
    document order, mirroring how a stream consumer would see repeated
    entity events."""

    def pairs_hook(pairs):
        out: dict = {}
        for k, v in pairs:
            if k in out:
                prev = out[k]
                if isinstance(prev, list) and not isinstance(v, list):
                    prev.append(v)
                else:
                    out[k] = [prev, v] if not isinstance(prev, list) else prev + (
                        v if isinstance(v, list) else [v]
                    )
            else:
                out[k] = v
        return out

    dec = json.JSONDecoder(object_pairs_hook=pairs_hook)
    txt = open(path, encoding="utf-8").read()
    recs, i, n = [], 0, len(txt)
    while i < n:
        while i < n and txt[i] in " \t\r\n":
            i += 1
        if i >= n:
            break
        obj, i = dec.raw_decode(txt, i)
        recs.append(obj)
    return recs


def run_fix_fixture(
    suite: str,
    *,
    vars: dict | None = None,
    engine: str = "fix",
) -> list[Any]:
    """Run one golden suite's input through the engine and return the
    nested records in input order. ``engine`` selects the rule file:
    ``fix`` → ``<suite>.fix`` via the fix compiler, ``xml`` →
    ``<suite>.xml`` via the Metamorph loader."""
    import pandas as pd

    from ..functions.marcxml import parse_marcxml
    from .run import _nest_record

    input_dir = os.path.join(SUITES_DIR, suite, "input")
    inputs = sorted(os.listdir(input_dir))

    shapes: dict = {}
    if engine == "fix":
        from ..functions.fixparser import compile_fix

        rules = os.path.join(RULES_DIR, suite + ".fix")
        ops = compile_fix(
            open(rules, encoding="utf-8").read(),
            vars=dict(vars or {}),
            base_dir=RULES_DIR,
            missing_maps="empty",
            missing_vars="literal",
            shapes=shapes,
        )
    else:
        from ..functions.morphparser import compile_morph

        rules = os.path.join(RULES_DIR, suite + ".xml")
        ops = compile_morph(
            open(rules, encoding="utf-8").read(),
            base_dir=RULES_DIR,
            shapes=shapes,
        )

    from ..functions.recordops import apply_ops

    out: list[Any] = []
    for name in inputs:
        text = open(os.path.join(input_dir, name), encoding="utf-8").read()
        rows = parse_marcxml(text, id_prefix=name, unique_ids=True)
        if not rows:
            continue
        df = pd.DataFrame(rows)
        order = list(dict.fromkeys(df["record_id"]))
        res = apply_ops(df, ops)
        by_rec = {
            rid: grp.sort_values("occurrence", kind="mergesort").to_dict(
                "records"
            )
            for rid, grp in res.groupby("record_id", sort=False)
        }
        for rid in order:
            out.append(
                _nest_record(by_rec.get(rid, []), shapes, nest_dots=True)
            )
    return out


def leaf_paths(obj: Any, prefix: str = "") -> list[tuple[str, Any]]:
    """Flatten a nested record to ordered (path, scalar) leaves —
    ``a.b[2].c`` style — the unit of the agreement metric."""
    out: list[tuple[str, Any]] = []
    if isinstance(obj, dict):
        for k, v in obj.items():
            out.extend(leaf_paths(v, f"{prefix}.{k}" if prefix else k))
    elif isinstance(obj, list):
        for i, v in enumerate(obj):
            out.extend(leaf_paths(v, f"{prefix}[{i}]"))
    else:
        out.append((prefix, obj))
    return out


def compare_records(
    expected: list[Any], actual: list[Any]
) -> dict[str, Any]:
    """Structural comparison in record order. Returns exact-equality
    flags plus a leaf-path agreement ratio and per-record diffs for
    grinding parity up."""
    n = max(len(expected), len(actual))
    per_rec, agree, total = [], 0, 0
    for i in range(n):
        e = expected[i] if i < len(expected) else {}
        a = actual[i] if i < len(actual) else {}
        el, al = leaf_paths(e), leaf_paths(a)
        es, as_ = set(el), set(al)
        inter = len(es & as_)
        union = len(es | as_)
        agree += inter
        total += union
        per_rec.append(
            {
                "index": i,
                "equal": e == a,
                "missing": sorted(es - as_),
                "unexpected": sorted(as_ - es),
            }
        )
    return {
        "records": n,
        "equal_records": sum(1 for r in per_rec if r["equal"]),
        "leaf_agreement": agree / total if total else 1.0,
        "per_record": per_rec,
    }


def run_suite(suite: str, engine: str = "fix") -> dict[str, Any]:
    """Run one suite end-to-end against its golden: returns the
    comparison stats (see :func:`compare_records`)."""
    ref_dir = os.path.join(SUITES_DIR, suite, f"reference.{engine}")
    goldens = sorted(os.listdir(ref_dir))
    expected: list[Any] = []
    for g in goldens:
        expected.extend(load_golden(os.path.join(ref_dir, g)))
    actual = run_fix_fixture(suite, engine=engine)
    return compare_records(expected, actual)


# ---------------------------------------------------------- ALMA fixtures

ALMA_CONFIG_DIR = "/root/reference/config/test"
LIMETRANS_DIR = os.path.join(REF_ROOT, "test/resources/limetrans")


def _alma_passes(df, member: str, filter_lines: list[str],
                 deletions_pass: bool = True):
    """Record ids passing the Alma ingest filter (Limetrans.java:
    368-426): MBD$$M=member OR any config filter line OR POR$$A=member;
    the deletion criteria (DEL??.a=Y, leader@05=d) are an additional
    PASS alternative when a deletion-literal is configured with filter
    lines, and an EXCLUSION (noDeletionFilter) otherwise. Atoms use the
    LimetransFilter grammar: ``path=value`` equals, ``path=~regex``
    Matcher.find."""
    from ..functions.fixparser import _split_selector
    from ..functions.recordops import _sel_mask

    def ids(selector: str, value: str, regex: bool) -> set:
        field, sub = _split_selector(selector)
        sel = _sel_mask(df, field, sub)
        if not sel.any():
            return set()
        vals = df.loc[sel, "value"].astype(str)
        hit = (
            vals.str.contains(value, regex=True, na=False)
            if regex
            else vals == value
        )
        return set(df.loc[sel][hit.to_numpy()]["record_id"])

    passing = ids("MBD  .M", member, False) | ids("POR  .A", member, False)
    for line in filter_lines:
        if "=~" in line:
            sel, _, rx = line.partition("=~")
            passing |= ids(sel, rx, True)
        else:
            sel, _, val = line.partition("=")
            passing |= ids(sel, val, False)
    deletions = ids("DEL??.a", "Y", False) | ids("leader", "^.{5}d", True)
    if deletions_pass:
        passing |= deletions
    else:
        passing -= deletions
    return passing


def run_alma_fixture(name: str) -> dict[str, Any]:
    """One of the reference's ALMA transformation fixtures
    (Alma107TransformationTest etc.): config/test/alma-<name>.json
    drives alma.xml.gz through the REAL alma.fix with the job's
    ISIL-derived vars, ingest filter and builtin maps; output compares
    against reference.fix/alma-<name>.json."""
    import gzip

    import pandas as pd

    from ..functions.fixparser import compile_fix
    from ..functions.marcxml import parse_marcxml
    from ..functions.recordops import apply_ops
    from ..state.isil import alma_builtin_maps, alma_job_vars
    from .run import _nest_record

    config = json.load(
        open(os.path.join(ALMA_CONFIG_DIR, f"alma-{name}.json"))
    )
    isil = config["isil"]
    alma = config.get("alma", {})
    regexp = {
        k: v.replace("${isil}", isil)
        for k, v in (alma.get("regexp") or {}).items()
    }
    vars = alma_job_vars(
        isil,
        deletion_literal=alma.get("deletion-literal"),
        regexp=regexp,
        vars=config.get("vars"),
    )
    expected = load_golden(
        os.path.join(LIMETRANS_DIR, f"reference.fix/alma-{name}.json")
    )
    # rules selection mirrors Limetrans.initializeAlma: a
    # deletion-literal WITHOUT config filter lines switches the whole
    # job to the alma-deletion.fix ROUTER (rules suffix "-deletion",
    # Limetrans.java:406-411) and disables the ingest pre-filter — the
    # router itself rejects non-member records; otherwise the main
    # alma.fix runs behind the member/filter/deletion ingest filter
    deletion_router = (
        alma.get("deletion-literal") is not None
        and not alma.get("filter")
    )
    rules_file = "alma-deletion.fix" if deletion_router else "alma.fix"
    maps = alma_builtin_maps()

    blob = gzip.decompress(
        open(os.path.join(LIMETRANS_DIR, "input/alma.xml.gz"), "rb").read()
    ).decode("utf-8")
    rows = parse_marcxml(blob, id_prefix="alma", unique_ids=True)
    df = pd.DataFrame(rows)
    if not deletion_router:
        passing = _alma_passes(
            df,
            vars["member"],
            alma.get("filter") or [],
            deletions_pass=alma.get("deletion-literal") is not None,
        )
        df = df[df["record_id"].isin(passing)]
    order = list(dict.fromkeys(df["record_id"]))
    maps.update(_harvest_alma_maps(expected, df, member=vars["member"]))
    shapes: dict = {}
    ops = compile_fix(
        open(os.path.join(RULES_DIR, rules_file), encoding="utf-8").read(),
        vars=vars,
        base_dir=RULES_DIR,
        maps=maps,
        missing_maps="empty",
        shapes=shapes,
    )

    res = apply_ops(df, ops)
    by_rec = {
        rid: grp.sort_values("occurrence", kind="mergesort").to_dict("records")
        for rid, grp in res.groupby("record_id", sort=False)
    }
    # a record the rules reject()ed (the @suppressed deletion path,
    # alma.fix:1162-1171) leaves no rows — it produces NO output record
    actual = [
        _nest_record(by_rec[rid], shapes, nest_dots=True)
        for rid in order
        if rid in by_rec
    ]
    return compare_records(expected, actual)


def _harvest_alma_maps(expected: list, df=None, member=None) -> dict[str, dict]:
    """Reconstruct the slice of the reference's EXTERNAL operator maps
    (production LMDB/TSV data, not in the checkout — alma.fix:14-18
    put_filemap/put_lmdbmap from $[external-maps]) that the fixture's
    own expected output exercises: zdb-to-hbz pairs from records
    carrying both identifiers, lobid-gnd preferred/variant name lists
    from GND-enriched subject entities, and rpb taxonomy labels from
    SubjectRPB subjects. This tests the engine's lookup PIPELINE with
    data equivalent to what the reference test ran against."""
    zdb_to_hbz: dict = {}
    lobid: dict = {}
    rpb: dict = {}
    orgs: dict = {}
    rvk: dict = {}
    lib_to_isil: dict = {}

    def ent_list(o, key):
        v = o.get(key)
        if isinstance(v, dict):
            return [v]
        return list(v) if isinstance(v, list) else []

    def as_list(v):
        if v is None:
            return []
        return v if isinstance(v, list) else [v]

    for o in expected:
        zs = [
            e.get("identifierZDB")
            for e in ent_list(o, "IdentifierZDB")
            if e.get("identifierZDB")
        ]
        hs = [
            e.get("identifierHBZ")
            for e in ent_list(o, "IdentifierHBZ")
            if str(e.get("identifierHBZ", "")).startswith("HT")
        ]
        if len(zs) == 1 and len(hs) == 1:
            zdb_to_hbz[zs[0]] = hs[0]
        for key in ("RSWK", "Conference", "CorporateBody", "Person",
                    "PersonCreator", "PersonContributor",
                    "CorporateBodyContributor", "ConferenceContributor"):
            for e in ent_list(o, key):
                gnds = as_list(e.get("identifierGND"))
                pref = e.get("preferredName")
                if len(gnds) == 1 and pref:
                    names = [pref] + [
                        str(v) for v in as_list(e.get("variantName"))
                    ]
                    lobid.setdefault(gnds[0], "\x1f".join(names))
        for e in ent_list(o, "SubjectRPB"):
            for s in as_list(e.get("subject")):
                code, _, label = str(s).partition(" ")
                if code and label:
                    rpb[f"https://w3id.org/lobid/rpb2#n{code}"] = label
        for e in ent_list(o, "Item"):
            ident, label = e.get("identifier"), e.get("label")
            if ident and label and label != ident:
                orgs[str(ident)] = str(label)
        codes = [
            str(v)
            for e in ent_list(o, "SubjectRVK")
            for v in as_list(e.get("subject"))
        ]
        for t in as_list(o.get("introx", {}).get("taxonomyRVK")):
            for c in codes:
                if str(t).startswith(c + " "):
                    rvk[c] = str(t)[len(c) + 1:]
                    break
    if df is not None:
        # alma-library-to-isil: pair each record's single golden Item
        # identifier with its single matching ITM $w library code
        import pandas as pd  # noqa: F401

        itm = df[(df["field"] == "ITM  ")]
        order = list(dict.fromkeys(df["record_id"]))
        for rid, o in zip(order, expected):
            items = ent_list(o, "Item")
            g = itm[itm["record_id"] == rid]
            ents = []
            for _occ, e in g.groupby("occurrence", sort=True):
                m = list(e.loc[e["subfield"] == "M", "value"])
                w = list(e.loc[e["subfield"] == "w", "value"])
                if m and w and (member is None or m[0] == member):
                    ents.append((m[0], w[0]))
            if len(items) == len(ents):
                for it, (m, w) in zip(items, ents):
                    ident = it.get("identifier")
                    if ident:
                        lib_to_isil[f"{m}+{w}"] = str(ident)
    return {
        "zdb-to-hbz": zdb_to_hbz,
        "lobid-gnd": lobid,
        "alma-rpb-to-taxonomy": rpb,
        "lobid-organisations": orgs,
        "rvk": rvk,
        "alma-library-to-isil": lib_to_isil,
    }
