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
