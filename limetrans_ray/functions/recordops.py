"""Vectorized Metafix-style record operators over the flat-row model.

The reference's transform layer is a ~20k-line Metafix program of
per-record commands (copy_field/move_field/add_field/remove_field,
lookup, replace_all, paste, uniq, retain — usage counts in SURVEY.md
§2.3; semantics per the Metafix command reference exercised by
reference main/src/main/resources/transformation/alma.fix). This module
re-expresses that command surface as VECTORIZED batch transforms over
the shared flat-row record table

    (record_id, field, subfield, occurrence, value)

that the MARC-XML / SISIS / Formeta decoders emit — a "fix program" is
a list of op tuples compiled once per actor (:class:`RecordOps`) and
applied per batch with pandas/pyarrow column ops, never a Python loop
over records.

PARTITIONING ASSUMPTION (documented per the scale rules): per-record
ops (``paste``, ``add_field``, occurrence renumbering) require a
record's rows to be complete within one batch. The decoders emit whole
records per input blob, so composing ``decode_batch`` → ``RecordOps``
in one ``map_batches`` chain preserves this; after a repartition or
shuffle, co-locate first with ``groupby("record_id")``.

Supported ops (name, kwargs):

- ``("copy_field", {"src": f, "dst": g})``   — duplicate rows of f as g
- ``("move_field", {"src": f, "dst": g})``   — rename f to g
- ``("add_field",  {"field": f, "value": v, "subfield": s?})`` — one new
  row per record
- ``("remove_field", {"field": f, "subfield": s?})`` — drop rows
  (subfield omitted = the whole field)
- ``("replace_all", {"field": f, "pattern": p, "replacement": r})`` —
  regex substitution on values of f (all occurrences, like Metafix)
- ``("lookup", {"field": f, "table": {..}, "default": d?, "delete": bool?})``
  — map values of f through a table; misses keep the value (default),
  get ``default`` if given, or drop the row with ``delete=True``
  (the reference's ``lookup(..., delete)``)
- ``("paste", {"dst": g, "srcs": [f1, f2...], "join_char": " "})`` — per
  record, join the FIRST occurrence value of each src (missing srcs
  skipped) into one new g row — Metafix ``paste`` semantics
- ``("uniq", {"field": f})`` — drop repeated (subfield, value) rows of f
  within a record, first occurrence wins
- ``("retain", {"fields": [..]})`` — whitelist fields (the terminal
  ``retain(...)`` of alma.fix:1173-1296)
- ``("reject_if", {"field": f, "pattern": p})`` — drop WHOLE records
  where any value of f matches (Metafix ``reject`` inside an ``if``)

Occurrences are renumbered per (record_id, field, subfield) after the
program runs, in stable row order.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from .multiline import ROW_SCHEMA

_KNOWN = {
    "copy_field", "move_field", "add_field", "remove_field", "replace_all",
    "lookup", "paste", "uniq", "retain", "reject_if",
}


def _first_occurrence_values(df: pd.DataFrame, field: str) -> pd.Series:
    """record_id → value of the field's first row (any subfield)."""
    sub = df[df["field"] == field]
    return sub.groupby("record_id", sort=False)["value"].first()


def apply_ops(df: pd.DataFrame, ops: list[tuple[str, dict]]) -> pd.DataFrame:
    """Run a fix program over a flat-row record frame (whole records
    per the module-level partitioning assumption)."""
    df = df.reset_index(drop=True)
    for name, kw in ops:
        if name not in _KNOWN:
            raise ValueError(f"unknown record op {name!r}")
        if name == "copy_field":
            rows = df[df["field"] == kw["src"]].copy()
            rows["field"] = kw["dst"]
            df = pd.concat([df, rows], ignore_index=True)
        elif name == "move_field":
            df.loc[df["field"] == kw["src"], "field"] = kw["dst"]
        elif name == "add_field":
            recs = df["record_id"].drop_duplicates()
            df = pd.concat(
                [
                    df,
                    pd.DataFrame(
                        {
                            "record_id": recs,
                            "field": kw["field"],
                            "subfield": kw.get("subfield"),
                            "occurrence": 0,
                            "value": kw["value"],
                        }
                    ),
                ],
                ignore_index=True,
            )
        elif name == "remove_field":
            mask = df["field"] == kw["field"]
            if kw.get("subfield") is not None:
                mask &= df["subfield"] == kw["subfield"]
            df = df[~mask]
        elif name == "replace_all":
            sel = df["field"] == kw["field"]
            df.loc[sel, "value"] = df.loc[sel, "value"].str.replace(
                kw["pattern"], kw["replacement"], regex=True
            )
        elif name == "lookup":
            sel = df["field"] == kw["field"]
            mapped = df.loc[sel, "value"].map(kw["table"])
            if kw.get("delete"):
                # reuse the computed mapping: assign hits, drop misses
                # (a table value of None counts as a miss, like an
                # absent key — the delete policy treats both as "no
                # translation exists")
                hits = mapped.dropna()
                df.loc[hits.index, "value"] = hits
                df = df.drop(index=mapped.index[mapped.isna()])
            elif "default" in kw:
                df.loc[sel, "value"] = mapped.fillna(kw["default"])
            else:
                df.loc[sel, "value"] = mapped.fillna(df.loc[sel, "value"])
        elif name == "paste":
            # vectorized join-skipping-missing: align srcs, mark missing
            # cells with a sentinel, str.cat pairwise, then strip
            # sentinel fields and their separators (no per-record loop)
            jc = kw.get("join_char", " ")
            parts = pd.concat(
                [_first_occurrence_values(df, s) for s in kw["srcs"]], axis=1
            )
            cols = [
                parts.iloc[:, i].astype("string").fillna("\x00")
                for i in range(parts.shape[1])
            ]
            acc = cols[0]
            for col in cols[1:]:
                acc = acc.str.cat(col, sep=jc)
            jrx = re.escape(jc)
            joined = (
                acc.str.replace(f"\x00{jrx}", "", regex=True)
                .str.replace(f"{jrx}\x00", "", regex=True)
                .str.replace("\x00", "", regex=False)
            )
            joined = joined[joined != ""].astype(object)
            if len(joined):
                df = pd.concat(
                    [
                        df,
                        pd.DataFrame(
                            {
                                "record_id": joined.index,
                                "field": kw["dst"],
                                "subfield": None,
                                "occurrence": 0,
                                "value": joined.to_numpy(),
                            }
                        ),
                    ],
                    ignore_index=True,
                )
        elif name == "uniq":
            sel = df["field"] == kw["field"]
            dup = df[sel].duplicated(["record_id", "subfield", "value"])
            drop = sel.copy()
            drop.loc[sel] = dup
            df = df[~drop]
        elif name == "retain":
            df = df[df["field"].isin(set(kw["fields"]))]
        elif name == "reject_if":
            hit = df[
                (df["field"] == kw["field"])
                & df["value"].str.contains(kw["pattern"], regex=True, na=False)
            ]["record_id"].unique()
            df = df[~df["record_id"].isin(set(hit))]
        df = df.reset_index(drop=True)
    # renumber occurrences per (record, field, subfield), stable order
    df = df.reset_index(drop=True)
    df["occurrence"] = (
        df.groupby(
            ["record_id", "field", df["subfield"].fillna("\x00")], sort=False
        ).cumcount()
    ).astype(np.int32)
    return df


class RecordOps:
    """map_batches callable: a compiled fix program (ops validated and
    regexes pre-compiled once per actor — the state-loaded-once pattern
    of SURVEY.md §2.5) applied to flat-row record batches."""

    def __init__(self, ops: list[tuple[str, dict]]):
        for name, kw in ops:
            if name not in _KNOWN:
                raise ValueError(f"unknown record op {name!r}")
            if name in ("replace_all", "reject_if"):
                re.compile(kw["pattern"])  # fail fast at build time
        self.ops = list(ops)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = apply_ops(batch.to_pandas(), self.ops)
        return pa.Table.from_pandas(
            out[["record_id", "field", "subfield", "occurrence", "value"]],
            schema=ROW_SCHEMA,
            preserve_index=False,
        )
