"""Filter expression grammar — the LimetransFilter CLI analogue.

The reference's filter tool compiles atoms into an inline Metamorph
program (reference main/src/main/java/hbz/limetrans/filter/
LimetransFilter.java:18-28,86-155): ``@field`` exists, ``!field``
missing, ``field=value`` equals, ``field=~regex`` match, a bare value
searches any field; atoms combine under an ``any`` / ``all`` / ``none``
operator. We keep the exact atom grammar and compile to a vectorized
pyarrow-compute predicate evaluated per batch (no Python row loop).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc


@dataclass(frozen=True)
class FilterAtom:
    kind: str        # exists | missing | equals | regex | anyfield
    field: str | None
    value: str | None

    def mask(self, batch: pa.Table) -> pa.ChunkedArray | pa.Array:
        n = batch.num_rows
        if self.kind == "anyfield":
            acc = pa.array([False] * n)
            for name in batch.column_names:
                col = batch.column(name)
                if not pa.types.is_string(col.type) and not pa.types.is_large_string(col.type):
                    col = pc.cast(col, pa.string())
                m = pc.match_substring(col, self.value)
                acc = pc.or_kleene(acc, pc.fill_null(m, False))
            return acc
        if self.field not in batch.column_names:
            # a missing column: "exists" is false, "missing" is true
            return pa.array([self.kind == "missing"] * n)
        col = batch.column(self.field)
        if self.kind == "exists":
            m = pc.is_valid(col)
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                m = pc.and_(m, pc.not_equal(col, ""))
            return m
        if self.kind == "missing":
            m = pc.is_null(col)
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                m = pc.or_(m, pc.fill_null(pc.equal(col, ""), True))
            return m
        if not pa.types.is_string(col.type) and not pa.types.is_large_string(col.type):
            col = pc.cast(col, pa.string())
        if self.kind == "equals":
            return pc.fill_null(pc.equal(col, self.value), False)
        if self.kind == "regex":
            return pc.fill_null(pc.match_substring_regex(col, self.value), False)
        raise ValueError(f"unknown atom kind {self.kind}")


def parse_atom(expr: str) -> FilterAtom:
    """Parse one atom in the reference grammar (LimetransFilter.java:18-28)."""
    if expr.startswith("@"):
        return FilterAtom("exists", expr[1:], None)
    if expr.startswith("!"):
        return FilterAtom("missing", expr[1:], None)
    if "=~" in expr:
        field, value = expr.split("=~", 1)
        return FilterAtom("regex", field, value)
    if "=" in expr:
        field, value = expr.split("=", 1)
        return FilterAtom("equals", field, value)
    return FilterAtom("anyfield", None, expr)


@dataclass(frozen=True)
class Filter:
    atoms: tuple[FilterAtom, ...]
    op: str  # any | all | none

    def mask(self, batch: pa.Table):
        masks = [a.mask(batch) for a in self.atoms]
        acc = masks[0]
        for m in masks[1:]:
            acc = pc.or_kleene(acc, m) if self.op == "any" else pc.and_kleene(acc, m)
        if self.op == "none":
            # none = NOT any
            acc = masks[0]
            for m in masks[1:]:
                acc = pc.or_kleene(acc, m)
            acc = pc.invert(acc)
        return pc.fill_null(acc, False)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.filter(self.mask(batch))


def parse_filter(exprs: list[str] | str, op: str = "all") -> Filter:
    """Compile filter atoms under ``any``/``all``/``none`` (the
    reference's operator flag)."""
    if isinstance(exprs, str):
        exprs = [exprs]
    if op not in ("any", "all", "none"):
        raise ValueError(f"filter operator must be any|all|none, got {op!r}")
    if not exprs:
        raise ValueError("empty filter expression list")
    return Filter(tuple(parse_atom(e) for e in exprs), op)


def filter_dataset(ds, exprs: list[str] | str, op: str = "all"):
    """Apply the compiled filter to a Ray Dataset via map_batches
    (vectorized; NOT ``ds.filter(row_fn)`` which is per-row Python)."""
    f = parse_filter(exprs, op)

    def apply_filter(batch: pa.Table) -> pa.Table:
        return f(batch)

    return ds.map_batches(apply_filter, batch_format="pyarrow")
