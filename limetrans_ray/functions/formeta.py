"""Formeta-style record serialization (encode + decode, round-trip).

The reference can emit records as Formeta, Metafacture's compact
text serialization (reference Limetrans.java:536-549 wires the writer;
``Processor.FORMETA`` decodes it — FileQueue.java:52-54). This module
implements the documented surface grammar over OUR flat-row record
model (the same (record_id, field, subfield, occurrence, value) rows
the SISIS decoder emits — functions/multiline.py):

    record   := id '{' item* '}'
    item     := literal | entity
    literal  := name ':' value ','
    entity   := name '{' item* '}' ','
    name/value are quoted with single quotes when they contain any of
    ``{}:,'\\`` or whitespace; ``\\`` escapes inside quotes.

Subfielded rows serialize as one entity per ``field`` holding its
subfield literals (the MultiLineDecoder convention in reverse);
unsubfielded rows are plain literals. Round-trip (encode → decode) is
the tested contract; byte-level compatibility with Metafacture's
writer is NOT claimed (its source is not part of the reference repo).
"""

from __future__ import annotations

_SPECIAL = set("{}:,'\\")


def _quote(s: str) -> str:
    if s and not any(c in _SPECIAL or c.isspace() for c in s):
        return s
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def encode_records(rows: list[dict]) -> str:
    """Serialize flat rows (grouped by record_id, input order kept) into
    Formeta-style text, one record per line.

    Note: quoted values may legally contain newlines, so the joined text
    cannot be split back into records on ``\\n`` — use
    :func:`encode_record_strings` when per-record blobs are needed.
    """
    return "\n".join(encode_record_strings(rows))


def encode_record_strings(rows: list[dict]) -> list[str]:
    """Serialize flat rows into one Formeta string per record
    (grouped by record_id, input order kept)."""
    by_rec: dict[str, list[dict]] = {}
    order: list[str] = []
    for r in rows:
        rid = r["record_id"]
        if rid not in by_rec:
            by_rec[rid] = []
            order.append(rid)
        by_rec[rid].append(r)
    out_lines = []
    for rid in order:
        parts: list[str] = []
        items = by_rec[rid]
        i = 0
        while i < len(items):
            r = items[i]
            if r.get("subfield") is None:
                parts.append(f"{_quote(r['field'])}:{_quote(r['value'])},")
                i += 1
            else:
                # consecutive same-field subfield rows WITH THE SAME
                # occurrence form one entity — an occurrence change
                # starts a new entity, so repeated subfielded groups
                # (person[0], person[1], …) round-trip as distinct
                # entities instead of collapsing into one
                field = r["field"]
                occ = r.get("occurrence")
                subs = []
                while (
                    i < len(items)
                    and items[i]["field"] == field
                    and items[i].get("subfield") is not None
                    and items[i].get("occurrence") == occ
                ):
                    subs.append(items[i])
                    i += 1
                inner = "".join(
                    f"{_quote(s['subfield'])}:{_quote(s['value'])}," for s in subs
                )
                parts.append(f"{_quote(field)}{{{inner}}},")
        out_lines.append(f"{_quote(rid)}{{{''.join(parts)}}}")
    return out_lines


class _Parser:
    def __init__(self, text: str):
        self.t = text
        self.i = 0

    def _ws(self) -> None:
        while self.i < len(self.t) and self.t[self.i] in " \t\r\n":
            self.i += 1

    def _peek(self) -> str:
        return self.t[self.i] if self.i < len(self.t) else ""

    def _token(self) -> str:
        """A name or value: quoted (with escapes) or a bare run."""
        self._ws()
        if self._peek() == "'":
            self.i += 1
            out = []
            while self.i < len(self.t):
                c = self.t[self.i]
                if c == "\\" and self.i + 1 < len(self.t):
                    out.append(self.t[self.i + 1])
                    self.i += 2
                    continue
                if c == "'":
                    self.i += 1
                    return "".join(out)
                out.append(c)
                self.i += 1
            raise ValueError("unterminated quoted token")
        start = self.i
        while self.i < len(self.t) and self.t[self.i] not in _SPECIAL and not self.t[self.i].isspace():
            self.i += 1
        return self.t[start : self.i]

    def _expect(self, c: str) -> None:
        self._ws()
        if self._peek() != c:
            raise ValueError(f"expected {c!r} at offset {self.i}")
        self.i += 1

    def records(self) -> list[dict]:
        rows: list[dict] = []
        while True:
            self._ws()
            if self.i >= len(self.t):
                return rows
            rid = self._token()
            self._expect("{")
            occ: dict[tuple[str, str | None], int] = {}
            self._items(rid, None, occ, rows)

    def _items(self, rid: str, entity: str | None, occ, rows) -> None:
        while True:
            self._ws()
            if self._peek() == "}":
                self.i += 1
                self._ws()
                if self._peek() == ",":
                    self.i += 1
                return
            name = self._token()
            self._ws()
            if self._peek() == "{":
                self.i += 1
                if entity is not None:
                    raise ValueError("nesting deeper than field.subfield")
                self._items(rid, name, occ, rows)
                continue
            self._expect(":")
            value = self._token()
            self._ws()
            if self._peek() == ",":
                self.i += 1
            field = entity if entity is not None else name
            sub = name if entity is not None else None
            key = (field, sub)
            n = occ.get(key, 0)
            occ[key] = n + 1
            rows.append(
                {
                    "record_id": rid,
                    "field": field,
                    "subfield": sub,
                    "occurrence": n,
                    "value": value,
                }
            )


def decode_formeta(text: str) -> list[dict]:
    """Parse Formeta-style text back into flat rows (the inverse of
    :func:`encode_records`; one level of entity nesting = subfields)."""
    return _Parser(text).records()


def encode_batch(batch, blob_col: str = "formeta"):
    """map_batches body: rows table → one Formeta blob per record
    (record_id grouping, field order preserved). Built from per-record
    strings so quoted values containing newlines stay intact."""
    import pyarrow as pa

    rows = batch.to_pylist()
    recs = encode_record_strings(rows)
    return pa.table({blob_col: pa.array(recs, pa.string())})
