"""JSON / JSONL record decoder → flat Arrow rows.

From-scratch re-expression of the reference's JSON and JSONL input
paths (reference core/src/main/java/hbz/limetrans/util/FileQueue.java:56-67
wires Metafacture's ``JsonDecoder`` — JSON reads the complete input as
one unit, JSONL decodes one record per line) with the reference's
decoder configuration (FileQueue.java:102-110):

- ``allowComments``: Java/C++ style ``//`` and ``/* */`` comments are
  stripped before parsing (outside string literals);
- ``arrayName("")``: array elements repeat their path with NO numbered
  element names — they become successive occurrences here;
- ``recordId("")``: no record id is taken from the content — records
  get content-hash fallback ids like every other decoder in this
  package (pass ``id_field`` to opt into an id key instead).

Nesting maps onto the shared flat-row model
``(record_id, field, subfield, occurrence, value)`` exactly like the
Formeta decoder (one trailing level of nesting = subfield):

- top-level scalar ``{"title": "x"}``        → field ``title``
- one-level object ``{"person": {"name": v}}`` → field ``person``,
  subfield ``name``
- deeper objects join intermediate keys with ``.``:
  ``{"a": {"b": {"c": v}}}`` → field ``a.b``, subfield ``c``
- arrays repeat the path: ``{"lang": ["de", "en"]}`` → two ``lang``
  rows, occurrences 0 and 1; arrays of objects become repeated
  subfielded groups (element *i* = occurrence-*i* row set, the same
  convention RecordOps ``add_hash`` uses)

Scalars are stringified the JSON way (``true``/``false``/``null`` →
``"true"``/``"false"``/dropped; numbers via ``repr`` semantics of
``json.dumps`` so ints stay ints).
"""

from __future__ import annotations

import json

import pyarrow as pa

from .multiline import ROW_SCHEMA


def strip_json_comments(text: str) -> str:
    """Remove ``//`` line and ``/* */`` block comments outside string
    literals (the reference's ``setAllowComments(true)``)."""
    out: list[str] = []
    i, n = 0, len(text)
    in_str = False
    while i < n:
        c = text[i]
        if in_str:
            out.append(c)
            if c == "\\" and i + 1 < n:
                out.append(text[i + 1])
                i += 1
            elif c == '"':
                in_str = False
        elif c == '"':
            in_str = True
            out.append(c)
        elif c == "/" and i + 1 < n and text[i + 1] == "/":
            while i < n and text[i] != "\n":
                i += 1
            continue
        elif c == "/" and i + 1 < n and text[i + 1] == "*":
            i += 2
            while i + 1 < n and not (text[i] == "*" and text[i + 1] == "/"):
                i += 1
            i += 1  # lands on the trailing '/'
        else:
            out.append(c)
        i += 1
    return "".join(out)


def _scalar(v) -> str | None:
    if v is None:
        return None  # dropped, like an absent leaf
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return json.dumps(v)
    return str(v)


def _flatten(obj: dict, emit) -> None:
    """Walk one record object; emit(field, subfield, value, elem) per
    leaf. ``elem`` is the enclosing array-of-objects element index (or
    None): it pins "element i = occurrence-i row set" even when the
    objects have heterogeneous keys (a per-(field, subfield) counter
    alone would mis-group them)."""

    def walk(path: list[str], value, elem: int | None) -> None:
        if isinstance(value, dict):
            for k, v in value.items():
                walk(path + [str(k)], v, elem)
        elif isinstance(value, list):
            for i, item in enumerate(value):  # arrayName "": repeat path
                walk(path, item, i if isinstance(item, dict) else elem)
        else:
            s = _scalar(value)
            if s is None:
                return
            if len(path) == 1:
                emit(path[0], None, s, elem)
            else:
                emit(".".join(path[:-1]), path[-1], s, elem)

    walk([], obj, None)


def decode_json_records(
    text: str, *, id_prefix: str = "record", id_field: str | None = None
) -> list[dict]:
    """Parse a JSON blob (one object, or a top-level array of record
    objects) into flat rows. ``id_field`` names a top-level key whose
    scalar value becomes the record id (the reference runs with
    ``recordId("")`` — no id from content — which is the default
    here: ``id_prefix``-indexed fallback ids)."""
    data = json.loads(strip_json_comments(text))
    records = data if isinstance(data, list) else [data]
    rows: list[dict] = []
    for ri, rec in enumerate(records):
        if not isinstance(rec, dict):
            raise ValueError(f"JSON record {ri} is not an object")
        record_id = f"{id_prefix}-{ri}"
        if id_field is not None and isinstance(rec.get(id_field), (str, int)):
            record_id = str(rec[id_field])
        occ: dict[tuple[str, str | None], int] = {}

        def emit(field: str, sub: str | None, value: str, elem) -> None:
            key = (field, sub)
            if elem is not None:  # array-of-objects: element index wins
                n = int(elem)
                occ[key] = max(occ.get(key, 0), n + 1)
            else:
                n = occ.get(key, 0)
                occ[key] = n + 1
            rows.append(
                {
                    "record_id": record_id,
                    "field": field,
                    "subfield": sub,
                    "occurrence": n,
                    "value": value,
                }
            )

        _flatten(rec, emit)
    return rows


def decode_batch(
    batch: pa.Table,
    blob_col: str = "json",
    *,
    lines: bool = False,
    id_field: str | None = None,
) -> pa.Table:
    """map_batches body: explode a column of JSON blobs into the shared
    flat row schema. ``lines=True`` treats each blob as JSONL (one
    record per non-empty line — the reference's JSONL processor);
    otherwise a blob is one JSON document. Fallback record ids are
    namespaced by a content hash of the blob, so id-less records from
    different blobs never collide (the MARC-XML decoder contract)."""
    from .multiline import decode_blob_column

    def parse(blob: str, *, id_prefix: str) -> list[dict]:
        if not lines:
            return decode_json_records(
                blob, id_prefix=id_prefix, id_field=id_field
            )
        rows: list[dict] = []
        for li, line in enumerate(blob.splitlines()):
            # strip comments BEFORE the emptiness check: a line that is
            # only a comment is legal input (allowComments) and must be
            # skipped, not parsed as empty JSON
            if strip_json_comments(line).strip():
                rows.extend(
                    decode_json_records(
                        line, id_prefix=f"{id_prefix}-{li}", id_field=id_field
                    )
                )
        return rows

    return decode_blob_column(batch, blob_col, parse)
