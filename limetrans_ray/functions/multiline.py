"""Multi-line key:value record decoder (SISIS-style).

From-scratch, columnar re-expression of the reference's
``MultiLineDecoder`` (reference core/src/main/java/hbz/limetrans/util/
MultiLineDecoder.java:97-193): records are runs of lines

    0000:<record id>          record-start marker (id = value)
    <field>[.<subfield>]:<value>
    9999:<...>                record-end marker

Consecutive rows of the same ``field`` with subfields form one entity
(the decoder's startEntity/endEntity convention); repeated fields keep
their order. Instead of an event stream we emit FLAT ROWS
``(record_id, field, subfield, occurrence, value)`` — the Arrow-native
record model (one explode per record), which any downstream
``map_batches``/groupby can consume.
"""

from __future__ import annotations

import pyarrow as pa


def parse_multiline(
    text: str,
    *,
    record_start: str = "0000",
    record_end: str = "9999",
    field_separator: str = ".",
    value_separator: str = ":",
) -> list[dict]:
    """Parse one blob of multi-line records into flat rows."""
    rows: list[dict] = []
    record_id: str | None = None
    occ: dict[tuple[str, str | None], int] = {}
    for line in text.splitlines():
        if not line.strip():
            continue
        head, sep, value = line.partition(value_separator)
        if not sep:
            continue  # unparseable line — skipped like the reference's null Row
        field, fsep, subfield = head.partition(field_separator)
        sub = subfield if fsep else None
        if field == record_start:
            record_id = value
            occ = {}
            continue
        if field == record_end:
            record_id = None
            continue
        if record_id is None:
            continue  # line outside any record
        key = (field, sub)
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
    return rows


ROW_SCHEMA = pa.schema(
    [
        pa.field("record_id", pa.string()),
        pa.field("field", pa.string()),
        pa.field("subfield", pa.string()),
        pa.field("occurrence", pa.int32()),
        pa.field("value", pa.string()),
    ]
)


def decode_batch(batch: pa.Table, blob_col: str = "blob", **kwargs) -> pa.Table:
    """map_batches body: explode a column of multi-line text blobs into
    the flat row schema (stateless; one call parses a whole blob)."""
    out: list[dict] = []
    for blob in batch.column(blob_col).to_pylist():
        if isinstance(blob, bytes):
            blob = blob.decode("utf-8", "replace")
        out.extend(parse_multiline(blob or "", **kwargs))
    return pa.Table.from_pylist(out, schema=ROW_SCHEMA)


def decode_blob_column(batch: pa.Table, blob_col: str, parse_fn) -> pa.Table:
    """Shared decode_batch body for the per-blob record decoders
    (MARC-XML, MARC21, JSON): explode a string/binary blob column into
    flat rows via ``parse_fn(text, id_prefix=...)``, namespacing
    fallback record ids by a content hash of each blob so id-less
    records from different blobs never collide."""
    import hashlib

    out: list[dict] = []
    for blob in batch.column(blob_col).to_pylist():
        if isinstance(blob, bytes):
            blob = blob.decode("utf-8", "replace")
        if not blob or not blob.strip():
            continue
        prefix = "record-" + hashlib.blake2b(
            blob.encode(), digest_size=6
        ).hexdigest()
        out.extend(parse_fn(blob, id_prefix=prefix))
    return pa.Table.from_pylist(out, schema=ROW_SCHEMA)
