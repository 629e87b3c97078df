"""MARC21 (ISO 2709) record decoder → flat Arrow rows.

From-scratch re-expression of the reference's MARC21 / MARC21RECORDS
input paths (reference core/src/main/java/hbz/limetrans/util/
FileQueue.java:69-75 wires Metafacture's ``Marc21Decoder`` behind a
``LineReader`` — one record per line — or a ``RecordReader`` — records
split on the ISO 2709 record terminator). The wire format, per the
published ISO 2709 / MARC21 structure:

    record     := leader directory FT field* RT
    leader     := 24 bytes; [0:5] record length, [12:17] base address
    directory  := 12-byte entries (tag 3, field length 4, start 5) until FT
    field      := control-field value FT
                | ind1 ind2 (SF code value)* FT
    FT = 0x1E (field terminator), RT = 0x1D (record terminator),
    SF = 0x1F (subfield delimiter)

Decoded into the shared flat row model
``(record_id, field, subfield, occurrence, value)`` with the same
naming the MARC-XML decoder uses (functions/marcxml.py): leader →
field ``leader``; control fields (tag 00X) → field = tag, subfield
None; data fields → field ``TAG`` + ind1 + ind2 (blanks kept), one row
per subfield; ``record_id`` = the 001 value, content-hash fallback
otherwise. Lenient where the reference's decoder is strict: directory
offsets are trusted but clamped, and a record whose directory is
malformed falls back to a terminator-split field walk.
"""

from __future__ import annotations

import pyarrow as pa

from .multiline import ROW_SCHEMA

FT = "\x1e"
RT = "\x1d"
SF = "\x1f"


def _emit_fields(tags: list[str], bodies: list[str], record_id, rows) -> str:
    """Emit (tag, body) pairs as flat rows; returns the record id
    (replaced by the 001 value when present). ``occurrence`` is the
    ENTITY index: all subfield rows of one data field share the
    occurrence of that field repeat (the MARC-XML decoder's
    convention — see functions/marcxml.py module docstring)."""
    occ: dict[str, int] = {}
    staged: list[tuple[str, str | None, int, str]] = []

    for tag, body in zip(tags, bodies):
        if tag == "001" and body.strip():
            record_id = body.strip()
        if tag.startswith("00") or SF not in body:
            n = occ.get(tag, 0)
            occ[tag] = n + 1
            staged.append((tag, None, n, body))
            continue
        parts = body.split(SF)
        ind = (parts[0] + "  ")[:2]
        field = f"{tag}{ind}"
        n = occ.get(field, 0)
        occ[field] = n + 1
        for sf in parts[1:]:
            if sf:
                staged.append((field, sf[0], n, sf[1:]))

    for field, sub, n, value in staged:
        rows.append(
            {
                "record_id": record_id,
                "field": field,
                "subfield": sub,
                "occurrence": n,
                "value": value,
            }
        )
    return record_id


# Leader positions the reference's Marc21Decoder (Metafacture) emits as
# a ``leader`` entity of named single-character literals — the
# remaining positions are structural (record length, base address,
# entry map) and carry no bibliographic content:
LEADER_ENTITY = (
    ("status", 5),
    ("type", 6),
    ("bibliographicLevel", 7),
    ("typeOfControl", 8),
    ("characterCodingScheme", 9),
    ("encodingLevel", 17),
    ("catalogingForm", 18),
    ("multipartLevel", 19),
)


def parse_marc21(text: str, *, id_prefix: str = "record") -> list[dict]:
    """Parse one or more ISO 2709 records (concatenated, RT-separated,
    possibly newline-separated — the reference's LineReader mode) into
    flat rows. ``id_prefix`` namespaces fallback ids of records without
    a 001 field, like the other decoders."""
    rows: list[dict] = []
    # RT-terminated stream → split on RT (field values may legally
    # contain newlines); a blob with no RT at all is the reference's
    # LineReader mode — one record per line
    if RT in text:
        chunks = [c.strip("\n\r") for c in text.split(RT)]
    else:
        chunks = text.splitlines()
    ri = 0
    for chunk in chunks:
        rec = chunk.rstrip(RT)
        if not rec.strip():
            continue
        leader, body = rec[:24], rec[24:]
        tags: list[str] = []
        bodies: list[str] = []
        dir_end = body.find(FT)
        directory = body[:dir_end] if dir_end >= 0 else ""
        parsed = False
        if directory and len(directory) % 12 == 0:
            # the directory is all digits by spec; entries that fail to
            # parse mean this segment is NOT a directory → fall back
            try:
                base = int(leader[12:17])
            except ValueError:
                base = 24 + dir_end + 1
            data = rec[base:] if base > 24 else body[dir_end + 1 :]
            try:
                for k in range(0, len(directory), 12):
                    tag = directory[k : k + 3]
                    flen = int(directory[k + 3 : k + 7])
                    start = int(directory[k + 7 : k + 12])
                    tags.append(tag)
                    bodies.append(data[start : start + flen].rstrip(FT))
                parsed = True
            except ValueError:
                tags, bodies = [], []
        if not parsed:
            # malformed/absent directory: walk FT-separated fields that
            # self-identify with a leading 3-char tag
            for f in body.split(FT):
                if len(f) >= 3 and f[:3].isdigit():
                    tags.append(f[:3])
                    bodies.append(f[3:])
        if not tags and FT not in rec:
            continue  # junk line, not a record — don't emit a phantom
        rec_start = len(rows)
        rid = _emit_fields(tags, bodies, f"{id_prefix}-{ri}", rows)
        if leader.strip():
            # the reference's Marc21Decoder explodes the leader into an
            # entity of named positions (vs the MARC-XML handler, which
            # keeps the raw 24-byte string); emitted FIRST like the
            # decoder's event order, as one entity (occurrence 0)
            padded = (leader + " " * 24)[:24]
            rows[rec_start:rec_start] = [
                {
                    "record_id": rid,
                    "field": "leader",
                    "subfield": name,
                    "occurrence": 0,
                    "value": padded[pos],
                }
                for name, pos in LEADER_ENTITY
            ]
        ri += 1
    return rows


def decode_batch(batch: pa.Table, blob_col: str = "marc") -> pa.Table:
    """map_batches body: explode a column of MARC21 blobs (string or
    binary; one or many records each) into the shared flat row schema,
    content-hash-namespaced fallback ids (the MARC-XML contract)."""
    from .multiline import decode_blob_column

    return decode_blob_column(batch, blob_col, parse_marc21)
