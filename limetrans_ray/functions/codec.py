"""Posting-list codecs: vectorized varint (LEB128) + delta encoding +
block-max skip metadata.

This replaces the storage layer the reference delegates to
Lucene/Elasticsearch (the bulk sink in reference
main/src/main/java/hbz/limetrans/ElasticsearchIndexer.java). A posting
*chunk* is one contiguous doc-id range of one term's postings:

- ``ids_enc``  — varint of ``[first_doc, gap1, gap2, ...]`` (strictly
  increasing doc ids, delta-encoded);
- ``tfs_enc``  — varint of term frequencies (≥1, stored as ``tf``);
- per fixed-size block (``BLOCK_SIZE`` postings): the last doc id, the
  maximum idf-independent BM25 impact in the block (see
  ``state/bm25.py``), and the byte offsets of the block starts in both
  encodings — enough for block-max pruned scoring to decode only the
  blocks it cannot skip.

Everything is numpy-vectorized: encode is ~10 masked passes (one per
possible varint byte), decode reconstructs values with ``np.add.at``
over per-byte shift positions. No Python loops over postings.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128


def _as_unsigned(values: np.ndarray) -> tuple[np.ndarray, int]:
    """Contiguous unsigned view of ``values`` plus its max varint byte
    count. uint32 inputs stay 32-bit (5 encode passes over half the
    memory traffic — the invert stage is bandwidth-bound at full
    parallelism, so byte width is wall time); everything else widens to
    uint64 (10 passes). int32 is VIEWED as uint32 — callers guarantee
    non-negative values (positions, tfs, constructed deltas); a
    negative would wrap mod 2^32, not mod 2^64."""
    v = np.ascontiguousarray(values)
    if v.dtype == np.uint32:
        return v, 5
    if v.dtype == np.int32:
        return v.view(np.uint32), 5
    return np.ascontiguousarray(values, dtype=np.uint64), 10


def varint_lengths(values: np.ndarray) -> np.ndarray:
    """Encoded byte length per value (int64, vectorized)."""
    v, maxk = _as_unsigned(values)
    one = v.dtype.type(1)
    nbytes = np.ones(len(v), dtype=np.int64)
    for k in range(1, maxk):
        nbytes += (v >= one << v.dtype.type(7 * k)).astype(np.int64)
    return nbytes


def varint_encode_all(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """LEB128-encode a uint64 array in one vectorized pass.

    Returns ``(buf, offsets)`` where ``buf`` is a uint8 array (NOT
    ``bytes`` — the final ``tobytes()`` copy was pure overhead on the
    bandwidth-bound invert path; :func:`binary_from_slices` and
    :func:`varint_decode` take the array directly via the buffer
    protocol), ``offsets`` has n+1 entries, and value i occupies
    ``buf[offsets[i]:offsets[i+1]]`` — slicing the buffer at value
    boundaries yields valid standalone varint streams, which is how
    per-cell / per-block encodings are produced without a Python-level
    encode call per cell (the per-call numpy overhead dominates
    otherwise; see BENCH notes).
    """
    v, maxk = _as_unsigned(values)
    n = len(v)
    if n == 0:
        return np.zeros(0, dtype=np.uint8), np.zeros(1, dtype=np.int64)
    nbytes = varint_lengths(v)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(nbytes, out=offsets[1:])
    out = np.empty(int(offsets[-1]), dtype=np.uint8)
    starts = offsets[:-1]
    seven_f = v.dtype.type(0x7F)
    for k in range(maxk):
        mask = nbytes > k
        if not mask.any():
            break
        chunk = (v[mask] >> v.dtype.type(7 * k)) & seven_f
        cont = (nbytes[mask] - 1 > k).astype(np.uint8) << 7
        out[starts[mask] + k] = chunk.astype(np.uint8) | cont
    return out, offsets


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array (vectorized)."""
    return varint_encode_all(values)[0].tobytes()


def segmented_delta_encode(ids: np.ndarray, seg_starts: np.ndarray) -> np.ndarray:
    """Deltas of ids with a reset at every segment start (the start
    value is stored absolute) — one vectorized pass for all cells of a
    batch/shard. int32/uint32 input stays 32-bit (all absolute values
    and in-segment gaps fit by construction when the caller passes
    32-bit ids; cross-segment wrap artifacts are overwritten by the
    absolute segment starts) — half the memory traffic of the uint64
    form on the bandwidth-bound invert path."""
    if ids.dtype in (np.dtype(np.int32), np.dtype(np.uint32)):
        ids = np.ascontiguousarray(ids)
        deltas = np.empty(len(ids), dtype=np.uint32)
    else:
        ids = np.ascontiguousarray(ids, dtype=np.int64)
        deltas = np.empty(len(ids), dtype=np.uint64)
    if len(ids):
        dt = deltas.dtype.type
        deltas[0] = dt(ids[0])
        deltas[1:] = np.diff(ids).astype(deltas.dtype)
        deltas[seg_starts] = ids[seg_starts].astype(deltas.dtype)
    return deltas


def reorder_segments(
    values: np.ndarray, seg_lengths: np.ndarray, order: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Permute variable-length segments of a flat array.

    ``values`` holds segments laid out back-to-back (segment i has
    ``seg_lengths[i]`` values); returns the flat array with segments in
    ``order`` plus the new value-offset array (len(order)+1). One
    vectorized gather — used to carry per-posting position runs through
    the posting sort."""
    seg_lengths = np.ascontiguousarray(seg_lengths, dtype=np.int64)
    old_starts = np.zeros(len(seg_lengths) + 1, dtype=np.int64)
    np.cumsum(seg_lengths, out=old_starts[1:])
    lens_o = seg_lengths[order]
    new_offsets = np.zeros(len(order) + 1, dtype=np.int64)
    np.cumsum(lens_o, out=new_offsets[1:])
    total = int(new_offsets[-1])
    if total == 0:
        return np.zeros(0, dtype=values.dtype), new_offsets
    # gather index = arange + per-segment shift (old start − new start),
    # repeated once — one wide repeat pass instead of two, and 32-bit
    # index arithmetic when the array fits (this runs on the
    # bandwidth-bound invert path where every temporary is wall time)
    itype = np.int32 if len(values) < 2**31 and total < 2**31 else np.int64
    shift = (old_starts[:-1][order] - new_offsets[:-1]).astype(itype)
    idx = np.arange(total, dtype=itype)
    idx += np.repeat(shift, lens_o)
    return values[idx], new_offsets


def segmented_delta_decode(deltas: np.ndarray, seg_starts: np.ndarray) -> np.ndarray:
    """Inverse of :func:`segmented_delta_encode` (vectorized segmented
    cumsum: global cumsum minus the running total before each segment).

    uint32 input stays uint32 END TO END: the global cumsum wraps mod
    2^32, but so does the per-segment base, and the subtraction is
    exact mod 2^32 — correct whenever the true (absolute) values fit
    uint32, which the caller's narrow-path guard ensures. Half the
    traffic of the int64 form on the bandwidth-bound merge path."""
    if deltas.dtype == np.uint32:
        if len(deltas) == 0:
            return deltas
        csum = np.cumsum(deltas, dtype=np.uint32)
        base = csum[seg_starts] - deltas[seg_starts]
        counts = np.diff(np.append(seg_starts, len(deltas)))
        return csum - np.repeat(base, counts)
    d = deltas.astype(np.int64)
    if len(d) == 0:
        return d
    csum = np.cumsum(d)
    base = csum[seg_starts] - d[seg_starts]
    counts = np.diff(np.append(seg_starts, len(d)))
    return csum - np.repeat(base, counts)


def binary_concat_view(col) -> np.ndarray:
    """Zero-copy uint8 view of the concatenation of a pyarrow binary
    column's values, in element order.

    The Arrow binary layout stores element i at
    ``values[offsets[i]:offsets[i+1]]`` with non-decreasing offsets, so
    the in-order concatenation IS ``values[offsets[0]:offsets[-1]]`` —
    no per-element ``bytes`` allocation, no ``b"".join`` copy. Replaces
    the former ``b"".join(col.to_pylist())`` on the bandwidth-bound
    merge path (two full copies per call)."""
    import pyarrow as pa

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if len(arr) == 0:
        return np.zeros(0, dtype=np.uint8)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    dbuf = arr.buffers()[2]
    if dbuf is None:
        return np.zeros(0, dtype=np.uint8)
    data = np.frombuffer(dbuf, dtype=np.uint8)
    return data[int(offs[0]) : int(offs[-1])]


def binary_from_slices(buf: bytes, bounds: np.ndarray):
    """Build a pyarrow binary array whose element i is
    ``buf[bounds[i]:bounds[i+1]]`` WITHOUT materializing per-element
    ``bytes`` objects (the former list-comprehension-of-slices path
    allocated one Python object per cell, then pa.array copied each).
    ``bounds`` must be non-decreasing (contiguous in-order slices —
    exactly what the batched varint encoders emit). Falls back to the
    copying path only for >2 GiB buffers (int32 offset limit)."""
    import pyarrow as pa

    n = len(bounds) - 1
    if len(buf) >= 2**31:  # pragma: no cover - >2GiB single-group buffer
        raw = buf.tobytes() if isinstance(buf, np.ndarray) else buf
        return pa.array(
            [raw[bounds[i] : bounds[i + 1]] for i in range(n)], pa.binary()
        )
    offs = np.ascontiguousarray(bounds, dtype=np.int32)
    return pa.BinaryArray.from_buffers(
        pa.binary(), n, [None, pa.py_buffer(offs), pa.py_buffer(buf)]
    )


def list_from_offsets(values, offsets: np.ndarray, value_type=None):
    """Build a pyarrow list array from a flat values array and an int
    offsets array in one zero-copy call (replaces per-cell ``.tolist()``
    + ``pa.array(list_of_lists)`` loops)."""
    import pyarrow as pa

    va = pa.array(values, value_type) if value_type is not None else pa.array(values)
    return pa.ListArray.from_arrays(
        pa.array(np.ascontiguousarray(offsets, dtype=np.int32), pa.int32()), va
    )


def varint_decode(
    buf: bytes | memoryview | np.ndarray,
    offset: int = 0,
    end: int | None = None,
    dtype=np.uint64,
) -> np.ndarray:
    """Decode LEB128 bytes (or a slice) back to an unsigned array
    (vectorized). ``dtype=np.uint32`` halves the output traffic on the
    bandwidth-bound merge path — callers guarantee every decoded value
    fits (values ≥ 2^32 would wrap silently)."""
    b = buf if isinstance(buf, np.ndarray) else np.frombuffer(buf, dtype=np.uint8)
    if end is not None or offset:
        b = b[offset : end if end is not None else len(b)]
    if len(b) == 0:
        return np.empty(0, dtype=dtype)
    if not (b & 0x80).any():
        # fast path: every value fits one byte (typical for dense-term
        # gaps and tfs) — the stream IS the value array
        return b.astype(dtype)
    is_end = (b & 0x80) == 0
    # value index for each byte: number of terminators strictly before it
    vidx = np.zeros(len(b), dtype=np.int64)
    np.cumsum(is_end[:-1], out=vidx[1:])
    # byte position within its value: arange - (index of the value's first byte)
    group_start = np.empty(len(b), dtype=np.int64)
    first_of_group = np.zeros(len(b), dtype=bool)
    first_of_group[0] = True
    first_of_group[1:] = is_end[:-1]
    group_start[first_of_group] = np.flatnonzero(first_of_group)
    np.maximum.accumulate(np.where(first_of_group, group_start, 0), out=group_start)
    shift = (np.arange(len(b), dtype=np.int64) - group_start) * 7
    nvals = int(is_end.sum())
    out = np.zeros(nvals, dtype=dtype)
    np.add.at(
        out, vidx, (b & np.uint8(0x7F)).astype(dtype) << shift.astype(dtype)
    )
    return out


# ------------------------------------------------------- FOR / bit-packing
# The PForDelta-family codec of the north rule ("delta-encoded and
# varint/PForDelta-compressed"): doc-id gaps are frame-of-reference
# bit-packed per block — each block stores one width byte (the max gap's
# bit length) followed by byte-aligned LSB-first packed gaps. This is
# the exception-free FOR/BP128 member of the family (the same layout
# Lucene's PackedInts / FastPFOR's BP128 use as their fast path); our
# (term, bucket) cells bound gaps to a bucket's doc range, so the
# pathological outliers PFor's exception lists exist for cannot occur.
# Opt-in per build via IndexBuildConfig.postings_codec="for"; each
# segment row carries an ``ids_codec`` tag so varint and FOR rows
# coexist (incremental update deltas stay varint).


def for_encode_segmented(
    values: np.ndarray, block_starts: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Bit-pack ``values`` (uint64-safe non-negative ints) in independent
    blocks: block i covers ``values[block_starts[i]:block_starts[i+1]]``
    (with an implicit final bound of ``len(values)``). Per block: one
    width byte + ``ceil(n*w/8)`` bytes of LSB-first packed values.
    Returns ``(buf uint8, byte_offsets int64 len nblocks+1)``.

    Vectorized by width class: all blocks sharing a bit width scatter
    their bits into one bool plane and pack with a single
    ``np.packbits`` call — no per-block Python in the encode path."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    starts = np.ascontiguousarray(block_starts, dtype=np.int64)
    nblocks = len(starts)
    if nblocks == 0:
        return np.zeros(0, dtype=np.uint8), np.zeros(1, dtype=np.int64)
    ends = np.append(starts[1:], len(v))
    counts = ends - starts
    blk_max = np.maximum.reduceat(v, starts) if len(v) else np.zeros(nblocks, dtype=np.uint64)
    blk_max = np.where(counts > 0, blk_max, 0)
    widths = np.zeros(nblocks, dtype=np.int64)
    nz = blk_max > 0
    if nz.any():
        # exact integer bit length (float log2 is unsafe near 2^53)
        m = blk_max[nz].copy()
        w = np.zeros(m.shape, dtype=np.int64)
        while (m > 0).any():
            w += (m > 0)
            m >>= np.uint64(1)
        widths[nz] = w
    payload = (counts * widths + 7) // 8
    offsets = np.zeros(nblocks + 1, dtype=np.int64)
    np.cumsum(1 + payload, out=offsets[1:])
    buf = np.zeros(int(offsets[-1]), dtype=np.uint8)
    buf[offsets[:-1]] = widths.astype(np.uint8)
    for w in np.unique(widths):
        w = int(w)
        if w == 0:
            continue
        sel = np.flatnonzero(widths == w)
        n_vals = counts[sel]
        vals = v[_ranges_concat(starts[sel], ends[sel])]
        # per-value bit base: block's (byte-padded) bit origin in the
        # width class's bit plane + in-block position * w
        pad_bits = payload[sel] * 8
        bit_origin = np.zeros(len(sel), dtype=np.int64)
        np.cumsum(pad_bits[:-1], out=bit_origin[1:])
        val_base = np.zeros(len(sel), dtype=np.int64)
        np.cumsum(n_vals[:-1], out=val_base[1:])
        pos_in_blk = np.arange(len(vals), dtype=np.int64) - np.repeat(val_base, n_vals)
        base_bits = np.repeat(bit_origin, n_vals) + pos_in_blk * w
        bits = ((vals[:, None] >> np.arange(w, dtype=np.uint64)) & np.uint64(1)).astype(np.uint8)
        plane = np.zeros(int(pad_bits.sum()), dtype=np.uint8)
        plane[(base_bits[:, None] + np.arange(w, dtype=np.int64)).reshape(-1)] = bits.reshape(-1)
        packed = np.packbits(plane, bitorder="little")
        # scatter each block's packed bytes to its buffer slice
        byte_base = np.zeros(len(sel), dtype=np.int64)
        np.cumsum(payload[sel][:-1], out=byte_base[1:])
        in_blk_byte = np.arange(len(packed), dtype=np.int64) - np.repeat(byte_base, payload[sel])
        buf[np.repeat(offsets[sel] + 1, payload[sel]) + in_blk_byte] = packed
    return buf, offsets


def _ranges_concat(starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Concatenated ``arange(starts[i], ends[i])`` as one vectorized
    gather index (no per-range Python allocation)."""
    counts = ends - starts
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    out = np.arange(total, dtype=np.int64)
    base = np.zeros(len(starts), dtype=np.int64)
    np.cumsum(counts[:-1], out=base[1:])
    out += np.repeat(starts - base, counts)
    return out


def for_decode_block(buf, offset: int, n: int) -> np.ndarray:
    """Unpack one FOR block (``n`` values) starting at byte ``offset``
    of ``buf`` → uint64 array."""
    b = buf if isinstance(buf, np.ndarray) else np.frombuffer(buf, dtype=np.uint8)
    w = int(b[offset])
    if w == 0:
        return np.zeros(n, dtype=np.uint64)
    nbytes = (n * w + 7) // 8
    bits = np.unpackbits(
        b[offset + 1 : offset + 1 + nbytes], count=n * w, bitorder="little"
    )
    return (
        bits.reshape(n, w).astype(np.uint64) << np.arange(w, dtype=np.uint64)
    ).sum(axis=1, dtype=np.uint64)


def for_decode_segmented(
    buf, n_values: int, block_size: int = BLOCK_SIZE
) -> np.ndarray:
    """Unpack every block of a FOR chunk (inverse of
    :func:`for_encode_segmented` with a regular ``block_size`` grid)."""
    out = np.empty(n_values, dtype=np.uint64)
    b = buf if isinstance(buf, np.ndarray) else np.frombuffer(buf, dtype=np.uint8)
    offset = 0
    pos = 0
    while pos < n_values:
        n = min(block_size, n_values - pos)
        out[pos : pos + n] = for_decode_block(b, offset, n)
        w = int(b[offset])
        offset += 1 + (n * w + 7) // 8
        pos += n
    return out


def for_encode_chunk_ids(ids: np.ndarray, block_size: int = BLOCK_SIZE) -> tuple[bytes, np.ndarray]:
    """FOR-encode one chunk's strictly-increasing doc ids: gaps vs the
    previous id (first gap 0 — the chunk's ``first_doc`` is stored in
    segment metadata). Returns ``(ids_enc bytes, ids_boff)`` with the
    same block-offset semantics as the varint path."""
    ids = np.ascontiguousarray(ids, dtype=np.int64)
    n = len(ids)
    gaps = np.zeros(n, dtype=np.uint64)
    if n > 1:
        gaps[1:] = np.diff(ids).astype(np.uint64)
    starts = np.arange(0, n, block_size, dtype=np.int64)
    buf, offs = for_encode_segmented(gaps, starts)
    return buf.tobytes(), offs[:-1]


def for_decode_chunk_ids(
    ids_enc, first_doc: int, n: int, block_size: int = BLOCK_SIZE
) -> np.ndarray:
    """Inverse of :func:`for_encode_chunk_ids` → absolute int64 doc ids."""
    gaps = for_decode_segmented(ids_enc, n, block_size).astype(np.int64)
    if n:
        gaps[0] += first_doc
    return np.cumsum(gaps)


def for_decode_block_ids(
    ids_enc,
    ids_boff: np.ndarray,
    block_last: np.ndarray,
    first_doc: int,
    df: int,
    block_lo: int,
    block_hi: int,
    block_size: int = BLOCK_SIZE,
) -> np.ndarray:
    """Decode blocks ``block_lo:block_hi`` of a FOR chunk without
    touching the rest (the partial-decode twin of :func:`decode_blocks`)."""
    b = ids_enc if isinstance(ids_enc, np.ndarray) else np.frombuffer(ids_enc, dtype=np.uint8)
    base = int(block_last[block_lo - 1]) if block_lo > 0 else int(first_doc)
    parts = []
    for blk in range(block_lo, block_hi):
        n = min(block_size, df - blk * block_size)
        if n <= 0:
            break
        parts.append(for_decode_block(b, int(ids_boff[blk]), n).astype(np.int64))
    if not parts:
        return np.zeros(0, dtype=np.int64)
    gaps = np.concatenate(parts)
    gaps[0] += base
    return np.cumsum(gaps)


def delta_encode_ids(doc_ids: np.ndarray) -> bytes:
    """Encode strictly-increasing int64 doc ids as varint'd deltas."""
    ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    deltas = np.empty(len(ids), dtype=np.uint64)
    if len(ids):
        deltas[0] = np.uint64(ids[0])
        deltas[1:] = np.diff(ids).astype(np.uint64)
    return varint_encode(deltas)


def delta_decode_ids(buf: bytes | memoryview, *, base: int | None = None) -> np.ndarray:
    """Inverse of :func:`delta_encode_ids` → int64 doc ids.

    ``base``: when decoding a non-first block slice, the absolute doc id
    preceding the slice (the slice's first value is then a gap, not an
    absolute id).
    """
    deltas = varint_decode(buf).astype(np.int64)
    if base is not None and len(deltas):
        deltas[0] += base
    return np.cumsum(deltas)


def varint_block_offsets(values: np.ndarray, block_size: int = BLOCK_SIZE) -> np.ndarray:
    """Byte offsets at which each block of ``block_size`` values starts
    inside the varint encoding of ``values`` (int64 array, one entry per
    block; offset 0 first)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    nbytes = np.ones(len(v), dtype=np.int64)
    for k in range(1, 10):
        nbytes += (v >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    csum = np.concatenate([[0], np.cumsum(nbytes)])
    return csum[0 : len(v) : block_size].copy() if len(v) else np.zeros(0, dtype=np.int64)


def encode_chunk(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    impacts: np.ndarray,
    block_size: int = BLOCK_SIZE,
) -> dict:
    """Encode one posting chunk. ``impacts`` is the per-posting
    idf-independent BM25 impact (float64), used only to compute per-block
    maxima. Returns the column dict for one segment row."""
    ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tf = np.ascontiguousarray(tfs, dtype=np.uint64)
    n = len(ids)
    deltas = np.empty(n, dtype=np.uint64)
    if n:
        deltas[0] = np.uint64(ids[0])
        deltas[1:] = np.diff(ids).astype(np.uint64)
    nblocks = (n + block_size - 1) // block_size
    block_last = ids[np.minimum(np.arange(1, nblocks + 1) * block_size - 1, n - 1)]
    # per-block max impact
    pad = nblocks * block_size - n
    imp = np.ascontiguousarray(impacts, dtype=np.float64)
    imp_pad = np.concatenate([imp, np.full(pad, -np.inf)]) if pad else imp
    block_max = imp_pad.reshape(nblocks, block_size).max(axis=1)
    return {
        "df": n,
        "cf": int(tf.sum()),
        "first_doc": int(ids[0]),
        "last_doc": int(ids[-1]),
        "ids_enc": varint_encode(deltas),
        "tfs_enc": varint_encode(tf),
        "block_last": block_last.astype(np.int64),
        "block_max": block_max,
        "ids_boff": varint_block_offsets(deltas, block_size),
        "tfs_boff": varint_block_offsets(tf, block_size),
    }


def decode_chunk(ids_enc: bytes, tfs_enc: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Decode a whole chunk → (doc_ids int64, tfs int64)."""
    return delta_decode_ids(ids_enc), varint_decode(tfs_enc).astype(np.int64)


def decode_blocks(
    ids_enc: bytes,
    tfs_enc: bytes,
    ids_boff: np.ndarray,
    tfs_boff: np.ndarray,
    block_last: np.ndarray,
    block_lo: int,
    block_hi: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode blocks ``block_lo:block_hi`` of a chunk without touching the
    rest. The first decoded delta is re-based on the previous block's
    last doc id."""
    base = int(block_last[block_lo - 1]) if block_lo > 0 else None
    i_end = int(ids_boff[block_hi]) if block_hi < len(ids_boff) else len(ids_enc)
    t_end = int(tfs_boff[block_hi]) if block_hi < len(tfs_boff) else len(tfs_enc)
    ids = delta_decode_ids(
        memoryview(ids_enc)[int(ids_boff[block_lo]) : i_end], base=base
    )
    tfs = varint_decode(memoryview(tfs_enc)[int(tfs_boff[block_lo]) : t_end]).astype(np.int64)
    return ids, tfs
