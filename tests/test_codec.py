"""Posting codec round-trip tests (FIXTURES.md §4: seeded sequences +
edge cases), including property-based coverage via hypothesis."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from limetrans_ray.functions import codec


def test_varint_edges():
    v = np.array(
        [0, 1, 127, 128, 129, 16383, 16384, 2**31 - 1, 2**63 - 1, 2**64 - 1],
        dtype=np.uint64,
    )
    assert np.array_equal(codec.varint_decode(codec.varint_encode(v)), v)


def test_varint_empty():
    assert codec.varint_encode(np.zeros(0, dtype=np.uint64)) == b""
    assert len(codec.varint_decode(b"")) == 0


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=500))
def test_varint_roundtrip_property(values):
    v = np.array(values, dtype=np.uint64)
    assert np.array_equal(codec.varint_decode(codec.varint_encode(v)), v)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=400, unique=True)
)
def test_delta_ids_roundtrip(ids):
    arr = np.sort(np.array(ids, dtype=np.int64))
    assert np.array_equal(codec.delta_decode_ids(codec.delta_encode_ids(arr)), arr)


def test_chunk_roundtrip_and_blocks():
    rng = np.random.default_rng(7)
    ids = np.sort(rng.choice(10**7, size=1000, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 100, size=1000).astype(np.int64)
    imp = rng.random(1000)
    ch = codec.encode_chunk(ids, tfs, imp, block_size=128)
    d_ids, d_tfs = codec.decode_chunk(ch["ids_enc"], ch["tfs_enc"])
    assert np.array_equal(d_ids, ids) and np.array_equal(d_tfs, tfs)
    assert ch["df"] == 1000 and ch["cf"] == int(tfs.sum())
    nblocks = len(ch["block_last"])
    assert nblocks == 8
    # block-max is the max impact within each block
    for b in range(nblocks):
        assert ch["block_max"][b] == imp[b * 128 : (b + 1) * 128].max()
    # partial decode of every block range matches the slice
    for lo, hi in [(0, 1), (3, 5), (7, 8), (0, 8)]:
        bi, bt = codec.decode_blocks(
            ch["ids_enc"], ch["tfs_enc"], ch["ids_boff"], ch["tfs_boff"],
            ch["block_last"], lo, hi,
        )
        assert np.array_equal(bi, ids[lo * 128 : hi * 128])
        assert np.array_equal(bt, tfs[lo * 128 : hi * 128])


def test_single_posting_chunk():
    ch = codec.encode_chunk(
        np.array([42], dtype=np.int64),
        np.array([3], dtype=np.int64),
        np.array([0.5]),
    )
    ids, tfs = codec.decode_chunk(ch["ids_enc"], ch["tfs_enc"])
    assert ids.tolist() == [42] and tfs.tolist() == [3]
    assert ch["block_last"].tolist() == [42]


class TestNarrowDtypes:
    """The 32-bit codec fast path must produce byte-identical streams
    to the 64-bit path for the same values (the invert stage feeds
    int32 arrays purely as a bandwidth optimization)."""

    def test_varint_bytes_identical_across_widths(self):
        rng = np.random.default_rng(9)
        vals = np.concatenate(
            [
                rng.integers(0, 128, 500),
                rng.integers(0, 1 << 14, 500),
                rng.integers(0, 1 << 28, 500),
                rng.integers(0, 1 << 31, 500),
                [0, 1, 127, 128, 16383, 16384, (1 << 31) - 1],
            ]
        )
        b32, o32 = codec.varint_encode_all(vals.astype(np.uint32))
        b32i, o32i = codec.varint_encode_all(vals.astype(np.int32))
        b64, o64 = codec.varint_encode_all(vals.astype(np.uint64))
        assert np.array_equal(b32, b64) and np.array_equal(b32i, b64)
        assert np.array_equal(o32, o64) and np.array_equal(o32i, o64)
        assert np.array_equal(
            codec.varint_decode(b32), vals.astype(np.uint64)
        )

    def test_delta_encode_32bit_roundtrip(self):
        rng = np.random.default_rng(10)
        segs = [np.sort(rng.integers(0, 1 << 30, n)) for n in (5, 1, 40, 3)]
        ids64 = np.concatenate(segs).astype(np.int64)
        ids32 = ids64.astype(np.int32)
        starts = np.cumsum([0] + [len(s) for s in segs[:-1]])
        d64 = codec.segmented_delta_encode(ids64, starts)
        d32 = codec.segmented_delta_encode(ids32, starts)
        assert d32.dtype == np.uint32
        assert np.array_equal(d32.astype(np.uint64), d64)
        assert codec.varint_encode(d32) == codec.varint_encode(d64)
        back = codec.segmented_delta_decode(
            codec.varint_decode(codec.varint_encode(d32)), starts
        )
        assert np.array_equal(back, ids64)


class TestArrowBufferHelpers:
    """Zero-copy Arrow helpers used on the bandwidth-bound merge path:
    each must equal the Python-object form it replaced exactly."""

    def test_binary_concat_view_matches_join(self):
        import pyarrow as pa

        vals = [b"", b"a", b"long-cell-payload", b"\x00\xff", b""]
        # chunked (post-concat shape) and sliced arrays both supported
        col = pa.chunked_array([vals[:2], vals[2:]], pa.binary())
        view = codec.binary_concat_view(col)
        assert view.tobytes() == b"".join(vals)
        arr = pa.array(vals, pa.binary()).slice(1, 3)
        assert codec.binary_concat_view(arr).tobytes() == b"".join(vals[1:4])

    def test_binary_concat_view_empty(self):
        import pyarrow as pa

        assert codec.binary_concat_view(pa.array([], pa.binary())).size == 0
        assert (
            codec.binary_concat_view(pa.array([b"", b""], pa.binary())).size
            == 0
        )

    def test_binary_from_slices_matches_list(self):
        buf = bytes(range(200))
        bounds = np.array([0, 0, 3, 17, 17, 200], dtype=np.int64)
        arr = codec.binary_from_slices(buf, bounds)
        expect = [buf[bounds[i] : bounds[i + 1]] for i in range(len(bounds) - 1)]
        assert arr.to_pylist() == expect

    def test_list_from_offsets_matches_tolist(self):
        import pyarrow as pa

        values = np.arange(10, dtype=np.int64) * 7
        offsets = np.array([0, 0, 4, 4, 10], dtype=np.int64)
        arr = codec.list_from_offsets(values, offsets, pa.int64())
        expect = [values[offsets[i] : offsets[i + 1]].tolist() for i in range(4)]
        assert arr.to_pylist() == expect
        assert arr.type == pa.list_(pa.int64())
