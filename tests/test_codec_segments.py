"""Property-based coverage for the segmented/batched codec helpers that
power the vectorized invert/merge path (FIXTURES.md §4 codec row)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from limetrans_ray.functions import codec


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=300))
def test_encode_all_offsets_are_value_boundaries(values):
    v = np.array(values, dtype=np.uint64)
    buf, offs = codec.varint_encode_all(v)
    assert len(offs) == len(v) + 1 and offs[0] == 0 and offs[-1] == len(buf)
    # every slice decodes to exactly its value
    for i in np.random.default_rng(0).choice(max(1, len(v)), size=min(10, len(v)), replace=False):
        got = codec.varint_decode(buf[offs[i]:offs[i + 1]])
        assert got.tolist() == [int(v[i])]


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=20),
        min_size=1,
        max_size=40,
    )
)
def test_segmented_delta_roundtrip(segments):
    flat = np.sort(np.array([x for seg in segments for x in sorted(seg)], dtype=np.int64))
    # build monotone segments: re-sort each segment independently
    segs = [np.sort(np.array(s, dtype=np.int64)) for s in segments]
    flat = np.concatenate(segs)
    starts = np.cumsum([0] + [len(s) for s in segs[:-1]])
    deltas = codec.segmented_delta_encode(flat, starts)
    back = codec.segmented_delta_decode(deltas, starts)
    assert np.array_equal(back, flat)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=1000), min_size=0, max_size=8),
        min_size=1,
        max_size=30,
    ),
    st.randoms(use_true_random=False),
)
def test_reorder_segments_permutation(segments, rnd):
    flat = np.array([x for s in segments for x in s], dtype=np.int64)
    lengths = np.array([len(s) for s in segments], dtype=np.int64)
    order = np.array(rnd.sample(range(len(segments)), len(segments)), dtype=np.int64)
    out, offsets = codec.reorder_segments(flat, lengths, order)
    assert len(out) == len(flat)
    for new_i, old_i in enumerate(order):
        got = out[offsets[new_i]:offsets[new_i + 1]].tolist()
        assert got == segments[old_i]


def test_audio_stub_stage(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from limetrans_ray.stages.multimodal import AudioDecodeStage, DecoderNotAvailable

    ds = rd.from_arrow(
        pa.table(
            {
                "media_id": pa.array(range(4), pa.int64()),
                "payload": pa.array([bytes([i]) * 500 for i in range(4)], pa.binary()),
            }
        )
    )
    out = ds.map_batches(
        AudioDecodeStage("payload", n_samples=256), batch_format="pyarrow", batch_size=2
    ).to_pandas()
    assert len(out) == 4
    assert (out["sample_rate"] == 16000).all()
    assert all(len(w) == 256 for w in out["waveform"])
    # deterministic per payload
    out2 = ds.map_batches(
        AudioDecodeStage("payload", n_samples=256), batch_format="pyarrow"
    ).to_pandas()
    import numpy as np

    assert np.array_equal(
        np.stack(out.sort_values("media_id")["waveform"].values),
        np.stack(out2.sort_values("media_id")["waveform"].values),
    )
    import pytest as _pytest

    # auto mode decodes real WAV payloads now; a non-WAV payload raises
    # per call (fallback="error" default)
    stage = AudioDecodeStage(real_decoder=True)
    with _pytest.raises(DecoderNotAvailable):
        stage(
            pa.table(
                {"media_id": pa.array([0], pa.int64()),
                 "payload": pa.array([b"ID3 not-wav"], pa.binary())}
            )
        )


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=8),
        min_size=1,
        max_size=40,
    )
)
def test_position_run_byte_permutation_matches_reencode(runs):
    """The merge-side shortcut: permuting ENCODED per-posting position
    runs must equal decode → permute → re-encode (each run's delta
    resets at its start, so its bytes are order-independent)."""
    rng = np.random.default_rng(3)
    runs = [sorted(r) for r in runs]
    tfs = np.array([len(r) for r in runs], dtype=np.int64)
    flat = np.array([v for r in runs for v in r], dtype=np.int64)
    starts = np.zeros(len(runs) + 1, dtype=np.int64)
    np.cumsum(tfs, out=starts[1:])
    deltas = codec.segmented_delta_encode(flat, starts[:-1])
    pbuf, poffs = codec.varint_encode_all(deltas)
    order = rng.permutation(len(runs))

    # shortcut path (what MergeShardGroup does): terminator-byte scan
    # for run boundaries, then byte-run permutation
    vend = np.flatnonzero(np.asarray(pbuf) < 128).astype(np.int64) + 1
    post_bstart = np.zeros(len(tfs) + 1, dtype=np.int64)
    post_bstart[1:] = vend[starts[1:] - 1]
    run_blen = post_bstart[1:] - post_bstart[:-1]
    got, got_offs = codec.reorder_segments(np.asarray(pbuf), run_blen, order)

    # reference path: decode, permute values, re-encode
    dec = codec.segmented_delta_decode(codec.varint_decode(pbuf), starts[:-1])
    vals_o, offs_o = codec.reorder_segments(dec, tfs, order)
    ref_deltas = codec.segmented_delta_encode(vals_o, offs_o[:-1])
    ref_buf, _ = codec.varint_encode_all(ref_deltas.astype(np.uint64))

    assert np.array_equal(got, np.asarray(ref_buf))
    # and the per-run byte offsets land on value boundaries
    assert got_offs[-1] == len(pbuf)
