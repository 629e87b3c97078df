"""FOR / bit-packed postings codec (the PForDelta-family member of the
north rule's "varint/PForDelta" pair; functions/codec.py).

Two layers of evidence:
- codec-level roundtrips incl. uneven blocks, zero gaps, >32-bit gaps
  and partial block decodes;
- index-level: a ``postings_codec="for"`` build must return EXACTLY the
  varint build's results (ids and float64 scores) on the reference
  query set, pruned == exhaustive, phrases included, and survive an
  incremental update + compaction cycle.
"""

import glob
import os

import numpy as np
import pytest

from limetrans_ray.functions import codec


class TestForCodec:
    def test_segmented_roundtrip_uneven_blocks(self):
        rng = np.random.default_rng(3)
        vals = np.concatenate(
            [
                rng.integers(0, 7, 200),
                np.zeros(50, dtype=np.int64),
                rng.integers(0, 2**20, 300),
                np.array([2**40, 0, 1, 2**33 - 1]),
            ]
        ).astype(np.uint64)
        starts = np.array([0, 128, 200, 250, 399, 550], dtype=np.int64)
        buf, offs = codec.for_encode_segmented(vals, starts)
        ends = np.append(starts[1:], len(vals))
        out = np.concatenate(
            [
                codec.for_decode_block(buf, int(offs[i]), int(ends[i] - starts[i]))
                for i in range(len(starts))
            ]
        )
        assert np.array_equal(out, vals)
        # width byte of the all-zeros block is 0 and its payload empty
        zero_block = 1  # starts[1]=128 .. 200 covers the tail of block 0? no:
        # block 1 spans [128, 200) — mixed; block 2 spans [200, 250) all zeros
        assert buf[offs[2]] == 0 and offs[3] - offs[2] == 1

    def test_chunk_ids_roundtrip_and_partial_blocks(self):
        rng = np.random.default_rng(4)
        ids = np.sort(rng.choice(5_000_000, size=1234, replace=False)).astype(np.int64)
        enc, boff = codec.for_encode_chunk_ids(ids)
        assert np.array_equal(
            codec.for_decode_chunk_ids(enc, int(ids[0]), len(ids)), ids
        )
        bsz = codec.BLOCK_SIZE
        nblocks = (len(ids) + bsz - 1) // bsz
        block_last = ids[np.minimum(np.arange(1, nblocks + 1) * bsz - 1, len(ids) - 1)]
        for blo, bhi in [(0, 1), (3, 7), (nblocks - 1, nblocks), (0, nblocks)]:
            got = codec.for_decode_block_ids(
                enc, boff, block_last, int(ids[0]), len(ids), blo, bhi
            )
            assert np.array_equal(got, ids[blo * bsz : bhi * bsz])

    def test_single_posting_chunk(self):
        ids = np.array([42], dtype=np.int64)
        enc, boff = codec.for_encode_chunk_ids(ids)
        assert np.array_equal(codec.for_decode_chunk_ids(enc, 42, 1), ids)

    def test_for_beats_varint_on_dense_gaps(self):
        dense = np.arange(0, 131072, 2, dtype=np.int64)
        e_for, _ = codec.for_encode_chunk_ids(dense)
        gaps = np.diff(dense, prepend=0).astype(np.uint64)
        gaps[0] = dense[0]
        e_var = codec.varint_encode(gaps)
        assert len(e_for) < len(e_var) / 3  # 2-bit packing vs 1 byte/gap


@pytest.fixture(scope="module")
def for_index(ray_session, webtext_dir, tmp_path_factory):
    """A second build over the SAME corpus with FOR-packed doc ids."""
    from limetrans_ray.pipelines.build_index import IndexBuildConfig, build_index

    root = str(tmp_path_factory.mktemp("index_for"))
    stats = build_index(
        webtext_dir, root, config=IndexBuildConfig(postings_codec="for")
    )
    return root, stats


class TestForIndexParity:
    def test_stats_record_codec_and_rows_tagged(self, for_index):
        import pyarrow.parquet as pq

        root, stats = for_index
        assert stats["postings_codec"] == "for"
        seg_dir = os.path.join(root, "builds", stats["build_id"], "segments")
        f = sorted(glob.glob(seg_dir + "/**/*.parquet", recursive=True))[0]
        tags = set(pq.read_table(f, columns=["ids_codec"]).column("ids_codec").to_pylist())
        assert tags == {"for"}

    def test_results_identical_to_varint_build(self, built_index, for_index):
        from limetrans_ray.pipelines.search import SearchEngine

        from .conftest import REFERENCE_QUERIES

        var_eng = SearchEngine(built_index[0])
        for_eng = SearchEngine(for_index[0])
        for q in REFERENCE_QUERIES:
            assert for_eng.search_exhaustive(q, 10) == var_eng.search_exhaustive(q, 10)
            assert for_eng.search_pruned(q, 10) == var_eng.search_pruned(q, 10)
            assert for_eng.search_pruned(q, 10) == for_eng.search_exhaustive(q, 10)
        for q in ['"drei zinnen"', '"payment market" report']:
            assert for_eng.search(q, 10) == var_eng.search(q, 10)

    def test_for_segments_smaller_id_stream(self, built_index, for_index):
        import pyarrow.parquet as pq

        def id_bytes(root, stats):
            seg = os.path.join(root, "builds", stats["build_id"], "segments")
            total = 0
            for f in glob.glob(seg + "/**/*.parquet", recursive=True):
                col = pq.read_table(f, columns=["ids_enc"]).column("ids_enc")
                total += sum(len(v.as_py()) for v in col)
            return total

        v = id_bytes(*built_index)
        f = id_bytes(*for_index)
        assert f < v  # bit-packing beats 1-byte-min varint on these gaps

    def test_update_and_compaction_on_for_build(
        self, ray_session, for_index, built_index, tmp_path
    ):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from limetrans_ray.pipelines.search import SearchEngine
        from limetrans_ray.pipelines.update_index import add_documents, compact_index

        root, _stats = for_index
        delta_dir = tmp_path / "delta"
        delta_dir.mkdir()
        pq.write_table(
            pa.table(
                {
                    "url": ["https://example.org/for-delta-1"],
                    "warc_ts": pa.array([1], pa.timestamp("us")),
                    "html": pa.array([None], pa.binary()),
                    "text": ["zinnen payment atlas bitpacking delta page"],
                    "lang": ["en"],
                }
            ),
            str(delta_dir / "delta.parquet"),
        )
        add_documents(str(delta_dir), root)
        eng = SearchEngine(root)
        hits = dict(eng.search("bitpacking", 5))
        assert len(hits) == 1  # only the delta doc contains the term
        new_id = next(iter(hits))
        # mixed codecs serve together: base FOR rows + the varint delta
        # row both score in one query
        payment = dict(eng.search("payment", eng.n_docs, mode="or"))
        assert new_id in payment and len(payment) > 1
        stats = compact_index(root)
        eng2 = SearchEngine(root)
        assert dict(eng2.search("bitpacking", 5))
        # compaction normalized every row to varint and results held
        assert eng2.search("payment market", 10) == eng.search("payment market", 10)
