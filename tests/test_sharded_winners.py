"""Sharded winner table (the 100 TB dedup/rank form): the doc_key-range
shards in the object store must produce exactly the same winner set and
doc ids as the driver-side computation, through the same
ExtractTokenizeStage lookup the build uses — and the handle must never
hold the rows itself (no driver concat, no monolithic broadcast)."""

import numpy as np
import pyarrow as pa
import pytest

from limetrans_ray.stages.indexing import (
    ShardedWinners,
    compute_winners,
    compute_winners_distributed,
)


def _keys_table(n=5000, dups=0.3, seed=11):
    rng = np.random.default_rng(seed)
    n_distinct = int(n * (1 - dups))
    doc_key = rng.integers(0, 1 << 63, size=n_distinct, dtype=np.uint64)
    doc_key = np.concatenate(
        [doc_key, rng.choice(doc_key, size=n - n_distinct)]
    )
    rng.shuffle(doc_key)
    return pa.table(
        {
            "doc_key": pa.array(doc_key, pa.uint64()),
            "warc_ts": pa.array(
                rng.integers(0, 10**9, size=n), pa.int64()
            ).cast(pa.timestamp("us")),
            "url_hash": pa.array(
                rng.integers(0, 1 << 63, size=n, dtype=np.uint64), pa.uint64()
            ),
        }
    )


@pytest.fixture(scope="module")
def both_forms(ray_session):
    import ray
    import ray.data as rd

    keys = _keys_table()
    driver = compute_winners(keys)
    sharded = compute_winners_distributed(
        rd.from_arrow(keys), n_partitions=8
    )
    return driver, sharded, ray


def test_sharded_matches_driver(both_forms):
    driver, sharded, ray = both_forms
    assert isinstance(sharded, ShardedWinners)
    assert len(sharded) == len(driver["doc_id"])
    # reassemble (test-only!) and compare the full logical table
    parts = [ray.get(r) for r in sharded.refs]
    dk = np.concatenate([p["doc_key"] for p in parts])
    order = np.argsort(dk)
    assert np.array_equal(dk[order], driver["doc_key"])
    for col in ("win_ts", "win_url_hash", "doc_id"):
        got = np.concatenate([p[col] for p in parts])[order]
        assert np.array_equal(got, driver[col]), col


def test_handle_is_small_and_ranges_disjoint(both_forms):
    driver, sharded, _ray = both_forms
    # the handle carries bounds + refs only — no row data
    assert not any(
        isinstance(v, np.ndarray) and v.nbytes > 10_000
        for v in vars(sharded).values()
    )
    assert len(sharded.bounds_lo) == len(sharded.refs)
    for i in range(len(sharded.bounds_lo) - 1):
        assert sharded.bounds_hi[i] < sharded.bounds_lo[i + 1]


def test_stage_lookup_equals_dense(both_forms):
    """ExtractTokenizeStage's sharded range-join lookup must return the
    same per-row winner columns as the dense searchsorted."""
    from limetrans_ray.stages.indexing import ExtractTokenizeStage

    driver, sharded, _ray = both_forms
    rng = np.random.default_rng(3)
    probe = np.concatenate(
        [
            rng.choice(driver["doc_key"], size=300),          # present keys
            rng.integers(0, 1 << 63, size=50, dtype=np.uint64),  # misses
        ]
    )
    stage = ExtractTokenizeStage.__new__(ExtractTokenizeStage)
    stage._shard_cache = {}
    stage._shard_bytes = 0
    wk, wts, wuh, wid = stage._lookup_sharded(sharded, probe)
    pos = np.clip(
        np.searchsorted(driver["doc_key"], probe), 0, len(driver["doc_key"]) - 1
    )
    hit = driver["doc_key"][pos] == probe
    assert np.array_equal(wk[hit], driver["doc_key"][pos][hit])
    assert np.array_equal(wts[hit], driver["win_ts"][pos][hit])
    assert np.array_equal(wuh[hit], driver["win_url_hash"][pos][hit])
    assert np.array_equal(wid[hit], driver["doc_id"][pos][hit])
    # misses can never satisfy the winner predicate
    assert not np.any(
        (wk[~hit] == probe[~hit]) & (wts[~hit] != stage._TS_SENTINEL)
    )


class TestSelectWinners:
    """_select_winners is the optimized (argsort + dup-only tie-break)
    form of the original 3-key lexsort winner rule — pin exact parity
    against the lexsort reference, ties included."""

    @pytest.mark.parametrize("seed,n,key_space,ts_space", [
        (0, 10_000, 3_000, 50),    # heavy dup groups + frequent ts ties
        (1, 10_000, 9_999, 10**9), # mostly singletons
        (2, 500, 5, 1),            # tiny key space, ALL ts tied
        (3, 1, 1, 1),              # single row
    ])
    def test_matches_lexsort_reference(self, seed, n, key_space, ts_space):
        from limetrans_ray.stages.indexing import _select_winners

        rng = np.random.default_rng(seed)
        dk = rng.integers(0, key_space, n).astype(np.uint64)
        ts = rng.integers(0, ts_space, n)
        uh = rng.integers(0, 1 << 63, n).astype(np.uint64)
        order = np.lexsort((uh, ts, dk))
        k = dk[order]
        first = np.ones(n, dtype=bool)
        first[1:] = k[1:] != k[:-1]
        widx = order[first]
        wkey, wts, wuh = _select_winners(dk, ts, uh)
        assert np.array_equal(wkey, dk[widx])
        assert np.array_equal(wts, ts[widx])
        assert np.array_equal(wuh, uh[widx])

    def test_empty_and_max_hash(self):
        from limetrans_ray.stages.indexing import _select_winners

        e = np.zeros(0, dtype=np.uint64)
        assert all(len(x) == 0 for x in _select_winners(e, e.astype(np.int64), e))
        # a genuinely max-valued url_hash must still win its group
        dk = np.array([7, 7, 9], dtype=np.uint64)
        ts = np.array([5, 5, 1], dtype=np.int64)
        uh = np.array(
            [0xFFFFFFFFFFFFFFFF, 0xFFFFFFFFFFFFFFFE, 3], dtype=np.uint64
        )
        wkey, wts, wuh = _select_winners(dk, ts, uh)
        assert list(wuh) == [0xFFFFFFFFFFFFFFFE, 3]
