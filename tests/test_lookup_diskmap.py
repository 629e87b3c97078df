"""Lookup operator + out-of-core DiskMap (the put_lmdbmap analogue —
reference core/src/main/java/hbz/limetrans/util/LMDB.java:30-152,
lookup(path, map[, delete]) SURVEY.md §2.3)."""

import pyarrow as pa
import pytest

from limetrans_ray.functions.lookup import LookupStage
from limetrans_ray.state.diskmap import DiskMap


@pytest.fixture()
def dm(tmp_path):
    items = [(f"k{i}", f"v{i}") for i in range(1000)]
    return DiskMap.build(str(tmp_path / "dm"), items)


class TestDiskMap:
    def test_get(self, dm):
        assert dm.get("k0") == "v0"
        assert dm.get("k999") == "v999"
        assert dm.get("missing") is None
        assert dm.get("missing", "d") == "d"
        assert len(dm) == 1000

    def test_get_many(self, dm):
        got = dm.get_many(["k5", "nope", "k77"])
        assert got == ["v5", None, "v77"]

    def test_reopen_readonly(self, dm, tmp_path):
        again = DiskMap.open(str(tmp_path / "dm"))
        assert again.get("k42") == "v42"

    def test_last_write_wins(self, tmp_path):
        m = DiskMap.build(str(tmp_path / "dm2"), [("a", "1"), ("a", "2")])
        assert m.get("a") == "2"
        assert len(m) == 1


def _batch():
    return pa.table(
        {
            "k": pa.array(["a", "b", "c", "a"], pa.string()),
            "x": pa.array([1, 2, 3, 4], pa.int64()),
        }
    )


class TestLookupStage:
    TABLE = {"a": "A", "c": "C"}

    def test_keep_policy_nulls(self):
        out = LookupStage("k", "v", table=self.TABLE)( _batch())
        assert out.column("v").to_pylist() == ["A", None, "C", "A"]

    def test_delete_policy_drops(self):
        out = LookupStage("k", "v", table=self.TABLE, on_miss="delete")(_batch())
        assert out.column("x").to_pylist() == [1, 3, 4]

    def test_default_policy(self):
        out = LookupStage(
            "k", "v", table=self.TABLE, on_miss="default", default="?"
        )(_batch())
        assert out.column("v").to_pylist() == ["A", "?", "C", "A"]

    def test_exactly_one_source(self):
        with pytest.raises(ValueError):
            LookupStage("k", "v")
        with pytest.raises(ValueError):
            LookupStage("k", "v", table={}, diskmap_path="x")

    def test_diskmap_backed(self, tmp_path):
        DiskMap.build(str(tmp_path / "dm"), [("a", "A"), ("c", "C")])
        out = LookupStage(
            "k", "v", diskmap_path=str(tmp_path / "dm"), on_miss="delete"
        )(_batch())
        assert out.column("v").to_pylist() == ["A", "C", "A"]


def test_diskmap_lookup_through_ray(ray_session, tmp_path):
    """DiskMap-backed distributed lookup equals the broadcast-dict
    lookup (every actor opens the same mmap'd store read-only)."""
    import ray.data as rd

    path = str(tmp_path / "dm")
    DiskMap.build(path, [(str(i), f"name{i}") for i in range(0, 100, 2)])
    ds = rd.from_arrow(
        pa.table({"k": pa.array([str(i) for i in range(100)], pa.string())})
    )
    via_disk = (
        ds.map_batches(
            LookupStage("k", "v", diskmap_path=path, on_miss="delete"),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    table = {str(i): f"name{i}" for i in range(0, 100, 2)}
    via_dict = (
        ds.map_batches(
            LookupStage("k", "v", table=table, on_miss="delete"),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert via_disk.equals(via_dict)
    assert len(via_disk) == 50
