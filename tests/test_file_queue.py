"""FileQueue-analogue listing semantics (reference
core/src/main/java/hbz/limetrans/util/FileQueue.java:126-157,211-338):
sort orders, max limit, max-age staleness guard, %GROUP_MARKER%
expansion, multi-pattern ordering and dedupe."""

import os
import time

import pytest

from limetrans_ray.sources.file_queue import GROUP_MARKER, file_queue


@pytest.fixture()
def tree(tmp_path):
    base = tmp_path / "in"
    (base / "sub").mkdir(parents=True)
    files = {
        "a.parquet": 100,
        "b.parquet": 50,
        "c.txt": 10,
        os.path.join("sub", "d.parquet"): 200,
    }
    now = time.time()
    for name, age_back in files.items():
        p = base / name
        p.write_text(name)
        os.utime(p, (now - age_back, now - age_back))
    return str(base)


def test_sort_by_name_and_mtime(tree):
    by_name = file_queue(tree, "*.parquet", sort_by="name")
    assert [os.path.basename(f) for f in by_name] == [
        "a.parquet", "b.parquet", "d.parquet"
    ]
    by_mtime = file_queue(tree, "*.parquet")  # lastmodified asc = oldest first
    assert [os.path.basename(f) for f in by_mtime] == [
        "d.parquet", "a.parquet", "b.parquet"
    ]
    desc = file_queue(tree, "*.parquet", order="desc")
    assert [os.path.basename(f) for f in desc] == [
        "b.parquet", "a.parquet", "d.parquet"
    ]


def test_max_limit_after_sort(tree):
    got = file_queue(tree, "*.parquet", sort_by="name", max_files=2)
    assert [os.path.basename(f) for f in got] == ["a.parquet", "b.parquet"]


def test_max_age_guard(tree):
    # newest selected file is 50s old; 1-day guard passes
    assert file_queue(tree, "*.parquet", max_age_days=1)
    # a guard tighter than the oldest file (200s) must abort the run
    with pytest.raises(ValueError, match="file too old"):
        file_queue(tree, "*.parquet", max_age_days=100 / 86400)


def test_multi_pattern_order_and_dedupe(tree):
    got = file_queue(
        tree, patterns=["b.parquet", "*.parquet"], sort_by="name"
    )
    names = [os.path.basename(f) for f in got]
    assert names == ["b.parquet", "a.parquet", "d.parquet"]  # first wins


def test_invalid_sort_raises(tree):
    with pytest.raises(ValueError, match="invalid sort"):
        file_queue(tree, "*.parquet", sort_by="size")


def test_group_marker_expansion(tmp_path):
    base = tmp_path / "dumps"
    base.mkdir()
    now = time.time()
    # two delivery groups; group 0812 is the later one (sort asc → last)
    for name, back in [
        ("dump-0711-part1.xml", 500), ("dump-0711-part2.xml", 400),
        ("dump-0812-part1.xml", 100), ("dump-0812-part2.xml", 50),
    ]:
        p = base / name
        p.write_text(name)
        os.utime(p, (now - back, now - back))
    got = file_queue(str(base), f"dump-{GROUP_MARKER}-part*.xml")
    assert [os.path.basename(f) for f in got] == [
        "dump-0812-part1.xml", "dump-0812-part2.xml"
    ]
    # by name asc, the last group is also 0812
    got = file_queue(str(base), f"dump-{GROUP_MARKER}-part*.xml", sort_by="name")
    assert all("0812" in os.path.basename(f) for f in got)


def test_group_marker_no_match(tmp_path):
    (tmp_path / "x.csv").write_text("x")
    assert file_queue(str(tmp_path), f"dump-{GROUP_MARKER}.xml") == []


def test_group_marker_with_regex_special_chars(tmp_path):
    """Glob-legal filename characters ({}|$^) must not become live
    regex syntax in the marker expansion."""
    base = tmp_path / "g"
    base.mkdir()
    for name in ["a{2}b-07.xml", "a{2}b-08.xml", "x|y-07.xml"]:
        (base / name).write_text(name)
    got = file_queue(str(base), f"a{{2}}b-{GROUP_MARKER}.xml", sort_by="name")
    assert [os.path.basename(f) for f in got] == ["a{2}b-08.xml"]
    got = file_queue(str(base), f"x|y-{GROUP_MARKER}.xml")
    assert [os.path.basename(f) for f in got] == ["x|y-07.xml"]
