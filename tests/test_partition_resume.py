"""Per-partition (file-group) checkpointing of the extract+tokenize
stage: a killed build resumes at the first incomplete group and the
partitioned build is logically identical to the single-shot one
(FIXTURES.md §4 "manifests / resume"; the north rule's per-partition
lineage requirement)."""

import os
import shutil

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from limetrans_ray.pipelines.build_index import IndexBuildConfig, build_index
from limetrans_ray.pipelines.search import SearchEngine

from .conftest import REFERENCE_QUERIES


@pytest.fixture(scope="module")
def grouped_index(ray_session, webtext_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_grouped"))
    stats = build_index(
        webtext_dir, root, config=IndexBuildConfig(fwd_partition_groups=3)
    )
    return root, stats


def test_group_manifests_exist(grouped_index, webtext_dir):
    root, stats = grouped_index
    bdir = os.path.join(root, "builds", stats["build_id"])
    n_files = len([f for f in os.listdir(webtext_dir) if f.endswith(".parquet")])
    expect_groups = min(3, n_files)
    for g in range(expect_groups):
        assert os.path.exists(os.path.join(bdir, f"_DONE_fwd_group{g:04d}"))
        assert os.path.isdir(os.path.join(bdir, "fwd", f"group-{g:04d}"))


def test_identical_to_single_shot(grouped_index, built_index):
    """Grouped and single-shot builds over the same corpus agree on
    every query (logical index identity)."""
    e_grouped = SearchEngine(grouped_index[0])
    e_single = SearchEngine(built_index[0])
    for q in REFERENCE_QUERIES:
        assert e_grouped.search(q, 10) == e_single.search(q, 10), q


def test_resume_skips_completed_groups(ray_session, webtext_dir, grouped_index):
    """Invalidate ONE group → rerun recomputes only that group (and the
    downstream stages), leaving results identical."""
    root, stats = grouped_index
    bdir = os.path.join(root, "builds", stats["build_id"])
    before = SearchEngine(root).search("payment market", 10)

    # simulate a crash that lost group 1 plus everything downstream
    os.remove(os.path.join(bdir, "_DONE_fwd_group0001"))
    shutil.rmtree(os.path.join(bdir, "fwd", "group-0001"))
    for stage in ["fwd", "docs", "segments", "term_stats"]:
        os.remove(os.path.join(bdir, f"_DONE_{stage}"))

    g0_mtime = os.path.getmtime(os.path.join(bdir, "fwd", "group-0000"))
    stats2 = build_index(
        webtext_dir, root, config=IndexBuildConfig(fwd_partition_groups=3)
    )
    # group 0 untouched, group 1 rebuilt
    assert os.path.getmtime(os.path.join(bdir, "fwd", "group-0000")) == g0_mtime
    assert os.path.exists(os.path.join(bdir, "_DONE_fwd_group0001"))
    assert SearchEngine(root).search("payment market", 10) == before
    assert stats2["n_docs"] == stats["n_docs"]


def test_fwd_rows_partition_by_group(grouped_index, built_index):
    """The union of group outputs equals the single-shot fwd (same doc
    ids, same doclens)."""
    ga = pq.read_table(
        os.path.join(grouped_index[0], "builds", grouped_index[1]["build_id"], "fwd"),
        columns=["doc_id", "doclen"],
    )
    sa = pq.read_table(
        os.path.join(built_index[0], "builds", built_index[1]["build_id"], "fwd"),
        columns=["doc_id", "doclen"],
    )
    ga = ga.take(pc.sort_indices(ga, sort_keys=[("doc_id", "ascending")]))
    sa = sa.take(pc.sort_indices(sa, sort_keys=[("doc_id", "ascending")]))
    assert ga.equals(sa)
