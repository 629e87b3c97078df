"""`python -m limetrans_ray` job-entrypoint conformance — the
``ray job submit`` surface (build/search/update subcommands, one JSON
line per job, resumable builds). Runs main() in-process against the
session Ray; the guarded init must not re-init."""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from limetrans_ray.__main__ import main


def _run(capsys, argv) -> dict:
    assert main(argv) == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


@pytest.fixture(scope="module")
def webtext_dir(tmp_path_factory):
    from limetrans_ray.sources.webtext import write_webtext

    d = str(tmp_path_factory.mktemp("jobwt"))
    write_webtext(d, 300, n_files=2)
    return d


def test_build_then_search(ray_session, capsys, tmp_path_factory, webtext_dir):
    root = str(tmp_path_factory.mktemp("jobidx"))
    out = _run(capsys, ["build", "--input", webtext_dir, "--index-root", root])
    assert out["cmd"] == "build" and out["n_docs"] > 0
    assert out["metrics"]  # per-stage lineage metrics surface in the job log

    res = _run(capsys, ["search", "--index-root", root, "-k", "5", "payment"])
    assert res["cmd"] == "search"
    hits = res["results"]["payment"]
    assert hits and hits[0]["score"] > 0

    # sharded serving returns the identical top-k
    sharded = _run(
        capsys,
        ["search", "--index-root", root, "--shards", "2", "-k", "5", "payment"],
    )
    assert sharded["results"]["payment"] == hits


def test_build_resumes(ray_session, capsys, tmp_path_factory, webtext_dir):
    root = str(tmp_path_factory.mktemp("jobidx2"))
    first = _run(capsys, ["build", "--input", webtext_dir, "--index-root", root])
    again = _run(capsys, ["build", "--input", webtext_dir, "--index-root", root])
    # re-submitting the job skips completed stages (manifest markers)
    assert again["n_docs"] == first["n_docs"]
    assert not again["metrics"], "resumed build must not rerun stages"


def test_documents_build_with_fields(ray_session, capsys, tmp_path_factory):
    d = tmp_path_factory.mktemp("jobdocs")
    pq.write_table(
        pa.table(
            {
                "doc_id": [0, 1, 2],
                "text": ["alpha beta", "beta gamma", "alpha gamma"],
                "lang": ["en", "de", "en"],
            }
        ),
        str(d / "docs.parquet"),
    )
    root = str(d / "idx")
    out = _run(
        capsys,
        [
            "build", "--input", str(d / "docs.parquet"), "--index-root", root,
            "--documents", "--analyzer", "simple",
            "--field", "body:text", "--field", "lang:lang:keyword",
            "--postings-codec", "for",
        ],
    )
    assert out["n_docs"] == 3
    res = _run(
        capsys,
        ["search", "--index-root", root, "alpha lang:en", "body:gamma"],
    )
    assert [h["doc_id"] for h in res["results"]["alpha lang:en"]] == [0, 2]
    assert {h["doc_id"] for h in res["results"]["body:gamma"]} == {1, 2}


def test_update_delete(ray_session, capsys, tmp_path_factory, webtext_dir):
    root = str(tmp_path_factory.mktemp("jobidx3"))
    _run(capsys, ["build", "--input", webtext_dir, "--index-root", root])
    res = _run(capsys, ["search", "--index-root", root, "-k", "3", "payment"])
    top = res["results"]["payment"][0]["doc_id"]
    out = _run(
        capsys,
        ["update", "--index-root", root, "--delete-ids", str(top)],
    )
    assert out["deleted"] == 1
    res2 = _run(capsys, ["search", "--index-root", root, "-k", "3", "payment"])
    assert top not in [h["doc_id"] for h in res2["results"]["payment"]]


def test_bad_field_spec_exits(ray_session):
    with pytest.raises(SystemExit):
        main(
            [
                "build", "--input", "x", "--index-root", "y",
                "--documents", "--field", "too:many:parts:here",
            ]
        )
