"""Incremental update mode: delete tombstones, incremental adds with
last-write-wins, oracle parity over the merged corpus, and safe pruning
under stale statistics (the reference's update/deletionLiteral mode —
ElasticsearchIndexer.java:80-86 — re-expressed; SURVEY.md §2.11)."""

import glob
import os
import unicodedata

import pyarrow.parquet as pq
import pytest

from limetrans_ray.functions.extract import extract_text
from limetrans_ray.functions.textstats import stable_hash64
from limetrans_ray.functions.urlnorm import canonical_url
from limetrans_ray.pipelines.build_index import build_index
from limetrans_ray.pipelines.search import SearchEngine
from limetrans_ray.pipelines.update_index import add_documents, delete_documents
from limetrans_ray.sources.webtext import write_webtext
from limetrans_ray.state.oracle import OracleEngine

from .conftest import REFERENCE_QUERIES


@pytest.fixture(scope="module")
def updated_index(ray_session, webtext_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("index_upd"))
    base_stats = build_index(webtext_dir, root)
    delta_dir = str(tmp_path_factory.mktemp("delta"))
    # a fresh batch (different seed) + URL overlap with the base corpus
    write_webtext(delta_dir, 300, n_files=1, seed=777)
    stats = add_documents(delta_dir, root)
    return root, base_stats, stats, delta_dir


def _corpus_rows(d):
    for p in sorted(glob.glob(d + "/*.parquet")):
        yield from pq.read_table(p).to_pylist()


def test_incremental_add_grows_corpus(updated_index):
    _root, base, stats, _delta = updated_index
    assert stats["n_docs"] > base["n_docs"]
    assert stats["deltas"] == 1
    # new ids start at a bucket boundary beyond the old max
    assert stats["max_doc"] >= base["max_doc"] + 1


def test_oracle_parity_after_update(updated_index, webtext_dir):
    """Engine over base+delta must match an oracle built over the same
    merged corpus with the same id-assignment rules."""
    root, base, stats, delta_dir = updated_index
    eng = SearchEngine(root)

    # reconstruct the merged corpus exactly as the engine ingested it
    def winners_of(rows):
        best = {}
        for r in rows:
            txt = r["text"] if r["text"] else extract_text(r["html"])
            c = canonical_url(r["url"])
            k = (r["warc_ts"], r["url"])
            if c not in best or k < best[c][0]:
                best[c] = (k, unicodedata.normalize("NFC", txt))
        return best

    base_best = winners_of(_corpus_rows(webtext_dir))
    delta_best = winners_of(_corpus_rows(delta_dir))
    base_sorted = sorted(base_best, key=lambda c: (stable_hash64(c), c))
    w = stats["bucket_width"]
    offset = ((base["max_doc"] // w) + 1) * w
    delta_sorted = sorted(delta_best, key=lambda c: (stable_hash64(c), c))

    oracle = OracleEngine()
    tombstoned = set()
    base_ids = {}
    for i, c in enumerate(base_sorted):
        oracle.add(i, base_best[c][1])
        base_ids[c] = i
    for j, c in enumerate(delta_sorted):
        oracle.add(offset + j, delta_best[c][1])
        if c in base_ids:
            tombstoned.add(base_ids[c])  # last write wins
    oracle.finalize()

    assert eng.n_docs == oracle.n_docs
    for q in REFERENCE_QUERIES[::2]:
        expected = [
            (d, s) for d, s in oracle.search(q, 50) if d not in tombstoned
        ][:10]
        assert eng.search_exhaustive(q, 10) == expected, q
        assert eng.search_pruned(q, 10) == expected, q


def test_delete_documents(updated_index):
    root, *_ = updated_index
    eng = SearchEngine(root)
    hits = eng.search("payment market", 5)
    assert hits
    victim = hits[0][0]
    docs = pq.read_table(
        os.path.join(eng.bdir, "docs"), columns=["doc_id", "url"]
    )
    url = dict(zip(docs.column("doc_id").to_pylist(), docs.column("url").to_pylist()))[victim]
    n = delete_documents(root, urls=[url])
    assert n == 1
    eng2 = SearchEngine(root)
    after = eng2.search("payment market", 5)
    assert victim not in [d for d, _ in after]
    assert eng2.search_pruned("payment market", 5) == after
    # idempotent
    assert delete_documents(root, doc_ids=[victim]) == 0


def test_delete_by_id(ray_session, webtext_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_del"))
    build_index(webtext_dir, root)
    eng = SearchEngine(root)
    top = eng.search("page", 3, mode="or")
    delete_documents(root, doc_ids=[d for d, _ in top])
    eng2 = SearchEngine(root)
    remaining = {d for d, _ in eng2.search("page", 50, mode="or")}
    assert not remaining.intersection({d for d, _ in top})


def test_update_refuses_analyzer_mismatch(ray_session, webtext_dir, tmp_path):
    """A delta tokenized with a newer analyzer must not mix into a
    build made with an older one — update refuses, rebuild required."""
    import json
    import os

    import pytest as _pytest

    from limetrans_ray.pipelines.build_index import build_index
    from limetrans_ray.pipelines.update_index import add_documents
    from limetrans_ray.state.manifest import build_dir, current_build

    root = str(tmp_path / "idx")
    build_index(webtext_dir, root)
    bdir = build_dir(root, current_build(root))
    sp = os.path.join(bdir, "stats.json")
    stats = json.load(open(sp))
    stats["analyzer_version"] = 1  # pretend the base is pre-stemming
    json.dump(stats, open(sp, "w"))
    with _pytest.raises(ValueError, match="analyzer"):
        add_documents(webtext_dir, root)
