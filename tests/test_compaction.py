"""Compaction: tombstoned docs physically removed into a new build with
exactly-recomputed statistics — the post-compaction index must equal a
fresh oracle over the surviving corpus (fresh df/avgdl, no tombstone
filter), and CURRENT must flip atomically."""

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
from limetrans_ray.pipelines.update_index import compact_index, delete_documents
from limetrans_ray.state.manifest import current_build
from limetrans_ray.state.oracle import OracleEngine

from .conftest import REFERENCE_QUERIES


@pytest.fixture(scope="module")
def compacted(ray_session, webtext_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_compact"))
    build_index(webtext_dir, root)
    eng = SearchEngine(root)
    victims = [d for d, _ in eng.search("payment market", 5)]
    victims += [d for d, _ in eng.search("web", 3, mode="or")]
    delete_documents(root, doc_ids=victims)
    stats = compact_index(root)
    return root, stats, set(victims)


def test_current_flipped_and_tombstones_cleared(compacted):
    root, stats, victims = compacted
    assert current_build(root) == stats["build_id"]
    assert "-compact1" in stats["build_id"]
    bdir = os.path.join(root, "builds", stats["build_id"])
    assert not os.path.exists(os.path.join(bdir, "tombstones.json"))
    docs = pq.read_table(os.path.join(bdir, "docs"), columns=["doc_id"])
    remaining = set(docs.column("doc_id").to_pylist())
    assert not remaining.intersection(victims)


def test_stats_recomputed(compacted):
    root, stats, victims = compacted
    assert stats["n_docs"] > 0
    assert stats["avgdl"] == stats["base_avgdl"]  # fresh encode-time stats


def test_oracle_parity_post_compaction(compacted, webtext_dir):
    """Post-compaction scores use FRESH statistics: the engine must
    equal an oracle built only over the surviving docs (same ids)."""
    root, stats, victims = compacted
    eng = SearchEngine(root)
    best = {}
    for p in sorted(glob.glob(webtext_dir + "/*.parquet")):
        for r in pq.read_table(p).to_pylist():
            txt = r["text"] if r["text"] else extract_text(r["html"])
            c = canonical_url(r["url"])
            k = (r["warc_ts"], r["url"])
            if c not in best or k < best[c][0]:
                best[c] = (k, unicodedata.normalize("NFC", txt))
    ordered = sorted(best, key=lambda c: (stable_hash64(c), c))
    oracle = OracleEngine()
    for i, c in enumerate(ordered):
        if i not in victims:
            oracle.add(i, best[c][1])
    oracle.finalize()
    assert eng.n_docs == oracle.n_docs
    for q in REFERENCE_QUERIES[::2]:
        assert eng.search_exhaustive(q, 10) == oracle.search(q, 10), q
        assert eng.search_pruned(q, 10) == oracle.search(q, 10), q


def test_phrases_survive_compaction(compacted):
    root, *_ = compacted
    eng = SearchEngine(root)
    assert isinstance(eng.search('"drei zinnen"', 10), list)
    strict = {d for d, _ in eng.search('"payment market"', 10**6)}
    loose = {d for d, _ in eng.search("payment market", 10**6)}
    assert strict <= loose
