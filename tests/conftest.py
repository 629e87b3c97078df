"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import logging
import shutil

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def webtext_dir(tmp_path_factory):
    """t2-small deterministic webtext corpus (cached per session)."""
    from limetrans_ray.sources.webtext import write_webtext

    d = tmp_path_factory.mktemp("webtext")
    write_webtext(str(d), 1500, n_files=3)
    return str(d)


@pytest.fixture(scope="session")
def built_index(ray_session, webtext_dir, tmp_path_factory):
    """One published index build over the t2-small corpus."""
    from limetrans_ray.pipelines.build_index import build_index

    root = str(tmp_path_factory.mktemp("index"))
    stats = build_index(webtext_dir, root)
    return root, stats


@pytest.fixture(scope="session")
def oracle_engine(webtext_dir):
    """Single-process oracle over the same corpus, same dedup/id rules."""
    import unicodedata

    import pyarrow.parquet as pq

    from limetrans_ray.functions.extract import extract_text
    from limetrans_ray.functions.textstats import stable_hash64
    from limetrans_ray.functions.urlnorm import canonical_url
    from limetrans_ray.state.oracle import OracleEngine

    import glob

    best: dict[str, tuple] = {}
    for p in sorted(glob.glob(webtext_dir + "/*.parquet")):
        for r in pq.read_table(p).to_pylist():
            txt = r["text"] if r["text"] else extract_text(r["html"])
            canon = canonical_url(r["url"])
            # same winner key as the engine: (warc_ts, stable url hash) —
            # NOT the raw url string, so a warc_ts tie between two URL
            # variants picks the same winner as compute_winners' lexsort
            key = (r["warc_ts"], stable_hash64(r["url"]))
            if canon not in best or key < best[canon][0]:
                best[canon] = (key, unicodedata.normalize("NFC", txt))
    ordered = sorted(best.items(), key=lambda kv: (stable_hash64(kv[0]), kv[0]))
    return OracleEngine().add_corpus(
        (i, txt) for i, (_canon, (_key, txt)) in enumerate(ordered)
    )


REFERENCE_QUERIES = [
    # single terms
    "holzbau", "atlas", "gebiet", "zinnen", "payment", "web", "xylophone",
    # multi-term AND
    "holzbau atlas", "drei zinnen gebiet", "web search engine",
    "payment market", "query token index", "market report",
    # hyphenated (variant expansion)
    "holzbau-atlas", "drei-zinnen-gebiet", "e-payment", "epayment",
    # folding
    "uber die strasse", "über die straße", "résumé", "resume annee",
    # cross-language
    "recherche données", "zahlung handel", "fromage montagne",
    # frequency-discriminative + ties
    "page", "payment payment", "modern web systems",
]
