"""limetrans_ray — a Ray-Data-native extract→transform→index + BM25 engine.

A from-scratch rebuild of the capabilities of hbz/limetrans (a
Metafacture-based extract–transform–Elasticsearch-index pipeline, see
SURVEY.md) as an idiomatic Ray Data engine over Common-Crawl-style
Parquet webtext:

- ``functions/``  — pure, deterministic per-value / per-batch functions
  (HTML text extraction, analyzer chain, URL canonicalization,
  varint/block-max posting codecs, text statistics, filter grammar).
- ``sources/``    — deterministic synthetic webtext fixture generator and
  read helpers (the reference's FileQueue analogue).
- ``stages/``     — map_batches stage callables / actor-pool classes
  (normalize, tokenize, invert, dedup, ANN, multimodal stubs).
- ``pipelines/``  — end-to-end Dataset pipelines (index build, search,
  dedup suite, relational analogues of limetrans' per-record operators).
- ``state/``      — index segment/manifest IO, BM25 math, the
  single-process pure-Python oracle engine used for rank-identity tests.

Nothing in this package calls ``ray.init`` / ``ray.shutdown``; sessions
are owned by the driver, ``bench.py`` and the pytest fixture only.
"""

__version__ = "0.1.0"

ANALYZER_VERSION = 3  # v3: stemmer region fix (protected U/Y are consonants)
FORMAT_VERSION = 2  # v2: positional postings (pos_enc) for phrase queries


def _silence_schema_hash_noise() -> None:
    """Drop Ray Data's per-block "Failed to hash the schemas" warning.

    pyarrow Schemas carrying key-value metadata (e.g. the ``b'pandas'``
    blob every pandas-written parquet embeds) are unhashable, so Ray's
    ``unify_schemas`` fast path logs this once per operator on any read
    of such files — pure noise that buries real warnings. Our own batch
    stages strip the metadata (restoring the fast path); this filter
    covers blocks coming straight from ``read_parquet``. Scoped to the
    one logger and the one message."""
    import logging

    class _F(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            return "Failed to hash the schemas" not in record.getMessage()

    logging.getLogger(
        "ray.data._internal.arrow_ops.transform_pyarrow"
    ).addFilter(_F())


_silence_schema_hash_noise()
