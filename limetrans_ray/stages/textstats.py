"""Batch-stage wrappers for the text-analysis functions — each an
actor-pool-friendly callable class (state in ``__init__``, vectorized
``__call__``), extending the reference's per-record normalization
surface (SURVEY.md §2.3/2.10) with training-data operators."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import strip_schema_metadata
from ..functions.standardnum import standard_number
from ..functions.textstats import (
    count_tokens_bpeish,
    detect_language,
    fingerprint64,
    fingerprint_md5,
    quality_features,
)


class LangIdStage:
    """Adds ``lang_pred`` (stop-word-hit heuristic over {en,de,fr})."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = strip_schema_metadata(batch)
        preds = [detect_language(t) for t in batch.column(self.text_col).to_pylist()]
        return batch.append_column("lang_pred", pa.array(preds, pa.string()))


class QualityStage:
    """Adds the quality feature columns + composite score."""

    KEYS = (
        "n_chars", "n_tokens", "punct_ratio", "digit_ratio",
        "stop_ratio", "mean_token_len", "quality",
    )

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = strip_schema_metadata(batch)
        feats = [quality_features(t) for t in batch.column(self.text_col).to_pylist()]
        for key in self.KEYS:
            typ = pa.int64() if key in ("n_chars", "n_tokens") else pa.float64()
            batch = batch.append_column(
                f"q_{key}", pa.array([f[key] for f in feats], typ)
            )
        return batch


class TokenCountStage:
    """Adds ``n_tokens_bpeish`` (words + isolated punctuation)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = strip_schema_metadata(batch)
        counts = np.fromiter(
            (count_tokens_bpeish(t) for t in batch.column(self.text_col).to_pylist()),
            dtype=np.int64,
            count=batch.num_rows,
        )
        return batch.append_column("n_tokens_bpeish", pa.array(counts))


class FingerprintStage:
    """Adds ``fingerprint`` (order-sensitive, hex string — stays
    portable through SQL/pandas without int64 overflow). Two algorithms:
    ``rolling`` (64-bit polynomial rolling hash) and ``md5`` (MD5 of the
    token stream — exactly recomputable by the DuckDB oracle)."""

    def __init__(self, text_col: str = "text", algo: str = "rolling"):
        self.text_col = text_col
        if algo not in ("rolling", "md5"):
            raise ValueError(f"unknown fingerprint algo {algo!r}")
        self.algo = algo

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = strip_schema_metadata(batch)
        texts = batch.column(self.text_col).to_pylist()
        if self.algo == "md5":
            fps = [fingerprint_md5(t) for t in texts]
        else:
            fps = [f"{fingerprint64(t):016x}" for t in texts]
        return batch.append_column("fingerprint", pa.array(fps, pa.string()))


class StandardNumberStage:
    """Adds ``preferred_<type>`` + ``variant_<type>`` (list) columns by
    normalizing a source column with :func:`standard_number` — the
    reference's ``standard_number(TYPE, target, source:)`` fix command
    as a batch stage (StandardNumber.java:56-309). The ISBN range table
    is built once per actor (state-loaded-once, SURVEY.md §2.5)."""

    def __init__(self, number_type: str, source_col: str, *, ranges=None):
        self.number_type = number_type
        self.source_col = source_col
        self.ranges = ranges

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = strip_schema_metadata(batch)
        pref, var = [], []
        for v in batch.column(self.source_col).to_pylist():
            out = (
                standard_number(v, self.number_type, ranges=self.ranges)
                if v is not None
                else None
            )
            pref.append(out["preferred"] if out else None)
            # empty list (not null) keeps the column a plain list type
            # through pandas conversion
            var.append(out["variants"] if out else [])
        t = self.number_type.lower()
        batch = batch.append_column(f"preferred_{t}", pa.array(pref, pa.string()))
        return batch.append_column(
            f"variant_{t}", pa.array(var, pa.list_(pa.string()))
        )
