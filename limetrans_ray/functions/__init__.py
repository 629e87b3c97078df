"""Pure, deterministic per-value / per-batch functions (no Ray state).

Shared batch utility: :func:`strip_schema_metadata` — parquet files
written by pandas embed a ``b'pandas'`` schema-metadata blob that makes
``pa.Schema`` unhashable and knocks Ray Data's schema-dedup fast path
into a per-operator warning; stages that pass a read batch through call
this first (zero-copy)."""

from __future__ import annotations

import pyarrow as pa


def strip_schema_metadata(batch: pa.Table) -> pa.Table:
    if batch.schema.metadata:
        return batch.replace_schema_metadata(None)
    return batch
