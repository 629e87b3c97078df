"""Lookup stage — the Metafix ``lookup(path, map[, delete])`` operator
(SURVEY.md §2.3; reference usage counts: 45 ``lookup`` calls across the
transformation rules, with optional drop-on-miss).

One batch stage covers the reference's three map residencies:

- inline/broadcast dict (the common case — ship once via ``ray.put``),
- out-of-core :class:`~limetrans_ray.state.diskmap.DiskMap` directory
  (maps ≫ RAM: opened read-only per actor, mmap-shared per node — the
  ``put_lmdbmap`` path),

and the three miss policies:

- ``keep``    — misses become null (the reference's default),
- ``delete``  — rows whose key misses are DROPPED (``lookup(...,
  delete)``; semi-join-with-projection semantics),
- ``default`` — misses take a constant fallback value.
"""

from __future__ import annotations

import pyarrow as pa
import ray

from ..state.diskmap import DiskMap
from . import strip_schema_metadata


class LookupStage:
    """map_batches callable: adds ``target_col`` = map[source_col].

    Exactly one of ``table`` (plain dict), ``table_ref`` (``ray.put``
    ObjectRef of a dict) or ``diskmap_path`` must be given. State is
    resolved once per actor/task on first call (SURVEY.md §2.5)."""

    def __init__(
        self,
        source_col: str,
        target_col: str,
        *,
        table: dict | None = None,
        table_ref=None,
        diskmap_path: str | None = None,
        on_miss: str = "keep",
        default: str | None = None,
    ):
        if sum(x is not None for x in (table, table_ref, diskmap_path)) != 1:
            raise ValueError("give exactly one of table / table_ref / diskmap_path")
        if on_miss not in ("keep", "delete", "default"):
            raise ValueError(f"unknown on_miss policy {on_miss!r}")
        self.source_col = source_col
        self.target_col = target_col
        self._table = table
        self._ref = table_ref
        self._diskmap_path = diskmap_path
        self.on_miss = on_miss
        self.default = default
        self._map = None

    def _resolve(self):
        if self._map is None:
            if self._table is not None:
                self._map = self._table
            elif self._ref is not None:
                self._map = ray.get(self._ref)
            else:
                self._map = DiskMap.open(self._diskmap_path)
        return self._map

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = strip_schema_metadata(batch)
        m = self._resolve()
        keys = batch.column(self.source_col).to_pylist()
        if isinstance(m, DiskMap):
            vals = m.get_many(keys)
        else:
            vals = [m.get(k) for k in keys]
        if self.on_miss == "default":
            vals = [self.default if v is None else v for v in vals]
        out = batch.append_column(self.target_col, pa.array(vals, pa.string()))
        if self.on_miss == "delete":
            mask = pa.array([v is not None for v in vals])
            out = out.filter(mask)
        return out
