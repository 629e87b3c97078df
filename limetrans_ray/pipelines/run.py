"""Settings-driven pipeline runner — the reference ``Main`` analogue.

The reference's primary UX is one JSON settings file naming input
queues, the transformation and the output sink, executed end to end
(reference main/src/main/java/hbz/limetrans/Main.java:33-105,
Limetrans.java:236-316: FileQueue → decoder → Metafix → writer /
Elasticsearch). :func:`run_settings` is that surface over Ray Data:

.. code-block:: json

    {
      "input": {"queue": {
        "path": "/data/marc", "pattern": "*.jsonl",
        "processor": "JSONL",
        "sort_by": "name", "order": "asc", "max": 100,
        "normalize-unicode": true
      }},
      "transformation": {"fix": [
        ["lookup", {"field": "lang", "table": {"de": "German"},
                     "default": "Other"}],
        ["retain", {"fields": ["lang", "title"]}]
      ]},
      "output": {"jsonl": "/out/records.jsonl"}
    }

Instead of inline ``fix`` op tuples, ``"transformation": {"fix-file":
"/rules/alma.fix", "vars": {"member": "49HBZ_X"}}`` compiles a Metafix
``.fix`` TEXT program (the reference's native transformation artifact)
via :mod:`limetrans_ray.functions.fixparser` — includes, macros,
conditionals, maps and all.

Processors (the reference FileQueue.Processor enum,
core/.../FileQueue.java:40-116): ``JSON`` / ``JSONL`` / ``FORMETA`` /
``MARCXML`` / ``MARC21`` / ``SISIS`` decode file blobs onto the shared
flat-row record model and support ``transformation.fix``
(:class:`~limetrans_ray.functions.recordops.RecordOps` programs);
``PARQUET`` reads a columnar documents table directly and ``WEBTEXT``
feeds the flagship page-index build — both columnar processors skip
the record model (their transforms are the relational pipelines).

Outputs: ``jsonl`` (nested-record debug sink, the reference
JsonWriter), ``formeta`` (Metafacture serialization), ``parquet``
(flat rows — the scale sink), ``index`` (inverted-index build; takes
the build options of ``build_index_from_documents`` for PARQUET input
or the flagship ``build_index`` for WEBTEXT, plus the shared
``postings-codec`` (varint|for) and ``retain`` IndexBuildConfig knobs;
unknown options raise).

Settings support ``${placeholder}`` expansion, env profiles and deep
merge via :mod:`limetrans_ray.state.settings`. Blob decoding keeps one
file per batch row, so a record's rows never split across blocks; the
jsonl/formeta sinks still regroup by ``record_id`` (an explicit
groupby) before serializing, so they are correct under any later
repartitioning too.
"""

from __future__ import annotations

import json
import unicodedata
from typing import Any

import pyarrow as pa

from ..sources.file_queue import file_queue


def _decoder(processor: str):
    from ..functions import formeta, jsonrec, marc21, marcxml, multiline

    table = {
        "JSON": lambda b: jsonrec.decode_batch(b, blob_col="blob"),
        "JSONL": lambda b: jsonrec.decode_batch(b, blob_col="blob", lines=True),
        "MARCXML": lambda b: marcxml.decode_batch(b, blob_col="blob"),
        "MARC21": lambda b: marc21.decode_batch(b, blob_col="blob"),
        "SISIS": lambda b: multiline.decode_batch(b, blob_col="blob"),
        "FORMETA": lambda b: multiline.decode_blob_column(
            b, "blob", lambda text, id_prefix: formeta.decode_formeta(text)
        ),
    }
    if processor not in table:
        raise ValueError(
            f"unknown processor {processor!r} (have {sorted(table)} "
            "+ PARQUET/WEBTEXT)"
        )
    return table[processor]


def _normalize_values(batch: pa.Table) -> pa.Table:
    """StreamUnicodeNormalizer analogue (reference FileQueue.java:131,
    182-184, default on): NFC-normalize record values."""
    vals = [
        v if v is None or unicodedata.is_normalized("NFC", v)
        else unicodedata.normalize("NFC", v)
        for v in batch.column("value").to_pylist()
    ]
    return batch.set_column(
        batch.schema.get_field_index("value"), "value", pa.array(vals, pa.string())
    )


def _nest_record(
    rows: list[dict],
    shapes: dict | None = None,
    nest_dots: bool = False,
) -> dict:
    """Flat rows → nested JSON object (the jsonl debug sink's record
    shape, inverse of the JSON decoder's conventions): repeated
    occurrences of a subfield-less field become a list; subfielded
    occurrence groups become (a list of) objects.

    Without ``shapes``/``nest_dots`` (the default), dotted field names
    from deep input nesting stay dotted — the sink is a faithful view
    of the record MODEL, not a byte round-trip of arbitrary JSON. With
    a fix program's compiled shape hints (``array_fields`` /
    ``array_subs`` from :func:`...fixparser.compile_fix`) and
    ``nest_dots=True``, the output reproduces Metafix's JSON encoding:
    ``[]``-declared containers are arrays even with one element, and
    dotted names nest into objects (the reference's JsonEncoder shape,
    reference.fix/alma-107.json)."""
    array_fields = shapes.get("array_fields", ()) if shapes else ()
    array_subs = shapes.get("array_subs", set()) if shapes else set()
    obj: dict[str, Any] = {}
    by_field: dict[str, list[dict]] = {}
    order: list[str] = []
    # per-entity shape markers (recordops._ARR_SUB rows): the write
    # site declared the key an array WITHIN that entity — overrides
    # the program-global hints where branches disagree
    local_arr: set = set()
    for r in rows:
        sub = r.get("subfield")
        if isinstance(sub, str) and sub.startswith("\x1da:"):
            local_arr.add((r["field"], int(r["occurrence"] or 0), sub[3:]))
            continue
        f = r["field"]
        if f not in by_field:
            by_field[f] = []
            order.append(f)
        by_field[f].append(r)
    for f in order:
        grp = sorted(by_field[f], key=lambda r: (r["occurrence"] or 0))
        if all(not r["subfield"] for r in grp):
            vals = [r["value"] for r in grp]
            val = (
                vals
                if len(vals) > 1 or f in array_fields
                else vals[0]
            )
            _insert_path(obj, f, val, nest_dots)
            continue
        by_occ: dict[int, dict] = {}
        for r in grp:
            occ = int(r["occurrence"] or 0)
            ent = by_occ.setdefault(occ, {})
            sub = r["subfield"] or ""
            if sub in ent:
                ent[sub] = (
                    ent[sub] if isinstance(ent[sub], list) else [ent[sub]]
                ) + [r["value"]]
            elif (f, sub) in array_subs or (f, occ, sub) in local_arr:
                ent[sub] = [r["value"]]
            else:
                ent[sub] = r["value"]
        ents = [by_occ[k] for k in sorted(by_occ)]
        val = ents if len(ents) > 1 or f in array_fields else ents[0]
        _insert_path(obj, f, val, nest_dots)
    return obj


def _insert_path(obj: dict, field: str, val, nest_dots: bool) -> None:
    """Place ``val`` under ``field``, splitting dotted names into
    nested objects when ``nest_dots`` is set."""
    if not nest_dots or "." not in field:
        obj[field] = val
        return
    parts = field.split(".")
    cur = obj
    for p in parts[:-1]:
        nxt = cur.get(p)
        if not isinstance(nxt, dict):
            nxt = cur[p] = {}
        cur = nxt
    cur[parts[-1]] = val


def _records_to_lines(ds, serialize):
    """Group flat rows per record, serialize each with
    ``serialize(record_id, rows) -> str``, return a Dataset of
    ``{"record_id", "line"}`` sorted by record id (deterministic sink
    order)."""
    import pandas as pd

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        rows = df.sort_values("occurrence", kind="mergesort").to_dict("records")
        rid = rows[0]["record_id"]
        return pd.DataFrame({"record_id": [rid], "line": [serialize(rid, rows)]})

    return ds.groupby("record_id").map_groups(
        per_group, batch_format="pandas"
    ).sort("record_id")


def run_settings(
    settings: dict | str,
    *,
    env: str | None = None,
    variables: dict | None = None,
    overrides: dict | None = None,
) -> dict:
    """Execute one settings-described pipeline; returns a summary dict
    (one JSON-able line — the job-log contract of ``__main__``)."""
    from ..state.settings import deep_merge, expand_placeholders, load_settings
    from ..state.settings import ENV_PROFILES

    if isinstance(settings, str):
        settings = load_settings(
            settings, env=env, variables=variables, overrides=overrides
        )
    else:
        if env is not None:
            settings = deep_merge(settings, ENV_PROFILES[env])
        if overrides:
            settings = deep_merge(settings, overrides)
        merged_vars = dict(settings.get("vars", {}))
        merged_vars.update(variables or {})
        settings = expand_placeholders(settings, merged_vars)

    q = settings["input"]["queue"]
    processor = q.get("processor", "PARQUET").upper()
    files = file_queue(
        q.get("path", "."),
        q.get("pattern"),
        patterns=q.get("patterns"),
        sort_by=q.get("sort_by", "lastmodified"),
        order=q.get("order", "asc"),
        max_files=q.get("max"),
        max_age_days=q.get("max-age"),
    )
    if not files:
        raise ValueError(f"input queue matched no files: {q}")
    tr = settings.get("transformation") or {}
    fix = tr.get("fix")
    if tr.get("fix-file"):
        # a transformation program file — the reference's native
        # artifact, with its engine selected by extension exactly like
        # Limetrans.java:155-189 (.fix → Metafix text parser, .xml →
        # Metamorph rule loader); compiled once here, broadcast as the
        # op-list
        if fix:
            raise ValueError("transformation: give fix OR fix-file, not both")
        if str(tr["fix-file"]).endswith(".xml"):
            from ..functions.morphparser import load_morph

            fix = load_morph(
                tr["fix-file"],
                vars=tr.get("vars"),
                missing_maps=tr.get("missing-maps", "error"),
            )
        else:
            from ..functions.fixparser import load_fix_file

            fix = load_fix_file(
                tr["fix-file"],
                vars=tr.get("vars"),
                missing_maps=tr.get("missing-maps", "error"),
            )
    out_cfg = settings.get("output") or {}
    if len(out_cfg) != 1:
        raise ValueError(
            "output needs exactly one of jsonl/formeta/parquet/index, "
            f"got {sorted(out_cfg)}"
        )
    summary: dict[str, Any] = {"processor": processor, "files": len(files)}

    import ray.data as rd

    if processor in ("PARQUET", "WEBTEXT"):
        if fix:
            raise ValueError(
                "transformation.fix applies to record processors; columnar "
                "input transforms are the relational/indexing pipelines"
            )
        if "index" in out_cfg:
            from .build_index import IndexBuildConfig

            idx = dict(out_cfg["index"])
            root = idx.pop("root")
            cfg = IndexBuildConfig(
                postings_codec=idx.pop("postings-codec", "varint"),
                retain=int(idx.pop("retain", IndexBuildConfig.retain)),
                merge_exchange=idx.pop(
                    "merge-exchange", IndexBuildConfig.merge_exchange
                ),
            )
            if processor == "WEBTEXT":
                from .build_index import build_index

                if set(idx):
                    raise ValueError(f"unknown index options {sorted(idx)}")
                stats = build_index(files, root, config=cfg)
            else:
                from .build_index import build_index_from_documents

                fields = [tuple(f) for f in idx.pop("fields", [])] or None
                id_col = idx.pop("id-col", "doc_id")
                text_col = idx.pop("text-col", "text")
                analyzer = idx.pop("analyzer", "full")
                if set(idx):
                    raise ValueError(f"unknown index options {sorted(idx)}")
                stats = build_index_from_documents(
                    rd.read_parquet(files), root,
                    id_col=id_col,
                    text_col=text_col,
                    analyzer=analyzer,
                    fields=fields,
                    config=cfg,
                )
            summary.update(output=root, n_docs=int(stats["n_docs"]))
            return summary
        if "parquet" in out_cfg:
            rd.read_parquet(files).write_parquet(out_cfg["parquet"])
            summary.update(output=out_cfg["parquet"])
            return summary
        raise ValueError(f"unsupported columnar output {sorted(out_cfg)}")

    decode = _decoder(processor)
    blobs = rd.read_binary_files(files).map_batches(
        lambda b: pa.table({"blob": b.column("bytes")}), batch_format="pyarrow"
    )
    rows = blobs.map_batches(decode, batch_format="pyarrow")
    if q.get("normalize-unicode", True):
        rows = rows.map_batches(_normalize_values, batch_format="pyarrow")
    if fix:
        from ..functions.recordops import RecordOps

        rows = rows.map_batches(
            RecordOps([(name, kw) for name, kw in fix]), batch_format="pyarrow"
        )

    if "parquet" in out_cfg:
        rows.write_parquet(out_cfg["parquet"])
        summary.update(output=out_cfg["parquet"])
        return summary
    if "jsonl" in out_cfg:
        lines = _records_to_lines(
            rows, lambda rid, rs: json.dumps({"_id": rid, **_nest_record(rs)})
        )
        path = out_cfg["jsonl"]
    elif "formeta" in out_cfg:
        from ..functions.formeta import encode_record_strings

        lines = _records_to_lines(
            rows, lambda _rid, rs: encode_record_strings(rs)[0]
        )
        path = out_cfg["formeta"]
    else:
        raise ValueError(f"unsupported record output {sorted(out_cfg)}")
    n = 0
    with open(path, "w") as fh:  # streamed — never whole-corpus on driver
        for batch in lines.iter_batches(batch_format="pyarrow"):
            for line in batch.column("line").to_pylist():
                fh.write(line + "\n")
                n += 1
    summary.update(output=path, records=n)
    return summary
