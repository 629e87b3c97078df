"""SISIS_SUPER parent-child stitching as a Ray-native join.

The reference's ``SisisSuperFilter`` buffers EVERY record open until
end-of-stream, builds id maps, then replays each child record with its
parent's title/id fields appended (reference core/src/main/java/hbz/
limetrans/util/SisisSuperFilter.java:60-147) — a single-JVM
materialize-everything join. Here the same semantics are one
``Dataset.join``: records become rows once (multiline decode), the
parent projection is keyed by record id, children hash-join to their
referenced parent — no full materialization, shuffle-partitioned on the
join key, works at any corpus size.

Conventions (parametrized; the reference hard-codes SISIS field
numbers): a record's ``ref_field`` value points at its parent's
``record_id``; records that carry ``super_field`` are themselves
superordinate works and are not stitched (the reference skips records
present in mSupIdMap).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def record_projection(
    rows: rd.Dataset,
    fields: dict[str, str],
) -> rd.Dataset:
    """Pivot flat (record_id, field, value) rows into one row per
    record with the requested ``{out_col: field_number}`` columns
    (first occurrence wins — the id/title fields are single-valued in
    SISIS data). Grouped per record id; groups are tiny, the groupby
    key bounds the shuffle."""
    wanted = {v: k for k, v in fields.items()}

    def pivot(group: pa.Table) -> pa.Table:
        rid = group.column("record_id")[0].as_py()
        out = {"record_id": rid}
        fs = group.column("field").to_pylist()
        vs = group.column("value").to_pylist()
        occ = group.column("occurrence").to_pylist()
        for f, v, o in zip(fs, vs, occ):
            col = wanted.get(f)
            if col is not None and o == 0 and col not in out:
                out[col] = v
        schema = pa.schema(
            [pa.field("record_id", pa.string())]
            + [pa.field(c, pa.string()) for c in fields]
        )
        return pa.Table.from_pylist([out], schema=schema)

    return rows.groupby("record_id").map_groups(pivot, batch_format="pyarrow")


def stitch_parent_child(
    rows: rd.Dataset,
    *,
    ref_field: str = "0004",
    super_field: str = "0002",
    title_field: str = "0331",
    rec_id_field: str = "0010",
    super_prefix: str = "(DE-605)",
    num_partitions: int = 16,
) -> rd.Dataset:
    """Children (have ``ref_field``, lack ``super_field``) joined to
    their parents' title/id: returns one row per stitched child
    (record_id, rec_id, title, parent_title, super_record_id)."""
    recs = record_projection(
        rows,
        {
            "ref_id": ref_field,
            "super_id": super_field,
            "title": title_field,
            "rec_id": rec_id_field,
        },
    )
    children = recs.filter(
        lambda r: r["ref_id"] is not None and r["super_id"] is None
    ).select_columns(["record_id", "ref_id", "title", "rec_id"])
    parents = recs.select_columns(["record_id", "title", "rec_id"]).rename_columns(
        {"record_id": "p_record_id", "title": "parent_title", "rec_id": "p_rec_id"}
    )
    joined = children.join(
        parents,
        join_type="inner",
        num_partitions=num_partitions,
        on=("ref_id",),
        right_on=("p_record_id",),
    )

    def finish(batch: pa.Table) -> pa.Table:
        sup = pc.binary_join_element_wise(
            pa.array([super_prefix] * batch.num_rows),
            batch.column("p_rec_id").cast(pa.string()),
            "",
        )
        return pa.table(
            {
                "record_id": batch.column("record_id"),
                "rec_id": batch.column("rec_id"),
                "title": batch.column("title"),
                "parent_title": batch.column("parent_title"),
                "super_record_id": sup,
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def supplement_map(
    rows: rd.Dataset,
    *,
    id_field: str = "0010",
    value_field: str = "0331",
    join_with: str = " ; ",
) -> dict[str, str]:
    """The SisisSupplement analogue (reference core/src/main/java/hbz/
    limetrans/util/SisisSupplement.java:36-130): build a lookup map from
    decoded SISIS rows — record's ``id_field`` value → all its
    ``value_field`` occurrences joined in occurrence order. The result
    is a plain dict for ``LookupStage``/``ray.put`` broadcast (or feed
    it to ``DiskMap.build`` when it outgrows the heap)."""
    wanted = rows.filter(
        lambda r: r["field"] in (id_field, value_field)
    ).select_columns(["record_id", "field", "occurrence", "value"])

    def per_record(group: pa.Table) -> pa.Table:
        fs = group.column("field").to_pylist()
        vs = group.column("value").to_pylist()
        occ = group.column("occurrence").to_pylist()
        rid = None
        vals = []
        for f, v, o in sorted(zip(fs, vs, occ), key=lambda x: (x[0], x[2])):
            if f == id_field and rid is None:
                rid = v
            elif f == value_field:
                vals.append(v)
        if rid is None or not vals:
            return pa.table(
                {"k": pa.array([], pa.string()), "v": pa.array([], pa.string())}
            )
        return pa.table(
            {"k": pa.array([rid], pa.string()),
             "v": pa.array([join_with.join(vals)], pa.string())}
        )

    out = wanted.groupby("record_id").map_groups(per_record, batch_format="pyarrow")
    tbl = out.to_pandas()
    return dict(zip(tbl["k"], tbl["v"]))
