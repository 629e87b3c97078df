"""Vectorized Metafix-style record operators over the flat-row model.

The reference's transform layer is a ~20k-line Metafix program of
per-record commands (copy_field/move_field/add_field/remove_field,
lookup, replace_all, paste, uniq, retain — usage counts in SURVEY.md
§2.3; semantics per the Metafix command reference exercised by
reference main/src/main/resources/transformation/alma.fix). This module
re-expresses that command surface as VECTORIZED batch transforms over
the shared flat-row record table

    (record_id, field, subfield, occurrence, value)

that the MARC-XML / SISIS / Formeta decoders emit — a "fix program" is
a list of op tuples compiled once per actor (:class:`RecordOps`) and
applied per batch with pandas/pyarrow column ops, never a Python loop
over records.

PARTITIONING ASSUMPTION (documented per the scale rules): per-record
ops (``paste``, ``add_field``, occurrence renumbering) require a
record's rows to be complete within one batch. The decoders emit whole
records per input blob, so composing ``decode_batch`` → ``RecordOps``
in one ``map_batches`` chain preserves this; after a repartition or
shuffle, co-locate first with ``groupby("record_id")``.

Supported ops (name, kwargs):

- ``("copy_field", {"src": f, "dst": g})``   — duplicate rows of f as g
- ``("move_field", {"src": f, "dst": g})``   — rename f to g
- ``("add_field",  {"field": f, "value": v, "subfield": s?})`` — one new
  row per record
- ``("remove_field", {"field": f, "subfield": s?})`` — drop rows
  (subfield omitted = the whole field)
- ``("replace_all", {"field": f, "pattern": p, "replacement": r})`` —
  regex substitution on values of f (all occurrences, like Metafix)
- ``("lookup", {"field": f, "table": {..}, "default": d?, "delete": bool?})``
  — map values of f through a table; misses keep the value (default),
  get ``default`` if given, or drop the row with ``delete=True``
  (the reference's ``lookup(..., delete)``)
- ``("paste", {"dst": g, "srcs": [f1, f2...], "join_char": " "})`` — per
  record, join the FIRST occurrence value of each src (missing srcs
  skipped) into one new g row — Metafix ``paste`` semantics
- ``("uniq", {"field": f})`` — drop repeated (subfield, value) rows of f
  within a record, first occurrence wins
- ``("retain", {"fields": [..]})`` — whitelist fields (the terminal
  ``retain(...)`` of alma.fix:1173-1296)
- ``("reject_if", {"field": f, "pattern": p})`` — drop WHOLE records
  where any value of f matches (Metafix ``reject`` inside an ``if``)
- ``("add_array", {"field": f, "values": [..], "subfield": s?})`` — per
  record, one new row per value; the flat-row model has no empty
  containers, so ``add_array("x[]")`` with no values is a no-op until
  something appends (matches the reference idiom alma.fix:57-68 where
  ``add_array`` + ``do ... add_hash($append)`` build the array)
- ``("add_hash", {"field": f, "entries": {sub: val, ..}})`` — per
  record, one new row per (subfield, value) pair; repeated add_hash on
  the same field yields successive occurrence numbers per subfield —
  element *i* of the reference's ``field[].$append`` hash array is the
  occurrence-*i* row set here
- ``("vacuum", {})`` — drop rows whose value is null/empty (Metafix
  ``vacuum``: prune empty leaves)
- ``("parse_text", {"field": f, "pattern": p})`` — regex with NAMED
  groups (alma.fix:1090): each matching row of f is replaced by one
  row per named group (field = group name); non-matching rows are kept
  unchanged
- ``("do_list", {"field": f, "ops": [..]})`` — Metafix
  ``do list(path, var)``: run a sub-program scoped to the rows of f
  only (all occurrences — the flat-row analogue of per-element
  iteration; sub-ops reference field f directly where the reference
  references the loop variable), other fields untouched
- ``("prepend", {"field": f, "value": v})`` / ``("append", ...)`` —
  prefix/suffix every value of f (Metafix prepend/append)
- ``("drop_local", {"member": code})`` — the reference's custom
  ``drop_local()`` (main/.../function/DropLocal.java:19-58; alma.fix:23):
  drop every field OCCURRENCE (entity) whose subfield ``9`` value is
  ``LOCAL`` or matches ``[A-Z]:[0-9]+[a-z]?`` AND whose subfield ``M``
  exists with a value ≠ this member's code; entities without a ``9``
  hit, without an ``M``, or owned by this member survive
- ``("drop_repeated", {"field": f, "index": n?})`` — the reference's
  ``drop_repeated(field, index: n)`` (DropRepeated.java:13-32;
  alma.fix:24): collapse a REPEATED field to its n-th occurrence
  (1-based, default 1); a field with a single occurrence is untouched
  (the reference only rewrites array values)
- ``("if_member_local", {"field": f, "member": m, "ops": [..]})`` —
  the reference's ``member_local(path)`` predicate
  (MemberLocal.java:15-35; alma.fix:412,646) guarding a sub-program:
  records where ``f.M`` is absent OR any ``f.M`` value equals the
  member code run the sub-ops; other records pass through unchanged
- ``("substring", {"field": f, "start": i, "length": n?})`` — slice
  values of f (0-based start, to end when length omitted)
- ``("trim", {"field": f})``, ``("upcase", {"field": f})``,
  ``("downcase", {"field": f})`` — whitespace strip / case fold
- ``("join_field", {"field": f, "join_char": jc?})`` — Metafix
  ``join_field(path, separator)``: collapse a record's repeated values
  of f to ONE row (stable order, placed at the field's first row)
- ``("split_field", {"field": f, "pattern": p})`` — Metafix
  ``split_field(path, regexp)``: split each value into one row per
  part, in place
- ``("filter_values", {"field": f, "pattern": p, "invert": bool?})`` —
  Metafix ``filter(path, regexp)``: keep only values of f containing a
  regex match (marc/_facet_type-2.fix:130-144 array-value filtering)

(Metafix ``flatten`` is inherent here: the flat-row model has no
nesting to flatten.)

Occurrences are renumbered per (record_id, field, subfield) after the
program runs, in stable row order.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from .multiline import ROW_SCHEMA

_KNOWN = {
    "copy_field", "move_field", "add_field", "remove_field", "replace_all",
    "lookup", "paste", "uniq", "retain", "reject_if",
    "add_array", "add_hash", "vacuum", "parse_text", "do_list",
    "prepend", "append", "substring", "trim", "upcase", "downcase",
    "drop_local", "drop_repeated", "if_member_local",
    "if", "reject", "do_list_elements", "verify_links",
    "join_field", "split_field", "filter_values", "standard_number",
    # Metamorph-vocabulary ops (functions/morphparser.py):
    # switch_name_value — swap field ↔ value on the selected rows
    #   (Metamorph <switch-name-value/>)
    # regexp_match — Metamorph <regexp match [format]>: rows whose value
    #   has NO match are dropped from the stream; matching rows' value
    #   becomes the match (or the format with ${n} group substitution)
    "switch_name_value", "regexp_match",
    # take_occurrence — Metamorph <occurrence only="N" [sameEntity]>:
    #   keep only the Nth (1-based) matching value per record, or per
    #   entity when same_entity (Occurrence.java counter semantics)
    # unique_values — Metamorph <unique/>: drop repeated values of the
    #   selected source within a record, first wins
    "take_occurrence", "unique_values",
    # morph_stream — a whole Metamorph collector program as one
    #   per-record event machine (functions/morphstream.py): REPLACES
    #   the record's rows with the program's whitelist output
    "morph_stream",
    # new_entity — OPEN a fresh entity of a field (bare Metafix
    # ``add_hash("X[].$append")``): a placeholder row that $last
    # destinations join; placeholders are dropped when the TOP-LEVEL
    # program finishes (the flat model has no empty containers)
    "new_entity",
}

# placeholder subfield marking an opened-but-still-empty entity
_PH_SUB = "\x1dph"

# per-entity array-shape marker subfield prefix: a row
# (record, field, "\x1da:<key>", occ, "\x1d") declares <key> an array
# within that entity — emitted by []-marked write sites, consumed by
# the JSON nester (pipelines/run.py::_nest_record)
_ARR_SUB = "\x1da:"

# subfield-slot sentinel carrying a 1-based array-index selector
# ("@arr.N" paths); produced by fixparser._split_selector
_IDX_SEL = "\x1didx:"

# predicates usable in ("if", {"pred": (name, kw), ...}) — the Metafix
# conditional surface (reference alma.fix:44,177-216 if/elsif/unless
# chains); "not" wraps any other predicate (Metafix ``unless``).
# The quantifier families complete symmetrically: any_* (some value),
# none_* (no value — absent field qualifies), all_* (field present and
# EVERY value qualifies).
_PREDICATES = {
    "exists", "any_match", "any_equal", "any_contain", "none_match",
    "none_equal", "none_contain", "all_match", "all_equal", "all_contain",
    "not",
    # structural/membership (reference alma.fix:304,759,1092 via fixparser):
    # is_empty  — no non-empty value at the path (absent field qualifies)
    # is_array  — the path is repeated (>1 row; KNOWN DEVIATION: the flat
    #             row model cannot see a 1-element array as an array)
    # is_hash   — some row of the path carries a subfield
    # in        — some value of the path equals some value of other path
    # const     — compile-time-constant truth (str_equal on bound vars)
    # member_local — MemberLocal.java:24-34: field.M absent or any
    #                field.M equals the member code
    "is_empty", "is_array", "is_hash", "in", "const", "member_local",
}

# DropLocal.java:23-25: LOCAL literal or [A-Z]:[0-9]+[a-z]? (full match)
_LOCAL_RX = r"(?:LOCAL|[A-Z]:[0-9]+[a-z]?)\Z"


def _selector_rx(sel: str) -> str:
    """Metafix field-selector → regex: ``?`` is a single-character
    wildcard, ``[...]`` a character class (taken verbatim), ``|``
    separates alternatives (``do list(path: "260??|264?[ 13]")``,
    reference marc/publisherName.fix:2). Everything else is literal."""
    alts = []
    for alt in sel.split("|"):
        rx = []
        i = 0
        while i < len(alt):
            c = alt[i]
            if c == "?":
                rx.append(".")
            elif c == "[":
                end = alt.find("]", i + 1)
                if end > 0:
                    rx.append(alt[i:end + 1])
                    i = end
                else:
                    rx.append(re.escape(c))
            else:
                rx.append(re.escape(c))
            i += 1
        alts.append("".join(rx))
    return "|".join(alts) if len(alts) == 1 else "|".join(
        f"(?:{a})" for a in alts
    )


def _sel_mask(df: pd.DataFrame, field: str, subfield=None) -> pd.Series:
    """Row-selection mask for a (field, subfield?) selector. A ``?`` in
    the field name is a single-character wildcard (the Metafix path
    convention for MARC indicators, e.g. ``348??`` — reference
    alma.fix:43), ``[...]`` a character class, ``|`` an alternation;
    subfield ``None`` selects every subfield."""
    if field == "*":
        # match-all selector (Metamorph <data source="*">, Metafix "*")
        m = pd.Series(True, index=df.index)
    elif "?" in field or "|" in field or "[" in field:
        m = df["field"].str.fullmatch(_selector_rx(field), na=False)
    else:
        m = df["field"] == field
    if subfield is not None:
        if subfield.startswith(_IDX_SEL):
            # 1-based element-index selector ("@arr.N", Metafix array
            # index paths — marc/extent.fix:17-29 @300a.1/@300a.2):
            # the Nth matching row per record, in stable row order
            n = int(subfield[len(_IDX_SEL):])
            pos = df.loc[m].groupby(df.loc[m, "record_id"], sort=False).cumcount()
            keep = pos == n - 1
            m = m.copy()
            m.loc[m] = keep.to_numpy()
        elif "?" in subfield or "|" in subfield or "[" in subfield:
            m = m & df["subfield"].str.fullmatch(
                _selector_rx(subfield), na=False
            )
        else:
            m = m & (df["subfield"] == subfield)
    return m


def _java_split_trim(parts):
    """Mirror Java ``String.split`` semantics (reference SplitField runs on
    the JVM): trailing empty strings are dropped — except an input the
    pattern never matched, which Java returns whole (so a len<=1 result is
    untouched, keeping ``"" -> [""]``)."""
    if not isinstance(parts, list) or len(parts) <= 1:
        return parts
    out = list(parts)
    while out and out[-1] == "":
        out.pop()
    return out


def _pred_ids(df: pd.DataFrame, pred: tuple[str, dict]) -> set:
    """Record ids (within ``df``) satisfying a Metafix predicate.

    - ``exists(f)``       — any row of f
    - ``any_match(f, p)`` — any value of f fully matches regex p
      (Java ``matches()`` semantics — alma.fix patterns carry their
      own ``.*`` wrappers)
    - ``any_equal(f, v)`` / ``any_contain(f, v)`` — exact / substring
    - ``none_match(f, p)`` — no value of f matches (records without f
      qualify)
    - ``not(pred)``       — complement (Metafix ``unless``)
    """
    name, kw = pred
    if name not in _PREDICATES:
        raise ValueError(f"unknown record predicate {name!r}")
    if kw.get("last_only"):
        # "$last"-scoped predicate: evaluate over the newest entity of
        # the field only (per record), plus all other fields untouched
        sel = _sel_mask(df, kw["field"], None)
        if sel.any():
            rows = df.loc[sel]
            last = rows.groupby("record_id")["occurrence"].transform("max")
            drop = sel.copy()
            drop.loc[sel] = (rows["occurrence"] != last).to_numpy()
            df = df[~drop]
        kw = {k: v for k, v in kw.items() if k != "last_only"}
        pred = (name, kw)
    all_ids = set(df["record_id"].unique())
    if name == "not":
        return all_ids - _pred_ids(df, kw["pred"])
    if name == "const":
        return all_ids if kw["value"] else set()
    if name == "is_empty":
        sel = _sel_mask(df, kw["field"], kw.get("subfield"))
        nonempty = sel & df["value"].fillna("").ne("")
        return all_ids - set(df.loc[nonempty, "record_id"])
    if name == "is_array":
        sel = _sel_mask(df, kw["field"], kw.get("subfield"))
        counts = df.loc[sel].groupby("record_id", sort=False).size()
        return set(counts.index[counts > 1])
    if name == "is_hash":
        sel = _sel_mask(df, kw["field"], kw.get("subfield"))
        hashy = sel & df["subfield"].fillna("").ne("")
        return set(df.loc[hashy, "record_id"])
    if name == "in":
        sel_a = _sel_mask(df, kw["field"], kw.get("subfield"))
        sel_b = _sel_mask(df, kw["other_field"], kw.get("other_subfield"))
        a = df.loc[sel_a, ["record_id", "value"]]
        b = df.loc[sel_b, ["record_id", "value"]]
        hit = a.merge(b, on=["record_id", "value"])
        return set(hit["record_id"])
    if name == "member_local":
        m_rows = df[_sel_mask(df, kw["field"], "M")]
        has_m = set(m_rows["record_id"])
        m_eq = set(m_rows.loc[m_rows["value"] == str(kw["member"]), "record_id"])
        return (all_ids - has_m) | m_eq
    if name.startswith("none_"):
        return all_ids - _pred_ids(df, ("any_" + name[5:], kw))
    if name.startswith("all_"):
        # field present AND no non-qualifying value: exists \ any_not
        exists = _pred_ids(df, ("exists", kw))
        sel = _sel_mask(df, kw["field"], kw.get("subfield"))
        base = name[4:]
        if base == "match":
            bad = sel & ~df["value"].str.fullmatch(kw["pattern"], na=False)
        elif base == "equal":
            bad = sel & (df["value"] != kw["value"])
        else:  # all_contain
            bad = sel & ~df["value"].str.contains(
                kw["value"], regex=False, na=False
            )
        return exists - set(df.loc[bad, "record_id"])
    sel = _sel_mask(df, kw["field"], kw.get("subfield"))
    if name == "exists":
        hit = sel
    elif name == "any_match":
        hit = sel & df["value"].str.fullmatch(kw["pattern"], na=False)
    elif name == "any_equal":
        hit = sel & (df["value"] == kw["value"])
    else:  # any_contain
        hit = sel & df["value"].str.contains(kw["value"], regex=False, na=False)
    return set(df.loc[hit, "record_id"])


def _entity_key(df: pd.DataFrame) -> pd.Series:
    """(record_id, field, occurrence) composite key — one value per
    entity (a repeated field's occurrence groups its subfield rows)."""
    return (
        df["record_id"].astype(str)
        + "\x1d" + df["field"].astype(str)
        + "\x1d" + df["occurrence"].astype(str)
    )


def _first_occurrence_values(
    df: pd.DataFrame, field: str, subfield=None
) -> pd.Series:
    """record_id → value of the selector's first row."""
    sub = df[_sel_mask(df, field, subfield)]
    return sub.groupby("record_id", sort=False)["value"].first()


def _last_entity_occ(
    df: pd.DataFrame, dst_field: str, rec_ids: pd.Series, fresh: int
) -> pd.Series:
    """Occurrence values attaching rows to the LAST existing entity of
    ``dst_field`` per record (Metafix ``$last`` / plain-dotted-path
    getOrCreate semantics); records without one get a fresh entity."""
    existing = df.loc[_sel_mask(df, dst_field)]
    last = existing.groupby("record_id")["occurrence"].max()
    return rec_ids.map(last).fillna(fresh).astype(np.int64)


def _family_resubfield(rows: pd.DataFrame, src: str, suffixes) -> None:
    """Dotted hash children follow an entity copy/move as dst
    SUBFIELDS: a row of field "src.key" (written without $-marker
    paths) becomes subfield "key" (joined with its own subfield when
    present) — macros.fix subject-common builds "@rswk.subjectGeoName"
    style hashes that move_field("@rswk", "RSWK[].$append") collects."""
    child = (rows["field"] != src).to_numpy()
    if not child.any():
        return
    suf = suffixes.to_numpy(dtype=object)
    own = rows["subfield"].to_numpy(dtype=object)
    newsub = own.copy()
    for i in np.nonzero(child)[0]:
        s_ = suf[i]
        newsub[i] = s_ if own[i] is None or (
            isinstance(own[i], float) and np.isnan(own[i])
        ) else f"{s_}.{own[i]}"
    rows["subfield"] = newsub


def apply_ops(
    df: pd.DataFrame, ops: list[tuple[str, dict]], _top: bool = True
) -> pd.DataFrame:
    """Run a fix program over a flat-row record frame (whole records
    per the module-level partitioning assumption). ``_top`` is internal:
    sub-programs (do-list bodies, if branches) pass False so entity
    placeholders survive until the top-level program finishes."""
    df = df.reset_index(drop=True)
    for name, kw in ops:
        if name not in _KNOWN:
            raise ValueError(f"unknown record op {name!r}")
        if name == "copy_field":
            fam_suffix = None
            sel = _sel_mask(df, kw["src"], kw.get("src_sub"))
            if (
                kw.get("src_sub") is None and "dst_sub" not in kw
                and not any(c in kw["src"] for c in "?|[")
            ):
                # ENTITY copy of a hash: dotted children
                # ("@rswk.subjectGeoName" rows written without $-marker
                # paths, macros.fix:68-130 subject-common) belong to
                # the hash and follow the copy as dst SUBFIELDS
                child = df["field"].str.startswith(kw["src"] + ".")
                if child.any():
                    fam_suffix = df["field"].str.slice(len(kw["src"]) + 1)
                    sel = sel | child
            rows = df[sel].copy()
            if len(rows):
                # a COPY is a fresh row even when its source is a
                # do-list context or loop row: clear inherited loop
                # tracking — including enclosing loops' STASHED
                # ("__o"-prefixed) columns — so every merge level
                # treats it as created (a copy of a context row must
                # not be dropped as a context copy)
                for c in rows.columns:
                    if c.startswith("__"):
                        rows[c] = np.nan
                if fam_suffix is not None:
                    _family_resubfield(rows, kw["src"], fam_suffix[sel])
                # attachment: "last" joins the record's existing dst
                # entity (creating one if absent); otherwise each SOURCE
                # entity becomes one fresh dst entity (append — never
                # merged into an existing dst entity of the same index);
                # a copy WITHIN the same field stays in-entity. A hash
                # FAMILY is one entity per record.
                if kw.get("dst_mode") == "last":
                    rows["occurrence"] = _last_entity_occ(
                        df, kw["dst"], rows["record_id"], _fresh_base(df)
                    )
                elif fam_suffix is not None:
                    rows["occurrence"] = _fresh_base(df) + pd.factorize(
                        rows["record_id"]
                    )[0]
                elif "dst_sub" in kw and kw["dst_sub"] is None \
                        and kw.get("dst_mode") == "append":
                    # VALUE append ("@callnumber.$append"): every copied
                    # value is its own array element, even when several
                    # source rows share one entity ($i.[bcn] subfields,
                    # alma.fix:1031-1036 — uniq must see separate
                    # elements to drop the duplicate callnumber)
                    rows["occurrence"] = _fresh_base(df) + np.arange(
                        len(rows)
                    )
                elif (rows["field"] != kw["dst"]).any():
                    rows["occurrence"] = _fresh_base(df) + pd.factorize(
                        _entity_key(rows)
                    )[0]
                rows["field"] = kw["dst"]
                if "dst_sub" in kw:  # explicit dst selector (fix-compiled);
                    rows["subfield"] = kw["dst_sub"]  # absent = keep src's
                frames = [df, rows]
                if kw.get("dst_arr") and kw.get("dst_sub") is not None:
                    mk = rows.drop_duplicates(
                        ["record_id", "occurrence"]
                    ).copy()
                    mk["subfield"] = _ARR_SUB + kw["dst_sub"]
                    mk["value"] = "\x1d"
                    frames.append(mk)
                df = pd.concat(frames, ignore_index=True)
        elif name == "move_field":
            fam_suffix = None
            sel = _sel_mask(df, kw["src"], kw.get("src_sub"))
            if (
                kw.get("src_sub") is None and "dst_sub" not in kw
                and not any(c in kw["src"] for c in "?|[")
            ):
                child = df["field"].str.startswith(kw["src"] + ".")
                if child.any():
                    fam_suffix = df["field"].str.slice(len(kw["src"]) + 1)
                    sel = sel | child
            if sel.any():
                # a subfield rename WITHIN the same field keeps entity
                # membership; moving to another field appends fresh
                # entities there (same contract as copy_field); a hash
                # FAMILY is one entity per record
                renames_field = (df.loc[sel, "field"] != kw["dst"]).any()
                if fam_suffix is not None:
                    sub = df.loc[sel].copy()
                    _family_resubfield(sub, kw["src"], fam_suffix[sel])
                    df.loc[sel, "subfield"] = sub["subfield"].to_numpy()
                if df["occurrence"].dtype != np.int64:
                    df["occurrence"] = df["occurrence"].astype(np.int64)
                if kw.get("dst_mode") == "last" and renames_field:
                    df.loc[sel, "occurrence"] = _last_entity_occ(
                        df.loc[~sel], kw["dst"], df.loc[sel, "record_id"],
                        _fresh_base(df),
                    ).to_numpy()
                elif fam_suffix is not None:
                    df.loc[sel, "occurrence"] = _fresh_base(df) + pd.factorize(
                        df.loc[sel, "record_id"]
                    )[0]
                elif renames_field:
                    df.loc[sel, "occurrence"] = _fresh_base(df) + pd.factorize(
                        _entity_key(df.loc[sel])
                    )[0]
                df.loc[sel, "field"] = kw["dst"]
                if "dst_sub" in kw:
                    df.loc[sel, "subfield"] = kw["dst_sub"]
        elif name == "add_field":
            recs = df["record_id"].drop_duplicates()
            occ = (
                _last_entity_occ(df, kw["field"], recs, _fresh_base(df))
                if kw.get("dst_mode") == "last"
                else _fresh_base(df)
            )
            df = pd.concat(
                [
                    df,
                    pd.DataFrame(
                        {
                            "record_id": recs,
                            "field": kw["field"],
                            "subfield": kw.get("subfield"),
                            "occurrence": occ,
                            "value": kw["value"],
                        }
                    ),
                ],
                ignore_index=True,
            )
        elif name == "remove_field":
            df = df[~_sel_mask(df, kw["field"], kw.get("subfield"))]
        elif name == "replace_all":
            sel = _sel_mask(df, kw["field"], kw.get("subfield"))
            df.loc[sel, "value"] = df.loc[sel, "value"].str.replace(
                kw["pattern"], kw["replacement"], regex=True
            )
        elif name == "lookup":
            sel = _sel_mask(df, kw["field"], kw.get("subfield"))
            mapped = df.loc[sel, "value"].map(kw["table"])
            if kw.get("delete"):
                # reuse the computed mapping: assign hits, drop misses
                # (a table value of None counts as a miss, like an
                # absent key — the delete policy treats both as "no
                # translation exists")
                hits = mapped.dropna()
                df.loc[hits.index, "value"] = hits
                df = df.drop(index=mapped.index[mapped.isna()])
            elif "default" in kw:
                df.loc[sel, "value"] = mapped.fillna(kw["default"])
            else:
                df.loc[sel, "value"] = mapped.fillna(df.loc[sel, "value"])
        elif name == "paste":
            # vectorized join-skipping-missing: align srcs, mark missing
            # cells with a sentinel, str.cat pairwise, then strip
            # sentinel fields and their separators (no per-record loop).
            # A src entry is a field name, a {"field": f, "subfield": s}
            # selector, or a {"lit": s} literal (Metafix ``~literal``,
            # reference macros/alma.fix:19 paste("~(", "@isil", ...)).
            # Literal-only pastes attach to no record; records missing
            # EVERY field src emit nothing (a row of bare literal
            # punctuation carries no data).
            jc = kw.get("join_char", " ")
            rec_index = pd.Index(df["record_id"].drop_duplicates())
            series, field_cols = [], []
            for s in kw["srcs"]:
                if isinstance(s, dict) and "lit" in s:
                    series.append(pd.Series(s["lit"], index=rec_index))
                    continue
                f, sub = (
                    (s, None)
                    if isinstance(s, str)
                    else (s["field"], s.get("subfield"))
                )
                col = _first_occurrence_values(df, f, sub).reindex(rec_index)
                series.append(col)
                field_cols.append(col)
            parts = pd.concat(series, axis=1)
            if field_cols:
                present = pd.concat(field_cols, axis=1).notna().any(axis=1)
                parts = parts[present.to_numpy(dtype=bool)]
            cols = [
                parts.iloc[:, i].astype("string").fillna("\x00")
                for i in range(parts.shape[1])
            ]
            acc = cols[0]
            for col in cols[1:]:
                acc = acc.str.cat(col, sep=jc)
            jrx = re.escape(jc)
            joined = (
                acc.str.replace(f"\x00{jrx}", "", regex=True)
                .str.replace(f"{jrx}\x00", "", regex=True)
                .str.replace("\x00", "", regex=False)
            )
            joined = joined[joined != ""].astype(object)
            if len(joined) and kw.get("dst_mode") != "append":
                # Metafix paste SETS the destination: a non-$append dst
                # replaces any existing value (otherClassificationNumber
                # .fix:25 pastes "code label" over the looked-up label
                # in @subjectRPB; repeated $append pastes still build
                # arrays)
                old = _sel_mask(df, kw["dst"], kw.get("dst_sub"))
                if old.any():
                    written = df["record_id"].isin(set(joined.index))
                    df = df[~(old & written)]
            if len(joined):
                occ = (
                    _last_entity_occ(
                        df, kw["dst"], joined.index.to_series(),
                        _fresh_base(df),
                    ).to_numpy()
                    if kw.get("dst_mode") == "last"
                    else _fresh_base(df)
                )
                dstf = kw["dst"]
                if "|" in dstf or "?" in dstf or "[" in dstf:
                    # selector destination (loop-var dst "$i.key" —
                    # the loop element's CONCRETE field varies per
                    # record; each loop record has exactly one match)
                    fmap = (
                        df.loc[_sel_mask(df, dstf)]
                        .groupby("record_id")["field"].first()
                    )
                    field_col = (
                        joined.index.to_series().map(fmap).to_numpy()
                    )
                else:
                    field_col = dstf
                df = pd.concat(
                    [
                        df,
                        pd.DataFrame(
                            {
                                "record_id": joined.index,
                                "field": field_col,
                                "subfield": kw.get("dst_sub"),
                                "occurrence": occ,
                                "value": joined.to_numpy(),
                            }
                        ),
                    ],
                    ignore_index=True,
                )
        elif name == "uniq":
            # Metafix uniq dedups whole array ELEMENTS: an entity (rows
            # sharing record/field/occurrence) is dropped iff an EARLIER
            # entity of the same record+field carries the identical
            # (subfield, value) multiset — two linking entries with the
            # same mainEntryHeading but different titles both survive
            # (_linkingEntry.fix:22 uniq("$[target][]")). Single-row
            # entities degrade to plain value dedup.
            sel = _sel_mask(df, kw["field"], kw.get("subfield"))
            rows = df.loc[sel]
            # entity-open placeholders are structural, not content:
            # their unique values must not make identical entities
            # look different (the @person duplicates collapse across
            # the 100- and 700-derived copies, alma.fix:796)
            rows = rows[~rows["subfield"].fillna("").str.startswith("\x1d")]
            if len(rows):
                k = (
                    rows["record_id"].astype(str) + "\x1d"
                    + rows["field"].astype(str) + "\x1d"
                    + rows["occurrence"].astype(str)
                )
                sv = (
                    rows["subfield"].fillna("") + "\x1e"
                    + rows["value"].astype(str)
                )
                tmp = pd.DataFrame({"k": k, "sv": sv}).sort_values(
                    ["k", "sv"], kind="mergesort"
                )
                sigs = tmp.groupby("k", sort=False)["sv"].agg("\x1f".join)
                ent_first = rows.assign(__k=k).drop_duplicates("__k")
                dup = ent_first.assign(
                    __sig=ent_first["__k"].map(sigs)
                ).duplicated(["record_id", "field", "__sig"])
                drop_keys = set(ent_first.loc[dup.to_numpy(), "__k"])
                if drop_keys:
                    # rebuild the entity key over ALL selected rows
                    # (incl. placeholders) so a dropped entity loses
                    # its placeholder too
                    allrows = df.loc[sel]
                    k_all = (
                        allrows["record_id"].astype(str) + "\x1d"
                        + allrows["field"].astype(str) + "\x1d"
                        + allrows["occurrence"].astype(str)
                    )
                    mask = sel.copy()
                    mask.loc[sel] = k_all.isin(drop_keys).to_numpy()
                    df = df[~mask]
        elif name == "join_field":
            # Metafix join_field(path, separator): the field's repeated
            # values collapse to ONE row per (record, field path) — a '?'
            # wildcard selector matching several fields joins EACH field's
            # array separately (Metafix joins per path, not per record),
            # placed where that field's first row was
            sel = _sel_mask(df, kw["field"], kw.get("subfield"))
            if sel.any():
                jc = kw.get("join_char", "")
                subset = df.loc[sel]
                sub_key = subset["subfield"].fillna("\x1d")
                joined = (
                    subset["value"]
                    .fillna("")  # null leaves join like empty strings
                    .groupby(
                        [subset["record_id"], subset["field"], sub_key],
                        sort=False,
                    )
                    .agg(jc.join)
                )
                rep = subset.drop_duplicates(
                    ["record_id", "field", "subfield"]
                ).copy()
                midx = pd.MultiIndex.from_arrays(
                    [rep["record_id"], rep["field"], rep["subfield"].fillna("\x1d")]
                )
                rep["value"] = joined.reindex(midx).to_numpy()
                df = pd.concat(
                    [df[~sel], rep], ignore_index=False
                ).sort_index(kind="stable").reset_index(drop=True)
        elif name == "split_field":
            # Metafix split_field(path, regexp): each value splits into
            # one row per part, in place (original row order preserved,
            # occurrences renumbered at the end like everything else)
            sel = _sel_mask(df, kw["field"], kw.get("subfield"))
            if sel.any():
                parts = df.loc[sel, "value"].str.split(kw["pattern"], regex=True)
                # Java String.split drops TRAILING empty strings (but an
                # unmatched input returns itself, so len<=1 stays as-is,
                # and a fully-empty split yields an empty array → the
                # field disappears, as SplitField.java would emit nothing)
                parts = parts.map(_java_split_trim)
                rep = df.loc[sel].drop(columns=["value"]).assign(value=parts)
                gone = rep["value"].map(
                    lambda v: isinstance(v, list) and len(v) == 0
                )
                rep = rep[~gone].explode("value")
                if kw.get("subfield") is None and len(rep):
                    # a split SCALAR field becomes an array: one fresh
                    # entity per part (subfield-path splits stay inside
                    # their entity as a repeated subfield)
                    rep["occurrence"] = _fresh_base(df) + np.arange(len(rep))
                df = pd.concat(
                    [df[~sel], rep], ignore_index=False
                ).sort_index(kind="stable").reset_index(drop=True)
        elif name == "filter_values":
            # Metafix filter(path, regexp[, invert]): keep only the
            # field's values containing a regex match (the array-value
            # filter of marc/_facet_type-2.fix:130-144)
            sel = _sel_mask(df, kw["field"], kw.get("subfield"))
            if sel.any():
                # regex only over the selected field's rows (not the
                # whole batch column — same sel-scoped pattern as
                # replace_all/substring)
                m = df.loc[sel, "value"].str.contains(
                    kw["pattern"], regex=True, na=False
                )
                if kw.get("invert"):
                    m = ~m
                drop = sel.copy()
                drop.loc[sel] = ~m
                df = df[~drop]
        elif name == "retain":
            if kw.get("prefix"):
                # Metafix retain keeps whole subtrees; flattened nested
                # paths are dotted field names here, so a retained name
                # keeps itself plus its dotted descendants
                names = list(kw["fields"])
                keep = df["field"].isin(set(names))
                for nm in names:
                    keep |= df["field"].str.startswith(nm + ".")
                df = df[keep]
            else:
                df = df[df["field"].isin(set(kw["fields"]))]
        elif name == "reject_if":
            hit = df[
                (df["field"] == kw["field"])
                & df["value"].str.contains(kw["pattern"], regex=True, na=False)
            ]["record_id"].unique()
            df = df[~df["record_id"].isin(set(hit))]
        elif name == "add_array":
            # Metafix set/add_array REPLACES an existing container —
            # the rule corpora guard re-initialization with ``unless
            # exists(...)`` precisely because an unguarded add_array
            # wipes earlier elements (seriesStatement.fix:18-20 guard;
            # alma.fix:489 add_array("IdentifierZDB[]") discards the
            # 035-derived entities before the 016 block rebuilds)
            sel = _sel_mask(df, kw["field"], kw.get("subfield"))
            if sel.any():
                df = df[~sel]
            vals = list(kw.get("values", []))
            if vals:  # no empty containers in the flat-row model
                recs = df["record_id"].drop_duplicates()
                df = pd.concat(
                    [
                        df,
                        pd.DataFrame(
                            {
                                "record_id": np.repeat(
                                    recs.to_numpy(), len(vals)
                                ),
                                "field": kw["field"],
                                "subfield": kw.get("subfield"),
                                # one fresh entity per array VALUE
                                "occurrence": np.tile(
                                    _fresh_base(df) + np.arange(len(vals)),
                                    len(recs),
                                ),
                                "value": vals * len(recs),
                            }
                        ),
                    ],
                    ignore_index=True,
                )
        elif name == "add_hash":
            entries = dict(kw["entries"])
            if entries:
                recs = df["record_id"].drop_duplicates()
                occ_per_rec = (
                    _last_entity_occ(
                        df, kw["field"], recs, _fresh_base(df)
                    ).to_numpy()
                    if kw.get("dst_mode") == "last"
                    else np.full(len(recs), _fresh_base(df), dtype=np.int64)
                )
                subs, vals = zip(*entries.items())
                df = pd.concat(
                    [
                        df,
                        pd.DataFrame(
                            {
                                "record_id": np.repeat(
                                    recs.to_numpy(), len(subs)
                                ),
                                "field": kw["field"],
                                "subfield": list(subs) * len(recs),
                                # ONE entity per record: a hash's
                                # entries are subfields of one entity
                                "occurrence": np.repeat(occ_per_rec, len(subs)),
                                "value": list(vals) * len(recs),
                            }
                        ),
                    ],
                    ignore_index=True,
                )
        elif name == "new_entity":
            recs = df["record_id"].drop_duplicates()
            nb = _fresh_base(df)
            df = pd.concat(
                [
                    df,
                    pd.DataFrame(
                        {
                            "record_id": recs,
                            "field": kw["field"],
                            "subfield": _PH_SUB,
                            "occurrence": nb,
                            # value unique per opening so uniq/dedup
                            # never merges two placeholders
                            "value": "\x1d%d" % nb,
                        }
                    ),
                ],
                ignore_index=True,
            )
        elif name == "morph_stream":
            from .morphstream import MorphStream, flatten_outputs

            engine = MorphStream(kw["spec"])
            out_rows: list[dict] = []
            for rid, grp in df.groupby("record_id", sort=False):
                lits = []
                for field, sub, occ, val in zip(
                    grp["field"], grp["subfield"],
                    grp["occurrence"], grp["value"],
                ):
                    path = (
                        f"{field}.{sub}"
                        if sub is not None and not pd.isna(sub)
                        else str(field)
                    )
                    lits.append((path, val, (field, occ)))
                outputs = engine.run_record(lits)
                out_rows.extend(flatten_outputs(outputs, rid))
            df = (
                pd.DataFrame(
                    out_rows,
                    columns=["record_id", "field", "subfield",
                             "occurrence", "value"],
                )
                if out_rows
                else df.iloc[0:0]
            )
        elif name == "vacuum":
            df = df[df["value"].notna() & (df["value"] != "")]
        elif name == "parse_text":
            sel = _sel_mask(df, kw["field"], kw.get("subfield"))
            groups = df.loc[sel, "value"].str.extract(kw["pattern"])
            named = [c for c in groups.columns if isinstance(c, str)]
            if not named:
                # no named groups: Metafix ParseText yields an ARRAY of
                # the plain captures — matched rows' values are replaced
                # by their group captures in place (macros/alma.fix:24
                # parse_text("@alma-mms-to-isil", ".*(.{4})$"))
                matched = groups.notna().any(axis=1)
                keep_frames = [df[~sel]]
                unmatched_idx = groups.index[~matched]
                if len(unmatched_idx):
                    keep_frames.append(df.loc[unmatched_idx])
                base = _fresh_base(df)
                for gcol in groups.columns:
                    hit = groups.loc[matched, gcol].dropna()
                    if len(hit):
                        repl = df.loc[hit.index].copy()
                        repl["value"] = hit.to_numpy()
                        # one fresh entity per capture (unique per
                        # source row × group; array order = appearance)
                        repl["occurrence"] = (
                            base + int(gcol) * len(df) + hit.index.to_numpy()
                        )
                        keep_frames.append(repl)
                df = pd.concat(keep_frames, ignore_index=True)
                df = df.reset_index(drop=True)
                continue
            # only NAMED groups become fields (unnamed ones are grouping
            # aids and surface as integer columns from str.extract)
            groups = groups[named]
            # a row matched if any named group captured (optional groups
            # may legitimately be empty on a match)
            matched = groups.notna().any(axis=1)
            new_frames = []
            base = _fresh_base(df)
            for gname in groups.columns:
                hit = groups.loc[matched, gname].dropna()
                if len(hit):
                    new_frames.append(
                        pd.DataFrame(
                            {
                                "record_id": df.loc[hit.index, "record_id"].to_numpy(),
                                "field": gname,
                                "subfield": None,
                                # fresh entity per captured value
                                "occurrence": base + hit.index.to_numpy(),
                                "value": hit.to_numpy(),
                            }
                        )
                    )
            # matched source rows are consumed; unmatched rows survive
            drop = sel.copy()
            drop.loc[sel] = matched
            df = pd.concat([df[~drop], *new_frames], ignore_index=True)
        elif name == "do_list":
            sel = df["field"] == kw["field"]
            sub = apply_ops(df[sel].copy(), list(kw["ops"]), _top=False)
            df = pd.concat([df[~sel], sub], ignore_index=True)
        elif name == "prepend":
            sel = _sel_mask(df, kw["field"], kw.get("subfield"))
            df.loc[sel, "value"] = kw["value"] + df.loc[sel, "value"]
        elif name == "append":
            sel = _sel_mask(df, kw["field"], kw.get("subfield"))
            df.loc[sel, "value"] = df.loc[sel, "value"] + kw["value"]
        elif name == "substring":
            sel = _sel_mask(df, kw["field"], kw.get("subfield"))
            start = int(kw["start"])
            stop = start + int(kw["length"]) if "length" in kw else None
            df.loc[sel, "value"] = df.loc[sel, "value"].str.slice(start, stop)
        elif name == "take_occurrence":
            sel = _sel_mask(df, kw["field"], kw.get("subfield"))
            if sel.any():
                rows = df.loc[sel]
                if kw.get("same_entity"):
                    grp = _entity_key(rows)
                else:
                    grp = rows["record_id"]
                nth = rows.groupby(grp, sort=False).cumcount() + 1
                keep = pd.Series(True, index=df.index)
                keep.loc[sel] = nth == int(kw.get("n", 1))
                df = df[keep]
        elif name == "unique_values":
            sel = _sel_mask(df, kw["field"], kw.get("subfield"))
            if sel.any():
                dup = df.loc[sel].duplicated(subset=["record_id", "value"])
                keep = pd.Series(True, index=df.index)
                keep.loc[sel] = ~dup
                df = df[keep]
        elif name == "trim":
            sel = _sel_mask(df, kw["field"], kw.get("subfield"))
            df.loc[sel, "value"] = df.loc[sel, "value"].str.strip()
        elif name == "upcase":
            sel = _sel_mask(df, kw["field"], kw.get("subfield"))
            df.loc[sel, "value"] = df.loc[sel, "value"].str.upper()
        elif name == "downcase":
            sel = _sel_mask(df, kw["field"], kw.get("subfield"))
            df.loc[sel, "value"] = df.loc[sel, "value"].str.lower()
        elif name == "drop_local":
            # DropLocal.java:40-48: drop the entity iff (a) its "9"
            # subfield matches the LOCAL predicate and (b) an "M"
            # subfield exists with a value != this member's code.
            # Entity = (record, field, occurrence): same-occurrence
            # subfield rows form one element of a repeated field (the
            # decoders emit one row per subfield per element, so the
            # grouping is exact for MARC-style data).
            member = str(kw["member"])
            key = _entity_key(df)
            is9 = (df["subfield"] == "9") & df["value"].str.match(
                _LOCAL_RX, na=False
            )
            m_other = (df["subfield"] == "M") & (df["value"] != member)
            drop_keys = set(key[is9]) & set(key[m_other])
            if drop_keys:
                df = df[~key.isin(drop_keys)]
        elif name == "drop_repeated":
            idx = int(kw.get("index", 1)) - 1  # DropRepeated.java:21
            sel = df["field"] == kw["field"]
            occ = df.loc[sel]
            # repeated = >1 occurrence within a record (an array value);
            # single-occurrence fields stay untouched, like the
            # reference's ifArray guard (DropRepeated.java:27)
            repeated = occ.groupby("record_id")["occurrence"].transform("max") > 0
            drop = sel.copy()
            drop.loc[occ.index] = repeated & (occ["occurrence"] != idx)
            df = df[~drop]
        elif name == "if":
            # Metafix if/elsif/else over whole records: each record runs
            # the FIRST branch whose predicate it satisfies (else branch
            # or pass-through otherwise) — reference alma.fix:192-218
            # identifier routing. Row order within a record is
            # preserved; cross-branch record order is branch-major
            # (occurrence renumbering is per record, so unaffected).
            branches = [(kw["pred"], kw["ops"])] + [
                (p, o) for p, o in kw.get("elifs", [])
            ]
            taken: set = set()
            parts = []
            for pred, bops in branches:
                ids = _pred_ids(df, pred) - taken
                taken |= ids
                m = df["record_id"].isin(ids)
                parts.append(apply_ops(df[m].copy(), list(bops), _top=False))
            rest = df[~df["record_id"].isin(taken)]
            if kw.get("else_ops") is not None:
                parts.append(
                    apply_ops(rest.copy(), list(kw["else_ops"]), _top=False)
                )
            else:
                parts.append(rest)
            df = pd.concat(parts, ignore_index=True)
        elif name == "reject":
            # bare Metafix ``reject()`` — drops every record in the
            # current scope (meaningful inside an ``if`` branch)
            df = df.iloc[0:0]
        elif name == "do_list_elements" and kw.get("sequential"):
            # element-at-a-time execution: the body reads state earlier
            # elements wrote (compile-time detected,
            # fixparser._loop_needs_sequential) — each ordinal runs the
            # standard single-element path over the UPDATED frame
            sub_kw = {k: v for k, v in kw.items() if k != "sequential"}
            sel0 = _sel_mask(df, kw["field"], kw.get("subfield"))
            if not sel0.any():
                n_el = 0
            elif kw.get("subfield") is not None:
                n_el = int(
                    df.loc[sel0].groupby("record_id", sort=False)
                    .size().max()
                )
            else:
                sc = df.loc[sel0]
                n_el = int(
                    _entity_key(sc)
                    .groupby(sc["record_id"], sort=False)
                    .nunique().max()
                )
            # ordinal-i elements of DIFFERENT records are independent:
            # one pass per per-record ordinal (element-sequential,
            # record-parallel) instead of one per global entity
            for i_el in range(n_el):
                df = apply_ops(
                    df,
                    [("do_list_elements", {**sub_kw, "_elem_ordinal": i_el})],
                    _top=False,
                )
        elif name == "do_list_elements":
            # Metafix ``do list(path, var)`` with per-ELEMENT semantics:
            # each element of the path becomes a synthetic record (id =
            # parent \x1e element ordinal) so predicates and ops inside
            # the body see exactly the current element at the loop path
            # — the reference's loop-variable scoping (alma.fix:43-51,
            # 191-252). Element = one occurrence (entity) for a field
            # path, one row for a field.subfield path.
            #
            # The REST of the record rides along as READ-ONLY CONTEXT
            # (replicated per element): body predicates can test
            # record-level fields, and rows the body creates can join a
            # record-level entity via a ``$last`` destination — the
            # reference's nested-loop entity construction
            # (marc/corporateBody.fix:2-34 add_hash $append at the
            # outer level, inner loops copying into $last). On merge,
            # context copies are dropped; body mutations of context
            # rows do NOT propagate (documented contract — the
            # reference's loop bodies mutate record-level state
            # sequentially, which a per-element-parallel engine cannot
            # reproduce; rule corpora only ADD from inside loops).
            # nested loops: stash an ENCLOSING loop's tracking columns
            # under prefixed names for the duration of this op (rows
            # this body creates surface with NaN markers, which the
            # enclosing loop resolves via their entity siblings)
            _hidden = ("__ctx", "__orig_occ", "__orig_field", "__pos",
                       "__ctxid")
            nested = [c for c in _hidden if c in df.columns]
            if nested:
                pfx = "__o"  # depth-unique prefix (loops nest ≥3 deep)
                while any((pfx + c) in df.columns for c in nested):
                    pfx += "o"
                df = df.rename(columns={c: pfx + c for c in nested})
            sel = _sel_mask(df, kw["field"], kw.get("subfield"))
            scoped = df[sel].copy()
            rest = df[~sel]
            # VALUE loops (a field.subfield path) iterate over COPIES —
            # Metafix binds $var to the value array's elements, so body
            # mutations/deletions of the loop values do not touch the
            # record (alma.fix:191-254 strips 035 prefixes inside the
            # loop, yet the xbib block at :975 reads the originals);
            # ENTITY loops bind by reference (remove_field("$i.c")
            # persists, DE-708-deposit.fix:63-65)
            value_loop = kw.get("subfield") is not None
            pristine = None
            if len(scoped):
                if kw.get("subfield") is not None:
                    elem = (
                        scoped.groupby("record_id", sort=False)
                        .cumcount().to_numpy()
                    )
                else:
                    # dense PER-RECORD entity ordinal in
                    # first-appearance order — NOT the raw occurrence:
                    # a multi-field selector ("[17]00[013] ",
                    # personContributor.fix:3) yields same-occurrence
                    # entities of DIFFERENT fields, which must stay
                    # distinct elements
                    codes = pd.factorize(_entity_key(scoped))[0]
                    first = ~pd.Series(codes).duplicated().to_numpy()
                    rank = (
                        pd.Series(first.astype(np.int64))
                        .groupby(scoped["record_id"].to_numpy(), sort=False)
                        .cumsum().to_numpy() - 1
                    )
                    elem = (
                        pd.Series(rank).groupby(codes).transform("first")
                        .to_numpy()
                    )
                only = kw.get("_elem_ordinal")
                held = None
                if only is not None:
                    # sequential pass: other ordinals are NEITHER loop
                    # rows NOR context (they are other elements of the
                    # loop path — invisible to this element's body,
                    # exactly as in the parallel mode); they rejoin the
                    # frame at the merge
                    keep_el = elem == only
                    held = scoped[~keep_el]
                    scoped = scoped[keep_el]
                    elem = elem[keep_el]
                    if not len(scoped):
                        df = pd.concat(
                            [rest, held]
                        ).sort_index().reset_index(drop=True)
                        if nested:
                            df = df.rename(
                                columns={pfx + c: c for c in nested}
                            )
                        continue
                if value_loop:
                    # captured AFTER ordinal narrowing: held elements
                    # re-enter the frame themselves
                    pristine = df.loc[scoped.index].copy()
                syn = (
                    scoped["record_id"].astype(str)
                    + "\x1e"
                    + pd.Series(elem, index=scoped.index).astype(str)
                )
                parent = dict(zip(syn, scoped["record_id"]))
                elem_no = dict(zip(syn, elem))
                base = _fresh_base(df)
                scoped["record_id"] = syn
                scoped["__orig_occ"] = scoped["occurrence"]
                scoped["__orig_field"] = scoped["field"]
                scoped["__ctx"] = False
                # frame position: surviving rows merge back IN PLACE so
                # DOCUMENT order survives the loop (an earlier loop must
                # not reorder elements a later loop iterates —
                # DE-708-deposit.fix:63-65 strips 260.c in one loop,
                # then publisherName.fix:2 iterates "260??|264?[ 13]"
                # expecting the 260 entity first)
                scoped["__pos"] = scoped.index.to_numpy()
                # context: each element's synthetic record also carries
                # the parent's OTHER rows (one copy per element)
                syn_per_rec = pd.DataFrame(
                    {"record_id": scoped["record_id"].map(parent).to_numpy(),
                     "__syn": scoped["record_id"].to_numpy()}
                ).drop_duplicates()
                ctx = rest.reset_index(names="__ctxid").merge(
                    syn_per_rec, on="record_id"
                )
                if len(ctx):
                    ctx["__orig_occ"] = ctx["occurrence"]
                    ctx["__orig_field"] = ctx["field"]
                    ctx["__ctx"] = True
                    ctx["record_id"] = ctx.pop("__syn")
                    body_in = pd.concat(
                        [scoped, ctx], ignore_index=True
                    )
                else:
                    ctx = ctx.drop(columns="__syn")
                    body_in = scoped
                sub = apply_ops(body_in, list(kw["ops"]), _top=False)
                if "__ctx" not in sub.columns:  # body emptied the frame
                    for c in ("__ctx", "__orig_occ", "__orig_field",
                              "__pos", "__ctxid"):
                        sub[c] = pd.Series(dtype=object)
                # surviving INPUT rows (loop or context) that kept
                # their field rejoin their original entity; build the
                # (synthetic record, field, renumbered occ) → original
                # occ map so CREATED rows sharing an entity with them
                # (a $last destination) join it too
                kept = sub["__orig_occ"].notna() & (
                    sub["field"] == sub["__orig_field"]
                )
                ent_map = (
                    sub.loc[kept]
                    .drop_duplicates(["record_id", "field", "occurrence"])
                    .set_index(["record_id", "field", "occurrence"])["__orig_occ"]
                )
                created = ~kept & ~sub["__ctx"].eq(True)
                if created.any() and len(ent_map):
                    midx = pd.MultiIndex.from_arrays(
                        [sub.loc[created, "record_id"],
                         sub.loc[created, "field"],
                         sub.loc[created, "occurrence"]]
                    )
                    joined = ent_map.reindex(midx).to_numpy()
                else:
                    joined = np.full(int(created.sum()), np.nan)
                # restore element order (branch-major partitioning
                # inside the body must not leak into array order), then
                # shift the remaining created rows element-major past
                # the parent's ids so per-element entities stay distinct
                sub = sub.assign(__elem=sub["record_id"].map(elem_no))
                k = int(sub["occurrence"].max()) + 1 if len(sub) else 1
                occ = sub["occurrence"].to_numpy(dtype=np.int64, copy=True)
                kept_np = kept.to_numpy()
                occ[kept_np] = sub.loc[kept, "__orig_occ"].to_numpy(
                    dtype=np.int64
                )
                created_np = created.to_numpy()
                cr_occ = (
                    base
                    + sub.loc[created, "__elem"].to_numpy(dtype=np.int64) * k
                    + occ[created_np]
                )
                has_join = ~pd.isna(joined)
                cr_occ[has_join] = joined[has_join].astype(np.int64)
                occ[created_np] = cr_occ
                sub["occurrence"] = occ
                # context DELETIONS propagate to the originals: a body
                # that deletes a replicated context row (paste-SET of an
                # outer element's key from an inner loop, alma.fix:
                # 296-327 "$i.@title" pastes inside the 240 loop) means
                # the original is deleted too — a replicated id missing
                # from any element it was copied into is a tombstone
                if len(ctx) and "__ctxid" in sub.columns:
                    surv = set(
                        sub.loc[sub["__ctx"].eq(True), "__ctxid"]
                        .dropna().astype(int)
                    )
                    replicated = set(ctx["__ctxid"].astype(int))
                    dead = replicated - surv
                    if dead:
                        rest = rest[~rest.index.isin(dead)]
                # drop context copies; keep loop + created rows —
                # for VALUE loops the surviving loop rows are the
                # body's local copies and are dropped too (the
                # pristine originals rejoin below)
                sub = sub.assign(__kept=kept_np)
                if "__ctxid" in sub.columns:
                    sub = sub.drop(columns="__ctxid")
                sub = sub[~sub["__ctx"].eq(True)]
                if value_loop:
                    sub = sub[~sub["__kept"].astype(bool)]
                sub = sub.sort_values("__elem", kind="stable")
                sub["record_id"] = sub["record_id"].map(parent)
                # merge back IN PLACE: only surviving INPUT rows return
                # to their frame position; rows the body created —
                # including COPIES, which inherit the source row's
                # tracking columns — append after all existing rows,
                # element-major (sorted by __elem above)
                pos = sub["__pos"].to_numpy(dtype=float)
                pos[~sub["__kept"].to_numpy(dtype=bool)] = np.nan
                pos[np.isnan(pos)] = float(len(df))
                sub["__pos"] = pos
                sub = sub.drop(
                    columns=["__elem", "__ctx", "__orig_occ",
                             "__orig_field", "__kept"]
                ).reset_index(drop=True)
                if held is not None and len(held):
                    rest = pd.concat([rest, held])
                if value_loop and pristine is not None:
                    rest = pd.concat([rest, pristine])
                rest = rest.assign(__pos=rest.index.to_numpy(dtype=float))
                df = (
                    pd.concat([rest, sub], ignore_index=True)
                    .sort_values("__pos", kind="stable")
                    .drop(columns="__pos")
                    .reset_index(drop=True)
                )
            if nested:
                df = df.rename(columns={pfx + c: c for c in nested})
        elif name == "verify_links":
            # The reference's verify_links record contract
            # (VerifyLinks.java:112-197): for each linking-entry field,
            # every source value becomes a ``verifying<Suffix>`` row on
            # its entity, and values passing the key-set predicate
            # (in keys AND not in skip) additionally a
            # ``verified<Suffix>`` row. Annotation rows are appended in
            # source-row order, so the final occurrence renumbering
            # aligns annotation k with source value k of the record.
            # Per-path counters are grouped counts over the verified
            # rows (:func:`verify_links_counters`) — the LongAdder
            # analogue, aggregated instead of mutated.
            keys = np.asarray(sorted(kw["keys"]), dtype=object)
            skip = np.asarray(sorted(kw.get("skip", ())), dtype=object)
            suffix = kw["suffix"]
            new_frames = []
            for entry in kw["entries"]:
                if kw.get("record_source") is not None:
                    # SUPER form (VerifyLinks.java SUPER_SOURCE): the
                    # tested values live at RECORD level; annotations
                    # attach to each entity of the entry field
                    src = df[
                        _sel_mask(
                            df,
                            kw["record_source"],
                            kw.get("record_source_sub"),
                        )
                    ][["record_id", "value"]]
                    ent = df.loc[
                        _sel_mask(df, entry), ["record_id", "occurrence"]
                    ].drop_duplicates()
                    rows = ent.merge(src, on="record_id")
                    rows["field"] = entry
                else:
                    sel = _sel_mask(df, entry, kw["source"])
                    rows = df.loc[
                        sel, ["record_id", "field", "occurrence", "value"]
                    ].copy()
                if not len(rows):
                    continue
                vals = rows["value"].to_numpy()
                ok = np.isin(vals, keys)
                if len(skip):
                    ok &= ~np.isin(vals, skip)
                ver = rows.assign(subfield="verifying" + suffix)
                new_frames.append(ver)
                if ok.any():
                    new_frames.append(
                        rows[ok].assign(subfield="verified" + suffix)
                    )
            if new_frames:
                df = pd.concat([df, *new_frames], ignore_index=True)
        elif name == "switch_name_value":
            sel = _sel_mask(df, kw["field"], kw.get("subfield"))
            f = df.loc[sel, "field"].copy()
            df.loc[sel, "field"] = df.loc[sel, "value"]
            df.loc[sel, "value"] = f
        elif name == "regexp_match":
            sel = _sel_mask(df, kw["field"], kw.get("subfield"))
            rx = re.compile(kw["pattern"])
            fmt = kw.get("format")

            def _m(v):
                m = rx.search(str(v))
                if m is None:
                    return None
                if fmt is None:
                    return m.group()
                return re.sub(
                    r"\$\{(\d+)\}", lambda g: m.group(int(g.group(1))) or "",
                    fmt,
                )

            matched = df.loc[sel, "value"].map(_m)
            drop = sel & matched.isna().reindex(df.index, fill_value=False)
            df.loc[sel, "value"] = matched
            df = df[~drop]
        elif name == "standard_number":
            # StandardNumber.java:57-66 + put() 96-110: read the raw
            # number from the source path (default: the entity's
            # identifier{Type} subfield), normalize, write
            # preferred{Type} and variant{Type} rows into the entity
            # field at the source row's occurrence (entity alignment)
            from .standardnum import standard_number as _stdnum

            t = kw["type"]
            src_f = kw.get("source_field", kw["field"])
            src_s = kw.get("source_sub", f"identifier{t}")
            sel = _sel_mask(df, src_f, src_s)
            src = df[sel]
            if kw.get("last_only") and len(src) and src_f == kw["field"]:
                # "$last"-scoped: only the newest entity of the target
                # field per record (alma.fix:495 IdentifierZDB[].$last)
                last = src.groupby("record_id")["occurrence"].transform("max")
                src = src[src["occurrence"] == last]
            if "source_idx" in kw and len(src):
                # 1-based element index WITHIN each entity's source
                # array (identifierISBN[].1 — _linkingEntry.fix:18),
                # not a raw occurrence value
                pos = src.groupby(
                    _entity_key(src), sort=False
                ).cumcount()
                src = src[pos == int(kw["source_idx"]) - 1]
            new_rows = []
            for _, r in src.iterrows():
                norm = _stdnum(str(r["value"]), t)
                if norm is None:
                    continue
                base = {
                    "record_id": r["record_id"], "field": kw["field"],
                    "occurrence": r["occurrence"],
                }
                if norm.get("preferred") is not None:
                    new_rows.append(
                        {**base, "subfield": f"preferred{t}",
                         "value": norm["preferred"]}
                    )
                for v in norm.get("variants", ()):  # nulls/raw filtered
                    new_rows.append(
                        {**base, "subfield": f"variant{t}", "value": v}
                    )
            if new_rows:
                # concat aligns columns: loop-tracking columns (inside
                # a do-list body) fill NaN, marking the rows as created
                df = pd.concat(
                    [df, pd.DataFrame(new_rows)], ignore_index=True
                )
        elif name == "if_member_local":
            # MemberLocal.java:24-34: predicate true when field.M is
            # absent, or any field.M value equals the member code
            member = str(kw["member"])
            m_rows = df[(df["field"] == kw["field"]) & (df["subfield"] == "M")]
            has_m = set(m_rows["record_id"])
            m_eq = set(m_rows.loc[m_rows["value"] == member, "record_id"])
            rec_ids = df["record_id"]
            pred = ~rec_ids.isin(has_m) | rec_ids.isin(m_eq)
            sub = apply_ops(df[pred].copy(), list(kw["ops"]), _top=False)
            df = pd.concat([sub, df[~pred]], ignore_index=True)
        df = df.reset_index(drop=True)
    # entity placeholders (bare add_hash openings) exist only while the
    # top-level program runs; entities that stayed empty vanish
    if _top and len(df):
        ph = df["subfield"] == _PH_SUB
        if ph.any():
            df = df[~ph]
    # Renumber occurrences ENTITY-preserving: rows sharing a
    # (record, field, occurrence) key are one entity (all subfield rows
    # of one datafield repeat — the decoders' convention) and must keep
    # sharing after renumbering. New occurrence = the entity's
    # first-appearance rank within (record, field), so arrays stay in
    # document/insertion order and inserted entities (allocated fresh
    # ids via _fresh_base) land after existing ones.
    df = df.reset_index(drop=True)
    if len(df):
        grp_key = (
            df["record_id"].astype(str) + "\x1d" + df["field"].astype(str)
        ).to_numpy()
        ent_key = grp_key + ("\x1d" + df["occurrence"].astype(str)).to_numpy()
        codes = pd.factorize(ent_key)[0]
        first = ~pd.Series(codes).duplicated().to_numpy()
        rank_at_first = (
            pd.Series(first.astype(np.int64)).groupby(grp_key, sort=False)
            .cumsum().to_numpy() - 1
        )
        df["occurrence"] = (
            pd.Series(rank_at_first).groupby(codes).transform("first")
        ).astype(np.int32)
    return df


def _fresh_base(df: pd.DataFrame) -> int:
    """First occurrence value guaranteed unused by any existing entity —
    ops appending NEW entities number them from here so they cannot
    merge with an existing (record, field, occurrence) entity; the
    final renumbering compresses the gap."""
    return int(df["occurrence"].max()) + 1 if len(df) else 0


class RecordOps:
    """map_batches callable: a compiled fix program (ops validated and
    regexes pre-compiled once per actor — the state-loaded-once pattern
    of SURVEY.md §2.5) applied to flat-row record batches."""

    def __init__(self, ops: list[tuple[str, dict]]):
        self._validate(ops)
        self.ops = list(ops)

    _REQUIRED = {
        "copy_field": ("src", "dst"), "move_field": ("src", "dst"),
        "add_field": ("field", "value"), "remove_field": ("field",),
        "replace_all": ("field", "pattern", "replacement"),
        "lookup": ("field", "table"), "paste": ("dst", "srcs"),
        "uniq": ("field",), "retain": ("fields",),
        "reject_if": ("field", "pattern"), "add_array": ("field",),
        "add_hash": ("field", "entries"), "vacuum": (),
        "parse_text": ("field", "pattern"), "do_list": ("field", "ops"),
        "prepend": ("field", "value"), "append": ("field", "value"),
        "substring": ("field", "start"), "trim": ("field",),
        "upcase": ("field",), "downcase": ("field",),
        "drop_local": ("member",), "drop_repeated": ("field",),
        "if_member_local": ("field", "member", "ops"),
        "if": ("pred", "ops"), "reject": (),
        "do_list_elements": ("field", "ops"),
        "verify_links": ("entries", "suffix", "keys"),
        "join_field": ("field",), "split_field": ("field", "pattern"),
        "filter_values": ("field", "pattern"),
        "switch_name_value": ("field",),
        "regexp_match": ("field", "pattern"),
        "standard_number": ("type", "field"),
        "take_occurrence": ("field",),
        "unique_values": ("field",),
        "new_entity": ("field",),
        "morph_stream": ("spec",),
    }

    @classmethod
    def _validate_pred(cls, pred) -> None:
        name, kw = pred
        if name not in _PREDICATES:
            raise ValueError(f"unknown record predicate {name!r}")
        if name == "not":
            cls._validate_pred(kw["pred"])
            return
        if "field" not in kw:
            raise ValueError(f"record predicate {name!r} missing field")
        if name.endswith("_match"):
            re.compile(kw["pattern"])
        elif name != "exists" and "value" not in kw:
            raise ValueError(f"record predicate {name!r} missing value")

    @classmethod
    def _validate(cls, ops) -> None:
        for name, kw in ops:
            if name not in _KNOWN:
                raise ValueError(f"unknown record op {name!r}")
            missing = [k for k in cls._REQUIRED[name] if k not in kw]
            if missing:
                raise ValueError(f"record op {name!r} missing {missing}")
            if name in ("replace_all", "reject_if", "split_field",
                        "filter_values"):
                re.compile(kw["pattern"])  # fail fast at build time
            elif name == "parse_text":
                if not re.compile(kw["pattern"]).groups:
                    raise ValueError(
                        "parse_text pattern needs capture groups — named "
                        "(?P<field>...) become fields, plain groups "
                        "replace the value as an array of captures"
                    )
            elif name in ("do_list", "if_member_local", "do_list_elements"):
                cls._validate(kw["ops"])
            elif name == "verify_links":
                if kw.get("source") is None and kw.get("record_source") is None:
                    raise ValueError(
                        "verify_links needs source (entity subfield) or "
                        "record_source (record-level field)"
                    )
            elif name == "if":
                cls._validate_pred(kw["pred"])
                cls._validate(kw["ops"])
                for p, o in kw.get("elifs", []):
                    cls._validate_pred(p)
                    cls._validate(o)
                if kw.get("else_ops") is not None:
                    cls._validate(kw["else_ops"])

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = apply_ops(batch.to_pandas(), self.ops)
        return pa.Table.from_pandas(
            out[["record_id", "field", "subfield", "occurrence", "value"]],
            schema=ROW_SCHEMA,
            preserve_index=False,
        )


def verify_links_counters(ds, suffix: str):
    """Per-path verified-link counters over a flat-row record Dataset —
    the aggregated analogue of the reference's LongAdder counter map
    (VerifyLinks.java:54,166-169, logged per path on reset): one row
    per entry field with its ``verified<suffix>`` row count. Returns a
    pandas DataFrame (field, n_verified) sorted by field."""
    import pyarrow.compute as pc

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("subfield"), "verified" + suffix))

    from ray.data.aggregate import Count

    out = (
        ds.map_batches(keep, batch_format="pyarrow")
        .groupby("field")
        .aggregate(Count(alias_name="n_verified"))
        .to_pandas()
    )
    return out.sort_values("field").reset_index(drop=True)
