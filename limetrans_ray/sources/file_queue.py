"""Input file-queue listing — the reference's FileQueue semantics
(reference core/src/main/java/hbz/limetrans/util/FileQueue.java:126-157,
211-338) as a pure listing function feeding ``ray.data.read_parquet`` /
``build_index``:

- recursive glob on the file NAME under ``path`` (symlinks followed);
- sort by ``lastmodified`` (default) or ``name``, ``asc``/``desc``;
- ``max_files`` limit applied after the sort (FileQueue ``max``);
- ``max_age_days`` staleness guard: any selected file older than
  ``now - max_age_days`` raises (the reference throws "file too old" —
  FileQueue.java:239-243 — a freshness gate for harvest-fed runs);
- ``%GROUP_MARKER%`` pattern expansion (FileQueue.java:211-238): the
  marker is globbed as ``*``, the LAST matching file (in sort order)
  fixes the group's concrete value, and the pattern is re-instantiated
  with it — the reference uses this to select "the newest delivery
  group" (e.g. ``dump-%GROUP_MARKER%-part*.xml`` → the latest dump id);
- multiple patterns queue in order; duplicates are collapsed
  first-occurrence-wins (the same file listed twice would double every
  one of its records downstream).
"""

from __future__ import annotations

import fnmatch
import os
import re
import time

GROUP_MARKER = "%GROUP_MARKER%"

_SORTS = ("lastmodified", "name")


def _find(path: str, pattern: str, sort_by: str, reverse: bool) -> list[str]:
    if sort_by not in _SORTS:
        raise ValueError(f"invalid sort parameter: {sort_by!r} (use one of {_SORTS})")
    out = []
    for root, _dirs, fs in os.walk(path, followlinks=True):
        out.extend(os.path.join(root, f) for f in fs if fnmatch.fnmatch(f, pattern))
    if sort_by == "lastmodified":
        out.sort(key=lambda p: (os.path.getmtime(p), p))
    else:
        out.sort()
    if reverse:
        out.reverse()
    return out


def _expand_group_marker(
    path: str, pattern: str, sort_by: str, reverse: bool
) -> str | None:
    """Resolve ``%GROUP_MARKER%`` to the group value of the LAST file
    matching the marker-as-* glob (reference semantics: ``reduce`` to
    the final element of the sorted stream). Returns the concrete
    pattern, or None when no file fixes the group."""
    i = pattern.index(GROUP_MARKER)
    prefix, suffix = pattern[:i], pattern[i + len(GROUP_MARKER):]
    candidates = _find(path, prefix + "*" + suffix, sort_by, reverse)
    if not candidates:
        return None

    # glob → regex: escape EVERYTHING, then revive the glob wildcards —
    # glob-legal filename characters like {}|$^\\ must never become live
    # regex syntax (the reference escapes only .+() — FIXME'd there)
    def glob_rx(s: str) -> str:
        return re.escape(s).replace(r"\*", ".*").replace(r"\?", ".")

    rx = re.compile(glob_rx(prefix) + "(.*)" + glob_rx(suffix))
    m = rx.fullmatch(os.path.basename(candidates[-1]))
    if not m:
        return None
    return prefix + m.group(1) + suffix


def file_queue(
    path: str = ".",
    pattern: str | None = None,
    *,
    patterns: list[str] | None = None,
    sort_by: str = "lastmodified",
    order: str = "asc",
    max_files: int | None = None,
    max_age_days: float | None = None,
) -> list[str]:
    """Ordered, deduplicated input file list (see module doc).

    Raises ``ValueError`` when ``max_age_days`` is set and a selected
    file is staler (the reference aborts the whole run — a stale
    delivery must not silently rebuild the index from old data)."""
    reverse = order == "desc"
    all_patterns = list(patterns) if patterns is not None else [pattern]
    queue: list[str] = []
    for pat in all_patterns:
        if pat is None:
            continue
        if GROUP_MARKER in pat:
            pat = _expand_group_marker(path, pat, sort_by, reverse)
            if pat is None:
                continue
        found = _find(path, pat, sort_by, reverse)
        if max_files is not None:
            found = found[:max_files]
        if max_age_days is not None:
            threshold = time.time() - max_age_days * 24 * 60 * 60
            for f in found:
                if os.path.getmtime(f) < threshold:
                    raise ValueError(f"file too old: {f} ({max_age_days})")
        queue.extend(found)
    return list(dict.fromkeys(os.path.abspath(f) for f in queue))
