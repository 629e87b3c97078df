"""Per-build / per-stage manifests, atomic publish and retention.

This is the analogue of the reference's zero-downtime index lifecycle
(reference core/src/main/java/hbz/limetrans/ElasticsearchClient.java:
272-359): limetrans builds into a fresh time-window index name, flips an
alias atomically on success, skips the flip on failure or zero docs, and
retains the 2 previous indexes. Here:

- each build writes under ``<index_root>/builds/<build_id>/``;
- every pipeline stage records a manifest JSON with the input
  fingerprint, per-partition lineage (file → rows/bytes) and metrics,
  plus a ``_DONE_<stage>`` marker — a resumed build skips stages whose
  marker and fingerprint match (checkpoint/resume);
- on success the ``CURRENT`` pointer file is atomically replaced
  (``os.replace`` of a temp file — the alias-switch analogue), and old
  builds beyond ``retain`` are pruned.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time


def fingerprint_paths(paths: list[str]) -> str:
    """Stable fingerprint of a set of input files (path, size, mtime_ns)."""
    h = hashlib.blake2b(digest_size=16)
    for p in sorted(paths):
        st = os.stat(p)
        h.update(f"{p}|{st.st_size}|{st.st_mtime_ns}\n".encode())
    return h.hexdigest()


def build_dir(index_root: str, build_id: str) -> str:
    return os.path.join(index_root, "builds", build_id)


def stage_done(bdir: str, stage: str, input_fingerprint: str) -> bool:
    """True when the stage's marker exists and its manifest matches the
    current input fingerprint (otherwise the stage re-runs)."""
    marker = os.path.join(bdir, f"_DONE_{stage}")
    mpath = os.path.join(bdir, "manifests", f"{stage}.json")
    if not (os.path.exists(marker) and os.path.exists(mpath)):
        return False
    with open(mpath) as fh:
        manifest = json.load(fh)
    return manifest.get("input_fingerprint") == input_fingerprint


def write_stage_manifest(
    bdir: str,
    stage: str,
    *,
    input_fingerprint: str,
    rows_out: int | None = None,
    partitions: list[dict] | None = None,
    metrics: dict | None = None,
) -> dict:
    """Write the stage manifest + done marker (manifest first, marker
    last, so a crash between the two re-runs the stage)."""
    os.makedirs(os.path.join(bdir, "manifests"), exist_ok=True)
    manifest = {
        "stage": stage,
        "input_fingerprint": input_fingerprint,
        "rows_out": rows_out,
        "partitions": partitions or [],
        "metrics": metrics or {},
        "finished_at": time.time(),
    }
    mpath = os.path.join(bdir, "manifests", f"{stage}.json")
    with open(mpath + ".tmp", "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.replace(mpath + ".tmp", mpath)
    with open(os.path.join(bdir, f"_DONE_{stage}"), "w") as fh:
        fh.write(manifest["input_fingerprint"])
    return manifest


def stage_manifest(bdir: str, stage: str) -> dict | None:
    """The stage's manifest dict, or None if it was never written."""
    mpath = os.path.join(bdir, "manifests", f"{stage}.json")
    if not os.path.exists(mpath):
        return None
    with open(mpath) as fh:
        return json.load(fh)


def partition_lineage(directory: str) -> list[dict]:
    """Per-file lineage entries (path, bytes) for a stage output dir."""
    out = []
    for root, _dirs, files in os.walk(directory):
        for f in sorted(files):
            p = os.path.join(root, f)
            out.append({"path": os.path.relpath(p, directory), "bytes": os.path.getsize(p)})
    return out


def publish_current(index_root: str, build_id: str, *, retain: int = 2) -> None:
    """Atomically flip the CURRENT pointer to ``build_id`` and prune all
    but the ``retain`` most recent previous builds (the reference keeps
    2 — ElasticsearchClient.java:49)."""
    cur = os.path.join(index_root, "CURRENT")
    tmp = cur + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(build_id)
    os.replace(tmp, cur)
    builds_root = os.path.join(index_root, "builds")
    builds = sorted(
        (b for b in os.listdir(builds_root) if b != build_id),
        key=lambda b: os.path.getmtime(os.path.join(builds_root, b)),
        reverse=True,
    )
    for stale in builds[retain:]:
        shutil.rmtree(os.path.join(builds_root, stale), ignore_errors=True)


def current_build(index_root: str) -> str:
    with open(os.path.join(index_root, "CURRENT")) as fh:
        return fh.read().strip()
