"""Filter CLI — the ``hbz.limetrans.filter.Main`` analogue (reference
main/src/main/java/hbz/limetrans/filter/Main.java:14-38,
LimetransFilter.java:157-172): filter records of a Parquet table by
atom expressions and write the matches as JSON lines to stdout or a
file.

Usage:
    python -m limetrans_ray.filter_cli INPUT.parquet \
        [-f EXPR ...] [--op any|all|none] [-o OUT.jsonl] [--limit N]

Atom grammar (LimetransFilter.java:18-28): ``@field`` exists,
``!field`` missing, ``field=value`` equals, ``field=~regex`` match,
bare value searches any field.

Owns its Ray session (guarded init) — the only module besides bench.py
and tests allowed to.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("input", help="parquet file or directory")
    ap.add_argument("-f", "--filter", action="append", default=[], dest="filters",
                    help="filter atom (repeatable)")
    ap.add_argument("--op", choices=["any", "all", "none"], default="all")
    ap.add_argument("-o", "--output", default="-", help="output JSONL path (default stdout)")
    ap.add_argument("--limit", type=int, default=None)
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        # RAY_GRAFT_CPUS bounds the session like bench.py — a small
        # filter job on a loaded box should not spawn a full worker
        # pool just to start up
        ncpu = os.environ.get("RAY_GRAFT_CPUS")
        ray.init(
            address="local", include_dashboard=False, logging_level="ERROR",
            num_cpus=int(ncpu) if ncpu else None,
        )
    import logging

    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from .functions.filter import filter_dataset

    ds = rd.read_parquet(args.input)
    if args.filters:
        ds = filter_dataset(ds, args.filters, op=args.op)
    if args.limit:
        ds = ds.limit(args.limit)

    out = sys.stdout if args.output == "-" else open(args.output, "w")
    n = 0
    try:
        for batch in ds.iter_batches(batch_size=4096, batch_format="pandas"):
            for rec in batch.to_dict(orient="records"):
                out.write(json.dumps(rec, default=str) + "\n")
                n += 1
    finally:
        if out is not sys.stdout:
            out.close()
    print(f"wrote {n} records", file=sys.stderr)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
