"""Cluster job entrypoint — the ``ray job submit`` surface.

The reference runs as a JVM batch job per settings file (reference
main/src/main/java/hbz/limetrans/Main.java); ours is a Ray driver
script submitted to a cluster::

    ray job submit --working-dir . -- \\
        python -m limetrans_ray build --input /data/webtext \\
            --index-root /shared/index

    ray job submit --working-dir . -- \\
        python -m limetrans_ray search --index-root /shared/index \\
            --shards 8 "holzbau atlas" '"drei zinnen"'

    ray job submit --working-dir . -- \\
        python -m limetrans_ray update --index-root /shared/index \\
            --add /data/delta --delete-urls https://old.example/page

    ray job submit --working-dir . -- \\
        python -m limetrans_ray run settings.json --env prod --var isil=DE-605

Inside a submitted job the Ray runtime sets ``RAY_ADDRESS``; the
guarded init below connects to the hosting cluster (and falls back to
a local session for single-node runs, e.g. this sandbox). Every
subcommand prints ONE JSON line so job logs are machine-parseable,
and index builds are resumable: re-submitting after a failure skips
stages whose per-partition manifests (lineage + metrics) are complete.

Owns its Ray session (guarded init) like the other CLI entrypoints —
library code never calls ``ray.init``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray_init():
    import logging

    import ray

    if not ray.is_initialized():
        addr = os.environ.get("RAY_ADDRESS", "local")
        ncpu = os.environ.get("RAY_GRAFT_CPUS")
        # num_cpus is only legal when STARTING a local session — Ray
        # rejects it when connecting to an existing cluster (the
        # ray-job-submit path, where RAY_ADDRESS names the cluster)
        kw = {"num_cpus": int(ncpu)} if (ncpu and addr == "local") else {}
        ray.init(
            address=addr,
            include_dashboard=False,
            logging_level="ERROR",
            **kw,
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    return ray


def _parse_fields(specs: list[str]) -> list[tuple[str, str, str]]:
    """``name:column:analyzer`` triples (analyzer defaults to text)."""
    out = []
    for s in specs:
        parts = s.split(":")
        if len(parts) == 2:
            parts.append("text")
        if len(parts) != 3:
            raise SystemExit(f"bad --field spec {s!r} (name:column[:analyzer])")
        out.append(tuple(parts))
    return out


def _cmd_build(args) -> dict:
    _ray_init()
    import ray.data as rd

    from .pipelines.build_index import (
        IndexBuildConfig,
        build_index,
        build_index_from_documents,
    )

    cfg = IndexBuildConfig(
        postings_codec=args.postings_codec,
        merge_exchange=args.merge_exchange,
    )
    if args.documents:
        fields = _parse_fields(args.field) or None  # validate before IO
        ds = rd.read_parquet(args.input)
        stats = build_index_from_documents(
            ds,
            args.index_root,
            id_col=args.id_col,
            text_col=args.text_col,
            analyzer=args.analyzer,
            fields=fields,
            config=cfg,
        )
    else:
        stats = build_index(args.input, args.index_root, config=cfg)
    return {
        "cmd": "build",
        "index_root": args.index_root,
        "n_docs": stats["n_docs"],
        "metrics": stats.get("metrics", {}),
    }


def _cmd_search(args) -> dict:
    _ray_init()
    from .pipelines.search import SearchEngine, ServingPool

    if args.shards > 1:
        pool = ServingPool(args.index_root, n_shards=args.shards)
        results = pool.search_many(args.query, k=args.k, mode=args.mode)
        pool.shutdown()
    else:
        eng = SearchEngine(args.index_root)
        results = {q: eng.search(q, args.k, mode=args.mode) for q in args.query}
    return {
        "cmd": "search",
        "shards": args.shards,
        "results": {
            q: [{"doc_id": int(d), "score": round(float(s), 6)} for d, s in r]
            for q, r in results.items()
        },
    }


def _cmd_update(args) -> dict:
    _ray_init()
    from .pipelines.update_index import add_documents, delete_documents

    out = {"cmd": "update", "index_root": args.index_root}
    if args.add:
        stats = add_documents(args.add, args.index_root)
        out["n_docs"] = int(stats["n_docs"])
    if args.delete_ids or args.delete_urls:
        out["deleted"] = int(
            delete_documents(
                args.index_root,
                doc_ids=[int(i) for i in args.delete_ids] or None,
                urls=args.delete_urls or None,
            )
        )
    return out


def _cmd_run(args) -> dict:
    _ray_init()
    from .pipelines.run import run_settings

    variables = dict(v.split("=", 1) for v in args.var)
    return {
        "cmd": "run",
        **run_settings(args.settings, env=args.env, variables=variables),
    }


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m limetrans_ray", description=__doc__.splitlines()[0]
    )
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build an inverted index")
    b.add_argument("--input", required=True, help="parquet file/dir of pages")
    b.add_argument("--index-root", required=True)
    b.add_argument(
        "--documents",
        action="store_true",
        help="input is a generic documents table (id+text columns) "
        "instead of webtext (url/html/text)",
    )
    b.add_argument("--id-col", default="doc_id")
    b.add_argument("--text-col", default="text")
    b.add_argument("--analyzer", choices=["full", "simple"], default="full")
    b.add_argument(
        "--postings-codec",
        choices=["varint", "for"],
        default="varint",
        help="doc-id gap encoding of the published segments "
        "(for = frame-of-reference bit-packing)",
    )
    b.add_argument(
        "--merge-exchange",
        choices=["direct", "groupby"],
        default="direct",
        help="posting-exchange transport (direct = raw object-store "
        "exchange, no Dataset sort barrier; groupby = the Dataset form)",
    )
    b.add_argument(
        "--field",
        action="append",
        default=[],
        help="multi-field mapping name:column[:analyzer] (repeatable)",
    )
    b.set_defaults(fn=_cmd_build)

    s = sub.add_parser("search", help="query a published index")
    s.add_argument("--index-root", required=True)
    s.add_argument("-k", type=int, default=10)
    s.add_argument("--mode", choices=["and", "or"], default="and")
    s.add_argument(
        "--shards",
        type=int,
        default=1,
        help=">1 = doc-range-sharded ServingPool scatter-gather",
    )
    s.add_argument("query", nargs="+")
    s.set_defaults(fn=_cmd_search)

    r = sub.add_parser(
        "run",
        help="execute a settings-described pipeline "
        "(queue → decode → fix → sink; the reference Main analogue)",
    )
    r.add_argument("settings", help="settings JSON path")
    r.add_argument("--env", default=None, help="env profile (local/dev/prod)")
    r.add_argument(
        "--var",
        action="append",
        default=[],
        help="placeholder variable k=v (repeatable)",
    )
    r.set_defaults(fn=_cmd_run)

    u = sub.add_parser("update", help="incremental add/delete")
    u.add_argument("--index-root", required=True)
    u.add_argument("--add", help="parquet of new/changed pages")
    u.add_argument("--delete-ids", nargs="*", default=[])
    u.add_argument("--delete-urls", nargs="*", default=[])
    u.set_defaults(fn=_cmd_update)

    args = ap.parse_args(argv)
    out = args.fn(args)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
