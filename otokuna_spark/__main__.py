"""CLI entry point: run any registry query (or list them) from a shell.

    python -m otokuna_spark list [pattern]
    python -m otokuna_spark run q01_pricing_summary [--sf DIR] [--limit N]
    python -m otokuna_spark explain q01_pricing_summary [--sf DIR]

``run`` executes the query on a local session and prints the result
table; ``explain`` prints the formatted physical plan (the same surface
tools/explain_audit.py audits). Default data dir honors
$SPARK_GRAFT_SF_DIR like bench.py.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    from .plans.queries import REGISTRY
    from .session import DEFAULT_SF_DIR, get_spark

    p = argparse.ArgumentParser(prog="python -m otokuna_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registry queries (+descriptions)")
    p_list.add_argument("pattern", nargs="?", default="", help="substring filter")

    for name in ("run", "explain"):
        sp = sub.add_parser(name)
        sp.add_argument("query", help="registry query name (see `list`)")
        sp.add_argument("--sf", default=DEFAULT_SF_DIR)
        if name == "run":
            sp.add_argument("--limit", type=int, default=20)

    args = p.parse_args(argv)

    if args.cmd == "list":
        for name, spec in REGISTRY.items():
            if args.pattern.lower() in name.lower():
                first = spec.description.split(";")[0].split(":")[0]
                print(f"{name:32s} {first}")
        return 0

    if args.query not in REGISTRY:
        matches = [n for n in REGISTRY if args.query.lower() in n.lower()]
        if len(matches) == 1:
            args.query = matches[0]
        else:
            hint = f" (did you mean: {', '.join(matches[:5])}?)" if matches else ""
            print(f"unknown query {args.query!r}{hint}", file=sys.stderr)
            return 2

    spark = get_spark(f"otokuna-cli-{args.cmd}")
    spark.sparkContext.setLogLevel("ERROR")
    df = REGISTRY[args.query].fn(spark, args.sf)
    if args.cmd == "explain":
        df.explain("formatted")
    else:
        # one job, not two: show() already bounds the scan to `limit` rows
        df.show(args.limit, truncate=24)
    return 0


if __name__ == "__main__":
    sys.exit(main())
