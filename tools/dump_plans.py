"""Dump every registry query's `.explain("formatted")` output (one file per
query) for the round's plans/ deliverables.

Usage: python tools/dump_plans.py OUT_DIR [query ...]

Each query is built against $SPARK_GRAFT_SF_DIR (default sf0.01 — plan
shape, not timing) and collect()ed first so the formatted output shows the
FINAL adaptive plan (AQE-resolved join strategies, coalesced exchanges),
then `df.explain("formatted")` is captured verbatim to OUT_DIR/<name>.txt.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from otokuna_spark.session import get_spark  # noqa: E402
from otokuna_spark.plans.queries import REGISTRY, clear_shared_relations  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    out_dir = sys.argv[1]
    wanted = sys.argv[2:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    names = [n for n in REGISTRY if not wanted or n in wanted]
    for name in names:
        try:
            df = REGISTRY[name].fn(spark, SF)
            df.collect()
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
                f.write(buf.getvalue())
            print(f"ok    {name}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}", flush=True)
    clear_shared_relations()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
