"""Local mirror of the driver's t2 correctness gate.

Runs every REGISTRY query on Spark and its oracle on DuckDB over the same
sf dir, compares row counts, column names/types (loosely), and values
(order-insensitive, columns sorted by name). Usage:

    python tools/check_oracle.py [--record out.json] [sf_dir] [query ...]

``--record`` writes a driver-format JSON (rows/schema/hash per query).
The driver's own gate caps at 50 queries per round; the committed
CORRECTNESS_LOCAL.json produced by this flag is the full-registry
evidence for everything past that cap.
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

from otokuna_spark.io import TPCH_TABLES, table_path  # noqa: E402
from otokuna_spark.plans.queries import REGISTRY, clear_shared_relations  # noqa: E402
from otokuna_spark.session import get_spark  # noqa: E402


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def run(sf_dir: str, names: list[str], record_path: str | None = None) -> int:
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TPCH_TABLES:
        import os

        p = table_path(sf_dir, t)
        if os.path.exists(p):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")

    failures = 0
    results: dict[str, dict] = {}

    def rec(name, **kw):
        row = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        row.update(kw)
        results[name] = row

    for name in names:
        spec = REGISTRY[name]
        try:
            sdf = spec.fn(spark, sf_dir)
            spark_rows = sdf.collect()
            spark_cols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            rec(name, err=f"spark error: {e}")
            failures += 1
            continue
        if spec.oracle is None:
            print(f"ok   {name}: rows-only ({len(spark_rows)} rows, no oracle)")
            rec(name, spark_rows=len(spark_rows), err="no_oracle")
            continue
        try:
            ddf = con.sql(spec.oracle)
            duck_cols = [d[0] for d in ddf.description]
            duck_rows = ddf.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            rec(name, spark_rows=len(spark_rows), err=f"duckdb error: {e}")
            failures += 1
            continue
        n_s, n_d = len(spark_rows), len(duck_rows)
        schema_ok = sorted(c.lower() for c in spark_cols) == sorted(c.lower() for c in duck_cols)
        if not schema_ok:
            print(f"FAIL {name}: columns differ spark={spark_cols} duck={duck_cols}")
            rec(name, rows_match=(n_s == n_d), schema_match=False,
                spark_rows=n_s, oracle_rows=n_d)
            failures += 1
            continue
        if n_s != n_d:
            print(f"FAIL {name}: rowcount spark={n_s} duck={n_d}")
            rec(name, rows_match=False, schema_match=True, hash_match=False,
                spark_rows=n_s, oracle_rows=n_d)
            failures += 1
            continue
        order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i].lower())
        dorder = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i].lower())
        s_set = sorted(tuple(norm_cell(r[i]) for i in order) for r in spark_rows)
        d_set = sorted(tuple(norm_cell(r[i]) for i in dorder) for r in duck_rows)
        if s_set != d_set:
            diff = [(a, b) for a, b in zip(s_set, d_set) if a != b][:3]
            print(f"FAIL {name}: values differ; first diffs {diff}")
            rec(name, rows_match=True, schema_match=True, hash_match=False,
                spark_rows=n_s, oracle_rows=n_d)
            failures += 1
            continue
        print(f"PASS {name} ({n_s} rows)")
        rec(name, rows_match=True, schema_match=True, hash_match=True,
            spark_rows=n_s, oracle_rows=n_d)
    # drop family-shared memoized relations so a long-lived process (this
    # runner is imported by tools and tests) doesn't pin localCheckpoint
    # blocks after the sweep (round-13 advice)
    clear_shared_relations()
    if record_path:
        import json

        with open(record_path, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {record_path} ({len(results)} queries)")
    return failures


if __name__ == "__main__":
    args = sys.argv[1:]
    record = None
    if "--record" in args:
        i = args.index("--record")
        if i + 1 >= len(args):
            print("usage: check_oracle.py [--record OUT.json] [SF_DIR] [QUERY...]", file=sys.stderr)
            sys.exit(2)
        record = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    names = args[1:] or list(REGISTRY)
    sys.exit(1 if run(sf_dir, names, record_path=record) else 0)
