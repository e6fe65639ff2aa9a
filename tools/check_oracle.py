"""Local mirror of the driver's t2 correctness gate.

Runs every REGISTRY query on Spark and its oracle on DuckDB over the same
sf dir, compares row counts, column names/types (loosely), and values
(order-insensitive, columns sorted by name). Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

from otokuna_spark.io import TPCH_TABLES, table_path  # noqa: E402
from otokuna_spark.plans.queries import REGISTRY  # noqa: E402
from otokuna_spark.session import get_spark  # noqa: E402


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def run(sf_dir: str, names: list[str]) -> int:
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TPCH_TABLES:
        import os

        p = table_path(sf_dir, t)
        if os.path.exists(p):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")

    failures = 0
    for name in names:
        spec = REGISTRY[name]
        try:
            sdf = spec.fn(spark, sf_dir)
            spark_rows = sdf.collect()
            spark_cols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if spec.oracle is None:
            print(f"ok   {name}: rows-only ({len(spark_rows)} rows, no oracle)")
            continue
        try:
            ddf = con.sql(spec.oracle)
            duck_cols = [d[0] for d in ddf.description]
            duck_rows = ddf.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        if sorted(c.lower() for c in spark_cols) != sorted(c.lower() for c in duck_cols):
            print(f"FAIL {name}: columns differ spark={spark_cols} duck={duck_cols}")
            failures += 1
            continue
        if len(spark_rows) != len(duck_rows):
            print(f"FAIL {name}: rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
            failures += 1
            continue
        order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i].lower())
        dorder = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i].lower())
        s_set = sorted(tuple(norm_cell(r[i]) for i in order) for r in spark_rows)
        d_set = sorted(tuple(norm_cell(r[i]) for i in dorder) for r in duck_rows)
        if s_set != d_set:
            diff = [(a, b) for a, b in zip(s_set, d_set) if a != b][:3]
            print(f"FAIL {name}: values differ; first diffs {diff}")
            failures += 1
            continue
        print(f"PASS {name} ({len(spark_rows)} rows)")
    return failures


if __name__ == "__main__":
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    names = args[1:] or list(REGISTRY)
    sys.exit(1 if run(sf_dir, names) else 0)
