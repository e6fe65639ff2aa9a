"""Table profiling — the data-quality primitive a training-data lake runs
before anything else touches a new drop (null explosions, cardinality
drift, range drift).

One scan total: all per-column statistics are computed in a SINGLE global
aggregation, then unpivoted driver-side-free with ``stack()`` — profiling
k columns of a 100 TB table costs one pass, not k passes. Exact distinct
counts shuffle one hash set per column; ``approx=True`` swaps in
HyperLogLog++ (``approx_count_distinct``, rsd default 5%) whose state is
constant-size per column — the right default at the full design point,
while exact mode is the oracle-matchable twin (q79_table_profile).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    double_scale: float = 100.0,
    approx: bool = False,
    approx_rsd: float = 0.05,
) -> DataFrame:
    """Profile ``cols`` (default: all) in one aggregation pass.

    Returns one row per column: (col_name, n, n_null, n_distinct, min_v,
    max_v). min/max are STRINGS so heterogeneous column types unpivot into
    one relation: BIGINT/STRING cast directly, DOUBLE floor-scaled by
    ``double_scale`` (portable across engines — raw double formatting is
    not), TIMESTAMP truncated to ISO date. Distinct counts for timestamps
    count distinct DATES (days), matching the drift signal a lake monitor
    wants.
    """
    cols = cols or df.columns
    dtypes = dict(df.dtypes)
    aggs: list[Column] = [F.count(F.lit(1)).alias("n")]
    nd = (
        (lambda c: F.approx_count_distinct(c, approx_rsd))
        if approx
        else (lambda c: F.count_distinct(c))
    )
    for i, c in enumerate(cols):
        t = dtypes[c]
        aggs.append(F.count(c).alias(f"nn_{i}"))
        if t == "double" or t == "float":
            aggs.append(nd(F.col(c)).alias(f"nd_{i}"))
            aggs.append(
                F.floor(F.min(c) * double_scale).cast("long").cast("string").alias(f"mn_{i}")
            )
            aggs.append(
                F.floor(F.max(c) * double_scale).cast("long").cast("string").alias(f"mx_{i}")
            )
        elif t.startswith("timestamp") or t == "date":
            aggs.append(nd(F.col(c).cast("date")).alias(f"nd_{i}"))
            aggs.append(F.min(c).cast("date").cast("string").alias(f"mn_{i}"))
            aggs.append(F.max(c).cast("date").cast("string").alias(f"mx_{i}"))
        else:
            aggs.append(nd(F.col(c)).alias(f"nd_{i}"))
            aggs.append(F.min(c).cast("string").alias(f"mn_{i}"))
            aggs.append(F.max(c).cast("string").alias(f"mx_{i}"))
    a = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', n - nn_{i}, nd_{i}, mn_{i}, mx_{i}" for i, c in enumerate(cols)
    )
    return (
        a.selectExpr(
            f"stack({len(cols)}, {stack_args}) AS (col_name, n_null, n_distinct, min_v, max_v)",
            "n",
        )
        .select(
            "col_name",
            "n",
            F.col("n_null").cast("long").alias("n_null"),
            F.col("n_distinct").cast("long").alias("n_distinct"),
            "min_v",
            "max_v",
        )
        .orderBy("col_name")
    )
