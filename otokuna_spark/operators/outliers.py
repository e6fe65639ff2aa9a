"""Q1 — exact-percentile outlier removal (analysis.py:11-28).

Reference semantics, reproduced exactly (SURVEY.md §2.4 Q1): for each
column, compute the linearly-interpolated 0.99 quantile and flag rows whose
value EQUALS that quantile (equality, not >=; for continuous columns the
interpolated quantile rarely equals a data value, so in practice this
prunes discrete columns). OR the flags; keep unflagged rows.

Spark plan shape: one single-pass ``percentile`` aggregation (exact, same
linear interpolation as pandas/DuckDB ``quantile_cont``) producing a 1-row
DataFrame, broadcast cross-joined into the fact table, then one filter.
Two jobs, no shuffle of the fact table — at 100 TB the fact is scanned
twice and never shuffled. (``percentile_approx`` would make it one
approximate pass; the reference semantics require exact.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def remove_outliers(df: DataFrame, columns: list[str], q: float = 0.99) -> DataFrame:
    quantiles = df.agg(
        *[F.percentile(F.col(c), F.lit(q)).alias(f"__q_{c}") for c in columns]
    )
    joined = df.crossJoin(F.broadcast(quantiles))
    flag = None
    for c in columns:
        f = F.col(c) == F.col(f"__q_{c}")
        flag = f if flag is None else (flag | f)
    return joined.filter(~flag).drop(*[f"__q_{c}" for c in columns])
