"""Frequency analytics: exact heavy-hitter detection via distributed
Misra-Gries candidate generation + an exact verification pass.

Why not a plain ``groupBy(col).count()``? On a 100 TB corpus the grouped
column (tokens, URLs, user ids) can have billions of distinct values; a
full-key aggregation shuffles the entire long tail even though only the
handful of items above the frequency threshold matter. The two-scan shape
here bounds what moves:

1. **Discovery scan** — each partition runs a weighted Misra-Gries summary
   (capacity ``m``) over Arrow batches. The classic guarantee transfers to
   partitions: if an item's GLOBAL count exceeds ``n/(m+1)``, its count in
   at least one partition exceeds that partition's ``n_p/(m+1)`` (otherwise
   the global sum could not exceed the sum of thresholds), so it survives
   in that partition's summary. With ``m >= k`` the candidate union
   therefore contains every item with count > n/k. Summary size is
   ``<= m`` rows per partition — the only data that leaves the scan.
2. **Verify scan** — exact counts for the (small, broadcast) candidate set
   only: a broadcast semi-join drops the tail BEFORE the aggregation, and
   map-side partial aggregation means at most ``m x n_partitions`` rows
   shuffle. The output is EXACT (item, count) for every item with
   ``count * k > n`` — no approximation survives to the result.

The per-partition row total is emitted from the same discovery scan (one
sentinel row per partition), so ``n`` costs no extra pass and the
threshold comparison stays in-plan (1-row broadcast), not a driver value.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_merge(counters: dict, items, counts, capacity: int) -> dict:
    """Merge a (item -> weight) batch into a Misra-Gries summary of at most
    ``capacity`` counters (Agarwal et al.'s mergeable-summaries rule: sum,
    then subtract the (capacity+1)-th largest value and drop <= 0)."""
    for item, cnt in zip(items, counts):
        counters[item] = counters.get(item, 0) + int(cnt)
    if len(counters) > capacity:
        cut = sorted(counters.values(), reverse=True)[capacity]
        counters = {k: v - cut for k, v in counters.items() if v > cut}
    return counters


def heavy_hitters(df: DataFrame, col: str, k: int, capacity: int | None = None) -> DataFrame:
    """Exact (item, cnt) rows for every value of ``col`` whose count
    exceeds n/k, where n = total row count. ``capacity`` (default 4k)
    is the per-partition Misra-Gries summary size; any value >= k
    preserves the no-false-negative guarantee, larger values shrink the
    (harmless, verified-away) false-positive candidate set.
    """
    if capacity is None:
        capacity = 4 * k
    if capacity < k:
        raise ValueError(f"capacity {capacity} < k {k} breaks the MG containment guarantee")

    item_type = df.schema[col].dataType.simpleString()
    summary_schema = f"item {item_type}, est long, n_part long"

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        n_part = 0
        for pdf in batches:
            vals = pdf[col].dropna()
            n_part += len(vals)  # n counts non-null values, matching the verify pass
            vc = vals.value_counts()
            counters = _mg_merge(counters, vc.index.tolist(), vc.values, capacity)
        yield pd.DataFrame(
            {
                "item": list(counters) + [None],
                "est": list(counters.values()) + [0],
                "n_part": [0] * len(counters) + [n_part],
            }
        )

    summaries = (
        df.select(F.col(col).alias(col))
        .mapInPandas(summarize, schema=summary_schema)
        # bounded: <= capacity+1 rows per partition. Materialized once so
        # the candidate branch and the total branch don't re-run the scan.
        .localCheckpoint(eager=True)
    )
    candidates = summaries.where(F.col("item").isNotNull()).select("item").distinct()
    total = summaries.agg(F.sum("n_part").alias("n"))

    exact = (
        df.select(F.col(col).alias("item"))
        .join(F.broadcast(candidates), "item", "leftsemi")
        .groupBy("item")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .where(F.col("cnt") * k > F.col("n"))
        .select("item", "cnt")
    )
