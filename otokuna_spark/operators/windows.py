"""Window-function operators (SURVEY.md §2.12 extensions): sessionization
and event-delta analytics over keyed time series.

Both are single-shuffle plans (partition by the entity key, order by time)
— the canonical Spark window shape that scales with the number of keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F



def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the previous event of the same key exceeds ``gap`` (same unit as ts).

    lag -> boundary flag -> running sum = session index. Two window passes
    over ONE shuffle (same partitioning/ordering, Spark reuses the sort).
    Batch twin of Structured Streaming's session_window.
    """
    w = Window.partitionBy(key).orderBy(F.asc(ts))
    boundary = F.when(
        (F.col(ts) - F.lag(F.col(ts)).over(w)) > gap, 1
    ).otherwise(0)
    # first event of a key has lag NULL -> comparison NULL -> otherwise(0):
    # session ids start at 0 for every key
    return df.withColumn(session_col, F.sum(boundary).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))




def gap_fill_locf(
    df: DataFrame,
    key: str,
    time_col: str,
    value_col: str,
    step: int = 1,
    filled_col: str = "filled",
    gap_col: str = "is_gap",
) -> DataFrame:
    """Densify a keyed integer time series and fill gaps by
    last-observation-carried-forward.

    ``df`` must hold at most one row per (key, time); times are integers
    (hour buckets, epoch units). Per key, a dense spine
    ``sequence(min_t, max_t, step)`` is generated and exploded — spine
    width is data-bounded per key, so the explode fans out locally without
    a shuffle. A left join re-attaches observations, and
    ``last(value, ignorenulls=True)`` over (key, time asc, unbounded
    preceding..current) carries the previous observation across the gap.
    The first spine row per key is always an observation (the spine starts
    at that key's min), so ``filled`` is never NULL.

    Shape: one agg shuffle for spans, one join shuffle, one window — the
    window partitioning equals the join key so Spark reuses the exchange.
    Scales with key count; per-key spine width is the only fan-out.
    """
    spans = df.groupBy(key).agg(
        F.min(time_col).alias("__t0"), F.max(time_col).alias("__t1")
    )
    spine = spans.select(
        key,
        F.explode(F.sequence(F.col("__t0"), F.col("__t1"), F.lit(step))).alias(time_col),
    )
    joined = spine.join(df.select(key, time_col, value_col), [key, time_col], "left")
    w = (
        Window.partitionBy(key)
        .orderBy(F.asc(time_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        key,
        time_col,
        F.last(F.col(value_col), ignorenulls=True).over(w).alias(filled_col),
        F.col(value_col).isNull().cast("int").alias(gap_col),
    )
