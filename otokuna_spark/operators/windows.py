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


