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


def rolling_robust_anomalies(
    df: DataFrame,
    key: str,
    order_cols: list[str],
    value_col: str,
    lookback: int = 12,
    min_obs: int = 8,
    k: float = 1.5,
) -> DataFrame:
    """Flag points outside the Tukey fences of their own TRAILING window:
    anomaly iff ``v < p25 - k*IQR`` or ``v > p75 + k*IQR`` where the
    quartiles come from the previous ``lookback`` observations of the same
    key (the current point is excluded — it must not vote on its own
    fences). Points with fewer than ``min_obs`` prior observations are
    never flagged (cold start).

    Quartiles are robust (bounded breakdown within the window), so a
    burst of anomalies widens the fences far less than a rolling stddev
    would — the rolling twin of ``outliers.robust_flags``. Exact
    interpolated ``percentile`` over an explicit ROWS frame; one keyed
    window shuffle total (all three window aggregates share the frame).

    Adds ``__p25``, ``__p75``, ``__m`` (frame count) and ``is_anomaly``
    (int 0/1).
    """
    w = (
        Window.partitionBy(key)
        .orderBy(*[F.asc(c) for c in order_cols])
        .rowsBetween(-lookback, -1)
    )
    v = F.col(value_col)
    out = df.withColumns(
        {
            "__p25": F.percentile(v, F.lit(0.25)).over(w),
            "__p75": F.percentile(v, F.lit(0.75)).over(w),
            "__m": F.count(v).over(w),
        }
    )
    iqr = F.col("__p75") - F.col("__p25")
    flag = (F.col("__m") >= min_obs) & (
        (v < F.col("__p25") - F.lit(k) * iqr) | (v > F.col("__p75") + F.lit(k) * iqr)
    )
    return out.withColumn("is_anomaly", flag.cast("int"))


def scd2_versions(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Slowly-changing-dimension type-2 build from a change log: collapse
    each key's event stream to its DISTINCT consecutive attribute values
    and emit one validity interval per version — (key, version, attr,
    valid_from, valid_to, is_current), half-open [from, to). The
    warehouse primitive for "what was this entity's state at time T"
    (join on key AND from <= T < to).

    Consecutive duplicate states (the overwhelmingly common case in
    event logs) are dropped BEFORE numbering, so versions count real
    transitions. NULL is a legal attribute state: the change predicate is
    null-safe (``eqNullSafe`` / SQL ``IS DISTINCT FROM``), so transitions
    into and out of NULL produce versions and consecutive NULLs collapse
    — a plain ``!=`` would silently drop every NULL-adjacent transition.
    ``tiebreak_col`` must make (ts, tiebreak) unique per key —
    simultaneous events would otherwise make lag() order, and thus the
    version chain, nondeterministic. Two window passes over the SAME
    (key x order) partitioning — one exchange, the second window reuses
    it.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    changes = (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__prev", F.lag(attr_col).over(w))
        .where(
            (F.col("__rn") == 1) | ~F.col(attr_col).eqNullSafe(F.col("__prev"))
        )
        .drop("__rn", "__prev")
    )
    w2 = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    return changes.select(
        F.col(key_col),
        F.row_number().over(w2).cast("long").alias("version"),
        F.col(attr_col).alias("attr"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )
