"""Skew mitigation (SURVEY.md 'Optimize for scale' — salting + AQE).

AQE's skew-join splitting handles most hot keys at runtime; these
operators cover the cases AQE cannot: skewed AGGREGATION keys (AQE only
splits joins) and joins where the skew is known a priori.

- ``salted_agg``: two-phase aggregation — groupBy (key, salt) partial,
  then groupBy key final. Turns one hot reducer into ``n_salts`` and
  composes with any associative aggregate list.
- ``salted_join``: replicate the small side ``n_salts`` times, salt the
  big side randomly — every hot key's rows spread over n_salts tasks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, col: str = "__salt") -> DataFrame:
    """Deterministic-enough salt from a uniform random draw; only the
    DISTRIBUTION matters (any row may take any salt)."""
    return df.withColumn(col, (F.rand(seed=42) * n_salts).cast("int"))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: Callable[[], list[Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``partial_aggs`` aggregate within (keys, salt); ``final_aggs()``
    re-aggregate the partials per key — the caller names partial columns
    so the final stage can reference them (e.g. partial ``sum(x) as s``,
    final ``sum(s) as s``). Only valid for algebraic aggregates.
    """
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs())


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: big side gets a random salt, small side is
    replicated across all salt values; join on (key, salt). Output
    columns = big ∪ small (minus the helper columns).

    Use when one join key dominates (power-law ids) and the small side
    fits the n_salts replication budget; otherwise rely on AQE.
    """
    big_s = with_salt(big, n_salts)
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    small_r = small.select("*", salts)
    out = big_s.join(small_r, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def skew_report(df: DataFrame, key: str, top_k: int = 5) -> DataFrame:
    """Key-distribution diagnostic that decides whether a join/agg on
    ``key`` needs salting before it runs at scale: the top-``top_k``
    keys with their row counts, share of the table in ppm, and the
    ratio of each key's count to the MEAN key count in ppm (a hot key
    at 100x mean is the AQE-skew-split / salting trigger).

    One keyed aggregation + a 1-row global-stats broadcast + top-k via
    TakeOrderedAndProject — the diagnostic never costs more than the
    aggregation it is protecting."""
    counts = df.groupBy(F.col(key).alias("key_value")).agg(F.count("*").alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("__total"), F.count("*").alias("__n_keys")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            F.col("key_value").cast("string").alias("key_value"),
            "cnt",
            # DECIMAL(38,0): cnt approaches the table's row count, so
            # BIGINT cnt*1e6 (worse: cnt*n_keys*1e6) wraps silently past
            # ~9e12 rows — exactly the scale this diagnostic exists for.
            # The oracle twin widens identically via HUGEINT.
            # `div` (IntegralDivide) keeps the quotient exact: decimal `/`
            # rounds HALF_UP to scale 6 before floor, overshooting by one
            # whenever the true fraction is >= 0.9999995.
            F.expr(
                "cast(cast(cnt as decimal(38,0)) * 1000000 div __total as bigint)"
            ).alias("share_ppm"),
            F.expr(
                "cast(cast(cnt as decimal(38,0)) * __n_keys * 1000000 div __total as bigint)"
            ).alias("vs_mean_ppm"),
        )
        .orderBy(F.desc("cnt"), "key_value")
        .limit(top_k)
    )
