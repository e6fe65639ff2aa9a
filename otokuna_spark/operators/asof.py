"""As-of (time-travel) join — an operator the reference lacks but a
time-series/training-data pipeline needs (SURVEY.md §2.12 extensions).

Semantics: for each left row, attach the single most recent right row with
``right.ts <= left.ts`` within the same key (DuckDB's ``ASOF JOIN``, which
the oracle uses directly).

Spark-first implementation — the union-and-carry trick:
tag both sides, union by (key, ts), then ``last(right_val, ignorenulls)
over (partition by key order by ts, side rows unbounded preceding..current)``
carries the latest right row forward onto each left row. ONE shuffle on
the key (same as any keyed window), no range join, no per-key collect —
this is the formulation that survives 100 TB and skewed keys (AQE handles
hot keys; a salt would only be needed if a single key exceeds a partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
) -> DataFrame:
    """Returns every left row + right-side columns (prefixed ``r_``) from
    the as-of match, NULL where no right row precedes.

    direction='backward' (default): latest right.ts <= left.ts.
    direction='forward': earliest right.ts >= left.ts.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(direction)

    lcols = left.columns
    rcols = [c for c in right.columns if c != key]

    # Carry the right row as ONE struct so last(..., ignorenulls) moves the
    # whole row atomically (per-column carry would stitch different right
    # rows together when a right column is legitimately NULL).
    r_struct_type = F.struct(*[F.col(c) for c in rcols])
    l_tag = left.select(
        F.col(key),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in lcols if c != key]).alias("__l"),
        F.lit(None).cast(right.select(r_struct_type.alias("s")).schema["s"].dataType).alias("__r"),
    )
    r_tag = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None)
        .cast(left.select(F.struct(*[F.col(c) for c in lcols if c != key]).alias("s")).schema["s"].dataType)
        .alias("__l"),
        r_struct_type.alias("__r"),
    )
    unioned = l_tag.unionByName(r_tag)

    # __r as the final key totalizes the order among right rows that share
    # (key, ts): last(__r, ignorenulls) then always carries the MAX right
    # struct of the tie group (struct ordering is lexicographic by field),
    # identical across runs and partitionings. Without it the carried row is
    # whichever the sort happened to place last.
    if direction == "backward":
        # right rows sort before left rows at equal ts so a tie matches
        w = (
            Window.partitionBy(key)
            .orderBy(F.col("__ts").asc(), F.col("__is_left").asc(), F.col("__r").asc_nulls_first())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(key)
            .orderBy(F.col("__ts").desc(), F.col("__is_left").asc(), F.col("__r").asc_nulls_first())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    carried = unioned.select(
        F.col(key),
        F.col("__is_left"),
        F.col("__l"),
        F.last(F.col("__r"), ignorenulls=True).over(w).alias("__r"),
    )
    out = carried.where(F.col("__is_left") == 1).select(
        F.col(key),
        *[F.col(f"__l.{c}").alias(c) for c in lcols if c != key],
        *[F.col(f"__r.{c}").alias(f"r_{c}") for c in rcols],
    )
    return out
