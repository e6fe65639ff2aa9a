"""Interval overlap self-join without a cartesian or broadcast-nested-loop
plan: the time-bucket decomposition used by genomics joins and telemetry
correlation at scale.

Each interval [start, end] is exploded onto the coarse buckets it covers;
candidate pairs meet through an EQUI-join on bucket, so Spark shuffles
intervals to buckets instead of comparing everything with everything.
Duplicate discovery (a pair overlapping across several buckets) is
eliminated WITHOUT a distinct shuffle by the standard first-bucket trick:
a pair is emitted only in the bucket containing max(start_a, start_b) —
exactly one bucket qualifies per overlapping pair.

``bucket_width`` is the knob: too coarse packs everything into few
buckets (join skew), too fine multiplies the explode fan-out by
interval_span/width. Pick ~ the median interval length. At 100 TB the
bucket key is also the natural partition key for pre-bucketed storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def overlap_pairs(
    df: DataFrame,
    id_col: str,
    start: str,
    end: str,
    bucket_width: int,
) -> DataFrame:
    """All pairs (id_a < id_b) whose [start, end] intervals overlap
    (inclusive touch counts), with the overlap window:
    (id_a, id_b, overlap_start, overlap_end). Exact — bucketing only
    routes candidates; the overlap predicate decides. Times must be
    NON-NEGATIVE integers (bucketing uses exact integer division —
    a double round-trip would mis-bucket beyond 2^53, e.g. nanosecond
    epochs, and silently drop pairs)."""
    b = df.select(
        F.col(id_col).alias("id"),
        F.col(start).alias("s"),
        F.col(end).alias("e"),
        F.explode(
            F.sequence(F.expr(f"{start} div {bucket_width}"), F.expr(f"{end} div {bucket_width}"))
        ).alias("bucket"),
    )
    a, c = b.alias("a"), b.alias("b")
    pair_start = F.greatest(F.col("a.s"), F.col("b.s"))
    return (
        a.join(
            c,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")),
        )
        .where(
            (F.col("a.s") <= F.col("b.e"))
            & (F.col("b.s") <= F.col("a.e"))
            # first-bucket dedup: emit only where max(start) falls in this bucket
            & (F.expr(f"greatest(a.s, b.s) div {bucket_width}") == F.col("a.bucket"))
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            pair_start.alias("overlap_start"),
            F.least(F.col("a.e"), F.col("b.e")).alias("overlap_end"),
        )
    )
