"""Scale-behavior evidence tests: AQE skew-join splitting and runtime
partition coalescing — the mechanisms the 100 TB plan relies on, observed
live on synthetic skew."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    # 95% of the left side shares ONE key — the classic hot-key join.
    # With the skew thresholds lowered to test scale, AQE must mark the
    # sort-merge join as skew-handled in the final adaptive plan.
    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.forceOptimizeSkewedJoin",
            "spark.sql.shuffle.partitions",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
        # skew detection compares against the median partition; enough
        # partitions are needed for the hot one to stand out
        spark.conf.set("spark.sql.shuffle.partitions", "32")

        # hot key on the LEFT only (right side unique keys) so the join
        # output stays bounded; a GLOBAL aggregate downstream (no keyed
        # re-partitioning requirement) lets AQE break the hot partition.
        left = spark.range(0, 400_000).select(
            F.when(F.col("id") % 2 == 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("payload_payload_payload_"), F.col("id")).alias("pad"),
        )
        right = spark.range(0, 400_000).select(F.col("id").alias("k"), F.col("id").alias("v"))
        joined = left.join(right, "k")
        agg = joined.agg(F.sum("v").alias("s"), F.count("*").alias("n"))
        agg.collect()
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_coalesces_small_partitions(spark):
    # 32 shuffle partitions configured, but a tiny aggregation should be
    # coalesced to far fewer at runtime (AQEShuffleRead coalesced).
    df = spark.range(0, 1000).groupBy((F.col("id") % 5).alias("g")).count()
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead coalesced" in plan or "CoalescedShuffleRead" in plan, plan[:1500]
