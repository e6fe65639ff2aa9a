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


def test_percentile_approx_within_documented_tolerance(spark):
    """The documented 100 TB swap for exact percentile (README scale
    notes): percentile_approx at accuracy=10000 stays within 0.1% rank
    error of F.percentile on a 100k-row skewed distribution — the bound a
    caller relies on when trading the exact single-pass agg for the
    mergeable sketch."""
    from pyspark.sql import functions as F

    df = spark.range(100_000).selectExpr("CAST(id * id AS DOUBLE) AS v")  # skewed
    row = df.agg(
        F.percentile("v", 0.99).alias("exact"),
        F.percentile_approx("v", 0.99, 10000).alias("approx"),
    ).collect()[0]
    # rank-error bound: approx value must sit between the exact values at
    # quantiles 0.989 and 0.991
    lo, hi = df.agg(
        F.percentile("v", 0.989), F.percentile("v", 0.991)
    ).collect()[0]
    assert lo <= row.approx <= hi


def test_incremental_dedup_store_scan_prunes_to_band_key(spark, tmp_path):
    """incremental_near_dup_filter's corpus side participates only via the
    band_key column of the persisted store: with a store table carrying
    extra columns (e.g. provenance), the parquet scan prunes to band_key
    alone — corpus text/metadata is never re-read, which is what makes
    daily ingest O(batch), not O(corpus)."""
    import re

    from otokuna_spark.operators import dedup

    corpus = spark.createDataFrame([(1, "a b c d e f g")], ["doc_id", "text"])
    store_path = str(tmp_path / "store")
    dedup.minhash_band_keys(corpus, "doc_id", "text", 16, 8).withColumn(
        "provenance", F.lit("crawl-2026-08-13/shard-000042")
    ).write.parquet(store_path)

    batch = spark.createDataFrame([(2, "h i j k l m n")], ["doc_id", "text"])
    # materialize=False: the default localCheckpoints the result, which
    # would replace the executed plan with a checkpoint scan — the lazy
    # plan is what exposes the store-side ReadSchema under test
    kept, _ = dedup.incremental_near_dup_filter(
        batch, spark.read.parquet(store_path), "doc_id", "text", materialize=False
    )
    kept.collect()
    plan = kept._jdf.queryExecution().executedPlan().toString()
    store_schemas = [
        s for s in re.findall(r"ReadSchema: (\S+)", plan) if "band_key" in s
    ]
    assert store_schemas, plan[:1500]
    for s in store_schemas:
        assert "provenance" not in s and "__id" not in s, s


def test_dynamic_partition_pruning(spark, tmp_path):
    """DPP: joining a date/domain-partitioned fact table to a FILTERED dim
    prunes fact partitions at runtime from the dim's join keys — at 100 TB
    this is the difference between scanning 2 partitions and 10. The scan
    must carry a dynamicpruning partition filter."""
    path = str(tmp_path / "fact")
    spark.range(20_000).withColumn(
        "part", (F.col("id") % 10).cast("string")
    ).withColumn("v", F.col("id") * 2).write.partitionBy("part").parquet(path)
    dim = spark.createDataFrame(
        [(str(i), "keep" if i < 2 else "drop") for i in range(10)], ["part", "flag"]
    )
    j = spark.read.parquet(path).join(dim.where(F.col("flag") == "keep"), "part")
    assert j.count() == 4_000  # 2 of 10 partitions survive
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:1500]


def test_runtime_bloom_filter_prunes_shuffle_join(spark, tmp_path):
    """Spark injects a runtime Bloom filter on the fact side of a shuffle
    join when the dim side is selective — at 100 TB this is the row-level
    pruning that keeps a fact-dim shuffle join from moving rows whose key
    can never match. Evidence: `BloomFilterMightContain` lands in the
    physical plan and the result equals the unfiltered join's."""
    fact_path = str(tmp_path / "fact")
    dim_path = str(tmp_path / "dim")
    spark.range(200_000).select(
        F.col("id").alias("fk"), (F.col("id") % 1000).alias("payload")
    ).write.parquet(fact_path)
    spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("grp")
    ).write.parquet(dim_path)

    def joined():
        fact = spark.read.parquet(fact_path)
        dim = spark.read.parquet(dim_path).where("grp = 3")
        return fact.join(dim, F.col("fk") == F.col("k")).agg(
            F.count("*").alias("n"), F.sum("payload").alias("s")
        )

    expected = joined().collect()  # broadcast plan, no bloom needed
    try:
        # force the shuffle-join path and let any scan size qualify
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        q = joined()
        rows = q.collect()
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "BloomFilterMightContain" in plan or "might_contain" in plan, plan[:2000]
        assert rows == expected
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )


def test_zero_row_tables_fail_designed_or_return_clean(spark, tmp_path):
    # the degenerate-input contract on the queries with division/agg
    # edges: schema-only tables either return cleanly or raise a
    # DESIGNED ValueError — never a cryptic assertion or ANSI
    # divide-by-zero (the q88/q160/q173 empty-input regression class)
    import pytest

    from otokuna_spark.plans.queries import REGISTRY

    src = "/root/testdata/sf0.001"
    for t in ["documents", "events", "orders"]:
        spark.read.parquet(f"{src}/{t}.parquet").limit(0).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / f"{t}.parquet"))
    sf = str(tmp_path)
    with pytest.raises(ValueError, match="source"):
        REGISTRY["q88_source_overlap"].fn(spark, sf).collect()
    hll = REGISTRY["q160_hll_distinct_sketch"].fn(spark, sf).collect()
    assert len(hll) == 1 and hll[0]["exact_distinct"] == 0 and hll[0]["err_ppm"] == 0
    cm = REGISTRY["q173_cm_join_size"].fn(spark, sf).collect()
    assert len(cm) == 1 and cm[0]["exact_pairs"] == 0 and cm[0]["over_ppm"] == 0
