"""Structured Streaming jobs (SURVEY.md §1.2 'streams', §3.2).

The reference's only stream is the daily cron drop of new crawl files
(serverless.yml:116). Two Spark-native equivalents:

- ``stream_scrape_pipeline``: file-source stream over a pages directory
  with ``Trigger.AvailableNow`` — processes whatever has landed, then
  stops; exactly the daily-batch contract but with checkpointed exactly-
  once file tracking (replaces the Step Functions bookkeeping).
- ``stream_hourly_rollup``: event-time tumbling-window aggregation with a
  watermark for late data — the streaming twin of plans.queries
  q11_hourly_rollup (same results when run AvailableNow over a static dir).

State stays bounded: watermark bounds the window state; the file source
tracks only file names. At 100 TB/day these are the same plans a nightly
batch would run, but incremental.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.html import RAW_PAGE_SCHEMA, _extract_batches


def stream_scrape_pipeline(
    spark: SparkSession,
    pages_path: str,
    output_path: str,
    checkpoint_path: str,
    location_ref: DataFrame | None = None,
) -> None:
    """Streaming variant of plans.pipeline.scrape_pipeline stages 1-3:
    watch a directory for page files, parse incrementally, append the
    properties table as Parquet. Clean/dedup (which are global) run as a
    downstream batch over the materialized table — Q1's global percentile
    cannot be computed incrementally without changing semantics."""
    from ..plans.pipeline import add_address_coords, add_target_variable, make_properties_df

    from pyspark.sql import types as sty

    binary_file_schema = sty.StructType(
        [
            sty.StructField("path", sty.StringType()),
            sty.StructField("modificationTime", sty.TimestampType()),
            sty.StructField("length", sty.LongType()),
            sty.StructField("content", sty.BinaryType()),
        ]
    )
    files = (
        spark.readStream.format("binaryFile")
        .schema(binary_file_schema)
        .option("pathGlobFilter", "*.html")
        .load(pages_path)
    )
    raw = files.select("path", "content", "modificationTime").mapInPandas(
        _extract_batches, schema=RAW_PAGE_SCHEMA
    )
    props = make_properties_df(raw)
    if location_ref is not None:
        props = add_address_coords(props, location_ref)
    props = add_target_variable(props)
    q = (
        props.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_hourly_rollup(
    spark: SparkSession,
    events_stream: DataFrame,
    output_path: str,
    checkpoint_path: str,
    watermark: str = "2 hours",
) -> None:
    """Event-time tumbling-window rollup with late-data watermark —
    count + sum(value) per (hour, event_type), append-mode Parquet sink.

    ``events_stream`` must carry (ts TIMESTAMP, event_type STRING,
    value DOUBLE) — see ``events_file_stream`` for the test-data shape.
    """
    agg = (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def events_file_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over events parquet; converts the ns-BIGINT ts
    (nanosAsLong) to a proper TIMESTAMP for watermarking."""
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static = spark.read.parquet(path)
    reader = spark.readStream.schema(static.schema)
    if os.path.isfile(path):
        # file sources stream over DIRECTORIES; glob the single file
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        stream = reader.parquet(os.path.dirname(path))
    else:
        stream = reader.parquet(path)
    return stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
