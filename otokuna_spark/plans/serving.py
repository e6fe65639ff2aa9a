"""Serving layer (SURVEY.md §3.3): job metadata, daily discovery, and the
materialized serving table that replaces Redis memoization (R3).

The reference serves via Flask + Dtale over pandas with a Redis cache
(app/app.py:147-196,280-336). Spark-native shape: the scored join is
materialized once per (date|job) as partitioned Parquet; ad-hoc
filter/sort/plot becomes Spark SQL over a temp view with Catalyst
pushdown; job discovery becomes a metadata table query instead of an
S3-prefix listing + regex (S8 -> partition pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as sty

# svc/save_job_info.py:22-29 / app/app.py:30-39 contract (FIXTURES.md §5)
JOB_INFO_SCHEMA = sty.StructType(
    [
        sty.StructField("job_id", sty.StringType()),
        sty.StructField("user_id", sty.StringType()),
        sty.StructField("timestamp", sty.DoubleType()),
        sty.StructField("search_url", sty.StringType()),
        sty.StructField("search_conditions", sty.StringType()),
        sty.StructField("raw_data_key", sty.StringType()),
        sty.StructField("scraped_data_key", sty.StringType()),
        sty.StructField("prediction_data_key", sty.StringType()),
    ]
)


def write_job_info(spark: SparkSession, records: list[dict], path: str, mode: str = "append") -> None:
    spark.createDataFrame(records, JOB_INFO_SCHEMA).write.mode(mode).json(path)


def list_jobs(spark: SparkSession, path: str) -> DataFrame:
    """O3 — job listing sorted by (timestamp, user_id) (app/app.py:322)."""
    return (
        spark.read.schema(JOB_INFO_SCHEMA).json(path).orderBy("timestamp", "user_id")
    )


def materialize_serving_table(
    predictions: DataFrame,
    scraped: DataFrame,
    path: str,
    date: str,
) -> None:
    """R3 — persist the scored serving join partitioned by date; the
    web/query layer reads one partition (pruned scan) instead of
    re-joining per request or round-tripping Redis."""
    from .pipeline import score_and_serve

    served = score_and_serve(predictions, scraped).withColumn("date", F.lit(date))
    served.write.mode("overwrite").option("partitionOverwriteMode", "dynamic").partitionBy(
        "date"
    ).parquet(path)


def available_dates(spark: SparkSession, path: str) -> list[str]:
    """S8 replacement: the reference regex-parses S3 keys to find which
    dates have predictions (app/app.py:283-294); with a `date=`-layout
    this is a partition listing."""
    rows = (
        spark.read.parquet(path)
        .select(F.col("date").cast("string").alias("date"))  # partition col may infer as DATE
        .distinct()
        .orderBy("date")
        .collect()
    )
    return [r["date"] for r in rows]


def serving_view(spark: SparkSession, path: str, date: str, name: str = "serving") -> DataFrame:
    """Register the date's serving partition as a temp view for ad-hoc SQL
    (the Dtale surface, §3.3 step 4); filters/sorts push down."""
    df = spark.read.parquet(path).filter(F.col("date") == date)
    df.createOrReplaceTempView(name)
    return df
