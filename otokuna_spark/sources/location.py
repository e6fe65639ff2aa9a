"""S5 — Shift-JIS CSV source: the MLIT Tokyo block-centroid dimension
(analysis.py:62-64; FIXTURES.md §3). ~5,358 rows for Tokyo — a classic
broadcast dimension."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_location_reference(spark: SparkSession, path: str) -> DataFrame:
    """Read the MLIT CSV (encoding=shift_jis, quoted header) and derive the
    geocode join key = 都道府県名 + 市区町村名 + 大字町丁目名 (analysis.py:69)."""
    # Spark 4 allows only a charset whitelist unless legacy Java charsets
    # are enabled; Shift_JIS needs the flag.
    spark.conf.set("spark.sql.legacy.javaCharsets", "true")
    df = (
        spark.read.option("header", "true")
        .option("encoding", "Shift_JIS")
        .csv(path)
    )
    return df.select(
        F.concat(F.col("都道府県名"), F.col("市区町村名"), F.col("大字町丁目名")).alias("join_key"),
        F.col("緯度").cast("double").alias("latitude"),
        F.col("経度").cast("double").alias("longitude"),
    )
