"""Sampling / splits (SURVEY.md §2.9 R1-R2).

The reference shuffles indices with Python's ``random.seed`` and slices
(analysis.py:115-149) — order-dependent and not reproducible distributed.
Documented divergence (SURVEY.md §4): here splits are a deterministic pure
function of the key, so they are stable under repartitioning, re-runs, and
engine changes (the DuckDB oracle computes the identical assignment).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_bucket(key: Column, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets) from a numeric or string key."""
    k = F.abs(F.crc32(key.cast("string")))
    return F.pmod(k, F.lit(n_buckets)).cast("int")


def train_val_test_split(
    df: DataFrame,
    key: str,
    val_fraction: float = 0.1875,
    test_fraction: float = 0.25,
) -> DataFrame:
    """R1 — adds a ``split`` column ('train'/'val'/'test'); same default
    ratios as ml/train.py:34-36. Key-hash assignment: disjoint, exhaustive,
    independent of row order and parallelism."""
    b = split_bucket(F.col(key), 10000)
    test_hi = int(test_fraction * 10000)
    val_hi = test_hi + int(val_fraction * 10000)
    return df.withColumn(
        "split",
        F.when(b < test_hi, F.lit("test")).when(b < val_hi, F.lit("val")).otherwise(F.lit("train")),
    )


def sample_fraction(df: DataFrame, fraction: float, seed: int = 123) -> DataFrame:
    """R2 — seeded Bernoulli sample (ml/check_onnx.py's df.sample)."""
    return df.sample(fraction=fraction, seed=seed)
