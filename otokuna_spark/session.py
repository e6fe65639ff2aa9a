"""SparkSession factory.

Defaults are chosen for the 100 TB design point and scaled down by env vars
for local testing:

- AQE on (runtime coalescing, skew-join splitting) — at cluster scale the
  static shuffle-partition count is always wrong for some stage; AQE fixes
  it per-stage from runtime statistics.
- ``spark.sql.shuffle.partitions`` defaults to 2x local cores (a cluster
  deploy would set ~2-3x total executor cores; AQE coalesces the excess).
- Arrow enabled for every pandas-UDF boundary.
- Session timezone pinned to UTC so timestamp->date semantics are
  deterministic and match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def local_cores() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "otokuna-spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Return the active SparkSession, or build a local one.

    When the driver harness hands us a session we use it as-is; config below
    only applies to sessions this package creates itself (tests, bench).
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    cores = local_cores()
    parts = shuffle_partitions or max(cores, 32)
    return (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(parts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.warehouse.dir", os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/otokuna-spark-warehouse"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
