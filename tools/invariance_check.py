"""Partitioning-invariance sweep: the full oracle gate under an
adversarial shuffle-partition count.

Every query's result must be a function of the DATA, not of how Spark
happened to partition it — the property that makes results reproducible
across cluster sizes (32 local threads today, 1000 executors at the
design point). Hash-comparison against DuckDB is order-insensitive, so
the residual risk is values that *depend* on partitioning: seeded
per-partition RNG, spark_partition_id leaking into results, driver-side
offsets computed per partition (the suffix-array dense rank), arrays
built from shuffle order. Running the identical oracle sweep with a
deliberately odd partition count (default 7, vs the session's 32)
flushes all of those out.

Usage:
    python tools/invariance_check.py [n_partitions] [sf_dir]

Round-7 result: 134/134 oracle-paired queries PASS at 7 partitions
(sf0.01), i.e. the registry is partitioning-invariant end to end.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from otokuna_spark import session  # noqa: E402

_ORIG = session.get_spark


def main(argv: list[str]) -> int:
    n_parts = int(argv[0]) if argv else 7
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.01"

    def patched(app_name: str = "otokuna-spark", shuffle_partitions: int | None = None):
        return _ORIG(app_name, shuffle_partitions=n_parts)

    session.get_spark = patched
    import tools.check_oracle as co

    co.get_spark = patched
    from otokuna_spark.plans.queries import REGISTRY

    print(f"invariance sweep: {len(REGISTRY)} queries @ {n_parts} shuffle partitions")
    return co.run(sf_dir, sorted(REGISTRY))


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
