"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The real implementations live in ``otokuna_spark`` (see SURVEY.md §2 for
the operator inventory this covers; plans/queries.py for the registry).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from otokuna_spark.plans.queries import REGISTRY  # noqa: E402

# The driver's correctness gate records only the FIRST 50 ``queries()``
# entries (dict order). Registration order would leave everything past
# q59 permanently unattested, so the gate window is ROTATED: the newest
# registrations (round 3+ — q60 onward, registration index >= 50) come
# first, then the earlier queries. CORRECTNESS_LOCAL.json (tools/
# check_oracle.py --record) still covers the full registry every round.
_GATE_ROTATION_SPLIT = 50

# 54 queries are unattested after round 4 but the window holds 50: these
# four wait at the back of the unattested block (they carry the strongest
# independent evidence — exact cross-checks against reference
# implementations in tests/test_operators.py). NEXT ROUND: rotate them to
# the front and retire the names CORRECTNESS_r05.json has covered.
_GATE_DEFERRED = [
    "q91_substring_spans",
    "q92_semantic_dedup",
    "q98_cdc_chunk_dedup",
    "q99_winnowing_overlap",
]


def _gate_ordered_names() -> list[str]:
    names = list(REGISTRY)
    unattested = names[_GATE_ROTATION_SPLIT:]
    front = [n for n in unattested if n not in _GATE_DEFERRED]
    return front + _GATE_DEFERRED + names[:_GATE_ROTATION_SPLIT]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    training-data-pipeline extensions). Each callable takes
    (spark, sf_dir) and returns a DataFrame with columns aliased to match
    ``oracle_sql``."""
    return {name: REGISTRY[name].fn for name in _gate_ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted for
    non-SQL-expressible ops -> driver records a rows-only check)."""
    return {
        name: REGISTRY[name].oracle
        for name in _gate_ordered_names()
        if REGISTRY[name].oracle is not None
    }
