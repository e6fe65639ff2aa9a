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
# entries (dict order), so the window is ROTATED based on the committed
# attestation history: at import time we read every CORRECTNESS_r*.json
# in the repo root and order the registry never-attested-first, then
# least-recently-attested. Each round therefore attests the queries with
# the weakest driver evidence instead of re-attesting last round's
# window. (q100_bpe_tokenize was pinned last while it was a rows-only
# entry; since round 11 its recursive-CTE oracle replays the whole
# training loop, so it competes for a window slot like any other query —
# and, never having earned a hash row, sorts first.)
# CORRECTNESS_LOCAL.json (tools/check_oracle.py --record) still covers
# the full registry every round.
_GATE_PINNED_LAST: list[str] = []

# Queries whose latency is dominated by one-time session warm-up costs
# (JVM JIT, codegen, first-shuffle init) when they run FIRST on a cold
# session — the suffix-array build launches ~12 sequential jobs, so it
# pays every cold cost serially (~15 s cold vs ~5 s warm measured on a
# vanilla local[8] session). Within the same attestation tier these
# sort AFTER their peers so a couple of cheaper queries absorb the
# warm-up; the rotation semantics (weakest evidence first) are
# otherwise unchanged.
_GATE_WARMUP_SENSITIVE = {
    "q145_longest_repeated_substring",
    "q148_distinct_substring_count",
}


def _attestation_rounds() -> dict[str, int]:
    """name -> latest round with a green driver row (rows+schema match,
    and hash match when a hash was computed)."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, v in rows.items():
            if not isinstance(v, dict):
                continue
            green = (
                v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match") in (True, None)
            )
            if green:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def _gate_ordered_names() -> list[str]:
    names = list(REGISTRY)
    latest = _attestation_rounds()
    order = {n: i for i, n in enumerate(names)}
    body = [n for n in names if n not in _GATE_PINNED_LAST]
    # never-attested (latest=0) first, then ascending last-attested round;
    # warm-up-sensitive queries sink within their tier; registration
    # order breaks remaining ties so the rotation is deterministic.
    body.sort(key=lambda n: (latest.get(n, 0), n in _GATE_WARMUP_SENSITIVE, order[n]))
    return body + [n for n in _GATE_PINNED_LAST if n in order]


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
