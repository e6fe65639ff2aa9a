"""Incremental aggregate maintenance: keep a keyed aggregate table fresh
by merging batch deltas instead of recomputing over the full history.

The pattern every 100 TB metrics/materialized-view pipeline needs: the
full input is unbounded, but decomposable aggregates (count, sum, min,
max) satisfy ``agg(A ∪ B) = merge(agg(A), agg(B))`` — so a new batch
costs one aggregation over the BATCH plus one merge keyed on the (much
smaller) state table. Non-decomposable aggregates (exact median, distinct
count) don't fit this contract and are intentionally not offered; use
sketches or recompute for those.

``measures`` maps output column -> (op, input column):

    {"n": ("count", "*"), "v_sum": ("sum", "v"), "v_max": ("max", "v")}

``aggregate_state`` produces the canonical state frame from raw rows;
``merge_states`` combines any two state frames (count merges by SUM —
the classic subtlety). Merging is associative and commutative, so state
can also be built tree-wise across shards or maintained by a streaming
``foreachBatch`` (see ``streaming.jobs.stream_running_counts``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_AGG = {
    "count": lambda c: F.count(c).cast("long"),
    "sum": lambda c: F.sum(c).cast("long"),
    "min": F.min,
    "max": F.max,
}
# how each measure column combines across two state frames
_MERGE = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}


def aggregate_state(
    df: DataFrame, keys: list[str], measures: dict[str, tuple[str, str]]
) -> DataFrame:
    """One aggregation pass: raw rows -> canonical keyed state."""
    aggs = []
    for out, (op, col) in measures.items():
        if op not in _AGG:
            raise ValueError(f"unsupported aggregate {op!r} (decomposable ops only: {sorted(_AGG)})")
        aggs.append(_AGG[op](col).alias(out))
    return df.groupBy(*keys).agg(*aggs)


def fold_states(
    states: DataFrame, keys: list[str], measures: dict[str, tuple[str, str]]
) -> DataFrame:
    """Collapse any number of stacked state frames (one relation holding
    rows from several ``aggregate_state`` outputs) into one: a single
    keyed aggregation where count columns SUM, sums SUM, min/max re-min/
    max. Shuffle-bounded by distinct key count, never by history size."""
    merges = [
        _MERGE[op](F.col(out)).cast("long").alias(out)
        if op in ("count", "sum")
        else _MERGE[op](F.col(out)).alias(out)
        for out, (op, _) in measures.items()
    ]
    return states.groupBy(*keys).agg(*merges)


def merge_states(
    state: DataFrame, delta: DataFrame, keys: list[str], measures: dict[str, tuple[str, str]]
) -> DataFrame:
    """Merge two state frames produced by ``aggregate_state`` with the
    same keys/measures: union + one keyed fold."""
    return fold_states(state.unionByName(delta), keys, measures)


def incremental_update(
    state: DataFrame, batch: DataFrame, keys: list[str], measures: dict[str, tuple[str, str]]
) -> DataFrame:
    """Fold a raw batch into existing state: aggregate the batch, merge."""
    return merge_states(state, aggregate_state(batch, keys, measures), keys, measures)
