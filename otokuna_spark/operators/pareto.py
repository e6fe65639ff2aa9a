"""Exact Pareto frontier (skyline) over a distributed relation.

A naive skyline is an all-pairs dominance test — O(n^2) and a cartesian
ban at any scale. The two-stage shape used here is exact and shuffle-free
on the big side:

1. **Local prune** (mapInPandas): each partition computes its own
   frontier. A global-frontier point is dominated by NO point, so it is
   dominated by no same-partition point and always survives — stage 1 can
   only drop non-answers. Frontier sizes are tiny in practice (for d=2
   it is the staircase of the partition).
2. **Global prune**: the candidate union (sum of local frontiers — small)
   is self-joined with a broadcast dominance predicate as a LEFT ANTI
   join: a candidate survives iff no other candidate strictly dominates
   it. This is a BroadcastNestedLoopJoin over candidates only — the full
   relation never participates.

Dominance: b dominates a iff b is >= a on every maximize column, <= on
every minimize column, and strictly better on at least one. Rows with
identical objective vectors never dominate each other, so exact ties are
all kept (matching the SQL ``NOT EXISTS`` twin). Rows with NULL in any
objective column are dropped up front (NULL has no place in a dominance
order).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _local_frontier(pdf: pd.DataFrame, maximize: list[str], minimize: list[str]) -> pd.DataFrame:
    if pdf.empty:
        return pdf
    # normalize to all-maximize, sort by first objective desc so any
    # dominator of row i appears at index < i or ties with it
    obj = pdf[maximize].copy()
    for c in minimize:
        obj[c] = -pdf[c]
    cols = list(obj.columns)
    order = obj.sort_values(cols, ascending=False).index
    vals = obj.loc[order].to_numpy()
    keep: list[int] = []
    kept_vals: list = []
    for i in range(len(vals)):
        v = vals[i]
        dominated = False
        for kv in kept_vals:
            if (kv >= v).all() and (kv > v).any():
                dominated = True
                break
        if not dominated:
            keep.append(order[i])
            kept_vals.append(v)
    return pdf.loc[keep]


def pareto_frontier(df: DataFrame, maximize: list[str], minimize: list[str]) -> DataFrame:
    """Rows of ``df`` not strictly dominated by any other row, where
    domination means >= on every ``maximize`` column and <= on every
    ``minimize`` column with at least one strict inequality. Exact; ties
    on the full objective vector are all kept. Output schema == input
    schema."""
    objectives = list(maximize) + list(minimize)
    if not objectives:
        raise ValueError("at least one objective column required")
    clean = df.dropna(subset=objectives)

    def prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [p for p in batches if not p.empty]
        if parts:
            yield _local_frontier(pd.concat(parts, ignore_index=True), maximize, minimize)

    cand = clean.mapInPandas(prune, schema=clean.schema).localCheckpoint(eager=True)
    a, b = cand.alias("a"), cand.alias("b")
    weakly = [F.col(f"b.{c}") >= F.col(f"a.{c}") for c in maximize] + [
        F.col(f"b.{c}") <= F.col(f"a.{c}") for c in minimize
    ]
    strictly = [F.col(f"b.{c}") > F.col(f"a.{c}") for c in maximize] + [
        F.col(f"b.{c}") < F.col(f"a.{c}") for c in minimize
    ]
    dominates = weakly[0]
    for w in weakly[1:]:
        dominates = dominates & w
    any_strict = strictly[0]
    for s in strictly[1:]:
        any_strict = any_strict | s
    return a.join(F.broadcast(b), dominates & any_strict, "left_anti")
