"""Data-quality audits over multi-table schemas: the checks a pipeline
runs BEFORE burning a training run on a broken snapshot.

``fk_orphan_report`` measures referential integrity for a list of
child->parent relationships: rows whose foreign key has no parent
(orphans) slip in whenever ingestion races a dimension refresh or a
partial backfill drops a parent partition. Each relationship costs one
LEFT ANTI join (parent side broadcast when small) + one aggregate; the
report unions per-relationship rows so the whole audit is a single
action over one DAG.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fk_orphan_report(
    relationships: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """``relationships``: (name, child_df, child_key, parent_df,
    parent_key) tuples. Returns one row per relationship:
    (relationship, child_rows, orphan_rows, orphan_keys) where orphans
    are child rows (NULL keys included — a NULL FK never matches a
    parent) without a matching parent key."""
    reports = []
    for name, child, ckey, parent, pkey in relationships:
        keys = child.select(F.col(ckey).alias("__k"))
        # NULL keys never equal a parent key, so LEFT ANTI retains them:
        # orphan_rows covers both missing-parent and NULL-FK rows in one
        # count; orphan_keys (count_distinct) is the non-null key variety
        orphans = keys.join(
            parent.select(F.col(pkey).alias("__k")), "__k", "left_anti"
        )
        reports.append(
            keys.agg(F.count("*").alias("child_rows"))
            .crossJoin(
                orphans.agg(
                    F.count("*").alias("orphan_rows"),
                    F.count_distinct("__k").alias("orphan_keys"),
                )
            )
            .select(F.lit(name).alias("relationship"), "child_rows", "orphan_rows", "orphan_keys")
        )
    return reduce(lambda a, b: a.unionByName(b), reports)
