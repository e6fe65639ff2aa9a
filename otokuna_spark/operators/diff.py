"""Row-level snapshot diff — the CDC/versioned-dataset primitive:
given two snapshots of a keyed table, classify every key as added,
removed, or changed (and optionally report unchanged).

``profile.snapshot_drift`` answers "did the DISTRIBUTION move";
this answers "which ROWS moved" — what a data-versioning layer (Delta/
LakeFS-style) shows in a commit diff, and what an incremental consumer
needs to re-process only the delta.

Shape: one FULL OUTER equi-join on the key with per-side content
hashes computed in the scan projection (xxhash64 over the canonicalized
compare columns — computed before the join, so the join carries two
longs per row, not the full payload). One shuffle per side, no window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _content_hash(cols: list[str]):
    # NULL-safe canonicalization: hash over explicitly-delimited string
    # forms so (NULL, "a") never collides with ("a", NULL)
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x1f")) for c in cols]
    return F.xxhash64(*parts)


def hashed_snapshot(df: DataFrame, key: str, compare_cols: list[str]) -> DataFrame:
    """(k, __h) content-hash projection of a keyed snapshot — the only
    state a diff needs, and the only state the streaming twin persists
    (two longs + key per row, never the payload)."""
    return df.select(F.col(key).alias("k"), _content_hash(compare_cols).alias("__h"))


def diff_hashed(
    old_h: DataFrame,
    new_h: DataFrame,
    key: str,
    include_unchanged: bool = False,
) -> DataFrame:
    """Classify hashed snapshots (``hashed_snapshot`` outputs). Shared by
    the batch operator and streaming.jobs.ingest_snapshot_batch so the
    two paths cannot drift."""
    o = old_h.select(F.col("k"), F.col("__h").alias("__h_old"))
    n = new_h.select(F.col("k"), F.col("__h").alias("__h_new"))
    joined = o.join(n, "k", "full_outer")
    change = (
        F.when(F.col("__h_old").isNull(), F.lit("added"))
        .when(F.col("__h_new").isNull(), F.lit("removed"))
        .when(F.col("__h_old") != F.col("__h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(F.col("k").alias(key), change.alias("change_type"))
    if not include_unchanged:
        out = out.where(F.col("change_type") != "unchanged")
    return out


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str],
    include_unchanged: bool = False,
) -> DataFrame:
    """(key, change_type) for every key in either snapshot:
    ``added`` (new only), ``removed`` (old only), ``changed`` (both, any
    compare column differs), plus ``unchanged`` when requested. Keys must
    be unique per snapshot (enforce upstream; duplicate keys make "the
    row for key k" ill-defined)."""
    return diff_hashed(
        hashed_snapshot(old, key, compare_cols),
        hashed_snapshot(new, key, compare_cols),
        key,
        include_unchanged,
    )
