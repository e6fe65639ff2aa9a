"""Distributed suffix array by prefix doubling — Spark-first.

Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better", github.com/google-research/deduplicate-text-datasets) build a
single-node suffix array to find duplicated substrings in O(n) memory.
``dedup.exact_char_dup_spans`` gets the same position set with one keyed
aggregation (the idiomatic Spark realization); THIS module provides the
actual suffix RANKS for the workloads that need the full ordering —
longest-repeated-substring mining, ordered suffix statistics, o(n)
sorted-suffix sampling — as a composition of DataFrame primitives:

- **prefix doubling** (Manber–Myers): after round r every suffix knows
  the dense rank of its first 2^r chars; the next round's key is the
  pair (rank[p], rank[p + 2^r]), fetched with ONE keyed equi-join (no
  gather/scatter, no per-row loops). O(log maxlen) rounds.
- **distributed dense rank**: each round's pair keys are densified with
  repartitionByRange + a per-partition dense_rank window + per-partition
  distinct-count offsets (a bounded driver collect of one long per
  shuffle partition). Equal keys land in one range partition, so ranks
  are exact; no single-partition global window anywhere.

Suffixes never cross document boundaries (each (doc, pos) suffix is the
doc's own tail), matching how a training corpus concatenates documents
with separators. Ranks are corpus-global: equal suffixes from different
documents share a rank (dense), which is exactly what duplicate mining
wants.

Scale bound: pair keys are encoded as rank1 * (n + 1) + rank2 + 1 in one
BIGINT, exact while n (total suffix count = corpus chars) < ~3e9 per SA
build — shard larger corpora and build per shard (the Lee et al. tool
shards identically before merging).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dense_rank_distributed(df: DataFrame, key: str, out: str) -> tuple[DataFrame, int]:
    """Attach the 0-based DENSE rank of ``key`` (any orderable type) as
    ``out``; returns (ranked df, number of distinct keys).

    Range-repartition on the key (equal keys cannot straddle a range
    boundary), dense_rank within each partition, then add per-partition
    offsets = running sum of upstream partitions' distinct counts. The
    only driver materialization is one count per shuffle partition."""
    part = df.repartitionByRange(F.col(key)).withColumn(
        "__pid", F.spark_partition_id()
    )
    part = part.localCheckpoint()  # the window + the counts share one pass
    counts = {
        r["__pid"]: r["__n"]
        for r in part.groupBy("__pid").agg(F.count_distinct(key).alias("__n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    sp = df.sparkSession
    off = sp.createDataFrame(
        [(pid, o) for pid, o in offsets.items()] or [(0, 0)], "__pid int, __off long"
    )
    local = F.dense_rank().over(Window.partitionBy("__pid").orderBy(key)) - 1
    ranked = (
        part.withColumn("__local", local.cast("long"))
        .join(F.broadcast(off), "__pid", "left")
        .withColumn(out, F.col("__local") + F.coalesce("__off", F.lit(0)))
        .drop("__pid", "__local", "__off")
    )
    return ranked, acc


def suffix_ranks(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    max_rounds: int | None = None,
) -> DataFrame:
    """(id, pos, rank): corpus-global dense lexicographic rank of the
    suffix ``text[pos:]`` (1-based ``pos``), for every position of every
    document. Equal suffixes (across or within documents) share a rank.

    Prefix doubling: O(log maxlen) rounds, each one keyed self-join +
    one distributed dense rank; stops early once all ranks are distinct
    (every further round would be a no-op). ``max_rounds`` caps the loop
    for adversarial inputs (default: doubles past the longest document).
    """
    base = docs.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__t"),
        F.length(text_col).alias("__len"),
    ).where(F.col("__len") >= 1)
    chars = base.select(
        "__id", "__t", F.explode(F.sequence(F.lit(1), F.col("__len"))).alias("pos")
    ).select("__id", "pos", F.expr("substring(__t, pos, 1)").alias("__c"))

    ranked, _ = _dense_rank_distributed(chars, "__c", "rank")
    cur = ranked.select("__id", "pos", "rank").localCheckpoint()
    n = cur.count()

    max_len = base.agg(F.max("__len")).collect()[0][0] or 1
    rounds = 0
    k = 1
    while k < max_len:
        if max_rounds is not None and rounds >= max_rounds:
            break
        nxt = cur.select(
            "__id", (F.col("pos") - k).alias("pos"), F.col("rank").alias("__r2")
        )
        paired = cur.join(nxt, ["__id", "pos"], "left").withColumn(
            "__key",
            F.col("rank") * (n + 1) + F.coalesce(F.col("__r2"), F.lit(-1)) + 1,
        )
        ranked, n_distinct = _dense_rank_distributed(
            paired.select("__id", "pos", "__key"), "__key", "rank"
        )
        prev = cur
        cur = ranked.select("__id", "pos", "rank").localCheckpoint()
        prev.unpersist()
        rounds += 1
        k *= 2
        if n_distinct == n:
            break
    return cur.select(F.col("__id").alias(id_col), "pos", "rank")


def suffix_array(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The suffix array proper: (sa_index, id, pos, rank) ordered by
    (rank, id, pos) — dense-rank ties broken deterministically by
    document id then position, so sa_index is a total order."""
    ranks = suffix_ranks(docs, id_col, text_col)
    w = Window.orderBy("rank", id_col, "pos")
    # row_number over a global order: used for WRITING the array at the
    # end, where a total output order is the requested artifact (the
    # same SinglePartition tail any global ORDER BY has); rank itself
    # never needs it.
    return ranks.withColumn(
        "sa_index", (F.row_number().over(w) - 1).cast("long")
    ).select("sa_index", id_col, "pos", "rank")
