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


def _dense_rank_distributed(
    df: DataFrame, key: str, out: str, n_parts: int | None = None
) -> tuple[DataFrame, int]:
    """Attach the 0-based DENSE rank of ``key`` (any orderable type) as
    ``out``; returns (ranked df, number of distinct keys).

    Range-repartition on the key (equal keys cannot straddle a range
    boundary), dense_rank within each partition, then add per-partition
    offsets = running sum of upstream partitions' distinct counts. The
    only driver materialization is one count per shuffle partition.
    ``n_parts`` sizes the range shuffle: the doubling loop launches
    O(log maxlen) rounds of fixed job overhead, so bounded-sample
    builds (registry query, tests) should use a handful of partitions
    while corpus-shard builds take the session default."""
    if n_parts:
        part = df.repartitionByRange(n_parts, F.col(key))
    else:
        part = df.repartitionByRange(F.col(key))
    part = part.withColumn("__pid", F.spark_partition_id())
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
        # materialize the result, then free the pre-rank partition cache:
        # the doubling loop calls this O(log maxlen) times, and keeping
        # every round's intermediate would leak O(rounds x n) cache
        .localCheckpoint()
    )
    part.unpersist()
    return ranked, acc


def suffix_ranks(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    max_rounds: int | None = None,
    n_parts: int | None = None,
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

    ranked, _ = _dense_rank_distributed(chars, "__c", "rank", n_parts)
    cur = ranked.select("__id", "pos", "rank")
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
        prev = ranked
        ranked, n_distinct = _dense_rank_distributed(
            paired.select("__id", "pos", "__key"), "__key", "rank", n_parts
        )
        cur = ranked.select("__id", "pos", "rank")
        prev.unpersist()  # new round is materialized; previous cache freed
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


def suffix_ranks_with_tables(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_parts: int | None = None,
) -> tuple[DataFrame, list[tuple[int, DataFrame]], DataFrame]:
    """``suffix_ranks`` that also RETAINS each doubling round's rank
    table — the inputs LCP queries need (LCP-by-doubling walks the
    tables high-to-low). Returns (final_ranks, [(j, R_j)], doc_lens)
    where ``R_j[(id,pos)]`` is the dense rank of the length-``2^j``
    prefix of the suffix at ``pos`` (truncated at the doc end — LCP
    consumers must length-guard, see ``lcp_adjacent``); all tables are
    localCheckpoint-materialized."""
    base = docs.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__t"),
        F.length(text_col).alias("__len"),
    ).where(F.col("__len") >= 1)
    lens = base.select("__id", "__len").localCheckpoint()
    chars = base.select(
        "__id", "__t", F.explode(F.sequence(F.lit(1), F.col("__len"))).alias("pos")
    ).select("__id", "pos", F.expr("substring(__t, pos, 1)").alias("__c"))

    ranked, _ = _dense_rank_distributed(chars, "__c", "rank", n_parts)
    cur = ranked.select("__id", "pos", "rank")
    n = cur.count()
    tables: list[tuple[int, DataFrame]] = [(0, cur)]

    max_len = base.agg(F.max("__len")).collect()[0][0] or 1
    k, j = 1, 1
    while k < max_len:
        nxt = cur.select(
            "__id", (F.col("pos") - k).alias("pos"), F.col("rank").alias("__r2")
        )
        paired = cur.join(nxt, ["__id", "pos"], "left").withColumn(
            "__key",
            F.col("rank") * (n + 1) + F.coalesce(F.col("__r2"), F.lit(-1)) + 1,
        )
        ranked, n_distinct = _dense_rank_distributed(
            paired.select("__id", "pos", "__key"), "__key", "rank", n_parts
        )
        cur = ranked.select("__id", "pos", "rank")
        tables.append((j, cur))
        k *= 2
        j += 1
        if n_distinct == n:
            break
    return cur, tables, lens


def lcp_adjacent(
    docs: DataFrame, id_col: str, text_col: str, n_parts: int | None = None
) -> DataFrame:
    """LCP between every pair of ADJACENT suffixes in the suffix array —
    the relation duplicate mining reads (a substring of length L occurs
    >= 2 times iff some adjacent pair has LCP >= L).

    LCP by doubling: walk the retained rank tables high-to-low; at level
    j, if both suffixes still have >= 2^j chars past the walked offset
    AND their level-j ranks at that offset agree, the prefixes match —
    add 2^j and advance. The length guard is what makes truncated table
    entries (suffix shorter than 2^j) safe: a truncated string's rank is
    the rank of the SHORT string, equal only to equally-short equal
    strings, so unguarded equality would overcount exactly there.
    O(log maxlen) levels x 2 keyed equi-joins each; adjacency itself
    comes from one global-ordered window over the n-row rank relation
    (the same SinglePartition tail as any total-order output; the rank
    COMPUTATION never needs it).

    Returns (id_a, pos_a, id_b, pos_b, lcp) for the n-1 adjacent pairs.
    """
    final, tables, lens = suffix_ranks_with_tables(docs, id_col, text_col, n_parts)
    with_len = final.join(lens, "__id")
    w = Window.orderBy("rank", "__id", "pos")
    pairs = (
        with_len.select(
            F.col("__id").alias("id_a"),
            F.col("pos").alias("pos_a"),
            F.col("__len").alias("__len_a"),
            F.lead("__id").over(w).alias("id_b"),
            F.lead("pos").over(w).alias("pos_b"),
            F.lead("__len").over(w).alias("__len_b"),
        )
        .where(F.col("id_b").isNotNull())
        .withColumn("lcp", F.lit(0).cast("long"))
    )
    for j, table in sorted(tables, reverse=True):
        step = 2**j
        ra = table.select(
            F.col("__id").alias("id_a"), F.col("pos").alias("__pa"), F.col("rank").alias("__ra")
        )
        rb = table.select(
            F.col("__id").alias("id_b"), F.col("pos").alias("__pb"), F.col("rank").alias("__rb")
        )
        pairs = (
            pairs.withColumn("__pa", F.col("pos_a") + F.col("lcp"))
            .withColumn("__pb", F.col("pos_b") + F.col("lcp"))
            .join(ra, ["id_a", "__pa"], "left")
            .join(rb, ["id_b", "__pb"], "left")
        )
        match = (
            F.col("__ra").isNotNull()
            & F.col("__rb").isNotNull()
            & (F.col("__ra") == F.col("__rb"))
            & (F.col("__pa") + step - 1 <= F.col("__len_a"))
            & (F.col("__pb") + step - 1 <= F.col("__len_b"))
        )
        pairs = pairs.withColumn(
            "lcp", F.col("lcp") + F.when(match, F.lit(step)).otherwise(F.lit(0))
        ).drop("__pa", "__pb", "__ra", "__rb")
    return pairs.select("id_a", "pos_a", "id_b", "pos_b", "lcp")


def longest_repeated_substring(
    docs: DataFrame, id_col: str, text_col: str, n_parts: int | None = None
) -> DataFrame:
    """The classic suffix-array deliverable: ONE row (lrs_len, doc_id,
    pos) locating the longest substring that occurs >= 2 times anywhere
    in the corpus (within one doc or across docs) — exactly the maximal
    adjacent-SA LCP. Deterministic tie-break by (doc, pos)."""
    adj = lcp_adjacent(docs, id_col, text_col, n_parts)
    return (
        adj.where(F.col("lcp") >= 1)
        .orderBy(F.desc("lcp"), "id_a", "pos_a")
        .limit(1)
        .select(
            F.col("lcp").alias("lrs_len"),
            F.col("id_a").alias(id_col),
            F.col("pos_a").alias("pos"),
        )
    )
