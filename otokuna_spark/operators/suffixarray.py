"""Distributed suffix array by prefix doubling — Spark-first.

Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better", github.com/google-research/deduplicate-text-datasets) build a
single-node suffix array to find duplicated substrings in O(n) memory.
``dedup.exact_char_dup_spans`` gets the same position set with one keyed
aggregation (the idiomatic Spark realization); THIS module provides the
actual suffix RANKS for the workloads that need the full ordering —
longest-repeated-substring mining, ordered suffix statistics, o(n)
sorted-suffix sampling — as a composition of DataFrame primitives:

- **wide base**: round 0 dense-ranks the length-``BASE_LEN`` (32) gram
  at every position instead of single chars — truncated-substring
  string order IS the lexicographic prefix order ("abc" < "abcx"), so
  the doubling invariant holds and log2(BASE_LEN) whole corpus-shuffle
  rounds disappear (a 100 TB build saves 4 full-data rounds; the price
  is range-shuffling 32-char keys once in round 0).
- **prefix doubling** (Manber–Myers): after a round every suffix knows
  the dense rank of its first k chars; the next round's key is the pair
  (rank[p], rank[p + k]), fetched with ONE keyed equi-join (no
  gather/scatter, no per-row loops). O(log(maxlen/BASE_LEN)) rounds.
- **distributed dense rank**: each round's keys are densified with
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
from pyspark.sql import types as T

from . import persistence

# Base gram width for round 0 (must be a power of two; level index
# BASE_J = log2(BASE_LEN)). LCP consumers resolve the sub-BASE_LEN
# remainder by direct gram comparison (see ``lcp_adjacent``). 32 trades
# a heavier round-0 range shuffle (32-char keys) for one fewer
# full-corpus doubling round and one fewer LCP walk level.
BASE_LEN = 32
BASE_J = 5

# Driver fast-path gate for ``lcp_adjacent``: when the corpus's
# sum-over-docs of len(text)^2 is at most this many chars, the full
# suffix set (suffixes never cross doc boundaries, so its string mass is
# bounded by exactly that sum) is collected and sorted on the driver —
# the module's standard bounded-collect device (cluster_pairs'
# driver_edge_limit, bpe's driver_vocab_limit). The distributed doubling
# build pays O(log(maxlen)) rounds of 4-6 jobs each, which dwarfs the
# actual work for calibration-sized slices (r15: q145 5.6 s / q148 7.1 s
# at sf0.1 for 100 docs x 200 chars). The collect is hard-capped by an
# up-front aggregate, never speculative; results are IDENTICAL (Python
# str ordering = code-point order = Spark UTF8String order, and equal
# suffixes' full-overlap LCP falls out of the same sort).
LCP_DRIVER_SQ_LIMIT = 8_000_000


def _dense_rank_distributed(
    df: DataFrame,
    key: str,
    out: str,
    n_parts: int | None = None,
    reliable: bool = False,
) -> tuple[DataFrame, int, DataFrame]:
    """Attach the 0-based DENSE rank of ``key`` (any orderable type) as
    ``out``; returns (ranked df, number of distinct keys, cache handle).

    Range-repartition on the key (equal keys cannot straddle a range
    boundary), dense_rank within each partition, then add per-partition
    offsets = running sum of upstream partitions' distinct counts. The
    only driver materialization is one count per shuffle partition.
    ONE staged materialization per call (persistence.stage — localCheckpoint
    by default, a fault-tolerant checkpoint with ``reliable=True``; a
    multi-round shard build that loses an executor mid-doubling restarts
    from zero otherwise): the per-partition rank relation is
    materialized once and BOTH the distinct counts and the final offset
    join read it, so partition ids cannot drift between the two passes
    and the doubling loop pays a single job per round for lineage
    truncation. The caller unpersists the returned cache handle once the
    next round is materialized.
    ``n_parts`` sizes the range shuffle: the doubling loop launches
    O(log maxlen) rounds of fixed job overhead, so bounded-sample builds
    (registry query, tests) should use a handful of partitions while
    corpus-shard builds take the session default."""
    if n_parts:
        part = df.repartitionByRange(n_parts, F.col(key))
    else:
        part = df.repartitionByRange(F.col(key))
    local = F.dense_rank().over(Window.partitionBy("__pid").orderBy(key)) - 1
    ranked_local = persistence.stage(
        part.withColumn("__pid", F.spark_partition_id()).withColumn(
            "__local", local.cast("long")
        ),
        reliable,
    )
    counts = {
        r["__pid"]: r["__n"]
        for r in ranked_local.groupBy("__pid")
        .agg((F.max("__local") + 1).alias("__n"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    sp = df.sparkSession
    off = sp.createDataFrame(
        [(pid, o) for pid, o in offsets.items()] or [(0, 0)], "__pid int, __off long"
    )
    ranked = (
        ranked_local.join(F.broadcast(off), "__pid", "left")
        .withColumn(out, F.col("__local") + F.coalesce("__off", F.lit(0)))
        .drop("__pid", "__local", "__off")
    )
    return ranked, acc, ranked_local


def _base_grams(docs: DataFrame, id_col: str, text_col: str) -> tuple[DataFrame, DataFrame]:
    """(grams, lens): one row per (doc, pos) with the length-BASE_LEN
    gram ``substring(text, pos, BASE_LEN)`` (truncated at the doc end),
    plus the per-doc length relation. Truncated-gram STRING order equals
    lexicographic prefix order, so dense-ranking the gram is a valid
    doubling base at level BASE_J."""
    base = docs.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__t"),
        F.length(text_col).alias("__len"),
    ).where(F.col("__len") >= 1)
    lens = base.select("__id", "__len")
    grams = base.select(
        "__id", "__t", F.explode(F.sequence(F.lit(1), F.col("__len"))).alias("pos")
    ).select("__id", "pos", F.expr(f"substring(__t, pos, {BASE_LEN})").alias("__g"))
    return grams, lens


def _doubling_rounds(
    grams: DataFrame,
    n_parts: int | None,
    max_rounds: int | None = None,
    keep_tables: bool = False,
    reliable: bool = False,
) -> tuple[DataFrame, list[tuple[int, DataFrame]]]:
    """Shared doubling engine: dense-rank the base grams, then double
    until ranks are fully distinct or the prefix covers the longest doc.
    Returns (final (__id, pos, rank), [(level j, table)] — the tables
    list only retains intermediates when ``keep_tables``)."""
    # one pass gives both loop bounds: n = total positions (pair-key
    # encoding base) and max doc length (pos runs 1..len per doc, so
    # max(pos) IS the longest doc) — no separate lens aggregation job
    stats = grams.agg(
        F.count("*").alias("__n"), F.max("pos").alias("__maxlen")
    ).collect()[0]
    n = stats["__n"] or 0
    max_len = stats["__maxlen"] or 1
    ranked, n_distinct, cache = _dense_rank_distributed(
        grams, "__g", "rank", n_parts, reliable
    )
    cur = ranked.select("__id", "pos", "rank")
    tables: list[tuple[int, DataFrame]] = [(BASE_J, cur)]
    caches = [cache]

    rounds = 0
    k, j = BASE_LEN, BASE_J + 1
    while k < max_len and n_distinct < n:
        if max_rounds is not None and rounds >= max_rounds:
            break
        nxt = cur.select(
            "__id", (F.col("pos") - k).alias("pos"), F.col("rank").alias("__r2")
        )
        paired = cur.join(nxt, ["__id", "pos"], "left").withColumn(
            "__key",
            F.col("rank") * (n + 1) + F.coalesce(F.col("__r2"), F.lit(-1)) + 1,
        )
        prev_distinct = n_distinct
        ranked, n_distinct, cache = _dense_rank_distributed(
            paired.select("__id", "pos", "__key"), "__key", "rank", n_parts, reliable
        )
        cur = ranked.select("__id", "pos", "rank")
        tables.append((j, cur))
        caches.append(cache)
        if not keep_tables:
            # new round is materialized; previous round's cache freed
            caches.pop(0).unpersist()
            tables.pop(0)
        rounds += 1
        k *= 2
        j += 1
        if n_distinct == n or n_distinct == prev_distinct:
            # FIXED POINT: the rank partition refines monotonically, and a
            # round that refines nothing proves the partition already IS
            # the full-suffix equality partition (identical doc tails tie
            # forever under dense ranks — "all distinct" alone would never
            # fire on any corpus with two equal suffixes). No further
            # round can change anything; stop.
            break
    return cur, tables


def suffix_ranks(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    max_rounds: int | None = None,
    n_parts: int | None = None,
    reliable: bool = False,
) -> DataFrame:
    """(id, pos, rank): corpus-global dense lexicographic rank of the
    suffix ``text[pos:]`` (1-based ``pos``), for every position of every
    document. Equal suffixes (across or within documents) share a rank.

    Wide-base prefix doubling: round 0 ranks the BASE_LEN-char gram at every
    position, then O(log(maxlen/BASE_LEN)) doubling rounds, each one keyed
    self-join + one distributed dense rank; stops early once all ranks
    are distinct (every further round would be a no-op). ``max_rounds``
    caps the doubling loop for adversarial inputs. ``reliable=True``
    swaps every staged round for a fault-tolerant checkpoint
    (persistence.stage) so an executor loss mid-doubling does not restart
    the shard build from zero."""
    grams, _lens = _base_grams(docs, id_col, text_col)
    cur, _ = _doubling_rounds(grams, n_parts, max_rounds=max_rounds, reliable=reliable)
    return cur.select(F.col("__id").alias(id_col), "pos", "rank")


def _range_ordered(
    df: DataFrame, cols: list[str], n_parts: int | None, reliable: bool = False
) -> DataFrame:
    """Range-repartition on ``cols`` and tag each row with its partition
    id. RangePartitioning assigns partition 0 the lowest key range, so
    ``__pid`` increases with the sort order and per-partition windows on
    ``__pid`` + tiny cross-partition stitching reproduce any global-order
    computation WITHOUT a single-partition stage. Staged via
    persistence.stage (the callers read it twice: window pass + bounded
    per-partition summary); ``reliable=True`` = fault-tolerant checkpoint."""
    key_cols = [F.col(c) for c in cols]
    part = (
        df.repartitionByRange(n_parts, *key_cols)
        if n_parts
        else df.repartitionByRange(*key_cols)
    )
    return persistence.stage(
        part.withColumn("__pid", F.spark_partition_id()), reliable
    )


def suffix_array(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_parts: int | None = None,
    reliable: bool = False,
) -> DataFrame:
    """The suffix array proper: (sa_index, id, pos, rank) ordered by
    (rank, id, pos) — dense-rank ties broken deterministically by
    document id then position, so sa_index is a total order.

    The total order is computed WITHOUT a single-partition window:
    range-partition on (rank, id, pos), row_number per partition, then
    add per-partition row-count offsets (ONE long per shuffle partition
    collected to the driver — the same bounded-collect device as
    ``_dense_rank_distributed``)."""
    ranks = suffix_ranks(docs, id_col, text_col, n_parts=n_parts, reliable=reliable)
    part = _range_ordered(ranks, ["rank", id_col, "pos"], n_parts, reliable)
    counts = {
        r["__pid"]: r["__n"]
        for r in part.groupBy("__pid").agg(F.count("*").alias("__n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off = part.sparkSession.createDataFrame(
        [(pid, o) for pid, o in offsets.items()] or [(0, 0)], "__pid int, __off long"
    )
    w = Window.partitionBy("__pid").orderBy("rank", id_col, "pos")
    out = (
        part.withColumn("__local", (F.row_number().over(w) - 1).cast("long"))
        .join(F.broadcast(off), "__pid", "left")
        .withColumn("sa_index", F.col("__local") + F.coalesce("__off", F.lit(0)))
        .select("sa_index", id_col, "pos", "rank")
    )
    return out


def suffix_ranks_with_tables(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_parts: int | None = None,
    reliable: bool = False,
) -> tuple[DataFrame, list[tuple[int, DataFrame]], DataFrame, DataFrame]:
    """``suffix_ranks`` that also RETAINS each doubling round's rank
    table — the inputs LCP queries need (LCP-by-doubling walks the
    tables high-to-low). Returns (final_ranks, [(j, R_j)], doc_lens,
    grams) where ``R_j[(id,pos)]`` is the dense rank of the length-
    ``2^j`` prefix of the suffix at ``pos`` (truncated at the doc end —
    LCP consumers must length-guard, see ``lcp_adjacent``) and ``grams``
    is the materialized (id, pos, BASE_LEN-char gram) base relation for
    sub-BASE_LEN remainder resolution."""
    grams, lens = _base_grams(docs, id_col, text_col)
    # re-read by the LCP remainder joins
    grams = persistence.stage(grams, reliable)
    cur, tables = _doubling_rounds(grams, n_parts, keep_tables=True, reliable=reliable)
    return cur, tables, lens, grams


def _lcp_adjacent_driver(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Driver path: collect (id, text), enumerate/sort all suffixes, and
    emit the n-1 adjacent pairs with exact LCPs. Order key (suffix, id,
    pos) matches the distributed path's (rank, id, pos) — dense ranks
    order exactly by suffix string, and Python's code-point comparison
    equals Spark's UTF8String comparison."""
    rows = docs.select(
        F.col(id_col).alias("__id"), F.col(text_col).alias("__t")
    ).collect()
    sufs = []
    for r in rows:
        t = r["__t"]
        if not t:
            continue
        did = r["__id"]
        for p in range(len(t)):
            sufs.append((t[p:], did, p + 1))
    sufs.sort()
    out = []
    for (sa_, ia, pa), (sb_, ib, pb) in zip(sufs, sufs[1:]):
        m = min(len(sa_), len(sb_))
        lcp = 0
        while lcp < m and sa_[lcp] == sb_[lcp]:
            lcp += 1
        out.append((ia, pa, ib, pb, lcp))
    id_type = docs.schema[id_col].dataType
    schema = T.StructType(
        [
            T.StructField("id_a", id_type, True),
            T.StructField("pos_a", T.IntegerType(), True),
            T.StructField("id_b", id_type, True),
            T.StructField("pos_b", T.IntegerType(), True),
            T.StructField("lcp", T.LongType(), True),
        ]
    )
    return docs.sparkSession.createDataFrame(out, schema)


def lcp_adjacent(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_parts: int | None = None,
    reliable: bool = False,
    driver_sq_limit: int | None = LCP_DRIVER_SQ_LIMIT,
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
    After the lowest table (level BASE_J) the residual LCP is < BASE_LEN
    and is resolved EXACTLY by joining the BASE_LEN-char base grams at the
    walked offsets and taking their common prefix length (a JVM-side HOF
    over two BASE_LEN-char strings — the grams are truncated at doc ends,
    so doc-length capping is inherent). O(log(maxlen/BASE_LEN)) levels x 2
    keyed
    equi-joins each, plus the 2 gram joins.

    Adjacency needs no total order: range-partition on (rank, id, pos),
    ``lead`` within each partition, then stitch partition boundaries by
    broadcasting each partition's FIRST row back as the successor of the
    previous non-empty partition's last row (ONE row per shuffle
    partition crosses the driver — the module's standard bounded
    collect). No SinglePartition stage anywhere in the plan.

    Returns (id_a, pos_a, id_b, pos_b, lcp) for the n-1 adjacent pairs.

    ``driver_sq_limit``: bounded-collect fast path (see
    ``LCP_DRIVER_SQ_LIMIT``) — when sum(len^2) over docs is within it,
    the suffix sort runs on the driver with the identical result; pass
    ``None``/0 to force the distributed build.
    """
    if driver_sq_limit:
        ln = F.length(text_col).cast("long")
        sq = docs.agg(F.sum(ln * ln).alias("__sq")).collect()[0]["__sq"] or 0
        if sq <= driver_sq_limit:
            return _lcp_adjacent_driver(docs, id_col, text_col)
    final, tables, lens, grams = suffix_ranks_with_tables(
        docs, id_col, text_col, n_parts, reliable
    )
    with_len = final.join(lens, "__id")
    part = _range_ordered(with_len, ["rank", "__id", "pos"], n_parts, reliable)
    w = Window.partitionBy("__pid").orderBy("rank", "__id", "pos")
    led = part.select(
        "__pid",
        F.col("__id").alias("id_a"),
        F.col("pos").alias("pos_a"),
        F.col("__len").alias("__len_a"),
        F.col("rank").alias("__fr_a"),
        F.lead("__id").over(w).alias("id_b"),
        F.lead("pos").over(w).alias("pos_b"),
        F.lead("__len").over(w).alias("__len_b"),
        F.lead("rank").over(w).alias("__fr_b"),
    )
    # boundary exchange: the first row of each non-empty partition (range
    # order) is the successor of the PREVIOUS non-empty partition's last
    # row — <= one row per shuffle partition crosses the driver.
    firsts = sorted(
        part.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("__pid", "__id", "pos", "__len", "rank")
        .collect(),
        key=lambda r: r["__pid"],
    )
    succ_rows = [
        (firsts[i]["__pid"], nxt["__id"], nxt["pos"], nxt["__len"], nxt["rank"])
        for i, nxt in enumerate(firsts[1:])
    ]
    # derive the boundary-row schema from the actual partitioned relation
    # so non-long id columns (e.g. string doc ids) round-trip intact
    _pf = {f.name: f.dataType for f in part.schema.fields}
    succ_schema = T.StructType(
        [
            T.StructField("__pid", _pf["__pid"], False),
            T.StructField("__sid", _pf["__id"], True),
            T.StructField("__spos", _pf["pos"], True),
            T.StructField("__slen", _pf["__len"], True),
            T.StructField("__sfr", _pf["rank"], True),
        ]
    )
    succ = docs.sparkSession.createDataFrame(
        succ_rows or [(-1, None, None, None, None)], succ_schema
    )
    pairs = (
        led.join(F.broadcast(succ), "__pid", "left")
        .select(
            "id_a",
            "pos_a",
            "__len_a",
            "__fr_a",
            F.coalesce("id_b", "__sid").alias("id_b"),
            F.coalesce("pos_b", "__spos").alias("pos_b"),
            F.coalesce("__len_b", "__slen").alias("__len_b"),
            F.coalesce("__fr_b", "__sfr").alias("__fr_b"),
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
    # sub-BASE_LEN remainder: the walk leaves residual LCP < BASE_LEN;
    # join the truncated base grams at the walked offsets and add their
    # exact common prefix length (null gram = suffix fully consumed).
    ga = grams.select(
        F.col("__id").alias("id_a"), F.col("pos").alias("__pa"), F.col("__g").alias("__ga")
    )
    gb = grams.select(
        F.col("__id").alias("id_b"), F.col("pos").alias("__pb"), F.col("__g").alias("__gb")
    )
    pairs = (
        pairs.withColumn("__pa", F.col("pos_a") + F.col("lcp"))
        .withColumn("__pb", F.col("pos_b") + F.col("lcp"))
        .join(ga, ["id_a", "__pa"], "left")
        .join(gb, ["id_b", "__pb"], "left")
    )
    common = F.expr(
        "coalesce("
        " get(filter(sequence(1, least(length(__ga), length(__gb))),"
        "            i -> substring(__ga, i, 1) != substring(__gb, i, 1)), 0) - 1,"
        " least(length(__ga), length(__gb)))"
    ).cast("long")
    pairs = pairs.withColumn(
        "lcp",
        F.col("lcp")
        + F.when(
            F.col("__ga").isNotNull() & F.col("__gb").isNotNull(), common
        ).otherwise(F.lit(0)),
    )
    # FULLY-EQUAL suffixes (equal FINAL ranks): every loop exit leaves the
    # final rank table at either all-distinct, prefix length >= maxlen, or
    # the fixed-point partition — in all three, equal final ranks mean the
    # suffixes are literally identical strings, so their LCP is the whole
    # remaining length. The walk cannot measure those (each level is used
    # once, capping it at 2^(top+1)-1); override them in closed form.
    pairs = pairs.withColumn(
        "lcp",
        F.when(
            F.col("__fr_a") == F.col("__fr_b"),
            F.least(
                F.col("__len_a") - F.col("pos_a"), F.col("__len_b") - F.col("pos_b")
            ).cast("long")
            + 1,
        ).otherwise(F.col("lcp")),
    )
    return pairs.select("id_a", "pos_a", "id_b", "pos_b", "lcp")


def longest_repeated_substring(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_parts: int | None = None,
    reliable: bool = False,
    driver_sq_limit: int | None = LCP_DRIVER_SQ_LIMIT,
) -> DataFrame:
    """The classic suffix-array deliverable: ONE row (lrs_len, doc_id,
    pos) locating the longest substring that occurs >= 2 times anywhere
    in the corpus (within one doc or across docs) — exactly the maximal
    adjacent-SA LCP. Deterministic tie-break by (doc, pos)."""
    adj = lcp_adjacent(docs, id_col, text_col, n_parts, reliable, driver_sq_limit)
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
