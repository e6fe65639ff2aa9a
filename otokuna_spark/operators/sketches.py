"""Integer-exact distinct-cardinality sketch (HLL-style) — SURVEY.md
§2.13.

The pre-flight estimator a 100 TB dedup/vocab planner runs BEFORE
choosing a strategy: exact distinct shuffles the whole vocabulary; the
sketch shuffles at most ``HLL_M`` register rows per task (map-side
combining max), and registers MERGE by element-wise max — the property
that makes the sketch incremental (streaming twin:
``streaming.jobs.stream_hll_distinct``) and cluster-friendly (shard
registers union + re-max, never re-scan).

Everything is integer arithmetic reproducible in ANSI SQL (the q160
oracle recomputes it verbatim): 60-bit md5-prefix hashes, 6-bit bucket,
leading-zero rank rho via ``length(bin(w))`` (both engines' ``bin()``
drops leading zeros), and a harmonic mean with registers scaled by
``2^RHO_MAX`` so ``sum 2^(RHO_MAX - M_j) <= m * 2^RHO_MAX = 2^61``
stays in BIGINT — no floats, no cross-engine rounding risk. alpha_64
enters in exact ppm. Raw-regime estimator only (input vocabulary >>
2.5 m documented; the small-range linear-counting correction needs
``ln`` and is outside the integer-exact contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HLL_M = 64
HLL_RHO_MAX = 55
# alpha_64 = 0.7213 / (1 + 1.079/64), in exact ppm
HLL_ALPHA_PPM = 709340


def hll_registers(df: DataFrame, value_col: str) -> DataFrame:
    """(bucket, m): the HLL register relation for the values in
    ``value_col`` — ONE keyed max aggregation whose output is bounded by
    ``HLL_M`` rows at any input size (duplicates are absorbed for free:
    equal values hash equal, and max ignores repeats)."""
    hv = df.select(
        F.conv(F.substring(F.md5(value_col), 1, 15), 16, 10)
        .cast("long")
        .alias("__v")
    )
    rr = hv.select(
        (F.col("__v") % HLL_M).alias("bucket"),
        F.when(F.expr(f"__v div {HLL_M}") == 0, F.lit(HLL_RHO_MAX))
        .otherwise(F.lit(HLL_RHO_MAX) - F.length(F.expr(f"bin(__v div {HLL_M})")))
        .alias("rho"),
    )
    return rr.groupBy("bucket").agg(F.max("rho").alias("m"))


def merge_registers(regs: DataFrame) -> DataFrame:
    """Element-wise max-merge of any union of register relations —
    merge(reg(A), reg(B)) == reg(A union B), the decomposability that
    makes the sketch incremental and shard-parallel."""
    return regs.groupBy("bucket").agg(F.max("m").alias("m"))


def hll_estimate(reg: DataFrame) -> DataFrame:
    """One-row (m, n_zero_registers, s55_total, est_distinct) from a
    register relation (<= HLL_M rows in, 1 row out)."""
    s = reg.agg(
        F.sum(F.expr(f"cast(pow(2, {HLL_RHO_MAX} - m) as bigint)")).alias("s55"),
        F.count("*").alias("n_present"),
    )
    return s.select(
        F.lit(HLL_M).cast("long").alias("m"),
        (F.lit(HLL_M) - F.col("n_present")).cast("long").alias("n_zero_registers"),
        F.expr(
            f"cast(coalesce(s55, 0) + ({HLL_M} - n_present)"
            f" * cast(pow(2, {HLL_RHO_MAX}) as bigint) as bigint)"
        ).alias("s55_total"),
    ).select(
        "m",
        "n_zero_registers",
        "s55_total",
        F.expr(
            f"cast(cast({HLL_ALPHA_PPM} as decimal(38,0)) * {HLL_M * HLL_M}"
            f" * cast(pow(2, {HLL_RHO_MAX}) as decimal(38,0))"
            f" div (cast(1000000 as decimal(38,0)) * s55_total) as bigint)"
        ).alias("est_distinct"),
    )


def hll_registers_by(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """(…keys, bucket, m): one HLL register relation PER KEY GROUP —
    ``hll_registers`` generalized to a grouped sketch (per-source, per-
    snapshot, per-shard …). Output bounded by ``HLL_M * |groups|`` rows
    at any input size; groups max-merge exactly like single sketches, so
    the union estimate of any subset of groups is one re-max away
    (the device q167's inclusion-exclusion overlap matrix builds on)."""
    hv = df.select(
        *keys,
        F.conv(F.substring(F.md5(value_col), 1, 15), 16, 10)
        .cast("long")
        .alias("__v"),
    )
    rr = hv.select(
        *keys,
        (F.col("__v") % HLL_M).alias("bucket"),
        F.when(F.expr(f"__v div {HLL_M}") == 0, F.lit(HLL_RHO_MAX))
        .otherwise(F.lit(HLL_RHO_MAX) - F.length(F.expr(f"bin(__v div {HLL_M})")))
        .alias("rho"),
    )
    return rr.groupBy(*keys, "bucket").agg(F.max("rho").alias("m"))


def hll_estimate_by(reg: DataFrame, keys: list[str]) -> DataFrame:
    """(…keys, est_distinct): the integer-exact raw-regime HLL estimate
    per key group (<= HLL_M rows in per group, 1 row out per group) —
    ``hll_estimate`` generalized to grouped registers; identical
    arithmetic, so the q160 oracle device recomputes it per group."""
    s = reg.groupBy(*keys).agg(
        F.sum(F.expr(f"cast(pow(2, {HLL_RHO_MAX} - m) as bigint)")).alias("s55"),
        F.count("*").alias("n_present"),
    )
    return s.select(
        *keys,
        F.expr(
            f"cast(cast({HLL_ALPHA_PPM} as decimal(38,0)) * {HLL_M * HLL_M}"
            f" * cast(pow(2, {HLL_RHO_MAX}) as decimal(38,0))"
            f" div (cast(1000000 as decimal(38,0))"
            f" * (s55 + ({HLL_M} - n_present)"
            f" * cast(pow(2, {HLL_RHO_MAX}) as bigint))) as bigint)"
        ).alias("est_distinct"),
    )


# ---------------------------------------------------------- Count-Min

CM_D = 4
CM_W = 512


def cm_positions(df: DataFrame, value_col: str, keep: list[str] | None = None) -> DataFrame:
    """(…keep, salt, col): the CM_D salted-md5 column positions of every
    value — the shared projection both counter building and probing use
    (q163's oracle recomputes it verbatim)."""
    salts = F.array(*[F.lit(j) for j in range(CM_D)])
    keep = keep or []
    first = keep + ([value_col] if value_col not in keep else [])
    return df.select(*first, F.explode(salts).alias("salt")).select(
        *keep,
        "salt",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.col("salt"), F.col(value_col))), 1, 15
                ),
                16,
                10,
            ).cast("long")
            % CM_W
        ).alias("col"),
    )


def cm_counters(df: DataFrame, value_col: str) -> DataFrame:
    """(salt, col, c): the Count-Min counter relation for the values in
    ``value_col`` — ONE keyed count whose output is bounded by
    CM_D * CM_W rows at any input size; map-side combine absorbs the
    Zipf head before anything shuffles."""
    return cm_positions(df, value_col).groupBy("salt", "col").agg(
        F.count("*").alias("c")
    )


def merge_counters(counters: DataFrame) -> DataFrame:
    """Sum-merge of any union of counter relations —
    merge(cm(A), cm(B)) == cm(A union B): counters are plain sums, the
    decomposability that makes the sketch incremental and
    shard-parallel (the additive twin of ``merge_registers``)."""
    return counters.groupBy("salt", "col").agg(F.sum("c").alias("c"))


def cm_estimates(counters: DataFrame, probes: DataFrame, value_col: str) -> DataFrame:
    """(…probe columns, cm_est): the Count-Min estimate min_j
    counter[j][pos_j(v)] for every probe row. Never underestimates.
    The counter relation rides broadcast (<= CM_D * CM_W rows).

    LEFT join + coalesce(c, 0): a counter cell no value ever hashed to
    is 0 in the canonical CM sketch, so a probe landing on an empty cell
    must contribute 0 to the min (and a probe whose every cell is empty
    must still emit one row with cm_est = 0) — an inner join would drop
    those rows and over-estimate the rest."""
    keep = [c for c in probes.columns]
    return (
        cm_positions(probes, value_col, keep=keep)
        .join(F.broadcast(counters), ["salt", "col"], "left")
        .groupBy(*keep)
        .agg(F.min(F.coalesce("c", F.lit(0))).alias("cm_est"))
    )


# ------------------------------------------------- log2 quantile sketch

LOG2_MAX_BUCKETS = 65  # bucket -1 (value 0) + buckets 0..63
LOG2_REFINED_MAX_BUCKETS = 130  # -1, 0, and two half-buckets per 1..63


def log2_histogram(df: DataFrame, value_col: str, refined: bool = False) -> DataFrame:
    """(bucket, c): power-of-2 histogram of a NON-NEGATIVE integer
    column — the bounded-state DISTRIBUTION sketch completing the
    mergeable family (distinct = HLL max-merge, frequency = CM
    sum-merge, distribution = log2-histogram sum-merge). ONE keyed count
    whose output is bounded by ``LOG2_MAX_BUCKETS`` rows at any input
    size; map-side combine absorbs everything before the shuffle.

    bucket = -1 for value 0, else floor(log2(v)) computed integer-exact
    as ``length(bin(v)) - 1`` — both engines' ``bin()`` drops leading
    zeros, the same cross-engine device as the HLL rho. Bucket b >= 0
    covers [2^b, 2^(b+1)), so any quantile is bracketed within a 2x
    multiplicative band.

    ``refined=True`` splits every bucket b >= 1 at its MIDPOINT using
    the value's second-most-significant bit, encoded order-preservingly
    as ``bucket = 2*b + bit`` (-1 and 0 keep their exact single-value
    cells): state doubles to <= ``LOG2_REFINED_MAX_BUCKETS`` rows —
    still calendar-class, still a pure function of v, so sum-merge
    semantics are unchanged — and every quantile band HALVES to a 1.5x
    multiplicative bracket. (One more bit per round is the general
    trade; one bit is the committed configuration.)"""
    if refined:
        b = (
            F.when(F.col(value_col) <= 0, F.lit(-1))
            .when(F.col(value_col) == 1, F.lit(0))
            .otherwise(
                F.expr(
                    f"2 * (length(bin({value_col})) - 1)"
                    f" + ({value_col} div shiftleft(1L, length(bin({value_col})) - 2)) % 2"
                )
            )
        )
    else:
        b = F.when(F.col(value_col) <= 0, F.lit(-1)).otherwise(
            F.length(F.expr(f"bin({value_col})")) - 1
        )
    return df.select(b.cast("int").alias("bucket")).groupBy("bucket").agg(
        F.count("*").alias("c")
    )


def merge_histograms(hists: DataFrame) -> DataFrame:
    """Sum-merge of any union of log2-histogram relations —
    merge(h(A), h(B)) == h(A union B): bucket counts are plain sums
    (the additive twin of ``merge_counters``)."""
    return hists.groupBy("bucket").agg(F.sum("c").alias("c"))


def histogram_quantile_bounds(
    hist: DataFrame, percents: list[int], refined: bool = False
) -> DataFrame:
    """(p, n, k, bucket, lo, hi) per requested percent: the bracket the
    sketch guarantees for the value at 1-based rank
    ``k = (p*(n-1)) div 100 + 1`` (DuckDB ``quantile_disc`` rank
    convention, integer arithmetic only). Fully relational over the
    bounded histogram: cumulative counts via a tiny triangular
    self-join (both sides broadcast-sized), target bucket = min bucket
    whose cumulative count reaches k, bounds re-derived arithmetically
    — no window over a single partition, no collect.

    Plain buckets decode to the 2x band [2^b, 2^(b+1) - 1] (bucket -1
    -> [0, 0]); ``refined=True`` decodes the half-bucket encoding
    (bucket = 2*b + bit) to the 1.5x band [2^b + bit*2^(b-1),
    lo + 2^(b-1) - 1], with -1 -> [0, 0] and 0 -> [1, 1] exact."""
    cum = (
        hist.alias("a")
        .join(F.broadcast(hist.alias("b")), F.col("b.bucket") <= F.col("a.bucket"))
        .groupBy(F.col("a.bucket").alias("bucket"))
        .agg(F.sum("b.c").alias("cum"))
    )
    tot = hist.agg(F.sum("c").alias("n"))
    probes = tot.select(
        F.explode(F.array(*[F.lit(int(p)) for p in percents])).alias("p"), "n"
    ).select("p", "n", F.expr("p * (n - 1) div 100 + 1").alias("k"))
    if refined:
        lo_expr = (
            "CASE WHEN bucket <= -1 THEN 0 WHEN bucket = 0 THEN 1"
            " ELSE shiftleft(1L, bucket div 2)"
            " + (bucket % 2) * shiftleft(1L, bucket div 2 - 1) END"
        )
        hi_expr = (
            "CASE WHEN bucket <= -1 THEN 0 WHEN bucket = 0 THEN 1"
            " ELSE shiftleft(1L, bucket div 2)"
            " + (bucket % 2) * shiftleft(1L, bucket div 2 - 1)"
            " + shiftleft(1L, bucket div 2 - 1) - 1 END"
        )
    else:
        lo_expr = "CASE WHEN bucket = -1 THEN 0 ELSE shiftleft(1L, bucket) END"
        hi_expr = "CASE WHEN bucket = -1 THEN 0 ELSE shiftleft(1L, bucket + 1) - 1 END"
    return (
        probes.join(F.broadcast(cum), F.col("cum") >= F.col("k"))
        .groupBy("p", "n", "k")
        .agg(F.min("bucket").alias("bucket"))
        .select("p", "n", "k", "bucket", F.expr(lo_expr).alias("lo"), F.expr(hi_expr).alias("hi"))
    )


def cm_inner_product(ca: DataFrame, cb: DataFrame) -> DataFrame:
    """1-row (cm_est): the Count-Min inner-product estimate of the
    equi-join size |A join B| from the two sides' counter relations —
    ``min_salt sum_col cA[salt, col] * cB[salt, col]`` (Alon-Matias-
    Szegedy / Cormode-Muthukrishnan). NEVER an underestimate: each
    row's sum counts every true key pairing plus non-negative collision
    cross-terms, so ``cm_est >= |A join B|`` holds per salt and for the
    min (property-tested).

    The join-planning use: both counter relations are <= CM_D * CM_W
    rows and sum-mergeable per side, so a planner can keep a counter
    sketch per table/partition-column and price a candidate join's
    fan-out with a broadcast-sized product — no scan of either table.
    Missing cells are zero: the per-salt sums ride a LEFT join from the
    CM_D salt spine, so a salt with no overlapping cells correctly
    estimates 0 instead of vanishing from the min."""
    sp = ca.sparkSession
    salts = sp.createDataFrame([(i,) for i in range(CM_D)], "salt int")
    prod = (
        ca.join(cb.withColumnRenamed("c", "c2"), ["salt", "col"])
        .groupBy("salt")
        .agg(F.sum(F.col("c") * F.col("c2")).alias("ip"))
    )
    per_salt = salts.join(prod, "salt", "left").select(
        "salt", F.coalesce(F.col("ip"), F.lit(0)).cast("long").alias("ip")
    )
    return per_salt.agg(F.min("ip").alias("cm_est"))
