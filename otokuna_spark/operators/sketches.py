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
