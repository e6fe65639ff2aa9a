"""Integer-exact exponentially time-decayed aggregates — SURVEY.md §2.13.

The freshness-weighted engagement/score rollup a 100 TB feature pipeline
runs over event history: ``score(user) = sum_e value_e * 2^(-age_days_e)``
— base-2 decay with a one-day half-life, truncated at ``k_cap`` days
(contributions below ``2^-k_cap`` of a fresh event are dropped; with the
sums scaled by ``2^k_cap`` this is exactly the integer-underflow point,
so the truncation is the arithmetic, not a tuning knob).

Everything is BIGINT: values enter as cents, weights are
``2^(k_cap - age)`` for ``age <= k_cap``, and the reported fixed-point
score is ``decayed_scaled * 1000 div 2^k_cap`` (milli-units). Integer
sums are associative, so results are partition-order-free and
hash-identical to the DuckDB oracle (q172).

Decomposability — the property the streaming twin
(``streaming.jobs.stream_decayed_scores``) builds on: the decayed sum is
NOT directly mergeable across shards (each shard would need the global
max day), but the ``(user_id, day) -> sum(value_cents)`` day-partial
relation IS sum-mergeable, and the decay projection over it is one
broadcast-scalar pass. State stays bounded: only partials with
``day > dmax - k_cap`` can ever contribute again, so a maintainer prunes
to ``users x (k_cap + 1)`` rows regardless of corpus size.

Scale shape: one keyed agg to day partials (map-side combine collapses
each task's events to its users x days), a 1-row max-day broadcast, and
one keyed agg to users. No windows, no sorts, no corpus-cardinality
single partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

US_PER_DAY = 86_400_000_000
DECAY_K_CAP = 20


def day_partials(events: DataFrame, *, user_col: str = "user_id") -> DataFrame:
    """(user_id, day, v): per-user-per-epoch-day value_cents sums — the
    sum-mergeable partial state shared by the batch query (q172) and the
    streaming twin. Expects an ``events``-shaped input with ``ts_us``
    (epoch micros BIGINT) and ``value`` (2-decimal DOUBLE) columns."""
    return (
        events.select(
            F.col(user_col).alias("user_id"),
            F.expr(f"ts_us div {US_PER_DAY}").alias("day"),
            F.expr("cast(round(value * 100.0, 0) as bigint)").alias("vc"),
        )
        .groupBy("user_id", "day")
        .agg(F.sum("vc").alias("v"))
    )


def decayed_scores(partials: DataFrame, k_cap: int = DECAY_K_CAP) -> DataFrame:
    """(user_id, n_days_recent, decayed_scaled, decayed_milli) from a
    ``day_partials``-shaped relation: weight each day's sum by
    ``2^(k_cap - (dmax - day))``, dropping days older than ``k_cap``.

    ``decayed_scaled`` is the exact ``2^k_cap``-scaled decayed sum;
    ``decayed_milli`` its milli-unit fixed-point projection. BOTH are
    computed from a decimal(38,0) sum (matching the DuckDB twin's
    HUGEINT), and the BIGINT projection of ``decayed_scaled`` FAILS
    LOUDLY past 2^63 (decimal->long overflow nulls in non-ANSI mode;
    the coalesce arm raises) instead of silently wrapping — the bound
    is per-user day sums below ~2^42 cents (~$44B/user/day) at
    k_cap=20; the decay series converges, so n_days does not multiply
    it.

    The global max day is a 1-row broadcast scalar (like q168's ``nn``),
    never a window over the corpus."""
    dmax = partials.agg(F.max("day").alias("dmax"))
    return (
        partials.crossJoin(F.broadcast(dmax))
        .where(F.expr(f"day > dmax - {k_cap + 1}"))
        .select(
            "user_id",
            F.expr(f"v * shiftleft(cast(1 as bigint), {k_cap} - cast(dmax - day as int))").alias(
                "w"
            ),
        )
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_days_recent"),
            # sum in decimal(38,0), never BIGINT: a long sum would wrap
            # SILENTLY past 2^63 while the DuckDB twin's HUGEINT stays
            # exact and hash-mismatches only later
            F.sum(F.col("w").cast("decimal(38,0)")).alias("s"),
        )
        .select(
            "user_id",
            "n_days_recent",
            # loud overflow: out-of-range decimal->long is NULL (non-ANSI),
            # and s is never NULL for a grouped row, so the raise_error arm
            # fires exactly on overflow
            F.expr(
                "coalesce(cast(s as bigint), cast(raise_error("
                "'decayed_scaled overflows BIGINT — per-user scaled decay sum"
                " exceeded 2^63') as bigint))"
            ).alias("decayed_scaled"),
            F.expr(
                f"cast(s * 1000 div shiftleft(cast(1 as bigint), {k_cap})"
                " as bigint)"
            ).alias("decayed_milli"),
        )
    )


def merge_day_partials(partials: DataFrame) -> DataFrame:
    """Sum-merge any union of ``day_partials`` relations —
    merge(partials(A), partials(B)) == partials(A union B), the
    decomposability the incremental maintainer relies on."""
    return partials.groupBy("user_id", "day").agg(F.sum("v").alias("v"))


def prune_day_partials(partials: DataFrame, k_cap: int = DECAY_K_CAP) -> DataFrame:
    """Drop partials that can never contribute again (older than
    ``k_cap`` days before the relation's max day) — the bounded-state
    guarantee for long-running maintainers. Pruning commutes with
    merge-then-score because dmax only moves forward."""
    dmax = partials.agg(F.max("day").alias("dmax"))
    return (
        partials.crossJoin(F.broadcast(dmax))
        .where(F.expr(f"day > dmax - {k_cap + 1}"))
        .select("user_id", "day", "v")
    )
