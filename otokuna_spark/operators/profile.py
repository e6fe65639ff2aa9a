"""Table profiling — the data-quality primitive a training-data lake runs
before anything else touches a new drop (null explosions, cardinality
drift, range drift).

One scan total: all per-column statistics are computed in a SINGLE global
aggregation, then unpivoted driver-side-free with ``stack()`` — profiling
k columns of a 100 TB table costs one pass, not k passes. Exact distinct
counts shuffle one hash set per column; ``approx=True`` swaps in
HyperLogLog++ (``approx_count_distinct``, rsd default 5%) whose state is
constant-size per column — the right default at the full design point,
while exact mode is the oracle-matchable twin (q79_table_profile).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    double_scale: float = 100.0,
    approx: bool = False,
    approx_rsd: float = 0.05,
) -> DataFrame:
    """Profile ``cols`` (default: all) in one aggregation pass.

    Returns one row per column: (col_name, n, n_null, n_distinct, min_v,
    max_v). min/max are STRINGS so heterogeneous column types unpivot into
    one relation: BIGINT/STRING cast directly, DOUBLE floor-scaled by
    ``double_scale`` (portable across engines — raw double formatting is
    not), TIMESTAMP truncated to ISO date. Distinct counts for timestamps
    count distinct DATES (days), matching the drift signal a lake monitor
    wants.
    """
    cols = cols or df.columns
    dtypes = dict(df.dtypes)
    aggs: list[Column] = [F.count(F.lit(1)).alias("n")]
    nd = (
        (lambda c: F.approx_count_distinct(c, approx_rsd))
        if approx
        else (lambda c: F.count_distinct(c))
    )
    for i, c in enumerate(cols):
        t = dtypes[c]
        aggs.append(F.count(c).alias(f"nn_{i}"))
        if t == "double" or t == "float":
            aggs.append(nd(F.col(c)).alias(f"nd_{i}"))
            aggs.append(
                F.floor(F.min(c) * double_scale).cast("long").cast("string").alias(f"mn_{i}")
            )
            aggs.append(
                F.floor(F.max(c) * double_scale).cast("long").cast("string").alias(f"mx_{i}")
            )
        elif t.startswith("timestamp") or t == "date":
            aggs.append(nd(F.col(c).cast("date")).alias(f"nd_{i}"))
            aggs.append(F.min(c).cast("date").cast("string").alias(f"mn_{i}"))
            aggs.append(F.max(c).cast("date").cast("string").alias(f"mx_{i}"))
        else:
            aggs.append(nd(F.col(c)).alias(f"nd_{i}"))
            aggs.append(F.min(c).cast("string").alias(f"mn_{i}"))
            aggs.append(F.max(c).cast("string").alias(f"mx_{i}"))
    a = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', n - nn_{i}, nd_{i}, mn_{i}, mx_{i}" for i, c in enumerate(cols)
    )
    return (
        a.selectExpr(
            f"stack({len(cols)}, {stack_args}) AS (col_name, n_null, n_distinct, min_v, max_v)",
            "n",
        )
        .select(
            "col_name",
            "n",
            F.col("n_null").cast("long").alias("n_null"),
            F.col("n_distinct").cast("long").alias("n_distinct"),
            "min_v",
            "max_v",
        )
        .orderBy("col_name")
    )


def snapshot_drift(
    df: DataFrame,
    time_col: str,
    value_col: str,
    group_col: str | None = None,
    n_bins: int = 16,
) -> DataFrame:
    """Distribution-drift monitor between two time halves of a table — the
    "did yesterday's drop change the data distribution" check a corpus
    pipeline runs on every ingest (PSI-style, Population Stability Index).

    ``df`` is split at the midpoint of ``time_col`` (BIGINT event time)
    into an EARLIER (a) and LATER (b) snapshot; ``value_col`` (double) is
    histogrammed into ``n_bins`` equal-width bins over the GLOBAL min/max,
    and each (group, bin) row reports both sides' counts, proportions in
    ppm, and two integer-exact drift terms:

    - ``l1_ppm`` = |pa - pb| in ppm (summing over bins gives total
      variation distance x2 x 1e6);
    - ``chi2_ppm`` = floor((pa_ppm - pb_ppm)^2 / (pa_ppm + pb_ppm)) — the
      symmetric chi-square (Neyman) drift term, large only where a bin's
      mass genuinely moved. PSI's classic (pa-pb)ln(pa/pb) term needs
      logs, whose last-ulp behavior is engine-specific; chi-square ranks
      drifted bins the same way and stays in exact BIGINT arithmetic
      (documented divergence from the textbook PSI formula).

    Scale shape: one scalar aggregation for (min/max time, min/max value)
    broadcast-attached to every row (no driver round-trip in the plan),
    then ONE binned groupBy — two scans of the fact table total,
    independent of n_bins and group cardinality. Empty bins on one side
    get count 0 via the full (group, bin) outer frame, so a vanished bin
    is a loud chi2 spike, not a missing row.
    """
    bounds = df.agg(
        F.min(F.col(time_col)).alias("__tmin"),
        F.max(F.col(time_col)).alias("__tmax"),
        F.min(F.col(value_col)).alias("__vmin"),
        F.max(F.col(value_col)).alias("__vmax"),
    )
    # integer midpoint — the split predicate stays in exact BIGINT math
    mid = F.expr("(__tmin + __tmax) div 2")
    # bin by equal width; the top edge folds into the last bin. The bin
    # expression is per-row IEEE double arithmetic with an identical
    # expression tree on both engines -> deterministic bin ids
    width_expr = (F.col("__vmax") - F.col("__vmin")) / F.lit(float(n_bins))
    raw_bin = F.floor((F.col(value_col) - F.col("__vmin")) / width_expr)
    binned = (
        df.crossJoin(F.broadcast(bounds))
        .select(
            *([F.col(group_col).alias("__grp")] if group_col else [F.lit("all").alias("__grp")]),
            F.when(F.col(time_col) <= mid, F.lit(1)).otherwise(F.lit(0)).alias("__a"),
            F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), raw_bin)).cast("int").alias("__bin"),
        )
    )
    counts = binned.groupBy("__grp", "__bin").agg(
        F.sum("__a").alias("count_a"),
        F.sum(F.lit(1) - F.col("__a")).alias("count_b"),
    )
    # dense (group, bin) frame so empty-on-one-side bins still appear
    frame = (
        counts.select("__grp").distinct()
        .crossJoin(F.broadcast(counts.sparkSession.range(n_bins).select(F.col("id").cast("int").alias("__bin"))))
    )
    dense = (
        frame.join(counts, on=["__grp", "__bin"], how="left")
        .select(
            "__grp",
            "__bin",
            F.coalesce("count_a", F.lit(0)).alias("count_a"),
            F.coalesce("count_b", F.lit(0)).alias("count_b"),
        )
    )
    return drift_terms(dense, "__grp", "__bin").select(
        F.col("__grp").alias("group_key"),
        F.col("__bin").alias("bin"),
        "count_a",
        "count_b",
        "pa_ppm",
        "pb_ppm",
        "l1_ppm",
        "chi2_ppm",
    )


def drift_terms(dense: DataFrame, group_col: str, bin_col: str) -> DataFrame:
    """Attach the integer-exact drift statistics to a dense
    (group, bin, count_a, count_b) histogram pair: per-group totals,
    proportions in ppm, L1 distance and the symmetric chi-square term
    (see ``snapshot_drift`` for why chi-square stands in for PSI's log
    term). Shared by the batch snapshot comparison and the streaming
    reference-vs-micro-batch monitor."""
    from pyspark.sql import Window as W

    wg = W.partitionBy(group_col)
    # a group with NO rows on one side (na/nb = 0) reads as proportion 0,
    # not NULL — otherwise its chi-square term would silently collapse to
    # 0 and brand-new groups would never register as drift
    return (
        dense.withColumn("na", F.sum("count_a").over(wg))
        .withColumn("nb", F.sum("count_b").over(wg))
        .withColumn("pa_ppm", F.expr("CASE WHEN na > 0 THEN count_a * 1000000 div na ELSE 0 END"))
        .withColumn("pb_ppm", F.expr("CASE WHEN nb > 0 THEN count_b * 1000000 div nb ELSE 0 END"))
        .withColumn("l1_ppm", F.abs(F.col("pa_ppm") - F.col("pb_ppm")))
        .withColumn(
            "chi2_ppm",
            F.when(
                F.col("pa_ppm") + F.col("pb_ppm") > 0,
                F.expr("(pa_ppm - pb_ppm) * (pa_ppm - pb_ppm) div (pa_ppm + pb_ppm)"),
            ).otherwise(F.lit(0)),
        )
        .drop("na", "nb")
    )


def validate_contract(
    df: DataFrame, rules: list[tuple[str, Column]]
) -> DataFrame:
    """Data-contract validation (the expectation-suite gate a pipeline
    runs before accepting a batch): each rule is (name, VIOLATION
    predicate over one row); the report is one row per rule with the
    violation count and exact-ppm rate. Single pass: every rule becomes
    one conditional sum inside ONE aggregate over ONE scan (no
    per-rule jobs), then the wide row melts to per-rule rows via stack
    — map-only Expand, the q136 device. NULL predicate results count as
    violations (an unevaluable expectation is a failed one), made
    explicit with coalesce so three-valued logic cannot silently pass a
    row. Returns (rule, n_checked, n_violations, violation_ppm) ordered
    by rule name.

    Rule names are interpolated into the stack() melt expression and
    into column aliases, so they are restricted to identifier characters
    — anything else would be a parse error at best and an injection
    vector at worst. The rules list must be non-empty (stack(0) is not
    valid SQL)."""
    import re

    if not rules:
        raise ValueError("validate_contract needs at least one rule")
    for name, _ in rules:
        if not re.fullmatch(r"[A-Za-z0-9_]+", name):
            raise ValueError(
                f"rule name {name!r} must match [A-Za-z0-9_]+ — it is "
                "interpolated into a SQL stack() expression"
            )
    # duplicate names would alias two __v_<name> columns identically and
    # make the stack() reference ambiguous (AnalysisException at best,
    # arbitrary binding at worst) — reject up front
    if len({name for name, _ in rules}) != len(rules):
        dupes = sorted({n for n, _ in rules if sum(1 for m, _ in rules if m == n) > 1})
        raise ValueError(f"duplicate rule names: {dupes}")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, pred in rules:
        aggs.append(
            F.sum(F.coalesce(pred, F.lit(True)).cast("long")).alias(f"__v_{name}")
        )
    wide = df.agg(*aggs)
    stack = ", ".join(f"'{name}', __v_{name}" for name, _ in rules)
    return (
        wide.select(
            F.col("__n"),
            F.expr(f"stack({len(rules)}, {stack}) as (rule, n_violations)"),
        )
        .select(
            "rule",
            F.col("__n").cast("long").alias("n_checked"),
            F.coalesce(F.col("n_violations"), F.lit(0)).cast("long").alias("n_violations"),
            F.expr(
                "cast(CASE WHEN __n > 0 THEN coalesce(n_violations, 0) * 1000000 div __n "
                "ELSE 0 END as bigint)"
            ).alias("violation_ppm"),
        )
        .orderBy("rule")
    )
