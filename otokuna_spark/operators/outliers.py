"""Q1 — exact-percentile outlier removal (analysis.py:11-28).

Reference semantics, reproduced exactly (SURVEY.md §2.4 Q1): for each
column, compute the linearly-interpolated 0.99 quantile and flag rows whose
value EQUALS that quantile (equality, not >=; for continuous columns the
interpolated quantile rarely equals a data value, so in practice this
prunes discrete columns). OR the flags; keep unflagged rows.

Spark plan shape: one single-pass ``percentile`` aggregation (exact, same
linear interpolation as pandas/DuckDB ``quantile_cont``) producing a 1-row
DataFrame, broadcast cross-joined into the fact table, then one filter.
Two jobs, no shuffle of the fact table — at 100 TB the fact is scanned
twice and never shuffled. (``percentile_approx`` would make it one
approximate pass; the reference semantics require exact.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


_INF = float("inf")
_NAN = float("nan")


def remove_outliers(df: DataFrame, columns: list[str], q: float = 0.99) -> DataFrame:
    # pandas .quantile skips NaN; Spark percentile sorts NaN above every
    # double — nanvl to NULL (which percentile ignores) mirrors skipna.
    # When the interpolation window touches ±inf, numpy's lerp (which
    # pandas delegates to) does NOT return the percentile's inf: with
    # a = sorted[lo] and b = sorted[hi] it computes a + (b-a)*t for
    # t < 0.5 and b - (b-a)*(1-t) otherwise, so inf-inf / inf*0 propagate
    # to NaN in every branch except (a finite, b = +inf, 0 < t < 0.5) -> +inf
    # and its mirror (a = -inf, b finite, t >= 0.5) -> -inf. The CASE below
    # reproduces exactly those observable outcomes from counts, keeping the
    # whole computation a single aggregation pass (probed empirically
    # against pandas 2.x / numpy 1.26 in tests).
    aggs = []
    for c in columns:
        col = F.col(c).cast("double")
        not_nan = F.nanvl(col, F.lit(None).cast("double"))
        aggs += [
            F.percentile(not_nan, F.lit(q)).alias(f"__p_{c}"),
            F.count(not_nan).alias(f"__n_{c}"),
            F.count(F.when(col == _INF, 1)).alias(f"__pi_{c}"),
            F.count(F.when(col == -_INF, 1)).alias(f"__ni_{c}"),
        ]
    stats = df.agg(*aggs)
    qcols = []
    for c in columns:
        p = F.col(f"__p_{c}")
        n = F.col(f"__n_{c}")
        n_pos, n_neg = F.col(f"__pi_{c}"), F.col(f"__ni_{c}")
        virt = F.lit(q) * (n - 1).cast("double")
        lo = F.floor(virt)
        t = virt - lo
        fin_end = n - n_pos  # 0-based sorted index of the first +inf
        adj = (
            F.when(F.isnan(p), p)
            .when(
                p == _INF,
                F.when((t > 0) & (t < 0.5) & (lo < fin_end), F.lit(_INF)).otherwise(F.lit(_NAN)),
            )
            .when(
                p == -_INF,
                F.when((t >= 0.5) & (lo + 1 >= n_neg) & (lo + 1 < fin_end), F.lit(-_INF)).otherwise(
                    F.lit(_NAN)
                ),
            )
            .otherwise(p)
        )
        qcols.append(adj.alias(f"__q_{c}"))
    quantiles = stats.select(*qcols)
    joined = df.crossJoin(F.broadcast(quantiles))
    flag = None
    for c in columns:
        qc = F.col(f"__q_{c}")
        v = F.col(c).cast("double")
        # pandas parity: NaN == anything is False (Spark says NaN = NaN is
        # TRUE), and a NULL value/quantile must mean "not flagged" — never a
        # NULL that makes filter(~flag) silently drop the row
        f = F.when(F.isnan(v) | F.isnan(qc), F.lit(False)).otherwise(
            F.coalesce(v == qc, F.lit(False))
        )
        flag = f if flag is None else (flag | f)
    return joined.filter(~flag).drop(*[f"__q_{c}" for c in columns])


def robust_flags(
    df: DataFrame,
    group: str,
    col: str,
    z: float = 3.0,
    c: float = 1.4826,
    flag_col: str = "is_outlier",
) -> DataFrame:
    """Robust (median/MAD) outlier flags per group: a row is an outlier
    when ``|x - median| > z * c * MAD``, MAD = median absolute deviation,
    ``c = 1.4826`` the normal-consistency constant. Unlike mean/stddev
    z-scores, both location and scale estimates have a 50% breakdown
    point — the outliers themselves cannot mask the threshold, which is
    what makes this the right gate for corpus quality metrics.

    Exact and deterministic: two exact-``percentile`` aggregation passes
    (same interpolated semantics as DuckDB ``quantile_cont`` — parity
    proven by the q06/q09 family) with the tiny per-group stats joined
    back; the threshold comparison is per-row IEEE arithmetic, identical
    across engines for an identical expression tree. Adds ``__med``,
    ``__absdev``, ``__mad`` and ``flag_col`` (int 0/1).

    Shape: agg + join + agg + join, all keyed on ``group`` — the stats
    relations have one row per group and broadcast.
    """
    med = df.groupBy(group).agg(F.percentile(F.col(col), F.lit(0.5)).alias("__med"))
    dev = df.join(F.broadcast(med), group).withColumn(
        "__absdev", F.abs(F.col(col) - F.col("__med"))
    )
    mad = dev.groupBy(group).agg(F.percentile(F.col("__absdev"), F.lit(0.5)).alias("__mad"))
    return dev.join(F.broadcast(mad), group).withColumn(
        flag_col,
        (F.col("__absdev") > F.lit(z) * F.lit(c) * F.col("__mad")).cast("int"),
    )


def scalable_quantile_disc(df: DataFrame, col: str, p: float, n_buckets: int = 65536):
    """Discrete quantile of an INTEGER column by histogram refinement —
    the shape that survives when the column is too large for a single
    exact-``percentile`` aggregation state: (1) one agg for min/max/
    count, (2) one bucket-histogram pass, (3) an exact top-(rank-offset)
    over the ONE bucket holding the target rank (bounded by count/
    n_buckets for non-degenerate distributions). Three scans, each with
    map-side partial aggregation; nothing collects beyond scalars and
    the bucket histogram.

    Returns the Python int value at 1-based rank ``floor((n-1)*p) + 1``
    — DuckDB ``quantile_disc`` semantics. A driver-side function (the
    result is a scalar, like ``DataFrame.count``), deterministic.
    """
    c = F.col(col)
    lo, hi, n = df.agg(F.min(c), F.max(c), F.count(c)).first()
    if n == 0:
        raise ValueError("quantile of an empty column")
    rank = int((n - 1) * p) + 1  # 1-based target rank
    return scalable_kth_smallest(df, col, rank, lo=lo, hi=hi, n_buckets=n_buckets)


def scalable_kth_smallest(
    df: DataFrame, col: str, rank: int, lo=None, hi=None, n_buckets: int = 65536
):
    """Exact 1-based k-th smallest of an INTEGER column by the same
    histogram refinement as ``scalable_quantile_disc`` (which delegates
    here) — takes the RANK directly, so callers that derive it with
    integer arithmetic (e.g. ``(p*(n-1)) div 100 + 1`` for ppm/percent
    quantiles) stay float-free end to end. Raises a designed ValueError
    for out-of-range ranks (rank < 1, or rank > row count — validated
    against the histogram's own total, no extra scan)."""
    if rank < 1:
        raise ValueError(f"rank must be >= 1, got {rank}")
    c = F.col(col)
    if lo is None or hi is None:
        lo, hi = df.agg(F.min(c), F.max(c)).first()
    if lo is None:
        raise ValueError("k-th smallest of an empty column")
    width = max(1, (hi - lo) // n_buckets + 1)
    hist = (
        # integer div (not a double round-trip): exact for the full long range
        df.select(F.expr(f"({col} - {lo}L) div {width}L").alias("b"))
        .groupBy("b")
        .agg(F.count("*").alias("cnt"))
        .orderBy("b")
        .collect()  # bounded: <= n_buckets rows
    )
    total = sum(row["cnt"] for row in hist)
    if rank > total:
        raise ValueError(f"rank {rank} out of range for {total} rows")
    cum = 0
    for row in hist:
        if cum + row["cnt"] >= rank:
            bucket, offset = row["b"], rank - cum
            break
        cum += row["cnt"]
    in_bucket = df.select(c.alias("v")).where(
        (F.col("v") >= lo + bucket * width) & (F.col("v") < lo + (bucket + 1) * width)
    )
    # exact k-th smallest inside the bucket: TakeOrdered(offset) then max
    top = in_bucket.orderBy("v").limit(offset).agg(F.max("v")).first()[0]
    return int(top)
