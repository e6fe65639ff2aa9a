"""Sampling / splits (SURVEY.md §2.9 R1-R2).

The reference shuffles indices with Python's ``random.seed`` and slices
(analysis.py:115-149) — order-dependent and not reproducible distributed.
Documented divergence (SURVEY.md §4): here splits are a deterministic pure
function of the key, so they are stable under repartitioning, re-runs, and
engine changes (the DuckDB oracle computes the identical assignment).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def split_bucket(key: Column, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets) from a numeric or string key."""
    k = F.abs(F.crc32(key.cast("string")))
    return F.pmod(k, F.lit(n_buckets)).cast("int")


def train_val_test_split(
    df: DataFrame,
    key: str,
    val_fraction: float = 0.1875,
    test_fraction: float = 0.25,
) -> DataFrame:
    """R1 — adds a ``split`` column ('train'/'val'/'test'); same default
    ratios as ml/train.py:34-36. Key-hash assignment: disjoint, exhaustive,
    independent of row order and parallelism."""
    b = split_bucket(F.col(key), 10000)
    test_hi = int(test_fraction * 10000)
    val_hi = test_hi + int(val_fraction * 10000)
    return df.withColumn(
        "split",
        F.when(b < test_hi, F.lit("test")).when(b < val_hi, F.lit("val")).otherwise(F.lit("train")),
    )


def sample_fraction(df: DataFrame, fraction: float, seed: int = 123) -> DataFrame:
    """R2 — seeded Bernoulli sample (ml/check_onnx.py's df.sample)."""
    return df.sample(fraction=fraction, seed=seed)


def hashed_importance_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    target_pred: Column,
    n_buckets: int = 256,
    reliable: bool = False,
) -> DataFrame:
    """DSIR-style hashed importance weights (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): score every
    document by how much its hashed-unigram distribution looks like a
    TARGET subset (``target_pred`` rows) vs the RAW corpus, then select
    high scorers. The 100 TB data-selection shape: the feature space is a
    FIXED n_buckets-dim histogram, so the model state is one broadcastable
    n_buckets-row table no matter the corpus size.

    Determinism/parity divergence from the paper, both documented: the
    hash is the md5-hex prefix (oracle-portable across engines, same trick
    as the MinHash md5 family) rather than a fast 32-bit hash, and the
    per-bucket weight is the SMOOTHED PROBABILITY RATIO in integer ppm
    rather than its logarithm — floor((t_b+1)(R+B) * 1e6 / ((r_b+1)(T+B)))
    — so document scores are exact BIGINT sums (log-space needs floats,
    whose sum order is engine-dependent). Ratio weights order buckets the
    same way log weights do; the per-doc SUM is a linear-space variant
    (documented, not the paper's exact estimator).

    Returns (id, n_tokens, score_sum, mean_score_ppm) — one row per doc
    with >= 1 token; mean_score_ppm = score_sum div n_tokens is the
    length-normalized importance score.

    Scale shape (r15): the token explode + per-token md5 runs ONCE, into
    a staged per-(doc, bucket) count relation — bounded at |docs| *
    n_buckets rows regardless of corpus length (Zipf makes it far
    smaller), i.e. orders of magnitude under the token-occurrence
    volume. The bucket histogram and the per-doc score join-back both
    re-aggregate that compact relation instead of re-scanning the
    corpus (the pre-r15 shape ran the tokenize+md5 pass twice; the
    TOKEN-level relation is genuinely too big to persist, but the
    doc-bucket pre-aggregate is not). ``reliable=True`` routes the
    staging through a fault-tolerant checkpoint (persistence.stage).
    The weight table joins back BROADCAST (n_buckets rows); totals ride
    along as literal-free 1-row broadcasts. Overflow
    headroom: (t_b+1)(R+B)*1e6 must fit BIGINT — fine through ~10^12-token
    corpora per partition-of-the-problem; shard the corpus or drop the ppm
    scale factor beyond that. score_sum = sum_b(count_b * w_ppm_b) keeps
    the same bound as the per-token sum it equals exactly.
    """
    from . import persistence
    from ..functions import text

    b = F.lit(n_buckets)
    occ = (
        docs.select(
            F.col(id_col).alias("__id"),
            target_pred.alias("__tgt"),
            F.explode(text.tokens(F.col(text_col))).alias("__tok"),
        )
        .withColumn(
            "__bucket",
            F.pmod(F.conv(F.substring(F.md5(F.col("__tok")), 1, 4), 16, 10).cast("long"), b),
        )
        .drop("__tok")
    )
    # __tgt is constant per doc, so it rides the key for free
    compact = persistence.stage(
        occ.groupBy("__id", "__tgt", "__bucket").agg(F.count("*").alias("__c")),
        reliable,
    )
    hist = compact.groupBy("__bucket").agg(
        F.sum("__c").alias("__r"),
        F.sum(F.when(F.col("__tgt"), F.col("__c")).otherwise(F.lit(0))).alias("__t"),
    )
    # totals get distinct names (__rtot/__ttot): Spark SQL resolution is
    # case-insensitive, so __R/__T would collide with __r/__t
    totals = hist.agg(
        F.sum("__r").alias("__rtot"), F.sum("__t").alias("__ttot")
    )
    weights = (
        hist.crossJoin(F.broadcast(totals))
        .select(
            "__bucket",
            # DECIMAL(38,0): the three-factor numerator wraps BIGINT
            # once bucket_count x corpus_tokens x 1e6 passes ~9e18 —
            # a few million tokens against a large corpus. Oracle twin
            # widens identically via HUGEINT.
            # `div` not floor(/): decimal divide rounds before floor.
            F.expr(
                f"cast((cast(__t + 1 as decimal(38,0)) * (__rtot + {n_buckets}) * 1000000)"
                f" div (cast(__r + 1 as decimal(38,0)) * (__ttot + {n_buckets})) as bigint)"
            ).alias("__w_ppm"),
        )
    )
    return (
        compact.join(F.broadcast(weights), on="__bucket")
        .groupBy("__id")
        .agg(
            F.sum("__c").alias("n_tokens"),
            F.sum(F.col("__c") * F.col("__w_ppm")).alias("score_sum"),
        )
        .select(
            F.col("__id").alias(id_col),
            "n_tokens",
            "score_sum",
            F.expr("score_sum div n_tokens").alias("mean_score_ppm"),
        )
    )


def grouped_sample_exact_k(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int,
) -> DataFrame:
    """Deterministic EXACT-k sample per group — the reservoir-sampling
    contract (k rows per group, every row equally likely under a random
    hash) without reservoir state: rank rows inside each group by the md5
    of their key (a uniform, engine-portable pseudo-random order, same
    device as the stratified/md5-threshold samplers) and keep rank <= k.
    Unlike fraction-based stratified sampling, group output size is
    EXACTLY min(k, |group|) — what eval-set construction and per-domain
    spot-check queues need.

    One window shuffle on group_col; adds ``sample_rank`` (1-based).
    Hot groups at 100 TB: the window sorts each group's partition — for
    pathological group sizes pre-filter with an md5-threshold pass (keep
    ~4k/|group| fraction) before the exact ranking; composition preserves
    uniformity.
    """
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .where(F.col("sample_rank") <= k)
    )


def negative_pairs(df: DataFrame, id_col: str, k: int, seed: int = 0) -> DataFrame:
    """Deterministic negative sampling over a DENSE 0..N-1 id space:
    ``k`` pseudo-random partners per row — (id, slot, neg_id) — the
    contrastive-training primitive (in-batch negatives biased toward
    co-located rows; this samples corpus-wide).

    Partner for slot r is ``(id + stride_r) mod N`` with
    ``stride_r = (r * 2654435761 + seed) mod N`` (Knuth multiplicative
    constant), bumped to 1 when the stride collapses to 0 so a row never
    partners itself. Map-only — the strides are literals once N is known
    (one bounded count action), so generating negatives costs an explode
    and integer arithmetic, never a join or shuffle; pair VARIETY comes
    from distinct per-slot strides. Requires dense ids: run rows through
    a dense-id assignment first if the key space has holes (a sparse id
    space would silently alias partners).
    """
    n = df.count()  # bounded driver scalar; the id space must be 0..n-1
    if n < 2:
        raise ValueError(f"need >= 2 rows to sample negatives, got {n}")
    slots = F.explode(F.sequence(F.lit(1), F.lit(k))).alias("slot")
    base = df.select(F.col(id_col), slots)
    stride = (F.col("slot") * F.lit(2654435761) + F.lit(seed)) % F.lit(n)
    stride = F.when(stride == 0, F.lit(1)).otherwise(stride)
    return base.select(
        id_col,
        "slot",
        ((F.col(id_col) + stride) % F.lit(n)).cast("long").alias("neg_id"),
    )


def epoch_order_key(id_col: Column, epoch: int) -> Column:
    """Deterministic per-epoch global shuffle key: md5 over
    ``"<epoch>:<id>"``. Every epoch is a different uniform permutation of
    the corpus, reproducible across runs and engines — the training-
    loader contract (epoch N's order must be recoverable to resume mid-
    epoch). Sorting by this key is a range-partitioned sort; taking the
    first k is a shuffle-free TakeOrderedAndProject."""
    return F.md5(F.concat(F.lit(f"{epoch}:"), id_col.cast("string")))


def weighted_priority(id_col: Column, weight_col: Column) -> Column:
    """Efraimidis-Spirakis (2006) weighted-sampling-without-replacement
    priority: the k rows with the SMALLEST ``-ln(u)/w`` (equivalently the
    largest u^(1/w)) are an exact weighted sample without replacement.
    ``u`` is deterministic — the first 60 md5 bits of the id mapped into
    (0, 1] — so the sample is reproducible across runs, partitionings,
    and engines (DuckDB computes the identical priority; the only
    divergence channel is a last-ulp ``ln`` difference flipping two
    nearly-tied priorities, ~2^-50 per boundary pair). Weights must be
    > 0."""
    h = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 15), 16, 10).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(float(1 << 60))
    return -F.log(u) / weight_col.cast("double")


def weighted_sample(df: DataFrame, id_col: str, weight_col: str, k: int) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement: k rows, each
    row's inclusion probability proportional to its weight (A-ES,
    "Weighted random sampling with a reservoir", Efraimidis & Spirakis
    2006) — how a mixing pipeline takes "10k docs, long docs
    proportionally more likely" without a global sort: the k smallest
    priorities are a shuffle-free TakeOrderedAndProject, state = k rows
    per partition then k at the driver, never a full shuffle."""
    pr = weighted_priority(F.col(id_col), F.col(weight_col))
    return (
        df.where(F.col(weight_col) > 0)
        .select(id_col, weight_col, pr.alias("__priority"))
        .orderBy("__priority")
        .limit(k)
        .drop("__priority")
    )


def weighted_systematic_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n_target: int,
) -> DataFrame:
    """Probability-proportional-to-size sampling WITHOUT floats or
    randomness: systematic (fixed-interval) selection on the cumulative
    weight line, walked in the deterministic md5(id) permutation. With
    T = max(1, total_weight div n_target), a row covering cumulative
    span (cum - w, cum] is selected iff the span contains a multiple of
    T — each row's selection probability is ~ w/T (the classic
    cumulative-size systematic design), picks are evenly spread over the
    weight mass, and the whole draw is a pure integer function of the
    corpus: oracle-replayable, partitioning-invariant, reproducible
    across engines. ``n_picks = cum div T - (cum - w) div T`` carries
    the with-replacement multiplicity for rows heavier than T.

    The running weight is the TWO-PHASE distributed prefix sum
    (``prefix.global_running_sum`` — range partition on the md5 order,
    per-partition windows, one bounded offset row per partition), never
    a single-partition window; total weight and T meet the corpus in a
    broadcast 1-row crossJoin. Use it for token-budgeted subset draws
    where uniform row sampling over-represents short documents.

    Returns (id_col, weight, cum_weight, pick_idx, n_picks) for selected
    rows, pick_idx = cum div T (the LAST interval mark the row covers).
    """
    from . import prefix

    if n_target < 1:
        raise ValueError(f"n_target must be >= 1, got {n_target}")
    d = df.select(
        F.col(id_col),
        F.col(weight_col).cast("long").alias("__w"),
        F.md5(F.col(id_col).cast("string")).alias("__h"),
    ).where(F.col("__w") > 0)
    c = prefix.global_running_sum(
        d, [F.asc("__h"), F.asc(id_col)], "__w", out="__cum"
    )
    tot = c.agg(F.max("__cum").alias("__tot"))
    return (
        c.crossJoin(F.broadcast(tot))
        .withColumn(
            "__t", F.greatest(F.expr(f"__tot div {int(n_target)}"), F.lit(1).cast("long"))
        )
        .where(F.expr("__cum div __t > (__cum - __w) div __t"))
        .select(
            F.col(id_col),
            F.col("__w").alias("weight"),
            F.col("__cum").alias("cum_weight"),
            F.expr("cast(__cum div __t as bigint)").alias("pick_idx"),
            F.expr("cast(__cum div __t - (__cum - __w) div __t as bigint)").alias(
                "n_picks"
            ),
        )
    )


def rational_pow_floor_sql(nt_expr: str, p: int, q: int) -> str:
    """SQL expression computing floor(nt ** (p/q)) EXACTLY for a
    non-negative integer ``nt`` — the temperature weight for arbitrary
    rational alpha = p/q without float error leaking into the draw.

    Method: seed w0 = floor(pow(nt, p/q)) from doubles, then pick the
    LARGEST candidate w in [w0-2, w0+2] with w**q <= nt**p, both sides
    exponentiated by repeated multiplication in DECIMAL(38,0) — the
    double pow only needs to land within +/-2 of the true root (libm and
    the JVM agree to far better than that), so the RESULT is a pure
    integer function of (nt, p, q), identical in Spark and DuckDB even
    though their pow implementations differ in the last ulp. Validity is
    downward-closed in w, so GREATEST over the candidate CASEs is the
    max valid one. Bound: nt**p must fit DECIMAL(38,0) (nt <= 1e12 for
    p = 3 — per-source token masses at the 100 TB point are ~1e12, so
    keep p small; the q196 standard alphas 1/2, 3/10, 7/10 all qualify).
    The same expression text runs in DuckDB with DECIMAL(38,0) HUGEINT
    semantics — it is the shared oracle formula.
    """
    if p < 1 or q < 1:
        raise ValueError(f"alpha = p/q needs positive integers, got {p}/{q}")
    nt_dec = f"CAST({nt_expr} AS DECIMAL(38,0))"
    ntp = " * ".join([nt_dec] * p)
    # the exponent MUST divide as doubles: a bare `2.0 / 3.0` is DECIMAL
    # division in Spark SQL (6 fractional digits -> pow lands ~1e-5 off,
    # far outside the candidate window)
    alpha_d = f"(CAST({p} AS DOUBLE) / CAST({q} AS DOUBLE))"
    w0 = f"CAST(FLOOR(POWER(CAST({nt_expr} AS DOUBLE), {alpha_d})) AS BIGINT)"
    cands = []
    for d in (-2, -1, 0, 1, 2):
        w = f"({w0} + {d})"
        wq = " * ".join([f"CAST({w} AS DECIMAL(38,0))"] * q)
        cands.append(
            f"CASE WHEN {w} >= 0 AND ({wq}) <= ({ntp}) THEN {w} ELSE -1 END"
        )
    return f"GREATEST({', '.join(cands)})"


def temperature_mixture_sample(
    df: DataFrame,
    id_col: str,
    source_col: str,
    weight_col: str,
    token_budget: int,
    alpha: tuple[int, int] = (1, 2),
) -> DataFrame:
    """Temperature-scaled source mixture (the multilingual pretraining
    standard; ``alpha`` = (p, q) is the temperature p/q, default 1/2):
    each source's share of ``token_budget`` is proportional to
    floor(its total token mass ** alpha) — up-weighting small sources
    relative to raw proportions without floats leaking into the draw
    (the weight is an EXACT integer root via ``rational_pow_floor_sql``:
    a double pow seeds a candidate window, DECIMAL(38,0) verification
    picks the true floor, so any alpha in the literature's [0.2, 0.7]
    sweep stays oracle-replayable). Within each source, documents are
    taken in the deterministic md5(id) permutation until the source's
    cumulative tokens reach its target (the q71 token-budget rule,
    applied per source).

    Scale shape: the per-source running sum is NOT a
    ``Window.partitionBy(source)`` (20 sources at 100 TB = 5 TB per
    reducer task — a skew funnel); it is ONE global two-phase prefix sum
    over the total order (source, md5(id), id) minus per-source offsets,
    where the offsets come from a sources^2-bounded self-join over the
    per-source totals (20 x 20 rows) met in a broadcast. Every exchange
    is either corpus-keyed range partitioning or model-scale broadcast.

    Returns the kept documents: (id_col, source_col, weight,
    cum_in_source, target_tokens) — one row per drawn doc. A drawn
    source's realized tokens land in (target - max_doc, target]
    by the cum <= target rule; sources with target 0 draw nothing.
    """
    from . import prefix

    if token_budget < 1:
        raise ValueError(f"token_budget must be >= 1, got {token_budget}")
    d = df.select(
        F.col(id_col),
        F.col(source_col).alias("__src"),
        F.col(weight_col).cast("long").alias("__w"),
        F.md5(F.col(id_col).cast("string")).alias("__h"),
    ).where(F.col("__w") > 0)
    tot = d.groupBy("__src").agg(F.sum("__w").alias("__nt"))
    wt_raw = F.expr(rational_pow_floor_sql("__nt", *alpha)).cast("long")
    # -1 = every candidate failed DECIMAL verification: the double pow
    # seed landed outside its guaranteed window (possible only on a
    # broken pow or an nt**p decimal overflow) — raise on the spot
    # rather than ship a silently-wrong mixture; the check rides the
    # sources-bounded relation, zero extra jobs
    wgt = tot.select(
        "__src",
        "__nt",
        F.when(wt_raw >= 0, wt_raw)
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "temperature_mixture_sample: exact-root candidate "
                        f"window missed for alpha={alpha[0]}/{alpha[1]} at "
                        "token mass "
                    ),
                    F.col("__nt").cast("string"),
                    F.lit(" — check nt**p fits DECIMAL(38,0)"),
                )
            ).cast("long")
        )
        .alias("__wt"),
    )
    wsum = wgt.agg(F.sum("__wt").alias("__wsum"))
    tgt = wgt.crossJoin(F.broadcast(wsum)).select(
        "__src",
        F.expr(f"cast({int(token_budget)} as bigint) * __wt div __wsum").alias(
            "__target"
        ),
    )
    # per-source offset = sum of earlier sources' totals (sources^2 rows)
    offs = (
        wgt.alias("a")
        .join(
            wgt.alias("b"), F.col("b.__src") < F.col("a.__src"), "left"
        )
        .groupBy(F.col("a.__src").alias("__src"))
        .agg(F.coalesce(F.sum("b.__nt"), F.lit(0)).cast("long").alias("__off"))
    )
    c = prefix.global_running_sum(
        d, [F.asc("__src"), F.asc("__h"), F.asc(id_col)], "__w", out="__cum"
    )
    return (
        c.join(F.broadcast(offs), "__src")
        .join(F.broadcast(tgt), "__src")
        .where((F.col("__cum") - F.col("__off")) <= F.col("__target"))
        .select(
            F.col(id_col),
            F.col("__src").alias(source_col),
            F.col("__w").alias("weight"),
            (F.col("__cum") - F.col("__off")).alias("cum_in_source"),
            F.col("__target").alias("target_tokens"),
        )
    )
