"""End-to-end corpus curation — the operators composed into the standard
pretraining-data pipeline shape, as ONE lazy DataFrame DAG.

This is the capstone composition the individual registry queries
(q20/q26/q55/q62/q64/q68/q93/…) exercise in isolation: a raw document
drop goes through quality filtering, exact dedup, near-dup dedup,
benchmark decontamination, importance selection and a token budget, and
lands as deterministic training shards. Every stage is one of the
already-oracle-verified operators; this module only sequences them and
pins the cross-stage contracts (monotone row counts, determinism under
repartitioning, stage-count audit trail).

Scale notes: stage order is chosen so the EXPENSIVE operators see the
SMALLEST corpus — cheap row-local quality predicates first, then exact
(hash-groupBy) dedup, and only then the LSH near-dup pass; the
decontamination n-gram join broadcasts the (tiny) benchmark side;
selection/budget are one histogram + one window. Nothing in the chain
collects the corpus to the driver.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as T
from ..operators import dedup, persistence, prefix, sampling


@dataclass(frozen=True)
class CurationReport:
    """Row counts after each stage — the funnel audit a curation run
    records next to its output (the what-did-we-drop evidence)."""

    n_raw: int
    n_quality: int
    n_exact: int
    n_near_dup: int
    n_decontaminated: int
    n_selected: int


def scrub_boilerplate(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    seg_tokens: int = 8,
    max_docs: int = 2,
) -> DataFrame:
    """Stage 0 (optional) — C4-style segment scrub: remove every
    ``seg_tokens``-token segment occurring in more than ``max_docs``
    distinct documents (headers, navigation, license blurbs) and carry
    the reassembled text forward under the same column name. Runs BEFORE
    dedup so shared boilerplate cannot glue otherwise-unrelated documents
    into near-dup clusters; fully-boilerplate docs become empty and fall
    out at the quality floor. Other columns survive via the id join."""
    kept = dedup.segment_dedup(docs, id_col, text_col, seg_tokens, max_docs).select(
        id_col, F.col("kept_text").alias(text_col)
    )
    return docs.drop(text_col).join(kept, on=id_col)


def quality_floor(docs: DataFrame, text_col: str, min_tokens: int) -> DataFrame:
    """Stage 1 — row-local token-count floor; adds ``__n_tokens``.
    Stricter quality predicates (stopword ratio, repetition, lang) are
    row-local too: filter before or after, the plan shape is the same."""
    return (
        docs.withColumn("__toks", T.tokens(F.col(text_col)))
        .withColumn("__n_tokens", F.size("__toks"))
        .where(F.col("__n_tokens") >= min_tokens)
        .drop("__toks")
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    max_ppm: int,
) -> DataFrame:
    """Stage 4 — drop docs whose distinct-3-gram overlap with the
    benchmark exceeds ``max_ppm`` of their own grams. The benchmark gram
    set is broadcast (it is an eval set, not a corpus); docs too short
    for any 3-gram have zero overlap by definition and are kept."""
    bench_grams = (
        benchmark.select(T.tokens(F.col(text_col)).alias("__bt"))
        .where(F.size("__bt") >= 3)
        .select(F.explode(T.shingles_from_tokens(F.col("__bt"), 3)).alias("__g"))
        .select(F.md5("__g").alias("__g"))
        .distinct()
    )
    doc_grams = (
        docs.select(F.col(id_col), T.tokens(F.col(text_col)).alias("__dt"))
        .where(F.size("__dt") >= 3)
        .select(F.col(id_col), F.explode(T.shingles_from_tokens(F.col("__dt"), 3)).alias("__g"))
        .select(F.col(id_col), F.md5("__g").alias("__g"))
    )
    tot = doc_grams.groupBy(id_col).agg(F.count("*").alias("__n_g"))
    hit = (
        doc_grams.join(F.broadcast(bench_grams), on="__g")
        .groupBy(id_col)
        .agg(F.count("*").alias("__n_hit"))
    )
    contaminated = (
        tot.join(hit, on=id_col)
        .where(F.expr(f"__n_hit * 1000000 div __n_g > {max_ppm}"))
        .select(id_col)
    )
    return docs.join(contaminated, on=id_col, how="left_anti")


def select_top_fraction(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    target_pred: Column,
    keep_top_frac: float,
    reliable: bool = False,
) -> DataFrame:
    """Stage 5 — DSIR-style importance selection: keep the top fraction
    by mean hashed-ratio score, deterministic doc-id tie-break. Every
    doc needs its rank (the cut is a FRACTION, not a bounded k), so the
    rank is the two-phase distributed row_number (``prefix.
    global_row_number``: range partition, per-partition ranks, one
    offset row per partition) — no corpus-cardinality single-partition
    window. The corpus size rides as a broadcast 1-row relation."""
    # scores feeds TWO consumers (the rank and the corpus-size total);
    # left lazy, the whole scoring pipeline — two token-explode + md5
    # scans of the corpus — re-runs for the 1-row count (r15, guide §5:
    # one materialization for two consumers). One row per doc, 4 cols —
    # cheap to stage even at corpus scale.
    scores = persistence.stage(
        sampling.hashed_importance_scores(
            docs, id_col, text_col, target_pred, reliable=reliable
        ),
        reliable,
    )
    ranked = prefix.global_row_number(
        scores, [F.desc("mean_score_ppm"), F.asc(id_col)], out="__rank",
        reliable=reliable,
    )
    n_total = scores.agg(F.count("*").alias("__n"))
    keep_ids = (
        ranked.crossJoin(F.broadcast(n_total))
        .where(F.col("__rank") * 1000 <= F.col("__n") * int(keep_top_frac * 1000))
        .select(id_col)
    )
    return docs.join(keep_ids, on=id_col, how="leftsemi")


def token_budget_cut(
    docs: DataFrame, id_col: str, token_budget: int, reliable: bool = False
) -> DataFrame:
    """Stage 6 — md5-ordered cumulative token budget (q71's two-phase
    prefix-sum device): reproducible under repartitioning, unbiased by
    ingestion order, no single-partition window (the running sum range-
    partitions on the md5 order and broadcasts one offset row per
    partition). Requires ``__n_tokens`` (from ``quality_floor``)."""
    with_h = docs.withColumn("__h", F.md5(F.col(id_col).cast("string")))
    return (
        prefix.global_running_sum(
            with_h, [F.asc("__h"), F.asc(id_col)], "__n_tokens", out="__cum",
            reliable=reliable,
        )
        .where(F.col("__cum") <= token_budget)
        .drop("__cum", "__h")
    )


def curate_corpus(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    jaccard_threshold: float = 0.5,
    contamination_max_ppm: int = 200_000,
    target_pred: Column | None = None,
    keep_top_frac: float = 0.8,
    token_budget: int | None = None,
    segment_max_docs: int | None = None,
    reliable: bool = False,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Compose the full pipeline (lazy up to stage 4; the optional DSIR
    and token-budget stages materialize their scored relation once via
    the two-phase prefix-sum helper). ``reliable=True`` routes every
    corpus-sized materialization through a fault-tolerant checkpoint
    (persistence.stage) for cluster-scale runs. Stages, cheapest first:
    optional boilerplate segment scrub -> quality floor -> exact dedup
    (keep lowest id) -> near-dup dedup (LSH -> exact verify -> connected
    components) -> decontamination -> optional DSIR selection -> optional
    token budget.

    ``hash_fn``: MinHash family for the near-dup candidate stage.
    Defaults to the production ``xxhash64`` family (r16 — measured 2.8x
    cheaper signatures, PROD_BENCH minhash_family); the exact-Jaccard
    VERIFY stage is family-independent, so only borderline LSH candidacy
    (not the >=threshold decision) differs between families. The
    registry queries keep the oracle-portable md5 family explicitly."""
    if segment_max_docs is not None:
        docs = scrub_boilerplate(docs, id_col, text_col, max_docs=segment_max_docs)
    quality = quality_floor(docs, text_col, min_tokens)
    exact = dedup.dedup_exact(quality, [text_col], [F.asc(id_col)])
    # candidate-restricted verify (the q199-attested production shape):
    # the verified pair set is IDENTICAL to the index verify — exact
    # Jaccard intersected with LSH candidacy either way — but its cost
    # tracks candidate volume instead of shingle-bucket occupancy^2
    # (r15: guide §1.2 "don't compute things you throw away")
    near = dedup.near_dup_dedup(
        exact, id_col, text_col, jaccard_threshold, verify="candidates",
        hash_fn=hash_fn,
    )
    clean = decontaminate(near, benchmark, id_col, text_col, contamination_max_ppm)
    if target_pred is not None:
        clean = select_top_fraction(
            clean, id_col, text_col, target_pred, keep_top_frac, reliable=reliable
        )
    if token_budget is not None:
        clean = token_budget_cut(clean, id_col, token_budget, reliable=reliable)
    return clean


def curate_to_shards(
    docs: DataFrame,
    benchmark: DataFrame,
    out_path: str,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    jaccard_threshold: float = 0.5,
    contamination_max_ppm: int = 200_000,
    target_pred: Column | None = None,
    keep_top_frac: float = 0.8,
    token_budget: int | None = None,
    segment_max_docs: int | None = None,
    reliable: bool = False,
    hash_fn: str = "xxhash64",
) -> CurationReport:
    """Run the pipeline stage-by-stage, record the funnel, write
    deterministic training shards. Stage boundaries are materialized
    ONCE via persistence.stage — localCheckpoint by default (re-run on
    executor loss), a fault-tolerant checkpoint with ``reliable=True``
    (the production setting at 100 TB, where losing an executor
    mid-funnel is routine) — so each expensive operator executes ONCE
    (the funnel counts are then free narrow actions, and the LSH stage
    does not re-run for the write)."""
    from ..io import write_training_shards

    n_raw = docs.count()
    if segment_max_docs is not None:
        docs = persistence.stage(
            scrub_boilerplate(docs, id_col, text_col, max_docs=segment_max_docs),
            reliable,
        )
    quality = persistence.stage(quality_floor(docs, text_col, min_tokens), reliable)
    n_quality = quality.count()
    exact = persistence.stage(
        dedup.dedup_exact(quality, [text_col], [F.asc(id_col)]), reliable
    )
    n_exact = exact.count()
    near = persistence.stage(
        # candidate-restricted verify — identical pair set, output-
        # dependent cost (see curate_corpus)
        dedup.near_dup_dedup(
            exact, id_col, text_col, jaccard_threshold, verify="candidates",
            hash_fn=hash_fn,
        ),
        reliable,
    )
    n_near = near.count()
    clean = persistence.stage(
        decontaminate(near, benchmark, id_col, text_col, contamination_max_ppm),
        reliable,
    )
    n_decon = clean.count()
    if target_pred is not None:
        clean = select_top_fraction(
            clean, id_col, text_col, target_pred, keep_top_frac, reliable=reliable
        )
    if token_budget is not None:
        clean = token_budget_cut(clean, id_col, token_budget, reliable=reliable)
    clean = persistence.stage(clean, reliable)
    n_selected = clean.count()
    write_training_shards(
        clean.drop("__n_tokens"), out_path, n_shards=n_shards, shard_key=id_col,
        sort_within=[id_col],
    )
    return CurationReport(
        n_raw=n_raw,
        n_quality=n_quality,
        n_exact=n_exact,
        n_near_dup=n_near,
        n_decontaminated=n_decon,
        n_selected=n_selected,
    )
