"""Keyword retrieval over the corpus — BM25 scoring as DataFrame ops.

A training-data pipeline uses lexical retrieval constantly: pulling
benchmark-adjacent documents for decontamination review, mining domain
subsets by keyword seed lists, spot-checking what a filter removed. BM25
(Robertson & Spärck Jones's probabilistic ranking; the Okapi BM25 form)
is the standard function. Everything here is JVM-side codegen — one
explode scan, keyed aggregations, broadcast joins; no UDFs, no driver
loops.

Exactness divergence (documented): classic BM25's idf is
``ln((N - df + 0.5) / (df + 0.5) + 1)``. ``ln``'s last-ulp behavior is
libm-specific, which would poison cross-engine hash parity, so the idf
here is the RATIONAL form ``(N - df + 0.5) / (df + 0.5)`` — a strictly
monotone transform of the classic idf, so per-term document ordering is
identical; absolute scores differ from textbook BM25. Per-term scores are
floored to integer ppm BEFORE the per-document sum, keeping the sum an
exact BIGINT (associative, engine-independent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import topk
from ..functions import text


def bm25_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Score every document matching >= 1 query term with rational-idf
    BM25 (see module docstring) over the whitespace tokenization.

    Returns (id, n_terms_matched, score_ppm); score_ppm is the BIGINT sum
    of per-term floor(score * 1e6) contributions.

    Scale shape: one token-explode scan feeds document lengths and the
    per-(doc, term) tf counts (term filter applied BEFORE the tf shuffle —
    only query-term postings move); df and the (N, S) corpus scalars are
    tiny broadcast relations. Cost is proportional to the postings of the
    query terms, not the corpus — the inverted-index access pattern,
    expressed relationally.
    """
    occ = docs.select(
        F.col(id_col).alias("__id"), F.explode(text.tokens(F.col(text_col))).alias("__tok")
    )
    dl = occ.groupBy("__id").agg(F.count("*").alias("__dl"))
    scalars = dl.agg(
        F.count("*").alias("__n_docs"), F.sum("__dl").alias("__sum_dl")
    )
    hits = occ.where(F.col("__tok").isin(terms))
    tf = hits.groupBy("__id", "__tok").agg(F.count("*").alias("__tf"))
    df_t = tf.groupBy("__tok").agg(F.count("*").alias("__df"))

    # per-row double arithmetic with an expression tree mirrored exactly
    # in the SQL oracle: IEEE ops are deterministic given identical
    # structure; only aggregation order is not, and the only sum over
    # doubles here was already floored to BIGINT ppm
    idf = (
        (F.col("__n_docs") - F.col("__df")).cast("double") + F.lit(0.5)
    ) / (F.col("__df").cast("double") + F.lit(0.5))
    len_norm = (F.col("__dl") * F.col("__n_docs")).cast("double") / F.col("__sum_dl").cast(
        "double"
    )
    denom = F.col("__tf").cast("double") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * len_norm
    )
    term_score = idf * (F.col("__tf").cast("double") * F.lit(k1 + 1.0)) / denom
    return (
        tf.join(F.broadcast(df_t), on="__tok")
        .join(dl, on="__id")
        .crossJoin(F.broadcast(scalars))
        .withColumn("__term_ppm", F.floor(term_score * F.lit(1000000.0)).cast("long"))
        .groupBy("__id")
        .agg(
            F.count("*").alias("n_terms_matched"),
            F.sum("__term_ppm").alias("score_ppm"),
        )
        .select(F.col("__id").alias(id_col), "n_terms_matched", "score_ppm")
    )


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25 score, deterministic tie-break on id.
    Bounded rank via ``topk.ranked_top_k``: per-partition k-heaps
    (TakeOrderedAndProject), then row_number over the k survivors only —
    the match-cardinality single-partition rank exchange is gone."""
    return topk.ranked_top_k(
        bm25_scores(docs, id_col, text_col, terms, k1, b),
        [F.desc("score_ppm"), F.asc(id_col)],
        k,
    )
