"""Multinomial Naive Bayes for model-based quality/domain filtering —
the fastText-classifier role in curation pipelines (label high/low
quality, keep docs the model scores above threshold), in closed form.

Why NB and not logistic regression here: training is a pair of token
aggregations (class-conditional counts + priors) — no iterative solver,
so the ENTIRE train+score pipeline is one deterministic DataFrame DAG
that an external SQL oracle can replicate exactly. That determinism is
the difference between "trust me, the model ran" and a hash-checked
correctness row.

Numeric contract: per-token log-likelihood ratios are floored to integer
micro-nats BEFORE summation. Summing doubles is reduction-order-
dependent (non-associative) and would break cross-engine parity; summing
integers is exact. The floor costs < 1e-6 nat per token — noise against
typical |ratio| of 0.1+ nats.

Scale shape: one token aggregation over the train split (vocabulary-
sized result), scalars as 1-row broadcast relations, score = exploded
test tokens LEFT-joined to the weight table (AQE broadcasts it when the
vocabulary is small; a keyed join otherwise) + one per-doc sum. Nothing
iterates, nothing collects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_UNAT = 1_000_000  # micro-nats


def nb_quality_scores(
    train_docs: DataFrame,
    test_docs: DataFrame,
    label: Column,
    id_col: str,
    tokens: Column,
) -> DataFrame:
    """Train add-one-smoothed multinomial NB on ``train_docs`` (binary
    ``label`` column expression) and score ``test_docs``:
    (id_col, score_unat, pred) where score_unat is the integer micro-nat
    log-odds sum (token ratios + class prior) and pred = score > 0.
    ``tokens`` is the tokenizer expression (array<string>) applied to
    both splits. Tokens unseen in training get the smoothed-unseen
    ratio, not zero."""
    occ_tr = train_docs.select(label.cast("int").alias("cls"), F.explode(tokens).alias("tok"))
    cnt = occ_tr.groupBy("tok").agg(
        F.sum("cls").alias("c1"), (F.count("*") - F.sum("cls")).alias("c0")
    )
    scalars = cnt.agg(
        F.sum("c1").alias("tot1"), F.sum("c0").alias("tot0"), F.count("*").alias("v")
    )
    priors = train_docs.agg(
        F.sum(label.cast("int")).alias("n1"),
        (F.count("*") - F.sum(label.cast("int"))).alias("n0"),
    )

    def unat(expr: Column) -> Column:
        return F.floor(expr * float(_UNAT)).cast("long")

    lr = cnt.crossJoin(F.broadcast(scalars)).select(
        "tok",
        unat(
            F.log((F.col("c1") + 1.0) / (F.col("tot1") + F.col("v")))
            - F.log((F.col("c0") + 1.0) / (F.col("tot0") + F.col("v")))
        ).alias("w"),
    )
    dflt = scalars.select(
        unat(
            F.log(1.0 / (F.col("tot1") + F.col("v")))
            - F.log(1.0 / (F.col("tot0") + F.col("v")))
        ).alias("w0")
    )
    prior = priors.select(
        unat(
            F.log(F.col("n1").cast("double") / (F.col("n1") + F.col("n0")))
            - F.log(F.col("n0").cast("double") / (F.col("n1") + F.col("n0")))
        ).alias("pw")
    )

    occ_te = test_docs.select(F.col(id_col), F.explode(tokens).alias("tok"))
    return (
        occ_te.join(lr, "tok", "left")
        .crossJoin(F.broadcast(dflt))
        .groupBy(id_col)
        .agg(F.sum(F.coalesce(F.col("w"), F.col("w0"))).alias("s"))
        .crossJoin(F.broadcast(prior))
        .select(
            id_col,
            (F.col("s") + F.col("pw")).cast("long").alias("score_unat"),
            ((F.col("s") + F.col("pw")) > 0).cast("int").alias("pred"),
        )
    )
