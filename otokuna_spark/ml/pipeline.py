"""MLlib surface (SURVEY.md §2.10 M1-M5) — the CatBoost training stage
(ml/train.py) re-expressed as an MLlib Pipeline.

Documented divergence (SURVEY.md §4/§7): CatBoost optimizes MAE with
early stopping; MLlib GBTRegressor's ``lossType='absolute'`` is the
nearest objective but predictions will differ — parity is on pipeline
SHAPE and the metric computation (MAE via one aggregation), not on
identical predictions. Metrics land in the same metrics.json contract
(train/val/test MAE; ml/metrics.json).

M3 (quantile-by-leaf tree, libs/otokuna/tree.py:10-94) composes MLlib's
``DecisionTreeRegressor`` + ``setLeafCol`` with a groupBy-percentile (A5):
fit -> transform train set with leaf ids -> per-leaf exact percentiles of
y -> broadcast-join the leaf->quantiles table at predict time.
"""

from __future__ import annotations

import json

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.regression import DecisionTreeRegressor, GBTRegressor
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sampling import train_val_test_split
from ..plans.pipeline import FEATURE_COLS


def _assembler(feature_cols: list[str] | None = None) -> VectorAssembler:
    """M1 — the fixed 15-column feature vector (analysis.py:95-111)."""
    return VectorAssembler(inputCols=feature_cols or FEATURE_COLS, outputCol="features")


def _with_numeric_features(df: DataFrame, feature_cols: list[str]) -> DataFrame:
    """Booleans in the feature list (service_room etc.) need numeric cast
    for VectorAssembler."""
    out = df
    for c in feature_cols:
        if dict(df.dtypes)[c] == "boolean":
            out = out.withColumn(c, F.col(c).cast("double"))
    return out


def mae(df: DataFrame, label: str = "y", pred: str = "y_pred") -> float:
    """A3 — mean absolute error via one aggregation (ml/train.py:20-23)."""
    return df.agg(F.avg(F.abs(F.col(label) - F.col(pred)))).collect()[0][0]


def train_gbt(
    df: DataFrame,
    label: str = "y",
    feature_cols: list[str] | None = None,
    max_iter: int = 50,
    seed: int = 456,
) -> tuple[PipelineModel, dict]:
    """M2+M5 — fit GBT (absolute loss ~ CatBoost MAE objective), return
    (model, metrics dict shaped like ml/metrics.json)."""
    cols = feature_cols or FEATURE_COLS
    df = _with_numeric_features(df, cols)
    split = train_val_test_split(df, key="jnc_id") if "jnc_id" in df.columns else train_val_test_split(
        df.withColumn("jnc_id", F.col(cols[0]).cast("string")), key="jnc_id"
    )
    gbt = GBTRegressor(
        featuresCol="features",
        labelCol=label,
        predictionCol="y_pred",
        lossType="absolute",
        maxIter=max_iter,
        seed=seed,
    )
    pipe = Pipeline(stages=[_assembler(cols), gbt])
    train = split.filter(F.col("split") == "train")
    model = pipe.fit(train)
    metrics = {}
    for name in ("train", "val", "test"):
        part = split.filter(F.col("split") == name)
        if part.isEmpty():
            continue
        metrics[f"mae_{name}"] = mae(model.transform(part), label=label)
    return model, metrics


def predict(model: PipelineModel, df: DataFrame, label: str = "y") -> DataFrame:
    """M4 — batch inference; output matches the predictions table contract
    (FIXTURES.md §4: jnc_id, y, y_pred). J3's left-join semantics (y for
    all rows, y_pred where features complete) come from scoring only the
    feature-complete subset and left-joining back."""
    cols = [c for c, _ in df.dtypes]
    base = df.select("jnc_id", F.col(label).alias("y")) if "jnc_id" in cols else None
    scored = model.transform(_with_numeric_features(df, model.stages[0].getInputCols()))
    if base is None:
        return scored
    return base.join(scored.select("jnc_id", "y_pred"), on="jnc_id", how="left")


def write_metrics_json(metrics: dict, path: str) -> None:
    with open(path, "w") as f:
        json.dump(metrics, f, sort_keys=True)


# ------------------------------------------------------- leaf quantiles


def fit_leaf_quantile_tree(
    df: DataFrame,
    label: str = "y",
    feature_cols: list[str] | None = None,
    quantiles: tuple[float, ...] = (0.1, 0.5, 0.9),
    max_depth: int = 5,
    seed: int = 456,
) -> tuple[PipelineModel, DataFrame]:
    """M3 — DecisionTreeRegressor + per-leaf exact quantiles of the train
    label (tree.py:51-68). Returns (model, leaf_quantiles) where
    leaf_quantiles = (leaf, q_<p>... ) — a small broadcastable table."""
    cols = feature_cols or FEATURE_COLS
    df = _with_numeric_features(df, cols)
    tree = DecisionTreeRegressor(
        featuresCol="features",
        labelCol=label,
        predictionCol="y_pred",
        leafCol="leaf",
        maxDepth=max_depth,
        seed=seed,
    )
    pipe = Pipeline(stages=[_assembler(cols), tree])
    model = pipe.fit(df)
    leaves = model.transform(df)
    aggs = [
        F.percentile(F.col(label), F.lit(q)).alias(f"q_{str(q).replace('.', '_')}") for q in quantiles
    ]
    leaf_quantiles = leaves.groupBy("leaf").agg(*aggs)
    return model, leaf_quantiles


def predict_quantiles(model: PipelineModel, leaf_quantiles: DataFrame, df: DataFrame) -> DataFrame:
    """tree.py:70-94 — predict the precomputed per-leaf quantiles via a
    broadcast join on the leaf id (the leaf table is tiny: <= 2^depth rows)."""
    cols = model.stages[0].getInputCols()
    scored = model.transform(_with_numeric_features(df, cols))
    return scored.join(F.broadcast(leaf_quantiles), on="leaf", how="left")


def tune_gbt(
    df: DataFrame,
    label: str = "y",
    feature_cols: list[str] | None = None,
    max_iter_grid: tuple[int, ...] = (5, 20, 50),
    max_depth_grid: tuple[int, ...] = (3, 5),
    seed: int = 456,
):
    """M2's early-stopping analog: CatBoost stops boosting when val MAE
    plateaus (ml/train.py:48-54); MLlib's equivalent knob is selecting
    maxIter/maxDepth on a validation split. TrainValidationSplit evaluates
    the grid distributed and returns the best model + the per-candidate
    validation metrics."""
    from pyspark.ml.tuning import ParamGridBuilder, TrainValidationSplit

    cols = feature_cols or FEATURE_COLS
    df = _with_numeric_features(df, cols)
    gbt = GBTRegressor(
        featuresCol="features",
        labelCol=label,
        predictionCol="y_pred",
        lossType="absolute",
        seed=seed,
    )
    pipe = Pipeline(stages=[_assembler(cols), gbt])
    grid = (
        ParamGridBuilder()
        .addGrid(gbt.maxIter, list(max_iter_grid))
        .addGrid(gbt.maxDepth, list(max_depth_grid))
        .build()
    )
    evaluator = RegressionEvaluator(labelCol=label, predictionCol="y_pred", metricName="mae")
    tvs = TrainValidationSplit(
        estimator=pipe,
        estimatorParamMaps=grid,
        evaluator=evaluator,
        trainRatio=0.75,
        seed=seed,
        parallelism=4,
    )
    model = tvs.fit(df)
    metrics = dict(zip([str(m) for m in model.getEstimatorParamMaps()], model.validationMetrics))
    return model.bestModel, metrics
