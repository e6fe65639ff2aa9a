"""ML pipeline tests (M1-M5, M3 leaf quantiles) on synthetic data —
mirrors the reference's perfectly-separable quantile-tree test
(libs/tests/test_tree.py:10-36) and split invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from otokuna_spark.ml import pipeline as mlp


@pytest.fixture(scope="module")
def toy_df(spark):
    # two well-separated clusters: x < 0 -> y ~ 100, x >= 0 -> y ~ 1000
    rows = []
    for i in range(200):
        x = -1.0 - (i % 10) * 0.1 if i % 2 == 0 else 1.0 + (i % 10) * 0.1
        y = 100.0 + (i % 5) if i % 2 == 0 else 1000.0 + (i % 7)
        rows.append((str(i), x, float(i % 3), y))
    return spark.createDataFrame(rows, ["jnc_id", "f1", "f2", "y"])


def test_train_gbt_metrics_shape(toy_df):
    model, metrics = mlp.train_gbt(toy_df, feature_cols=["f1", "f2"], max_iter=5)
    assert set(metrics) <= {"mae_train", "mae_val", "mae_test"}
    assert "mae_train" in metrics
    # separable data -> model should beat the trivial predictor by far
    assert metrics["mae_train"] < 100.0


def test_predict_contract(toy_df):
    model, _ = mlp.train_gbt(toy_df, feature_cols=["f1", "f2"], max_iter=5)
    preds = mlp.predict(model, toy_df)
    assert preds.columns == ["jnc_id", "y", "y_pred"]
    assert preds.count() == 200
    assert preds.filter(F.col("y_pred").isNull()).count() == 0


def test_leaf_quantile_tree(spark, toy_df):
    model, leaf_q = mlp.fit_leaf_quantile_tree(
        toy_df, feature_cols=["f1", "f2"], quantiles=(0.1, 0.5, 0.9), max_depth=2
    )
    out = mlp.predict_quantiles(model, leaf_q, toy_df)
    rows = out.collect()
    # perfectly separable: every low-cluster row's median ~ low cluster
    for r in rows:
        if r["f1"] < 0:
            assert 100.0 <= r["q_0_5"] <= 104.0
        else:
            assert 1000.0 <= r["q_0_5"] <= 1006.0
    # quantiles are monotone per leaf
    for r in rows:
        assert r["q_0_1"] <= r["q_0_5"] <= r["q_0_9"]


def test_mae_metric(spark):
    df = spark.createDataFrame([(1.0, 2.0), (3.0, 1.0)], ["y", "y_pred"])
    assert abs(mlp.mae(df) - 1.5) < 1e-12


def test_tune_gbt_selects_on_validation(toy_df):
    best, metrics = mlp.tune_gbt(
        toy_df, feature_cols=["f1", "f2"], max_iter_grid=(2, 10), max_depth_grid=(2,)
    )
    assert len(metrics) == 2  # one validation MAE per grid point
    preds = mlp.predict(best, toy_df)
    assert preds.count() == 200


def test_approx_aggregates_within_tolerance(spark):
    # the documented scale escape hatches: approx_count_distinct (HLL) and
    # percentile_approx vs their exact twins
    from pyspark.sql import functions as F

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact_d"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_d"),
        F.percentile(F.col("l_extendedprice"), F.lit(0.5)).alias("exact_p50"),
        F.percentile_approx(F.col("l_extendedprice"), F.lit(0.5), F.lit(10000)).alias("approx_p50"),
    ).collect()[0]
    assert abs(row["approx_d"] - row["exact_d"]) / row["exact_d"] < 0.05
    assert abs(row["approx_p50"] - row["exact_p50"]) / row["exact_p50"] < 0.01


def test_sample_fraction_seeded(spark):
    from otokuna_spark.operators import sampling

    df = spark.range(10000)
    s1 = sampling.sample_fraction(df, 0.1, seed=123)
    s2 = sampling.sample_fraction(df, 0.1, seed=123)
    n1 = s1.count()
    assert 700 <= n1 <= 1300  # Bernoulli around 10%
    assert s1.exceptAll(s2).count() == 0  # same seed -> same sample


def test_write_metrics_json(tmp_path):
    import json

    path = str(tmp_path / "metrics.json")
    mlp.write_metrics_json({"mae_train": 7271.90, "mae_val": 7739.77}, path)
    with open(path) as f:
        got = json.load(f)
    assert got == {"mae_train": 7271.90, "mae_val": 7739.77}


# --- ONNX gate: fake session drives the real UDF body end-to-end ---------

class _FakeOnnxInput:
    name = "features"


class _FakeOnnxSession:
    """Implements the onnxruntime protocol (get_inputs()[0].name +
    run(None, {name: x})) over broadcast model bytes = float64 weights."""

    def __init__(self, model_bytes, w_scale=1.0):
        import numpy as np

        self.w = np.frombuffer(model_bytes, dtype=np.float64) * w_scale

    def get_inputs(self):
        return [_FakeOnnxInput()]

    def run(self, _, feeds):
        import numpy as np

        (x,) = feeds.values()
        return [x @ self.w.astype(np.float32)]


def test_onnx_gate_parity_passes_and_maxape_small(spark):
    import numpy as np

    from otokuna_spark.ml import onnx_infer

    w = np.array([0.5, -1.25, 2.0, 0.75])
    rows = [(i, 1.0 + i * 0.1, 2.0 - i * 0.05, 0.3 * i, 1.5) for i in range(50)]
    df = spark.createDataFrame(rows, ["row_id", "f1", "f2", "f3", "f4"])
    feature_cols = ["f1", "f2", "f3", "f4"]
    native = sum((F.col(c) * float(wi) for c, wi in zip(feature_cols, w)), F.lit(0.0))
    scored = df.withColumn("y_native", native)
    ape = onnx_infer.check_onnx_gate(
        scored,
        feature_cols,
        "y_native",
        model_bytes=w.tobytes(),
        session_factory=lambda b: _FakeOnnxSession(b),
        rtol=1e-5,
    )
    # float32 matmul vs float64 native: relative error ~1e-7, same order as
    # the reference's recorded maxAPE 3.89e-6 (ml/check_onnx.json:1)
    assert 0 <= ape < 1e-5


def test_tree_export_real_scorer_parity(spark, toy_df):
    """REAL (non-injected) scorer parity: the fitted GBT is exported to
    plain tree tuples and re-evaluated by the independent numpy routing
    scorer through the full Arrow-batched UDF path — the reference's
    ml/check_onnx.py contract with the tree export standing in for ONNX
    (onnxruntime is not installable here). tools/check_parity.py runs the
    same gate over the full synthetic-crawl pipeline and commits
    ML_PARITY.json (observed maxAPE 1.5e-15 over 4,224 rows)."""
    from otokuna_spark.ml import onnx_infer

    model, _ = mlp.train_gbt(toy_df, feature_cols=["f1", "f2"], max_iter=5)
    record = onnx_infer.check_tree_export_gate(
        model, toy_df.drop("y"), ["f1", "f2"], rtol=1e-5
    )
    assert record["max_ape"] is not None and record["max_ape"] < 1e-5
    assert record["n_rows"] == 200


def test_tree_export_scorer_is_really_driving(spark, toy_df):
    """Tamper check: corrupting one leaf prediction in the exported bytes
    must break parity — proves predictions flow from the exported
    artifact, not from anything native."""
    import pickle

    import pytest as _pytest

    from otokuna_spark.ml import onnx_infer

    model, _ = mlp.train_gbt(toy_df, feature_cols=["f1", "f2"], max_iter=5)
    blob = pickle.loads(onnx_infer.export_tree_ensemble(model))
    # scale every leaf of the first tree (first tree has weight 1.0)
    blob["trees"][0] = [
        (f, t, l, r, p * 1.5 + 10.0, leaf) if leaf else (f, t, l, r, p, leaf)
        for (f, t, l, r, p, leaf) in blob["trees"][0]
    ]
    tampered = pickle.dumps(blob)
    native = model.transform(mlp._with_numeric_features(toy_df.drop("y"), ["f1", "f2"]))
    with _pytest.raises(AssertionError, match="parity"):
        onnx_infer.check_onnx_gate(
            native,
            ["f1", "f2"],
            "y_pred",
            tampered,
            session_factory=onnx_infer.TreeEnsembleSession,
            rtol=1e-5,
        )


def test_onnx_gate_fails_on_broken_parity(spark):
    import numpy as np
    import pytest as _pytest

    from otokuna_spark.ml import onnx_infer

    w = np.array([0.5, -1.25, 2.0, 0.75])
    rows = [(i, 1.0 + i * 0.1, 2.0 - i * 0.05, 0.3 * i, 1.5) for i in range(20)]
    df = spark.createDataFrame(rows, ["row_id", "f1", "f2", "f3", "f4"])
    feature_cols = ["f1", "f2", "f3", "f4"]
    native = sum((F.col(c) * float(wi) for c, wi in zip(feature_cols, w)), F.lit(0.0))
    scored = df.withColumn("y_native", native)
    with _pytest.raises(AssertionError, match="parity"):
        onnx_infer.check_onnx_gate(
            scored,
            feature_cols,
            "y_native",
            model_bytes=w.tobytes(),
            session_factory=lambda b: _FakeOnnxSession(b, w_scale=1.001),
            rtol=1e-5,
        )


def test_nb_quality_scores_separates_vocabularies(spark):
    from pyspark.sql import functions as F

    from otokuna_spark.functions import text as T
    from otokuna_spark.ml.nb import nb_quality_scores

    good = "clear concise prose with varied informative vocabulary and structure"
    bad = "buy cheap now click here buy cheap now click here buy buy"
    rows = [(i, good + f" extra{i % 3}", 1) for i in range(20)] + [
        (100 + i, bad + f" spam{i % 3}", 0) for i in range(20)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "y"])
    train = df.where(F.col("doc_id") % 4 != 0)
    test = df.where(F.col("doc_id") % 4 == 0)
    scored = nb_quality_scores(
        train, test, F.col("y") == 1, "doc_id", T.tokens(F.col("text"))
    ).collect()
    truth = {r["doc_id"]: r["y"] for r in df.collect()}
    assert len(scored) == test.count()
    assert all(r["pred"] == truth[r["doc_id"]] for r in scored), "held-out misclassification"
    # scores are signed log-odds: positives strictly above negatives
    pos = [r["score_unat"] for r in scored if truth[r["doc_id"]] == 1]
    neg = [r["score_unat"] for r in scored if truth[r["doc_id"]] == 0]
    assert min(pos) > max(neg)
