"""M4 — portable batch inference + parity checking.

The reference exports CatBoost to ONNX and scores with onnxruntime over a
float32 matrix (svc/predict.py:40-42), then gates parity at rtol 1e-5
(ml/check_onnx.py, observed maxAPE 3.89e-6). Spark-native equivalents:

- ``onnx_predict_udf``: an Arrow-batched pandas UDF wrapping an
  onnxruntime session — the model-portability path when the trainer is
  not MLlib. onnxruntime is NOT in this container, so construction is
  gated behind an import-try; the UDF plumbing (broadcast model bytes,
  float32 matrix assembly, batch scoring) is real.
- ``max_ape``: the A4 parity metric (max |a-b| / |a|) as one aggregation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def max_ape(df: DataFrame, a: str, b: str) -> float:
    """A4 — max absolute percentage error between two prediction columns
    (ml/check_onnx.py's maxAPE)."""
    return df.agg(F.max(F.abs((F.col(a) - F.col(b)) / F.col(a)))).collect()[0][0]


def assert_parity(df: DataFrame, a: str, b: str, rtol: float = 1e-5) -> float:
    ape = max_ape(df, a, b)
    if ape is None or ape > rtol:
        raise AssertionError(f"prediction parity failed: maxAPE {ape} > rtol {rtol}")
    return ape


def onnx_predict_udf(
    spark: SparkSession, model_bytes: bytes, feature_cols: list[str], session_factory=None
):
    """Build a pandas_udf scoring with onnxruntime over float32 features.

    The model bytes are broadcast once per executor; each Arrow batch is
    assembled into an (n, d) float32 matrix and scored in one session run
    — no per-row Python.

    ``session_factory(model_bytes) -> session`` defaults to a real
    ``onnxruntime.InferenceSession`` (import-gated: onnxruntime is absent
    in this container). Tests inject a fake session implementing the same
    protocol (``get_inputs()[0].name`` + ``run(None, {name: x})``), which
    drives the ENTIRE UDF body — broadcast, input-name discovery, float32
    assembly, batch scoring, reshape — end-to-end (test_ml.py).
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    if session_factory is None:
        import onnxruntime  # gate: not available in this container

        def session_factory(b: bytes):
            return onnxruntime.InferenceSession(b)

    bc = spark.sparkContext.broadcast(model_bytes)

    @pandas_udf("double")
    def predict(it: Iterator[pd.DataFrame]) -> Iterator[pd.Series]:
        sess = session_factory(bc.value)
        input_name = sess.get_inputs()[0].name
        for pdf in it:
            x = pdf[feature_cols].to_numpy(dtype=np.float32)
            (out,) = sess.run(None, {input_name: x})
            yield pd.Series(out.reshape(-1).astype(float))

    return predict


def check_onnx_gate(
    df: DataFrame,
    feature_cols: list[str],
    native_col: str,
    model_bytes: bytes,
    session_factory=None,
    rtol: float = 1e-5,
) -> float:
    """The reference's ml/check_onnx.py contract: score the same rows
    through the ONNX path and the native path, gate on maxAPE <= rtol
    (reference records maxAPE 3.89e-6 in ml/check_onnx.json:1). Returns
    the observed maxAPE; raises AssertionError on breach."""
    udf = onnx_predict_udf(df.sparkSession, model_bytes, feature_cols, session_factory)
    scored = df.withColumn(
        "__onnx_pred", udf(F.struct(*[F.col(c) for c in feature_cols]))
    )
    return assert_parity(scored, native_col, "__onnx_pred", rtol)


# --------------------------------------------------------------------
# Real (non-injected) scorer: MLlib tree ensemble -> plain tuples -> numpy
# --------------------------------------------------------------------
# onnxruntime is not installable in this container, so the portable-scorer
# parity gate (reference ml/check_onnx.py: real session, maxAPE 3.89e-6)
# is realized with a different REAL serialization round-trip: the fitted
# GBT's trees are exported to picklable tuples and re-evaluated by an
# independent numpy routing implementation behind the same session
# protocol. Nothing from model.transform leaks into the scorer — parity
# is earned, not injected.


def export_tree_ensemble(model) -> bytes:
    """Serialize a fitted MLlib tree ensemble (GBTRegressionModel, or a
    PipelineModel whose last stage is one) to plain tuples:

    ``{"trees": [[(feat, thr, left, right, pred, is_leaf), ...], ...],
    "weights": [...]}`` pickled — the same role as the reference's ONNX
    export (ml/export ONNX in svc/predict.py:40-42): a model artifact a
    scorer with no MLlib dependency can evaluate.

    Only continuous splits are supported (categorical features are
    one-hot/numeric throughout this repo); a CategoricalSplit raises.
    """
    import pickle

    if hasattr(model, "stages"):
        model = model.stages[-1]
    trees = []
    for t in model.trees:
        nodes: list[tuple] = []

        def walk(jnode) -> int:
            i = len(nodes)
            nodes.append(())
            cls = jnode.getClass().getSimpleName()
            if cls == "InternalNode":
                split = jnode.split()
                if split.getClass().getSimpleName() != "ContinuousSplit":
                    raise NotImplementedError(
                        f"only continuous splits are exportable, got {split.getClass()}"
                    )
                feat = int(split.featureIndex())
                thr = float(split.threshold())
                left = walk(jnode.leftChild())
                right = walk(jnode.rightChild())
                nodes[i] = (feat, thr, left, right, 0.0, False)
            else:
                nodes[i] = (-1, 0.0, -1, -1, float(jnode.prediction()), True)
            return i

        walk(t._call_java("rootNode"))
        trees.append(nodes)
    return pickle.dumps(
        {
            "format": "mllib-tree-tuples-v1",
            "trees": trees,
            "weights": [float(w) for w in model.treeWeights],
        }
    )


class _TreeInput:
    name = "features"


class TreeEnsembleSession:
    """A real scorer with the onnxruntime session protocol
    (``get_inputs()[0].name`` + ``run(None, {name: x}) -> [vector]``):
    evaluates exported tree tuples by vectorized numpy node routing.

    Per tree: every row starts at the root; each pass routes all rows at
    internal nodes one level down (``x[:, feat] <= thr`` -> left, MLlib's
    ContinuousSplit.shouldGoLeft rule) until all rows sit at leaves —
    depth passes, each an O(batch) gather, no per-row Python. The ensemble
    output is the tree-weight dot product, exactly GBT's prediction rule.
    """

    def __init__(self, model_bytes: bytes):
        import pickle

        import numpy as np

        m = pickle.loads(model_bytes)
        if m.get("format") != "mllib-tree-tuples-v1":
            raise ValueError(f"unknown model format {m.get('format')!r}")
        self._trees = []
        for nodes in m["trees"]:
            feat = np.array([n[0] for n in nodes], dtype=np.int64)
            thr = np.array([n[1] for n in nodes], dtype=np.float64)
            left = np.array([n[2] for n in nodes], dtype=np.int64)
            right = np.array([n[3] for n in nodes], dtype=np.int64)
            pred = np.array([n[4] for n in nodes], dtype=np.float64)
            leaf = np.array([n[5] for n in nodes], dtype=bool)
            self._trees.append((feat, thr, left, right, pred, leaf))
        self._weights = np.asarray(m["weights"], dtype=np.float64)

    def get_inputs(self):
        return [_TreeInput()]

    def run(self, _output_names, feeds):
        import numpy as np

        (x,) = feeds.values()
        x = np.asarray(x, dtype=np.float64)
        total = np.zeros(len(x), dtype=np.float64)
        for w, (feat, thr, left, right, pred, leaf) in zip(self._weights, self._trees):
            idx = np.zeros(len(x), dtype=np.int64)
            active = ~leaf[idx]
            while active.any():
                ai = idx[active]
                xa = x[active]
                go_left = xa[np.arange(len(ai)), feat[ai]] <= thr[ai]
                idx[active] = np.where(go_left, left[ai], right[ai])
                active = ~leaf[idx]
            total += w * pred[idx]
        return [total]


def check_tree_export_gate(
    model, df: DataFrame, feature_cols: list[str], rtol: float = 1e-5
) -> dict:
    """End-to-end real-scorer parity (the reference ml/check_onnx.py
    contract with the tree-tuple scorer standing in for onnxruntime):
    score ``df`` natively with ``model.transform`` AND through
    export_tree_ensemble -> TreeEnsembleSession inside the batch-scoring
    UDF, then gate maxAPE <= rtol. Returns the parity record (the shape
    of the reference's ml/check_onnx.json)."""
    native = model.transform(df)
    model_bytes = export_tree_ensemble(model)
    ape = check_onnx_gate(
        native,
        feature_cols,
        "y_pred",
        model_bytes,
        session_factory=TreeEnsembleSession,
        rtol=rtol,
    )
    return {
        "max_ape": ape,
        "rtol": rtol,
        "n_rows": native.count(),
        "scorer": "export_tree_ensemble -> TreeEnsembleSession (real numpy scorer)",
    }


def assemble_float32_batches(df: DataFrame, feature_cols: list[str], score_fn) -> DataFrame:
    """The UDF-independent plumbing: struct-pack features, Arrow-batch
    through mapInPandas, score with ``score_fn(matrix) -> vector``.
    Used by tests with a deterministic fake scorer."""
    import numpy as np
    from pyspark.sql import types as sty

    schema = sty.StructType(
        [sty.StructField("row_id", sty.LongType()), sty.StructField("y_pred", sty.DoubleType())]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            x = pdf[feature_cols].to_numpy(dtype=np.float32)
            yield pd.DataFrame({"row_id": pdf["row_id"], "y_pred": score_fn(x).astype(float)})

    return df.mapInPandas(batches, schema=schema)
