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
