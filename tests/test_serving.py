"""Serving layer + ONNX-path plumbing tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from otokuna_spark.ml import onnx_infer
from otokuna_spark.plans import serving


def test_job_info_roundtrip_and_listing(spark, tmp_path):
    path = str(tmp_path / "jobs")
    recs = [
        dict(job_id="j2", user_id="u1", timestamp=2.0, search_url="s", search_conditions="c",
             raw_data_key="r", scraped_data_key="s2", prediction_data_key="p"),
        dict(job_id="j1", user_id="u0", timestamp=1.0, search_url="s", search_conditions="c",
             raw_data_key="r", scraped_data_key="s2", prediction_data_key="p"),
        dict(job_id="j3", user_id="u0", timestamp=2.0, search_url="s", search_conditions="c",
             raw_data_key="r", scraped_data_key="s2", prediction_data_key="p"),
    ]
    serving.write_job_info(spark, recs, path)
    jobs = serving.list_jobs(spark, path).collect()
    # O3: sorted by (timestamp, user_id)
    assert [j["job_id"] for j in jobs] == ["j1", "j3", "j2"]


def test_materialized_serving_and_date_discovery(spark, tmp_path):
    path = str(tmp_path / "serving")
    scraped = spark.createDataFrame([("a", 10.0), ("b", 20.0)], ["jnc_id", "area"])
    for date, preds in [
        ("2021-07-04", [("a", 100.0, 120.0), ("b", 200.0, 190.0)]),
        ("2021-07-05", [("a", 100.0, 90.0)]),
    ]:
        pdf = spark.createDataFrame(preds, ["jnc_id", "y", "y_pred"])
        serving.materialize_serving_table(pdf, scraped, path, date)
    assert serving.available_dates(spark, path) == ["2021-07-04", "2021-07-05"]
    view = serving.serving_view(spark, path, "2021-07-04")
    rows = view.orderBy(F.desc("otokuna_score")).collect()
    assert [r["jnc_id"] for r in rows] == ["a", "b"]
    # ad-hoc SQL surface over the registered view
    n = spark.sql("SELECT count(*) AS n FROM serving WHERE otokuna_score > 1").collect()[0]["n"]
    assert n == 1


def test_onnx_gate_and_parity_metric(spark):
    with pytest.raises(ImportError):
        onnx_infer.onnx_predict_udf(spark, b"model", ["f1"])
    df = spark.createDataFrame([(100.0, 100.0001), (200.0, 199.9999)], ["a", "b"])
    ape = onnx_infer.max_ape(df, "a", "b")
    assert ape == pytest.approx(1e-6, rel=0.2)
    onnx_infer.assert_parity(df, "a", "b", rtol=1e-5)
    bad = spark.createDataFrame([(100.0, 150.0)], ["a", "b"])
    with pytest.raises(AssertionError):
        onnx_infer.assert_parity(bad, "a", "b")


def test_float32_batch_plumbing(spark):
    import numpy as np

    df = spark.range(100).select(
        F.col("id").alias("row_id"),
        (F.col("id") * 1.0).alias("f1"),
        (F.col("id") * 2.0).alias("f2"),
    )
    out = onnx_infer.assemble_float32_batches(df, ["f1", "f2"], lambda x: np.asarray(x).sum(axis=1))
    rows = {r["row_id"]: r["y_pred"] for r in out.collect()}
    assert rows[10] == pytest.approx(30.0)
    assert len(rows) == 100
