"""Orchestration shell (SURVEY.md §3.2, §7 step 6) — one driver program
replacing the Step Functions state machine (svc/serverless.yml:111-197).

The reference threads a mutable event dict through five Lambdas, accreting
keys (base_path, raw_data_key, scraped_data_key, prediction_data_key;
svc/generate_base_path.py:7-34). Here the same manifest contract is kept —
each stage returns the manifest with its key added and its output
checkpointed as Parquet — but the stages share ONE SparkSession and, when
``checkpoints=False``, collapse into a single lazy DAG (the reference's S3
pickle hops become nothing at all).

Checkpointed mode restores the reference's restartability: a failed stage
rerun picks up the previous stage's Parquet instead of recrawling.
"""

from __future__ import annotations

import json
import os
import time as _time

from pyspark.sql import DataFrame, SparkSession

from ..io import write_parquet
from . import pipeline


def generate_base_path(root: str, timestamp: float | None = None) -> dict:
    """Stage 1 (generate_base_path.main_daily): stamp the job manifest."""
    ts = timestamp if timestamp is not None else _time.time()
    day = _time.strftime("%Y-%m-%d", _time.gmtime(ts))
    return {
        "timestamp": ts,
        "date": day,
        "base_path": os.path.join(root, day),
    }


def scrape_stage(
    spark: SparkSession,
    manifest: dict,
    pages_path: str,
    checkpoints: bool = True,
) -> tuple[dict, DataFrame]:
    """Stages 2-4 (dump is external; zip subsumed by the distributed read):
    pages -> properties projection. Adds scraped_data_key."""
    from ..sources.html import read_raw_pages

    props = pipeline.make_properties_df(
        read_raw_pages(spark, pages_path), html_file_fetched_at=manifest["timestamp"]
    )
    manifest = dict(manifest, raw_data_key=pages_path)
    if checkpoints:
        key = os.path.join(manifest["base_path"], "scraped.parquet")
        write_parquet(props, key)
        props = spark.read.parquet(key)
        manifest["scraped_data_key"] = key
    return manifest, props


def predict_stage(
    spark: SparkSession,
    manifest: dict,
    scraped: DataFrame,
    location_ref: DataFrame | None,
    model=None,
    checkpoints: bool = True,
) -> tuple[dict, DataFrame]:
    """Stage 5 (svc/predict.py): enrich -> clean -> score. Adds
    prediction_data_key. Without a model, y_pred falls back to a
    deterministic placeholder so the serving contract is exercised."""
    from pyspark.sql import functions as F

    enriched = scraped
    if location_ref is not None:
        enriched = pipeline.add_address_coords(enriched, location_ref)
    cleaned = pipeline.clean_df(pipeline.add_target_variable(enriched))
    if model is not None:
        from ..ml.pipeline import predict as ml_predict

        preds = ml_predict(model, cleaned)
    else:
        preds = cleaned.select("jnc_id", "y", (F.col("y") * F.lit(1.0)).alias("y_pred"))
    if checkpoints:
        key = os.path.join(manifest["base_path"], "prediction.parquet")
        write_parquet(preds, key)
        preds = spark.read.parquet(key)
        manifest = dict(manifest, prediction_data_key=key)
    return manifest, preds


def run_daily(
    spark: SparkSession,
    pages_path: str,
    root: str,
    location_ref: DataFrame | None = None,
    model=None,
    serving_path: str | None = None,
    timestamp: float | None = None,
    checkpoints: bool = True,
) -> dict:
    """The full daily machine: manifest -> scrape -> predict -> serve.
    Returns the final manifest (the reference's event dict) and writes it
    as job_info JSON next to the outputs."""
    manifest = generate_base_path(root, timestamp)
    manifest, scraped = scrape_stage(spark, manifest, pages_path, checkpoints)
    manifest, preds = predict_stage(spark, manifest, scraped, location_ref, model, checkpoints)
    if serving_path:
        from . import serving as serving_mod

        cleaned = pipeline.clean_df(
            pipeline.add_target_variable(
                pipeline.add_address_coords(scraped, location_ref) if location_ref is not None else scraped
            )
        )
        serving_mod.materialize_serving_table(preds, cleaned.drop("y"), serving_path, manifest["date"])
        manifest = dict(manifest, serving_key=serving_path)
    os.makedirs(manifest["base_path"], exist_ok=True)
    with open(os.path.join(manifest["base_path"], "job_info.json"), "w") as f:
        json.dump(manifest, f, sort_keys=True)
    return manifest
