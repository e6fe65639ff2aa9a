"""Orchestration shell test: the daily machine's manifest/checkpoint
contract (SURVEY §3.2) end to end."""

from __future__ import annotations

import json
import os

from otokuna_spark.plans import orchestrate
from otokuna_spark.sources.location import read_location_reference

from .fixtures import write_location_csv
from .test_pipeline import _write_pages


def test_run_daily_manifest_and_checkpoints(spark, tmp_path):
    pages = _write_pages(tmp_path)
    loc_csv = str(tmp_path / "loc.csv")
    write_location_csv(loc_csv)
    loc = read_location_reference(spark, loc_csv)
    root = str(tmp_path / "jobs")
    serving = str(tmp_path / "serving")

    manifest = orchestrate.run_daily(
        spark, pages, root, location_ref=loc, serving_path=serving, timestamp=1625356800.0
    )
    # the reference's event-dict contract: accreted keys
    assert manifest["date"] == "2021-07-04"
    for key in ("base_path", "raw_data_key", "scraped_data_key", "prediction_data_key", "serving_key"):
        assert key in manifest, key

    # checkpoints are readable parquet (restartability contract)
    scraped = spark.read.parquet(manifest["scraped_data_key"])
    assert scraped.count() == 5
    preds = spark.read.parquet(manifest["prediction_data_key"])
    assert set(preds.columns) == {"jnc_id", "y", "y_pred"}

    # serving partition materialized for the day
    served = spark.read.parquet(serving)
    assert served.filter(served.otokuna_score.isNotNull()).count() > 0

    # job_info.json persisted with the manifest
    with open(os.path.join(manifest["base_path"], "job_info.json")) as f:
        assert json.load(f)["date"] == "2021-07-04"


def test_run_daily_pipelined_mode(spark, tmp_path):
    # checkpoints=False collapses the stages into one lazy DAG
    pages = _write_pages(tmp_path)
    root = str(tmp_path / "jobs2")
    manifest = orchestrate.run_daily(spark, pages, root, checkpoints=False, timestamp=1625356800.0)
    assert "scraped_data_key" not in manifest  # nothing materialized between stages
    assert os.path.exists(os.path.join(manifest["base_path"], "job_info.json"))
