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


def _tree_mtimes(path):
    return {
        os.path.join(r, f): os.stat(os.path.join(r, f)).st_mtime_ns
        for r, _dirs, fs in os.walk(path)
        for f in fs
    }


def test_run_daily_dvc_stage_skip(spark, tmp_path):
    # DVC-lock semantics (reference ml/dvc.yaml): a second run over
    # unchanged inputs skips scrape AND predict, serving the previous
    # Parquet checkpoints untouched; touching one input page busts the
    # scrape cache and cascades into a predict recompute.
    pages = _write_pages(tmp_path)
    root = str(tmp_path / "jobs3")
    ts = 1625356800.0

    m1 = orchestrate.run_daily(spark, pages, root, timestamp=ts)
    assert "scrape_cached" not in m1 and "predict_cached" not in m1
    scraped_before = _tree_mtimes(m1["scraped_data_key"])
    preds_before = _tree_mtimes(m1["prediction_data_key"])
    assert scraped_before and preds_before

    m2 = orchestrate.run_daily(spark, pages, root, timestamp=ts)
    assert m2.get("scrape_cached") is True
    assert m2.get("predict_cached") is True
    assert _tree_mtimes(m2["scraped_data_key"]) == scraped_before
    assert _tree_mtimes(m2["prediction_data_key"]) == preds_before
    assert spark.read.parquet(m2["prediction_data_key"]).count() > 0

    # bust: bump one page's mtime (content unchanged is irrelevant — the
    # fingerprint is listing-metadata by design, see _tree_fingerprint)
    page_file = os.path.join(pages, sorted(os.listdir(pages))[0])
    st = os.stat(page_file)
    os.utime(page_file, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))

    m3 = orchestrate.run_daily(spark, pages, root, timestamp=ts)
    assert "scrape_cached" not in m3
    assert "predict_cached" not in m3
    assert _tree_mtimes(m3["scraped_data_key"]) != scraped_before
