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

import hashlib
import json
import os
import time as _time

from pyspark.sql import DataFrame, SparkSession

from ..io import write_parquet
from . import pipeline


def _tree_fingerprint(path: str, params: tuple = ()) -> str:
    """Content fingerprint of an input tree, DVC-lock style (reference
    ml/dvc.yaml + dvc.lock pin each stage to md5s of its deps).

    Deliberately listing-only — md5 over sorted ``(relpath, size,
    mtime_ns)`` — not file contents: DVC re-reads every dep to hash it,
    which at 100 TB means a full extra pass over the corpus per run. The
    (size, mtime) pair is the object-store analogue (S3 LIST returns
    ETag/Size/LastModified with no GETs). ``params`` folds stage
    parameters into the hash so a param change busts the cache.
    """
    h = hashlib.md5()
    for p in params:
        h.update(repr(p).encode())
        h.update(b"\x00")
    if os.path.isfile(path):
        st = os.stat(path)
        h.update(f"{os.path.basename(path)}:{st.st_size}:{st.st_mtime_ns}".encode())
    else:
        for root_, _dirs, files in sorted(os.walk(path)):
            for name in sorted(files):
                fp = os.path.join(root_, name)
                st = os.stat(fp)
                rel = os.path.relpath(fp, path)
                h.update(f"{rel}:{st.st_size}:{st.st_mtime_ns}".encode())
                h.update(b"\x00")
    return h.hexdigest()


def _stage_cached(lock_path: str, fingerprint: str, out_key: str) -> bool:
    """A stage may be skipped iff its lock matches the current input
    fingerprint AND the checkpoint it points at is a complete write
    (_SUCCESS marker — a crash mid-write leaves no marker, so a torn
    checkpoint is recomputed, never served)."""
    try:
        with open(lock_path) as f:
            lock = json.load(f)
    except (OSError, ValueError):
        return False
    return lock.get("input_fingerprint") == fingerprint and os.path.exists(
        os.path.join(out_key, "_SUCCESS")
    )


def _write_lock(lock_path: str, fingerprint: str, out_key: str) -> None:
    with open(lock_path, "w") as f:
        json.dump({"input_fingerprint": fingerprint, "output": out_key}, f, sort_keys=True)


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
    pages -> properties projection. Adds scraped_data_key.

    In checkpointed mode the stage is skipped DVC-style when the pages
    tree and the stage params are unchanged since the recorded lock
    (reference: ml/dvc.yaml `scrape` stage deps) — the previous Parquet
    checkpoint is served instead and ``scrape_cached`` is set."""
    from ..sources.html import read_raw_pages

    manifest = dict(manifest, raw_data_key=pages_path)
    if checkpoints:
        key = os.path.join(manifest["base_path"], "scraped.parquet")
        lock = key + ".lock.json"
        fp = _tree_fingerprint(pages_path, params=("scrape", manifest["timestamp"]))
        manifest["scraped_data_key"] = key
        if _stage_cached(lock, fp, key):
            manifest["scrape_cached"] = True
            return manifest, spark.read.parquet(key)
        props = pipeline.make_properties_df(
            read_raw_pages(spark, pages_path), html_file_fetched_at=manifest["timestamp"]
        )
        write_parquet(props, key)
        _write_lock(lock, fp, key)
        return manifest, spark.read.parquet(key)
    props = pipeline.make_properties_df(
        read_raw_pages(spark, pages_path), html_file_fetched_at=manifest["timestamp"]
    )
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
    deterministic placeholder so the serving contract is exercised.

    Skipped DVC-style when the upstream scrape checkpoint is unchanged
    (its Parquet tree fingerprint matches the lock). Model / location-ref
    CONTENTS are not fingerprinted (they are live objects, not files) —
    only their presence is a param; swapping the model object requires
    deleting the lock, as documented here."""
    from pyspark.sql import functions as F

    fp = None
    if checkpoints and "scraped_data_key" in manifest:
        key = os.path.join(manifest["base_path"], "prediction.parquet")
        fp = _tree_fingerprint(
            manifest["scraped_data_key"],
            params=("predict", model is not None, location_ref is not None),
        )
        if _stage_cached(key + ".lock.json", fp, key):
            manifest = dict(manifest, prediction_data_key=key, predict_cached=True)
            return manifest, spark.read.parquet(key)

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
        if fp is not None:
            _write_lock(key + ".lock.json", fp, key)
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
