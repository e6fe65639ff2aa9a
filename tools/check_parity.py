"""Real-scorer parity artifact — the reference's ml/check_onnx.py twin.

The reference exports CatBoost to ONNX and gates a REAL onnxruntime
session against the native scorer at rtol 1e-5 (ml/check_onnx.py;
recorded maxAPE 3.89e-6 in ml/check_onnx.json:1). onnxruntime is not
installable in this container, so the equivalent real round-trip here is:

    fit MLlib GBT on the synthetic crawl's cleaned properties
    -> export_tree_ensemble (plain tuples, no MLlib dependency)
    -> TreeEnsembleSession (independent numpy scorer) inside the
       Arrow-batched scoring UDF
    -> maxAPE vs model.transform, gated at rtol 1e-5

Nothing injected: the scorer re-derives every prediction from the
exported artifact. Writes ML_PARITY.json at the repo root.

Run: python tools/check_parity.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from otokuna_spark.ml import onnx_infer  # noqa: E402
from otokuna_spark.ml import pipeline as mlp  # noqa: E402
from otokuna_spark.plans.pipeline import FEATURE_COLS, scrape_pipeline  # noqa: E402
from otokuna_spark.session import get_spark  # noqa: E402
from otokuna_spark.sources.synth import generate_crawl  # noqa: E402

# no synthetic geocode dim in this flow -> train on the 13 non-coordinate
# features; parity is about scorer equivalence, not model quality
PARITY_FEATURES = [c for c in FEATURE_COLS if c not in ("latitude", "longitude")]


def main() -> int:
    spark = get_spark("parity-gate")
    spark.sparkContext.setLogLevel("ERROR")
    crawl_dir = tempfile.mkdtemp(prefix="otokuna_parity_")
    try:
        generate_crawl(crawl_dir, n_pages=100, rooms_per_page=50)
        cleaned = scrape_pipeline(spark, crawl_dir)
        model, _ = mlp.train_gbt(cleaned, feature_cols=PARITY_FEATURES, max_iter=20)
        scoring_input = mlp._with_numeric_features(cleaned, PARITY_FEATURES)
        record = onnx_infer.check_tree_export_gate(
            model, scoring_input, PARITY_FEATURES, rtol=1e-5
        )
    finally:
        shutil.rmtree(crawl_dir, ignore_errors=True)
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "ML_PARITY.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps(record))
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
