"""Measured shuffle-volume evidence -> SHUFFLE.json.

Counting Exchange nodes (explain_audit.py) says a shuffle EXISTS;
this tool records how many BYTES actually move, per representative
query, from the SQL status store's node metrics: parquet bytes read,
shuffle bytes written, spill. The 100 TB claim each row backs:
map-side combine / broadcast / pushdown keep the shuffled volume a
small fraction of the input scanned — a query whose shuffle bytes
track its input bytes would be flagged here long before it dies on a
real cluster.
"""

from __future__ import annotations

import json
import re
import sys

sys.path.insert(0, ".")

from otokuna_spark.plans.queries import REGISTRY  # noqa: E402
from otokuna_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"

CASES = [
    "q01_pricing_summary",      # map-side combine: agg state, not rows
    "q05_region_revenue",       # dims broadcast: only the fact agg moves
    "q08_score_topk",           # TakeOrdered: k rows per partition
    "q20_exact_dedup",          # hash-groupBy over doc hashes
    "q22_minhash_lsh_pairs",    # signatures move, never text
    "q67_rolling_window",       # keyed window: one keyed exchange
    "q90_unigram_likelihood",   # vocab join back, corpus regroup
    "q122_segment_dedup",       # segment df agg + reassembly
    "q127_normalize_text",      # pure map: expect ~0 shuffle
    "q132_source_divergence",   # one corpus agg; vocab-sized tails
]

_UNIT = {"B": 1, "KiB": 2**10, "MiB": 2**20, "GiB": 2**30, "TiB": 2**40}


def parse_bytes(s: str) -> int | None:
    """First 'N.N Unit' occurrence in a metric value string ('total (min,
    med, max)' variants lead with the total)."""
    m = re.search(r"([\d.]+)\s*(B|KiB|MiB|GiB|TiB)", s)
    if not m:
        return None
    return int(float(m.group(1)) * _UNIT[m.group(2)])


def collect_metrics(spark, before_id: int) -> dict[str, int]:
    store = spark._jsparkSession.sharedState().statusStore()
    execs = store.executionsList()
    sums = {"input_bytes": 0, "shuffle_bytes_written": 0, "spill_bytes": 0}
    for i in range(execs.size()):
        e = execs.apply(i)
        if e.executionId() <= before_id:
            continue
        mets = store.executionMetrics(e.executionId())
        it = e.metrics().iterator()
        while it.hasNext():
            m = it.next()
            v = mets.get(m.accumulatorId())
            if not v.isDefined():
                continue
            name, val = m.name(), v.get()
            if name == "size of files read":
                b = parse_bytes(val)
                sums["input_bytes"] += b or 0
            elif name == "shuffle bytes written":
                b = parse_bytes(val)
                sums["shuffle_bytes_written"] += b or 0
            elif name == "spill size":
                b = parse_bytes(val)
                sums["spill_bytes"] += b or 0
    return sums


def last_execution_id(spark) -> int:
    store = spark._jsparkSession.sharedState().statusStore()
    execs = store.executionsList()
    return execs.apply(execs.size() - 1).executionId() if execs.size() else -1


def main() -> None:
    spark = get_spark("shuffle-audit")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in CASES:
        before = last_execution_id(spark)
        spark.catalog.clearCache()
        REGISTRY[name].fn(spark, SF_DIR).collect()
        s = collect_metrics(spark, before)
        ratio = (
            round(s["shuffle_bytes_written"] / s["input_bytes"], 4)
            if s["input_bytes"]
            else None
        )
        out[name] = {**s, "shuffle_to_input_ratio": ratio}
    doc = {"metric": "shuffle_bytes_vs_input", "sf_dir": SF_DIR, "queries": out}
    with open("SHUFFLE.json", "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc, indent=1))


if __name__ == "__main__":
    main()
