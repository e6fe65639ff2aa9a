"""Property-based tests (hypothesis): the distributed operators against
brute-force reference implementations on randomized inputs.

Each property is deliberately small (bounded example counts, tiny
frames) — the point is adversarial STRUCTURE (ties, duplicates, empty
groups, skewed multiplicities, touching intervals), not volume; the
volume path is covered by the sf0.01/sf0.1 oracle sweeps.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

PROP = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@PROP
@given(
    st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=120),
    st.integers(min_value=2, max_value=6),
)
def test_heavy_hitters_equals_bruteforce(spark, values, k):
    from otokuna_spark.operators import frequency

    df = spark.createDataFrame([(v,) for v in values], ["v"]).repartition(3)
    got = {r["item"]: r["cnt"] for r in frequency.heavy_hitters(df, "v", k=k).collect()}
    n = len(values)
    counts: dict[str, int] = {}
    for v in values:
        counts[v] = counts.get(v, 0) + 1
    expect = {v: c for v, c in counts.items() if c * k > n}
    assert got == expect


@PROP
@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)), min_size=1, max_size=40
    )
)
def test_pareto_frontier_equals_bruteforce(spark, pts):
    from otokuna_spark.operators import pareto

    rows = [(i, a, b) for i, (a, b) in enumerate(pts)]
    df = spark.createDataFrame(rows, ["id", "size", "price"]).repartition(3)
    got = sorted(r["id"] for r in pareto.pareto_frontier(df, ["size"], ["price"]).collect())

    def dominated(i, a, b):
        return any(
            (a2 >= a and b2 <= b and (a2 > a or b2 < b))
            for j, (a2, b2) in enumerate(pts)
            if j != i
        )

    expect = sorted(i for i, (a, b) in enumerate(pts) if not dominated(i, a, b))
    assert got == expect


@PROP
@given(
    st.lists(
        st.tuples(st.integers(0, 60), st.integers(0, 25)), min_size=1, max_size=25
    ),
    st.integers(min_value=3, max_value=17),
)
def test_interval_overlap_equals_bruteforce(spark, raw, width):
    from otokuna_spark.operators import intervals

    iv = [(i, s, s + d) for i, (s, d) in enumerate(raw)]
    df = spark.createDataFrame(iv, ["iid", "s", "e"]).repartition(3)
    rows = intervals.overlap_pairs(df, "iid", "s", "e", bucket_width=width).collect()
    got = {(r["id_a"], r["id_b"]): (r["overlap_start"], r["overlap_end"]) for r in rows}
    assert len(rows) == len(got), "bucket dedup emitted a pair twice"
    expect = {}
    for i, (ia, sa, ea) in enumerate(iv):
        for ib, sb, eb in iv[i + 1:]:
            if sa <= eb and sb <= ea:
                expect[(ia, ib)] = (max(sa, sb), min(ea, eb))
    assert got == expect


@PROP
@given(
    st.lists(
        st.tuples(st.sampled_from("xyz"), st.integers(-50, 50)), min_size=1, max_size=40
    ),
    st.integers(min_value=1, max_value=39),
)
def test_incremental_merge_equals_full_agg(spark, rows, cut):
    from otokuna_spark.operators import incremental

    measures = {"n": ("count", "*"), "s": ("sum", "v"), "lo": ("min", "v"), "hi": ("max", "v")}
    cut = min(cut, len(rows))
    df = spark.createDataFrame(rows, ["k", "v"])
    full = {
        r["k"]: (r["n"], r["s"], r["lo"], r["hi"])
        for r in incremental.aggregate_state(df, ["k"], measures).collect()
    }
    a = spark.createDataFrame(rows[:cut], "k STRING, v BIGINT")
    b = spark.createDataFrame(rows[cut:], "k STRING, v BIGINT") if rows[cut:] else None
    state = incremental.aggregate_state(a, ["k"], measures)
    merged = state if b is None else incremental.incremental_update(state, b, ["k"], measures)
    got = {r["k"]: (r["n"], r["s"], r["lo"], r["hi"]) for r in merged.collect()}
    assert got == full


@PROP
@given(
    st.sets(
        st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=15,
    )
)
def test_pagerank_equals_integer_reference(spark, raw_edges):
    from otokuna_spark.operators import graph
    from tests.test_operators import _pagerank_reference

    edges = sorted({(min(a, b), max(a, b)) for a, b in raw_edges})
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {r["node"]: r["rank_ppt"] for r in graph.pagerank_ppt(df, iterations=2).collect()}
    assert got == _pagerank_reference(edges, iterations=2)


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", categories=("L", "N", "P", "Z", "Cc")
            ),
            max_size=60,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_normalize_text_idempotent_and_canonical(spark, texts):
    """normalize(normalize(x)) == normalize(x) for arbitrary unicode, and
    the output never contains control chars, double spaces, uppercase
    ASCII, or full-width ASCII."""
    import re

    from pyspark.sql import functions as F

    from otokuna_spark.functions.text import normalize_text

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, s string")
    out = df.select(
        "i",
        normalize_text(F.col("s")).alias("once"),
        normalize_text(normalize_text(F.col("s"))).alias("twice"),
    ).collect()
    for r in out:
        assert r["once"] == r["twice"]
        assert not re.search(r"[\x00-\x1f\x7f]", r["once"])
        assert "  " not in r["once"]
        assert not re.search(r"[A-Z]", r["once"])
        assert not re.search(r"[！-～　]", r["once"])
        assert r["once"] == r["once"].strip()


def test_segment_dedup_identity_when_nothing_hot(spark):
    """With max_docs above the corpus size no segment can be hot, so
    reassembly must reproduce every non-blank doc's token stream exactly
    (whitespace-canonical)."""
    from pyspark.sql import functions as F

    from otokuna_spark.operators.dedup import segment_dedup

    rows = [(i, " ".join(f"t{i}_{j}" for j in range(1 + (i * 7) % 23))) for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["kept_text"] for r in segment_dedup(docs, "doc_id", "text", 8, 10**6).collect()}
    for i, t in rows:
        assert out[i] == t


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=8),
)
def test_waterfill_allocation_invariants(spark, tmp_path_factory, sizes):
    """Water-filling (q137) on random source supplies: allocations sum
    EXACTLY to total//2, never exceed a source's own supply, uncapped
    sources keep everything, and capped allocations differ by at most 1
    token (the deterministic leftover)."""
    from otokuna_spark.plans.queries import REGISTRY

    tmp = tmp_path_factory.mktemp("wf")
    rows = [
        (i, " ".join(["w"] * n), "en", f"s{i:02d}", n) for i, n in enumerate(sizes)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.write.mode("overwrite").parquet(str(tmp / "documents.parquet"))
    out = REGISTRY["q137_waterfill_budget"].fn(spark, str(tmp)).collect()
    total = sum(sizes)
    assert sum(r["alloc_tokens"] for r in out) == total // 2
    capped_allocs = []
    for r in out:
        assert 0 <= r["alloc_tokens"] <= r["n_tokens"]
        if r["capped"]:
            capped_allocs.append(r["alloc_tokens"])
        else:
            assert r["alloc_tokens"] == r["n_tokens"]
    if capped_allocs:
        assert max(capped_allocs) - min(capped_allocs) <= 1


@PROP
@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=40),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=2, max_value=6),
)
def test_exact_char_dup_spans_equals_suffix_reference(spark, texts, w):
    """ExactSubstr position spans == literal suffix-sort/adjacent-LCP
    reference on adversarial small-alphabet corpora (heavy incidental
    duplication, empty docs, docs shorter than the window)."""
    from otokuna_spark.operators import dedup
    from tests.test_operators import _sa_reference_spans

    docs_py = {i: t for i, t in enumerate(texts)}
    df = spark.createDataFrame(list(docs_py.items()), "doc_id long, text string")
    got = {
        (r["doc_id"], r["span_start"], r["span_len"])
        for r in dedup.exact_char_dup_spans(df, "doc_id", "text", window=w).collect()
    }
    assert got == _sa_reference_spans(
        {d: t for d, t in docs_py.items() if len(t) >= w}, w
    )


@PROP
@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=40),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=2, max_value=6),
)
def test_exact_substring_scrub_complement_property(spark, texts, w):
    """Scrubbed text == document minus the union of reference-covered
    chars; dropped counts add up; scrub is a no-op exactly on docs with
    no covered position."""
    from otokuna_spark.operators import dedup
    from tests.test_operators import _sa_reference_spans

    docs_py = {i: t for i, t in enumerate(texts)}
    spans = _sa_reference_spans({d: t for d, t in docs_py.items() if len(t) >= w}, w)
    df = spark.createDataFrame(list(docs_py.items()), "doc_id long, text string")
    out = {
        r["doc_id"]: (r["kept_text"], r["n_dropped_chars"])
        for r in dedup.exact_substring_scrub(df, "doc_id", "text", window=w).collect()
    }
    assert set(out) == set(docs_py)
    for d, t in docs_py.items():
        dead = set()
        for dd, start, ln in spans:
            if dd == d:
                dead.update(range(start - 1, start - 1 + ln))
        assert out[d] == ("".join(c for i, c in enumerate(t) if i not in dead), len(dead))


@PROP
@given(
    st.lists(
        st.text(alphabet="abA ", min_size=0, max_size=24),
        min_size=1,
        max_size=5,
    )
)
def test_suffix_ranks_property_vs_sorted_reference(spark, texts):
    """Prefix-doubling suffix ranks == dense rank of the suffix string in
    a literal sorted reference, on adversarial structure: empty docs,
    single-char docs, shared suffixes across docs, repeated characters,
    mixed case (binary order, 'A' < 'a')."""
    from otokuna_spark.operators import suffixarray as sa

    docs_py = {i: t for i, t in enumerate(texts)}
    sufs = sorted({t[p:] for t in docs_py.values() for p in range(len(t))})
    want = {s: i for i, s in enumerate(sufs)}
    df = spark.createDataFrame(list(docs_py.items()), "doc_id long, text string")
    got = sa.suffix_ranks(df, "doc_id", "text", n_parts=3).collect()
    assert len(got) == sum(len(t) for t in docs_py.values())
    for r in got:
        assert r["rank"] == want[docs_py[r["doc_id"]][r["pos"] - 1:]]


@PROP
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", categories=("L", "N", "P", "Zs")
            ),
            min_size=0,
            max_size=60,
        ),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=2, max_value=12),
)
def test_rolling_window_hash_property(spark, texts, w):
    """The rolling polynomial window hash is a pure function of the
    window substring on arbitrary unicode text and window sizes: equal
    substrings (within or across docs) always hash equal, every
    eligible position emits exactly one row, and distinct substrings
    collide only by (astronomically unlikely) 64-bit accident — the
    property the hash-then-verify consumers rely on for completeness
    (a same-gram hash mismatch would DROP true duplicates silently)."""
    from collections import defaultdict

    from otokuna_spark.operators import dedup

    rows_in = [(i, t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows_in, "doc_id long, text string")
    got = dedup._rolling_window_hashes(docs, "doc_id", "text", w).collect()
    tmap = dict(rows_in)
    assert len(got) == sum(max(0, len(t) - w + 1) for t in texts)
    bygram = defaultdict(set)
    for r in got:
        g = tmap[r["__id"]][r["p"] - 1 : r["p"] - 1 + w]
        assert len(g) == w
        bygram[g].add(r["__h"])
    assert all(len(hs) == 1 for hs in bygram.values())


@PROP
@given(
    st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=60),
    st.integers(min_value=1, max_value=5),
)
def test_global_running_sum_equals_serial(spark, values, n_parts):
    from pyspark.sql import functions as F

    from otokuna_spark.operators import prefix

    rows = [(i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(3)
    got = {
        r["id"]: r["cum"]
        for r in prefix.global_running_sum(
            df, [F.asc("id")], "v", out="cum", n_parts=n_parts
        ).collect()
    }
    acc, exp = 0, {}
    for i, v in rows:
        acc += v
        exp[i] = acc
    assert got == exp


@PROP
@given(
    # duplicate-heavy sort keys: ties MUST straddle range-partition
    # boundaries sometimes, which is exactly what the unique tie-break
    # column has to absorb
    st.lists(st.integers(min_value=0, max_value=3), min_size=1, max_size=60),
    st.integers(min_value=1, max_value=5),
)
def test_global_row_number_equals_serial(spark, values, n_parts):
    from pyspark.sql import functions as F

    from otokuna_spark.operators import prefix

    rows = [(i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(3)
    got = {
        r["id"]: r["rn"]
        for r in prefix.global_row_number(
            df, [F.desc("v"), F.asc("id")], out="rn", n_parts=n_parts
        ).collect()
    }
    ref = sorted(rows, key=lambda r: (-r[1], r[0]))
    assert got == {i: n + 1 for n, (i, _) in enumerate(ref)}
