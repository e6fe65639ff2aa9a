"""Lloyd k-means + SQ8 scalar quantization: determinism, reference
parity, and the exact-arithmetic invariants the oracles rely on."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from otokuna_spark.operators import kmeans, similarity

SEED_VECS = 40
DIM = 6
K = 4


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.RandomState(7)
    rows = [
        (int(i), [float(x) for x in rng.uniform(-0.5, 0.5, DIM).astype(np.float32)])
        for i in range(SEED_VECS)
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def _reference_lloyd(rows, k, n_iters):
    """Independent numpy replay of the integer-exact contract: quantize
    floor(v*1e6), init = k lowest ids, exact int squared-L2 argmin with
    ties to the lowest cid, floor-mean updates, empty clusters frozen."""
    ids = sorted(rows)
    q = {i: np.floor(np.asarray(rows[i], dtype=np.float64) * 1e6).astype(object) for i in ids}
    cents = [list(q[i]) for i in ids[:k]]
    assign, hist = {}, []
    for t in range(1, n_iters + 1):
        prev = dict(assign)
        for i in ids:
            dists = [sum(int(a - b) ** 2 for a, b in zip(q[i], c)) for c in cents]
            assign[i] = min(range(k), key=lambda c: (dists[c], c))
        moved = len(ids) if t == 1 else sum(1 for i in ids if prev[i] != assign[i])
        inertia = sum(
            sum(int(a - b) ** 2 for a, b in zip(q[i], cents[assign[i]])) for i in ids
        )
        hist.append((t, moved, inertia, len(set(assign.values()))))
        if t < n_iters:
            for c in range(k):
                members = [i for i in ids if assign[i] == c]
                if members:
                    cents[c] = [
                        sum(int(q[i][j]) for i in members) // len(members)
                        for j in range(DIM)
                    ]
    return assign, hist


def test_lloyd_matches_numpy_reference(spark, emb_df):
    rows = {r["vec_id"]: list(r["embedding"]) for r in emb_df.collect()}
    ref_assign, ref_hist = _reference_lloyd(rows, K, 3)

    out, hist = kmeans.lloyd_kmeans(emb_df, "vec_id", "embedding", k=K, n_iters=3)
    got = {r["vec_id"]: r["cluster"] for r in out.collect()}
    assert got == ref_assign
    assert [(h["iter"], h["n_moved"], h["inertia"], h["n_clusters_used"]) for h in hist] == ref_hist


def test_lloyd_partitioning_invariant(spark, emb_df):
    a1, h1 = kmeans.lloyd_kmeans(emb_df, "vec_id", "embedding", k=K, n_iters=3)
    a2, h2 = kmeans.lloyd_kmeans(
        emb_df.repartition(13, "vec_id"), "vec_id", "embedding", k=K, n_iters=3
    )
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))
    assert h1 == h2


def test_lloyd_inertia_monotone_nonincreasing(spark, emb_df):
    _, hist = kmeans.lloyd_kmeans(emb_df, "vec_id", "embedding", k=K, n_iters=3)
    inertias = [h["inertia"] for h in hist]
    assert inertias == sorted(inertias, reverse=True)
    assert all(h["n_clusters_used"] <= K for h in hist)
    assert hist[0]["n_moved"] == SEED_VECS


def test_sq8_codes_in_range_and_envelope_exact(spark, emb_df):
    mm = similarity.sq8_train_minmax(emb_df, "embedding")
    assert len(mm) == DIM and all(b >= a for a, b in mm)
    enc = similarity.sq8_encode(emb_df, "embedding", mm)
    rows = enc.select("vec_id", "__codes", "embedding").collect()
    for r in rows:
        codes = list(r["__codes"])
        assert all(0 <= c <= 255 for c in codes)
        # code reconstruction error is bounded by one quantization step
        q = np.floor(np.asarray(r["embedding"], dtype=np.float64) * 1e6).astype(int)
        for j, (mn, mx) in enumerate(mm):
            rng = mx - mn
            if rng == 0:
                assert codes[j] == 0
            else:
                assert codes[j] == (int(q[j]) - mn) * 255 // rng
    # the min/max rows really are the envelope: some vector attains each
    flat = {(j, int(v)) for r in rows for j, v in enumerate(
        np.floor(np.asarray(r["embedding"], dtype=np.float64) * 1e6).astype(int))}
    for j, (mn, mx) in enumerate(mm):
        assert (j, mn) in flat and (j, mx) in flat


def test_sq8_encode_partitioning_invariant(spark, emb_df):
    mm = similarity.sq8_train_minmax(emb_df, "embedding")
    e1 = similarity.sq8_encode(emb_df, "embedding", mm).select("vec_id", "__codes").collect()
    e2 = (
        similarity.sq8_encode(emb_df.repartition(9), "embedding", mm)
        .select("vec_id", "__codes")
        .collect()
    )
    assert sorted((r["vec_id"], tuple(r["__codes"])) for r in e1) == sorted(
        (r["vec_id"], tuple(r["__codes"])) for r in e2
    )


def test_lloyd_rejects_too_few_vectors(spark, emb_df):
    with pytest.raises(ValueError, match="need >="):
        kmeans.lloyd_kmeans(
            emb_df.filter(F.col("vec_id") < 2), "vec_id", "embedding", k=K, n_iters=1
        )


def test_spread_init_beats_first_on_clustered_data(spark):
    from otokuna_spark.operators import kmeans as km

    # three well-separated blobs with ids ordered blob-by-blob: the
    # first-k init seeds all of k=3 inside blob A (ids 0,1,2), the exact
    # pathology spread_init exists for; farthest-first must land one
    # seed per blob
    rows = []
    for b, cx in enumerate([0.0, 5.0, 10.0]):
        for i in range(30):
            rows.append((b * 30 + i, [cx + i * 1e-4, cx - i * 1e-4]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    _, h_first = km.lloyd_kmeans(df, "vec_id", "embedding", k=3, n_iters=1, init="first")
    _, h_spread = km.lloyd_kmeans(df, "vec_id", "embedding", k=3, n_iters=1, init="spread")
    assert h_spread[0]["inertia"] < h_first[0]["inertia"] / 100

    # partitioning invariance: the learned assignment is a pure function
    # of the data under the spread init too
    a1, _ = km.lloyd_kmeans(df, "vec_id", "embedding", k=3, n_iters=2, init="spread")
    a2, _ = km.lloyd_kmeans(
        df.repartition(7), "vec_id", "embedding", k=3, n_iters=2, init="spread"
    )
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))


def test_numpy_assign_matches_hof_exactly(spark):
    """The vectorized large-k assignment path must be BIT-identical to
    the higher-order-function path: same cluster (lowest-cid tie break),
    same exact int64 distance."""
    rng = np.random.RandomState(11)
    rows = [
        (int(i), [float(x) for x in rng.uniform(-1.0, 1.0, 8).astype(np.float32)])
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    base = (
        kmeans.quantize(df.select("vec_id", "embedding"), "embedding")
        .select("vec_id", "__q")
        .localCheckpoint()
    )
    cents = [list(r["__q"]) for r in base.orderBy("vec_id").limit(12).collect()]
    # plant exact ties: vector 0's quantized point IS centroid 0 and a
    # duplicate centroid (cid 5 = cid 0) forces the tie-break to matter
    cents[5] = list(cents[0])
    got_np = sorted(
        map(tuple, kmeans._assign_numpy(base, "vec_id", cents)
            .select("vec_id", "cluster", "dist").collect())
    )
    cluster, dist = kmeans._assign_expr(12)
    got_hof = sorted(
        map(tuple, kmeans._attach_centroids(base, cents)
            .select("vec_id", cluster, dist).collect())
    )
    assert got_np == got_hof


def test_lloyd_numpy_path_equals_hof_path(spark, monkeypatch):
    """lloyd_kmeans above the k*d threshold (vectorized assignment) must
    produce the identical assignment AND history as the HOF path."""
    rng = np.random.RandomState(13)
    rows = [
        (int(i), [float(x) for x in rng.uniform(-0.8, 0.8, 64).astype(np.float32)])
        for i in range(250)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # k=32, d=64 -> k*d = 2048 >= NUMPY_ASSIGN_MIN_KD: numpy path
    a1, h1 = kmeans.lloyd_kmeans(df, "vec_id", "embedding", k=32, n_iters=2)
    r1 = sorted(map(tuple, a1.select("vec_id", "cluster", "dist").collect()))
    monkeypatch.setattr(kmeans, "NUMPY_ASSIGN_MIN_KD", 10**9)  # force HOF
    a2, h2 = kmeans.lloyd_kmeans(df, "vec_id", "embedding", k=32, n_iters=2)
    r2 = sorted(map(tuple, a2.select("vec_id", "cluster", "dist").collect()))
    assert r1 == r2
    assert h1 == h2
