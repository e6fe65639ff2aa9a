"""Graph analytics over derived pair relations (near-dup graphs, user
co-occurrence graphs). Connected components live in ``dedup.cluster_pairs``;
this module adds the local-structure statistics: degree, triangle
participation, clustering coefficient.

Triangle counting uses the standard distributed orientation trick: with
every edge stored (a < b) and triangles enumerated as a < b < c via two
keyed self-joins, each triangle is produced exactly once and the join
fan-out is bounded by out-degrees in the ORIENTED graph — the degeneracy
orientation keeps hub nodes from exploding (a node of degree d in the
undirected graph contributes C(d,2) wedge checks only for its
HIGHER-numbered neighbors). At 100 TB-derived graphs the orientation
should be by (degree, id) instead of raw id — ``triangle_count_oriented``
below implements exactly that (out-degree O(sqrt(m)) under degree
ordering); raw-id orientation is kept in ``triangle_stats`` because
dedup-pair graphs are degree-bounded by construction (LSH band width).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# fixed-point scale for pagerank_ppt: ranks are parts-per-trillion of the
# total probability mass, so 3-4 iterations of floor-divided contributions
# keep ~6 significant digits
_PPT = 10**12


def triangle_stats(edges: DataFrame, id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Per-node local structure from an undirected edge list (id_a < id_b
    per row, no duplicates): (node, degree, n_triangles,
    clustering_ppm = floor(2 * tri * 1e6 / (deg * (deg - 1))), 0 when
    degree < 2).

    Shape: one union+agg for degrees, two equi-joins for the a<b<c
    triangle enumeration, one explode+agg to attribute each triangle to
    its three corners. All keyed shuffles on node ids.
    """
    e = edges.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    # wedges a<b<c: (a,b) joined with (b,c), closed by (a,c)
    wedge = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .select(F.col("e1.a").alias("a"), F.col("e1.b").alias("b"), F.col("e2.b").alias("c"))
    )
    tri = wedge.join(
        e.select(F.col("a").alias("a"), F.col("b").alias("c")), on=["a", "c"]
    )
    tri_per_node = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
    return (
        deg.join(tri_per_node, on="node", how="left")
        .select(
            "node",
            "degree",
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
            F.when(
                F.col("degree") >= 2,
                # DECIMAL(38,0): hot nodes past ~2e6 degree push
                # triangles*2e6 over BIGINT; widened like the other ppm sites
                # `div` not floor(/): decimal divide rounds before floor.
                F.expr(
                    "cast(cast(coalesce(n_triangles, 0) as decimal(38,0)) * 2 * 1000000"
                    " div (cast(degree as decimal(38,0)) * (degree - 1)) as bigint)"
                ),
            )
            .otherwise(F.lit(0))
            .alias("clustering_ppm"),
        )
    )


def triangle_count_oriented(edges: DataFrame, u: str = "u", v: str = "v") -> DataFrame:
    """Global triangle census from an undirected edge list (u < v per
    row, no duplicates) via DEGREE-ORDERED orientation — the variant
    ``triangle_stats``'s docstring defers to for hub-heavy graphs: every
    edge is oriented toward the higher (degree, id) rank, wedges are
    enumerated only between each vertex's out-neighbors (out-degree is
    O(sqrt(m)) under this orientation, so a degree-d hub never produces
    C(d, 2) wedges), and each wedge is closed against the oriented edge
    set. Each triangle has a unique minimum-rank corner, so the count is
    exact, not 3x.

    Returns one row: (n_nodes, n_edges, n_wedges, n_triangles,
    transitivity_ppm) with wedges = Sum C(deg, 2) over UNDIRECTED degrees
    and transitivity = floor(3e6 * triangles / wedges) — the global
    clustering coefficient in ppm. All exchanges are keyed on node ids;
    the three 1-row aggregates meet in broadcast crossJoins.
    """
    e = edges.select(F.col(u).alias("u"), F.col(v).alias("v"))
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    ed = e.join(du, "u").join(dv, "v")
    lo_is_u = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = ed.select(
        F.when(lo_is_u, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(lo_is_u, F.col("v")).otherwise(F.col("u")).alias("t"),
        F.when(lo_is_u, F.col("dv")).otherwise(F.col("du")).alias("dt"),
    )
    o1 = o.select("s", F.col("t").alias("t1"), F.col("dt").alias("d1"))
    o2 = o.select("s", F.col("t").alias("t2"), F.col("dt").alias("d2"))
    wedges = o1.join(o2, "s").where(
        (F.col("d1") < F.col("d2"))
        | ((F.col("d1") == F.col("d2")) & (F.col("t1") < F.col("t2")))
    )
    o3 = o.select(F.col("s").alias("t1"), F.col("t").alias("t2"))
    tri = wedges.join(o3, ["t1", "t2"]).agg(F.count("*").alias("n_triangles"))
    estat = e.agg(F.count("*").alias("n_edges"))
    nstat = deg.agg(
        F.count("*").alias("n_nodes"),
        F.coalesce(F.sum(F.expr("deg * (deg - 1) div 2")), F.lit(0)).alias(
            "n_wedges"
        ),
    )
    return (
        nstat.crossJoin(F.broadcast(estat))
        .crossJoin(F.broadcast(tri))
        .select(
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.col("n_edges").cast("long").alias("n_edges"),
            F.col("n_wedges").cast("long").alias("n_wedges"),
            F.col("n_triangles").cast("long").alias("n_triangles"),
            F.expr(
                "cast(case when n_wedges > 0 then (3000000 * n_triangles)"
                " div n_wedges else 0 end as bigint)"
            ).alias("transitivity_ppm"),
        )
    )


def pagerank_ppt(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
) -> DataFrame:
    """Deterministic fixed-point PageRank over an undirected edge list
    (id_a < id_b per row): (node, rank_ppt) with ranks in parts-per-
    trillion of total mass.

    All arithmetic is integer: r0 = PPT div N, and each round computes
    r'(v) = base + sum over in-neighbors u of
    ``(r(u) * damping_num div damping_den) div deg(u)``,
    base = (PPT * (den - num) div den) div N. Integer sums are
    associative, so the result is bit-identical regardless of partition
    count or reduction order — the property that makes an iterative
    algorithm oracle-checkable (the SQL twin unrolls the same rounds).

    Shape per round: one equi-join of the (src, dst, deg) relation with
    the current ranks on src + one keyed aggregation on dst — the standard
    message-passing plan, shuffle-bounded by edge count. The edge relation
    is persisted once; each round's rank relation is localCheckpointed
    (eager) to cut lineage growth, same discipline as
    ``dedup.cluster_pairs``. Isolated nodes don't exist by construction
    (every node is an edge endpoint, and the graph is symmetric, so every
    node both sends and receives).
    """
    # materialize the (bounded) edge list once: it is consumed by the
    # degree count, the adjacency build, and the rank init — without this
    # an expensive upstream (LSH candidate generation) re-runs per consumer
    e = edges.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst")).localCheckpoint(
        eager=True
    )
    directed = e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = directed.groupBy("src").agg(F.count("*").alias("deg"))
    adj = directed.join(deg, "src").persist()
    try:
        n = deg.count()  # bounded driver scalar: node count, one aggregate action
        if n == 0:
            return adj.select(
                F.col("src").alias("node"), F.lit(0).cast("long").alias("rank_ppt")
            )
        base = (_PPT * (damping_den - damping_num) // damping_den) // n
        ranks = deg.select("src", F.lit(_PPT // n).cast("long").alias("rank_ppt"))
        for _ in range(iterations):
            contrib = adj.join(ranks, "src").select(
                F.col("dst"),
                F.expr(
                    f"(rank_ppt * {damping_num} div {damping_den}) div deg"
                ).alias("c"),
            )
            ranks = (
                contrib.groupBy("dst")
                .agg((F.lit(base) + F.sum("c")).cast("long").alias("rank_ppt"))
                .withColumnRenamed("dst", "src")
                .localCheckpoint(eager=True)
            )
        return ranks.select(F.col("src").alias("node"), "rank_ppt")
    finally:
        adj.unpersist()


def personalized_pagerank_ppt(
    edges: DataFrame,
    seeds: list[int],
    id_a: str = "id_a",
    id_b: str = "id_b",
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
) -> DataFrame:
    """Personalized PageRank (Haveliwala 2002) over an undirected edge
    list: identical integer fixed-point recurrence to ``pagerank_ppt``,
    but ALL teleport mass lands on the ``seeds`` set — r0 = PPT div |S|
    on seeds (0 elsewhere) and the per-round base term
    ``(PPT * (den - num) div den) div |S|`` is added only to seed nodes.
    Ranks then measure proximity to the seed set (the recommendation /
    similar-user primitive), not global centrality.

    ``seeds`` is a bounded driver-side list (model state, like the
    broadcast centroid tables): it enters the plan as an IN-list
    predicate, never a join with a collected corpus. All arithmetic is
    non-negative integers, so truncating and flooring engines agree and
    the oracle can unroll the rounds (q192). Shape per round: one
    equi-join on src + one keyed agg on dst, exactly ``pagerank_ppt``'s
    message-passing plan."""
    if not seeds:
        raise ValueError("seeds must be non-empty")
    seed_list = sorted({int(s) for s in seeds})
    ns = len(seed_list)
    e = edges.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst")).localCheckpoint(
        eager=True
    )
    directed = e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = directed.groupBy("src").agg(F.count("*").alias("deg"))
    adj = directed.join(deg, "src").persist()
    try:
        # Off-graph seeds never receive their r0 / per-round teleport
        # share (they have no degree row), yet |S| would still divide the
        # mass — silently shrinking total rank for every seed (round-13
        # advice). Raise instead. Bounded check: one filtered distinct
        # count over the degree table against the IN-list, one scalar
        # collected.
        n_present = (
            deg.where(F.col("src").isin(seed_list)).select("src").distinct().count()
        )
        if n_present != ns:
            raise ValueError(
                f"personalized_pagerank_ppt: {ns - n_present} of {ns} seeds "
                "are not nodes of the edge list; their teleport share would "
                "silently vanish"
            )
        r_seed = _PPT // ns
        base_seed = (_PPT * (damping_den - damping_num) // damping_den) // ns
        is_seed_src = F.col("src").isin(seed_list)
        ranks = deg.select(
            "src",
            F.when(is_seed_src, F.lit(r_seed))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("rank_ppt"),
        )
        for _ in range(iterations):
            contrib = adj.join(ranks, "src").select(
                F.col("dst"),
                F.expr(
                    f"(rank_ppt * {damping_num} div {damping_den}) div deg"
                ).alias("c"),
            )
            ranks = (
                contrib.groupBy("dst")
                .agg(
                    (
                        F.when(F.col("dst").isin(seed_list), F.lit(base_seed))
                        .otherwise(F.lit(0))
                        + F.sum("c")
                    )
                    .cast("long")
                    .alias("rank_ppt")
                )
                .withColumnRenamed("dst", "src")
                .localCheckpoint(eager=True)
            )
        return ranks.select(F.col("src").alias("node"), "rank_ppt")
    finally:
        adj.unpersist()


def kcore_peel(
    edges: DataFrame,
    u: str = "u",
    v: str = "v",
    *,
    k: int = 3,
    n_rounds: int | None = 4,
    max_rounds: int = 64,
) -> tuple[DataFrame, list[dict]]:
    """Iterative k-core peeling: each round computes degrees from the
    surviving edge list and deletes every node of degree < k (and its
    edges).

    Two modes (the cluster_pairs discipline, dedup.py):

    - ``n_rounds=None`` (production): run to the DATA-DEPENDENT fixpoint
      — iterate until a round removes nothing, which yields exactly the
      k-core (the maximal subgraph of minimum degree >= k). A
      ``max_rounds`` guard raises RuntimeError instead of returning a
      silently-unfinished peel; 64 rounds is far past any real peel
      depth (the 1.15M-edge PROD probe converges in 15).
    - ``n_rounds=N`` (oracle attestation): bounded unroll replayable by
      hash-matched unrolled SQL CTEs. The returned history makes
      convergence ATTESTABLE — a round with n_removed == 0 proves the
      fixpoint was reached inside the unroll (the q184 device:
      iterative-algorithm health committed as rows, not asserted).

    Per round: one union+agg for degrees (keyed on node ids), two
    semi-join filters against the < k node set (degree-table cardinality,
    never edges x edges), one localCheckpoint to cut the lineage — the
    pointer-doubling discipline of dedup.cluster_pairs applied to
    peeling. History rows carry (iter, n_nodes, n_edges, n_removed)
    measured BEFORE that round's deletion; the collect is 3 scalars per
    round (the kmeans/BPE bounded-collect device).

    Returns (surviving_edges, history). In bounded-unroll mode the edge
    list is the true k-core ONLY if the fixpoint was reached inside the
    unroll — callers that need the core must check
    ``history[-1]["n_removed"] == 0`` (q188 surfaces this as a computed
    ``converged`` bit); fixpoint mode guarantees it by construction."""
    e = edges.select(F.col(u).alias("u"), F.col(v).alias("v")).localCheckpoint()
    history: list[dict] = []
    to_fixpoint = n_rounds is None
    bound = max_rounds if to_fixpoint else n_rounds
    for it in range(1, bound + 1):
        deg = (
            e.select(F.col("u").alias("node"))
            .unionAll(e.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
        )
        stats = deg.agg(
            F.count("*").alias("n_nodes"),
            F.coalesce(F.sum("deg"), F.lit(0)).alias("deg_sum"),
            F.coalesce(
                F.sum(F.when(F.col("deg") < k, 1).otherwise(0)), F.lit(0)
            ).alias("n_removed"),
        ).collect()[0]
        history.append(
            {
                "iter": it,
                "n_nodes": int(stats["n_nodes"]),
                "n_edges": int(stats["deg_sum"]) // 2,
                "n_removed": int(stats["n_removed"]),
            }
        )
        if stats["n_removed"] == 0:
            if not to_fixpoint:
                # fixpoint inside the unroll: remaining rounds are no-ops;
                # record them so the report shape is partitioning- AND
                # data-independent
                for it2 in range(it + 1, n_rounds + 1):
                    history.append(
                        {
                            "iter": it2,
                            "n_nodes": int(stats["n_nodes"]),
                            "n_edges": int(stats["deg_sum"]) // 2,
                            "n_removed": 0,
                        }
                    )
            return e, history
        keep = deg.where(F.col("deg") >= k).select("node")
        e = (
            e.join(keep.withColumnRenamed("node", "u"), "u", "leftsemi")
            .join(keep.withColumnRenamed("node", "v"), "v", "leftsemi")
            .select("u", "v")
            .localCheckpoint()
        )
    if to_fixpoint:
        raise RuntimeError(
            f"kcore_peel(k={k}) did not reach the fixpoint within "
            f"max_rounds={max_rounds}; last round removed "
            f"{history[-1]['n_removed']} nodes"
        )
    return e, history
