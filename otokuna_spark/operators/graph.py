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
should be by (degree, id) instead of raw id — same plan shape, one extra
degree join; raw-id orientation is used here because dedup-pair graphs
are degree-bounded by construction (LSH band width).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
                F.expr(
                    "coalesce(n_triangles, 0) * 2 * 1000000 div (degree * (degree - 1))"
                ),
            )
            .otherwise(F.lit(0))
            .alias("clustering_ppm"),
        )
    )
