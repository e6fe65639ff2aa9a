"""Entity resolution: blocked fuzzy matching over a dirty name column.

The canonical record-linkage shape for scale: never compare all pairs.

1. **Canonicalize** — aggregate records to distinct entity names first
   (name, support). On text corpora and product catalogs the distinct-name
   relation is orders of magnitude smaller than the record relation, and
   matching is a property of the NAME, so all fuzzy work happens there.
2. **Block** — a cheap deterministic key (last token, soundex, prefix)
   partitions the candidate space; the self-join is an EQUI-join on the
   block key, so Spark shuffles each name to its block once. The quadratic
   blowup is bounded per block, never global.
3. **Verify** — JVM-side ``levenshtein`` (whole-stage codegen, no Python)
   filters block-mates to pairs within ``max_distance``.

Output is entity-level (name_a < name_b, distance, per-name support
counts) — expanding to record-id pairs would multiply support_a x
support_b rows for no information gain; callers that need record routing
join this table back on name.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fuzzy_match_pairs(
    df: DataFrame,
    name_col: str,
    block_fn: Callable[[Column], Column],
    max_distance: int,
) -> DataFrame:
    """(name_a, name_b, dist, support_a, support_b) for distinct-name pairs
    sharing a block key with levenshtein(name_a, name_b) <= max_distance.
    ``block_fn`` maps the name column to its blocking key; recall is bounded
    by the blocking choice (a true match in different blocks is never seen)
    — standard ER tradeoff, documented at the call site."""
    ents = (
        df.select(F.col(name_col).alias("name"))
        .groupBy("name")
        .agg(F.count("*").alias("support"))
        .withColumn("block", block_fn(F.col("name")))
    )
    a, b = ents.alias("a"), ents.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block")) & (F.col("a.name") < F.col("b.name")),
        )
        .select(
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            F.levenshtein(F.col("a.name"), F.col("b.name")).alias("dist"),
            F.col("a.support").alias("support_a"),
            F.col("b.support").alias("support_b"),
        )
        .where(F.col("dist") <= max_distance)
    )
