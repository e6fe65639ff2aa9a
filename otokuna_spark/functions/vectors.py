"""Vector column functions over array<float|double> embeddings.

Built on higher-order functions (``zip_with`` / ``aggregate``) so the dot
products run JVM-side inside codegen — the brute-force similarity path is
then a pure shuffle/broadcast problem, not a Python-speed problem.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def dot_scaled_int(a: Column, b: Column, scale: float = 1e6) -> Column:
    """Order-free dot product: each elementwise product is floored to a
    scaled BIGINT before summation, so the reduction is associative and
    the result is bit-identical across engines regardless of sum order
    (the plain double ``dot`` is NOT — IEEE addition isn't associative,
    so a SQL fold, a numpy pairwise sum, and a shuffle-order sum all
    disagree in the last ulps). This is what makes exact-cosine predicates
    oracle-checkable. Relative error vs the true dot is ~dim/(scale*|dot|)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.floor(x.cast("double") * y.cast("double") * F.lit(scale)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def norm2_scaled_int(a: Column, scale: float = 1e6) -> Column:
    """Scaled-integer squared norm (see dot_scaled_int)."""
    return dot_scaled_int(a, a, scale)


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit hashes via popcount(xor)."""
    x = a.bitwiseXOR(b)
    return F.bit_count(x)
