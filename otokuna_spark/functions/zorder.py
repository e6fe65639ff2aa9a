"""Z-order (Morton) interleave — the multi-dimensional data-layout key.

A 100 TB table range-partitioned/sorted by ``morton16(x, y)`` clusters
rows that are close in BOTH dimensions into the same files, so a box
predicate on (x, y) prunes at the file level via parquet min/max stats —
the layout trick behind Delta/Iceberg Z-ORDER clustering. The engine
exposes the key as a pure native Column expression (one codegen'd
projection, no UDF, no shuffle) and q171 quantifies the pruning a box
query would get from it.

Arithmetic is pure integer (``div``/``%``/shift-by-constant over a
``sequence`` fold) with an exact DuckDB twin (``//``/``%``/``<<`` over
``generate_series``): bit i of x lands at position 2i, bit i of y at
2i+1:

    morton = sum_i ((x div 2^i) % 2) * 4^i  +  ((y div 2^i) % 2) * 2 * 4^i
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def morton16(x: str, y: str, bits: int = 16) -> Column:
    """Morton-interleave two non-negative integer columns of at most
    ``bits`` bits each into a ``2*bits``-bit BIGINT key. Callers own the
    domain guard (values must be < 2^bits; q171 clamps/filters first).

    The fold is a higher-order ``aggregate`` over ``sequence(0, bits-1)``
    — fully inside whole-stage codegen, zero exchanges."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), cast(0 as bigint), (acc, i) -> acc"
        f" + (({x} div shiftleft(cast(1 as bigint), i)) % 2)"
        f"   * shiftleft(cast(1 as bigint), 2 * i)"
        f" + (({y} div shiftleft(cast(1 as bigint), i)) % 2)"
        f"   * shiftleft(cast(1 as bigint), 2 * i + 1))"
    )
