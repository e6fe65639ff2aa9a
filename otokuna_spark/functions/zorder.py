"""Z-order (Morton) interleave — the multi-dimensional data-layout key.

A 100 TB table range-partitioned/sorted by ``morton16(x, y)`` clusters
rows that are close in BOTH dimensions into the same files, so a box
predicate on (x, y) prunes at the file level via parquet min/max stats —
the layout trick behind Delta/Iceberg Z-ORDER clustering. The engine
exposes the key as a pure native Column expression (one codegen'd
projection, no UDF, no shuffle) and q171 quantifies the pruning a box
query would get from it.

The interleave is the classic closed-form bit spread (Warren, Hacker's
Delight §7-2): five shift-or-mask steps per dimension, all plain
integer ops inside whole-stage codegen. The first cut used a
higher-order ``aggregate(sequence(0, bits-1), ...)`` fold — HOF lambdas
evaluate INTERPRETED per element, and the measured cost was 148k rows/s
at 10M rows vs >2M rows/s for the spread (PROD_BENCH.json
zorder_fold_10m_rows). Same values bit-for-bit: the DuckDB oracle
recomputes the key as the per-bit arithmetic sum
``sum_i ((x>>i)&1)<<2i | ((y>>i)&1)<<(2i+1)`` and q171 hash-matches.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SPREAD_STEPS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread_bits(v: Column) -> Column:
    """Spread the low 32 bits of a non-negative BIGINT so bit i lands at
    position 2i (zeros interleaved): five shift-or-mask rounds, every
    intermediate non-negative (masks < 2^63)."""
    for shift, mask in _SPREAD_STEPS:
        v = v.bitwiseOR(F.shiftleft(v, shift)).bitwiseAND(F.lit(mask))
    return v


def morton16(x: str, y: str, bits: int = 16) -> Column:
    """Morton-interleave two non-negative integer columns of at most
    ``bits`` bits each into a ``2*bits``-bit BIGINT key. Inputs are
    masked to the low ``bits`` bits before spreading, so the key is
    GUARANTEED inside the documented ``2*bits``-bit range; callers still
    own the domain guard if wrap-on-overflow is unacceptable (q171
    clamps/filters first, making the mask a no-op there).

    Bit i of x lands at position 2i, bit i of y at 2i+1 — identical to
    the per-bit arithmetic definition the q171 oracle replays."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    dom = F.lit((1 << bits) - 1)
    sx = _spread_bits(F.col(x).cast("long").bitwiseAND(dom))
    sy = _spread_bits(F.col(y).cast("long").bitwiseAND(dom))
    return sx.bitwiseOR(F.shiftleft(sy, 1))
