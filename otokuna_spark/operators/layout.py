"""Z-order layout WRITER + realized file-level pruning — SURVEY.md §2.13.

q171 *predicts* what a Morton-clustered layout buys a box query (~96% of
rows pruned at sf0.01); this module MATERIALIZES the layout and lets a
query commit the REALIZED evidence: the files actually listed, scanned,
and skipped by Spark's own partition pruning after a write — the
Delta/Iceberg ``OPTIMIZE ZORDER BY`` loop closed end-to-end (write →
re-read → prune), replacing the reference's regex key listing
(app/app.py:283-294) with stats-based pruning that holds at 100 TB.

Two writers, one clustering key (``functions/zorder.py``'s codegen'd
Morton interleave):

- ``write_cell_layout`` — one parquet file per Z-CELL (the top
  ``cell_bits`` of the Morton code), laid out as hive partition
  directories ``zcell=<c>/``. The cell → file mapping is a PURE FUNCTION
  of (x, y), so a DuckDB oracle can replay exactly which files a box
  query must touch — this is the attestable path (q177). A Z-cell is a
  RECTANGLE in (x, y) (an even-length Morton prefix fixes the top bits
  of both dimensions), so the candidate-file set for a box is closed-
  form arithmetic (``box_candidate_cells``), not a data scan.
- ``write_range_layout`` — ``repartitionByRange(morton)`` +
  ``sortWithinPartitions(morton)``: the production 100 TB writer.
  Range partitioning balances FILE SIZES under arbitrary cell skew
  (sampled splits), at the cost of sampled (non-replayable) file
  boundaries; pruning then rides parquet min/max column stats per
  file/row-group instead of directory names. Tested for narrow
  per-file (x, y) ranges via parquet footers, not oracle-attested.

Scale notes: the cell writer's exchange is one hash repartition on
``zcell`` (each cell lands in exactly one task → exactly one file per
cell directory — what makes files_total oracle-replayable); at
production widths you pick ``cell_bits`` so ~cells ≈ target file count
and hot cells stay under the file-size target, or use the range writer.
Reading back, the box predicate on ``zcell`` is a PartitionFilter —
pruned at file-LISTING time, before any I/O.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import zorder as Z


def with_zcell(
    df: DataFrame, x: str, y: str, *, bits: int = 16, cell_bits: int = 10
) -> DataFrame:
    """Add ``morton`` (2*bits-bit interleave of x, y) and ``zcell`` (its
    top ``cell_bits`` bits — the file-assignment key) columns.
    ``cell_bits`` must be even so a cell is a rectangle in (x, y)."""
    if cell_bits % 2 or not 2 <= cell_bits <= 2 * bits:
        raise ValueError(f"cell_bits must be even in [2, {2 * bits}], got {cell_bits}")
    shift = 2 * bits - cell_bits
    m = Z.morton16(x, y, bits=bits)
    return df.withColumn("morton", m).withColumn(
        "zcell", F.expr(f"morton div {1 << shift}").cast("long")
    )


def write_cell_layout(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    *,
    bits: int = 16,
    cell_bits: int = 10,
) -> None:
    """Write ``df`` as a Z-cell-partitioned parquet layout: hive
    directories ``zcell=<c>/`` with EXACTLY one file per non-empty cell
    (hash repartition on zcell puts each cell in one task; the hive
    writer then splits that task's output per directory). Deterministic:
    file set == non-empty cell set == a pure function of the data."""
    zdf = with_zcell(df, x, y, bits=bits, cell_bits=cell_bits)
    (
        zdf.repartition(F.col("zcell"))
        .sortWithinPartitions("morton")  # min/max stats stay narrow within the file too
        .write.mode("overwrite")
        .partitionBy("zcell")
        .parquet(path)
    )


def write_range_layout(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    *,
    bits: int = 16,
    n_files: int = 32,
) -> None:
    """The production-scale writer: range-partition on the Morton key
    (balanced file sizes under cell skew — splits are SAMPLED, so file
    boundaries are not replayable) and sort within each file so parquet
    min/max stats on x, y, and morton are tight per row group."""
    zdf = df.withColumn("morton", Z.morton16(x, y, bits=bits))
    (
        zdf.repartitionByRange(n_files, "morton")
        .sortWithinPartitions("morton")
        .write.mode("overwrite")
        .parquet(path)
    )


def box_candidate_cells(
    x_lo: int,
    x_hi: int,
    y_lo: int,
    y_hi: int,
    *,
    bits: int = 16,
    cell_bits: int = 10,
) -> list[int]:
    """The Z-cells whose (x, y) rectangle intersects the closed box
    [x_lo, x_hi] x [y_lo, y_hi] — the exact candidate-file set for a box
    query over a ``write_cell_layout`` table, in pure arithmetic (no data
    scan; the q177 oracle replays the same deinterleave in SQL).

    A cell's id interleaves the top cell_bits/2 bits of x (even
    positions) and y (odd positions); deinterleaving gives the cell's
    corner ``(cx << w, cy << w)`` with side ``2^w``, w = bits -
    cell_bits/2. Sound AND tight: every (x, y) in the box Morton-maps
    into a returned cell, and every returned cell overlaps the box."""
    if cell_bits % 2 or not 2 <= cell_bits <= 2 * bits:
        raise ValueError(f"cell_bits must be even in [2, {2 * bits}], got {cell_bits}")
    k = cell_bits // 2
    w = bits - k  # cell side = 2^w
    out = []
    for c in range(1 << cell_bits):
        cx = cy = 0
        for i in range(k):
            cx |= ((c >> (2 * i)) & 1) << i
            cy |= ((c >> (2 * i + 1)) & 1) << i
        if (
            cx << w <= x_hi
            and ((cx + 1) << w) > x_lo
            and cy << w <= y_hi
            and ((cy + 1) << w) > y_lo
        ):
            out.append(c)
    return out


def read_box_pruned(
    spark: SparkSession,
    path: str,
    x_lo: int,
    x_hi: int,
    y_lo: int,
    y_hi: int,
    *,
    bits: int = 16,
    cell_bits: int = 10,
) -> DataFrame:
    """Box query over a ``write_cell_layout`` table with the candidate
    cells injected as a PARTITION filter: Spark prunes non-candidate
    ``zcell=`` directories at file-listing time (visible as
    PartitionFilters in the plan), then applies the exact box predicate
    to the survivors."""
    cand = box_candidate_cells(
        x_lo, x_hi, y_lo, y_hi, bits=bits, cell_bits=cell_bits
    )
    return (
        spark.read.parquet(path)
        .where(F.col("zcell").isin(cand))
        .where(
            (F.col("x") >= x_lo)
            & (F.col("x") <= x_hi)
            & (F.col("y") >= y_lo)
            & (F.col("y") <= y_hi)
        )
    )


def layout_scratch_dir(tag: str, sf_dir: str) -> str:
    """Stable per-(tag, sf_dir) scratch path for materialized layouts —
    overwrite-reused across bench passes so repeated runs never
    accumulate temp directories."""
    import hashlib
    import tempfile

    h = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return os.path.join(tempfile.gettempdir(), f"otokuna_layout_{tag}_{h}")
