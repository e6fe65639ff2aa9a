"""Table sources/sinks (SURVEY.md S4-S8).

The reference shuttles pandas pickles through S3 (scraping.py:407-410,
predict.py:27-51); the Spark-native home is partitioned Parquet. All reads
go through ``spark.read.parquet`` so Catalyst gets predicate pushdown and
column pruning for free; writers expose partitioning and compaction
(the reference's zip-consolidation step S9 becomes ``compact``).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor. At the
# 100 TB design point region/nation stay tiny (fixed cardinality) and
# supplier/part/customer grow; only the fixed-cardinality ones are safe to
# force-broadcast unconditionally.
BROADCAST_DIMS = ("region", "nation")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Primary keys used by the opt-in ``spread`` path of ``read_table``: a
# deterministic hash-repartition key per table (guide §2.5: never a
# rand()-derived key).
SPREAD_KEYS = {
    "documents": "doc_id",
    "embeddings": "vec_id",
    "events": "event_id",
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
}

# (path) -> byte size memo so repeated read_table call sites don't
# re-list the filesystem (test data is immutable within a session).
_SPREAD_SIZES: dict[str, int] = {}


def _input_bytes(spark: SparkSession, path: str) -> int:
    got = _SPREAD_SIZES.get(path)
    if got is None:
        jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        got = int(fs.getContentSummary(jpath).getLength())
        _SPREAD_SIZES[path] = got
    return got


def spread_for_compute(df: DataFrame, *key_cols: str) -> DataFrame:
    """Raise a small relation's partition count to the session's default
    parallelism before CPU-heavy map work (md5 minhash lanes, rolling
    window hashes, shingle explodes). AQE's bytes-based coalescing
    collapses calibration-scale shuffles to ONE partition — the right
    call for byte-bound stages, the wrong one for CPU-dense map
    pipelines that then run single-threaded on a 32-core session
    (measured r15: the capstone's 16-lane signature build over a
    1-partition checkpointed batch took 2.9 s vs 0.5 s spread). No-op
    when the input already has enough partitions — the cluster-scale
    case, where upstream shuffles and scans arrive wide. Deterministic
    hash keys (guide §2.5); an explicit repartition(n, cols) is never
    re-coalesced by AQE."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    if key_cols:
        return df.repartition(target, *[F.col(c) for c in key_cols])
    return df.repartition(target)


def read_table(spark: SparkSession, sf_dir: str, name: str, spread: bool = False) -> DataFrame:
    """Read one input table. ``spread=True`` raises the scan's map-side
    parallelism with one cheap deterministic hash repartition on the
    table's primary key — the fix for CPU-heavy map pipelines (shingling,
    md5 minhash lanes, rolling window hashes) above a small parquet file:
    a single row group scans as ONE task regardless of cluster size
    (a row group is the minimum split unit, so maxPartitionBytes cannot
    help). Measured at local[32], sf0.1: the 128-lane minhash signature
    build drops 10.8 s -> 0.9 s; the exchange itself costs ~10 ms, and
    Catalyst still pushes filters and column pruning through a
    RepartitionByExpression (plan-audited), so PushedFilters/ReadSchema
    are unaffected.

    OPT-IN per call site because the r15 interleaved A/B showed the win
    is plan-shape-dependent: queries whose first heavy operator is the
    scan-side map pipeline gain 2-5x, while multi-pass or join-back
    shapes (q170/q178/q196-class) pay the extra exchange without any
    map-side win. The gate below is scale-adaptive: when the file set is
    big enough for the scan to reach the session's parallelism on its
    own (bytes >= cores x 128 MB), spreading is a no-op — at the 100 TB
    design point this branch never fires.
    """
    df = spark.read.parquet(table_path(sf_dir, name))
    if spread:
        key = SPREAD_KEYS.get(name)
        cores = spark.sparkContext.defaultParallelism
        max_split = 128 * 1024 * 1024  # split-size order of magnitude; the gate is heuristic
        if key is not None and _input_bytes(spark, table_path(sf_dir, name)) < cores * max_split:
            df = df.repartition(cores, key)
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TPCH_TABLES) -> dict[str, DataFrame]:
    """Load the driver's synthetic tables (TESTDATA.md) as DataFrames."""
    out: dict[str, DataFrame] = {}
    for name in names:
        path = table_path(sf_dir, name)
        if os.path.exists(path):
            out[name] = spark.read.parquet(path)
    return out


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TPCH_TABLES) -> dict[str, DataFrame]:
    tables = load_tables(spark, sf_dir, names)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite") -> None:
    """Canonical sink (replaces the reference's CSV/pickle sinks, S4/S6).

    ``partition_by`` yields a `key=value` directory layout, turning the
    reference's S3-prefix-regex listing (S8, app/app.py:283-294) into
    partition pruning.
    """
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def compact(spark: SparkSession, path: str, out_path: str, target_files: int = 8) -> None:
    """Small-file compaction (replaces zip consolidation, S9:
    svc/zip_property_data.py:34-100)."""
    spark.read.parquet(path).coalesce(target_files).write.mode("overwrite").parquet(out_path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: co-locates rows by hash(bucket_cols) at
    WRITE time so repeated joins/aggregations on those keys skip the
    shuffle entirely — the 100 TB play for fact-fact joins that recur
    (e.g. orders x lineitem on orderkey every night). Sorted buckets also
    enable shuffle-free sort-merge joins.

    Overwrite is made safe ACROSS sessions: with the default in-memory
    catalog a previous session's managed-table location survives on disk
    while the new catalog has never heard of the table, and saveAsTable
    refuses the orphaned directory (LOCATION_ALREADY_EXISTS) — so drop
    the table if known, then clear a local orphan location if present."""
    if mode == "overwrite":
        sp = df.sparkSession
        sp.sql(f"DROP TABLE IF EXISTS {table_name}")
        from urllib.parse import urlparse

        u = urlparse(sp.conf.get("spark.sql.warehouse.dir"))
        if u.scheme in ("", "file"):
            orphan = os.path.join(u.path, table_name.lower())
            if os.path.exists(orphan):
                import shutil

                shutil.rmtree(orphan, ignore_errors=True)
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def zorder_key(cols: list[str], bits_per_col: int = 12) -> "Column":
    """Morton (Z-order) interleaving key over numeric columns — the
    lakehouse data-clustering device (Delta OPTIMIZE ZORDER BY's layout):
    rows sorted by this key cluster in ALL the listed dimensions at once,
    so per-file min/max footer statistics stay tight on every column and
    a filter on ANY of them prunes files. A plain multi-column sort keeps
    only the leading column's stats tight.

    Each column is min-max scaled to ``bits_per_col`` bits (bounds attach
    as a broadcast 1-row relation via ``write_zordered``; this function
    expects pre-scaled ``__z_<col>`` integer columns) and the bits are
    interleaved column-major. Pure codegen bit arithmetic — the unrolled
    expression is bits_per_col x n_cols shift/or terms.
    """
    terms = []
    n = len(cols)
    for bit in range(bits_per_col):
        for j, c in enumerate(cols):
            # bit `bit` of column j lands at interleaved position bit*n + j
            terms.append(
                F.shiftleft(
                    F.shiftright(F.col(f"__z_{c}"), bit).bitwiseAND(F.lit(1)),
                    bit * n + j,
                )
            )
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    n_files: int = 16,
    bits_per_col: int = 12,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered on the Morton curve of ``zorder_cols``:
    min-max scale each column (bounds as one broadcast scalar row — no
    driver collect in the plan), compute the interleaved key, range-
    partition into ``n_files`` and sort within partitions — every file
    covers a compact hyper-rectangle, so footer min/max pruning works for
    filters on ANY zorder column. Measured (pinned in
    test_write_zordered_tightens_per_file_ranges): summed normalized
    per-file (x, y) range product 2.1 z-ordered vs 15.9 unclustered over
    16 files — ~8x tighter, i.e. a point filter touches ~2 files
    instead of all 16."""
    bounds = df.agg(
        *[f for c in zorder_cols for f in (
            F.min(F.col(c)).alias(f"__mn_{c}"), F.max(F.col(c)).alias(f"__mx_{c}")
        )]
    )
    top = (1 << bits_per_col) - 1
    scaled = df.crossJoin(F.broadcast(bounds))
    for c in zorder_cols:
        rng = F.col(f"__mx_{c}").cast("double") - F.col(f"__mn_{c}").cast("double")
        scaled = scaled.withColumn(
            f"__z_{c}",
            F.when(rng > 0,
                   F.floor((F.col(c).cast("double") - F.col(f"__mn_{c}").cast("double")) / rng * top))
            .otherwise(F.lit(0))
            .cast("long"),
        )
    keyed = scaled.withColumn("__zkey", zorder_key(zorder_cols, bits_per_col))
    (
        keyed.repartitionByRange(n_files, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey", *[f"__z_{c}" for c in zorder_cols],
              *[f"__mn_{c}" for c in zorder_cols], *[f"__mx_{c}" for c in zorder_cols])
        .write.mode(mode)
        .parquet(path)
    )


def bucketed_join_is_shuffle_free(spark: SparkSession, left_table: str, right_table: str, key: str) -> bool:
    """Diagnostic: does joining the two bucketed tables on `key` avoid a
    shuffle? (True when both are bucketed on the key with equal bucket
    counts — the plan has no Exchange above either scan.)"""
    import contextlib
    import io as _io

    import re as _re

    joined = spark.table(left_table).join(spark.table(right_table), key)
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain(mode="formatted")
    # formatted mode prints each node as "(N) <NodeName>"; a shuffle is a
    # node named exactly "Exchange" (hash, range, or round-robin
    # partitioning all print under that label), while broadcast joins print
    # "BroadcastExchange" — so anchoring on the node label catches every
    # shuffle kind and still (correctly) reports broadcast joins as
    # shuffle-free.
    return _re.search(r"^\(\d+\) Exchange\b", buf.getvalue(), _re.M) is None


def join_side_is_shuffle_free(
    df: DataFrame, scan_marker: str, forbid_broadcast: bool = True
) -> bool:
    """Diagnostic for ONE side of a join inside an arbitrary plan: does
    the scan identified by ``scan_marker`` (e.g. a bucketed table name)
    reach its enclosing join without ANY Exchange on its path? Used to
    attest co-located probes where only the OTHER side may shuffle —
    ``bucketed_join_is_shuffle_free``'s whole-plan check is too blunt
    there because the probing side legitimately shuffles.

    Walks the physical-plan tree string by indentation from the scan
    line up through its ancestors until the first join node; any
    Exchange on that path means the scan side was re-partitioned (not
    co-located). With ``forbid_broadcast`` the WHOLE plan must also be
    free of BroadcastExchange — the attestation that a size-gated probe
    really did avoid broadcasting a batch-sized relation (the join this
    guards is the plan's only join, so the check is unambiguous).
    """

    plan = df._jdf.queryExecution().executedPlan().toString()
    if forbid_broadcast and "BroadcastExchange" in plan:
        return False
    lines = plan.splitlines()

    def content_start(s: str) -> int:
        return len(s) - len(s.lstrip(" :+-*()0123456789"))

    try:
        i = next(idx for idx, s in enumerate(lines) if scan_marker in s)
    except StopIteration:
        return False
    cur = content_start(lines[i])
    for j in range(i - 1, -1, -1):
        cs = content_start(lines[j])
        if cs < cur:
            node = lines[j][cs:]
            if "Join" in node.split(" ")[0]:
                return True
            if node.startswith("Exchange"):
                return False
            cur = cs
    return True  # no join above: a bare scan pipeline has no exchange


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """JSONL source with explicit-schema discipline for training-data lakes.

    - With ``schema`` (DDL string): schema-on-read, NO inference pass —
      at 100 TB an inference pass is a full extra scan of the lake. The
      PERMISSIVE mode routes malformed lines into ``corrupt_col`` instead
      of failing the job (drop or quarantine them downstream; a 10^11-line
      crawl always has a few). Spark refuses a query that references ONLY
      ``corrupt_col`` on the raw relation — ``cache()`` the DataFrame
      before splitting it into good/quarantine branches.
    - Without ``schema``: falls back to sampled inference (fine for
      exploration, not for production jobs).
    """
    reader = spark.read
    if schema is not None:
        full = f"{schema}, {corrupt_col} STRING" if corrupt_col else schema
        reader = reader.schema(full).option("mode", "PERMISSIVE")
        if corrupt_col:
            reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    return reader.json(path)


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    shard_key: str,
    sort_within: list[str] | None = None,
    max_records_per_file: int | None = None,
    fmt: str = "parquet",
) -> None:
    """Deterministic sharded output for a training dataloader.

    - ``repartition(n_shards, hash(shard_key))``: each output file set is a
      stable function of the DATA, not of input partitioning or executor
      count — rerunning the job yields the same doc->shard assignment, so
      a training run can resume against regenerated shards.
    - ``sortWithinPartitions``: deterministic row order inside each shard
      (dataloaders that stream a shard sequentially see a stable order;
      sorting by a low-cardinality prefix also improves parquet RLE).
    - ``maxRecordsPerFile`` caps file size without another shuffle — a
      shard splits into k sequentially-numbered files when it exceeds the
      cap, keeping any single file loadable.

    One shuffle total. At 100 TB pick n_shards >> max executors so the
    write parallelizes, and a shard_key with uniform hash spread (doc id,
    not language).
    """
    from pyspark.sql import functions as F

    out = df.repartition(n_shards, F.col(shard_key))
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    w = out.write.mode("overwrite")
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.format(fmt).save(path)


def write_with_metrics(
    df: DataFrame,
    path: str,
    metrics: dict[str, "Column"],
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> dict:
    """Parquet write with audit metrics computed DURING the write job via
    the Observation API — row counts, null counts, domain checks ride the
    single write pass instead of a follow-up scan (at 100 TB the usual
    "write, then count what we wrote" pattern doubles the most expensive
    job of the day).

    ``metrics`` maps metric name -> aggregate Column (e.g.
    ``{"n": F.count(F.lit(1)), "null_keys": F.sum(F.col("k").isNull()
    .cast("long"))}``). Returns the observed values after the write
    completes. Metrics must be aggregates Observation supports (no
    distinct aggregates)."""
    from pyspark.sql import Observation

    obs = Observation("write_metrics")
    observed = df.observe(obs, *[c.alias(k) for k, c in metrics.items()])
    write_parquet(observed, path, partition_by=partition_by, mode=mode)
    return obs.get


def upsert_by_key(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str,
    partition_by: list[str] | None = None,
) -> None:
    """Key-level upsert into a Parquet table (poor-man's MERGE; a table
    format like Delta/Iceberg does this transactionally — this is the
    dependency-free equivalent with read-modify-write semantics).

    Existing rows whose key appears in ``updates`` are replaced; new keys
    appended. When ``partition_by`` is set and updates only touch some
    partitions, use dynamic partition overwrite via
    serving.materialize_serving_table instead — it avoids rewriting
    untouched partitions. (Without partition_by this is a full-table
    read-modify-write by construction — at real scale hand the problem to a
    transactional table format.)

    The merged output is written ONCE to a temp dir (the plan reads
    ``path`` lazily, so an in-place overwrite would delete its own input
    mid-scan), then swapped in with two directory renames — not a second
    write job, which would double the most expensive daily operation.
    Crash-safety: a run that died between the renames leaves
    ``path`` missing and ``path__upsert_old`` present; the next call
    restores the backup before merging, so no committed state is ever lost.

    LOCAL filesystem only, enforced loudly: the swap is os.rename-based,
    and on a remote store (s3a://, hdfs://) os.path.exists is always
    False — an EXISTING remote table would silently be treated as absent
    (merging nothing) before the rename finally failed. Same policy as
    the streaming stores' Hadoop-FS discovery: refuse early rather than
    degrade silently; at real scale this job belongs to a transactional
    table format.
    """
    import os as _os
    import re as _re
    import shutil as _shutil

    m = _re.match(r"^([A-Za-z][A-Za-z0-9+.-]*):(.*)$", path)
    if m and m.group(1) != "file":
        raise ValueError(
            f"upsert_by_key is rename-based and local-only; got scheme "
            f"{m.group(1)!r} ({path}) — use a transactional table format "
            "(Delta/Iceberg) or serving.materialize_serving_table's "
            "dynamic partition overwrite for remote stores"
        )
    if m:
        # Normalize a file: URI to the bare OS path BEFORE any os.path
        # logic — os.path.exists("file:///p") is always False, which would
        # silently treat an existing table as absent (keeping only
        # ``updates``) and then fail the final rename.
        rest = m.group(2)
        if rest.startswith("//"):
            rest = rest[2:]  # empty authority: file:///p -> /p
        if not rest.startswith("/"):
            raise ValueError(
                f"upsert_by_key needs a local absolute file: URI; got {path!r} "
                "(a non-empty authority or relative file: path is not local)"
            )
        path = rest
    base = path.rstrip("/")
    tmp = base + "__upsert_tmp"
    old = base + "__upsert_old"
    # recover from a previous crash between the two renames
    if not _os.path.exists(path) and _os.path.exists(old):
        _os.rename(old, path)
    # stale leftovers from an interrupted run are safe to discard
    _shutil.rmtree(tmp, ignore_errors=True)
    if _os.path.exists(path) and _os.path.exists(old):
        _shutil.rmtree(old, ignore_errors=True)

    if _os.path.exists(path):
        current = spark.read.parquet(path)
        kept = current.join(updates.select(key).distinct(), on=key, how="left_anti")
        merged = kept.unionByName(updates)
    else:
        merged = updates
    write_parquet(merged, tmp, partition_by=partition_by)
    if _os.path.exists(path):
        _os.rename(path, old)
    _os.rename(tmp, path)
    _shutil.rmtree(old, ignore_errors=True)
