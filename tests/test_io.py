"""io-layer tests: partitioned layout -> partition pruning (S8), small-file
compaction (S9), serving-table materialization (R3)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from otokuna_spark import io as oio


def test_partition_pruning_replaces_prefix_listing(spark, tmp_path):
    # S8: the reference lists S3 keys by regex to find a date's predictions
    # (app/app.py:283-294). Partitioned parquet turns that into partition
    # pruning — verify the plan prunes to ONE partition directory.
    df = spark.createDataFrame(
        [(i, f"2021-07-{(i % 3) + 1:02d}", float(i)) for i in range(300)],
        ["jnc_id", "date", "y_pred"],
    )
    out = str(tmp_path / "preds")
    oio.write_parquet(df, out, partition_by=["date"])
    assert sorted(d for d in os.listdir(out) if d.startswith("date=")) == [
        "date=2021-07-01",
        "date=2021-07-02",
        "date=2021-07-03",
    ]
    read = spark.read.parquet(out).filter(F.col("date") == "2021-07-02")
    assert read.count() == 100
    # the scan node prunes on the partition column (inputFiles() reports
    # the pre-pruning listing, so the plan is the evidence)
    plan = read._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(date" in plan


def test_compaction(spark, tmp_path):
    src = str(tmp_path / "many")
    spark.range(1000).repartition(50).write.parquet(src)
    n_src = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_src >= 50
    dst = str(tmp_path / "few")
    oio.compact(spark, src, dst, target_files=4)
    n_dst = len([f for f in os.listdir(dst) if f.endswith(".parquet")])
    assert n_dst <= 4
    assert spark.read.parquet(dst).count() == 1000


def test_union_daily_batches(spark):
    # §2.8: daily same-schema batches union with unionByName
    d1 = spark.createDataFrame([(1, "a")], ["k", "v"])
    d2 = spark.createDataFrame([(2, "b")], ["k", "v"]).select("v", "k")  # column order differs
    u = d1.unionByName(d2)
    assert u.count() == 2
    assert set(u.columns) == {"k", "v"}


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    from pyspark.sql import functions as F  # noqa: F811

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    oio.write_bucketed(orders, "b_orders", ["o_orderkey"], n_buckets=8)
    oio.write_bucketed(li.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", ["o_orderkey"], n_buckets=8)
    # co-located: the join must plan without a shuffle on either side
    assert oio.bucketed_join_is_shuffle_free(spark, "b_orders", "b_lineitem", "o_orderkey")
    # and a plain (non-bucketed) join of the same data does shuffle
    plain = orders.join(li, orders.o_orderkey == li.l_orderkey)
    plain_plan = plain._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in plain_plan or "BroadcastExchange" in plain_plan
    n_bucketed = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey").count()
    assert n_bucketed == plain.count()
    # NEGATIVE case: the same tables written WITHOUT bucketing must report
    # shuffle-free == False (guards against the diagnostic matching a
    # string the plan never prints and passing vacuously). Broadcast is
    # disabled so the small side can't turn the join shuffle-free for the
    # wrong reason.
    spark.sql("DROP TABLE IF EXISTS p_orders")
    spark.sql("DROP TABLE IF EXISTS p_lineitem")
    orders.write.mode("overwrite").saveAsTable("p_orders")
    li.withColumnRenamed("l_orderkey", "o_orderkey").write.mode("overwrite").saveAsTable("p_lineitem")
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert not oio.bucketed_join_is_shuffle_free(spark, "p_orders", "p_lineitem", "o_orderkey")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
    spark.sql("DROP TABLE IF EXISTS p_orders")
    spark.sql("DROP TABLE IF EXISTS p_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_upsert_by_key(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["k", "v"])
    oio.upsert_by_key(spark, path, base, "k")
    updates = spark.createDataFrame([(2, "B"), (4, "d")], ["k", "v"])
    oio.upsert_by_key(spark, path, updates, "k")
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "d"}
    # idempotent re-apply
    oio.upsert_by_key(spark, path, updates, "k")
    assert spark.read.parquet(path).count() == 4


def test_upsert_file_uri_sees_existing_table(spark, tmp_path):
    # Regression: a file:// URI used to pass the remote-scheme guard but
    # then hit the raw os.path.exists with the schemed string — an
    # EXISTING table was treated as absent (merge kept only `updates`)
    # and the final os.rename failed. The URI is normalized to the bare
    # OS path before any os.path logic.
    import pytest

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    oio.upsert_by_key(spark, path, base, "k")
    updates = spark.createDataFrame([(2, "B"), (3, "c")], ["k", "v"])
    oio.upsert_by_key(spark, "file://" + path, updates, "k")
    got = {(r.k, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}
    # single-slash form normalizes too; non-local authority refused loudly
    oio.upsert_by_key(spark, "file:" + path, updates, "k")
    assert spark.read.parquet(path).count() == 3
    with pytest.raises(ValueError, match="authority"):
        oio.upsert_by_key(spark, "file://otherhost" + path, updates, "k")
    with pytest.raises(ValueError, match="local-only"):
        oio.upsert_by_key(spark, "s3a://bucket/tbl", updates, "k")


def test_upsert_single_write_job(spark, tmp_path, monkeypatch):
    # the merge must be written exactly ONCE (tmp write + directory swap) —
    # a second write job would double the most expensive daily operation
    path = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    oio.upsert_by_key(spark, path, base, "k")

    calls = []
    real = oio.write_parquet

    def counting(df, p, partition_by=None, mode="overwrite"):
        calls.append(p)
        real(df, p, partition_by=partition_by, mode=mode)

    monkeypatch.setattr(oio, "write_parquet", counting)
    updates = spark.createDataFrame([(2, "B"), (3, "c")], ["k", "v"])
    oio.upsert_by_key(spark, path, updates, "k")
    assert len(calls) == 1
    got = {(r.k, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}


def test_upsert_recovers_from_crash_between_renames(spark, tmp_path, monkeypatch):
    import os

    path = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    oio.upsert_by_key(spark, path, base, "k")

    # crash exactly between the two renames: path -> old succeeded, tmp ->
    # path never happened
    real_rename = os.rename
    state = {"n": 0}

    def failing_rename(src, dst):
        real_rename(src, dst)
        state["n"] += 1
        if state["n"] == 1:
            raise RuntimeError("simulated crash after first rename")

    updates = spark.createDataFrame([(2, "B"), (3, "c")], ["k", "v"])
    monkeypatch.setattr(os, "rename", failing_rename)
    try:
        oio.upsert_by_key(spark, path, updates, "k")
    except RuntimeError:
        pass
    monkeypatch.setattr(os, "rename", real_rename)
    assert not os.path.exists(path)  # mid-crash state: table dir missing

    # next upsert restores the backup and applies cleanly
    oio.upsert_by_key(spark, path, updates, "k")
    got = {(r.k, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}
    assert not os.path.exists(path + "__upsert_old")
    assert not os.path.exists(path + "__upsert_tmp")


def test_read_jsonl_explicit_schema_quarantines_corrupt(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world"}\n'
        'this line is not json\n'
        '{"doc_id": 2, "text": "second"}\n'
    )
    df = oio.read_jsonl(spark, str(p), schema="doc_id BIGINT, text STRING")
    # Spark disallows filtering on ONLY the corrupt column of an uncached
    # json relation (it would force a re-parse) — cache before the split
    df = df.cache()
    # malformed line lands in _corrupt_record, never fails the job
    good = df.where("_corrupt_record IS NULL")
    bad = df.where("_corrupt_record IS NOT NULL")
    assert {r.doc_id for r in good.collect()} == {1, 2}
    assert bad.count() == 1
    # explicit schema means NO inference scan: the read schema is exactly
    # what was declared (plus the quarantine column)
    assert [f.name for f in df.schema.fields] == ["doc_id", "text", "_corrupt_record"]


def test_write_training_shards_deterministic(spark, tmp_path):
    import glob

    df = spark.createDataFrame(
        [(i, f"doc {i}", i % 7) for i in range(1000)], ["doc_id", "text", "grp"]
    )
    out1 = str(tmp_path / "shards1")
    out2 = str(tmp_path / "shards2")
    # two writes from DIFFERENT input partitionings must produce the same
    # doc->shard assignment and in-shard order
    oio.write_training_shards(df.repartition(3), out1, n_shards=8, shard_key="doc_id",
                              sort_within=["doc_id"])
    oio.write_training_shards(df.repartition(11), out2, n_shards=8, shard_key="doc_id",
                              sort_within=["doc_id"])

    def shard_contents(out):
        files = sorted(glob.glob(out + "/part-*"))
        assert len(files) == 8
        return [tuple(r.doc_id for r in spark.read.parquet(f).collect()) for f in files]

    assert shard_contents(out1) == shard_contents(out2)
    total = spark.read.parquet(out1).count()
    assert total == 1000


def test_write_training_shards_max_records_splits_files(spark, tmp_path):
    import glob

    df = spark.createDataFrame([(i,) for i in range(100)], ["doc_id"])
    out = str(tmp_path / "capped")
    oio.write_training_shards(df, out, n_shards=2, shard_key="doc_id",
                              max_records_per_file=10)
    files = glob.glob(out + "/part-*")
    # 2 shards x ~50 rows at <=10 rows/file -> ~10 files, none over the cap
    assert len(files) >= 10
    for f in files:
        assert spark.read.parquet(f).count() <= 10


def test_write_with_metrics_single_pass(spark, tmp_path):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (None, "d")], "k BIGINT, v STRING"
    )
    out = str(tmp_path / "observed")
    got = oio.write_with_metrics(
        df,
        out,
        {
            "n": F.count(F.lit(1)),
            "null_k": F.sum(F.col("k").isNull().cast("long")),
            "max_k": F.max("k"),
        },
    )
    assert got == {"n": 4, "null_k": 1, "max_k": 3}
    assert spark.read.parquet(out).count() == 4


def test_write_zordered_tightens_per_file_ranges(spark, tmp_path):
    """Z-order clustering: per-file (x, y) footer ranges must cover far
    less area than an unclustered layout of the same rows — the property
    that makes min/max file pruning work on EVERY zorder column."""
    import glob

    import pyarrow.parquet as pq

    from otokuna_spark import io as oio

    n = 20_000
    df = (
        spark.range(n)
        .selectExpr(
            "cast(pmod(id * 2654435761, 10000) as double) as x",
            "cast(pmod(id * 40503, 10000) as double) as y",
            "id as payload",
        )
    )
    z_path = str(tmp_path / "zorder")
    r_path = str(tmp_path / "plain")
    oio.write_zordered(df, z_path, ["x", "y"], n_files=16)
    df.repartition(16).write.mode("overwrite").parquet(r_path)

    def coverage(path):
        total = 0.0
        files = [f for f in glob.glob(path + "/*.parquet")]
        assert len(files) >= 8
        for f in files:
            md = pq.ParquetFile(f).metadata
            mins, maxs = {}, {}
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    name = col.path_in_schema
                    if name in ("x", "y") and col.statistics is not None:
                        st = col.statistics
                        mins[name] = min(mins.get(name, st.min), st.min)
                        maxs[name] = max(maxs.get(name, st.max), st.max)
            area = ((maxs["x"] - mins["x"]) / 10000.0) * ((maxs["y"] - mins["y"]) / 10000.0)
            total += area
        return total

    cov_z = coverage(z_path)
    cov_r = coverage(r_path)
    # unclustered files each span ~the whole (x, y) square (sum ~16);
    # z-ordered files tile it (sum ~1-2)
    assert cov_z < cov_r / 4, (cov_z, cov_r)
    # contents identical
    a = sorted(r["payload"] for r in spark.read.parquet(z_path).collect())
    assert a == list(range(n))


def test_upsert_by_key_refuses_remote_schemes(spark):
    """The rename-based upsert must fail LOUDLY on remote stores:
    os.path.exists is always False there, so an existing remote table
    would silently be treated as absent before the swap failed late."""
    import pytest

    df = spark.createDataFrame([(1, "a")], "k long, v string")
    with pytest.raises(ValueError, match="local-only"):
        oio.upsert_by_key(spark, "s3a://bucket/tbl", df, "k")
    with pytest.raises(ValueError, match="local-only"):
        oio.upsert_by_key(spark, "hdfs://nn/tbl", df, "k")
