"""Multi-day incremental pipeline integration (SURVEY §3.2's daily cron
contract): each day's crawl is scraped, enriched, cleaned, scored, and
upserted into the date-partitioned serving table; cross-day listings keep
the FIRST-seen row; re-running a day overwrites only that partition."""

from __future__ import annotations

from pyspark.sql import functions as F

from otokuna_spark.plans import pipeline, serving
from otokuna_spark.sources.html import read_raw_pages
from otokuna_spark.sources.location import read_location_reference

from .fixtures import building, page, room, write_location_csv


def _day_pages(tmp_path, day: str, rooms_spec):
    d = tmp_path / f"pages_{day}"
    d.mkdir(parents=True)
    # vary layout/area/age per row: uniform values would make the Q1
    # equality filter (q99 == the single distinct value) wipe the batch
    layouts = ["1K", "2DK", "3LDK", "2LDK", "1DK"]
    blds = [
        building(
            [room(jnc, rent=rent, layout=layouts[j % 5], area=f"{20 + 7 * j}.5m2")],
            address=addr,
            title=f"t{j}",
            age=f"築{5 + j}年",
        )
        for j, (jnc, rent, addr) in enumerate(rooms_spec)
    ]
    (d / "page_000001.html").write_text(page(blds), encoding="utf-8")
    return str(d)


def test_incremental_daily_serving(spark, tmp_path):
    loc_csv = str(tmp_path / "loc.csv")
    write_location_csv(loc_csv)
    loc = read_location_reference(spark, loc_csv)
    serving_path = str(tmp_path / "serving")

    days = {
        "2021-07-04": [
            ("000000000101", "6.9万円", "東京都渋谷区恵比寿南１"),
            ("000000000102", "7.5万円", "東京都大田区中央１"),
            ("000000000103", "9.9万円", "東京都新宿区西新宿"),
        ],
        # day 2 re-lists 101 at a new rent and adds a new listing
        "2021-07-05": [
            ("000000000101", "7.2万円", "東京都渋谷区恵比寿南１"),
            ("000000000104", "8.8万円", "東京都渋谷区千駄ヶ谷１"),
            ("000000000105", "5.5万円", "東京都大田区中央１"),
        ],
    }
    for day, spec in days.items():
        pages = _day_pages(tmp_path, day, spec)
        props = pipeline.make_properties_df(read_raw_pages(spark, pages))
        enriched = pipeline.add_target_variable(pipeline.add_address_coords(props, loc))
        cleaned = pipeline.clean_df(enriched)
        preds = cleaned.select("jnc_id", "y", (F.col("y") * 1.1).alias("y_pred"))
        serving.materialize_serving_table(preds, cleaned.drop("y"), serving_path, day)

    assert serving.available_dates(spark, serving_path) == ["2021-07-04", "2021-07-05"]
    d2 = serving.serving_view(spark, serving_path, "2021-07-05")
    ids_d2 = {r["jnc_id"] for r in d2.select("jnc_id").collect()}
    assert ids_d2 == {"000000000101", "000000000104", "000000000105"}

    # re-listing carries day-2's rent in day-2's partition; day-1 untouched
    d1 = spark.read.parquet(serving_path).filter(F.col("date") == "2021-07-04")
    rents_101 = {
        r["date"].isoformat() if hasattr(r["date"], "isoformat") else str(r["date"]): r["rent"]
        for r in spark.read.parquet(serving_path)
        .filter(F.col("jnc_id") == "000000000101")
        .select("date", "rent")
        .collect()
    }
    assert rents_101 == {"2021-07-04": 69000, "2021-07-05": 72000}
    assert d1.count() == 3

    # cross-day union + keep-first dedup (the historical-corpus view)
    full = spark.read.parquet(serving_path)
    from otokuna_spark.operators import dedup

    hist = dedup.dedup_keep_first(
        full.withColumn("date", F.col("date").cast("string")), ["jnc_id"], [F.asc("date")]
    )
    first_rent = {r["jnc_id"]: r["rent"] for r in hist.select("jnc_id", "rent").collect()}
    assert first_rent["000000000101"] == 69000  # day-1 row won
    assert len(first_rent) == 5

    # re-run day 2 (idempotent upsert: dynamic partition overwrite)
    pages = _day_pages(tmp_path / "rerun", "2021-07-05", days["2021-07-05"])
    props = pipeline.make_properties_df(read_raw_pages(spark, pages))
    enriched = pipeline.add_target_variable(pipeline.add_address_coords(props, loc))
    cleaned = pipeline.clean_df(enriched)
    preds = cleaned.select("jnc_id", "y", (F.col("y") * 1.1).alias("y_pred"))
    serving.materialize_serving_table(preds, cleaned.drop("y"), serving_path, "2021-07-05")
    assert spark.read.parquet(serving_path).count() == 6  # no duplication


def test_curate_corpus_funnel_monotone_and_deterministic(spark, tmp_path):
    """The capstone composition: funnel counts are monotone non-increasing,
    every planted defect class is removed, survivors are exactly right,
    and the result is byte-deterministic under repartitioning."""
    from pyspark.sql import functions as F

    from otokuna_spark.plans import curation

    filler = " ".join(f"w{i}" for i in range(30))
    other = " ".join(f"u{i}" for i in range(30))
    bench_text = "benchmark question about spark joins and windows " + " ".join(
        f"b{i}" for i in range(20)
    )
    rows = [
        (1, filler),                                # keeper
        (2, filler),                                # exact dup of 1
        (3, filler.replace("w29", "w99")),          # near dup of 1
        (4, "too short"),                           # quality drop
        (5, bench_text + " extra trailing tokens here"),  # contaminated
        (6, other),                                 # keeper
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame([(100, bench_text)], "doc_id long, text string")

    report = curation.curate_to_shards(
        docs, bench, str(tmp_path / "shards"), n_shards=2,
        jaccard_threshold=0.5, contamination_max_ppm=200_000,
    )
    assert report.n_raw == 6
    assert report.n_quality == 5          # doc 4 dropped
    assert report.n_exact == 4            # doc 2 dropped
    assert report.n_near_dup == 3         # doc 3 dropped
    assert report.n_decontaminated == 2   # doc 5 dropped
    assert report.n_selected == 2
    assert (
        report.n_raw >= report.n_quality >= report.n_exact
        >= report.n_near_dup >= report.n_decontaminated >= report.n_selected
    )
    out = spark.read.parquet(str(tmp_path / "shards"))
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 6]

    # determinism: same inputs, shuffled partitioning -> same curated set
    again = curation.curate_corpus(docs.repartition(5), bench)
    assert sorted(r["doc_id"] for r in again.collect()) == [1, 6]


def test_curate_corpus_selection_and_budget_stages(spark):
    from pyspark.sql import functions as F

    from otokuna_spark.plans import curation

    # 20 distinct docs; half look like the target (aaa-heavy)
    rows = [(i, " ".join(["aaa"] * 10 + [f"t{i}{j}" for j in range(5)])) for i in range(10)]
    rows += [(100 + i, " ".join(["zzz"] * 10 + [f"s{i}{j}" for j in range(5)])) for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame([(999, "nothing shared here at all")], "doc_id long, text string")

    selected = curation.curate_corpus(
        docs, bench, target_pred=F.col("doc_id") < 10, keep_top_frac=0.5
    )
    ids = sorted(r["doc_id"] for r in selected.collect())
    assert len(ids) == 10
    assert sum(1 for i in ids if i < 10) >= 8  # target-like docs dominate the keep set

    budgeted = curation.curate_corpus(docs, bench, token_budget=60)
    total = sum(r["__n_tokens"] for r in budgeted.select("__n_tokens").collect())
    assert 0 < total <= 60


def test_curate_corpus_boilerplate_scrub_stage(spark):
    """With the optional segment scrub on, boilerplate shared across many
    docs is removed BEFORE dedup — so docs that are near-dups only
    through boilerplate survive as distinct, and fully-boilerplate docs
    fall out at the quality floor."""
    from otokuna_spark.plans import curation

    nav = "NAV HOME ABOUT CONTACT LOGIN SIGNUP HELP TERMS"  # 8 tokens = 1 segment
    body_a = " ".join(f"a{i}" for i in range(16))
    body_b = " ".join(f"b{i}" for i in range(16))
    rows = [
        (1, f"{nav} {body_a}"),
        (2, f"{nav} {body_b}"),
        (3, f"{nav} {body_a.replace('a15', 'zz')}"),  # near-dup of 1 beyond the nav
        (4, nav),  # boilerplate-only page
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame([(100, "nothing shared here at all")], "doc_id long, text string")

    # without scrub the nav block glues nothing here (bodies differ), but
    # doc 4 survives as "content"
    plain = curation.curate_corpus(docs, bench, min_tokens=8, jaccard_threshold=0.6)
    assert 4 in {r["doc_id"] for r in plain.collect()}

    scrubbed = curation.curate_corpus(
        docs, bench, min_tokens=8, jaccard_threshold=0.6, segment_max_docs=3
    )
    ids = sorted(r["doc_id"] for r in scrubbed.collect())
    # doc 4 became empty and dropped at the floor; 3 collapsed into 1 as a
    # near-dup once the shared nav no longer pads the union side
    assert ids == [1, 2]
    texts = {r["doc_id"]: r["text"] for r in scrubbed.collect()}
    assert "NAV" not in texts[1] and texts[1].startswith("a0")
