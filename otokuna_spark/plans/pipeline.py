"""The otokuna end-to-end pipeline, Spark-first (SURVEY.md §3).

raw pages (sources/html.py) -> properties projection (F1-F8) -> geocode
enrich (J1) -> target (F9) -> clean (Q1-Q3) -> score + serve (J2, F10-F11,
O1). The reference runs these as five Lambda stages with S3 pickle hops
(svc/serverless.yml:111-197); here they are ONE lazy DAG — Catalyst
pipelines the parse into the scan, prunes unused raw columns, and
broadcast-joins the geocode dim. Optional Parquet checkpoints between
stages restore the reference's restartability contract (io.write_parquet).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import parsers as P
from ..operators import dedup, outliers

# 15-feature vector of the reference model (analysis.py:95-111)
FEATURE_COLS = [
    "building_age",
    "building_floors",
    "area",
    "min_floor",
    "max_floor",
    "n_rooms",
    "service_room",
    "living_room",
    "dining_room",
    "kitchen",
    "n_stations",
    "walk_time_station_min",
    "walk_time_station_avg",
    "latitude",
    "longitude",
]


def make_properties_df(raw: DataFrame, html_file_fetched_at: float | None = None) -> DataFrame:
    """F1-F8 wide projection (scraping.py:316-363) with the reference's
    row-drop semantics: any ParsingError in building, room, layout,
    transportation, or address drops the ROW (scraping.py:274-285,354-356)
    — here: null-out + one filter, all inside whole-stage codegen."""
    walk_entries = F.filter(F.col("transportation_texts"), lambda x: x != "")
    walk_times = F.transform(walk_entries, P.parse_transportation)

    df = raw.select(
        F.regexp_extract(F.col("detail_href"), r"jnc_([0-9]*)/", 1).alias("jnc_id"),
        F.col("category_text").alias("building_category"),
        F.col("title_text").alias("building_title"),
        F.col("address_text").alias("building_address"),
        F.col("transportation_texts").alias("building_transportation"),
        P.parse_age(F.col("age_text")).alias("building_age"),
        P.parse_floors(F.col("floors_text")).alias("building_floors"),
        P.parse_money(F.col("rent_text"), unit="万円").alias("rent"),
        P.parse_money(F.col("admin_fee_text"), unit="円").alias("admin_fee"),
        P.parse_money(F.col("deposit_text"), unit="万円").alias("deposit"),
        P.parse_money(F.col("gratuity_text"), unit="万円").alias("gratuity"),
        F.col("layout_text").alias("layout"),
        P.parse_area(F.col("area_text")).alias("area"),
        P.parse_min_floor(F.col("floor_text")).alias("min_floor"),
        P.parse_max_floor(F.col("floor_text")).alias("max_floor"),
        F.concat(F.lit("https://suumo.jp"), F.col("detail_href")).alias("url"),
        F.col("new_arrival"),
        P.parse_banner_timestamp(F.col("banner_script")).alias("html_file_banner_timestamp"),
        F.col("last_modified_at").alias("html_file_last_modified_at"),
        P.parse_n_rooms(F.col("layout_text")).alias("n_rooms"),
        P.parse_layout_flag(F.col("layout_text"), "S").alias("service_room"),
        P.parse_layout_flag(F.col("layout_text"), "L").alias("living_room"),
        P.parse_layout_flag(F.col("layout_text"), "D").alias("dining_room"),
        P.parse_layout_flag(F.col("layout_text"), "K").alias("kitchen"),
        F.size(walk_entries).cast("long").alias("n_stations"),
        F.array_min(walk_times).alias("walk_time_station_min"),
        (F.aggregate(walk_times, F.lit(0.0), lambda a, x: a + x) / F.size(walk_times)).alias(
            "walk_time_station_avg"
        ),
        P.parse_ward(F.col("address_text")).alias("ward"),
        P.parse_district(F.col("address_text")).alias("district"),
        # row-drop predicate inputs
        F.exists(walk_times, lambda x: x.isNull()).alias("__bad_walk"),
        F.col("source_file"),
        F.col("building_idx"),
        F.col("room_idx"),
    )

    required = [
        "jnc_id",
        "building_age",
        "building_floors",
        "rent",
        "admin_fee",
        "deposit",
        "gratuity",
        "area",
        "min_floor",
        "max_floor",
        "n_rooms",
        "ward",
    ]
    cond = F.lit(True)
    for c in required:
        cond = cond & F.col(c).isNotNull()
    cond = cond & (F.col("jnc_id") != "")
    # reference: min()/mean() of walking times raise on empty or failed
    # parse (scraping.py:348-356) -> drop
    cond = cond & (~F.col("__bad_walk")) & (F.col("n_stations") > 0)
    out = df.filter(cond).drop("__bad_walk")
    if html_file_fetched_at is not None:
        out = out.withColumn("html_file_fetched_at", F.lit(float(html_file_fetched_at)))
    return out


def add_address_coords(df: DataFrame, location_ref: DataFrame) -> DataFrame:
    """J1 — broadcast left geocode join on the kanji join key
    (analysis.py:57-73). Unmatched -> null lat/lon (dropped by clean)."""
    probe = df.withColumn("join_key", P.build_address_join_key(F.col("building_address")))
    return probe.join(F.broadcast(location_ref), on="join_key", how="left").drop("join_key")


def add_target_variable(df: DataFrame) -> DataFrame:
    """F9 — y = rent + admin_fee (analysis.py:76-78)."""
    return df.withColumn("y", (F.col("rent") + F.col("admin_fee")).cast("double"))


OUTLIER_COLS = ["area", "n_rooms", "building_age", "rent", "rent_admin_fee_ratio"]


def clean_df(df: DataFrame, stage_dedup: bool = False) -> DataFrame:
    """Q1-Q3 (analysis.py:81-90): keep-first dedup on jnc_id (file order),
    exact-percentile-equality outlier filter (with the transient
    admin_fee/rent ratio column), then drop rows with any null.

    ``stage_dedup=True`` materializes the deduped relation once
    (localCheckpoint) before the outlier stage. The outlier filter is
    inherently two passes over its input (quantile aggregation + the
    filter itself, guide §1.2) and BOTH subtrees re-run the keep-first
    window when the input is lazy — measured r16: the window pass ran
    twice (2 x 0.6 s at the 75k-listing bench shape) with only the
    upstream parse persisted. Staging here makes the window (and
    everything above it) run exactly once per call."""
    deduped = dedup.dedup_keep_first(
        df, ["jnc_id"], [F.asc("source_file"), F.asc("building_idx"), F.asc("room_idx")]
    )
    if stage_dedup:
        from ..operators import persistence

        deduped = persistence.stage(deduped, False)
    # pandas division-by-zero yields inf (or NaN for 0/0) and the reference
    # KEEPS those rows (equality vs the quantile is False; dropna ignores
    # inf) — Spark's x/0.0 is NULL, which would poison the outlier flag and
    # silently drop the row, so mirror the float semantics explicitly
    with_ratio = deduped.withColumn(
        "rent_admin_fee_ratio",
        F.when(F.col("rent") != 0, F.col("admin_fee").cast("double") / F.col("rent").cast("double"))
        .when(F.col("admin_fee") != 0, F.lit(float("inf")))
        .otherwise(F.lit(float("nan"))),
    )
    filtered = outliers.remove_outliers(with_ratio, OUTLIER_COLS, 0.99).drop("rent_admin_fee_ratio")
    return filtered.na.drop("any")


def score_and_serve(predictions: DataFrame, scraped: DataFrame, top_k: int | None = None) -> DataFrame:
    """J2 + F10 + O1 + F11 (app/app.py:155-166): join predictions back to
    the scraped table, score = y_pred / y, order by score desc, rename for
    display. ``top_k`` turns the global sort into TakeOrderedAndProject."""
    joined = predictions.join(scraped, on="jnc_id", how="left")
    scored = joined.withColumn("otokuna_score", F.col("y_pred") / F.col("y"))
    ordered = scored.orderBy(F.desc("otokuna_score"))
    if top_k is not None:
        ordered = ordered.limit(top_k)
    return ordered.withColumnRenamed("y", "monthly_cost").withColumnRenamed(
        "y_pred", "monthly_cost_predicted"
    )


def scrape_pipeline(
    spark,
    pages_path: str,
    location_ref: DataFrame | None = None,
    html_file_fetched_at: float | None = None,
    persist_intermediate: bool = True,
) -> DataFrame:
    """§3.1/§3.2 stages 1-5 as one lazy DAG: pages -> raw -> properties ->
    enrich -> target -> clean.

    ``clean_df`` scans its input twice (quantile aggregation + outlier
    filter), and the two MapInPandas branches do NOT canonicalize to a
    reused exchange — measured with an accumulator, the Python page parse
    runs twice without a cache. ``persist_intermediate`` stages the
    DEDUPED relation (clean_df's ``stage_dedup`` — localCheckpoint) so
    both the Python parse AND the keep-first window run exactly once;
    r15 persisted the pre-window parse output instead, which kept the
    parse single-run but re-ran the window per outlier pass (measured
    r16: 2 x 0.6 s at the 1,500-page bench shape). At a real crawl's
    scale re-parsing the whole corpus twice is the difference that
    matters. The checkpoint blocks live until the relation is
    garbage-collected — the price of materializing mid-pipeline.
    """
    from ..sources.html import read_raw_pages

    raw = read_raw_pages(spark, pages_path)
    props = make_properties_df(raw, html_file_fetched_at)
    if location_ref is not None:
        props = add_address_coords(props, location_ref)
    props = add_target_variable(props)
    return clean_df(props, stage_dedup=persist_intermediate)
