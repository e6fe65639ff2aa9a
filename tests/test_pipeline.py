"""End-to-end pipeline tests: HTML pages -> properties -> enrich -> clean
-> score (SURVEY.md §3.1-§3.3), on synthetic fixture pages."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from otokuna_spark.plans import pipeline
from otokuna_spark.sources.html import read_raw_pages
from otokuna_spark.sources.location import read_location_reference

from .fixtures import building, page, room, write_location_csv


def _write_pages(tmp_path):
    pages = {
        # page 1: normal building (2 rooms) + one room that later duplicates
        "page_000001.html": page(
            [
                building(
                    [room("000000000001", rent="6.9万円", layout="1K", new=True), room("000000000002", layout="2DK", floor="B1-1階")]
                ),
                building(
                    [room("000000000003", rent="12万円", layout="3LDK", area="80.5m2")],
                    address="東京都大田区中央１",
                    title="第二テスト",
                    age="新築",
                ),
                # distinct building_age so the Q1 equality quirk (duplicated
                # max -> q99 == value -> row flagged) does not trip on the
                # small fixture; reference behaves identically
                building(
                    [room("000000000006", rent="8.1万円")],
                    address="東京都新宿区西新宿",
                    title="第三テスト",
                    age="築25年",
                ),
            ]
        ),
        # page 2: duplicate jnc_id 000000000001 (different rent -> must keep
        # page 1's row), a driving-time building (rows dropped), a
        # non-Tokyo building (rows dropped)
        "page_000002.html": page(
            [
                building([room("000000000001", rent="9.9万円")]),
                building(
                    [room("000000000004")],
                    transportation=("東京メトロ東西線/行徳駅 車15分(5.1km)",),
                    title="車アクセス",
                ),
                building([room("000000000005")], address="神奈川県横浜市中区x１", title="横浜"),
            ]
        ),
    }
    d = tmp_path / "pages"
    d.mkdir()
    for name, content in pages.items():
        (d / name).write_text(content, encoding="utf-8")
    return str(d)


def test_raw_extraction(spark, tmp_path):
    path = _write_pages(tmp_path)
    raw = read_raw_pages(spark, path)
    rows = raw.collect()
    assert len(rows) == 7  # all rooms surface raw; drops happen downstream
    by_id = {r["detail_href"]: r for r in rows}
    r1 = by_id["/chintai/jnc_000000000001/?bc=100000000001"]
    assert r1["category_text"] == "賃貸マンション"
    assert r1["address_text"] == "東京都渋谷区恵比寿南１"
    assert r1["transportation_texts"] == ["ＪＲ山手線/恵比寿駅 歩5分", "東京メトロ日比谷線/恵比寿駅 歩7分"]
    assert "times=1609140469000" in r1["banner_script"]


def test_properties_projection_and_row_drops(spark, tmp_path):
    path = _write_pages(tmp_path)
    props = pipeline.make_properties_df(read_raw_pages(spark, path), html_file_fetched_at=1609140460.0)
    rows = props.collect()
    ids = sorted(r["jnc_id"] for r in rows)
    # 000000000004 dropped (driving time), 000000000005 dropped (non-Tokyo);
    # the duplicate 000000000001 survives twice until clean_df
    assert ids == ["000000000001", "000000000001", "000000000002", "000000000003", "000000000006"]
    golden = next(r for r in rows if r["jnc_id"] == "000000000001" and r["rent"] == 69000)
    assert golden["building_age"] == 10
    assert golden["building_floors"] == 5
    assert golden["admin_fee"] == 3000
    assert golden["gratuity"] == 0  # '-' -> 0
    assert golden["n_rooms"] == 1 and golden["kitchen"] and not golden["living_room"]
    assert golden["n_stations"] == 2
    assert golden["walk_time_station_min"] == 5.0
    assert golden["walk_time_station_avg"] == 6.0
    assert golden["ward"] == "渋谷区" and golden["district"] == "恵比寿南"
    assert golden["new_arrival"] is True
    assert golden["html_file_banner_timestamp"] == 1609140469.0
    assert golden["url"].startswith("https://suumo.jp/chintai/jnc_000000000001/")
    b1 = next(r for r in rows if r["jnc_id"] == "000000000002")
    assert (b1["min_floor"], b1["max_floor"]) == (0, 1)  # B1-1階
    shinchiku = next(r for r in rows if r["jnc_id"] == "000000000003")
    assert shinchiku["building_age"] == 0  # 新築


def test_enrich_clean_score_end_to_end(spark, tmp_path):
    pages_path = _write_pages(tmp_path)
    loc_csv = str(tmp_path / "location.csv")
    write_location_csv(loc_csv)
    loc = read_location_reference(spark, loc_csv)

    cleaned = pipeline.scrape_pipeline(spark, pages_path, location_ref=loc, html_file_fetched_at=1609140460.0)
    rows = {r["jnc_id"]: r for r in cleaned.collect()}
    # duplicate resolved keep-FIRST (page 1 rent), geocode join hit
    assert rows["000000000001"]["rent"] == 69000
    assert abs(rows["000000000001"]["latitude"] - 35.644942) < 1e-9
    assert rows["000000000001"]["y"] == 72000.0  # rent + admin_fee
    # 大田区中央１ -> 中央一丁目 matched too
    assert abs(rows["000000000003"]["latitude"] - 35.573764) < 1e-9
    # block-number-less address 西新宿 matched as-is
    assert abs(rows["000000000006"]["latitude"] - 35.689634) < 1e-9
    assert set(rows) == {"000000000001", "000000000002", "000000000003", "000000000006"}

    # serving query: predictions join + score + order
    preds = spark.createDataFrame(
        [("000000000001", 72000.0, 80000.0), ("000000000003", 126000.0, 110000.0)],
        ["jnc_id", "y", "y_pred"],
    )
    served = pipeline.score_and_serve(preds, cleaned.drop("y"), top_k=10).collect()
    assert [r["jnc_id"] for r in served] == ["000000000001", "000000000003"]  # sorted by score desc
    assert abs(served[0]["otokuna_score"] - 80000.0 / 72000.0) < 1e-12
    assert "monthly_cost" in served[0].asDict() and "monthly_cost_predicted" in served[0].asDict()


def test_zip_source(spark, tmp_path):
    import zipfile

    pages_path = _write_pages(tmp_path)
    zpath = tmp_path / "crawl.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        for name in sorted(os.listdir(pages_path)):
            zf.write(os.path.join(pages_path, name), name)
    raw = read_raw_pages(spark, str(zpath))
    assert raw.count() == 7


def test_multimodal_plumbing(spark):
    from otokuna_spark.sources import multimodal

    df = spark.createDataFrame(
        [(1, bytes(range(256)) * 8), (2, b"\x10\x20" * 4096)], ["media_id", "data"]
    )
    feats = multimodal.image_features(df).collect()
    assert len(feats) == 2
    f1 = next(r for r in feats if r["media_id"] == 1)
    assert len(f1["feature"]) == 8
    assert abs(sum(f1["feature"]) - 1.0) < 1e-5  # normalized histogram
    # determinism of the stub decoder
    feats2 = multimodal.image_features(df).collect()
    assert sorted((r["media_id"], r["sha256"]) for r in feats) == sorted(
        (r["media_id"], r["sha256"]) for r in feats2
    )
    frames = multimodal.frame_sample(df, every_n=2).collect()
    assert {r["media_id"] for r in frames} == {1, 2}
    assert all(len(r["frame_bytes"]) <= 1024 for r in frames)


def test_bmp_codec_golden_bytes():
    """decode_bmp against HAND-BUILT golden bytes (not the encoder — a
    shared encoder/decoder bug cannot hide here): 2x2 24-bit BMP, row
    padding 2 bytes (3*2=6 -> 8), bottom-up rows."""
    import struct

    import numpy as np

    from otokuna_spark.sources import multimodal

    # pixels: top row [10, 20], bottom row [30, 40] — stored bottom-up
    row_bottom = bytes([30, 30, 30, 40, 40, 40]) + b"\x00\x00"
    row_top = bytes([10, 10, 10, 20, 20, 20]) + b"\x00\x00"
    header = struct.pack("<2sIHHI", b"BM", 54 + 16, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, 16, 2835, 2835, 0, 0)
    golden = header + info + row_bottom + row_top
    w, h, px = multimodal.decode_bmp(golden)
    assert (w, h) == (2, 2)
    assert px.tolist() == [[10, 20], [30, 40]]
    # encoder round-trip reproduces the golden bytes exactly
    assert multimodal.encode_bmp(np.array([[10, 20], [30, 40]], dtype=np.uint8)) == golden


def test_bmp_codec_roundtrip_and_dispatch():
    import numpy as np
    import pytest

    from otokuna_spark.sources import multimodal

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(13, 7), dtype=np.uint8)  # odd width -> padding
    data = multimodal.encode_bmp(px)
    assert len(data) == 54 + 13 * ((3 * 7 + 3) // 4 * 4)
    w, h, out = multimodal.decode_bmp(data)
    assert (w, h) == (7, 13)
    assert np.array_equal(out, px)  # exact: R=G=B luma recovers the channel
    # decode_image dispatches BMP to the real parser, others to the stub
    assert np.array_equal(multimodal.decode_image(data)[2], px)
    sw, sh, spx = multimodal.decode_image(b"\x89PNG fake payload")
    assert spx.shape == (sh, sw)  # stub fallback, no raise
    with pytest.raises(ValueError, match="BMP"):
        multimodal.decode_bmp(b"\x89PNG fake payload")


def test_wav_codec_roundtrip():
    import numpy as np
    import pytest

    from otokuna_spark.sources import multimodal

    samples = (np.arange(5000, dtype=np.int64) * 37 % 65536 - 32768).astype(np.int16)
    data = multimodal.encode_wav(samples, sample_rate=8000)
    rate, out = multimodal.decode_wav(data)
    assert rate == 8000
    assert np.array_equal(out, samples)
    with pytest.raises(Exception):
        multimodal.decode_wav(b"not a wav at all")


def test_image_features_real_bmp_exact_stats(spark):
    """image_features over REAL encoded BMPs: decoded width/height/mean
    must equal the source pixels exactly — the codec path, end to end
    through the Arrow-batched UDF."""
    import numpy as np

    from otokuna_spark.sources import multimodal

    imgs = {}
    rows = []
    for i in range(4):
        px = np.full((4 + i, 6), i * 10 + 1, dtype=np.uint8)
        imgs[i] = px
        rows.append((i, bytearray(multimodal.encode_bmp(px))))
    df = spark.createDataFrame(rows, "media_id long, data binary")
    feats = {r["media_id"]: r for r in multimodal.image_features(df).collect()}
    for i, px in imgs.items():
        assert feats[i]["width"] == 6 and feats[i]["height"] == 4 + i
        assert feats[i]["mean_intensity"] == float(px.mean())


def test_audio_windows_wav_container(spark):
    """audio_windows with decode_fn=decode_wav: windows follow the
    CONTAINER's sample rate and the window payloads are the decoded
    samples, byte-exact."""
    import numpy as np

    from otokuna_spark.sources import multimodal

    samples = (np.arange(4000, dtype=np.int64) * 13 % 65536 - 32768).astype(np.int16)
    wav = multimodal.encode_wav(samples, sample_rate=1000)  # 4 s at 1 kHz
    df = spark.createDataFrame([(7, bytearray(wav))], "media_id long, data binary")
    out = multimodal.audio_windows(
        df, window_s=1.0, hop_s=0.5, sample_rate=999_999, decode_fn=multimodal.decode_wav
    ).collect()
    # 4000 samples, win 1000, hop 500 -> starts 0..3000 full, 3500 tail(500)==win//2 kept
    assert [(r["window_idx"], r["start_sample"], r["n_samples"]) for r in sorted(out, key=lambda r: r["window_idx"])] == [
        (0, 0, 1000), (1, 500, 1000), (2, 1000, 1000), (3, 1500, 1000),
        (4, 2000, 1000), (5, 2500, 1000), (6, 3000, 1000), (7, 3500, 500),
    ]
    w3 = next(r for r in out if r["window_idx"] == 3)
    assert np.array_equal(np.frombuffer(w3["window_bytes"], dtype="<i2"), samples[1500:2500])


def test_clean_df_keeps_zero_rent_rows(spark):
    # rent_text '-' parses to rent=0; pandas computes admin_fee/0 = inf (or
    # NaN for 0/0) and KEEPS the row (quantile-equality is False, dropna
    # ignores inf). Spark division by zero is NULL — the guard must not let
    # that silently drop the row. NaN (0/0) rows: ratio col is transient, so
    # they also survive to the end.
    from otokuna_spark.plans.pipeline import clean_df

    rows = [
        # jnc_id, source_file, building_idx, room_idx, area, n_rooms, building_age, rent, admin_fee
        ("a", "f1", 0, 0, 20.0, 1, 5, 100000, 5000),
        ("b", "f1", 0, 1, 25.0, 2, 10, 0, 3000),   # rent 0, admin > 0 -> inf ratio
        ("c", "f1", 0, 2, 30.0, 2, 15, 0, 0),      # 0/0 -> NaN ratio
        ("d", "f1", 0, 3, 35.0, 3, 20, 120000, 0),
    ]
    df = spark.createDataFrame(
        rows,
        "jnc_id string, source_file string, building_idx int, room_idx int, "
        "area double, n_rooms int, building_age int, rent long, admin_fee long",
    )
    out = clean_df(df)
    assert sorted(r.jnc_id for r in out.collect()) == ["a", "b", "c", "d"]


def test_multimodal_metadata_only_plan_prunes_binary(spark, tmp_path):
    # the multimodal docstring's claim, pinned: a width/height-only query
    # over a media table must never read the binary payload — ReadSchema at
    # the parquet scan excludes `data` entirely
    import contextlib
    import io
    import re

    rows = [(i, 32 + i, 24, bytes([i % 256]) * 64) for i in range(10)]
    df = spark.createDataFrame(rows, "media_id long, width int, height int, data binary")
    path = str(tmp_path / "media")
    df.write.parquet(path)
    q = (
        spark.read.parquet(path)
        .where(F.col("width") > 16)
        .select("media_id", "width", "height")
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain(mode="formatted")
    plan = buf.getvalue()
    schemas = re.findall(r"ReadSchema: (\S+)", plan)
    assert schemas, plan
    for s in schemas:
        assert "data" not in s, s
        assert "width" in s


def test_fast_tokenizer_matches_stdlib_dom():
    """The regex fast path in sources.html must build node-for-node the
    same tree as HTMLParser(convert_charrefs=True): entities in text and
    attributes, raw-text script content (no entity conversion, embedded
    '</div>' inside a JS string), comments/doctype dropped, self-closing
    and void tags, full-width text."""
    from otokuna_spark.sources import html as H

    from .fixtures import building, page, room

    def tree_eq(a, b, path="root"):
        assert a.tag == b.tag, path
        assert a.cls_pad == b.cls_pad, path
        assert list(a.attrs) == list(b.attrs), (path, a.attrs, b.attrs)
        assert a.text_parts == b.text_parts, (path, a.text_parts, b.text_parts)
        assert len(a.children) == len(b.children), path
        for i, (ca, cb) in enumerate(zip(a.children, b.children)):
            tree_eq(ca, cb, f"{path}/{ca.tag}[{i}]")

    pages = [
        page([building([room("000000000001", new=True), room("000000000002")])]),
        # entity + rawtext + malformed edge cases
        '<!DOCTYPE html><div class="a b"><!-- x --><br/>'
        '<span class="x" data-v="A&amp;B" flag>A&amp;B &times; &#65; &lt;tag&gt;</span>'
        '<script>if (a&&b<c) { x="</div>"; y="&amp;"; }</script>'
        "<p class='single'>tail <b>bold</b> 1 < 2</p></div>",
        "<ul><li>no closing tags<li>second item</ul>",
        "<table><tbody><tr><td class=\"unquoted\" width=5>cell</td></tr></tbody></table>",
    ]
    for p in pages:
        tree_eq(H.parse_dom(p), H.parse_dom_stdlib(p))


def test_extract_page_matches_stdlib_parse(monkeypatch):
    """Row-level parity: extract_page output is identical whether the DOM
    comes from the fast tokenizer or the stdlib parser."""
    from otokuna_spark.sources import html as H

    from .fixtures import building, page, room

    p = page(
        [
            building([room("000000000001", new=True), room("000000000002", gratuity="7.2万円")]),
            building([room("000000000003", floor="-")], title="別のビル", age="新築"),
        ]
    )
    fast = H.extract_page(p, "x.html", 1000.0)

    class _StdlibDom:
        def __init__(self, html):
            b = H._DomBuilder()
            b.feed(html)
            self.root = b.root
            self.scripts = b.scripts
            self.buildings = b.buildings

    monkeypatch.setattr(H, "_parse_page", _StdlibDom)
    slow = H.extract_page(p, "x.html", 1000.0)
    assert fast == slow and len(fast) == 3


def test_audio_windows_expansion(spark):
    """audio_windows: 1 clip -> overlapping windows with correct sample
    addressing; short tails dropped; byte slices line up with offsets."""
    from otokuna_spark.sources import multimodal

    # 3 seconds of fake 16kHz 16-bit PCM -> 6 windows at 1s/0.5s hop
    # (5 full + the half-window tail at 40000, kept because >= win/2)
    clip = bytes(range(256)) * (3 * 16_000 * 2 // 256)
    df = spark.createDataFrame([(1, clip), (2, b"\x00" * 100)], "media_id long, data binary")
    rows = multimodal.audio_windows(df).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    w1 = sorted(by_id[1], key=lambda r: r["window_idx"])
    assert [r["start_sample"] for r in w1] == [0, 8000, 16000, 24000, 32000, 40000]
    assert [r["n_samples"] for r in w1] == [16000] * 5 + [8000]
    assert bytes(w1[1]["window_bytes"]) == clip[8000 * 2 : 24000 * 2]
    # clip 2: 50 samples < half a window -> dropped entirely
    assert 2 not in by_id


def test_scrape_pipeline_parses_each_page_once(spark, tmp_path, monkeypatch):
    """clean_df's double scan (quantile agg + outlier filter) must not
    re-run the Python page parse: with persist_intermediate (default) the
    UDTF sees each listing exactly once; without it, twice — pinned here
    so a plan change that silently reintroduces the double parse fails."""
    import otokuna_spark.sources.html as H
    from otokuna_spark.plans.pipeline import scrape_pipeline

    pages = _write_pages(tmp_path)

    def run(persist):
        spark.catalog.clearCache()
        acc = spark.sparkContext.accumulator(0)
        real = H._extract_batches

        def counting(it):
            for pdf in real(it):
                acc.add(len(pdf))
                yield pdf

        monkeypatch.setattr(H, "_extract_batches", counting)
        scrape_pipeline(spark, pages, persist_intermediate=persist).count()
        monkeypatch.setattr(H, "_extract_batches", real)
        return acc.value

    parsed_once = run(True)
    parsed_twice = run(False)
    spark.catalog.clearCache()
    from otokuna_spark.sources.html import read_raw_pages

    n_raw = read_raw_pages(spark, pages).count()
    assert parsed_once == n_raw  # each raw listing crossed the UDTF once
    assert parsed_twice == 2 * parsed_once


def test_image_resize_nearest_exact_and_roundtrip(spark):
    """image_resize: FLOOR-mapped nearest-neighbor downsample is value-
    exact against a numpy reference, and the emitted thumbnail is real
    re-encoded BMP bytes that decode back to the same pixels."""
    import numpy as np

    from otokuna_spark.sources import multimodal

    px = ((np.arange(7 * 9) * 11 + 3) % 256).astype(np.uint8).reshape(7, 9)
    df = spark.createDataFrame(
        [(1, bytearray(multimodal.encode_bmp(px)))], "media_id long, data binary"
    )
    out = multimodal.image_resize(df, decode_fn=multimodal.decode_bmp).collect()
    assert len(out) == 1
    r = out[0]
    ref = px[np.ix_((np.arange(4) * 7) // 4, (np.arange(4) * 9) // 4)]
    assert (r["src_w"], r["src_h"], r["out_w"], r["out_h"]) == (9, 7, 4, 4)
    assert r["resized_sum"] == int(ref.sum())
    assert (r["p_first"], r["p_last"]) == (int(ref[0, 0]), int(ref[-1, -1]))
    w, h, decoded = multimodal.decode_bmp(bytes(r["resized_bmp"]))
    assert (w, h) == (4, 4) and (decoded == ref).all()
