"""Table-driven parser tests — same cases as the reference's parametrized
unit tests (libs/tests/test_scraping.py:29-115, test_analysis.py:8-17),
re-derived for the column-expression implementations. NULL replaces the
reference's ParsingError (row-drop semantics, SURVEY.md §2.2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from otokuna_spark.functions import parsers as P


def one(spark, s, colfn):
    df = spark.createDataFrame([(s,)], ["s"])
    return df.select(colfn(F.col("s")).alias("v")).collect()[0]["v"]


AGE_CASES = [
    ("新築", 0),
    ("築14年", 14),
    ("築5年", 5),
    ("築100年", 100),
    ("新築そっくり", None),
    ("", None),
]


@pytest.mark.parametrize("s,expected", AGE_CASES)
def test_parse_age(spark, s, expected):
    assert one(spark, s, P.parse_age) == expected


FLOORS_CASES = [
    ("3階建", 3),
    ("11階建", 11),
    ("地下1地上3階建", 3),
    ("地下2地上30階建", 30),
    ("平屋", None),
]


@pytest.mark.parametrize("s,expected", FLOORS_CASES)
def test_parse_floors(spark, s, expected):
    assert one(spark, s, P.parse_floors) == expected


TRANSPORT_CASES = [
    ("ＪＲ山手線/池袋駅 歩14分", 14.0),
    ("ＪＲ京浜東北線/大森駅 バス7分 (バス停)臼田坂下 歩1分", 1.0),
    ("東京メトロ東西線/行徳駅 車15分(5.1km)", None),  # driving time -> row drop
    ("都営浅草線/西馬込駅 歩18分", 18.0),
]


@pytest.mark.parametrize("s,expected", TRANSPORT_CASES)
def test_parse_transportation(spark, s, expected):
    assert one(spark, s, P.parse_transportation) == expected


MONEY_CASES = [
    ("-", 0),
    ("6.9万円", 69000),
    ("8.5万円", 85000),
    (".5万円", 5000),
    ("5000円", 5000),
    ("7.73万円", 77300),
    # int(float*mult) truncation parity with the reference (scraping.py:78):
    # 1.13*10000 = 11299.999... in binary -> truncates to 11299, not 11300
    ("1.13万円", 11299),
    ("未定", None),
]


@pytest.mark.parametrize("s,expected", MONEY_CASES)
def test_parse_money(spark, s, expected):
    assert one(spark, s, P.parse_money) == expected


def test_parse_money_explicit_unit(spark):
    assert one(spark, "6200円", lambda c: P.parse_money(c, unit="円")) == 6200
    assert one(spark, "7.73万円", lambda c: P.parse_money(c, unit="万円")) == 77300
    # wrong-unit input fails like the reference's ParsingError
    assert one(spark, "6200円", lambda c: P.parse_money(c, unit="万円")) is None


FLOOR_RANGE_CASES = [
    ("2階", (2, 2)),
    ("2-階", (2, 2)),  # improperly formatted single floor
    ("3-5階", (3, 5)),
    ("B1階", (0, 0)),  # zero-based basements
    ("B1-1階", (0, 1)),
    ("B2-B1階", (-1, 0)),
    ("1-B1階", (0, 1)),  # inverted range gets sorted
    ("階", (None, None)),
]


@pytest.mark.parametrize("s,expected", FLOOR_RANGE_CASES)
def test_parse_floor_range(spark, s, expected):
    got = (
        one(spark, s, P.parse_min_floor),
        one(spark, s, P.parse_max_floor),
    )
    assert got == expected


AREA_CASES = [("20.35m2", 20.35), ("30m2", 30.0), ("100.0m2", 100.0), ("20畳", None)]


@pytest.mark.parametrize("s,expected", AREA_CASES)
def test_parse_area(spark, s, expected):
    assert one(spark, s, P.parse_area) == expected


LAYOUT_CASES = [
    ("ワンルーム", (1, False, False, False, False)),
    ("1K", (1, False, False, False, True)),
    ("2DK", (2, False, False, True, True)),
    ("3LDK", (3, False, True, True, True)),
    ("4SLDK", (4, True, True, True, True)),
    ("5SLLDDKK", (5, True, True, True, True)),
    ("メゾネット", (None, None, None, None, None)),
]


@pytest.mark.parametrize("s,expected", LAYOUT_CASES)
def test_parse_layout(spark, s, expected):
    got = (
        one(spark, s, P.parse_n_rooms),
        one(spark, s, lambda c: P.parse_layout_flag(c, "S")),
        one(spark, s, lambda c: P.parse_layout_flag(c, "L")),
        one(spark, s, lambda c: P.parse_layout_flag(c, "D")),
        one(spark, s, lambda c: P.parse_layout_flag(c, "K")),
    )
    assert got == expected


ADDRESS_CASES = [
    ("東京都大田区中央１", ("大田区", "中央")),
    ("東京都渋谷区恵比寿南１", ("渋谷区", "恵比寿南")),
    ("東京都新宿区西新宿", ("新宿区", "西新宿")),
    ("神奈川県横浜市中区", (None, None)),  # non-Tokyo -> row drop
]


@pytest.mark.parametrize("s,expected", ADDRESS_CASES)
def test_parse_address(spark, s, expected):
    assert (one(spark, s, P.parse_ward), one(spark, s, P.parse_district)) == expected


JOIN_KEY_CASES = [
    # analysis.py:31-54 semantics incl. the golden pair of test_analysis.py
    ("東京都渋谷区恵比寿南１", "東京都渋谷区恵比寿南一丁目"),
    ("東京都練馬区桜台２", "東京都練馬区桜台二丁目"),
    ("東京都新宿区西新宿", "東京都新宿区西新宿"),
    ("東京都渋谷区千駄ヶ谷１", "東京都渋谷区千駄ケ谷一丁目"),  # ヶ -> ケ special case
    ("東京都渋谷区富ヶ谷２", "東京都渋谷区富ケ谷二丁目"),
    ("東京都渋谷区幡ヶ谷１２", "東京都渋谷区幡ケ谷十二丁目"),  # kanjize semantics: 12 -> 十二
    ("東京都足立区新田２１", "東京都足立区新田二十一丁目"),
    ("東京都北区豊島１０", "東京都北区豊島十丁目"),
    ("神奈川県横浜市中区", ""),  # unparseable -> ''
]


@pytest.mark.parametrize("s,expected", JOIN_KEY_CASES)
def test_build_address_join_key(spark, s, expected):
    assert one(spark, s, P.build_address_join_key) == expected


def test_parse_banner_timestamp(spark):
    s = "var x = 'foo&times=1609140469000&bar';"
    assert one(spark, s, P.parse_banner_timestamp) == 1609140469.0
    assert one(spark, "no banner here", P.parse_banner_timestamp) is None


def test_p12_date_helpers(spark):
    assert one(spark, "2021-07-04T12:34:56", P.iso_to_date) == "2021-07-04"
    # session tz is UTC in tests -> midnight epoch is exact
    assert one(spark, "2021-07-04", P.date_to_midnight_epoch) == 1625356800


# ---------------------------------------------------------- property-based

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False

if HAVE_HYPOTHESIS:
    import pytest as _pytest

    @settings(max_examples=30, deadline=None)
    @given(st.integers(min_value=0, max_value=9999))
    def test_parse_age_roundtrip_property(spark, years):
        assert one(spark, f"築{years}年", P.parse_age) == years

    @settings(max_examples=30, deadline=None)
    @given(
        st.integers(min_value=0, max_value=999),
        st.integers(min_value=0, max_value=99),
    )
    def test_parse_money_matches_reference_semantics(spark, whole, frac):
        # reference: int(float(s) * 10000) — truncation of the double product
        s = f"{whole}.{frac:02d}万円"
        expected = int(float(f"{whole}.{frac:02d}") * 10000)
        assert one(spark, s, P.parse_money) == expected

    @settings(max_examples=30, deadline=None)
    @given(st.integers(min_value=1, max_value=99), st.integers(min_value=1, max_value=99))
    def test_parse_floor_range_sorted_property(spark, a, b):
        s = f"{a}-{b}階"
        lo, hi = one(spark, s, P.parse_min_floor), one(spark, s, P.parse_max_floor)
        assert (lo, hi) == (min(a, b), max(a, b))

    @settings(max_examples=20, deadline=None)
    @given(st.integers(min_value=1, max_value=99))
    def test_int2kanji_matches_kanjize_semantics(spark, n):
        # independent model of kanjize for 1..99
        digits = "〇一二三四五六七八九"
        if n < 10:
            want = digits[n]
        else:
            tens, ones = divmod(n, 10)
            want = (digits[tens] if tens > 1 else "") + "十" + (digits[ones] if ones else "")
        got = one(spark, f"東京都渋谷区桜丘町{n}", P.build_address_join_key)
        assert got == f"東京都渋谷区桜丘町{want}丁目"


REMATCH_CASES = [
    # (parser, input, expected) — re.match semantics: trailing text allowed,
    # leading garbage rejected (ADVICE round 1)
    ("age", "築14年3ヶ月", 14),
    ("age", "リフォーム済築20年", None),
    ("floors", "地下1地上9階建ての", 9),
    ("floors", "木造2階建", None),
    ("area", "30.2m2(壁芯)", 30.2),
    ("area", "約30m2", None),
    ("n_rooms", "2LDK+S(納戸)", 2),
    ("n_rooms", "+2LDK", None),
]


def test_rematch_anchor_semantics(spark):
    fns = {
        "age": P.parse_age,
        "floors": P.parse_floors,
        "area": P.parse_area,
        "n_rooms": P.parse_n_rooms,
    }
    for kind, s, expected in REMATCH_CASES:
        assert one(spark, s, fns[kind]) == expected, (kind, s)


def test_layout_flag_checks_whole_string(spark):
    # reference tests `char in s` on the WHOLE string: the S after '+' counts
    assert one(spark, "2LDK+S(納戸)", lambda c: P.parse_layout_flag(c, "S")) is True
    assert one(spark, "2LDK", lambda c: P.parse_layout_flag(c, "S")) is False


def test_banner_timestamp_half_even(spark):
    # ms ending in exactly 500: Python round() is HALF_EVEN -> 1609140470.5
    # rounds to 1609140470 (even), not 1609140471 (HALF_UP)
    s = "...&times=1609140470500..."
    assert one(spark, s, P.parse_banner_timestamp) == 1609140470.0
    s2 = "...&times=1609140469500..."
    assert one(spark, s2, P.parse_banner_timestamp) == 1609140470.0  # .5 up to even
