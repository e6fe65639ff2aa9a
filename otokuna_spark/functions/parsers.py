"""Scalar parse functions P1-P12 (SURVEY.md §2.2) as native Column exprs.

The reference implements these as Python ``str -> scalar`` functions that
raise ``ParsingError`` on mismatch (libs/otokuna/scraping.py:25-127), which
drops the row. Here each parser is a composable Column expression returning
NULL on mismatch; ``filter(isnotnull(...))`` reproduces the row-drop. Native
expressions stay inside whole-stage codegen — no Python round-trip — which
is what makes the parse layer scale to a full 100 TB crawl corpus.

Only P11 (kanji-numeral join key, analysis.py:31-54) needs per-char logic;
it is still expressed JVM-side via ``transform``/``element_at`` over a
literal digit map rather than a Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------- helpers


def _extract(col: Column, pattern: str, group: int) -> Column:
    """regexp_extract returning NULL (not '') on no-match."""
    ex = F.regexp_extract(col, pattern, group)
    return F.when(ex != "", ex)


# ------------------------------------------------------------ P1..P9


def parse_age(col: Column) -> Column:
    """P1 — scraping.py:36-41: 新築 -> 0, else 築(\\d+)年 -> years.

    The reference uses ``re.match`` = anchored at START only (trailing text
    allowed, leading garbage rejected). Java's regexp_extract is find()
    (unanchored both ends), so every parser here prefixes ``^`` and omits
    ``$`` to mirror re.match exactly.
    """
    return F.when(col == "新築", F.lit(0)).otherwise(_extract(col, r"^築(\d+)年", 1).cast("long"))


def parse_floors(col: Column) -> Column:
    """P2 — scraping.py:44-49: (地下N地上)?M階建 -> above-ground floors M."""
    return _extract(col, r"^(地下\d+地上)?(\d+)階建", 2).cast("long")


def parse_transportation(col: Column) -> Column:
    """P3 — scraping.py:52-58: walking minutes, anchored at end of string.

    '…バス7分 …下 歩1分' -> 1.0; driving entries ('車15分') -> NULL (row drop).
    """
    return _extract(col, r"歩(\d+)分$", 1).cast("double")


# (?U) = UNICODE_CHARACTER_CLASS: Java's \d/\D are ASCII-only by default,
# but Python's are Unicode-aware and the reference relies on that — the
# district ends at a FULL-WIDTH block digit (e.g. 東京都大田区中央１).
_ADDR_RE = r"(?U)^東京都(.+区)(\D*)"


def parse_ward(col: Column) -> Column:
    """P4a — scraping.py:61-66: 東京都(.+区)… -> ward; non-Tokyo -> NULL."""
    return _extract(col, _ADDR_RE, 1)


def parse_district(col: Column) -> Column:
    """P4b — district = non-digit run after the ward ('' allowed)."""
    ok = F.regexp_extract(col, _ADDR_RE, 1) != ""
    return F.when(ok, F.regexp_extract(col, _ADDR_RE, 2))


def parse_money(col: Column, unit: str | None = None) -> Column:
    """P5 — scraping.py:69-78: '-' -> 0; (\\d*[.]?\\d+)<unit> -> int JPY.

    The reference computes ``int(float(num) * mult)`` — int() TRUNCATES the
    double product (e.g. '1.13万円' -> 11299 because 1.13*10000 =
    11299.999...). Spark's cast(double as long) truncates identically; the
    DuckDB oracle must use FLOOR, not CAST (which rounds).

    ``unit``: '円' | '万円' | None (autodetect — the reference passes the
    expected unit explicitly per field).
    """
    if unit == "円":
        num = _extract(col, r"^(\d*[.]?\d+)円", 1).cast("double")
        mult = F.lit(1)
    elif unit == "万円":
        num = _extract(col, r"^(\d*[.]?\d+)万円", 1).cast("double")
        mult = F.lit(10000)
    else:
        num = _extract(col, r"^(\d*[.]?\d+)(万?円)", 1).cast("double")
        mult = F.when(F.regexp_extract(col, r"^(\d*[.]?\d+)(万?円)", 2) == "万円", F.lit(10000)).otherwise(
            F.lit(1)
        )
    return F.when(col == "-", F.lit(0).cast("long")).otherwise((num * mult).cast("long"))


def _floor_value(s: Column) -> Column:
    """B-prefixed basement floors are zero-based negative: B1 -> 0, B2 -> -1
    (scraping.py:81-106 docstring)."""
    return F.when(
        s.startswith("B"), -F.substring(s, 2, 10).cast("long") + 1
    ).otherwise(s.cast("long"))


def parse_min_floor(col: Column) -> Column:
    """P6a — scraping.py:81-106: (B?\\d+)(-B?\\d+)?階 -> min of the pair.

    A single value duplicates; the pair is sorted (handles inverted 1-B1階).
    """
    g1 = _extract(col, r"^(B?\d+)-?(B?\d+)?階", 1)
    g2 = _extract(col, r"^(B?\d+)-?(B?\d+)?階", 2)
    v1 = _floor_value(g1)
    v2 = F.coalesce(_floor_value(g2), v1)
    return F.least(v1, v2)


def parse_max_floor(col: Column) -> Column:
    """P6b — max of the (sorted) floor pair."""
    g1 = _extract(col, r"^(B?\d+)-?(B?\d+)?階", 1)
    g2 = _extract(col, r"^(B?\d+)-?(B?\d+)?階", 2)
    v1 = _floor_value(g1)
    v2 = F.coalesce(_floor_value(g2), v1)
    return F.greatest(v1, v2)


def parse_area(col: Column) -> Column:
    """P7 — scraping.py:109-112: (\\d*[.]?\\d+)m2 -> float m^2 (re.match:
    trailing text like '30.2m2(壁芯)' parses)."""
    return _extract(col, r"^(\d*[.]?\d+)m2", 1).cast("double")


def parse_n_rooms(col: Column) -> Column:
    """P8a — scraping.py:115-127: ワンルーム -> 1 else leading digits of layout
    (re.match: '2LDK+S(納戸)' parses as 2)."""
    return F.when(col == "ワンルーム", F.lit(1).cast("long")).otherwise(
        _extract(col, r"^(\d+)[SLDK]+", 1).cast("long")
    )


def parse_layout_flag(col: Column, letter: str) -> Column:
    """P8b — membership flags for S/L/D/K; ワンルーム -> all false. The
    reference tests ``char in s`` on the WHOLE string (scraping.py:127), so
    '2LDK+S(納戸)' has S=True even though the match stops at the '+'."""
    valid = (col == "ワンルーム") | (F.regexp_extract(col, r"^(\d+)[SLDK]+", 1) != "")
    return F.when(valid, F.when(col == "ワンルーム", F.lit(False)).otherwise(col.contains(letter)))


def parse_banner_timestamp(col: Column) -> Column:
    """P9 — scraping.py:130-147: '&times=(\\d+)' ms -> seconds, rounded.

    The reference uses Python round() = HALF_EVEN (banker's); Spark's
    ``round`` is BigDecimal HALF_UP, which differs at exact .5 boundaries
    (ms ending in 500) — ``bround`` is Spark's HALF_EVEN twin. This one is
    re.search (unanchored), not re.match.
    """
    ms = _extract(col, r"&times=(\d+)", 1).cast("double")
    return F.bround(ms / 1000.0, 0)


# ------------------------------------------------------------ P11

_KANJI_DIGITS = "〇一二三四五六七八九"
# Special-cased districts where ヶ is normalized to ケ (analysis.py:43-46).
_KE_DISTRICTS = ("千駄ヶ谷", "富ヶ谷", "幡ヶ谷")


def _int2kanji(num: Column) -> Column:
    """Arabic->kanji numeral conversion matching the kanjize library the
    reference uses (analysis.py:36: int2kanji(12) == '十二', 21 == '二十一',
    10 == '十'). Handles 1..99 (block numbers never exceed two digits) and
    both ASCII and full-width input digits."""
    n = F.translate(num, "０１２３４５６７８９", "0123456789").cast("int")
    digits = F.split(F.lit(_KANJI_DIGITS), "")
    ones = n % 10
    tens = (n / 10).cast("int")
    one_k = F.element_at(digits, ones + 1)
    ten_k = F.element_at(digits, tens + 1)
    return F.when(n < 10, one_k).otherwise(
        F.concat(
            F.when(tens > 1, ten_k).otherwise(F.lit("")),
            F.lit("十"),
            F.when(ones > 0, one_k).otherwise(F.lit("")),
        )
    )


def build_address_join_key(address: Column) -> Column:
    """P11 — analysis.py:31-54: address -> all-kanji geocode join key.

    ``東京都<ward><district><block?>`` -> ``東京都<ward><district'><block-kanji>丁目``
    where district' has ヶ->ケ for the three special districts and the
    arabic block number is transliterated per-digit. Unparseable -> ''.
    """
    m = r"(?U)^(東京都)(.+区)(\D+)(\d*)$"
    pref = F.regexp_extract(address, m, 1)
    ward = F.regexp_extract(address, m, 2)
    district = F.regexp_extract(address, m, 3)
    block = F.regexp_extract(address, m, 4)
    district_fixed = district
    for d in _KE_DISTRICTS:
        district_fixed = F.when(district == d, F.lit(d.replace("ヶ", "ケ"))).otherwise(district_fixed)
    block_kanji = F.when(block != "", F.concat(_int2kanji(block), F.lit("丁目"))).otherwise(F.lit(""))
    key = F.concat(pref, ward, district_fixed, block_kanji)
    return F.when(pref == "", F.lit("")).otherwise(key)


# ------------------------------------------------------------ P12


def iso_to_date(col: Column) -> Column:
    """P12a — app/app.py:199-204: ISO datetime string -> date string."""
    return F.date_format(F.to_timestamp(col), "yyyy-MM-dd")


def date_to_midnight_epoch(col: Column) -> Column:
    """P12b — app/app.py:207-212: 'YYYY-MM-DD' -> midnight UTC epoch secs."""
    return F.unix_timestamp(F.to_timestamp(col, "yyyy-MM-dd")).cast("long")
