"""Text-analysis column functions for the training-data pipeline surface.

All hot-path functions are native Column expressions (JVM-side, inside
whole-stage codegen) — no Python UDFs — so they hold up over a 100 TB
document corpus. Each has an exactly-equivalent ANSI-SQL formulation used
by the DuckDB oracle (plans/queries.py), so the semantics are pinned by
the correctness gate, not just unit tests.

Portability conventions (Spark <-> DuckDB):
- token counts via occurrence counting ``(len(s) - len(replace(s, t, '')))
  / len(t)`` — pure integer arithmetic, identical in both engines;
- fingerprints via ``md5`` (identical output both sides);
- ratios as a single double division of exact integers (IEEE-deterministic).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ONE whitespace class, shared constant-for-constant with every DuckDB
# oracle (plans/queries.py rewrites any bare \s in oracle SQL to this
# class at registration). Explicit because bare \s is engine drift:
# Java regex \s = [ \t\n\x0B\f\r] while RE2/DuckDB \s = [\t\n\f\r ]
# (no vertical tab), and \s semantics can move across engine versions.
# The class below is byte-identical in both engines' regex dialects.
WS_CLASS = "[ \\t\\n\\r\\f]"
_WS = WS_CLASS + "+"


def tokens(col: Column) -> Column:
    """Whitespace tokenization -> array<string>."""
    return F.split(F.trim(col), _WS)


def token_count(col: Column) -> Column:
    """Number of whitespace-separated tokens (0 for empty/blank text)."""
    return F.when(F.trim(col) == "", F.lit(0)).otherwise(F.size(tokens(col))).cast("long")


def distinct_token_count(col: Column) -> Column:
    return F.when(F.trim(col) == "", F.lit(0)).otherwise(F.size(F.array_distinct(tokens(col)))).cast("long")


def token_count_tokens(col: Column, toks: Column) -> Column:
    """token_count over a MATERIALIZED token array — use when several
    counters share one tokenization (inline split re-tokenizes per counter:
    Catalyst does not CSE into sibling expressions)."""
    return F.when(F.trim(col) == "", F.lit(0)).otherwise(F.size(toks)).cast("long")


def distinct_token_count_tokens(col: Column, toks: Column) -> Column:
    return (
        F.when(F.trim(col) == "", F.lit(0)).otherwise(F.size(F.array_distinct(toks))).cast("long")
    )


def bpe_ish_token_count(col: Column) -> Column:
    """Subword-ish token count: split on word/number/punct boundaries.

    A cheap proxy for BPE token counts (letters runs of <=4 chars count 1):
    count = words + ceil(extra length) + punctuation marks.
    """
    words = token_count(col)
    chars = F.length(F.regexp_replace(col, _WS, ""))
    # every started chunk of 4 chars beyond the first of each word
    extra = F.ceil((chars - words).cast("double") / F.lit(4.0)).cast("long")
    return (words + F.greatest(extra, F.lit(0))).cast("long")


def occurrence_count(col: Column, needle: str) -> Column:
    """#occurrences of a literal substring — portable integer arithmetic."""
    return ((F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))) / F.lit(len(needle))).cast(
        "long"
    )


def padded(col: Column) -> Column:
    """' ' || text || ' ' — project this ONCE and feed the *_padded
    counters: referencing the concat inside every counter expression
    bloats codegen past janino's method limit (interpreted fallback) and
    costs a re-concat per counter when codegen bails."""
    return F.concat(F.lit(" "), col, F.lit(" "))


def word_count_padded(padded_col: Column, word: str) -> Column:
    """#whole-word occurrences on a pre-padded text column. Counting by
    non-overlapping replace of ' word ' with ' ' — consecutive repeats
    ('x x') count once; the SQL oracle replicates the same replace
    semantics so parity holds."""
    needle = f" {word} "
    return (
        (F.length(padded_col) - F.length(F.replace(padded_col, F.lit(needle), F.lit(" "))))
        / F.lit(len(needle) - 1)
    ).cast("long")


def word_occurrence_count(col: Column, word: str) -> Column:
    """#occurrences of a whole word (see word_count_padded)."""
    return word_count_padded(padded(col), word)


# Marker stopwords per language for the n-gram/stopword language-ID
# heuristic. Deterministic and SQL-expressible; on organic text these are
# the standard top-frequency function words.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "la", "de", "que", "los"),
    "zh": ("的", "是", "了", "在", "我"),
}


def marker_count(tokens_col: Column, words: tuple[str, ...]) -> Column:
    """#tokens that are any of ``words`` — ONE array traversal with a
    set-membership test (vs. a replace-scan per word). SQL twin:
    len(list_filter(tokens, t -> t IN (...)))."""
    wset = list(words)
    return F.size(F.filter(tokens_col, lambda t: t.isin(wset))).cast("long")


def lang_scores_tokens(tokens_col: Column) -> dict[str, Column]:
    return {lang: marker_count(tokens_col, words) for lang, words in LANG_MARKERS.items()}


def lang_id(col: Column) -> Column:
    """Language-ID heuristic: argmax of marker-stopword counts, ties broken
    by language code order, all-zero -> 'und'."""
    return lang_id_tokens(tokens(col))


def lang_id_tokens(tokens_col: Column) -> Column:
    scores = lang_scores_tokens(tokens_col)
    pairs = sorted(scores.items())  # deterministic tie-break: lang code asc
    best_lang = F.lit("und")
    best_score = F.lit(0).cast("long")
    for lang, score in pairs:
        take = score > best_score  # strict: earlier lang wins ties
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(take, score).otherwise(best_score)
    return best_lang


STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "it", "that", "for")
_PUNCT = (".", ",", "!", "?", ";", ":")


def quality_score_raw(col: Column) -> Column:
    """Document quality score in [0,1]: rewards mid-length docs, a sane
    punctuation rate, and a nonzero stopword ratio.

    score = 0.4*min(len/500,1) + 0.3*min(stopword_ratio*5,1)
          + 0.3*(1 - min(punct_ratio*10,1))
    computed from exact integer counts; single-division ratios keep the
    raw double bit-identical with the SQL oracle (round/floor-scale at the
    query layer, never here — Spark's ROUND goes through BigDecimal and
    disagrees with DuckDB's at half-boundaries).
    """
    return quality_score_raw_tokens(col, tokens(col))


def quality_score_raw_tokens(col: Column, tokens_col: Column) -> Column:
    n_chars = F.length(col).cast("double")
    n_tokens = F.size(tokens_col).cast("long").cast("double")
    n_stop = marker_count(tokens_col, STOPWORDS).cast("double")
    # one regex pass over the text vs. len(_PUNCT) replace-scans (each of
    # which allocates a full copy of the string); counts are identical —
    # the class matches exactly the same single-char occurrences
    n_punct = F.regexp_count(col, F.lit(r"[.,!?;:]")).cast("double")
    len_term = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    stop_term = F.least(F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0)) * 5.0, F.lit(1.0))
    punct_term = 1.0 - F.least(F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0)) * 10.0, F.lit(1.0))
    return 0.4 * len_term + 0.3 * stop_term + 0.3 * punct_term


def quality_score(col: Column) -> Column:
    return F.round(quality_score_raw(col), 6)


def fingerprint(col: Column) -> Column:
    """Content fingerprint: md5 over the sorted distinct token set.

    Robust to token order / duplication — two documents with the same
    vocabulary share a fingerprint (the classic Broder 'sketch of shingles'
    degenerate case; cheap first-pass dedup key).
    """
    canon = F.array_join(F.array_sort(F.array_distinct(tokens(col))), " ")
    return F.md5(canon)


# ---------------------------------------------------------------------
# PII detection / redaction (training-data hygiene pass)
#
# Patterns are kept to syntax that Java regex (Spark) and RE2 (DuckDB)
# interpret identically: character classes, bounded repetition, \b word
# boundaries (supported by both), no backreferences/lookaround.
# ---------------------------------------------------------------------

PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # NANP-ish phone: optional +1 / 1, 3-3-4 groups with -, ., space or (area)
    "phone": r"\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    # 13-16 digit card-ish runs, optionally 4-grouped
    "card": r"\b\d{4}[- ]?\d{4}[- ]?\d{4}[- ]?\d{1,4}\b",
}


def pii_count(col: Column, kind: str) -> Column:
    """#matches of one PII pattern (JVM-side regexp_count)."""
    return F.regexp_count(col, F.lit(PII_PATTERNS[kind])).cast("long")


def pii_counts(col: Column) -> dict[str, Column]:
    return {kind: pii_count(col, kind) for kind in PII_PATTERNS}


def redact_pii(col: Column, replacement: str = "<PII>") -> Column:
    """Replace every PII match with ``replacement``. Order matters: email
    before card/phone so digit-bearing local parts are consumed as one
    email token, matching the oracle's identical replace order."""
    out = col
    for kind in ("email", "card", "phone", "ipv4"):
        out = F.regexp_replace(out, PII_PATTERNS[kind], replacement)
    return out


def bigrams_from_tokens(toks: Column) -> Column:
    """Word bigrams (NON-distinct, order-preserving) from a materialized
    token array — the unit for Gopher-style repetition filters (fraction
    of bigrams taken by the most frequent bigram). Same CSE caveat as
    shingles_from_tokens: ``toks`` must be a projected column."""
    n = F.size(toks)
    idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)))


def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """Word k-shingles (distinct) from a MATERIALIZED token-array column.

    ``toks`` must reference a projected column, not an inline ``split``
    expression: Catalyst does not CSE subexpressions into higher-order-
    function lambdas, so an inline split would re-tokenize the whole text
    for every ``element_at`` access — O(tokens^2) per document (measured
    9s for a 5000-doc shingle explode; <1s materialized)."""
    n = F.size(toks)
    idx = F.when(n >= k, F.sequence(F.lit(1), n - F.lit(k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)]))
    )


def positional_shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """Word k-shingles in POSITIONAL order (no dedup) from a materialized
    token-array column: element ``i`` (0-based after ``posexplode``) is the
    shingle starting at token ``i``. Used by substring-span detection,
    which needs every occurrence at its position — set semantics would
    destroy run structure. Same CSE pitfall as ``shingles_from_tokens``:
    project the tokens first."""
    n = F.size(toks)
    idx = F.when(n >= k, F.sequence(F.lit(1), n - F.lit(k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)])
    )


def shingles(col: Column, k: int = 3) -> Column:
    """Word k-shingles as array<string> (distinct), for Jaccard/MinHash.
    Prefer projecting tokens first and using shingles_from_tokens (see
    its docstring for the CSE pitfall)."""
    return shingles_from_tokens(tokens(col), k)


def value_counts(arr: Column) -> Column:
    """Per-row multiset counts: ``array<T>`` -> ``array<struct<v: T,
    cnt: long>>`` with one entry per DISTINCT element — entirely inside
    one codegen'd projection (sort + run-length via higher-order
    functions), zero shuffle.

    This is the row-local replacement for ``explode -> groupBy(row_id,
    value)``: when the grouping key IS the row (per-doc token or bigram
    counts), the groupBy shuffles every distinct (row, value) pair for a
    co-location the rows already have — all of a doc's tokens live in
    its own array. O(n log n) per row (array_sort), then run starts and
    lengths by comparing each sorted element to its predecessor.

    MEASURED trade-off (round 10, sf0.1 bigram counting): the zero-
    shuffle win did NOT pay for the CPU — Catalyst re-evaluates the
    sorted array at each expression reference (~10 passes after DAG
    duplication), and struct-array sorts are interpreted-comparator
    slow, so this ran 4-8x slower end-to-end than ``explode ->
    groupBy(doc_id, value)`` whose map-side partial aggregation already
    bounds the shuffle at doc-distinct cardinality. Prefer the groupBy
    pre-agg for corpus pipelines (q90/q149 do); reach for this only
    when the shuffle itself is the binding constraint (e.g. wide binary
    payload rows where adding ANY exchange is unacceptable).
    Works for any orderable element type including structs (Spark sorts
    struct arrays field-lexicographically). Entry order follows the
    sorted element order; empty/NULL input -> empty array.

    CRITICAL implementation constraint (the HOF-CSE pitfall, measured:
    the naive indexed form hangs at 500 docs): Catalyst re-evaluates any
    OUTER expression referenced inside a lambda once PER ELEMENT, and
    CollapseProject re-inlines staged projections, so ``get(s, i)``
    inside a lambda re-sorts the whole array n times (and nesting
    compounds it to O(n^3)). Every step below therefore passes arrays
    only in ARGUMENT position (zip_with / filter / transform over the
    array itself) — lambdas touch nothing but their own parameters, so
    the whole pipeline is a constant number of O(n) passes over the
    (few-times-re-evaluated) sorted array."""
    s = F.array_sort(arr)
    n = F.size(s)
    # prev[i] = s[i-1], with prev[0] = s[0] (self-compare; position 0 is
    # forced "new" below) — avoids prepending a typed NULL, which would
    # need the element type spelled out
    prev = F.concat(F.slice(s, 1, 1), F.slice(s, 1, F.greatest(n - 1, F.lit(0))))
    tagged0 = F.zip_with(
        s, prev, lambda a, b: F.struct(a.alias("v"), (~a.eqNullSafe(b)).alias("new"))
    )
    tagged = F.transform(
        tagged0,
        lambda x, i: F.struct(x["v"].alias("v"), ((i == 0) | x["new"]).alias("new")),
    )
    vals = F.transform(F.filter(tagged, lambda x: x["new"]), lambda x: x["v"])
    pos = F.filter(
        F.transform(tagged, lambda x, i: F.when(x["new"], i).otherwise(F.lit(-1))),
        lambda p: p >= 0,
    )
    # next run start (or n for the last run); slice length clamps at 0
    # for the empty-input case where size(pos) - 1 would be negative
    nextp = F.concat(
        F.slice(pos, 2, F.greatest(F.size(pos) - 1, F.lit(0))), F.array(n)
    )
    cnts = F.zip_with(pos, nextp, lambda p, q: (q - p).cast("long"))
    entries = F.zip_with(
        vals, cnts, lambda v, c: F.struct(v.alias("v"), c.alias("cnt"))
    )
    # empty branch: slice to 0 elements keeps the exact struct type
    # without spelling it out (F.array() could not be cast generically)
    return F.when(n > 0, entries).otherwise(F.slice(entries, 1, 0))


# --- normalization (C4/CCNet-style pre-clean) ------------------------------

# full-width ASCII block (U+FF01..U+FF5E) + ideographic space -> half-width.
# Shared constants: the DuckDB oracle SQL is generated from the SAME pair
# (plans/queries.py), so the two engines cannot drift.
NORM_FULLWIDTH = "".join(chr(c) for c in range(0xFF01, 0xFF5F)) + "　"
NORM_HALFWIDTH = "".join(chr(c) for c in range(0x21, 0x7F)) + " "
# Scrub class shared VERBATIM with the DuckDB oracle (queries.py
# generates its SQL from this constant, so the engines cannot drift):
# C0 controls, DEL, C1 controls (U+0080-U+009F — NEL U+0085 is Unicode
# whitespace Python's str.strip() removes but Spark's ASCII-only trim
# does not), and the non-ASCII Unicode whitespace code points (NBSP,
# OGHAM, the U+2000 block, LINE/PARA SEP, NNBSP, MMSP) embedded as
# literal chars — valid in both Java regex and RE2 character classes.
NORM_SCRUB_CLASS = (
    "[\\x00-\\x1f\\x7f-\\x9f"  # C0 + DEL + C1 (incl. NEL U+0085)
    + chr(0x00A0)                   # NBSP
    + chr(0x1680)                   # OGHAM SPACE MARK
    + chr(0x2000) + "-" + chr(0x200A)  # EN QUAD .. HAIR SPACE (literal range)
    + chr(0x2028) + chr(0x2029)     # LINE / PARAGRAPH SEPARATOR
    + chr(0x202F) + chr(0x205F)     # NARROW NBSP, MEDIUM MATH SPACE
    + "]"
)
_CTRL = NORM_SCRUB_CLASS  # back-compat alias


def normalize_text(col: Column) -> Column:
    """Canonical text normalization applied before any hashing/dedup so
    cosmetic variants (full-width punctuation, control chars, ragged
    whitespace, case) hash identically: full-width->half-width fold,
    control/Unicode-whitespace chars -> space, whitespace squeeze, trim,
    lowercase. Pure codegen expression chain (translate + regexp_replace)
    — one map over the corpus, no UDF. Idempotent:
    normalize(normalize(x)) == normalize(x) (property-tested, including
    `once == once.strip()` under Python's Unicode-aware strip)."""
    folded = F.translate(col, NORM_FULLWIDTH, NORM_HALFWIDTH)
    no_ctrl = F.regexp_replace(folded, NORM_SCRUB_CLASS, " ")
    squeezed = F.regexp_replace(no_ctrl, _WS, " ")
    return F.lower(F.trim(squeezed))
