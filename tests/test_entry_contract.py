"""Driver-contract invariants of __spark_entry__.py (no Spark needed):
the gate window rotation, registry/oracle completeness, and naming
hygiene the external driver depends on."""

from __future__ import annotations

import importlib.util
import os

_ENTRY = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py")


def _load_entry():
    spec = importlib.util.spec_from_file_location("spark_entry_under_test", _ENTRY)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_queries_and_oracles_cover_registry():
    mod = _load_entry()
    from otokuna_spark.plans.queries import REGISTRY

    qs = mod.queries()
    assert set(qs) == set(REGISTRY)
    oracles = mod.oracle_sql()
    # every oracle belongs to a query and is a non-empty SQL string
    assert set(oracles) <= set(qs)
    for name, sql in oracles.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_gate_window_rotation_attests_weakest_first():
    """The driver records only the FIRST 50 queries() entries; the window
    is ordered by attestation history (committed CORRECTNESS_r*.json):
    never-attested queries first, then least-recently-attested. (q100
    lost its end-of-list pin in round 11 when its recursive-CTE oracle
    landed — it now competes for hash attestation like every other
    query.)"""
    mod = _load_entry()
    from otokuna_spark.plans.queries import REGISTRY

    names = list(mod.queries())
    registration = list(REGISTRY)
    assert sorted(names) == sorted(registration)

    latest = mod._attestation_rounds()
    window = names[:50]
    never = [n for n in registration if n not in latest]

    # every never-attested query must occupy a window slot before ANY
    # already-attested query does
    if len(never) <= 50:
        missing = set(never) - set(window)
        assert not missing, f"never-attested left out of window: {missing}"

    # monotone: last-attested round never decreases along the ordering;
    # never-attested sorts as round 0
    rounds = [latest.get(n, 0) for n in names]
    assert rounds == sorted(rounds)


def test_oracle_output_columns_are_aliased():
    """The driver compares value-hashes after sorting columns BY NAME —
    a Spark/oracle alias mismatch breaks the hash even with identical
    values. DESCRIBE every oracle in DuckDB (same view setup as the
    driver) and reject output column names that are raw expressions
    (parentheses/operators) instead of stable aliases."""
    import duckdb

    mod = _load_entry()
    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    bad = {}
    for name, sql in mod.oracle_sql().items():
        cols = [r[0] for r in con.execute(f"DESCRIBE {sql}").fetchall()]
        ugly = [c for c in cols if any(ch in c for ch in "()+-*/% ")]
        if ugly:
            bad[name] = ugly
    assert not bad, f"oracles with unaliased output columns: {bad}"


def test_cli_list_and_unknown_query():
    """python -m otokuna_spark: list filters by substring; unknown names
    exit 2 with a did-you-mean hint; unambiguous prefixes resolve."""
    import contextlib
    import io

    from otokuna_spark.__main__ import main

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["list", "pricing"]) == 0
    assert "q01_pricing_summary" in buf.getvalue()

    err = io.StringIO()
    with contextlib.redirect_stderr(err):
        assert main(["run", "q_does_not_exist"]) == 2
    assert "unknown query" in err.getvalue()


def test_harden_ws_guard_refuses_unsafe_forms():
    """The oracle \\s->WS_CLASS rewrite is textual; registration must fail
    loudly on any \\s that is not the complete quoted literal '\\s+'
    (e.g. inside a bracketed class, where the substituted brackets would
    nest and silently change the regex)."""
    import pytest

    from otokuna_spark.functions import text as T
    from otokuna_spark.plans.queries import _harden_ws

    ok = _harden_ws("q", r"regexp_replace(t, '\s+', ' ', 'g')")
    assert T.WS_CLASS in ok and r"\s" not in ok
    for bad in (
        r"regexp_matches(t, '[\s]')",  # inside a character class
        r"regexp_matches(t, '^\s+x')",  # not the standalone literal
        r"select '\s' as c",  # no quantifier
    ):
        with pytest.raises(ValueError, match="WS_CLASS"):
            _harden_ws("q", bad)
