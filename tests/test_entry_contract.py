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


def test_gate_window_rotation_attests_newest_first():
    """The driver records only the FIRST 50 queries() entries; the window
    must lead with everything past the original 50 registrations (q60+
    and all later additions) so the newest queries get driver-attested
    correctness rows."""
    mod = _load_entry()
    from otokuna_spark.plans.queries import REGISTRY

    names = list(mod.queries())
    registration = list(REGISTRY)
    rotated_head = registration[50:]
    window = names[:50]
    assert names == registration[50:] + registration[:50]
    missing = [n for n in rotated_head if n not in window]
    # everything past the original gate cap fits in the window today;
    # if registrations outgrow 50, the newest must still lead the window
    if len(rotated_head) <= 50:
        assert not missing
    else:
        assert names[: len(rotated_head)] == rotated_head


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
