"""Driver-contract invariants for __spark_entry__: key consistency,
callable signatures, and the flagship entry() smoke path. The driver
imports this module blind — a broken contract fails every oracle row at
once, so guard it directly."""

from __future__ import annotations

import inspect

import __spark_entry__ as entry_mod


def test_every_oracle_key_has_a_query():
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(os_) <= set(qs), sorted(set(os_) - set(qs))
    # rows-only entries are the documented exceptions, nothing else
    rows_only = set(qs) - set(os_)
    assert rows_only == {
        "ann_ivf_kmeans_topk",
        "ml_train_predict",
        # ALS factors are not SQL-reproducible; recall/determinism
        # are pytest-asserted in test_sql_ml
        "ml_recommend",
    }, rows_only


def test_query_callables_take_spark_and_sf_dir():
    for name, fn in entry_mod.queries().items():
        params = list(inspect.signature(fn).parameters)
        assert len(params) >= 2, f"{name} must accept (spark, sf_dir)"


def test_oracle_sql_mentions_only_registered_tables():
    from crmint_spark.catalog import TESTDATA_TABLES

    # every oracle runs on DuckDB where only the testdata views exist;
    # a stray table name would fail all rows at driver time
    for name, sql in entry_mod.oracle_sql().items():
        assert isinstance(sql, str) and sql.strip(), name
        assert any(t in sql for t in TESTDATA_TABLES), (
            f"{name} oracle references no testdata table"
        )


def test_entry_flagship_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.columns  # stable, non-empty schema


def test_rounded_distance_columns_carry_plus_zero_guard():
    """Registry style rule (VERDICT r5 #8): a ROUNDed float that can be
    a difference/distance may round to -0.0 in one engine and +0.0 in
    the other — Python == hides it, the driver's byte-hash does not.
    Any ROUND(...) aliased to a *dist*-like column must append `+ 0`
    (IEEE: -0.0 + 0 = +0.0) in the oracle SQL. Best-effort lint: flags
    `ROUND(...)` directly aliased `AS <name~dist>` without the guard."""
    import re

    oracles = entry_mod.oracle_sql()
    pat = re.compile(
        r"ROUND\s*\((?:[^()]|\([^()]*(?:\([^()]*\)[^()]*)*\))*\)"
        r"(?P<guard>\s*\+\s*0)?\s+AS\s+(?P<alias>\w+)",
        re.IGNORECASE,
    )
    bad = []
    for name, sql in oracles.items():
        for m in pat.finditer(sql):
            alias = m.group("alias").lower()
            if ("dist" in alias or alias in ("e0",)) and not m.group("guard"):
                bad.append(f"{name}: ROUND(...) AS {m.group('alias')}")
    assert not bad, (
        "ROUNDed distance columns without '+ 0' guard (negative-zero "
        "hash risk):\n" + "\n".join(bad)
    )
