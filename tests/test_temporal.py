"""as-of join semantics: inclusive/exclusive bounds, tie-breaks, probes
with no preceding build row. (Oracle parity for the attribution query is
covered by test_parity via the registry.)"""

from __future__ import annotations

import datetime as dt
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crmint_spark.operators.temporal import asof_join  # noqa: E402


def _ts(s: int):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _fixture(spark):
    probes = spark.createDataFrame(
        [(1, 100, _ts(10)), (2, 100, _ts(5)), (3, 200, _ts(10)), (4, 300, _ts(10))],
        "probe_id long, key long, t timestamp",
    )
    builds = spark.createDataFrame(
        [
            (11, 100, _ts(3), "a"),
            (12, 100, _ts(10), "b"),   # == probe 1's instant
            (13, 100, _ts(11), "c"),   # after every probe
            (21, 200, _ts(2), "d"),
            (22, 200, _ts(2), "e"),    # tie on t with 21
        ],
        "bid long, key long, t timestamp, val string",
    )
    return probes, builds


def test_inclusive_picks_equal_instant_and_latest(spark):
    probes, builds = _fixture(spark)
    out = asof_join(probes, builds, "key", "t", ["bid", "val"])
    got = {r["probe_id"]: (r["asof_bid"], r["asof_val"]) for r in out.collect()}
    assert got[1] == (12, "b")      # equal instant included
    assert got[2] == (11, "a")      # latest strictly-before
    assert got[3] == (22, "e")      # t-tie broken by larger bid
    assert got[4] == (None, None)   # key with no build rows at all


def test_exclusive_skips_equal_instant(spark):
    probes, builds = _fixture(spark)
    out = asof_join(probes, builds, "key", "t", ["bid", "val"], inclusive=False)
    got = {r["probe_id"]: r["asof_bid"] for r in out.collect()}
    assert got[1] == 11             # ts(10) build excluded under '<'
    assert got[2] == 11


def test_probe_columns_preserved(spark):
    probes, builds = _fixture(spark)
    out = asof_join(probes, builds, "key", "t", ["bid", "val"])
    assert set(out.columns) == {"probe_id", "key", "t", "asof_bid", "asof_val"}
    assert out.count() == 4


def test_asof_join_as_scd2_dimension_lookup(spark):
    """Effective-dated (SCD Type-2) dimension lookup is an as-of join:
    each fact picks the dimension version in effect at its timestamp."""
    facts = spark.createDataFrame(
        [(1, 10, _ts(5)), (2, 10, _ts(20)), (3, 10, _ts(2))],
        "fact_id long, key long, t timestamp",
    )
    dim_versions = spark.createDataFrame(
        [
            (10, _ts(0), "v1"),   # effective [0, 10)
            (10, _ts(10), "v2"),  # effective [10, inf)
        ],
        "key long, t timestamp, attr string",
    )
    out = asof_join(facts, dim_versions, "key", "t", ["t", "attr"])
    got = {r["fact_id"]: r["asof_attr"] for r in out.collect()}
    assert got == {1: "v1", 2: "v2", 3: "v1"}
