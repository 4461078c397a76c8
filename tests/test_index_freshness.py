"""Index freshness (VERDICT r8 #1 — both confirmed wrong-answer repros).

BigQuery's SEARCH/VECTOR index contract: results are ALWAYS correct
regardless of index refresh state (the service scans the unindexed
delta). The engine mirrors that with the MV plane's staleness rule —
the routed path serves only while the base's directory fingerprint
still equals its at-materialization value; any DML/recreate drift falls
through to the always-correct exact path, and ``Catalog.drop`` purges
the table's index entries outright.
"""

from __future__ import annotations

import tempfile

import pytest

from crmint_spark.catalog import Catalog
from crmint_spark.workers.base import WorkerContext
from crmint_spark.workers.sql_executor import SparkSQLExecutor


@pytest.fixture()
def cat(spark):
    return Catalog(spark, tempfile.mkdtemp(prefix="idxfresh_"))


def run(spark, cat, script):
    w = SparkSQLExecutor(
        {"script": script, "dry_run": False},
        WorkerContext(spark=spark, catalog=cat),
    )
    w.execute()
    return w


def _ids(w):
    return sorted(r["id"] for r in w.result.collect())


def _seed_docs(spark, cat):
    cat.write(
        spark.sql(
            "SELECT 1 AS id, 'alpha beta' AS seg"
            " UNION ALL SELECT 2, 'gamma delta'"
            " UNION ALL SELECT 3, 'epsilon'"
        ),
        "p.d.docs",
    )


SEARCH_Q = "SELECT id FROM `p.d.docs` WHERE SEARCH(seg, 'alpha') ORDER BY id"


def test_search_index_insert_update_freshness(spark, cat):
    """The r8 verdict's first repro: INSERT then UPDATE after CREATE
    SEARCH INDEX — the routed path missed the new/changed rows."""
    _seed_docs(spark, cat)
    run(spark, cat, "CREATE SEARCH INDEX si ON `p.d.docs` (seg)")
    w = run(spark, cat, SEARCH_Q)
    assert any("routed through index" in line for line in w.log)
    assert _ids(w) == [1]
    run(spark, cat, "INSERT INTO `p.d.docs` VALUES (4, 'alpha omega')")
    w2 = run(spark, cat, SEARCH_Q)
    assert any("base changed" in line for line in w2.log), w2.log
    assert not any("routed through index" in line for line in w2.log)
    assert _ids(w2) == [1, 4]
    run(spark, cat, "UPDATE `p.d.docs` SET seg = 'alpha changed' WHERE id = 2")
    assert _ids(run(spark, cat, SEARCH_Q)) == [1, 2, 4]
    # re-running the DDL refreshes: routing resumes over the new state
    run(spark, cat, "CREATE OR REPLACE SEARCH INDEX si ON `p.d.docs` (seg)")
    w3 = run(spark, cat, SEARCH_Q)
    assert any("routed through index" in line for line in w3.log)
    assert _ids(w3) == [1, 2, 4]


def test_search_index_drop_recreate_purges_entries(spark, cat):
    """The r8 verdict's second repro: DROP TABLE + recreate routed
    through the dead postings and returned [] where the exact path
    finds the new rows."""
    _seed_docs(spark, cat)
    run(spark, cat, "CREATE SEARCH INDEX si ON `p.d.docs` (seg)")
    run(spark, cat, "DROP TABLE `p.d.docs`")
    assert cat._indexes == {}  # BigQuery drops indexes with the table
    cat.write(spark.sql("SELECT 7 AS id, 'alpha fresh' AS seg"), "p.d.docs")
    w = run(spark, cat, SEARCH_Q)
    assert not any("routed through index" in line for line in w.log)
    assert _ids(w) == [7]


def test_vector_index_freshness(spark, cat):
    """VECTOR_SEARCH has the identical gate: an INSERTed vector that is
    the true nearest neighbour must appear even though the IVF layout
    snapshot predates it."""
    cat.write(
        spark.sql(
            "SELECT id, array(CAST(id AS FLOAT), CAST(id * 2 AS FLOAT))"
            " AS emb FROM RANGE(20)"
        ),
        "p.d.vecs",
    )
    run(spark, cat, "CREATE VECTOR INDEX vi ON `p.d.vecs` (emb)")
    q = (
        "SELECT base.id AS id, ROUND(distance, 3) AS d FROM VECTOR_SEARCH("
        "TABLE `p.d.vecs`, 'emb',"
        " (SELECT array(CAST(100.0 AS FLOAT), CAST(200.0 AS FLOAT)) AS emb),"
        " top_k => 1)"
    )
    w = run(spark, cat, q)
    assert any("routed through index" in line for line in w.log)
    assert [r["id"] for r in w.result.collect()] == [19]
    run(
        spark, cat,
        "INSERT INTO `p.d.vecs`"
        " SELECT 99, array(CAST(100.0 AS FLOAT), CAST(200.0 AS FLOAT))",
    )
    w2 = run(spark, cat, q)
    assert any("base changed" in line for line in w2.log), w2.log
    rows = w2.result.collect()
    assert [r["id"] for r in rows] == [99]
    assert rows[0]["d"] == 0.0
