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


def test_search_index_session_view_rebind(spark, cat):
    """Review finding r9: an index over an untrackable SESSION view
    stamps base_fp=None (it cannot drift through the DML plane), so
    rebinding the name via CREATE OR REPLACE TEMP VIEW must PURGE the
    entry — otherwise the dead snapshot keeps routing."""
    run(
        spark, cat,
        "CREATE OR REPLACE TEMP VIEW sdocs AS"
        " SELECT 1 AS id, 'alpha' AS seg;"
        "CREATE SEARCH INDEX svi ON sdocs (seg);",
    )
    w = run(spark, cat, "SELECT id FROM sdocs WHERE SEARCH(seg, 'alpha')")
    assert any("routed through index" in line for line in w.log)
    assert [r["id"] for r in w.result.collect()] == [1]
    w2 = run(
        spark, cat,
        "CREATE OR REPLACE TEMP VIEW sdocs AS"
        " SELECT 2 AS id, 'alpha beta' AS seg;"
        "SELECT id FROM sdocs WHERE SEARCH(seg, 'alpha');",
    )
    assert not any("routed through index" in line for line in w2.log)
    assert [r["id"] for r in w2.result.collect()] == [2]
    assert "svi" not in cat._indexes  # rebind purged the entry


def test_plain_ctas_base_search_freshness(spark, cat):
    """VERDICT r9 #1 (CONFIRMED wrong answer): a SEARCH index over a
    plain unpartitioned CTAS base served stale results after INSERT /
    UPDATE because the base landed as an untrackable Spark-managed
    session table. Round 10 routes plain CTAS onto the catalog plane —
    the base is fingerprinted and the existing freshness gate serves
    the exact path after DML."""
    run(
        spark, cat,
        "CREATE OR REPLACE TABLE `p.s.cdocs` AS"
        " SELECT 1 AS id, 'alpha beta' AS seg"
        " UNION ALL SELECT 2, 'gamma';"
        "CREATE SEARCH INDEX csi ON `p.s.cdocs` (seg);",
    )
    assert cat.exists("p.s.cdocs")  # catalog plane, not session plane
    q = "SELECT id FROM `p.s.cdocs` WHERE SEARCH(seg, 'alpha') ORDER BY id"
    w = run(spark, cat, q)
    assert any("routed through index" in line for line in w.log)
    assert _ids(w) == [1]
    run(spark, cat, "INSERT INTO `p.s.cdocs` VALUES (3, 'alpha new')")
    w2 = run(spark, cat, q)
    assert _ids(w2) == [1, 3], w2.log  # r9 repro returned [1]
    run(spark, cat, "UPDATE `p.s.cdocs` SET seg = 'alpha too' WHERE id = 2")
    assert _ids(run(spark, cat, q)) == [1, 2, 3]
    # false-POSITIVE direction: removing the token must drop the row
    run(spark, cat, "UPDATE `p.s.cdocs` SET seg = 'omega' WHERE id = 1")
    assert _ids(run(spark, cat, q)) == [2, 3]


def test_plain_ctas_base_vector_freshness(spark, cat):
    """Vector twin of the r9 repro: UPDATE moves the true nearest
    neighbour of a plain-CTAS base — the routed VECTOR_SEARCH top-1
    must follow (the session-plane index served the dead snapshot and
    returned the wrong id)."""
    run(
        spark, cat,
        "CREATE OR REPLACE TABLE `p.s.cvec` AS"
        " SELECT id AS vid, [CAST(id AS FLOAT64)] AS emb"
        " FROM UNNEST(GENERATE_ARRAY(1, 50)) AS id;"
        "CREATE VECTOR INDEX cvi ON `p.s.cvec` (emb)"
        " OPTIONS(index_type='IVF');",
    )
    assert cat.exists("p.s.cvec")
    run(spark, cat, "UPDATE `p.s.cvec` SET emb = [0.9] WHERE vid = 1")
    w = run(
        spark, cat,
        "SELECT base.vid FROM VECTOR_SEARCH(TABLE `p.s.cvec`, 'emb',"
        " (SELECT [1.0] AS emb), top_k => 1)",
    )
    assert [r["vid"] for r in w.result.collect()] == [1], w.log


def test_untrackable_session_table_dml_purges_index(spark):
    """The belt under the structural fix: in a CATALOG-LESS session a
    CTAS still lands as a Spark-managed table and its index stamps
    base_fp=None — any DML to that table must PURGE the entry (round
    10; without the purge the dead postings snapshot routes forever)."""
    w = SparkSQLExecutor(
        {
            "script": (
                "CREATE OR REPLACE TABLE udocs AS"
                " SELECT 1 AS id, 'alpha beta' AS seg"
                " UNION ALL SELECT 2, 'gamma';"
                "CREATE SEARCH INDEX usi ON udocs (seg);"
                "INSERT INTO udocs VALUES (3, 'alpha new');"
                "SELECT id FROM udocs WHERE SEARCH(seg, 'alpha')"
                " ORDER BY id;"
            ),
            "dry_run": False,
        },
        WorkerContext(spark=spark),
    )
    w.execute()
    assert sorted(r["id"] for r in w.result.collect()) == [1, 3]
    assert any("untrackable base" in line for line in w.log), w.log
    assert "usi" not in w._session_indexes
    spark.sql("DROP TABLE IF EXISTS udocs")


def test_untrackable_session_table_update_purges_index(spark):
    """UPDATE flavor of the belt: the copy-on-write session rewrite
    must purge the untrackable entry too."""
    w = SparkSQLExecutor(
        {
            "script": (
                "CREATE OR REPLACE TABLE udocs2 AS"
                " SELECT 1 AS id, 'alpha beta' AS seg"
                " UNION ALL SELECT 2, 'gamma';"
                "CREATE SEARCH INDEX usi2 ON udocs2 (seg);"
                "UPDATE udocs2 SET seg = 'alpha too' WHERE id = 2;"
                "SELECT id FROM udocs2 WHERE SEARCH(seg, 'alpha')"
                " ORDER BY id;"
            ),
            "dry_run": False,
        },
        WorkerContext(spark=spark),
    )
    w.execute()
    assert sorted(r["id"] for r in w.result.collect()) == [1, 2]
    assert "usi2" not in w._session_indexes
    spark.sql("DROP TABLE IF EXISTS udocs2")


def test_bare_create_cleans_orphan_location(spark):
    """VERDICT r9 missing #4: a crashed run leaves the managed-table
    directory behind; a BARE ``CREATE TABLE`` (no OR REPLACE) onto that
    name then failed with LOCATION_ALREADY_EXISTS even though the table
    does not exist. The orphan cleanup now fires for bare CREATE too."""
    import os
    from urllib.parse import urlparse

    name = "orphan_t10"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    orphan = os.path.join(wh, name)
    os.makedirs(orphan, exist_ok=True)
    with open(os.path.join(orphan, "stale.bin"), "w") as f:
        f.write("leftover")
    w = SparkSQLExecutor(
        {
            "script": f"CREATE TABLE {name} AS SELECT 42 AS x",
            "dry_run": False,
        },
        WorkerContext(spark=spark),
    )
    w.execute()
    assert spark.sql(f"SELECT x FROM {name}").collect()[0]["x"] == 42
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_driver_side_bucket_hash_matches_engine(spark):
    """The routed SEARCH computes its bucket literals driver-side
    (VERDICT r8 #7 — the per-call Spark probe job was a fixed tax);
    search_bucket MUST stay byte-identical to the layout's
    pmod(xxhash64(col, token), B) bucket key."""
    from crmint_spark.operators.text import (
        SEARCH_INDEX_BUCKETS,
        search_bucket,
    )

    toks = [
        "spark", "merge", "a", "", "2024",
        "longertokenvaluewithmorethan32bytesofcontenthere",
        "naïve", "日本語テスト文字列とより長い入力",
    ]
    cols = ["text", "seg", "body_column_name"]
    row = spark.sql(
        "SELECT "
        + ", ".join(
            f"pmod(xxhash64('{c}', '{t}'), {SEARCH_INDEX_BUCKETS})"
            f" AS b_{i}_{j}"
            for i, c in enumerate(cols)
            for j, t in enumerate(toks)
        )
    ).first()
    for i, c in enumerate(cols):
        for j, t in enumerate(toks):
            assert search_bucket(c, t) == row[f"b_{i}_{j}"], (c, t)


def _mk_partitioned_logs(spark, cat, part_clause, ts_expr):
    run(
        spark, cat,
        f"CREATE TABLE `p.d.logs` PARTITION BY {part_clause} AS"
        f" SELECT {ts_expr} AS ts, id AS lid,"
        " CONCAT('msg alpha ', CAST(id AS STRING)) AS seg"
        " FROM UNNEST(GENERATE_ARRAY(0, 49)) AS id",
    )
    run(spark, cat, "CREATE SEARCH INDEX dsi ON `p.d.logs` (seg)")


LOGS_Q = "SELECT lid FROM `p.d.logs` WHERE SEARCH(seg, 'alpha') ORDER BY lid"


@pytest.mark.parametrize(
    "label,part_clause,ts_expr,insert",
    [
        (
            "identity",
            "ts",
            "DATE_ADD(DATE '2024-01-01', CAST(id % 5 AS INT))",
            "INSERT INTO `p.d.logs` SELECT DATE '2024-01-03', 999,"
            " 'alpha omega'",
        ),
        (
            "derived",
            "DATE(ts)",
            "CAST(DATE_ADD(DATE '2024-01-01', CAST(id % 5 AS INT))"
            " AS TIMESTAMP)",
            "INSERT INTO `p.d.logs` SELECT CAST(DATE '2024-01-03'"
            " AS TIMESTAMP), 999, 'alpha omega'",
        ),
    ],
)
def test_search_index_delta_union(spark, cat, label, part_clause, ts_expr, insert):
    """VERDICT r8 #2: a partition-tagged SEARCH index over a
    PARTITION BY base serves incrementally after DML — index over the
    unchanged partitions UNION an exact scan statically pruned to the
    changed directories (PartitionFilters asserted) — instead of
    abandoning the index wholesale."""
    import re as _re

    _mk_partitioned_logs(spark, cat, part_clause, ts_expr)
    w = run(spark, cat, LOGS_Q)
    assert any("routed through index" in line for line in w.log)
    assert w.result.count() == 50
    run(spark, cat, insert)
    w2 = run(spark, cat, LOGS_Q)
    assert any("delta scan" in line for line in w2.log), w2.log
    assert any("routed through index" in line for line in w2.log)
    ids = [r["lid"] for r in w2.result.collect()]
    assert ids == sorted(list(range(50)) + [999])
    plan = w2.result._jdf.queryExecution().executedPlan().toString()
    pf = [
        p
        for p in _re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
        if p
    ]
    pcol = "ts" if label == "identity" else "__pk"
    assert any(
        pcol in p and "2024-01-03" in p for p in pf
    ), plan  # delta scan pruned to the ONE changed directory
    # pruned UPDATE in the same partition: rows leave the result;
    # everything else still served from the index
    run(
        spark, cat,
        "UPDATE `p.d.logs` SET seg = 'beta only' WHERE lid = 7",
    )
    w3 = run(spark, cat, LOGS_Q)
    assert any("delta scan" in line for line in w3.log)
    ids = [r["lid"] for r in w3.result.collect()]
    assert 7 not in ids and 999 in ids and len(ids) == 50
    # re-running the DDL re-snapshots: fully routed again
    run(spark, cat, "CREATE OR REPLACE SEARCH INDEX dsi ON `p.d.logs` (seg)")
    w4 = run(spark, cat, LOGS_Q)
    assert any("routed through index" in line for line in w4.log)
    assert not any("delta" in line for line in w4.log)
    assert [r["lid"] for r in w4.result.collect()] == ids


def test_vector_index_delta_union(spark, cat):
    """VERDICT r8 #2 (vector side): a partition-tagged VECTOR index
    serves incrementally after DML — unchanged partitions from the IVF
    layout UNION the changed partitions' rows with an inline
    nearest-centroid assignment (same codebook). With every list
    probed (fraction_lists_to_search=1.0) the result must equal the
    brute-force truth exactly."""
    run(
        spark, cat,
        "CREATE TABLE `p.d.vecs` PARTITION BY d AS"
        " SELECT DATE_ADD(DATE '2024-01-01', CAST(id % 4 AS INT)) AS d,"
        " id AS vid, ARRAY[CAST(id AS FLOAT64),"
        " CAST(MOD(id * 37, 101) AS FLOAT64)] AS emb"
        " FROM UNNEST(GENERATE_ARRAY(0, 199)) AS id",
    )
    run(spark, cat, "CREATE VECTOR INDEX vvi ON `p.d.vecs` (emb)")

    def vq(opts=""):
        return (
            "SELECT base.vid AS vid, ROUND(distance, 6) AS dist"
            " FROM VECTOR_SEARCH(TABLE `p.d.vecs`, 'emb',"
            " (SELECT ARRAY[CAST(57.0 AS FLOAT64),"
            " CAST(10.0 AS FLOAT64)] AS emb), top_k => 5"
            + opts
            + ") ORDER BY dist, vid"
        )

    full = ", options => '{\"fraction_lists_to_search\": 1.0}'"
    w = run(spark, cat, vq(full))
    assert any("routed through index" in line for line in w.log)
    run(
        spark, cat,
        "INSERT INTO `p.d.vecs` SELECT DATE '2024-01-02', 9999,"
        " ARRAY[CAST(57.0 AS FLOAT64), CAST(10.0 AS FLOAT64)]",
    )
    w2 = run(spark, cat, vq(full))
    assert any("delta assignment" in line for line in w2.log), w2.log
    r2 = [tuple(r) for r in w2.result.collect()]
    assert r2[0] == (9999, 0.0)
    w3 = run(spark, cat, vq(", options => '{\"use_brute_force\": true}'"))
    assert r2 == [tuple(r) for r in w3.result.collect()]
    # partial probes: the inserted vector still surfaces (its list is
    # its true nearest centroid — same assignment a rebuild would make)
    w4 = run(spark, cat, vq())
    assert any("delta assignment" in line for line in w4.log)
    assert [r["vid"] for r in w4.result.collect()][0] == 9999


def test_index_on_view_rejected_and_mv_index_purged(spark, cat):
    """Round-9 adversarial probe #2 (CONFIRMED wrong answer, fixed):
    an index on a catalog VIEW routed through a snapshot that base
    DML never invalidates (the view's own fingerprint never moves).
    BigQuery's contract — indexes only on tables — is now enforced
    loudly; an index on a MATERIALIZED VIEW's name is purged when the
    MV re-materializes (refresh/replace)."""
    from crmint_spark.workers.base import WorkerException

    cat.write(
        spark.sql("SELECT 1 AS id, 'alpha' AS seg UNION ALL SELECT 2, 'beta'"),
        "p.d.t",
    )
    run(spark, cat, "CREATE VIEW `p.d.v` AS SELECT id, seg FROM `p.d.t`")
    with pytest.raises(WorkerException, match="is a view"):
        run(spark, cat, "CREATE SEARCH INDEX vi ON `p.d.v` (seg)")
    run(
        spark, cat,
        "CREATE MATERIALIZED VIEW `p.d.mv` AS SELECT id, seg FROM `p.d.t`",
    )
    run(spark, cat, "CREATE SEARCH INDEX mvi ON `p.d.mv` (seg)")
    w = run(spark, cat, "SELECT id FROM `p.d.mv` WHERE SEARCH(seg, 'alpha')")
    assert any("routed" in line for line in w.log)
    run(
        spark, cat,
        "UPDATE `p.d.t` SET seg = 'alpha' WHERE id = 2;"
        "CALL BQ.REFRESH_MATERIALIZED_VIEW('p.d.mv');",
    )
    w2 = run(
        spark, cat,
        "SELECT id FROM `p.d.mv` WHERE SEARCH(seg, 'alpha') ORDER BY id",
    )
    assert [r["id"] for r in w2.result.collect()] == [1, 2]
    assert "mvi" not in cat._indexes


def test_index_on_external_table_rejected(spark, cat, tmp_path):
    """External tables' files mutate outside the engine — index DDL
    rejects them (BigQuery contract), closing the last un-invalidatable
    base class: catalog tables fingerprint, session views purge on
    rebind, catalog views/externals reject, MV names purge on
    re-materialization."""
    import json

    from crmint_spark.workers.base import WorkerException

    p = tmp_path / "a.json"
    p.write_text(json.dumps({"id": 1, "seg": "alpha"}) + "\n")
    run(
        spark, cat,
        "CREATE EXTERNAL TABLE `p.d.ext` OPTIONS("
        f"format='NEWLINE_DELIMITED_JSON', uris=['{tmp_path}/*.json'])",
    )
    with pytest.raises(WorkerException, match="external table"):
        run(spark, cat, "CREATE SEARCH INDEX ei ON `p.d.ext` (seg)")


def test_time_travel_never_served_from_index(spark, cat):
    """Round-9 adversarial probe (CONFIRMED wrong answer, fixed): a
    FOR SYSTEM_TIME AS OF read routed through the CURRENT-snapshot
    postings and returned post-mutation rows for a pre-mutation
    instant. Index routing must skip any time-travel statement."""
    cat.write(
        spark.sql(
            "SELECT 1 AS id, 'alpha one' AS seg"
            " UNION ALL SELECT 2, 'beta two'"
        ),
        "p.d.docs",
    )
    w = run(
        spark, cat,
        "DECLARE t0 TIMESTAMP DEFAULT CURRENT_TIMESTAMP();"
        "UPDATE `p.d.docs` SET seg = 'alpha changed' WHERE id = 2;"
        "CREATE SEARCH INDEX si ON `p.d.docs` (seg);"
        "SELECT id FROM `p.d.docs` FOR SYSTEM_TIME AS OF t0"
        " WHERE SEARCH(seg, 'alpha') ORDER BY id;",
    )
    assert not any("routed through index" in line for line in w.log)
    assert [r["id"] for r in w.result.collect()] == [1]
    # the same statement WITHOUT the clause still routes
    w2 = run(
        spark, cat,
        "SELECT id FROM `p.d.docs` WHERE SEARCH(seg, 'alpha') ORDER BY id",
    )
    assert any("routed through index" in line for line in w2.log)
    assert [r["id"] for r in w2.result.collect()] == [1, 2]


def test_full_partition_delete_and_truncate(spark, cat):
    """Removed partitions: a whole-partition DELETE serves index over
    the surviving partitions with an EMPTY delta scan (the removed
    values are excluded, nothing changed to re-scan); TRUNCATE falls
    back to the exact path over the empty table."""
    _mk_partitioned_logs(
        spark, cat, "ts",
        "DATE_ADD(DATE '2024-01-01', CAST(id % 4 AS INT))",
    )
    run(spark, cat, "DELETE FROM `p.d.logs` WHERE ts = DATE '2024-01-02'")
    w = run(spark, cat, LOGS_Q)
    assert any(
        "unchanged partitions + delta scan of 0" in line for line in w.log
    ), w.log
    ids = [r["lid"] for r in w.result.collect()]
    assert ids == sorted(i for i in range(50) if i % 4 != 1)
    run(spark, cat, "TRUNCATE TABLE `p.d.logs`")
    w2 = run(spark, cat, LOGS_Q)
    assert w2.result.count() == 0
    assert any("base changed" in line for line in w2.log)


def test_multi_column_index_delta_column_exact(spark, cat):
    """Multi-column postings + delta union: the src_col residual and
    the __part filter compose — a post-DML body-only hit must answer
    body searches ONLY (column exactness survives the delta branch)."""
    run(
        spark, cat,
        "CREATE TABLE `p.d.logs` PARTITION BY ts AS"
        " SELECT DATE_ADD(DATE '2024-01-01', CAST(id % 4 AS INT)) AS ts,"
        " id AS lid, CONCAT('title alpha ', CAST(id AS STRING)) AS title,"
        " CONCAT('body beta ', CAST(id AS STRING)) AS body"
        " FROM UNNEST(GENERATE_ARRAY(0, 39)) AS id",
    )
    run(spark, cat, "CREATE SEARCH INDEX mci ON `p.d.logs` (title, body)")
    q1 = "SELECT lid FROM `p.d.logs` WHERE SEARCH(title, 'alpha') ORDER BY lid"
    q2 = "SELECT lid FROM `p.d.logs` WHERE SEARCH(body, 'alpha') ORDER BY lid"
    assert run(spark, cat, q1).result.count() == 40
    assert run(spark, cat, q2).result.count() == 0
    run(
        spark, cat,
        "INSERT INTO `p.d.logs` SELECT DATE '2024-01-02', 999,"
        " 'no match', 'body alpha here'",
    )
    w1, w2 = run(spark, cat, q1), run(spark, cat, q2)
    assert any("delta scan" in line for line in w1.log)
    assert any("delta scan" in line for line in w2.log)
    assert [r["lid"] for r in w1.result.collect()] == list(range(40))
    assert [r["lid"] for r in w2.result.collect()] == [999]


def test_index_coverage_metadata_reflects_freshness(spark, cat):
    """INFORMATION_SCHEMA.SEARCH_INDEXES coverage_percentage is real
    since round 9: 100 while fresh, the unchanged-partition share for
    a stale partition-tagged index, 0 for a stale untagged one."""
    _mk_partitioned_logs(
        spark, cat, "ts",
        "DATE_ADD(DATE '2024-01-01', CAST(id % 5 AS INT))",
    )
    q = (
        "SELECT index_name, coverage_percentage"
        " FROM `p.d.INFORMATION_SCHEMA.SEARCH_INDEXES`"
        " ORDER BY index_name"
    )
    assert [tuple(r) for r in run(spark, cat, q).result.collect()] == [
        ("dsi", 100)
    ]
    run(spark, cat, "INSERT INTO `p.d.logs` SELECT DATE '2024-01-03', 99, 'alpha y'")
    assert [tuple(r) for r in run(spark, cat, q).result.collect()] == [
        ("dsi", 80)  # 4 of 5 partitions unchanged
    ]
    cat.write(spark.sql("SELECT 1 AS id, 'x y' AS seg"), "p.d.plain")
    run(spark, cat, "CREATE SEARCH INDEX psi ON `p.d.plain` (seg)")
    run(spark, cat, "INSERT INTO `p.d.plain` VALUES (2, 'z w')")
    assert [tuple(r) for r in run(spark, cat, q).result.collect()] == [
        ("dsi", 80),
        ("psi", 0),
    ]


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


def _write_csvs(tmpdir):
    import os

    with open(os.path.join(tmpdir, "a.csv"), "w") as f:
        f.write("id,txt\n1,alpha beta\n2,gamma delta\n")
    with open(os.path.join(tmpdir, "b.csv"), "w") as f:
        f.write("id,txt\n3,alpha omega\n")
    return tmpdir


def test_load_data_flips_search_index_freshness(spark, cat):
    """Round-11 directive: LOAD DATA into an indexed managed table must
    flip the freshness fingerprint — append and OVERWRITE both."""
    d = _write_csvs(tempfile.mkdtemp(prefix="ld_"))
    run(
        spark,
        cat,
        "CREATE OR REPLACE TABLE `p.ld.t` (id INT64, txt STRING);"
        f"LOAD DATA INTO `p.ld.t` FROM FILES(format='CSV',"
        f" uris=['{d}/a.csv'], skip_leading_rows=1);"
        "CREATE SEARCH INDEX sidx ON `p.ld.t` (txt);",
    )
    q = "SELECT id FROM `p.ld.t` WHERE SEARCH(txt, 'alpha') ORDER BY id"
    assert _ids(run(spark, cat, q)) == [1]
    run(
        spark,
        cat,
        f"LOAD DATA INTO `p.ld.t` FROM FILES(format='CSV',"
        f" uris=['{d}/b.csv'], skip_leading_rows=1)",
    )
    assert _ids(run(spark, cat, q)) == [1, 3]
    run(
        spark,
        cat,
        f"LOAD DATA OVERWRITE `p.ld.t` FROM FILES(format='CSV',"
        f" uris=['{d}/b.csv'], skip_leading_rows=1)",
    )
    assert _ids(run(spark, cat, q)) == [3]


def test_external_table_rejects_index_and_mv_reads_through(spark, cat):
    """Externals must keep rejecting indexes (their files mutate
    outside the engine), and an MV over an external base must never
    serve the stale materialization — its base is untrackable."""
    import os

    d = _write_csvs(tempfile.mkdtemp(prefix="ld_"))
    run(
        spark,
        cat,
        f"CREATE EXTERNAL TABLE `p.ld.ext` OPTIONS(format='CSV',"
        f" uris=['{d}/a.csv'], skip_leading_rows=1)",
    )
    with pytest.raises(Exception, match="external"):
        run(spark, cat, "CREATE SEARCH INDEX eidx ON `p.ld.ext` (txt)")
    run(
        spark,
        cat,
        "CREATE MATERIALIZED VIEW `p.ld.mvx` AS"
        " SELECT COUNT(*) AS n FROM `p.ld.ext`",
    )
    w = run(spark, cat, "SELECT n FROM `p.ld.mvx`")
    assert w.result.collect()[0]["n"] == 2
    with open(os.path.join(d, "a.csv"), "a") as f:
        f.write("9,appended row\n")
    w = run(spark, cat, "SELECT n FROM `p.ld.mvx`")
    assert w.result.collect()[0]["n"] == 3


def test_mv_direct_read_is_always_fresh(spark, cat):
    """Round-11 confirmed wrong answer: querying an MV BY NAME after
    base DML/LOAD served the stale materialization. BigQuery's
    contract is that direct MV reads always return up-to-date results;
    stale reads now route through the defining query (fresh MVs keep
    the materialized fast path)."""
    run(
        spark,
        cat,
        "CREATE OR REPLACE TABLE `p.m.base` AS SELECT 1 AS id"
        " UNION ALL SELECT 2 AS id;"
        "CREATE MATERIALIZED VIEW `p.m.mv` AS"
        " SELECT COUNT(*) AS n FROM `p.m.base`;",
    )

    def read(q):
        return run(spark, cat, q)

    assert read("SELECT n FROM `p.m.mv`").result.collect()[0]["n"] == 2
    run(spark, cat, "INSERT INTO `p.m.base` VALUES (3)")
    w = read("SELECT n FROM `p.m.mv`")
    assert w.result.collect()[0]["n"] == 3
    assert any("stale" in line for line in w.log), w.log
    # refresh restores the materialized fast path
    run(spark, cat, "CALL BQ.REFRESH_MATERIALIZED_VIEW('p.m.mv')")
    w = read("SELECT n FROM `p.m.mv`")
    assert w.result.collect()[0]["n"] == 3
    assert not any("stale" in line for line in w.log), w.log
    # alias forms and join references stay resolvable after rewrite
    run(spark, cat, "INSERT INTO `p.m.base` VALUES (4)")
    assert (
        read("SELECT m.n FROM `p.m.mv` AS m").result.collect()[0]["n"] == 4
    )
    assert read("SELECT mv.n FROM `p.m.mv`").result.collect()[0]["n"] == 4
    assert read("SELECT x.n FROM `p.m.mv` x").result.collect()[0]["n"] == 4
    assert (
        read("EXECUTE IMMEDIATE 'SELECT n FROM `p.m.mv`'")
        .result.collect()[0]["n"]
        == 4
    )
    w = read(
        "SELECT b.id, m.n FROM `p.m.base` b JOIN `p.m.mv` m ON TRUE"
        " WHERE b.id = 1"
    )
    assert w.result.collect()[0]["n"] == 4
    # LOAD DATA mutations count too
    import os

    d = tempfile.mkdtemp(prefix="ld_")
    with open(os.path.join(d, "c.csv"), "w") as f:
        f.write("id\n5\n")
    run(
        spark,
        cat,
        f"LOAD DATA INTO `p.m.base` FROM FILES(format='CSV',"
        f" uris=['{d}/c.csv'], skip_leading_rows=1)",
    )
    assert read("SELECT n FROM `p.m.mv`").result.collect()[0]["n"] == 5


def test_mv_staleness_propagates_through_nesting(spark, cat):
    """An MV over another MV: mutating only the BASE leaves the outer
    MV's recorded fingerprint of the inner materialization unmoved —
    staleness must propagate recursively, for direct reads AND for the
    smart/containment rewrite."""
    run(
        spark,
        cat,
        "CREATE OR REPLACE TABLE `p.m.base` AS SELECT 1 AS id;"
        "CREATE MATERIALIZED VIEW `p.m.mv` AS"
        " SELECT COUNT(*) AS n FROM `p.m.base`;"
        "CREATE MATERIALIZED VIEW `p.m.mv2` AS"
        " SELECT n + 0 AS n2 FROM `p.m.mv`;",
    )
    run(spark, cat, "INSERT INTO `p.m.base` VALUES (2)")
    assert (
        run(spark, cat, "SELECT n2 FROM `p.m.mv2`")
        .result.collect()[0]["n2"]
        == 2
    )
    # exact-match smart rewrite over mv2's defining text must not
    # serve the stale mv2 materialization either
    assert (
        run(spark, cat, "SELECT n + 0 AS n2 FROM `p.m.mv`")
        .result.collect()[0]["n2"]
        == 2
    )


def test_mv_stale_read_with_trailing_comment_in_definition(spark, cat):
    """A defining query that ends in a ``--`` line comment: the stale
    direct-read rewrite wraps the query text in parentheses, so the
    injected ``)`` must land on a NEW line or the comment swallows it
    (round-11 hardening)."""
    run(
        spark,
        cat,
        "CREATE OR REPLACE TABLE `p.mc.base` AS SELECT 1 AS id;"
        "CREATE MATERIALIZED VIEW `p.mc.mv` AS"
        " SELECT COUNT(*) AS n FROM `p.mc.base` -- trailing note\n;",
    )
    run(spark, cat, "INSERT INTO `p.mc.base` VALUES (2)")
    w = run(spark, cat, "SELECT n FROM `p.mc.mv`")
    assert w.result.collect()[0]["n"] == 2
    assert any("stale" in line for line in w.log), w.log
