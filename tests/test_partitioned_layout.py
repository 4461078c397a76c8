"""PARTITION BY / CLUSTER BY on CREATE TABLE honored as a real
partitioned parquet layout (VERDICT r7 #1): pruned scans (asserted via
PartitionFilters), schema-stable reads, DML + time travel on the same
table, the 4,000-partition cap, and the derived-conjunct routing's
conservatism (never inject past OR / non-constant bounds / other
relations).

Reference parity target: BigQuery partitioned-table DDL, the single
most common physical-layout idiom in the reference's generated SQL
(ref: model_bqml.sql:91-94 date-shards for the same pruning)."""

from __future__ import annotations

import os
import re
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from crmint_spark.catalog import Catalog, register_testdata  # noqa: E402
from crmint_spark.workers.base import WorkerContext, WorkerException  # noqa: E402
from crmint_spark.workers.sql_executor import (  # noqa: E402
    SparkSQLExecutor,
    _derive_partition_conjunct,
    _parse_partition_spec,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def ctx(spark):
    register_testdata(spark, SF)
    wh = tempfile.mkdtemp(prefix="crmint_part_")
    return WorkerContext(spark=spark, catalog=Catalog(spark, wh))


def run(ctx, script):
    w = SparkSQLExecutor({"script": script, "dry_run": False}, ctx)
    w.execute()
    return w


def partition_filters(df) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    return m.group(1) if m else ""


def test_partitioned_ctas_prunes_and_matches(ctx):
    """DATE(ts)-partitioned CTAS: hive-partitioned directory, hidden
    derived column, user-visible schema unchanged, and a date-range
    query prunes (PartitionFilters on __pk) while matching the
    unpruned answer exactly."""
    run(
        ctx,
        "CREATE OR REPLACE TABLE p.d.op PARTITION BY DATE(o_orderdate)"
        " CLUSTER BY o_custkey AS"
        " SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice"
        " FROM orders WHERE o_orderkey <= 2000",
    )
    path = ctx.catalog.path_for("p.d.op")
    assert any(d.startswith("__pk=") for d in os.listdir(path))
    df = ctx.catalog.read("p.d.op")
    assert df.columns == [
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice",
    ]
    w = run(
        ctx,
        "SELECT COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS s"
        " FROM `p.d.op`"
        " WHERE o_orderdate BETWEEN TIMESTAMP '1995-01-01'"
        " AND TIMESTAMP '1995-03-15'",
    )
    assert any("pruned" in line for line in w.log), w.log
    pf = partition_filters(w.result)
    assert "__pk" in pf and ">= 1995-01-01" in pf, pf
    exact = (
        ctx.catalog.read("p.d.op")
        .filter(
            "o_orderdate BETWEEN TIMESTAMP '1995-01-01'"
            " AND TIMESTAMP '1995-03-15'"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("s"),
        )
        .collect()
    )
    assert [tuple(r) for r in w.result.collect()] == [tuple(r) for r in exact]
    # expression-form predicate routes too, with the exact (verbatim) op
    w2 = run(
        ctx,
        "SELECT COUNT(*) AS n FROM `p.d.op`"
        " WHERE DATE(o_orderdate) = DATE '1995-01-05'",
    )
    pf2 = partition_filters(w2.result)
    assert "__pk" in pf2 and "= 1995-01-05" in pf2, pf2


def test_identity_partition_prunes_natively(ctx):
    """A bare DATE partition column is the real hive partition key:
    Catalyst prunes with no routing, and the declared column order
    survives the read-back (partition columns normally list last)."""
    run(
        ctx,
        "CREATE OR REPLACE TABLE p.d.idp PARTITION BY d AS"
        " SELECT o_orderkey, DATE(o_orderdate) AS d, o_totalprice"
        " FROM orders WHERE o_orderkey <= 2000",
    )
    df = ctx.catalog.read("p.d.idp")
    assert df.columns == ["o_orderkey", "d", "o_totalprice"]
    assert dict(df.dtypes)["d"] == "date"
    w = run(
        ctx, "SELECT COUNT(*) AS n FROM `p.d.idp` WHERE d = DATE '1995-01-05'"
    )
    assert not any("pruned" in line for line in w.log)  # no routing needed
    pf = partition_filters(w.result)
    assert "d#" in pf and "1995-01-05" in pf, pf


def test_dml_and_time_travel_keep_layout(ctx):
    """UPDATE / INSERT / DELETE on a partitioned table re-derive the
    layout (directory stays hive-partitioned, new partitions appear),
    and FOR SYSTEM_TIME AS OF restores both the pre-mutation rows AND
    the user-visible schema."""
    run(
        ctx,
        "CREATE OR REPLACE TABLE p.d.mut PARTITION BY"
        " DATE_TRUNC(o_orderdate, MONTH) AS"
        " SELECT o_orderkey, o_orderdate, o_totalprice FROM orders"
        " WHERE o_orderkey <= 400",
    )
    before = ctx.catalog.read("p.d.mut").count()
    w = run(
        ctx,
        "DECLARE t0 TIMESTAMP DEFAULT CURRENT_TIMESTAMP();"
        "UPDATE `p.d.mut` SET o_totalprice = 0 WHERE o_orderkey = 1;"
        "INSERT INTO `p.d.mut` VALUES"
        " (999999, TIMESTAMP '1997-06-05 00:00:00', 42.0);"
        "DELETE FROM `p.d.mut` WHERE o_orderkey = 2;"
        "SELECT"
        "  (SELECT COUNT(*) FROM `p.d.mut`) AS n_now,"
        "  (SELECT COUNT(*) FROM `p.d.mut` FOR SYSTEM_TIME AS OF t0)"
        "   AS n_before",
    )
    row = w.result.first()
    assert row["n_now"] == before  # +1 insert, -1 delete
    assert row["n_before"] == before
    path = ctx.catalog.path_for("p.d.mut")
    dirs = os.listdir(path)
    assert any(d.startswith("__pk=") for d in dirs)
    assert "__pk=1997-06-01" in dirs  # insert landed in a new partition
    # the updated value survived the layout rewrite
    got = (
        ctx.catalog.read("p.d.mut")
        .filter("o_orderkey = 1")
        .select("o_totalprice")
        .first()[0]
    )
    assert got == 0.0


def test_cluster_by_sorts_within_partitions(ctx):
    """CLUSTER BY columns are sorted within each partition's files —
    the property parquet row-group min/max skipping relies on."""
    run(
        ctx,
        "CREATE OR REPLACE TABLE p.d.cl PARTITION BY DATE(o_orderdate)"
        " CLUSTER BY o_custkey AS"
        " SELECT o_orderkey, o_custkey, o_orderdate FROM orders",
    )
    path = ctx.catalog.path_for("p.d.cl")
    pdirs = [d for d in os.listdir(path) if d.startswith("__pk=")]
    checked = 0
    spark = ctx.spark
    for d in sorted(pdirs)[:5]:
        for f in os.listdir(os.path.join(path, d)):
            if not f.endswith(".parquet"):
                continue
            vals = [
                r[0]
                for r in spark.read.parquet(os.path.join(path, d, f))
                .select("o_custkey")
                .collect()
            ]
            assert vals == sorted(vals), (d, f)
            checked += 1
    assert checked > 0


def test_partition_cap_enforced_and_rolled_back(ctx):
    """Beyond max_partitions (BigQuery's 4,000) the CREATE raises and a
    FRESH create rolls its directory and layout metadata back."""
    ctx.catalog.max_partitions = 5
    with pytest.raises(WorkerException, match="over the 5 cap"):
        run(
            ctx,
            "CREATE TABLE p.d.toomany PARTITION BY DATE(o_orderdate) AS"
            " SELECT o_orderkey, o_orderdate FROM orders"
            " WHERE o_orderkey <= 600",
        )
    assert not os.path.isdir(ctx.catalog.path_for("p.d.toomany"))
    assert ctx.catalog.layout_meta("p.d.toomany") is None
    ctx.catalog.max_partitions = 4000


def test_routing_is_conservative(ctx):
    """No injection through OR, non-constant bounds, or predicates on
    OTHER relations' columns — and results stay correct either way."""
    run(
        ctx,
        "CREATE OR REPLACE TABLE p.d.cons PARTITION BY DATE(o_orderdate)"
        " AS SELECT o_orderkey, o_custkey, o_orderdate FROM orders"
        " WHERE o_orderkey <= 2000",
    )
    # OR at the top level: the whole disjunction is one conjunct -> no route
    w = run(
        ctx,
        "SELECT COUNT(*) AS n FROM `p.d.cons`"
        " WHERE o_orderdate >= TIMESTAMP '1995-01-01' OR o_custkey = 1",
    )
    assert not any("pruned" in line for line in w.log), w.log
    # non-constant bound (column on the right): no route
    w = run(
        ctx,
        "SELECT COUNT(*) AS n FROM `p.d.cons`"
        " WHERE o_orderdate >= CAST(o_orderkey AS TIMESTAMP)",
    )
    assert not any("pruned" in line for line in w.log), w.log
    # a JOIN where the bound sits on the OTHER relation's column: the
    # bare column must NOT be attributed to the partitioned table
    w = run(
        ctx,
        "SELECT COUNT(*) AS n FROM `p.d.cons` c JOIN customer cu"
        " ON c.o_custkey = cu.c_custkey"
        " WHERE cu.c_acctbal >= 0 AND c_custkey <= 100",
    )
    assert not any("pruned" in line for line in w.log), w.log
    # ...but a QUALIFIED bound on the partitioned side routes inside the join
    w = run(
        ctx,
        "SELECT COUNT(*) AS n FROM `p.d.cons` c JOIN customer cu"
        " ON c.o_custkey = cu.c_custkey"
        " WHERE c.o_orderdate >= TIMESTAMP '1997-01-01'",
    )
    assert any("pruned" in line for line in w.log), w.log
    pf = partition_filters(w.result)
    assert "__pk" in pf, pf


def test_information_schema_partitions(ctx):
    """INFORMATION_SCHEMA.PARTITIONS: per-partition rows for layout
    tables (metadata-only — parquet footers), a NULL partition id of
    '__NULL__', and a single partition_id-NULL row for unpartitioned
    catalog tables."""
    run(
        ctx,
        "CREATE OR REPLACE TABLE p.d.pm PARTITION BY d AS"
        " SELECT r AS k,"
        " CASE WHEN r = 1 THEN CAST(NULL AS DATE)"
        " ELSE DATE '1995-03-01' END AS d"
        " FROM UNNEST(GENERATE_ARRAY(1, 10)) AS r",
    )
    ctx.catalog.write(
        ctx.spark.sql("SELECT 1 AS x UNION ALL SELECT 2"), "p.d.flat"
    )
    w = run(
        ctx,
        "SELECT table_name, partition_id, total_rows"
        " FROM `p.d.INFORMATION_SCHEMA.PARTITIONS`"
        " WHERE table_name IN ('pm', 'flat')"
        " ORDER BY table_name, partition_id",
    )
    rows = {(r["table_name"], r["partition_id"]): r["total_rows"]
            for r in w.result.collect()}
    assert rows[("flat", None)] == 2
    assert rows[("pm", "19950301")] == 9
    assert rows[("pm", "__NULL__")] == 1


def test_clone_routes_to_clone_not_source(ctx):
    """A clone of a partitioned table carries the layout but routes its
    pruned scans to ITS OWN directory (review finding r8: copied
    metadata pointed the layout view at the SOURCE, resurrecting
    deleted rows)."""
    run(
        ctx,
        "CREATE OR REPLACE TABLE p.d.src PARTITION BY DATE(o_orderdate)"
        " AS SELECT o_orderkey, o_orderdate FROM orders"
        " WHERE o_orderkey <= 1000;"
        "CREATE TABLE p.d.cln CLONE p.d.src;"
        "DELETE FROM `p.d.cln` WHERE o_orderkey < 900",
    )
    q = (
        "SELECT COUNT(*) AS n FROM `p.d.cln`"
        " WHERE o_orderdate >= TIMESTAMP '1992-01-01'"
    )
    w = run(ctx, q)
    assert any("pruned" in line for line in w.log), w.log
    expect = ctx.catalog.read("p.d.cln").count()
    assert w.result.first()["n"] == expect
    assert expect < ctx.catalog.read("p.d.src").count()


def test_time_travel_with_prunable_predicate(ctx):
    """FOR SYSTEM_TIME AS OF on a partitioned table with a date bound
    in the WHERE must NOT be partition-routed (the version directory,
    not the live layout, serves it — review finding r8) and must return
    the historical rows."""
    run(
        ctx,
        "CREATE OR REPLACE TABLE p.d.tt PARTITION BY DATE(o_orderdate)"
        " AS SELECT o_orderkey, o_orderdate FROM orders"
        " WHERE o_orderkey <= 400",
    )
    before = ctx.catalog.read("p.d.tt").count()
    w = run(
        ctx,
        "DECLARE t0 TIMESTAMP DEFAULT CURRENT_TIMESTAMP();"
        "DELETE FROM `p.d.tt` WHERE o_orderkey > 0;"
        "SELECT COUNT(*) AS n FROM `p.d.tt` FOR SYSTEM_TIME AS OF t0"
        " WHERE o_orderdate >= TIMESTAMP '1992-01-01'",
    )
    # the AS-OF read must not be partition-scan ROUTED (the pruned
    # copy-on-write message from the DELETE itself is fine)
    assert not any("partitioned scan" in line for line in w.log), w.log
    assert w.result.first()["n"] == before


def test_alter_table_keeps_layout(ctx):
    """ADD/DROP COLUMN and RENAME TO on a partitioned table re-apply
    the layout and refresh the visible-column record; dropping the
    partitioning column is rejected (review finding r8: the old staging
    write was flat and the stale metadata bricked reads)."""
    run(
        ctx,
        "CREATE OR REPLACE TABLE p.d.alt PARTITION BY DATE(o_orderdate)"
        " AS SELECT o_orderkey, o_orderdate, o_totalprice FROM orders"
        " WHERE o_orderkey <= 400",
    )
    run(ctx, "ALTER TABLE `p.d.alt` ADD COLUMN note STRING")
    df = ctx.catalog.read("p.d.alt")
    assert df.columns == [
        "o_orderkey", "o_orderdate", "o_totalprice", "note",
    ]
    path = ctx.catalog.path_for("p.d.alt")
    assert any(d.startswith("__pk=") for d in os.listdir(path))
    run(ctx, "ALTER TABLE `p.d.alt` DROP COLUMN o_totalprice")
    df = ctx.catalog.read("p.d.alt")
    assert df.columns == ["o_orderkey", "o_orderdate", "note"]
    # a date filter still prunes after the schema evolution
    w = run(
        ctx,
        "SELECT COUNT(*) AS n FROM `p.d.alt`"
        " WHERE DATE(o_orderdate) >= DATE '1995-01-01'",
    )
    assert any("pruned" in line for line in w.log), w.log
    with pytest.raises(WorkerException, match="partitioning column"):
        run(ctx, "ALTER TABLE `p.d.alt` DROP COLUMN o_orderdate")
    # RENAME TO carries the layout; the old name is clean for reuse
    run(ctx, "ALTER TABLE `p.d.alt` RENAME TO p.d.alt2")
    df2 = ctx.catalog.read("p.d.alt2")
    assert df2.columns == ["o_orderkey", "o_orderdate", "note"]
    assert ctx.catalog.layout_meta("p.d.alt2")["table_id"] == "p.d.alt2"
    ctx.catalog.write(
        ctx.spark.sql("SELECT 1 AS z"), "p.d.alt"
    )  # unpartitioned reuse of the old name must NOT inherit the layout
    assert ctx.catalog.read("p.d.alt").columns == ["z"]


def test_dml_partition_cap_leaves_table_untouched(ctx):
    """A mutation that would blow the partition cap raises with the
    live table UNTOUCHED (staged-directory check — review finding r8:
    the old post-swap check reported failure after applying it)."""
    run(
        ctx,
        "CREATE OR REPLACE TABLE p.d.capd PARTITION BY"
        " DATE_TRUNC(o_orderdate, YEAR) AS"
        " SELECT o_orderkey, o_orderdate FROM orders"
        " WHERE o_orderkey <= 1000",
    )
    before = sorted(
        tuple(r) for r in ctx.catalog.read("p.d.capd").collect()
    )
    ctx.catalog.max_partitions = 5
    try:
        with pytest.raises(Exception, match="over the 5 cap"):
            run(
                ctx,
                "UPDATE `p.d.capd` SET o_orderdate ="
                " TIMESTAMP_MICROS("
                "UNIX_MICROS(CAST(o_orderdate AS TIMESTAMP))"
                " + o_orderkey * 86400000000)"
                " WHERE o_orderkey > 0",
            )
    finally:
        ctx.catalog.max_partitions = 4000
    after = sorted(
        tuple(r) for r in ctx.catalog.read("p.d.capd").collect()
    )
    assert after == before


def test_is_constant_expr_positional():
    from crmint_spark.workers.sql_executor import _is_constant_expr

    assert _is_constant_expr("DATE '2024-01-01'")
    assert _is_constant_expr("TIMESTAMP '2024-01-01 03:00:00'")
    assert _is_constant_expr("'2024-01-01'")
    assert _is_constant_expr("CAST('2024-01-01' AS DATE)")
    assert _is_constant_expr(
        "TIMESTAMP_SUB(CURRENT_TIMESTAMP(), INTERVAL 7 DAY)"
    )
    assert _is_constant_expr("DATE_TRUNC(DATE '2024-03-05', MONTH)")
    assert _is_constant_expr("CURRENT_DATE")
    # bare identifiers that HAPPEN to spell date parts / types are
    # column references, not constants (review finding r8)
    assert not _is_constant_expr("day")
    assert not _is_constant_expr("month")
    assert not _is_constant_expr("date")  # bare, no literal/paren after
    assert not _is_constant_expr("b.other_col")
    assert not _is_constant_expr("upper('x')")
    assert not _is_constant_expr("(SELECT MAX(d) FROM t)")


def test_parse_partition_spec_surface():
    dt = {"ts": "timestamp", "d": "date", "n": "bigint", "s": "string"}
    assert _parse_partition_spec("d", dt)["kind"] == "identity"
    assert _parse_partition_spec("DATE(ts)", dt)["kind"] == "date"
    spec = _parse_partition_spec("TIMESTAMP_TRUNC(ts, MONTH)", dt)
    assert spec["g_template"] == "DATE_TRUNC(DATE({X}), MONTH)"
    spec = _parse_partition_spec(
        "RANGE_BUCKET(n, GENERATE_ARRAY(0, 100, 10))", dt
    )
    assert spec["kind"] == "range_bucket"
    with pytest.raises(WorkerException, match="TIMESTAMP column"):
        _parse_partition_spec("ts", dt)
    with pytest.raises(WorkerException, match="RANGE_BUCKET"):
        _parse_partition_spec("n", dt)
    with pytest.raises(WorkerException, match="unknown column"):
        _parse_partition_spec("DATE(zz)", dt)
    with pytest.raises(WorkerException, match="ingestion-time"):
        _parse_partition_spec("_PARTITIONDATE", dt)
    with pytest.raises(WorkerException, match="unsupported"):
        _parse_partition_spec("DATE_TRUNC(d, WEEK)", dt)


def test_derive_partition_conjunct_table():
    meta = {
        "source_col": "ts",
        "pcol": "__pk",
        "g_template": "DATE({X})",
        "match_forms": ["date({C})", "to_date({C})"],
    }
    d = _derive_partition_conjunct
    # source form: relaxed monotone mapping
    assert (
        d("a.ts > TIMESTAMP '2024-01-02 03:00:00'", meta, "a", False)
        == "`__pk` >= DATE((TIMESTAMP '2024-01-02 03:00:00'))"
    )
    assert d("ts = '2024-01-02'", meta, "a", True) == "`__pk` = DATE(('2024-01-02'))"
    assert d("ts = '2024-01-02'", meta, "a", False) is None  # bare, ambiguous
    assert (
        d("a.ts BETWEEN '2024-01-01' AND '2024-02-01'", meta, "a", False)
        == "`__pk` BETWEEN DATE(('2024-01-01')) AND DATE(('2024-02-01'))"
    )
    # expression form: verbatim op (exact)
    assert (
        d("DATE(a.ts) > DATE '2024-01-02'", meta, "a", False)
        == "`__pk` > DATE '2024-01-02'"
    )
    assert (
        d("DATE(a.ts) IN (DATE '2024-01-02', DATE '2024-01-09')", meta, "a", False)
        == "`__pk` IN (DATE '2024-01-02', DATE '2024-01-09')"
    )
    # inequality / disjunction / non-constant: never derived
    assert d("a.ts != '2024-01-02'", meta, "a", False) is None
    assert d("a.ts <> '2024-01-02'", meta, "a", False) is None
    assert d("a.ts >= '2024-01-01' OR a.x = 1", meta, "a", False) is None
    assert d("a.ts >= b.other_col", meta, "a", False) is None
    assert d("a.other = '2024-01-01'", meta, "a", False) is None
    # constant-expression bounds (CURRENT_DATE arithmetic) still derive
    assert (
        d("a.ts >= TIMESTAMP_SUB(CURRENT_TIMESTAMP(), INTERVAL 7 DAY)",
          meta, "a", False)
        == "`__pk` >= DATE((TIMESTAMP_SUB(CURRENT_TIMESTAMP(), INTERVAL 7 DAY)))"
    )


# ---------------------------------------------------------------------------
# partition-pruned copy-on-write DML (round 8): UPDATE/DELETE/MERGE on a
# PARTITION BY table rewrite only the affected partition directories and
# hardlink the rest — at 100 TB a one-month UPDATE must not rewrite
# three years. Inode stability is the proof of "no rewrite".


def _inode_map(path):
    return {
        d: {
            f: os.stat(os.path.join(path, d, f)).st_ino
            for f in os.listdir(os.path.join(path, d))
        }
        for d in os.listdir(path)
        if d.startswith("__pk=") or "=" in d
    }


def _twin(ctx, name, create_suffix=""):
    """An unpartitioned twin (session-plane) table with the same rows,
    for comparing the pruned rewrite against the full rewrite."""
    run(
        ctx,
        f"CREATE OR REPLACE TABLE `p.d.{name}` AS"
        " SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice"
        " FROM orders" + create_suffix,
    )


def _rows(ctx, table):
    return sorted(tuple(r) for r in ctx.catalog.read(table).collect())


def test_pruned_update_hardlinks_untouched_partitions(ctx):
    """A one-month UPDATE rewrites ONE partition directory; every other
    directory survives the swap with identical file names AND inodes
    (hardlinked, zero bytes copied), the time-travel pre-image still
    resolves, and the values match the unpartitioned full rewrite."""
    run(
        ctx,
        "CREATE OR REPLACE TABLE p.d.pru PARTITION BY"
        " DATE_TRUNC(o_orderdate, MONTH) AS"
        " SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice"
        " FROM orders",
    )
    _twin(ctx, "pruf")
    path = ctx.catalog.path_for("p.d.pru")
    before = _inode_map(path)
    upd = (
        "UPDATE `{t}` SET o_totalprice = 0"
        " WHERE DATE(o_orderdate) BETWEEN DATE '1995-03-01'"
        " AND DATE '1995-03-31'"
    )
    w = run(
        ctx,
        "DECLARE t0 TIMESTAMP DEFAULT CURRENT_TIMESTAMP();"
        + upd.format(t="p.d.pru")
        + ";SELECT COUNT(*) AS n FROM `p.d.pru` FOR SYSTEM_TIME AS OF t0"
        " WHERE o_totalprice = 0",
    )
    assert any(
        "pruned copy-on-write rewrote 1/" in line for line in w.log
    ), w.log
    assert w.result.first()["n"] == 0  # pre-image has no zeroed rows
    run(ctx, upd.format(t="p.d.pruf"))
    assert _rows(ctx, "p.d.pru") == _rows(ctx, "p.d.pruf")
    after = _inode_map(path)
    changed = {d for d in before if before[d] != after.get(d)}
    assert changed == {"__pk=1995-03-01"}, changed
    # untouched dirs are the SAME inodes (hardlinks, not copies)
    for d in before:
        if d != "__pk=1995-03-01":
            assert after[d] == before[d]


def test_pruned_update_noop_and_nondet_fallback(ctx):
    """A predicate matching no rows is a no-op (no new version, data
    untouched); a non-deterministic predicate falls back to the full
    single-pass rewrite (two probe passes would be unsound); an argless
    CURRENT_TIMESTAMP predicate is frozen to one instant and still
    prunes."""
    run(
        ctx,
        "CREATE OR REPLACE TABLE p.d.prn PARTITION BY"
        " DATE_TRUNC(o_orderdate, MONTH) AS"
        " SELECT o_orderkey, o_orderdate, o_totalprice FROM orders",
    )
    rows0 = _rows(ctx, "p.d.prn")
    vroot = ctx.catalog._versions_root("p.d.prn")
    nv0 = len(os.listdir(vroot))
    w = run(
        ctx,
        "UPDATE `p.d.prn` SET o_totalprice = 0 WHERE o_orderkey = -5",
    )
    assert any("no partition holds matching rows" in l for l in w.log)
    assert len(os.listdir(vroot)) == nv0  # no version churn on a no-op
    assert _rows(ctx, "p.d.prn") == rows0
    # frozen CURRENT_TIMESTAMP: engaged the pruned path (no-op message),
    # not the non-determinism fallback
    w2 = run(
        ctx,
        "DELETE FROM `p.d.prn` WHERE o_orderdate > CURRENT_TIMESTAMP()",
    )
    assert any("no partition holds matching rows" in l for l in w2.log)
    # RAND() is genuinely non-deterministic -> full rewrite path
    w3 = run(ctx, "DELETE FROM `p.d.prn` WHERE RAND() < -1")
    assert not any("pruned copy-on-write" in l for l in w3.log)
    assert not any("no partition holds" in l for l in w3.log)
    assert _rows(ctx, "p.d.prn") == rows0


def test_pruned_delete_drops_emptied_partition(ctx):
    """A DELETE that empties a partition removes its directory from the
    layout; the other directories ride through by hardlink."""
    run(
        ctx,
        "CREATE OR REPLACE TABLE p.d.prd PARTITION BY"
        " DATE_TRUNC(o_orderdate, MONTH) AS"
        " SELECT o_orderkey, o_orderdate, o_totalprice FROM orders",
    )
    path = ctx.catalog.path_for("p.d.prd")
    before = _inode_map(path)
    assert "__pk=1995-03-01" in before
    w = run(
        ctx,
        "DELETE FROM `p.d.prd` WHERE DATE(o_orderdate)"
        " BETWEEN DATE '1995-03-01' AND DATE '1995-03-31'",
    )
    assert any("pruned copy-on-write rewrote 1/" in l for l in w.log)
    after = _inode_map(path)
    assert "__pk=1995-03-01" not in after
    assert {d: m for d, m in before.items() if d != "__pk=1995-03-01"} == after
    assert (
        ctx.catalog.read("p.d.prd")
        .filter("o_orderdate >= TIMESTAMP '1995-03-01'"
                " AND o_orderdate < TIMESTAMP '1995-04-01'")
        .count()
        == 0
    )


def test_pruned_update_moves_rows_between_partitions(ctx):
    """An UPDATE that reassigns the partitioning column merges the
    moved rows INTO untouched destination directories (old files
    hardlinked beside the new ones) — the union must equal the full
    rewrite exactly."""
    run(
        ctx,
        "CREATE OR REPLACE TABLE p.d.prm PARTITION BY"
        " DATE_TRUNC(o_orderdate, MONTH) AS"
        " SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice"
        " FROM orders",
    )
    _twin(ctx, "prmf")
    n0 = ctx.catalog.read("p.d.prm").count()
    upd = (
        "UPDATE `{t}` SET o_orderdate ="
        " TIMESTAMP_ADD(o_orderdate, INTERVAL 40 DAY)"
        " WHERE DATE(o_orderdate) BETWEEN DATE '1995-03-01'"
        " AND DATE '1995-03-31'"
    )
    w = run(ctx, upd.format(t="p.d.prm"))
    assert any("pruned copy-on-write rewrote 1/" in l for l in w.log)
    run(ctx, upd.format(t="p.d.prmf"))
    assert _rows(ctx, "p.d.prm") == _rows(ctx, "p.d.prmf")
    assert ctx.catalog.read("p.d.prm").count() == n0


def test_pruned_merge_and_by_source_fallback(ctx):
    """A MERGE whose ON condition only reaches one month's rows prunes
    to that month's directory; adding a NOT MATCHED BY SOURCE arm (which
    can mutate ANY unmatched target row) disables pruning; both match
    the unpartitioned twin exactly."""
    create = (
        "CREATE OR REPLACE TABLE {n} {clause} AS"
        " SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice"
        " FROM orders"
    )
    run(ctx, create.format(
        n="p.d.prg", clause="PARTITION BY DATE_TRUNC(o_orderdate, MONTH)"
    ))
    run(ctx, create.format(n="`p.d.prgf`", clause=""))
    merge = (
        "MERGE INTO `{t}` T USING ("
        " SELECT o_orderkey AS k, o_totalprice AS p FROM orders"
        " WHERE DATE(o_orderdate) BETWEEN DATE '1995-03-01'"
        " AND DATE '1995-03-31') S"
        " ON T.o_orderkey = S.k"
        " WHEN MATCHED THEN UPDATE SET o_totalprice = S.p * 2"
        " WHEN NOT MATCHED THEN INSERT (o_orderkey, o_custkey,"
        " o_orderdate, o_totalprice)"
        " VALUES (S.k + 9000000, 1, TIMESTAMP '2001-05-15', S.p)"
    )
    w = run(ctx, merge.format(t="p.d.prg"))
    assert any("pruned copy-on-write rewrote 1/" in l for l in w.log), w.log
    run(ctx, merge.format(t="p.d.prgf"))
    assert _rows(ctx, "p.d.prg") == _rows(ctx, "p.d.prgf")
    # the inserts landed in a NEW partition without disturbing others
    assert "__pk=2001-05-01" in os.listdir(ctx.catalog.path_for("p.d.prg"))
    by_source = (
        "MERGE INTO `{t}` T USING (SELECT 1 AS k) S ON T.o_orderkey = S.k"
        " WHEN MATCHED THEN UPDATE SET o_totalprice = 0"
        " WHEN NOT MATCHED BY SOURCE AND o_totalprice < 1000"
        " THEN DELETE"
    )
    w2 = run(ctx, by_source.format(t="p.d.prg"))
    assert not any("pruned copy-on-write" in l for l in w2.log)
    run(ctx, by_source.format(t="p.d.prgf"))
    assert _rows(ctx, "p.d.prg") == _rows(ctx, "p.d.prgf")


def test_merge_upsert_batch_prunes_partitions(ctx):
    """The streaming CDC building block (merge_upsert_batch) probes the
    key match with a broadcast semi join and merges against only the
    affected partition directories — a micro-batch touching one month
    of a date-partitioned table must not rewrite the rest (inode
    proof)."""
    from crmint_spark.dml import merge_upsert_batch

    run(
        ctx,
        "CREATE OR REPLACE TABLE p.d.prub PARTITION BY"
        " DATE_TRUNC(o_orderdate, MONTH) AS"
        " SELECT o_orderkey, o_orderdate, o_totalprice FROM orders",
    )
    path = ctx.catalog.path_for("p.d.prub")
    spark = ctx.spark
    victim = (
        ctx.catalog.read("p.d.prub")
        .filter("o_orderdate >= TIMESTAMP '1995-03-01'"
                " AND o_orderdate < TIMESTAMP '1995-04-01'")
        .first()
    )
    before = _inode_map(path)
    batch = spark.createDataFrame(
        [
            (victim["o_orderkey"], victim["o_orderdate"], 123.45),
            (9999991, victim["o_orderdate"], 67.89),  # new key, same month
        ],
        schema=ctx.catalog.read("p.d.prub").schema,
    )
    merge_upsert_batch(ctx.catalog, "p.d.prub", batch, ["o_orderkey"])
    after = _inode_map(path)
    changed = {d for d in set(before) | set(after)
               if before.get(d) != after.get(d)}
    assert changed == {"__pk=1995-03-01"}, changed
    got = ctx.catalog.read("p.d.prub").filter(
        f"o_orderkey IN ({victim['o_orderkey']}, 9999991)"
    )
    vals = {r["o_orderkey"]: r["o_totalprice"] for r in got.collect()}
    assert vals[victim["o_orderkey"]] == 123.45
    assert vals[9999991] == 67.89


# ---------------------------------------------------------------------------
# table options (round 8): require_partition_filter scan/DML guard,
# partition_expiration_days GC, INFORMATION_SCHEMA.TABLE_OPTIONS


def test_require_partition_filter_guard(ctx):
    run(
        ctx,
        "CREATE OR REPLACE TABLE p.d.rpf"
        " PARTITION BY DATE_TRUNC(o_orderdate, MONTH)"
        " OPTIONS(require_partition_filter = true, description = 'guarded')"
        " AS SELECT o_orderkey, o_orderdate, o_totalprice FROM orders",
    )
    # unfiltered / !=-only / other-column filters all refuse
    for bad in (
        "SELECT COUNT(*) AS n FROM `p.d.rpf`",
        "SELECT COUNT(*) AS n FROM `p.d.rpf`"
        " WHERE o_orderdate != TIMESTAMP '1995-01-01'",
        "SELECT COUNT(*) AS n FROM `p.d.rpf` WHERE o_totalprice > 0",
    ):
        with pytest.raises(WorkerException, match="partition elimination"):
            run(ctx, bad)
    # usable filters pass: direct range, expression form, IN, IS NULL
    for good in (
        "SELECT COUNT(*) AS n FROM `p.d.rpf`"
        " WHERE o_orderdate >= TIMESTAMP '1996-01-01'",
        "SELECT COUNT(*) AS n FROM `p.d.rpf`"
        " WHERE DATE(o_orderdate) = DATE '1995-03-05'",
        "SELECT COUNT(*) AS n FROM `p.d.rpf` WHERE o_orderdate IS NULL",
    ):
        run(ctx, good)
    # DML: WHERE/ON must carry the filter; INSERT is exempt
    with pytest.raises(WorkerException, match="partition elimination"):
        run(ctx, "DELETE FROM `p.d.rpf` WHERE o_totalprice < 0")
    with pytest.raises(WorkerException, match="partition elimination"):
        run(
            ctx,
            "MERGE INTO `p.d.rpf` T USING (SELECT 1 AS k) S"
            " ON T.o_orderkey = S.k"
            " WHEN MATCHED THEN UPDATE SET o_totalprice = 0",
        )
    run(
        ctx,
        "UPDATE `p.d.rpf` SET o_totalprice = 0"
        " WHERE o_orderdate = TIMESTAMP '1995-01-05'",
    )
    run(
        ctx,
        "INSERT INTO `p.d.rpf` VALUES"
        " (999999, TIMESTAMP '1999-01-01', 1.0)",
    )
    # dry run errors too (BigQuery contract), and the guard clears
    # through ALTER ... SET OPTIONS
    w = SparkSQLExecutor(
        {"script": "SELECT COUNT(*) AS n FROM `p.d.rpf`", "dry_run": True},
        ctx,
    )
    with pytest.raises(WorkerException, match="partition elimination"):
        w.execute()
    run(ctx, "ALTER TABLE `p.d.rpf` SET OPTIONS(require_partition_filter = false)")
    run(ctx, "SELECT COUNT(*) AS n FROM `p.d.rpf`")
    # ... and an unpartitioned table refuses the option outright
    with pytest.raises(WorkerException, match="needs a partitioned"):
        run(
            ctx,
            "CREATE OR REPLACE TABLE p.d.flatc CLUSTER BY o_custkey"
            " OPTIONS(require_partition_filter = true)"
            " AS SELECT o_orderkey, o_custkey FROM orders",
        )


def test_partition_expiration_and_table_options_view(ctx):
    import datetime

    run(
        ctx,
        "CREATE OR REPLACE TABLE p.d.pex"
        " PARTITION BY DATE_TRUNC(o_orderdate, MONTH)"
        " OPTIONS(partition_expiration_days = 365000.0)"
        " AS SELECT o_orderkey, o_orderdate FROM orders",
    )
    before = ctx.catalog.read("p.d.pex").count()
    assert before > 0  # a ~1000-year window expires nothing at create
    ctx.catalog.set_table_options(
        "p.d.pex", {"partition_expiration_days": 365.0}
    )
    dropped = ctx.catalog.expire_partitions(
        "p.d.pex", today=datetime.date(1997, 1, 1)
    )
    assert dropped > 0
    live = ctx.catalog.read("p.d.pex")
    assert live.filter("o_orderdate < TIMESTAMP '1996-01-01'").count() == 0
    assert live.count() < before
    # the pre-image archived: change history sees the expiration as
    # DELETEs of exactly the expired rows
    w = run(
        ctx,
        "SELECT COUNT(*) AS n FROM CHANGES(TABLE `p.d.pex`, NULL, NULL)"
        " WHERE _CHANGE_TYPE = 'DELETE'",
    )
    assert w.result.first()["n"] == before - live.count()
    # TABLE_OPTIONS contract
    w2 = run(
        ctx,
        "SELECT table_name, option_name, option_type, option_value"
        " FROM `p.d.INFORMATION_SCHEMA.TABLE_OPTIONS`"
        " WHERE table_name = 'pex'",
    )
    rows = [tuple(r) for r in w2.result.collect()]
    assert ("pex", "partition_expiration_days", "FLOAT64", "365") in rows
    # a creation-time window older than ALL data expires everything
    # immediately yet leaves a READABLE empty table (schema sidecar)
    run(
        ctx,
        "CREATE OR REPLACE TABLE p.d.pez"
        " PARTITION BY DATE_TRUNC(o_orderdate, MONTH)"
        " OPTIONS(partition_expiration_days = 365.0)"
        " AS SELECT o_orderkey, o_orderdate FROM orders",
    )
    assert ctx.catalog.read("p.d.pez").count() == 0
    assert ctx.catalog.read("p.d.pez").columns == [
        "o_orderkey", "o_orderdate",
    ]
    # vacuum hook reaches tables not being written — under the REAL
    # clock every remaining 1990s partition is long past 365 days, and
    # the fully-expired table stays readable (schema sidecar)
    assert ctx.catalog.vacuum_expired_partitions() > 0
    assert ctx.catalog.read("p.d.pex").count() == 0
    # clone and rename carry options; drop clears them
    run(ctx, "CREATE TABLE p.d.pex2 CLONE p.d.pex")
    assert ctx.catalog.table_options("p.d.pex2").get(
        "partition_expiration_days"
    ) == 365.0
    run(ctx, "ALTER TABLE `p.d.pex2` RENAME TO `p.d.pex3`")
    assert ctx.catalog.table_options("p.d.pex3")
    assert not ctx.catalog.table_options("p.d.pex2")
    run(ctx, "DROP TABLE `p.d.pex3`")
    assert not ctx.catalog.table_options("p.d.pex3")


def test_truncate_partitioned_table_stays_readable(ctx):
    """TRUNCATE on a partitioned table leaves zero parquet footers —
    reads must serve the empty user schema from the layout sidecar, and
    a later INSERT re-populates the layout normally (pre-existing bug
    found in round 8 while building partition expiration)."""
    run(
        ctx,
        "CREATE OR REPLACE TABLE p.d.trp PARTITION BY"
        " DATE_TRUNC(o_orderdate, MONTH) AS"
        " SELECT o_orderkey, o_orderdate FROM orders"
        " WHERE o_orderkey <= 100",
    )
    run(ctx, "TRUNCATE TABLE p.d.trp")
    empty = ctx.catalog.read("p.d.trp")
    assert empty.count() == 0
    assert empty.columns == ["o_orderkey", "o_orderdate"]
    # SQL-plane read and pruned-scan routing survive the empty state
    w = run(
        ctx,
        "SELECT COUNT(*) AS n FROM `p.d.trp`"
        " WHERE DATE(o_orderdate) = DATE '1995-01-05'",
    )
    assert w.result.first()["n"] == 0
    run(
        ctx,
        "INSERT INTO `p.d.trp` VALUES (7, TIMESTAMP '1999-02-03')",
    )
    assert ctx.catalog.read("p.d.trp").count() == 1
    assert "__pk=1999-02-01" in os.listdir(ctx.catalog.path_for("p.d.trp"))


def test_table_options_lifecycle_review_fixes(ctx):
    """Round-8 review wave: OR REPLACE resets unstated options; CLONE
    onto an existing name clears the predecessor's; a boolean
    partition_expiration_days is a type error; an invalid OPTIONS
    clause leaves the old table intact (atomic DDL); labels arrays
    parse as one option."""
    import datetime

    create = (
        "CREATE OR REPLACE TABLE p.d.lif"
        " PARTITION BY DATE_TRUNC(o_orderdate, MONTH) {opts}"
        " AS SELECT o_orderkey, o_orderdate FROM orders"
    )
    run(ctx, create.format(opts="OPTIONS(partition_expiration_days = 365.0,"
                                " require_partition_filter = true)"))
    # OR REPLACE with no OPTIONS resets both engine-plane options: the
    # stale 365-day window must NOT GC the replacement, and unfiltered
    # queries work again
    run(ctx, create.format(opts=""))
    assert ctx.catalog.table_options("p.d.lif") == {}
    assert ctx.catalog.read("p.d.lif").count() > 0
    run(ctx, "SELECT COUNT(*) AS n FROM `p.d.lif`")
    # clone onto an existing table: destination options = source's
    ctx.catalog.set_table_options("p.d.lif", {"description": "src"})
    run(ctx, create.format(opts="").replace("p.d.lif", "p.d.lifdst"))
    ctx.catalog.set_table_options(
        "p.d.lifdst", {"partition_expiration_days": 365.0}
    )
    run(ctx, "CREATE OR REPLACE TABLE `p.d.lifdst` CLONE `p.d.lif`")
    assert ctx.catalog.table_options("p.d.lifdst") == {"description": "src"}
    # boolean expiration = type error (bool IS an int in Python)
    with pytest.raises(WorkerException, match="positive number"):
        run(
            ctx,
            "ALTER TABLE `p.d.lif` SET"
            " OPTIONS(partition_expiration_days = true)",
        )
    # invalid OPTIONS on CREATE OR REPLACE: the old table survives
    before = ctx.catalog.read("p.d.lif").count()
    with pytest.raises(WorkerException, match="needs a partitioned"):
        run(
            ctx,
            "CREATE OR REPLACE TABLE p.d.lif CLUSTER BY o_orderkey"
            " OPTIONS(require_partition_filter = true)"
            " AS SELECT o_orderkey, o_orderdate FROM orders LIMIT 5",
        )
    assert ctx.catalog.read("p.d.lif").count() == before
    # labels array parses as ONE option (bracket-aware split)
    run(
        ctx,
        "ALTER TABLE `p.d.lif` SET OPTIONS("
        "labels = [(\"team\", \"growth\"), (\"env\", \"prod\")],"
        " description = 'labeled')",
    )
    opts = ctx.catalog.table_options("p.d.lif")
    assert opts["description"] == "labeled"
    assert opts["labels"] == '[("team", "growth"), ("env", "prod")]'


def test_partition_filter_guard_scopes_review_fixes(ctx):
    """Round-8 review wave: comma-listed guarded relations are checked;
    UNNEST correlation keeps the scope single-relation (bare filters
    count); a JOIN's ON condition can carry the eliminating filter."""
    run(
        ctx,
        "CREATE OR REPLACE TABLE p.d.gsc"
        " PARTITION BY DATE_TRUNC(o_orderdate, MONTH)"
        " OPTIONS(require_partition_filter = true)"
        " AS SELECT o_orderkey, o_orderdate FROM orders",
    )
    # comma-listed, unfiltered -> refuses (previously escaped the guard)
    with pytest.raises(WorkerException, match="partition elimination"):
        run(
            ctx,
            "SELECT COUNT(*) AS n FROM customer, `p.d.gsc` g"
            " WHERE c_custkey = 1",
        )
    # ... and with a QUALIFIED filter it passes
    run(
        ctx,
        "SELECT COUNT(*) AS n FROM customer, `p.d.gsc` g"
        " WHERE g.o_orderdate >= TIMESTAMP '1996-01-01' AND c_custkey = 1",
    )
    # UNNEST comma keeps bare filters usable
    run(
        ctx,
        "SELECT COUNT(*) AS n FROM `p.d.gsc`, UNNEST([1, 2]) AS x"
        " WHERE o_orderdate >= TIMESTAMP '1996-01-01'",
    )
    # the ON clause carries the filter
    run(
        ctx,
        "SELECT COUNT(*) AS n FROM customer c JOIN `p.d.gsc` g"
        " ON g.o_orderkey = c.c_custkey"
        " AND g.o_orderdate >= TIMESTAMP '1996-01-01'",
    )
    with pytest.raises(WorkerException, match="partition elimination"):
        run(
            ctx,
            "SELECT COUNT(*) AS n FROM customer c JOIN `p.d.gsc` g"
            " ON g.o_orderkey = c.c_custkey",
        )


def test_table_expiration_and_column_field_paths(ctx):
    """expiration_timestamp drops the whole table at vacuum time (the
    pre-image archives, so time travel still serves the final state);
    COLUMN_FIELD_PATHS lists nested fields with dotted paths."""
    from crmint_spark.workers.storage_cleaner import StorageCleaner

    ctx.catalog.write(
        ctx.spark.sql(
            "SELECT 1 AS id, STRUCT('x' AS tag) AS meta,"
            " ARRAY(STRUCT(2 AS q)) AS items"
        ),
        "p.d.exp",
    )
    run(
        ctx,
        'ALTER TABLE `p.d.exp` SET OPTIONS(expiration_timestamp ='
        ' TIMESTAMP "2020-01-01 00:00:00")',
    )
    w = run(
        ctx,
        "SELECT field_path, data_type"
        " FROM `p.d.INFORMATION_SCHEMA.COLUMN_FIELD_PATHS`"
        " WHERE table_name = 'exp' ORDER BY field_path",
    )
    got = [tuple(r) for r in w.result.collect()]
    assert ("items.q", "INT64") in got and ("meta.tag", "STRING") in got
    # internal normalization never leaks into TABLE_OPTIONS
    w2 = run(
        ctx,
        "SELECT option_name FROM `p.d.INFORMATION_SCHEMA.TABLE_OPTIONS`"
        " WHERE table_name = 'exp'",
    )
    names = {r["option_name"] for r in w2.result.collect()}
    assert "expiration_timestamp" in names
    assert "expiration_timestamp_us" not in names
    # a NULL expiration evaluates to an error, a FUTURE one survives
    # the vacuum, a PAST one drops
    sc = StorageCleaner(
        {
            "file_patterns": ["__nope__"],
            "days_to_keep": 9999,
            "vacuum_table_expiration": True,
        },
        ctx,
    )
    sc.execute()
    assert not ctx.catalog.exists("p.d.exp")
    assert not ctx.catalog.table_options("p.d.exp")  # drop cleared them
    ctx.catalog.write(ctx.spark.sql("SELECT 1 AS id"), "p.d.keep")
    run(
        ctx,
        'ALTER TABLE `p.d.keep` SET OPTIONS(expiration_timestamp ='
        ' TIMESTAMP "2999-01-01 00:00:00")',
    )
    assert ctx.catalog.vacuum_expired_tables() == 0
    assert ctx.catalog.exists("p.d.keep")
    with pytest.raises(WorkerException, match="evaluated to NULL"):
        run(
            ctx,
            "ALTER TABLE `p.d.keep` SET OPTIONS(expiration_timestamp ="
            " CAST(NULL AS TIMESTAMP))",
        )
