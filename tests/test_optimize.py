"""Physical-layout tests: bucketed joins must be shuffle-free; date
partitioning must prune; broadcast joins must not shuffle."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from crmint_spark import optimize  # noqa: E402
from crmint_spark.catalog import load  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    orders = load(spark, SF, "orders")
    li = load(spark, SF, "lineitem")
    optimize.bucket_table(orders, "orders_b", "o_orderkey", 8)
    optimize.bucket_table(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem_b", "o_orderkey", 8
    )
    # force the sort-merge path: at test SF everything fits under the
    # broadcast threshold, which would bypass the bucketing we're testing
    # (at 100 TB neither fact table broadcasts — SMJ is the real plan)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        joined = optimize.colocated_join(spark, "orders_b", "lineitem_b", "o_orderkey")
        n = joined.count()
        assert n == li.count()
        assert not optimize.explain_has_exchange(joined), (
            "bucketed join should not shuffle"
        )
        # sanity: same join on raw (unbucketed) frames DOES shuffle
        raw = li.withColumnRenamed("l_orderkey", "o_orderkey").join(
            orders, "o_orderkey"
        )
        raw.count()
        assert optimize.explain_has_exchange(raw)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_date_partitioning_prunes(spark, tmp_path):
    path = str(tmp_path / "events_part")
    ev = load(spark, SF, "events")
    optimize.partition_by_date(ev, path, "ts")
    # partition dirs exist
    dirs = [d for d in os.listdir(path) if d.startswith("dt=")]
    assert len(dirs) > 1
    back = spark.read.parquet(path)
    one_day = sorted(dirs)[0].split("=", 1)[1]
    q = back.filter(F.col("dt") == one_day)
    plan = q._jdf.queryExecution().executedPlan().toString()
    q.count()
    # partition filter must reach the scan (pruning), not a post-filter
    assert "PartitionFilters" in plan or "dt#" not in plan


def test_salted_join_equivalence(spark):
    li = load(spark, SF, "lineitem")
    orders = load(spark, SF, "orders").select("o_orderkey", "o_orderstatus")
    li2 = li.withColumnRenamed("l_orderkey", "o_orderkey")
    plain = li2.join(orders, "o_orderkey").groupBy("o_orderstatus").count()
    salted = (
        optimize.salted_join(li2, orders, "o_orderkey", n_salts=4)
        .groupBy("o_orderstatus")
        .count()
    )
    assert {tuple(r) for r in plain.collect()} == {
        tuple(r) for r in salted.collect()
    }


def test_plan_quality_pushdown_and_pruning(spark):
    """Regression guard: q01's scan must receive the shipdate filter and
    read only the referenced columns (no SELECT-star scans)."""
    from crmint_spark.registry import QUERIES

    df = QUERIES["q01_pricing_summary"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "LessThanOrEqual(l_shipdate" in plan
    # ReadSchema must exclude unused columns like l_partkey/l_suppkey
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_partkey" not in read_schema
    assert "l_comment" not in read_schema


def test_cluster_write_produces_disjoint_ranges(spark, tmp_path):
    import pyarrow.parquet as pq

    li = load(spark, SF, "lineitem")
    out = str(tmp_path / "clustered")
    optimize.cluster_write(li, out, "l_orderkey", n_files=4)
    ranges = []
    for f in sorted(os.listdir(out)):
        if not f.endswith(".parquet"):
            continue
        meta = pq.ParquetFile(os.path.join(out, f)).metadata
        col_idx = [
            meta.schema.column(i).name for i in range(meta.num_columns)
        ].index("l_orderkey")
        stats = meta.row_group(0).column(col_idx).statistics
        ranges.append((stats.min, stats.max))
    ranges.sort()
    assert len(ranges) >= 2
    # disjoint: each file's min exceeds the previous file's max — a
    # range predicate on l_orderkey then prunes whole files
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2


def test_write_sized_bounds_file_count(spark, tmp_path):
    li = load(spark, SF, "lineitem")
    out = str(tmp_path / "sized")
    optimize.write_sized(li, out, target_file_mb=1, approx_row_bytes=200)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    # ~6k rows * 200B = 1.2MB at 1MB target -> small handful of files,
    # never hundreds of tiny ones and never one giant file per row
    assert 1 <= len(files) <= 8
    back = spark.read.parquet(out)
    assert back.count() == li.count()


def test_broadcast_join_no_shuffle_on_big_side(spark):
    li = load(spark, SF, "lineitem")
    part = load(spark, SF, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_orderkey", "p_name"
    )
    joined.count()
    assert not optimize.explain_has_exchange(joined)


def test_zorder_write_clusters_both_dimensions(spark, tmp_path):
    """Every z-ordered output file must cover a strict sub-range of BOTH
    clustering columns; a plain unsorted write leaves near-full-range
    files (no stats pruning possible)."""
    import glob

    import pyarrow.parquet as pq

    from crmint_spark.catalog import load
    from crmint_spark.optimize import zorder_write

    df = load(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    zpath = str(tmp_path / "zorders")
    zorder_write(df, zpath, ["o_custkey", "o_totalprice"], n_files=8)

    def file_coverages(path, col, lo, hi):
        cov = []
        for f in sorted(glob.glob(f"{path}/*.parquet")):
            md = pq.ParquetFile(f).metadata
            fmin, fmax = None, None
            for rg in range(md.num_row_groups):
                rgm = md.row_group(rg)
                for ci in range(rgm.num_columns):
                    c = rgm.column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        s = c.statistics
                        fmin = s.min if fmin is None else min(fmin, s.min)
                        fmax = s.max if fmax is None else max(fmax, s.max)
            if fmin is not None:
                cov.append((fmax - fmin) / (hi - lo))
        return cov

    import pyspark.sql.functions as F

    lo_c, hi_c, lo_p, hi_p = df.select(
        F.min("o_custkey"), F.max("o_custkey"),
        F.min("o_totalprice"), F.max("o_totalprice"),
    ).first()
    cov_cust = file_coverages(zpath, "o_custkey", lo_c, hi_c)
    cov_price = file_coverages(zpath, "o_totalprice", lo_p, hi_p)
    assert len(cov_cust) >= 4
    # each dimension's per-file span must be well under the full range
    # on average — the multi-dimensional locality z-order exists for
    assert sum(cov_cust) / len(cov_cust) < 0.75, cov_cust
    assert sum(cov_price) / len(cov_price) < 0.75, cov_price


def test_zorder_write_rejects_bit_overflow_and_dup_cols(spark, tmp_path):
    import pytest

    from crmint_spark.catalog import load
    from crmint_spark.optimize import zorder_write

    df = load(spark, "/root/testdata/sf0.001", "orders")
    with pytest.raises(ValueError, match="63"):
        zorder_write(
            df,
            str(tmp_path / "z1"),
            ["o_custkey", "o_totalprice", "o_orderkey", "o_shippriority"],
            bits_per_col=16,
        )
    with pytest.raises(ValueError, match="duplicate"):
        zorder_write(
            df, str(tmp_path / "z2"), ["o_custkey", "o_custkey"], bits_per_col=8
        )


def test_materialize_repeated_ctes_equivalence(spark):
    """The repeated-CTE materializer (r11) must be value-transparent:
    hot CTEs re-bound to checkpoints, cold/parse-hostile inputs passed
    through untouched."""
    from crmint_spark.optimize import (
        drop_ctemat_views,
        materialize_repeated_ctes,
    )

    # not a WITH query / recursive: untouched
    assert materialize_repeated_ctes(spark, "SELECT 1") == ("SELECT 1", [])
    rec = "WITH RECURSIVE r AS (SELECT 1) SELECT * FROM r"
    assert materialize_repeated_ctes(spark, rec) == (rec, [])

    # hot aggregate CTE referenced twice, with literals hostile to a
    # naive scanner: parens, apostrophes and a line comment inside
    # strings
    q = """WITH a AS (
      SELECT id % 3 AS k, ')(' AS s, "it's -- not a comment" AS t,
             COUNT(*) AS n
      FROM range(50) GROUP BY id % 3
    ), b AS (SELECT * FROM a WHERE n > 0)
    SELECT a.k, a.n, b.t FROM a JOIN b USING (k)"""
    rewritten, views = materialize_repeated_ctes(spark, q)
    assert views, "aggregate CTE referenced twice must materialize"
    assert "__ctemat_" in rewritten
    expected = sorted(map(tuple, spark.sql(q).collect()))
    got = sorted(map(tuple, spark.sql(rewritten).collect()))
    assert got == expected
    drop_ctemat_views(spark, views)

    # single-reference CTEs stay inline
    q1 = "WITH a AS (SELECT COUNT(*) c FROM range(5) GROUP BY 1) SELECT * FROM a"
    assert materialize_repeated_ctes(spark, q1) == (q1, [])


def test_materialize_repeated_ctes_comments_between_ctes(spark):
    """ADVICE r11 (high): a comment between CTE definitions must not
    produce a partial parse that rebuilds invalid SQL — either every
    CTE parses (rewrite runs) or the text passes through untouched."""
    from crmint_spark.optimize import (
        _parse_top_ctes,
        drop_ctemat_views,
        materialize_repeated_ctes,
    )

    q = """WITH a AS (
      SELECT id % 3 AS k, COUNT(*) AS n FROM range(50) GROUP BY id % 3
    ),
    -- note between CTE definitions
    b AS (SELECT * FROM a WHERE n > 0)
    /* block comment before the final query */
    SELECT a.k, a.n FROM a JOIN b USING (k)"""
    ctes, final = _parse_top_ctes(q)
    assert [n for n, _ in ctes] == ["a", "b"]
    assert final.upper().startswith("SELECT")
    rewritten, views = materialize_repeated_ctes(spark, q)
    expected = sorted(map(tuple, spark.sql(q).collect()))
    got = sorted(map(tuple, spark.sql(rewritten).collect()))
    assert got == expected
    drop_ctemat_views(spark, views)

    # a quoted CTE name after a consumed comma must raise (fall back),
    # never fold the tail into the final query
    import pytest

    bad = "WITH a AS (SELECT 1 AS x), `b` AS (SELECT 2) SELECT * FROM a"
    with pytest.raises(ValueError):
        _parse_top_ctes(bad)
    assert materialize_repeated_ctes(spark, bad) == (bad, [])


def test_materialize_repeated_ctes_nondeterministic_gate(spark):
    """ADVICE r11 (medium): a repeated CTE whose plan carries RAND()/
    UUID() is recomputed per reference by Spark and BigQuery alike —
    the materializer must not freeze one sample."""
    from crmint_spark.optimize import materialize_repeated_ctes

    q = """WITH a AS (
      SELECT id % 3 AS k, SUM(rand()) AS r FROM range(50) GROUP BY id % 3
    )
    SELECT x.k FROM a x JOIN a y USING (k) GROUP BY x.k"""
    rewritten, views = materialize_repeated_ctes(spark, q)
    assert views == [] and rewritten == q
