"""Per-statement wall-clock profile of the dml_partitioned_table and
dml_pruned_merge bench entries (guide §1: measure first). Runs each
script statement through its own SparkSQLExecutor call so the split is
attributable, on the same session/catalog the bench entry uses."""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crmint_spark.catalog import Catalog  # noqa: E402
from crmint_spark.queries_dml import register_testdata  # noqa: E402
from crmint_spark.session import get_spark  # noqa: E402
from crmint_spark.workers.base import WorkerContext  # noqa: E402
from crmint_spark.workers.sql_executor import SparkSQLExecutor  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

PARTITIONED_STMTS = [
    (
        "ctas",
        """CREATE OR REPLACE TABLE p.d.orders_part
        PARTITION BY DATE_TRUNC(o_orderdate, MONTH)
        CLUSTER BY o_custkey AS
        SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
               o_orderstatus
        FROM orders""",
    ),
    (
        "insert",
        """INSERT INTO `p.d.orders_part`
        SELECT o_orderkey + 5000000, o_custkey,
               TIMESTAMP_ADD(o_orderdate, INTERVAL 1 DAY),
               o_totalprice * 0.5, 'N'
        FROM orders WHERE o_orderstatus = 'P'""",
    ),
    (
        "update",
        """UPDATE `p.d.orders_part` SET o_totalprice = o_totalprice * 1.1
        WHERE DATE(o_orderdate) BETWEEN DATE '1995-01-01'
          AND DATE '1995-12-31'""",
    ),
    ("delete", "DELETE FROM `p.d.orders_part` WHERE o_custkey = 1"),
    (
        "select",
        """SELECT DATE_TRUNC(DATE(o_orderdate), MONTH) AS month,
               COUNT(*) AS n,
               ROUND(SUM(o_totalprice), 2) AS revenue
        FROM `p.d.orders_part`
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1996-01-01'
        GROUP BY month ORDER BY month""",
    ),
]

MERGE_STMTS = [
    (
        "ctas",
        """CREATE OR REPLACE TABLE p.d.ocdc
        PARTITION BY DATE_TRUNC(o_orderdate, MONTH) AS
        SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
        FROM orders""",
    ),
    (
        "merge",
        """MERGE INTO `p.d.ocdc` T USING (
          SELECT CASE WHEN MOD(o_orderkey, 2) = 0 THEN o_orderkey
                      ELSE o_orderkey + 7000000 END AS k,
                 o_totalprice AS p, o_orderdate AS d
          FROM orders
          WHERE DATE(o_orderdate) BETWEEN DATE '1996-06-01'
            AND DATE '1996-06-30'
        ) S ON T.o_orderkey = S.k
        WHEN MATCHED THEN UPDATE SET o_totalprice = S.p * 0.9
        WHEN NOT MATCHED THEN INSERT
          (o_orderkey, o_custkey, o_orderdate, o_totalprice)
          VALUES (S.k, 42, TIMESTAMP_ADD(S.d, INTERVAL 2000 DAY), S.p)""",
    ),
    (
        "select",
        """SELECT DATE_TRUNC(DATE(o_orderdate), MONTH) AS month,
               COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS rev
        FROM `p.d.ocdc`
        WHERE o_custkey = 42
           OR (o_orderdate >= TIMESTAMP '1996-06-01'
               AND o_orderdate < TIMESTAMP '1996-07-01')
        GROUP BY month ORDER BY month""",
    ),
]


def run(spark, label, stmts, repeat=2):
    sc = spark.sparkContext
    st = sc.statusTracker()
    for it in range(repeat):
        register_testdata(spark, SF_DIR)
        cat = Catalog(spark, tempfile.mkdtemp(prefix="dml_prof_"))
        total = 0.0
        for name, stmt in stmts:
            group = f"{label}:{name}:{it}"
            sc.setJobGroup(group, group)
            t0 = time.perf_counter()
            w = SparkSQLExecutor(
                {"script": stmt, "dry_run": False},
                WorkerContext(spark=spark, catalog=cat),
            )
            w.execute()
            if w.result is not None:
                w.result.count()
            dt = time.perf_counter() - t0
            total += dt
            jobs = st.getJobIdsForGroup(group)
            n_tasks = 0
            for j in jobs:
                ji = st.getJobInfo(j)
                for sid in ji.stageIds if ji else []:
                    si = st.getStageInfo(sid)
                    n_tasks += si.numTasks if si else 0
            print(
                f"  [{label} it{it}] {name:8s} {dt:7.3f}s"
                f"  jobs={len(jobs):3d} tasks={n_tasks:4d}",
                flush=True,
            )
        print(f"  [{label} it{it}] TOTAL    {total:7.3f}s", flush=True)


def main():
    spark = get_spark(
        "profile-dml", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, "partitioned", PARTITIONED_STMTS)
    run(spark, "pruned_merge", MERGE_STMTS)


if __name__ == "__main__":
    main()
