"""approxQuantile segment table vs exact NTILE: populations must agree
within sketch tolerance, every row assigned exactly once."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from crmint_spark.catalog import load  # noqa: E402
from crmint_spark.ml.quantiles import approx_segments, compare_with_exact_ntile  # noqa: E402

SF = "/root/testdata/sf0.01"


def test_every_row_assigned_exactly_once(spark):
    cust = load(spark, SF, "customer").select("c_acctbal")
    seg = approx_segments(cust, "c_acctbal", 10, relative_error=0.001)
    total = seg.agg(F.sum("n")).first()[0]
    assert total == cust.count()


def test_segment_sizes_match_exact_ntile_within_tolerance(spark):
    cust = load(spark, SF, "customer").select("c_acctbal")
    n_rows = cust.count()
    seg = {r.segment: r.n for r in approx_segments(cust, "c_acctbal", 10).collect()}
    exact = {
        r.segment: r.n_exact
        for r in compare_with_exact_ntile(cust, "c_acctbal", 10).collect()
    }
    assert set(seg) == set(exact)
    for s in seg:
        # sketch with rel_error=0.001 on ~1500 rows: allow 5% + ties slack
        assert abs(seg[s] - exact[s]) <= max(0.05 * n_rows / 10, 10), (
            s,
            seg[s],
            exact[s],
        )


def test_boundaries_are_monotonic(spark):
    cust = load(spark, SF, "customer").select("c_acctbal")
    rows = approx_segments(cust, "c_acctbal", 10).orderBy("segment").collect()
    for prev, cur in zip(rows, rows[1:]):
        assert prev.range_end <= cur.range_start or abs(
            prev.range_end - cur.range_start
        ) < 1e-9
        assert prev.range_start < prev.range_end
