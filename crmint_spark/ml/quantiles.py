"""Scalable quantile bucketing — the 100 TB path for the conversion-value
table.

The reference buckets predictions with a global ``NTILE(n) OVER (ORDER BY
probability)`` (ref: model_bqml.sql:49), which Spark executes as a
single-partition sort — correct, and fine for the tiny calibration split,
but a non-starter over billions of rows. This module provides the
equivalent segment table from ``approxQuantile`` (Greenwald-Khanna
sketch, one pass, no global sort): boundaries come from the sketch,
segment assignment is a broadcast range join, and per-segment stats are
an ordinary grouped aggregation.

Trade-off: segment boundaries are approximate within ``relative_error``
quantile mass; segment populations deviate accordingly. The exact NTILE
variant stays available for small inputs (queries.q05) — this is the
drop-in replacement when the input stops fitting one partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def approx_segments(
    df: DataFrame,
    col: str,
    n_segments: int = 10,
    relative_error: float = 0.001,
) -> DataFrame:
    """Segment-boundary table: (segment, range_start, range_end, n, value).

    One sketch pass + one broadcast range join + one groupBy — every
    stage is partition-parallel.
    """
    probs = [i / n_segments for i in range(n_segments + 1)]
    bounds = df.approxQuantile(col, probs, relative_error)
    spark = df.sparkSession
    rows = [
        (i + 1, float(bounds[i]), float(bounds[i + 1]))
        for i in range(n_segments)
    ]
    seg = spark.createDataFrame(
        rows, "segment int, range_start double, range_end double"
    )
    c = F.col(col)
    # half-open ranges except the last (closed) — every value lands in
    # exactly one segment even with duplicate boundary values
    cond = (c >= F.col("range_start")) & (
        (c < F.col("range_end"))
        | ((F.col("segment") == n_segments) & (c <= F.col("range_end")))
    )
    assigned = df.join(F.broadcast(seg), cond)
    return (
        assigned.groupBy("segment", "range_start", "range_end")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(c), 6).alias("value"),
        )
        .orderBy("segment")
    )


def compare_with_exact_ntile(
    df: DataFrame, col: str, n_segments: int = 10
) -> DataFrame:
    """Exact-NTILE segment sizes for validation (single-partition sort —
    test-scale only)."""
    w = Window.orderBy(F.asc(col))
    return (
        df.select(F.ntile(n_segments).over(w).alias("segment"))
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
