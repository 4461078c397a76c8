"""Temporal operators: as-of (point-in-time) join.

The reference's attribution queries pick "the latest event at or before
a reference instant per key" with correlated ``ROW_NUMBER() = 1``
subqueries (the shape of model_bqml.sql's first-touch/last-touch
passes, ref: backend/controller/ml_model/templates/model_bqml.sql and
output.sql's gclid first-touch join). Spark has no ASOF JOIN operator,
so this module provides the scalable composition:

    union(build-rows, probe-rows)
      -> one hash shuffle on the key
      -> one per-key sort on the time axis
      -> last(non-null build payload) carried forward to each probe

That is ONE shuffle + ONE sort regardless of how many build rows
precede each probe — no per-probe subquery, no range explode, no
broadcast requirement on either side. At 100 TB both inputs partition
by key; skewed keys behave like any other windowed aggregation (AQE /
salting applies). Contrast with the naive join-then-rank plan (the
DuckDB oracle), which materializes every (probe, earlier build) pair
before discarding all but one per probe — quadratic per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load


def asof_join(
    probes: DataFrame,
    builds: DataFrame,
    key: str,
    time_col: str,
    payload_cols: list[str],
    inclusive: bool = True,
) -> DataFrame:
    """For each probe row, attach the payload of the latest build row of
    the same key with build.time <= probe.time (or < when
    ``inclusive=False``). Probe columns are preserved; payload columns
    arrive as ``asof_<name>`` (NULL when no build precedes the probe).

    Ties on the time axis are broken by build input order of
    ``payload_cols[0]`` (callers should pass a unique id first for
    determinism).
    """
    p_cols = probes.columns
    payload = F.struct(*[F.col(c) for c in payload_cols])
    b = builds.select(
        F.col(key).alias("__k"),
        F.col(time_col).alias("__t"),
        F.lit(0).alias("__probe"),
        payload.alias("__payload"),
        *[F.lit(None).alias(f"__p_{c}") for c in p_cols],
    )
    p = probes.select(
        F.col(key).alias("__k"),
        F.col(time_col).alias("__t"),
        F.lit(1).alias("__probe"),
        F.lit(None).cast(b.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c).alias(f"__p_{c}") for c in p_cols],
    )
    # builds sort before probes at an equal instant iff the bound is
    # inclusive; the payload's leading column breaks build-build ties
    order = [F.col("__t").asc()]
    order.append(F.col("__probe").asc() if inclusive else F.col("__probe").desc())
    order.append(F.col(f"__payload.{payload_cols[0]}").asc_nulls_first())
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = b.unionByName(p).withColumn(
        "__asof", F.last("__payload", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__probe") == 1).select(
        *[F.col(f"__p_{c}").alias(c) for c in p_cols],
        *[F.col(f"__asof.{c}").alias(f"asof_{c}") for c in payload_cols],
    )
    return out


def asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution as-of join: for every ``purchase`` event,
    the most recent click/view of the same user at or before the
    purchase instant. Inner semantics (unattributed purchases dropped)
    so the oracle's join-then-rank plan agrees."""
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    touches = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id", "ts", "event_id", "event_type"
    )
    joined = asof_join(
        purchases,
        touches,
        key="user_id",
        time_col="ts",
        payload_cols=["event_id", "event_type"],
    )
    return (
        joined.filter(F.col("asof_event_id").isNotNull())
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("asof_event_id").alias("touch_id"),
            F.col("asof_event_type").alias("touch_type"),
        )
    )


# The oracle states the SAME semantics the naive way: every
# (purchase, earlier touch) pair ranked per purchase. Ties on ts are
# broken by the larger touch event_id — matching asof_join's
# "last write wins" carry, where among equal (ts, probe-flag) rows the
# ascending event_id sort leaves the LARGEST id as the carried value.
ASOF_ATTRIBUTION_SQL = """
SELECT purchase_id, user_id, touch_id, touch_type FROM (
  SELECT p.event_id AS purchase_id, p.user_id, t.event_id AS touch_id,
         t.event_type AS touch_type,
         ROW_NUMBER() OVER (
           PARTITION BY p.event_id
           ORDER BY t.ts DESC, t.event_id DESC
         ) AS rn
  FROM events p
  JOIN events t
    ON t.user_id = p.user_id
   AND t.ts <= p.ts
   AND t.event_type IN ('click', 'view')
  WHERE p.event_type = 'purchase'
) WHERE rn = 1
"""

TEMPORAL_QUERIES: dict[str, tuple] = {
    "q38_asof_attribution": (asof_attribution, ASOF_ATTRIBUTION_SQL),
}
