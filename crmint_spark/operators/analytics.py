"""Marketing-analytics operators over the ``events`` table: cohort
retention, ordered funnel analysis, and calendar gap-fill with forward
fill.

These are the report shapes CRMint pipelines feed into BigQuery for
(ref: the GA4 event model consumed by
backend/controller/ml_model/templates/model_bqml.sql — user-level
event aggregation over timespan windows), expressed as first-class
distributed operators.

Scale design notes (100 TB):
- cohort:  two keyed shuffles (user -> first day, then (cohort, offset)
           counts); both carry scalars only, never event payloads.
- funnel:  one groupBy(user) computing all stage timestamps as
           conditional MINs in a single pass (no per-stage join chain);
           the stage-2/3 "after previous stage" conditions are resolved
           with a second tiny agg over per-user scalars.
- gapfill: days are generated per user with sequence() (k rows per
           user, bounded by the calendar span), left-joined to daily
           aggregates co-partitioned on (user, day), forward-filled
           with a per-user window — one shuffle + one sort, the same
           cost class as any per-key window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort-retention triangle: users grouped by first-activity
    day, counted at each day offset they return."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    first_day = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    active = ev.distinct()
    return (
        active.join(first_day, "user_id")
        .select(
            "cohort_day",
            F.datediff("day", "cohort_day").cast("bigint").alias("offset_days"),
            "user_id",
        )
        .groupBy("cohort_day", "offset_days")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


COHORT_SQL = """
WITH ev AS (
  SELECT user_id, CAST(ts AS DATE) AS day FROM events
), first_day AS (
  SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id
), active AS (
  SELECT DISTINCT user_id, day FROM ev
)
SELECT f.cohort_day,
       CAST(date_diff('day', f.cohort_day, a.day) AS BIGINT) AS offset_days,
       COUNT(DISTINCT a.user_id) AS n_users
FROM active a JOIN first_day f ON a.user_id = f.user_id
GROUP BY f.cohort_day, offset_days
"""

FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: per user, the earliest ``view``, the earliest
    ``click`` after that view, the earliest ``purchase`` after that
    click; reported as per-stage user counts.

    One groupBy(user) collects each stage's candidate timestamps as a
    sorted conditional MIN-array pass; the ordered-chain constraint is
    resolved per user with array higher-order functions — no per-stage
    self-join chain, so adding a funnel stage adds column work, not a
    shuffle."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    per_user = ev.groupBy("user_id").agg(
        *[
            F.sort_array(
                F.collect_list(F.when(F.col("event_type") == s, F.col("ts")))
            ).alias(f"ts_{s}")
            for s in FUNNEL_STEPS
        ]
    )
    # chain: t1 = min(view); t2 = min(click > t1); t3 = min(purchase > t2)
    # (F.get: NULL on empty arrays, no ANSI out-of-bounds error)
    t1 = F.get(F.col("ts_view"), 0)
    t2 = F.get(F.filter(F.col("ts_click"), lambda t: t > t1), 0)
    t3 = F.get(F.filter(F.col("ts_purchase"), lambda t: t > t2), 0)
    staged = per_user.select(
        "user_id", t1.alias("t1"), t2.alias("t2"), t3.alias("t3")
    )
    return staged.select(
        F.count_if(F.col("t1").isNotNull()).alias("n_view"),
        F.count_if(F.col("t2").isNotNull()).alias("n_view_click"),
        F.count_if(F.col("t3").isNotNull()).alias("n_view_click_purchase"),
    )


FUNNEL_SQL = """
WITH t1s AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), t2s AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN t1s ON e.user_id = t1s.user_id
  WHERE e.event_type = 'click' AND e.ts > t1s.t1
  GROUP BY e.user_id
), t3s AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN t2s ON e.user_id = t2s.user_id
  WHERE e.event_type = 'purchase' AND e.ts > t2s.t2
  GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM t1s) AS n_view,
       (SELECT COUNT(*) FROM t2s) AS n_view_click,
       (SELECT COUNT(*) FROM t3s) AS n_view_click_purchase
"""


def gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill + forward fill: one row per (user, day) over
    each user's observed activity span; days without events carry the
    last observed daily event count forward and are flagged.

    The generated day spine is sequence()/explode per user (rows bounded
    by the calendar span, generated distributively), the spine->actuals
    join is a co-partitioned equi-join on (user, day), and the fill is
    one per-user window — no driver-side calendar, no cross join against
    a global date dimension."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    daily = ev.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = span.select(
        "user_id",
        F.explode(F.sequence("d0", "d1")).alias("day"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.col("n_events").isNull().alias("gap_filled"),
            F.last("n_events", ignorenulls=True).over(w).alias("n_events_ff"),
        )
    )


GAPFILL_SQL = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n_events
  FROM events GROUP BY user_id, CAST(ts AS DATE)
), span AS (
  SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY user_id
), spine AS (
  SELECT user_id, CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM span
)
SELECT s.user_id, s.day,
       d.n_events IS NULL AS gap_filled,
       LAST_VALUE(d.n_events IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS n_events_ff
FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
"""

ANALYTICS_QUERIES: dict[str, tuple] = {
    "q39_cohort_retention": (cohort_retention, COHORT_SQL),
    "q40_funnel": (funnel_analysis, FUNNEL_SQL),
    "q41_gapfill_ffill": (gapfill_daily, GAPFILL_SQL),
}


def rolling_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE framed rolling aggregate — BigQuery's
    ``RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW`` shape:
    per order-priority class, daily totals with a trailing-7-day rolling
    order count and revenue.

    The RANGE frame runs on an integer day number (unix_date), which is
    how an interval frame over dates compiles portably; the window is
    one shuffle on the partition key + one sort, and the frame is
    evaluated streamingly per partition (no per-row re-scan of the
    trailing week).
    """
    orders = load(spark, sf_dir, "orders")
    daily = (
        orders.select(
            "o_orderpriority",
            F.to_date("o_orderdate").alias("day"),
            "o_totalprice",
        )
        .groupBy("o_orderpriority", "day")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("revenue"),
        )
        .withColumn("day_num", F.unix_date("day").cast("long"))
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("day_num")
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "o_orderpriority",
        "day",
        "n_orders",
        F.sum("n_orders").over(w).alias("n_orders_7d"),
        F.round(F.sum("revenue").over(w), 2).alias("revenue_7d"),
    )


ROLLING_RANGE_SQL = """
WITH daily AS (
  SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day,
         COUNT(*) AS n_orders, SUM(o_totalprice) AS revenue,
         CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day_num
  FROM orders GROUP BY 1, 2
)
SELECT o_orderpriority, day, n_orders,
       CAST(SUM(n_orders) OVER w AS BIGINT) AS n_orders_7d,
       ROUND(SUM(revenue) OVER w, 2) AS revenue_7d
FROM daily
WINDOW w AS (
  PARTITION BY o_orderpriority ORDER BY day_num
  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
)
"""

# Transitive closure via WITH RECURSIVE — Spark 4 executes recursive
# CTEs natively, so the IDENTICAL statement runs on both engines (the
# closure is also the SQL-surface twin of dedup.connected_components'
# iterative min-label propagation). Spark restricts the recursive
# branch to UNION ALL (no step dedup yet), so the walk is oriented
# strictly descending (src > dst) — acyclic by construction, therefore
# terminating, and seeded with zero-length paths so isolated chain
# heads still label themselves. Edges: deterministic doc chains
# (doc_id+1 -> doc_id for doc_id % 100 < 3) => unique descending paths
# of length <= 3 (no path-multiplicity blowup under UNION ALL).
RECURSIVE_CLOSURE_SQL = """
WITH RECURSIVE edges AS (
  SELECT doc_id + 1 AS src, doc_id AS dst
  FROM documents WHERE doc_id % 100 < 3
), nodes AS (
  SELECT DISTINCT x AS n FROM (
    SELECT src AS x FROM edges UNION ALL SELECT dst AS x FROM edges
  )
), reach (a, b) AS (
  SELECT n AS a, n AS b FROM nodes
  UNION ALL
  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
)
SELECT a AS doc_id, MIN(b) AS cluster_id
FROM reach GROUP BY a
"""


def recursive_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the recursive-CTE closure verbatim through Spark SQL —
    recursion executes as iterative union steps inside the engine; at
    scale each step is a keyed equi-join, the same plan class as one
    round of connected_components."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(RECURSIVE_CLOSURE_SQL)


ANALYTICS_QUERIES["q42_rolling_range"] = (rolling_range_window, ROLLING_RANGE_SQL)
ANALYTICS_QUERIES["q43_recursive_closure"] = (recursive_closure, RECURSIVE_CLOSURE_SQL)


RFM_SEGMENTS = 5
RFM_ASOF = "2024-02-01"  # fixed snapshot date (events span 2024-01)

# Above this input-table row count the exact global-NTILE / global-cumsum
# forms (single-partition sort) switch to the sketch-based scale paths.
# The signal is the parquet footer row count — zero Spark jobs; when the
# footer is unreadable (non-local storage) the scale path is assumed.
SCALE_ROW_THRESHOLD = 5_000_000


def _footer_rows(sf_dir: str, table: str) -> int | None:
    import os

    try:
        import pyarrow.parquet as pq

        path = os.path.join(sf_dir, f"{table}.parquet")
        return pq.ParquetFile(path).metadata.num_rows
    except Exception:
        return None


def _use_scale_path(sf_dir: str, table: str, scale_path: bool | None) -> bool:
    if scale_path is not None:
        return scale_path
    n = _footer_rows(sf_dir, table)
    return n is None or n > SCALE_ROW_THRESHOLD


def _rfm_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.datediff(
            F.lit(RFM_ASOF).cast("date"), F.max(F.to_date("ts"))
        ).cast("bigint").alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                    0.0
                )
            ),
            2,
        ).alias("monetary"),
    )


def _rfm_code(scored: DataFrame) -> DataFrame:
    return scored.withColumn(
        "rfm_code",
        F.concat(
            F.col("r_seg").cast("string"),
            F.col("f_seg").cast("string"),
            F.col("m_seg").cast("string"),
        ),
    )


def _rfm_scale(per_user: DataFrame) -> DataFrame:
    """100 TB RFM path: Greenwald-Khanna sketch boundaries per metric +
    map-side segment assignment. No global sort anywhere — the only
    shuffle is the per-user rollup the caller already did; boundary
    collection is quantile metadata (RFM_SEGMENTS - 1 scalars/metric),
    the same driver-side class as approxQuantile itself. Segment
    populations are approximate within the sketch error (exact-NTILE
    tie-break semantics are a global-sort property and are intentionally
    relaxed here); the exact form below the threshold is the oracle."""
    per_user = per_user.persist()

    def seg(colname: str, descending: bool):
        bounds = per_user.approxQuantile(
            colname,
            [i / RFM_SEGMENTS for i in range(1, RFM_SEGMENTS)],
            1e-4,
        )
        e = F.lit(1)
        for b in bounds:
            e = e + F.when(F.col(colname) > F.lit(float(b)), 1).otherwise(0)
        if descending:
            e = F.lit(RFM_SEGMENTS + 1) - e
        return e.cast("bigint")

    scored = per_user.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        seg("recency_days", descending=False).alias("r_seg"),
        seg("frequency", descending=True).alias("f_seg"),
        seg("monetary", descending=True).alias("m_seg"),
    )
    out = _rfm_code(scored)
    # boundaries are already extracted (driver scalars); release the
    # rollup cache — the final consumer pass recomputes it once
    per_user.unpersist()
    return out


def rfm_segmentation(
    spark: SparkSession, sf_dir: str, scale_path: bool | None = None
) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation — the
    canonical CRM scoring table: days since last activity, event count,
    total purchase value, each NTILE'd into quintiles with deterministic
    tiebreaks, plus the combined segment code.

    Below SCALE_ROW_THRESHOLD input rows this is the exact NTILE form
    (one unpartitioned window per metric — correct at report scale, and
    the DuckDB-oracle path). Above it — or when `scale_path=True` — it
    routes through `_rfm_scale`: sketch quantile boundaries + map-side
    bucketing, no single-partition Exchange in the plan
    (test_rfm_scale_path_plan)."""
    per_user = _rfm_per_user(spark, sf_dir)
    if _use_scale_path(sf_dir, "events", scale_path):
        return _rfm_scale(per_user)
    # low recency = good -> rank ascending gives 1 = most recent quintile
    r = F.ntile(RFM_SEGMENTS).over(
        Window.orderBy(F.asc("recency_days"), F.asc("user_id"))
    )
    f = F.ntile(RFM_SEGMENTS).over(
        Window.orderBy(F.desc("frequency"), F.asc("user_id"))
    )
    m = F.ntile(RFM_SEGMENTS).over(
        Window.orderBy(F.desc("monetary"), F.asc("user_id"))
    )
    scored = per_user.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        r.cast("bigint").alias("r_seg"),
        f.cast("bigint").alias("f_seg"),
        m.cast("bigint").alias("m_seg"),
    )
    return _rfm_code(scored)


RFM_SQL = f"""
WITH per_user AS (
  SELECT user_id,
         CAST(date_diff('day', MAX(CAST(ts AS DATE)), DATE '{RFM_ASOF}') AS BIGINT)
           AS recency_days,
         COUNT(*) AS frequency,
         ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 2)
           AS monetary
  FROM events GROUP BY user_id
)
SELECT user_id, recency_days, frequency, monetary,
       CAST(NTILE({RFM_SEGMENTS}) OVER (ORDER BY recency_days ASC, user_id ASC) AS BIGINT) AS r_seg,
       CAST(NTILE({RFM_SEGMENTS}) OVER (ORDER BY frequency DESC, user_id ASC) AS BIGINT) AS f_seg,
       CAST(NTILE({RFM_SEGMENTS}) OVER (ORDER BY monetary DESC, user_id ASC) AS BIGINT) AS m_seg,
       CAST(NTILE({RFM_SEGMENTS}) OVER (ORDER BY recency_days ASC, user_id ASC) AS VARCHAR)
         || CAST(NTILE({RFM_SEGMENTS}) OVER (ORDER BY frequency DESC, user_id ASC) AS VARCHAR)
         || CAST(NTILE({RFM_SEGMENTS}) OVER (ORDER BY monetary DESC, user_id ASC) AS VARCHAR)
         AS rfm_code
FROM per_user
"""

ANALYTICS_QUERIES["q45_rfm_segmentation"] = (rfm_segmentation, RFM_SQL)


def cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type co-occurrence with lift — the market-basket association
    shape over user behavior: for each unordered event-type pair, how
    many users did both, and how much more often than independence
    predicts (lift = P(a,b) / (P(a) P(b))).

    Scale: the per-user type set is bounded by the type vocabulary, so
    the pair explosion is at most |types|^2/2 rows per user — the
    self-join on user_id has map-side-combinable counts on both sides
    and never touches raw events after the first distinct."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_type")
    baskets = ev.distinct()
    n_users = baskets.select("user_id").distinct().count()
    marg = baskets.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    a, b = baskets.alias("a"), baskets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    ma, mb = marg.alias("ma"), marg.alias("mb")
    return (
        pairs.join(ma, F.col("type_a") == F.col("ma.event_type"))
        .join(mb, F.col("type_b") == F.col("mb.event_type"))
        .select(
            "type_a",
            "type_b",
            "n_both",
            F.round(F.col("n_both") / F.lit(float(n_users)), 4).alias("support"),
            F.round(
                (F.col("n_both") * F.lit(float(n_users)))
                / (F.col("ma.cnt") * F.col("mb.cnt")),
                4,
            ).alias("lift"),
        )
    )


COOCCURRENCE_SQL = """
WITH baskets AS (
  SELECT DISTINCT user_id, event_type FROM events
), n AS (
  SELECT COUNT(DISTINCT user_id) AS n_users FROM baskets
), marg AS (
  SELECT event_type, COUNT(*) AS cnt FROM baskets GROUP BY event_type
), pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_both
  FROM baskets a JOIN baskets b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, n_both,
       ROUND(n_both / CAST(n.n_users AS DOUBLE), 4) AS support,
       ROUND((n_both * CAST(n.n_users AS DOUBLE)) / (ma.cnt * mb.cnt), 4) AS lift
FROM pairs
JOIN marg ma ON pairs.type_a = ma.event_type
JOIN marg mb ON pairs.type_b = mb.event_type
CROSS JOIN n
"""

ANALYTICS_QUERIES["q46_cooccurrence_lift"] = (cooccurrence_lift, COOCCURRENCE_SQL)


ANOMALY_Z = 2.0
ANOMALY_WINDOW = 7  # trailing days (exclusive of the current day)


def daily_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series anomaly flags: a day's event count is anomalous when
    it deviates more than ANOMALY_Z sample standard deviations from the
    trailing ANOMALY_WINDOW-day mean (current day excluded, so the
    anomaly can't suppress its own baseline).

    One daily pre-aggregation (map-side combined) then one ordered
    window per event type — the rolling mean/std are streaming frame
    aggregates, no per-day rescan."""
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("day_num", F.unix_date("day").cast("long"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_num")
        .rangeBetween(-ANOMALY_WINDOW, -1)
    )
    mean = F.avg("n").over(w)
    # constant trailing windows have sd = 0: NULL out (not anomalous by
    # this test) instead of dividing by zero under ANSI mode
    sd = F.nullif(F.stddev_samp("n").over(w), F.lit(0.0))
    z = (F.col("n") - mean) / sd
    return (
        daily.select(
            "event_type",
            "day",
            "n",
            F.round(mean, 4).alias("base_mean"),
            F.round(z, 4).alias("zscore"),
        )
        .filter(F.col("zscore").isNotNull() & (F.abs("zscore") > ANOMALY_Z))
    )


ANOMALY_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
           AS day_num
  FROM events GROUP BY 1, 2
), scored AS (
  SELECT event_type, day, n,
         ROUND(AVG(n) OVER w, 4) AS base_mean,
         ROUND((n - AVG(n) OVER w) / NULLIF(STDDEV_SAMP(n) OVER w, 0), 4) AS zscore
  FROM daily
  WINDOW w AS (
    PARTITION BY event_type ORDER BY day_num
    RANGE BETWEEN {ANOMALY_WINDOW} PRECEDING AND 1 PRECEDING
  )
)
SELECT event_type, day, n, base_mean, zscore
FROM scored WHERE zscore IS NOT NULL AND ABS(zscore) > {ANOMALY_Z}
"""

ABC_THRESH_A = 0.5
ABC_THRESH_B = 0.8


# Quantile-bucket count for the scale path's revenue CDF. Class-boundary
# resolution is ~1/PARETO_BUCKETS of the customer population regardless
# of corpus size.
PARETO_BUCKETS = 128


def _pareto_scale(per_cust: DataFrame) -> DataFrame:
    """100 TB Pareto path: replace the global cumulative-sum window with
    a quantile-bucketed revenue CDF. One sketch pass gives bucket
    boundaries; one grouped aggregation gives (bucket, sum, count); the
    cumulative walk happens over the PARETO_BUCKETS-row bucket table
    driver-side (bounded metadata, same class as approxQuantile's own
    collect), yielding two literal revenue thresholds; class assignment
    is then map-side. No global sort, no single-partition Exchange
    (test_pareto_scale_path_plan). Customers inside a boundary bucket
    inherit the bucket's class — precision is 1/PARETO_BUCKETS of the
    population, the documented trade for losing the global sort."""
    per_cust = per_cust.persist()
    probs = [i / PARETO_BUCKETS for i in range(1, PARETO_BUCKETS)]
    raw = per_cust.approxQuantile("revenue", probs, 1e-4)
    bounds = sorted(set(float(b) for b in raw))
    # bucket 0 = lowest revenue; when-chain over deduped boundaries
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(F.col("revenue") > F.lit(b), 1).otherwise(0)
    stats = (
        per_cust.select(bucket.alias("bucket"), "revenue")
        .groupBy("bucket")
        .agg(F.sum("revenue").alias("rev"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    per_cust.unpersist()
    total = sum(r["rev"] for r in stats)
    if total == 0:
        # empty input (or all-zero revenue): match the exact path's
        # empty result instead of dividing by zero below
        return per_cust.select(
            "o_custkey", "revenue", F.lit("C").alias("abc_class")
        ).limit(0)
    # walk buckets from highest revenue down; a bucket's class is the
    # class of its *last* (cumulative-share) customer, mirroring the
    # exact form's `cum_share <= threshold` predicate
    cum = 0.0
    a_cut = b_cut = None  # lowest bucket id still in class A / B
    for r in sorted(stats, key=lambda r: -r["bucket"]):
        cum += r["rev"]
        share = cum / total
        if share <= ABC_THRESH_A:
            a_cut = r["bucket"]
        if share <= ABC_THRESH_B:
            b_cut = r["bucket"]
    cls = F.lit("C")
    if b_cut is not None:
        cls = F.when(bucket >= b_cut, "B").otherwise("C")
    if a_cut is not None:
        cls = F.when(bucket >= a_cut, "A").otherwise(cls)
    return (
        per_cust.select(cls.alias("abc"))
        .groupBy("abc")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


def pareto_abc(
    spark: SparkSession, sf_dir: str, scale_path: bool | None = None
) -> DataFrame:
    """Pareto / ABC revenue classification: customers ranked by order
    revenue; class A = the head covering the first 50% of cumulative
    revenue, B = to 80%, C = the tail. The classic 80/20 inventory/CRM
    segmentation.

    Below SCALE_ROW_THRESHOLD input rows: one groupBy(customer) then one
    global ordered window for the exact cumulative share (the
    DuckDB-oracle path). Above it — or with `scale_path=True` — the
    global sort is replaced by `_pareto_scale`'s bucketed CDF."""
    orders = load(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue")
    )
    if _use_scale_path(sf_dir, "orders", scale_path):
        return _pareto_scale(per_cust)
    total = per_cust.select(F.sum("revenue").alias("t"))
    w = Window.orderBy(F.desc("revenue"), F.asc("o_custkey"))
    ranked = per_cust.crossJoin(F.broadcast(total)).select(
        "o_custkey",
        "revenue",
        (F.sum("revenue").over(w) / F.col("t")).alias("cum_share"),
    )
    cls = (
        F.when(F.col("cum_share") <= ABC_THRESH_A, "A")
        .when(F.col("cum_share") <= ABC_THRESH_B, "B")
        .otherwise("C")
    )
    return (
        ranked.select("o_custkey", cls.alias("abc"))
        .groupBy("abc")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


PARETO_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS revenue
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT o_custkey,
         SUM(revenue) OVER (ORDER BY revenue DESC, o_custkey ASC)
           / (SELECT SUM(revenue) FROM per_cust) AS cum_share
  FROM per_cust
)
SELECT CASE WHEN cum_share <= {ABC_THRESH_A} THEN 'A'
            WHEN cum_share <= {ABC_THRESH_B} THEN 'B'
            ELSE 'C' END AS abc,
       COUNT(*) AS n_customers
FROM ranked GROUP BY 1
"""

ANALYTICS_QUERIES["q47_daily_anomalies"] = (daily_anomalies, ANOMALY_SQL)
ANALYTICS_QUERIES["q48_pareto_abc"] = (pareto_abc, PARETO_SQL)


HIST_BINS = 20


def revenue_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order values: the profiling primitive
    behind data-quality dashboards and feature binning. Bin edges come
    from one broadcast (min, max) aggregate; the binning itself is
    per-row arithmetic folded into the scan projection, and the final
    count is one tiny groupBy(bin). IEEE double arithmetic on identical
    inputs makes the floor() bin assignment engine-portable."""
    orders = load(spark, sf_dir, "orders")
    ext = orders.select(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    width = (F.col("hi") - F.col("lo")) / HIST_BINS
    binned = orders.crossJoin(F.broadcast(ext)).select(
        F.least(
            F.floor((F.col("o_totalprice") - F.col("lo")) / width).cast("bigint"),
            F.lit(HIST_BINS - 1).cast("bigint"),  # max lands in the last bin
        ).alias("bin"),
        "lo",
        (width).alias("w"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.round(F.first("lo") + F.first("w") * F.col("bin"), 2).alias("bin_lo"),
            F.round(F.first("lo") + F.first("w") * (F.col("bin") + 1), 2).alias("bin_hi"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select("bin", "bin_lo", "bin_hi", "n_orders")
    )


HISTOGRAM_SQL = f"""
WITH ext AS (
  SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders
), binned AS (
  SELECT LEAST(
           CAST(FLOOR((o_totalprice - ext.lo) / ((ext.hi - ext.lo) / {HIST_BINS})) AS BIGINT),
           {HIST_BINS - 1}
         ) AS bin,
         ext.lo AS lo, (ext.hi - ext.lo) / {HIST_BINS} AS w
  FROM orders CROSS JOIN ext
)
SELECT bin,
       ROUND(MIN(lo) + MIN(w) * bin, 2) AS bin_lo,
       ROUND(MIN(lo) + MIN(w) * (bin + 1), 2) AS bin_hi,
       COUNT(*) AS n_orders
FROM binned GROUP BY bin
"""

ANALYTICS_QUERIES["q49_revenue_histogram"] = (revenue_histogram, HISTOGRAM_SQL)


# ---------------------------------------------------------------------------
# Population-stability-index drift detection

PSI_BINS = 10
PSI_SMOOTH = 0.5
PSI_SPLIT_DAY = 15


def psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitoring via the Population Stability Index —
    the standard "did my scoring feature shift" check run between a
    baseline window and the current window of an event stream. Bins are
    equi-width over the BASELINE extent (fixed at comparison time, like
    a deployed monitoring config), counts are Laplace-smoothed so empty
    bins stay defined, PSI = SUM((p-q)*ln(p/q)); > 0.2 is the
    conventional "significant shift" flag.

    Plan shape: one pass computes per-type baseline extents (broadcast
    back), one pass bins + counts (partial agg on (type, period, bin)),
    a k-row reduce computes the index — no shuffle carries raw events
    twice."""
    ev = load(spark, sf_dir, "events").withColumn(
        "period",
        F.when(F.dayofmonth("ts") <= PSI_SPLIT_DAY, "base").otherwise("curr"),
    )
    ext = (
        ev.filter(F.col("period") == "base")
        .groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .withColumn(
            "w",
            F.when(
                F.col("hi") > F.col("lo"),
                (F.col("hi") - F.col("lo")) / PSI_BINS,
            ).otherwise(F.lit(1.0)),
        )
    )
    binned = ev.join(F.broadcast(ext), "event_type").withColumn(
        "bin",
        F.least(
            F.greatest(
                F.floor((F.col("value") - F.col("lo")) / F.col("w")),
                F.lit(0),
            ),
            F.lit(PSI_BINS - 1),
        ).cast("int"),
    )
    counts = binned.groupBy("event_type", "bin").agg(
        F.count_if(F.col("period") == "base").alias("nb"),
        F.count_if(F.col("period") == "curr").alias("nc"),
    )
    tot = counts.groupBy("event_type").agg(
        F.sum("nb").alias("tb"), F.sum("nc").alias("tc")
    )
    k = float(PSI_BINS)
    s = float(PSI_SMOOTH)
    j = counts.join(F.broadcast(tot), "event_type")
    p = (F.col("nb") + s) / (F.col("tb") + s * k)
    q = (F.col("nc") + s) / (F.col("tc") + s * k)
    term = (p - q) * F.log(p / q)
    return (
        j.withColumn("term", term)
        .groupBy("event_type")
        .agg(
            F.max("tb").cast("bigint").alias("n_base"),
            F.max("tc").cast("bigint").alias("n_curr"),
            F.round(F.sum("term"), 6).alias("psi"),
        )
        .withColumn("drifted", F.col("psi") > 0.2)
    )


PSI_SQL = f"""
WITH ev AS (
  SELECT event_type, value,
         CASE WHEN EXTRACT(DAY FROM ts) <= {PSI_SPLIT_DAY}
              THEN 'base' ELSE 'curr' END AS period
  FROM events
), ext AS (
  SELECT event_type, MIN(value) AS lo, MAX(value) AS hi,
         CASE WHEN MAX(value) > MIN(value)
              THEN (MAX(value) - MIN(value)) / {PSI_BINS}
              ELSE 1.0 END AS w
  FROM ev WHERE period = 'base' GROUP BY event_type
), binned AS (
  SELECT ev.event_type, ev.period,
         CAST(LEAST(GREATEST(FLOOR((ev.value - ext.lo) / ext.w), 0),
                    {PSI_BINS - 1}) AS INT) AS bin
  FROM ev JOIN ext ON ev.event_type = ext.event_type
), counts AS (
  SELECT event_type, bin,
         COUNT(*) FILTER (WHERE period = 'base') AS nb,
         COUNT(*) FILTER (WHERE period = 'curr') AS nc
  FROM binned GROUP BY event_type, bin
), tot AS (
  SELECT event_type, SUM(nb) AS tb, SUM(nc) AS tc
  FROM counts GROUP BY event_type
)
SELECT c.event_type,
       CAST(MAX(t.tb) AS BIGINT) AS n_base,
       CAST(MAX(t.tc) AS BIGINT) AS n_curr,
       ROUND(SUM(((c.nb + {PSI_SMOOTH}) / (t.tb + {PSI_SMOOTH} * {PSI_BINS}.0)
                  - (c.nc + {PSI_SMOOTH}) / (t.tc + {PSI_SMOOTH} * {PSI_BINS}.0))
                 * ln(((c.nb + {PSI_SMOOTH}) / (t.tb + {PSI_SMOOTH} * {PSI_BINS}.0))
                      / ((c.nc + {PSI_SMOOTH}) / (t.tc + {PSI_SMOOTH} * {PSI_BINS}.0)))),
             6) AS psi,
       ROUND(SUM(((c.nb + {PSI_SMOOTH}) / (t.tb + {PSI_SMOOTH} * {PSI_BINS}.0)
                  - (c.nc + {PSI_SMOOTH}) / (t.tc + {PSI_SMOOTH} * {PSI_BINS}.0))
                 * ln(((c.nb + {PSI_SMOOTH}) / (t.tb + {PSI_SMOOTH} * {PSI_BINS}.0))
                      / ((c.nc + {PSI_SMOOTH}) / (t.tc + {PSI_SMOOTH} * {PSI_BINS}.0)))),
             6) > 0.2 AS drifted
FROM counts c JOIN tot t ON c.event_type = t.event_type
GROUP BY c.event_type
"""

ANALYTICS_QUERIES["q51_psi_drift"] = (psi_drift, PSI_SQL)


# ---------------------------------------------------------------------------
# Column-stats profiler (data-quality summary)

PROFILE_COLS = ("l_quantity", "l_discount", "l_tax", "l_returnflag")


def profile_columns(
    spark: SparkSession, sf_dir: str, scale_path: bool | None = None
) -> DataFrame:
    """Per-column data-quality profile of a fact table (the summary a
    pipeline health check materializes after each load): null count,
    distinct count, min/max as strings. One aggregate pass computes all
    columns' stats together (no per-column scans); the stats unpivot to
    one row per column on the k-row result.

    Scale path: k exact COUNT(DISTINCT) in one aggregate makes Catalyst
    Expand-multiply the input k-fold (every row re-emitted once per
    distinct aggregate) — a k*N shuffle at 100 TB. Above
    SCALE_ROW_THRESHOLD footer rows the profiler swaps to
    approx_count_distinct (HLL++, one pass, no Expand, ~2% error — the
    usual contract for a profile readout); the exact form stays the
    sub-threshold oracle path (test_scale_bounds asserts the no-Expand
    plan)."""
    li = load(spark, sf_dir, "lineitem")
    approx = _use_scale_path(sf_dir, "lineitem", scale_path)
    if not approx:
        # exact path (r11, guide §2.3): k exact COUNT(DISTINCT) in ONE
        # aggregate makes Catalyst Expand-multiply the input k-fold; a
        # union of per-column aggregates instead plans k column-pruned
        # scans, each a plain two-phase single-distinct aggregate with
        # map-side combine — same total input bytes off columnar
        # storage, no Expand, and far smaller codegen units. (The
        # approx path below keeps the single fused scan: with
        # approx_count_distinct there is no Expand to avoid, and one
        # pass beats k there.)
        from functools import reduce

        parts = [
            li.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.count_if(F.col(c).isNull()).alias("n_nulls"),
                F.countDistinct(c).alias("n_distinct"),
                F.min(F.col(c).cast("string")).alias("min_value"),
                F.max(F.col(c).cast("string")).alias("max_value"),
            ).select(
                F.lit(c).alias("column"),
                "n_rows",
                "n_nulls",
                "n_distinct",
                "min_value",
                "max_value",
            )
            for c in PROFILE_COLS
        ]
        return reduce(lambda x, y: x.unionByName(y), parts)
    aggs = []
    for c in PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.count_if(F.col(c).isNull()).alias(f"{c}__nulls"),
            F.approx_count_distinct(c).alias(f"{c}__distinct"),
            F.min(F.col(c).cast("string")).alias(f"{c}__min"),
            F.max(F.col(c).cast("string")).alias(f"{c}__max"),
        ]
    one = li.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__n, {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in PROFILE_COLS
    )
    return one.selectExpr(
        f"stack({len(PROFILE_COLS)}, {stack}) AS "
        "(column, n_rows, n_nulls, n_distinct, min_value, max_value)"
    )


def _profile_sql() -> str:
    parts = []
    for c in PROFILE_COLS:
        parts.append(
            f"SELECT '{c}' AS column, COUNT(*) AS n_rows, "
            f"COUNT(*) FILTER (WHERE {c} IS NULL) AS n_nulls, "
            f"COUNT(DISTINCT {c}) AS n_distinct, "
            f"MIN(CAST({c} AS VARCHAR)) AS min_value, "
            f"MAX(CAST({c} AS VARCHAR)) AS max_value FROM lineitem"
        )
    return " UNION ALL ".join(parts)


PROFILE_SQL = _profile_sql()

ANALYTICS_QUERIES["q52_profile_columns"] = (profile_columns, PROFILE_SQL)


# ---------------------------------------------------------------------------
# Multi-touch attribution

ATTR_LOOKBACK_DAYS = 7
ATTR_HALFLIFE_DAYS = 2.0


def attribution_models(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution: distribute each purchase's value across
    the user's preceding view/click/signup touches inside a 7-day
    lookback, under the three standard models marketing teams compare —
    linear (equal split), time-decay (2-day half-life, normalized per
    conversion), and U-shaped/position (40% first, 40% last, 20% spread
    over the middle). The per-channel totals are the channel-ROI input
    the reference's audience pipelines feed back into Ads/GA4.

    Plan shape: one user-equi join with a time-range predicate (shuffle
    on user_id, never a cross join), then per-conversion window ranks
    and ONE channel rollup."""
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("event_id").alias("conv_id"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("conv_value"),
    )
    t = ev.filter(
        F.col("event_type").isin("view", "click", "signup")
    ).select(
        F.col("user_id"),
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("channel"),
        F.col("ts").alias("t_ts"),
    )
    joined = p.join(t, "user_id").where(
        (F.col("t_ts") <= F.col("p_ts"))
        & (
            F.col("t_ts")
            >= F.col("p_ts") - F.expr(f"INTERVAL {ATTR_LOOKBACK_DAYS} DAYS")
        )
    )
    w = Window.partitionBy("conv_id")
    asc = Window.partitionBy("conv_id").orderBy("t_ts", "touch_id")
    desc = Window.partitionBy("conv_id").orderBy(
        F.desc("t_ts"), F.desc("touch_id")
    )
    # events load as TIMESTAMP_NTZ; session tz is UTC so the cast to
    # (ltz) TIMESTAMP is instant-preserving and unix_micros resolves
    age_days = (
        F.unix_micros(F.col("p_ts").cast("timestamp"))
        - F.unix_micros(F.col("t_ts").cast("timestamp"))
    ) / F.lit(86400.0 * 1e6)
    decay_w = F.pow(F.lit(0.5), age_days / F.lit(ATTR_HALFLIFE_DAYS))
    scored = (
        joined.withColumn("n", F.count(F.lit(1)).over(w))
        .withColumn("rn_first", F.row_number().over(asc))
        .withColumn("rn_last", F.row_number().over(desc))
        .withColumn("dw", decay_w)
        .withColumn("dw_sum", F.sum(decay_w).over(w))
    )
    v = F.col("conv_value")
    linear = v / F.col("n")
    decay = v * F.col("dw") / F.col("dw_sum")
    position = (
        F.when(F.col("n") == 1, v)
        .when(F.col("n") == 2, v * 0.5)
        .when(F.col("rn_first") == 1, v * 0.4)
        .when(F.col("rn_last") == 1, v * 0.4)
        .otherwise(v * 0.2 / (F.col("n") - 2))
    )
    return (
        scored.withColumn("linear", linear)
        .withColumn("decay", decay)
        .withColumn("position", position)
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.round(F.sum("linear"), 4).alias("credit_linear"),
            F.round(F.sum("decay"), 4).alias("credit_time_decay"),
            F.round(F.sum("position"), 4).alias("credit_position"),
        )
    )


ATTRIBUTION_SQL = f"""
WITH p AS (
  SELECT user_id, event_id AS conv_id, ts AS p_ts, value AS conv_value
  FROM events WHERE event_type = 'purchase'
), t AS (
  SELECT user_id, event_id AS touch_id, event_type AS channel, ts AS t_ts
  FROM events WHERE event_type IN ('view', 'click', 'signup')
), joined AS (
  SELECT p.conv_id, p.p_ts, p.conv_value, t.touch_id, t.channel, t.t_ts
  FROM p JOIN t ON p.user_id = t.user_id
  WHERE t.t_ts <= p.p_ts
    AND t.t_ts >= p.p_ts - INTERVAL {ATTR_LOOKBACK_DAYS} DAY
), scored AS (
  SELECT conv_id, conv_value, channel,
         COUNT(*) OVER (PARTITION BY conv_id) AS n,
         ROW_NUMBER() OVER (PARTITION BY conv_id
                            ORDER BY t_ts, touch_id) AS rn_first,
         ROW_NUMBER() OVER (PARTITION BY conv_id
                            ORDER BY t_ts DESC, touch_id DESC) AS rn_last,
         POW(0.5, (epoch_us(p_ts) - epoch_us(t_ts))
                  / (86400.0 * 1e6) / {ATTR_HALFLIFE_DAYS}) AS dw,
         SUM(POW(0.5, (epoch_us(p_ts) - epoch_us(t_ts))
                      / (86400.0 * 1e6) / {ATTR_HALFLIFE_DAYS}))
           OVER (PARTITION BY conv_id) AS dw_sum
  FROM joined
)
SELECT channel, COUNT(*) AS n_touches,
       ROUND(SUM(conv_value / n), 4) AS credit_linear,
       ROUND(SUM(conv_value * dw / dw_sum), 4) AS credit_time_decay,
       ROUND(SUM(CASE WHEN n = 1 THEN conv_value
                      WHEN n = 2 THEN conv_value * 0.5
                      WHEN rn_first = 1 THEN conv_value * 0.4
                      WHEN rn_last = 1 THEN conv_value * 0.4
                      ELSE conv_value * 0.2 / (n - 2) END), 4)
         AS credit_position
FROM scored GROUP BY channel
"""

ANALYTICS_QUERIES["q53_attribution_models"] = (
    attribution_models,
    ATTRIBUTION_SQL,
)


# ---------------------------------------------------------------------------
# Holdout incrementality (uplift measurement)


def holdout_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementality readout for an activated audience: users are
    deterministically hash-split 90/10 into treatment/holdout (the same
    affine-mod split the reference uses for its 90/10 model split, ref
    model_bqml.sql:95-101 — the holdout never gets uploaded to the ad
    platform), then conversion rates are compared with the two-proportion
    z statistic. THE measurement loop behind every CRMint audience push:
    did activating the audience cause conversions.

    One groupBy(user) rollup then a single-row conditional aggregate —
    two shuffles total, both on user_id-sized keys."""
    from ..functions import hash_split_int

    ev = load(spark, sf_dir, "events")
    # conversion = a high-value purchase (> 200): on this fixture every
    # user purchases at least once, so the raw flag would be degenerate
    users = ev.groupBy("user_id").agg(
        F.max(
            (
                (F.col("event_type") == "purchase")
                & (F.col("value") > 200)
            ).cast("int")
        ).alias("converted")
    )
    grouped = users.withColumn(
        "treated", hash_split_int("user_id") < 90
    )
    row = grouped.agg(
        F.count_if(F.col("treated")).alias("n_t"),
        F.count_if(~F.col("treated")).alias("n_c"),
        F.sum(F.when(F.col("treated"), F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("conv_t"),
        F.sum(F.when(~F.col("treated"), F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("conv_c"),
    )
    # double casts: ANSI-mode integer division truncates
    n_t = F.col("n_t").cast("double")
    n_c = F.col("n_c").cast("double")
    p_t = F.col("conv_t").cast("double") / n_t
    p_c = F.col("conv_c").cast("double") / n_c
    pooled = (F.col("conv_t") + F.col("conv_c")).cast("double") / (
        F.col("n_t") + F.col("n_c")
    ).cast("double")
    se = F.sqrt(
        pooled * (1 - pooled) * (F.lit(1.0) / n_t + F.lit(1.0) / n_c)
    )
    return row.select(
        "n_t",
        "n_c",
        "conv_t",
        "conv_c",
        F.round(p_t, 6).alias("rate_treatment"),
        F.round(p_c, 6).alias("rate_holdout"),
        F.round(p_t - p_c, 6).alias("abs_lift"),
        F.round((p_t - p_c) / se, 6).alias("z_score"),
    )


UPLIFT_SQL = """
WITH users AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' AND value > 200
                  THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
), grouped AS (
  SELECT converted, (user_id * 9973 + 7) % 100 < 90 AS treated FROM users
), agg AS (
  SELECT COUNT(*) FILTER (WHERE treated) AS n_t,
         COUNT(*) FILTER (WHERE NOT treated) AS n_c,
         CAST(SUM(CASE WHEN treated THEN converted ELSE 0 END) AS BIGINT)
           AS conv_t,
         CAST(SUM(CASE WHEN NOT treated THEN converted ELSE 0 END) AS BIGINT)
           AS conv_c
  FROM grouped
)
SELECT n_t, n_c, conv_t, conv_c,
       ROUND(conv_t / n_t, 6) AS rate_treatment,
       ROUND(conv_c / n_c, 6) AS rate_holdout,
       ROUND(conv_t / n_t - conv_c / n_c, 6) AS abs_lift,
       ROUND((conv_t / n_t - conv_c / n_c)
             / sqrt(((conv_t + conv_c) / (n_t + n_c))
                    * (1 - (conv_t + conv_c) / (n_t + n_c))
                    * (1 / n_t + 1 / n_c)), 6) AS z_score
FROM agg
"""

ANALYTICS_QUERIES["q54_holdout_uplift"] = (holdout_uplift, UPLIFT_SQL)
