"""Core query registry: every operator from SURVEY.md §2.2 as an
idiomatic-PySpark callable plus a DuckDB oracle SQL string.

Each entry mirrors a query shape the reference's generated/sample SQL
exercises (citations into /root/reference in each docstring). The Spark
side is DataFrame-API-first so Catalyst owns the physical plan; the
oracle side is ANSI SQL DuckDB runs on the same parquet (bare view
names, registered by the driver).

Cross-engine determinism rules used throughout:
- float aggregates are ROUNDed in both engines,
- window orderings always include a unique tiebreak column,
- counts/int-sums are cast to BIGINT in both engines,
- deterministic hashing uses the portable primitives in
  ``crmint_spark.functions`` (md5-prefix for strings, affine-mod for ints).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load
from .functions import hash_split_int


# ---------------------------------------------------------------------------
# Scans / aggregation


def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered scan + grouped aggregation (SUM/AVG/COUNT), the
    reference's bread-and-butter shape (ref: model_bqml.sql:163-176,
    aggregates at :250). TPC-H Q1 flavored.

    Scale notes: predicate + column pruning reach the parquet scan;
    partial (map-side) aggregation means the shuffle carries only
    6 groups x partial states.
    """
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 2) AS avg_qty,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q02_topk_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way equi-join + agg + ORDER BY ... LIMIT top-k
    (ref: bigquery.py:83-90 top-100 events; joins model_bqml.sql:206-207).

    Scale notes: customer joins broadcast at test SF; at 100 TB the
    orders⋈lineitem join shuffles on orderkey — both sides are naturally
    clustered on it, so bucketing by orderkey removes the shuffle.
    """
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    # pre-aggregate lineitem by orderkey BEFORE the join: orderkey is the
    # full grouping key (orderkey -> custkey -> c_name is functional), so
    # the groupBy-after-join re-shuffle of every joined row collapses into
    # one map-side-combined agg whose partitioning the join then reuses —
    # at 100 TB this is the difference between shuffling lineitem twice
    # and shuffling its ~4x-smaller aggregate once
    rev = li.groupBy("l_orderkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )
    return (
        rev.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            rev.l_orderkey == orders.o_orderkey,
        )
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("o_orderkey", "c_name", "revenue")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


Q02_SQL = """
SELECT o_orderkey, c_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE o_orderstatus = 'F'
GROUP BY o_orderkey, c_name
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def q03_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery → LEFT SEMI join (ref: model_bqml.sql:105-107)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
        )
    )


Q03_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_customers,
       ROUND(SUM(c_acctbal), 2) AS sum_acctbal
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


def q04_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN subquery → LEFT ANTI join, minding NOT-IN null semantics
    (ref: output.sql:82-83). o_custkey is non-null here, so anti-join and
    NOT IN agree. The subquery is date-restricted (customers with no
    order since 1999) so the anti-join produces real rows at every test
    SF — every customer has *some* order, which previously made this a
    vacuous 0 = 0 oracle match."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    recent = orders.filter(F.col("o_orderdate") >= "1999-01-01")
    no_orders = cust.join(
        recent.select("o_custkey"), cust.c_custkey == F.col("o_custkey"), "left_anti"
    )
    return (
        no_orders.join(F.broadcast(nation), no_orders.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


Q04_SQL = """
SELECT n_name, COUNT(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderdate >= DATE '1999-01-01')
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# Windows


def q05_conversion_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's conversion-value table: NTILE global bucketing,
    then LAG(MAX)/LEAD(MIN) midpoint boundary math over the aggregated
    rows (ref: model_bqml.sql:31-49).

    Scale notes: global NTILE is a single-partition sort — fine for the
    bucket-boundary table (output is 10 rows) but the input should be
    pre-aggregated or sampled at 100 TB; `approxQuantile` is the scale
    path (SURVEY §4).
    """
    cust = load(spark, sf_dir, "customer")
    w = Window.orderBy(F.asc("c_acctbal"), F.asc("c_custkey"))
    ranked = cust.select(
        "c_acctbal",
        "c_custkey",
        # bigint: DuckDB's NTILE yields int64, Spark's int32 — align types
        F.ntile(10).over(w).cast("bigint").alias("bucket"),
    )
    agg = ranked.groupBy("bucket").agg(
        F.min("c_acctbal").alias("mn"),
        F.max("c_acctbal").alias("mx"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("c_acctbal"), 2).alias("value"),
    )
    wb = Window.orderBy("bucket")
    return agg.select(
        "bucket",
        "value",
        "n",
        # midpoints of 2-decimal values have <=3 decimals; round at 4 so the
        # rounding digit is never an exact half (cross-engine determinism)
        F.round(
            F.coalesce((F.lag("mx").over(wb) + F.col("mn")) / 2, F.col("mn") - 1.0), 4
        ).alias("range_start"),
        F.round(
            F.coalesce((F.lead("mn").over(wb) + F.col("mx")) / 2, F.col("mx") + 1.0), 4
        ).alias("range_end"),
    )


Q05_SQL = """
WITH ranked AS (
  SELECT c_acctbal, c_custkey,
         NTILE(10) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) AS bucket
  FROM customer
), agg AS (
  SELECT bucket, MIN(c_acctbal) AS mn, MAX(c_acctbal) AS mx,
         COUNT(*) AS n, ROUND(AVG(c_acctbal), 2) AS value
  FROM ranked GROUP BY bucket
)
SELECT bucket, value, n,
       ROUND(COALESCE((LAG(mx) OVER (ORDER BY bucket) + mn) / 2, mn - 1.0), 4) AS range_start,
       ROUND(COALESCE((LEAD(mn) OVER (ORDER BY bucket) + mx) / 2, mx + 1.0), 4) AS range_end
FROM agg
"""


def q06_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi BETWEEN join against the bucket-boundary table
    (ref: output.sql:48-49 — probability BETWEEN range_start AND
    range_end). Build side is 10 rows → broadcast nested-loop join,
    which is exactly the right physical plan at any scale."""
    cv = q05_conversion_values(spark, sf_dir).select(
        "bucket", "range_start", "range_end"
    )
    supp = load(spark, sf_dir, "supplier")
    return (
        supp.join(
            F.broadcast(cv),
            (supp.s_acctbal >= cv.range_start) & (supp.s_acctbal <= cv.range_end),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.sum("s_acctbal"), 2).alias("sum_acctbal"),
        )
    )


Q06_SQL = """
WITH ranked AS (
  SELECT c_acctbal, c_custkey,
         NTILE(10) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) AS bucket
  FROM customer
), agg AS (
  SELECT bucket, MIN(c_acctbal) AS mn, MAX(c_acctbal) AS mx FROM ranked GROUP BY bucket
), cv AS (
  SELECT bucket,
         COALESCE((LAG(mx) OVER (ORDER BY bucket) + mn) / 2, mn - 1.0) AS range_start,
         COALESCE((LEAD(mn) OVER (ORDER BY bucket) + mx) / 2, mx + 1.0) AS range_end
  FROM agg
)
SELECT bucket, COUNT(*) AS n_suppliers, ROUND(SUM(s_acctbal), 2) AS sum_acctbal
FROM supplier JOIN cv ON s_acctbal BETWEEN cv.range_start AND cv.range_end
GROUP BY bucket
"""


def q07_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW_NUMBER first-event-per-user dedup, the reference's
    first-touch pattern (ref: model_bqml.sql:134-138, 187-196;
    output.sql:112-118)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("first_event_type"),
            F.to_date("ts").alias("first_date"),
            F.round("value", 2).alias("first_value"),
        )
    )


Q07_SQL = """
SELECT user_id, first_event_type, first_date, first_value FROM (
  SELECT user_id, event_type AS first_event_type, CAST(ts AS DATE) AS first_date,
         ROUND(value, 2) AS first_value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
  FROM events
) WHERE rn = 1
"""


def q08_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via LAG + cumulative SUM (30-min inactivity gap) —
    the batch shape of the streaming session-window extension. Exact
    integer micros math for cross-engine determinism."""
    ev = load(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    gap = 30 * 60 * 1000 * 1000  # 30 min in micros
    sessionized = (
        ev.withColumn("prev_us", F.lag(F.unix_micros(F.col("ts").cast("timestamp"))).over(wo))
        .withColumn(
            "is_new",
            F.when(
                F.col("prev_us").isNull()
                | (F.unix_micros(F.col("ts").cast("timestamp")) - F.col("prev_us") > gap),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "session_id",
            F.sum("is_new").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return (
        sessionized.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .groupBy("user_id")
        .agg(
            F.max("session_id").alias("n_sessions"),
            F.max("n_events").alias("max_session_events"),
            F.round(F.sum("session_value"), 2).alias("total_value"),
        )
    )


Q08_SQL = """
WITH lagged AS (
  SELECT user_id, ts, event_id, value,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_us
  FROM events
), flagged AS (
  SELECT *, CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
                 THEN 1 ELSE 0 END AS is_new
  FROM lagged
), sess AS (
  SELECT user_id, value,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
), per_session AS (
  SELECT user_id, session_id, COUNT(*) AS n_events,
         ROUND(SUM(value), 2) AS session_value
  FROM sess GROUP BY user_id, session_id
)
SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions,
       MAX(n_events) AS max_session_events,
       ROUND(SUM(session_value), 2) AS total_value
FROM per_session GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Semi-structured / higher-order


def q09_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction per row — the engine's equivalent of the
    reference's GA4 ``event_params`` key access
    (ref: model_bqml.sql:163-173, 253: UNNEST + key filter + COALESCE)."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.sum(F.coalesce(k, F.lit(0))).cast("bigint").alias("sum_k"),
        F.count(k).alias("n_with_k"),
        F.max(k).alias("max_k"),
    )


Q09_SQL = """
SELECT event_type,
       CAST(SUM(COALESCE(CAST(json_extract(props, '$.k') AS BIGINT), 0)) AS BIGINT) AS sum_k,
       COUNT(CAST(json_extract(props, '$.k') AS BIGINT)) AS n_with_k,
       MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type
"""


def q10_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-array aggregation as higher-order functions — the
    Spark-native replacement for ``SUM((SELECT 1 FROM UNNEST(params)
    WHERE ...))`` (ref: model_bqml.sql:220-248). No shuffle, no explode:
    filter/size/aggregate run inside the row."""
    docs = load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    long_words = F.filter(words, lambda w: F.length(w) > 4)
    return docs.groupBy("lang").agg(
        F.sum(F.size(words)).cast("bigint").alias("total_words"),
        F.sum(F.size(long_words)).cast("bigint").alias("total_long_words"),
        F.round(F.avg(F.size(F.array_distinct(words))), 2).alias("avg_distinct_words"),
    )


Q10_SQL = """
SELECT lang,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_words,
       CAST(SUM(len(list_filter(string_split(text, ' '), w -> length(w) > 4))) AS BIGINT)
         AS total_long_words,
       ROUND(AVG(len(list_distinct(string_split(text, ' ')))), 2) AS avg_distinct_words
FROM documents GROUP BY lang
"""


def q11_explode_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral explode (``FROM t, UNNEST(arr)``) shape
    (ref: model_bqml.sql:166,188; output.sql:74,113): word frequency
    top-20 over exploded document tokens."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(20)
    )


Q11_SQL = """
SELECT word, COUNT(*) AS freq
FROM (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
GROUP BY word ORDER BY freq DESC, word ASC LIMIT 20
"""


# ---------------------------------------------------------------------------
# Set ops / sampling / string agg


def q12_union_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL class rebalancing: all rare-class rows ∪
    deterministically-downsampled common-class rows
    (ref: model_bqml.sql:305-311)."""
    orders = load(spark, sf_dir, "orders")
    rare = orders.filter(F.col("o_orderstatus") == "P")
    common = orders.filter(F.col("o_orderstatus") != "P").filter(
        hash_split_int("o_orderkey", 100) < 10
    )
    return (
        rare.unionAll(common)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


Q12_SQL = """
WITH sampled AS (
  SELECT * FROM orders WHERE o_orderstatus = 'P'
  UNION ALL
  SELECT * FROM orders WHERE o_orderstatus <> 'P'
    AND (o_orderkey * 9973 + 7) % 100 < 10
)
SELECT o_orderstatus, COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS sum_price
FROM sampled GROUP BY o_orderstatus
"""


def q13_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/10 hash split — engine-neutral stand-in for
    ``MOD(ABS(FARM_FINGERPRINT(id)), 100) < 90``
    (ref: model_bqml.sql:95-101)."""
    orders = load(spark, sf_dir, "orders")
    split = F.when(hash_split_int("o_orderkey", 100) < 90, "train").otherwise("test")
    return orders.groupBy(split.alias("split")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
    )


Q13_SQL = """
SELECT CASE WHEN (o_orderkey * 9973 + 7) % 100 < 90 THEN 'train' ELSE 'test' END AS split,
       COUNT(*) AS n, ROUND(AVG(o_totalprice), 2) AS avg_price
FROM orders GROUP BY 1
"""


def q14_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRING_AGG(DISTINCT ... ORDER BY ...) equivalent:
    sort_array(collect_set) + array_join (ref: bigquery.py:95-103)."""
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.sort_array(F.collect_set("n_name")), ",").alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


Q14_SQL = """
SELECT r_name, string_agg(DISTINCT n_name, ',' ORDER BY n_name) AS nations,
       COUNT(*) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q15_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function surface: CASE/IF/COALESCE/EXTRACT/date_format/
    LOWER/LENGTH/SPLIT-index/ROUND/MOD/ABS/rlike
    (ref: model_bqml.sql:125-152, 276-278; output.sql:4-6, 44-46, 64)."""
    orders = load(spark, sf_dir, "orders")
    pri_class = (
        F.when(F.col("o_orderpriority").rlike("^[12]-"), "high")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "medium")
        .otherwise("low")
    )
    return (
        orders.select(
            F.year("o_orderdate").cast("bigint").alias("order_year"),
            pri_class.alias("priority_class"),
            F.date_format("o_orderdate", "yyyyMM").alias("order_month"),
            F.lower(F.split(F.col("o_orderpriority"), "-").getItem(1)).alias(
                "priority_word"
            ),
            "o_totalprice",
        )
        .groupBy("order_year", "priority_class")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("order_month").alias("first_month"),
            F.array_join(
                F.sort_array(F.collect_set("priority_word")), ","
            ).alias("priority_words"),
            F.round(F.sum(F.when(F.col("o_totalprice") > 100000, F.col("o_totalprice"))), 2
            ).alias("big_price_sum"),
        )
    )


Q15_SQL = """
SELECT EXTRACT(YEAR FROM o_orderdate) AS order_year,
       CASE WHEN regexp_matches(o_orderpriority, '^[12]-') THEN 'high'
            WHEN o_orderpriority = '3-MEDIUM' THEN 'medium'
            ELSE 'low' END AS priority_class,
       COUNT(*) AS n,
       MIN(strftime(o_orderdate, '%Y%m')) AS first_month,
       string_agg(DISTINCT lower(string_split(o_orderpriority, '-')[2]), ','
                  ORDER BY lower(string_split(o_orderpriority, '-')[2])) AS priority_words,
       ROUND(SUM(CASE WHEN o_totalprice > 100000 THEN o_totalprice END), 2) AS big_price_sum
FROM orders GROUP BY 1, 2
"""


def q16_distinct_ordinal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT + GROUP BY ordinal (ref: output.sql:38-79;
    model_bqml.sql:174 GROUP BY 1) — via spark.sql to exercise the SQL
    entry path with groupByOrdinal."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT dc.c_mktsegment, COUNT(*) AS n_status_combos
        FROM (SELECT DISTINCT c_mktsegment, o_orderstatus
              FROM customer JOIN orders ON c_custkey = o_custkey) dc
        GROUP BY 1
        """
    )


Q16_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_status_combos
FROM (SELECT DISTINCT c_mktsegment, o_orderstatus
      FROM customer JOIN orders ON c_custkey = o_custkey) dc
GROUP BY 1
"""


def q17_left_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER JOIN against an aggregated subquery
    (ref: model_bqml.sql:157-176) with IFNULL on the missing side."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("lifetime_value"),
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.coalesce("n_orders", F.lit(0)).cast("bigint").alias("n_orders"),
            F.coalesce("lifetime_value", F.lit(0.0)).alias("lifetime_value"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.sum("n_orders").cast("bigint").alias("total_orders"),
            F.round(F.sum("lifetime_value"), 2).alias("total_value"),
            F.sum(F.when(F.col("n_orders") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("inactive_customers"),
        )
    )


Q17_SQL = """
WITH per_cust AS (
  SELECT o_custkey, COUNT(*) AS n_orders,
         ROUND(SUM(o_totalprice), 2) AS lifetime_value
  FROM orders GROUP BY o_custkey
)
SELECT c_mktsegment,
       CAST(SUM(COALESCE(n_orders, 0)) AS BIGINT) AS total_orders,
       ROUND(SUM(COALESCE(lifetime_value, 0.0)), 2) AS total_value,
       CAST(SUM(CASE WHEN COALESCE(n_orders, 0) = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS inactive_customers
FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey
GROUP BY c_mktsegment
"""


def q18_running_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative window aggregate (default frame) + share-of-total —
    windows over aggregates composition (ref: model_bqml.sql:38-49)."""
    orders = load(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("month_total"))
    w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, 0)
    return monthly.select(
        "month",
        "month_total",
        F.round(F.sum("month_total").over(w), 2).alias("running_total"),
        F.round(
            F.col("month_total") / F.sum("month_total").over(Window.partitionBy()) * 100,
            4,
        ).alias("pct_of_total"),
    )


Q18_SQL = """
WITH monthly AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         ROUND(SUM(o_totalprice), 2) AS month_total
  FROM orders GROUP BY 1
)
SELECT month, month_total,
       ROUND(SUM(month_total) OVER (ORDER BY month ROWS UNBOUNDED PRECEDING), 2)
         AS running_total,
       ROUND(month_total / SUM(month_total) OVER () * 100, 4) AS pct_of_total
FROM monthly
"""


CORE_QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "q01_pricing_summary": (q01_pricing_summary, Q01_SQL),
    "q02_topk_revenue": (q02_topk_revenue, Q02_SQL),
    "q03_semi_join": (q03_semi_join, Q03_SQL),
    "q04_anti_join": (q04_anti_join, Q04_SQL),
    "q05_conversion_values": (q05_conversion_values, Q05_SQL),
    "q06_range_join": (q06_range_join, Q06_SQL),
    "q07_first_touch": (q07_first_touch, Q07_SQL),
    "q08_sessionize": (q08_sessionize, Q08_SQL),
    "q09_json_props": (q09_json_props, Q09_SQL),
    "q10_array_hof": (q10_array_hof, Q10_SQL),
    "q11_explode_unnest": (q11_explode_unnest, Q11_SQL),
    "q12_union_rebalance": (q12_union_rebalance, Q12_SQL),
    "q13_hash_split": (q13_hash_split, Q13_SQL),
    "q14_string_agg": (q14_string_agg, Q14_SQL),
    "q15_scalar_funcs": (q15_scalar_funcs, Q15_SQL),
    "q16_distinct_ordinal": (q16_distinct_ordinal, Q16_SQL),
    "q17_left_join_agg": (q17_left_join_agg, Q17_SQL),
    "q18_running_window": (q18_running_window, Q18_SQL),
}
