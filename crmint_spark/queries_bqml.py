"""Verbatim-execution oracle entries for the reference's flagship
generated SQL.

These entries render the reference's OWN Jinja templates
(``model_bqml.sql`` / ``output.sql``, read from the read-only reference
checkout) exactly as the reference compiler renders them, then execute
the resulting multi-statement BigQuery script UNMODIFIED through
``SparkSQLExecutor`` — wildcard ``events_*`` shards, ``_TABLE_SUFFIX``
predicates, ``__TABLES_SUMMARY__`` discovery, lateral + correlated
``UNNEST``, ``FARM_FINGERPRINT`` splits, BQML ``CREATE MODEL``
interception and all. The DuckDB oracles recompute the same results
from the flat ``events`` testdata through the documented fixture
derivations (see ``crmint_spark.ga4``), so the driver hash-compare
proves end-to-end dialect parity, not just shape.

ref: backend/controller/ml_model/templates/model_bqml.sql:1-322,
output.sql:1-135, compiler.py:268-342.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession

from .catalog import Catalog
from .ga4 import (
    DUCKDB_HASH100,
    GA4_DUCKDB_CTE,
    SPARK_HASH100,
    setup_ga4_dataset,
)
from .ml.reference_templates import (
    ga4_classification_context,
    render_reference_template,
)

_DAYPART_CASE = """
      CASE
        WHEN first_touch_hour >= 1 AND first_touch_hour < 6 THEN 'night_1_6'
        WHEN first_touch_hour >= 6 AND first_touch_hour < 11 THEN 'morning_6_11'
        WHEN first_touch_hour >= 11 AND first_touch_hour < 14 THEN 'lunch_11_14'
        WHEN first_touch_hour >= 14 AND first_touch_hour < 17 THEN 'afternoon_14_17'
        WHEN first_touch_hour >= 17 AND first_touch_hour < 19 THEN 'dinner_17_19'
        WHEN first_touch_hour >= 19 AND first_touch_hour < 22 THEN 'evening_19_23'
        WHEN first_touch_hour >= 22 OR first_touch_hour = 0 THEN 'latenight_23_1'
      END AS daypart
"""

_HASH_UID = DUCKDB_HASH100.format(x="user_id")
_HASH_UNIQ = DUCKDB_HASH100.format(x="unique_id")


def _run_script(spark: SparkSession, sf_dir: str, script: str) -> DataFrame:
    from .workers.base import WorkerContext
    from .workers.sql_executor import SparkSQLExecutor

    cat = Catalog(spark, tempfile.mkdtemp(prefix="bqml_verbatim_"))
    setup_ga4_dataset(spark, sf_dir, cat)
    worker = SparkSQLExecutor(
        {"script": script, "dry_run": False},
        WorkerContext(spark=spark, catalog=cat),
    )
    worker.execute()
    return worker.result


def bqml_training_verbatim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rendered reference TRAINING script, executed unmodified; the
    result is the training-input dataset the CREATE MODEL statement was
    fit on (ref: model_bqml.sql — training step, GA4 source,
    classification, class_imbalance=4)."""
    script = render_reference_template(
        "model_bqml.sql", ga4_classification_context(step="training")
    )
    return _run_script(spark, sf_dir, script)


# The same dataset, computed independently in DuckDB from the flat
# events table: the events/first_engagement/analytics_variables/
# aggregate_behavior/unified_dataset pipeline of model_bqml.sql:52-311
# with every nested event_params lookup reduced to its flat fixture
# column (ga4.py derivation table).
BQML_TRAINING_VERBATIM_ORACLE = f"""
WITH ga4 AS ({GA4_DUCKDB_CTE}),
evts AS (
  SELECT
    event_timestamp AS timestamp,
    strptime(event_date, '%Y%m%d')::DATE AS date,
    event_name AS name,
    user_id, user_pseudo_id,
    user_id AS unique_id,
    country, region, language, device_type, device_os, device_browser,
    traffic_source, traffic_medium,
    EXTRACT(HOUR FROM make_timestamp(user_first_touch_timestamp)) AS first_touch_hour,
    engagement_ms, plan, severity, purchase_value
  FROM ga4
  WHERE event_date BETWEEN strftime(CURRENT_DATE - INTERVAL 3650 DAY, '%Y%m%d')
                       AND strftime(CURRENT_DATE, '%Y%m%d')
    AND {_HASH_UID} < 90
    AND LOWER(platform) = 'web'
),
first_engagement AS (
  SELECT * EXCLUDE (row_num)
  FROM (
    SELECT
      user_id, user_pseudo_id, unique_id, country, region, language,
      traffic_source, traffic_medium, device_type, device_os, device_browser,
      {_DAYPART_CASE},
      ROW_NUMBER() OVER (PARTITION BY unique_id ORDER BY timestamp ASC) AS row_num
    FROM evts
    WHERE name = 'user_engagement'
  )
  WHERE row_num = 1
),
label_events AS (
  SELECT unique_id, 1 AS label, MIN(date) AS date
  FROM evts
  WHERE name = 'purchase' AND purchase_value > 0
  GROUP BY 1
),
user_variables AS (
  SELECT l.date AS trigger_date,
         CAST(COALESCE(l.label, 0) AS INTEGER) AS label,
         fe.unique_id
  FROM first_engagement fe
  LEFT OUTER JOIN label_events l ON fe.unique_id = l.unique_id
),
aggregate_behavior AS (
  SELECT
    e.unique_id,
    CAST(SUM(CASE WHEN e.name = 'page_view' THEN 1 ELSE 0 END) AS BIGINT)
      AS cnt_page_view,
    CAST(COALESCE(SUM(CASE WHEN e.name = 'signup' AND e.plan = 'pro'
                           THEN 1 END), 0) AS BIGINT)
      AS cnt_signup_plan_equal_pro,
    CAST(COALESCE(SUM(CASE WHEN e.name = 'error' AND e.severity > 2
                           THEN 1 END), 0) AS BIGINT)
      AS cnt_error_severity_greater_2,
    CAST(SUM(e.engagement_ms) AS BIGINT) AS engagement_time
  FROM evts e
  INNER JOIN user_variables uv ON e.unique_id = uv.unique_id
  WHERE (uv.label > 0 AND e.date <= uv.trigger_date) OR uv.label = 0
  GROUP BY 1
),
unified_dataset AS (
  SELECT
    fe.unique_id, fe.country, fe.region, fe.language,
    fe.traffic_source, fe.traffic_medium,
    fe.device_type, fe.device_os, fe.device_browser, fe.daypart,
    ab.cnt_page_view, ab.cnt_signup_plan_equal_pro,
    ab.cnt_error_severity_greater_2, ab.engagement_time,
    uv.label
  FROM first_engagement fe
  INNER JOIN aggregate_behavior ab ON fe.unique_id = ab.unique_id
  INNER JOIN user_variables uv ON fe.unique_id = uv.unique_id
)
SELECT country, region, language, traffic_source, traffic_medium,
       device_type, device_os, device_browser, daypart,
       cnt_page_view, cnt_signup_plan_equal_pro,
       cnt_error_severity_greater_2, engagement_time, label
FROM unified_dataset
WHERE label > 0
UNION ALL
SELECT country, region, language, traffic_source, traffic_medium,
       device_type, device_os, device_browser, daypart,
       cnt_page_view, cnt_signup_plan_equal_pro,
       cnt_error_severity_greater_2, engagement_time, label
FROM unified_dataset
WHERE label = 0
AND {_HASH_UNIQ} <= ((1 / 4) * 100)
"""

# ---------------------------------------------------------------------
# output.sql verbatim: DECLARE + __TABLES_SUMMARY__ latest-shard
# discovery, wildcard scan pinned to one shard, lateral UNNEST,
# NOT IN, BETWEEN range join, CREATE OR REPLACE TABLE AS.
# The predictions / conversion_values inputs (normally produced by the
# predicting / conversion-values pipeline steps) are deterministic
# fixtures mirrored in both engines.
# ---------------------------------------------------------------------

_SPARK_HASH_UID = SPARK_HASH100.format(x="user_id")

_PREDICTIONS_SPARK_SQL = f"""
SELECT user_id AS unique_id, user_pseudo_id, user_id,
       (CAST({_SPARK_HASH_UID} AS DOUBLE) + 0.5) / 100 AS probability,
       CASE WHEN (CAST({_SPARK_HASH_UID} AS DOUBLE) + 0.5) / 100 > 0.5
            THEN 1 ELSE 0 END AS predicted_label
FROM (SELECT DISTINCT CAST(user_id AS STRING) AS user_id,
             CONCAT('pseudo_', CAST(user_id AS STRING)) AS user_pseudo_id
      FROM {{events}})
"""

_CONVERSION_VALUES_SPARK_SQL = """
SELECT seg AS normalized_probability,
       CAST(seg AS DOUBLE) * 7.25 AS value,
       CAST(seg - 1 AS DOUBLE) / 10 AS probability_range_start,
       CAST(seg AS DOUBLE) / 10 AS probability_range_end
FROM (SELECT explode(sequence(1, 10)) AS seg)
"""

_PREDICTIONS_DUCKDB_CTE = f"""
  SELECT user_id AS unique_id, user_pseudo_id, user_id,
         (CAST({_HASH_UID} AS DOUBLE) + 0.5) / 100 AS probability,
         CASE WHEN (CAST({_HASH_UID} AS DOUBLE) + 0.5) / 100 > 0.5
              THEN 1 ELSE 0 END AS predicted_label
  FROM (SELECT DISTINCT CAST(user_id AS VARCHAR) AS user_id,
               'pseudo_' || CAST(user_id AS VARCHAR) AS user_pseudo_id
        FROM events)
"""

_CONVERSION_VALUES_DUCKDB_CTE = """
  SELECT CAST(seg AS INTEGER) AS normalized_probability,
         CAST(seg AS DOUBLE) * 7.25 AS value,
         CAST(seg - 1 AS DOUBLE) / 10 AS probability_range_start,
         CAST(seg AS DOUBLE) / 10 AS probability_range_end
  FROM generate_series(1, 10) AS t(seg)
"""


def bqml_output_verbatim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rendered reference OUTPUT script executed unmodified
    (ref: output.sql — classification, GA4 source, user_id unique id,
    GA4 Measurement Protocol destination); returns the materialized
    ``output`` table."""
    from .workers.base import WorkerContext
    from .workers.sql_executor import SparkSQLExecutor

    cat = Catalog(spark, tempfile.mkdtemp(prefix="bqml_verbatim_"))
    setup_ga4_dataset(spark, sf_dir, cat)
    spark.sql(
        _PREDICTIONS_SPARK_SQL.format(events="__ga4_source_events")
    ).createOrReplaceTempView("crmint__models__predictions")
    spark.sql(_CONVERSION_VALUES_SPARK_SQL).createOrReplaceTempView(
        "crmint__models__conversion_values"
    )
    script = render_reference_template(
        "output.sql", ga4_classification_context(step="none")
    )
    worker = SparkSQLExecutor(
        {"script": script, "dry_run": False},
        WorkerContext(spark=spark, catalog=cat),
    )
    worker.execute()
    return spark.table("crmint__models__output")


BQML_OUTPUT_VERBATIM_ORACLE = f"""
WITH ga4 AS ({GA4_DUCKDB_CTE}),
latest AS (SELECT MAX(event_date) AS suffix FROM ga4),
evts AS (
  SELECT user_id AS unique_id, event_name AS name,
         event_timestamp AS timestamp,
         plan, severity, purchase_value, gclid
  FROM ga4
  WHERE event_date = (SELECT suffix FROM latest)
    AND LOWER(platform) = 'web'
),
predictions AS ({_PREDICTIONS_DUCKDB_CTE}),
conversion_values AS ({_CONVERSION_VALUES_DUCKDB_CTE}),
prepared_predictions AS (
  SELECT DISTINCT
    p.unique_id, p.user_pseudo_id, p.user_id,
    ROUND(MAX(cv.value), 4) AS value,
    MAX(cv.normalized_probability) AS normalized_score,
    MAX(p.probability) * 100 AS score
  FROM predictions p
  LEFT OUTER JOIN conversion_values cv
    ON p.probability BETWEEN cv.probability_range_start
                         AND cv.probability_range_end
  GROUP BY 1, 2, 3
),
users_with_score AS (
  -- the fixture's only string params with value 'Predicted_Value' are
  -- on prop_score events (ga4.py: key='type')
  SELECT DISTINCT unique_id FROM evts WHERE name = 'prop_score'
),
users_without_score AS (
  SELECT DISTINCT unique_id FROM evts
  WHERE unique_id NOT IN (SELECT unique_id FROM users_with_score)
)
SELECT
  p.value, p.normalized_score, p.score,
  p.user_pseudo_id AS client_id,
  p.unique_id AS user_id,
  'prop_score' AS event_name,
  'Predicted_Value' AS type
FROM prepared_predictions p
INNER JOIN users_without_score wos
ON p.unique_id = wos.unique_id
"""

BQML_QUERIES: dict[str, tuple] = {
    "bqml_training_verbatim": (
        bqml_training_verbatim,
        BQML_TRAINING_VERBATIM_ORACLE,
    ),
    "bqml_output_verbatim": (
        bqml_output_verbatim,
        BQML_OUTPUT_VERBATIM_ORACLE,
    ),
}
