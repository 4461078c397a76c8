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

# ---------------------------------------------------------------------------
# Deterministic ML-compiler artifacts, oracle-checked. The model FIT
# itself stays rows-only (ml_train_predict) — but everything around it
# (dataset assembly, 90/10 hash split + class rebalance, conversion-value
# segmentation) is deterministic SQL the compiler emits, so both engines
# execute the compiler's own generated text and must hash-match.


def _parity_compiler():
    from .ml.compiler import Compiler, MlModelConfig, Variable

    return Compiler(
        MlModelConfig(
            name="prop_parity",
            variables=[
                Variable("view", "FEATURE", comparison="EQUAL", value="view"),
                Variable("click", "FEATURE", comparison="EQUAL", value="click"),
                Variable(
                    "purchase", "LABEL", comparison="EQUAL", value="purchase"
                ),
            ],
            class_imbalance=4,
            conversion_rate_segments=8,
        )
    )


def bqml_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(split, label) user counts + feature mass of the compiler's
    train/calibrate datasets: proves the deterministic 90/10 affine-mod
    hash split (ref: model_bqml.sql:95-101) and the class-imbalance
    negative downsample (ref: model_bqml.sql:305-311) end-to-end. The
    oracle runs the SAME compiler-generated dataset SQL in DuckDB."""
    from .catalog import register_testdata
    from .workers.base import WorkerContext
    from .workers.sql_executor import SparkSQLExecutor

    register_testdata(spark, sf_dir)
    comp = _parity_compiler()
    parts = []
    for split in ("train", "calibrate"):
        script = (
            f"SELECT '{split}' AS split_name, label, "
            "COUNT(*) AS n_users, "
            "CAST(SUM(f_view) AS INT64) AS views, "
            "CAST(SUM(f_click) AS INT64) AS clicks "
            f"FROM ({comp.build_dataset_sql(split)}) GROUP BY label"
        )
        w = SparkSQLExecutor(
            {"script": script, "dry_run": False}, WorkerContext(spark)
        )
        w.execute()
        parts.append(w.result)
    return parts[0].unionAll(parts[1])


def _bqml_split_oracle() -> str:
    comp = _parity_compiler()
    parts = []
    for split in ("train", "calibrate"):
        parts.append(
            f"SELECT '{split}' AS split_name, label, "
            "COUNT(*) AS n_users, "
            "CAST(SUM(f_view) AS BIGINT) AS views, "
            "CAST(SUM(f_click) AS BIGINT) AS clicks "
            f"FROM ({comp.build_dataset_sql(split)}) GROUP BY label"
        )
    return " UNION ALL ".join(parts)


# CAST, not a 1000.0 literal: Spark types decimal literals as DECIMAL
# and would carry decimal division through the whole segment table
_DET_PROB = "((unique_id * 7919 + 13) % 1000) / CAST(1000 AS DOUBLE)"


def bqml_conversion_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The compiler's conversion-value segment table (NTILE segments
    with LAG/LEAD boundary midpoints, ref: model_bqml.sql:30-49) over a
    DETERMINISTIC pseudo-probability (affine-mod of unique_id), so the
    segmentation SQL — not a model fit — is what both engines compute.
    The NTILE here is the reference's own literal pattern on
    segment-count-sized output; the sketch-based scale path for global
    quantiles lives in ml/quantiles.py."""
    from .catalog import register_testdata
    from .workers.base import WorkerContext
    from .workers.sql_executor import SparkSQLExecutor

    register_testdata(spark, sf_dir)
    comp = _parity_compiler()
    script = (
        "CREATE OR REPLACE VIEW `tmp.ds.preds` AS "
        f"SELECT unique_id, {_DET_PROB} AS probability, label "
        f"FROM ({comp.build_dataset_sql('all')});\n"
        # NTILE is INT in Spark, BIGINT in DuckDB — pin the driver-facing
        # dtype without touching the compiler's production SQL
        "SELECT CAST(normalized_probability AS INT64) "
        "AS normalized_probability, value, probability_range_start, "
        "probability_range_end FROM ("
        + comp.conversion_values_sql("`tmp.ds.preds`")
        + ")"
    )
    w = SparkSQLExecutor(
        {"script": script, "dry_run": False}, WorkerContext(spark)
    )
    w.execute()
    return w.result


def _bqml_cv_oracle() -> str:
    comp = _parity_compiler()
    cv = comp.conversion_values_sql("preds")
    # splice the preds CTE into the compiler's own WITH chain
    assert cv.startswith("WITH ")
    return (
        "WITH preds AS (SELECT unique_id, "
        f"{_DET_PROB} AS probability, label "
        f"FROM ({comp.build_dataset_sql('all')})), "
        + cv[len("WITH ") :]
    )


def bqml_arima_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE MODEL ARIMA_PLUS + ML.FORECAST end-to-end: daily revenue
    per event type fitted with Holt linear smoothing (ml/forecast.py —
    the engine's deterministic stand-in for BigQuery's auto-ARIMA,
    divergence documented there), forecast 5 steps ahead. The fold and
    the forecast expansion are plain arithmetic, so the DuckDB oracle
    reproduces every forecast value."""
    from .catalog import register_testdata
    from .workers.base import WorkerContext
    from .workers.sql_executor import SparkSQLExecutor

    register_testdata(spark, sf_dir)
    script = """
    CREATE OR REPLACE MODEL `p.d.rev_forecast`
    OPTIONS(MODEL_TYPE='ARIMA_PLUS',
            TIME_SERIES_TIMESTAMP_COL='day',
            TIME_SERIES_DATA_COL='y',
            TIME_SERIES_ID_COL='event_type',
            HORIZON=7) AS (
      SELECT event_type, TIMESTAMP_TRUNC(ts, DAY) AS day,
             ROUND(SUM(value), 6) AS y
      FROM events GROUP BY event_type, day
    );
    SELECT series_id, step, forecast_ts_us, forecast_value,
           standard_error, confidence_level,
           prediction_interval_lower_bound, prediction_interval_upper_bound
    FROM ML.FORECAST(MODEL `p.d.rev_forecast`, STRUCT(5 AS horizon))
    """
    w = SparkSQLExecutor(
        {"script": script, "dry_run": False}, WorkerContext(spark)
    )
    w.execute()
    return w.result


# Shared Holt-Winters fit CTE chain (m = 7, daily grid -> weekly cycle,
# mirroring ml/forecast.py's AUTO_FREQUENCY inference on this fixture).
# Accumulator is a flat DOUBLE[] [level, trend, sse, s1..s7] (a struct
# accumulator hits a DuckDB 1.0 in-place aliasing quirk where
# acc.<field> rebinds to the field just computed within the same
# struct_pack); series shorter than 2 periods fall back to plain Holt
# with a 3-list accumulator — exactly the Spark-side branch. Every
# arithmetic expression matches ml/forecast.py term-for-term so the
# folds are IEEE-identical.
_HW_NL = "0.5 * (x[1] - acc[4]) + 0.5 * (acc[1] + acc[2])"
_HW_ERR = "(x[1] - ((acc[1] + acc[2]) + acc[4]))"

_HW_DAILY_PTS = """daily AS (
  SELECT event_type, date_trunc('day', ts) AS day, ROUND(SUM(value), 6) AS y
  FROM events GROUP BY 1, 2
), pts AS (
  SELECT event_type,
         list(CAST(y AS DOUBLE) ORDER BY day) AS ys,
         list(epoch_us(day) ORDER BY day) AS tus
  FROM daily GROUP BY 1
)"""

# the fold itself (base + fitted) consumes any CTE named ``pts`` with
# (event_type, ys, tus) — the holiday oracle feeds it the de-holidayed
# series instead of the raw one
_HW_FOLD_CTES = f"""base AS (
  SELECT event_type, ys, tus,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), ys[1:7]),
                     (a, x) -> a + x) / 7.0 AS l0,
         (list_reduce(list_prepend(CAST(0.0 AS DOUBLE), ys[8:14]),
                      (a, x) -> a + x) / 7.0
          - list_reduce(list_prepend(CAST(0.0 AS DOUBLE), ys[1:7]),
                        (a, x) -> a + x) / 7.0) / 7.0 AS b0
  FROM pts WHERE len(ys) >= 2
), fitted AS (
  SELECT event_type,
         CASE WHEN len(ys) >= 14 THEN
           list_reduce(
             list_prepend(
               list_concat([l0, b0, CAST(0.0 AS DOUBLE)],
                           list_transform(range(1, 8),
                             i -> ys[i] - (l0 + (CAST(i AS DOUBLE) - 4.0) * b0))),
               list_transform(ys[8:], v -> [v])),
             (acc, x) -> list_concat(
               [{_HW_NL},
                0.3 * (({_HW_NL}) - acc[1]) + 0.7 * acc[2],
                acc[3] + {_HW_ERR} * {_HW_ERR}],
               list_concat(acc[5:],
                 [0.3 * (x[1] - ({_HW_NL})) + 0.7 * acc[4]])))
         ELSE
           list_reduce(
             list_prepend([ys[1], CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)],
                          list_transform(ys[2:], v -> [v])),
             (acc, x) ->
               [0.5 * x[1] + 0.5 * (acc[1] + acc[2]),
                0.3 * ((0.5 * x[1] + 0.5 * (acc[1] + acc[2])) - acc[1])
                + 0.7 * acc[2],
                acc[3] + (x[1] - (acc[1] + acc[2]))
                       * (x[1] - (acc[1] + acc[2]))])
         END AS f,
         CASE WHEN len(ys) >= 14 THEN 7 ELSE 0 END AS per,
         CASE WHEN len(ys) >= 14 THEN len(ys) - 7 ELSE len(ys) - 1 END
           AS n_resid,
         tus[-1] AS last_us,
         (tus[-1] - tus[1]) // (len(tus) - 1) AS iv,
         len(tus) AS n
  FROM base
)"""

_HW_FIT_CTES = _HW_DAILY_PTS + ", " + _HW_FOLD_CTES

BQML_ARIMA_SQL = f"""
WITH {_HW_FIT_CTES}
SELECT event_type AS series_id,
       CAST(h AS INT) AS step,
       last_us + h * iv AS forecast_ts_us,
       ROUND(CASE WHEN per > 0
             THEN (f[1] + h * f[2]) + f[4 + ((h - 1) % per)]
             ELSE f[1] + h * f[2] END, 6) AS forecast_value,
       ROUND(sqrt(f[3] / n_resid) * sqrt(h), 6) AS standard_error,
       CAST(0.95 AS DOUBLE) AS confidence_level,
       ROUND((CASE WHEN per > 0
              THEN (f[1] + h * f[2]) + f[4 + ((h - 1) % per)]
              ELSE f[1] + h * f[2] END)
             - 1.96 * (sqrt(f[3] / n_resid) * sqrt(h)), 6)
         AS prediction_interval_lower_bound,
       ROUND((CASE WHEN per > 0
              THEN (f[1] + h * f[2]) + f[4 + ((h - 1) % per)]
              ELSE f[1] + h * f[2] END)
             + 1.96 * (sqrt(f[3] / n_resid) * sqrt(h)), 6)
         AS prediction_interval_upper_bound
FROM fitted, UNNEST(range(1, 6)) AS t(h)
"""


BQML_QUERIES: dict[str, tuple] = {
    "bqml_split_counts": (bqml_split_counts, _bqml_split_oracle()),
    "bqml_conversion_values": (bqml_conversion_values, _bqml_cv_oracle()),
    "bqml_arima_forecast": (bqml_arima_forecast, BQML_ARIMA_SQL),
    "bqml_training_verbatim": (
        bqml_training_verbatim,
        BQML_TRAINING_VERBATIM_ORACLE,
    ),
    "bqml_output_verbatim": (
        bqml_output_verbatim,
        BQML_OUTPUT_VERBATIM_ORACLE,
    ),
}


def bqml_detect_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML.DETECT_ANOMALIES over the fitted ARIMA_PLUS model: every daily
    revenue point checked against the z*sigma band around the model's
    linear extrapolation (sigma = one-step-ahead residual RMSE from the
    fit fold). In-sample scoring — the monitoring query a marketing team
    schedules right after each model refresh."""
    from .catalog import register_testdata
    from .workers.base import WorkerContext
    from .workers.sql_executor import SparkSQLExecutor

    register_testdata(spark, sf_dir)
    script = """
    CREATE OR REPLACE MODEL `p.d.rev_anom`
    OPTIONS(MODEL_TYPE='ARIMA_PLUS',
            TIME_SERIES_TIMESTAMP_COL='day',
            TIME_SERIES_DATA_COL='y',
            TIME_SERIES_ID_COL='event_type') AS (
      SELECT event_type, TIMESTAMP_TRUNC(ts, DAY) AS day,
             ROUND(SUM(value), 6) AS y
      FROM events GROUP BY event_type, day
    );
    SELECT series_id, ts_us, value, expected_value, band, is_anomaly
    FROM ML.DETECT_ANOMALIES(MODEL `p.d.rev_anom`,
                             STRUCT(0.95 AS anomaly_prob_threshold),
      (SELECT event_type, TIMESTAMP_TRUNC(ts, DAY) AS day,
              ROUND(SUM(value), 6) AS y
       FROM events GROUP BY event_type, day))
    """
    w = SparkSQLExecutor(
        {"script": script, "dry_run": False}, WorkerContext(spark)
    )
    w.execute()
    return w.result


_HW_HD = "(CAST(epoch_us(d.day) - last_us AS DOUBLE) / iv)"
_HW_EXPECTED = f"""CASE WHEN per > 0
  THEN (f[1] + {_HW_HD} * f[2])
       + f[3 + (((CAST(round({_HW_HD}) AS BIGINT) - 1) % per + per) % per + 1)]
  ELSE f[1] + {_HW_HD} * f[2] END"""

BQML_DETECT_SQL = f"""
WITH {_HW_FIT_CTES}
SELECT d.event_type AS series_id,
       epoch_us(d.day) AS ts_us,
       ROUND(d.y, 6) AS value,
       ROUND({_HW_EXPECTED}, 6) AS expected_value,
       ROUND(1.96 * sqrt(f[3] / n_resid), 6) AS band,
       abs(d.y - ({_HW_EXPECTED}))
         > 1.96 * sqrt(f[3] / n_resid) AS is_anomaly
FROM daily d JOIN fitted ft ON d.event_type = ft.event_type
"""

BQML_QUERIES["bqml_detect_anomalies"] = (
    bqml_detect_anomalies,
    BQML_DETECT_SQL,
)


def bqml_arima_evaluate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML.ARIMA_EVALUATE over the fitted ARIMA_PLUS model: per-series
    fit diagnostics in BigQuery's column shape. The engine's Holt /
    Holt-Winters substitute has no ARIMA order search, so
    non_seasonal_p/d/q are NULL (documented divergence) and the
    gaussian log-likelihood / AIC / variance are exact functions of the
    persisted fold state — the oracle replays the same fold."""
    from .catalog import register_testdata
    from .workers.base import WorkerContext
    from .workers.sql_executor import SparkSQLExecutor

    register_testdata(spark, sf_dir)
    script = """
    CREATE OR REPLACE MODEL `p.d.rev_fit`
    OPTIONS(MODEL_TYPE='ARIMA_PLUS',
            TIME_SERIES_TIMESTAMP_COL='day',
            TIME_SERIES_DATA_COL='y',
            TIME_SERIES_ID_COL='event_type') AS (
      SELECT event_type, TIMESTAMP_TRUNC(ts, DAY) AS day,
             ROUND(SUM(value), 6) AS y
      FROM events GROUP BY event_type, day
    );
    SELECT * FROM ML.ARIMA_EVALUATE(MODEL `p.d.rev_fit`)
    """
    w = SparkSQLExecutor(
        {"script": script, "dry_run": False}, WorkerContext(spark)
    )
    w.execute()
    return w.result


BQML_ARIMA_EVALUATE_SQL = f"""
WITH {_HW_FIT_CTES}
SELECT event_type AS series_id,
  CAST(NULL AS BIGINT) AS non_seasonal_p,
  CAST(NULL AS BIGINT) AS non_seasonal_d,
  CAST(NULL AS BIGINT) AS non_seasonal_q,
  FALSE AS has_drift,
  ROUND(-(n_resid / 2.0) * (ln(2 * pi() * (f[3] / n_resid)) + 1), 6)
    AS log_likelihood,
  ROUND(n_resid * (ln(2 * pi() * (f[3] / n_resid)) + 1)
        + 2 * (CASE WHEN per > 0 THEN 5 + per ELSE 4 END), 6) AS aic,
  ROUND(f[3] / n_resid, 6) AS variance,
  CASE WHEN per > 0 THEN CAST(per AS BIGINT) END AS seasonal_periods
FROM fitted
"""

BQML_QUERIES["bqml_arima_evaluate"] = (
    bqml_arima_evaluate,
    BQML_ARIMA_EVALUATE_SQL,
)


def bqml_arima_coefficients(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML.ARIMA_COEFFICIENTS over the fitted ARIMA_PLUS model: BigQuery's
    column shape (ar_coefficients, ma_coefficients, intercept_or_drift).
    The Holt/Holt-Winters substitute has no AR/MA terms (empty arrays,
    documented divergence in ml/forecast.py); intercept_or_drift is the
    fitted per-step drift — the final trend state of the fold, which
    the DuckDB oracle replays exactly."""
    from .catalog import register_testdata
    from .workers.base import WorkerContext
    from .workers.sql_executor import SparkSQLExecutor

    register_testdata(spark, sf_dir)
    script = """
    CREATE OR REPLACE MODEL `p.d.rev_fit_coef`
    OPTIONS(MODEL_TYPE='ARIMA_PLUS',
            TIME_SERIES_TIMESTAMP_COL='day',
            TIME_SERIES_DATA_COL='y',
            TIME_SERIES_ID_COL='event_type') AS (
      SELECT event_type, TIMESTAMP_TRUNC(ts, DAY) AS day,
             ROUND(SUM(value), 6) AS y
      FROM events GROUP BY event_type, day
    );
    SELECT series_id,
           ARRAY_LENGTH(ar_coefficients) AS n_ar,
           ARRAY_LENGTH(ma_coefficients) AS n_ma,
           intercept_or_drift
    FROM ML.ARIMA_COEFFICIENTS(MODEL `p.d.rev_fit_coef`)
    ORDER BY series_id
    """
    w = SparkSQLExecutor(
        {"script": script, "dry_run": False}, WorkerContext(spark)
    )
    w.execute()
    return w.result


# the array columns are projected to their lengths for the oracle — the
# driver's value-hash compare has no array contract; the raw arrays are
# asserted in test_sql_ml
BQML_ARIMA_COEFFICIENTS_SQL = f"""
WITH {_HW_FIT_CTES}
SELECT event_type AS series_id,
       CAST(0 AS INT) AS n_ar,
       CAST(0 AS INT) AS n_ma,
       ROUND(f[2], 6) AS intercept_or_drift
FROM fitted
ORDER BY series_id
"""

BQML_QUERIES["bqml_arima_coefficients"] = (
    bqml_arima_coefficients,
    BQML_ARIMA_COEFFICIENTS_SQL,
)


def bqml_arima_holiday_forecast(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ARIMA_PLUS with HOLIDAY_REGION='US': the RegARIMA-style pooled
    holiday-dummy fit (ml/forecast.py module note — effect estimated
    from interior holiday residuals vs the local linear interpolation,
    fold run on the de-holidayed series, effect added back on calendar
    holiday dates). The January fixture contains MLK Day (Jan 15,
    interior -> drives the effect) and New Year's Day (boundary ->
    adjusted but not estimated); the 20-step horizon lands on
    Washington's Birthday (Feb 19), exercising the forecast add-back.
    Every step is deterministic arithmetic, replayed by the DuckDB
    oracle term-for-term. ref: BigQuery ARIMA_PLUS ``holiday_region``
    option (CRMint passes model OPTIONS through verbatim)."""
    from .catalog import register_testdata
    from .workers.base import WorkerContext
    from .workers.sql_executor import SparkSQLExecutor

    register_testdata(spark, sf_dir)
    script = """
    CREATE OR REPLACE MODEL `p.d.rev_forecast_hol`
    OPTIONS(MODEL_TYPE='ARIMA_PLUS',
            TIME_SERIES_TIMESTAMP_COL='day',
            TIME_SERIES_DATA_COL='y',
            TIME_SERIES_ID_COL='event_type',
            HOLIDAY_REGION='US',
            HORIZON=20) AS (
      SELECT event_type, TIMESTAMP_TRUNC(ts, DAY) AS day,
             ROUND(SUM(value), 6) AS y
      FROM events GROUP BY event_type, day
    );
    SELECT series_id, step, forecast_ts_us, forecast_value,
           standard_error, confidence_level,
           prediction_interval_lower_bound, prediction_interval_upper_bound
    FROM ML.FORECAST(MODEL `p.d.rev_forecast_hol`)
    """
    w = SparkSQLExecutor(
        {"script": script, "dry_run": False}, WorkerContext(spark)
    )
    w.execute()
    return w.result


def _holiday_dates_literal() -> str:
    from .ml.forecast import holiday_calendar

    dates = holiday_calendar("US", [2024, 2025])
    return "[" + ", ".join(f"'{d}'" for d in dates) + "]"


_HOL = _holiday_dates_literal()

# point forecast including the holiday add-back — grouping mirrors the
# Spark side exactly: (linear [+ seasonal]) + (holiday effect | 0.0)
_HOL_POINT = f"""(CASE WHEN per > 0
              THEN (f[1] + h * f[2]) + f[4 + ((h - 1) % per)]
              ELSE f[1] + h * f[2] END)
             + (CASE WHEN list_contains({_HOL},
                  strftime(make_timestamp(last_us + h * iv), '%Y-%m-%d'))
                THEN e ELSE CAST(0.0 AS DOUBLE) END)"""

BQML_ARIMA_HOLIDAY_SQL = f"""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day, ROUND(SUM(value), 6) AS y
  FROM events GROUP BY 1, 2
), pts0 AS (
  SELECT event_type,
         list(CAST(y AS DOUBLE) ORDER BY day) AS ys0,
         list(strftime(day, '%Y-%m-%d') ORDER BY day) AS ds,
         list(epoch_us(day) ORDER BY day) AS tus
  FROM daily GROUP BY 1
), eff AS (
  SELECT event_type, ys0, ds, tus,
         list_filter(
           list_transform(range(2, len(ys0)), i ->
             CASE WHEN list_contains({_HOL}, ds[i])
                  THEN ys0[i] - (ys0[i-1] + ys0[i+1]) / 2.0 END),
           x -> x IS NOT NULL) AS r
  FROM pts0
), adj AS (
  SELECT event_type, ys0, ds, tus,
         CASE WHEN len(r) > 0
              THEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE), r),
                               (a, x) -> a + x) / CAST(len(r) AS DOUBLE)
              ELSE CAST(0.0 AS DOUBLE) END AS e
  FROM eff
), hol_e AS (
  SELECT event_type, e FROM adj
), pts AS (
  SELECT event_type,
         list_transform(range(1, len(ys0) + 1), i ->
           CASE WHEN list_contains({_HOL}, ds[i])
                THEN ys0[i] - e ELSE ys0[i] END) AS ys,
         tus
  FROM adj
), {_HW_FOLD_CTES}
SELECT event_type AS series_id,
       CAST(h AS INT) AS step,
       last_us + h * iv AS forecast_ts_us,
       ROUND({_HOL_POINT}, 6) AS forecast_value,
       ROUND(sqrt(f[3] / n_resid) * sqrt(h), 6) AS standard_error,
       CAST(0.95 AS DOUBLE) AS confidence_level,
       ROUND(({_HOL_POINT})
             - 1.96 * (sqrt(f[3] / n_resid) * sqrt(h)), 6)
         AS prediction_interval_lower_bound,
       ROUND(({_HOL_POINT})
             + 1.96 * (sqrt(f[3] / n_resid) * sqrt(h)), 6)
         AS prediction_interval_upper_bound
FROM fitted JOIN hol_e USING (event_type), UNNEST(range(1, 21)) AS t(h)
"""

BQML_QUERIES["bqml_arima_holiday"] = (
    bqml_arima_holiday_forecast,
    BQML_ARIMA_HOLIDAY_SQL,
)


def bqml_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE MODEL MODEL_TYPE='KMEANS' end-to-end: deterministic
    bounded-sample Lloyd fit (ml/kmeans.py — engine-neutral hash-order
    trainer sample, 6 dp rounding discipline), then ML.CENTROIDS joined
    with ML.PREDICT cluster sizes. Every step — standardization stats,
    sample selection, init spacing, three Lloyd rounds, final
    assignment — is replayed term-for-term by the DuckDB oracle, so the
    hash-compare certifies the whole clustering pipeline, not just its
    shape. ref: BigQuery k-means clustering docs (CRMint passes CREATE
    MODEL OPTIONS through verbatim)."""
    from .catalog import register_testdata
    from .workers.base import WorkerContext
    from .workers.sql_executor import SparkSQLExecutor

    register_testdata(spark, sf_dir)
    script = """
    CREATE OR REPLACE MODEL `p.d.km_oracle`
    OPTIONS(MODEL_TYPE='KMEANS', NUM_CLUSTERS=3, MAX_ITERATIONS=3) AS (
      SELECT CAST(c_acctbal AS FLOAT64) AS bal,
             CAST(c_nationkey AS FLOAT64) AS nat
      FROM customer
      WHERE c_acctbal IS NOT NULL AND c_nationkey IS NOT NULL
    );
    SELECT c.centroid_id, c.feature, c.numerical_value, s.n
    FROM ML.CENTROIDS(MODEL `p.d.km_oracle`) c
    JOIN (SELECT centroid_id, COUNT(*) AS n
          FROM ML.PREDICT(MODEL `p.d.km_oracle`,
            (SELECT CAST(c_acctbal AS FLOAT64) AS bal,
                    CAST(c_nationkey AS FLOAT64) AS nat
             FROM customer
             WHERE c_acctbal IS NOT NULL AND c_nationkey IS NOT NULL))
          GROUP BY centroid_id) s USING (centroid_id)
    ORDER BY c.centroid_id, c.feature
    """
    w = SparkSQLExecutor(
        {"script": script, "dry_run": False}, WorkerContext(spark)
    )
    w.execute()
    return w.result


def _kmeans_oracle_sql(k: int = 3, iters: int = 3) -> str:
    """Generate the DuckDB replay of ml/kmeans.py's fit: same hash
    sample, same init spacing, same fold order, same ROUND(.,6) every
    step. d = 2 features (bal, nat)."""

    def dist(p: str, cs: str, i: int) -> str:
        # squared L2 as the same left fold in dim order as the engine
        e = "0.0"
        for j in (1, 2):
            t = f"({p}[{j}] - {cs}[{i}][{j}])"
            e = f"({e} + {t} * {t})"
        return e

    def best(p: str, cs: str) -> str:
        ds = "[" + ", ".join(dist(p, cs, i + 1) for i in range(k)) + "]"
        # first index attaining the min == the engine's sequential
        # strict-< argmin
        return f"list_position({ds}, list_aggregate({ds}, 'min'))"

    def recompute(cs: str) -> str:
        parts = []
        for i in range(k):
            mem = f"list_filter(pts, p -> {best('p', cs)} = {i + 1})"
            dims = []
            for j in (1, 2):
                s = (
                    f"list_reduce(list_prepend(0.0, "
                    f"list_transform({mem}, p -> p[{j}])), (a, x) -> a + x)"
                )
                dims.append(f"ROUND({s} / len({mem}), 6)")
            parts.append(
                f"CASE WHEN len({mem}) > 0 THEN [{dims[0]}, {dims[1]}]"
                f" ELSE {cs}[{i + 1}] END"
            )
        return "[" + ", ".join(parts) + "]"

    init = ", ".join(f"pts[1 + ({i} * m) // {k}]" for i in range(k))
    iter_ctes = "".join(
        f", c{t + 1} AS (SELECT pts, m, {recompute('cs')} AS cs FROM c{t})"
        for t in range(iters)
    )
    cent_rows = "\n  UNION ALL ".join(
        f"SELECT {i + 1} AS centroid_id, '{feat}' AS feature,"
        f" ROUND(cs[{i + 1}][{j + 1}] * sd{j + 1} + mu{j + 1}, 6)"
        f" AS numerical_value FROM fin, st"
        for i in range(k)
        for j, feat in enumerate(("bal", "nat"))
    )
    return f"""
WITH feats AS (
  SELECT CAST(c_acctbal AS DOUBLE) AS x1, CAST(c_nationkey AS DOUBLE) AS x2
  FROM customer WHERE c_acctbal IS NOT NULL AND c_nationkey IS NOT NULL
), st AS (
  SELECT ROUND(AVG(x1), 6) AS mu1, ROUND(AVG(x2), 6) AS mu2,
         CASE WHEN COALESCE(ROUND(STDDEV_POP(x1), 6), 0) = 0 THEN 1.0
              ELSE ROUND(STDDEV_POP(x1), 6) END AS sd1,
         CASE WHEN COALESCE(ROUND(STDDEV_POP(x2), 6), 0) = 0 THEN 1.0
              ELSE ROUND(STDDEV_POP(x2), 6) END AS sd2
  FROM feats
), std AS (
  SELECT ROUND((x1 - mu1) / sd1, 6) AS v1, ROUND((x2 - mu2) / sd2, 6) AS v2
  FROM feats, st
), samp AS (
  SELECT v1, v2 FROM (
    SELECT v1, v2,
      (((7 * 9973 + CAST(ROUND(v1 * 1000000) AS BIGINT)) % 1000000007)
        * 9973 + CAST(ROUND(v2 * 1000000) AS BIGINT)) % 1000000007 AS h
    FROM std)
  ORDER BY h, v1, v2 LIMIT 256
), s0 AS (
  SELECT list([v1, v2] ORDER BY v1, v2) AS pts, COUNT(*) AS m FROM samp
), c0 AS (
  SELECT pts, m, [{init}] AS cs FROM s0
){iter_ctes}, fin AS (
  SELECT cs FROM c{iters}
), assign AS (
  SELECT {best("[v1, v2]", "cs")} AS centroid_id FROM std, fin
), counts AS (
  SELECT centroid_id, COUNT(*) AS n FROM assign GROUP BY 1
), cent_rows AS (
  {cent_rows}
)
SELECT CAST(c.centroid_id AS BIGINT) AS centroid_id, c.feature,
       c.numerical_value, s.n
FROM cent_rows c JOIN counts s USING (centroid_id)
ORDER BY c.centroid_id, c.feature
"""


BQML_QUERIES["bqml_kmeans"] = (bqml_kmeans, _kmeans_oracle_sql())


def bqml_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE MODEL MODEL_TYPE='PCA' end-to-end: deterministic deflated
    power iteration (ml/pca_model.py) over the shared hash-order
    trainer sample, then ML.PRINCIPAL_COMPONENTS joined with
    ML.PRINCIPAL_COMPONENT_INFO. The DuckDB oracle replays the whole
    fit — stats, sample, covariance folds, 48 rounded power-iteration
    steps per component, Rayleigh eigenvalues, Hotelling deflation —
    term-for-term. ref: BigQuery PCA docs (CRMint passes CREATE MODEL
    OPTIONS through verbatim)."""
    from .catalog import register_testdata
    from .workers.base import WorkerContext
    from .workers.sql_executor import SparkSQLExecutor

    register_testdata(spark, sf_dir)
    script = """
    CREATE OR REPLACE MODEL `p.d.pca_oracle`
    OPTIONS(MODEL_TYPE='PCA', NUM_PRINCIPAL_COMPONENTS=2,
            SCALE_FEATURES=TRUE) AS (
      SELECT CAST(c_acctbal AS FLOAT64) AS bal,
             CAST(c_nationkey AS FLOAT64) AS nat
      FROM customer
      WHERE c_acctbal IS NOT NULL AND c_nationkey IS NOT NULL
    );
    SELECT pc.principal_component_id, pc.feature, pc.numerical_value,
           i.eigenvalue, i.explained_variance_ratio,
           i.cumulative_explained_variance_ratio
    FROM ML.PRINCIPAL_COMPONENTS(MODEL `p.d.pca_oracle`) pc
    JOIN ML.PRINCIPAL_COMPONENT_INFO(MODEL `p.d.pca_oracle`) i
      USING (principal_component_id)
    ORDER BY pc.principal_component_id, pc.feature
    """
    w = SparkSQLExecutor(
        {"script": script, "dry_run": False}, WorkerContext(spark)
    )
    w.execute()
    return w.result


def _pca_power_chain(prefix: str, src: str, iters: int = 48) -> str:
    """One power-iteration CTE chain (d = 2); carries every other
    column (tv, lam1, u1x, ...) through via EXCLUDE."""
    ctes = [f"{prefix}0 AS (SELECT *, 1.0 AS v1, 0.0 AS v2 FROM {src})"]
    for t in range(1, iters + 1):
        ctes.append(
            f"""{prefix}{t} AS (
  SELECT * EXCLUDE (v1, v2, w1, w2, nrm),
    CASE WHEN nrm = 0.0 THEN v1 ELSE ROUND(w1 / nrm, 6) END AS v1,
    CASE WHEN nrm = 0.0 THEN v2 ELSE ROUND(w2 / nrm, 6) END AS v2
  FROM (SELECT *, sqrt((0.0 + w1 * w1) + w2 * w2) AS nrm
        FROM (SELECT *, ((0.0 + c11 * v1) + c12 * v2) AS w1,
                        ((0.0 + c21 * v1) + c22 * v2) AS w2
              FROM {prefix}{t - 1})))"""
        )
    return ", ".join(ctes)


def _pca_fit_prefix() -> str:
    """Shared fit front-end CTEs (feats -> stats -> std -> sample ->
    covariance) for the bal/nat customer fixture — identical text in
    the PCA and AUTOENCODER oracles."""

    def cov_fold(a: int, b: int) -> str:
        return (
            f"list_reduce(list_prepend(0.0, list_transform(pts,"
            f" p -> p[{a}] * p[{b}])), (x, y) -> x + y) / m"
        )

    return f"""feats AS (
  SELECT CAST(c_acctbal AS DOUBLE) AS x1, CAST(c_nationkey AS DOUBLE) AS x2
  FROM customer WHERE c_acctbal IS NOT NULL AND c_nationkey IS NOT NULL
), st AS (
  SELECT ROUND(AVG(x1), 6) AS mu1, ROUND(AVG(x2), 6) AS mu2,
         CASE WHEN COALESCE(ROUND(STDDEV_POP(x1), 6), 0) = 0 THEN 1.0
              ELSE ROUND(STDDEV_POP(x1), 6) END AS sd1,
         CASE WHEN COALESCE(ROUND(STDDEV_POP(x2), 6), 0) = 0 THEN 1.0
              ELSE ROUND(STDDEV_POP(x2), 6) END AS sd2
  FROM feats
), std AS (
  SELECT ROUND((x1 - mu1) / sd1, 6) AS v1, ROUND((x2 - mu2) / sd2, 6) AS v2
  FROM feats, st
), samp AS (
  SELECT v1, v2 FROM (
    SELECT v1, v2,
      (((7 * 9973 + CAST(ROUND(v1 * 1000000) AS BIGINT)) % 1000000007)
        * 9973 + CAST(ROUND(v2 * 1000000) AS BIGINT)) % 1000000007 AS h
    FROM std)
  ORDER BY h, v1, v2 LIMIT 256
), s0 AS (
  SELECT list([v1, v2] ORDER BY v1, v2) AS pts, COUNT(*) AS m FROM samp
), cov AS (
  SELECT {cov_fold(1, 1)} AS c11, {cov_fold(1, 2)} AS c12,
         {cov_fold(2, 1)} AS c21, {cov_fold(2, 2)} AS c22,
         ((0.0 + {cov_fold(1, 1)}) + {cov_fold(2, 2)}) AS tv
  FROM s0
)"""


def _pca_oracle_sql(iters: int = 48) -> str:
    """DuckDB replay of ml/pca_model.py's fit for d=2, k=2: identical
    fold orders, identical ROUND(.,6) discipline."""

    def power_chain(prefix: str, src: str) -> str:
        return _pca_power_chain(prefix, src, iters)

    rayleigh = (
        "ROUND(((0.0 + v1 * ((0.0 + c11 * v1) + c12 * v2))"
        " + v2 * ((0.0 + c21 * v1) + c22 * v2)), 6)"
    )
    return f"""
WITH {_pca_fit_prefix()}, {power_chain("p", "cov")}, l1 AS (
  SELECT *, {rayleigh} AS lam FROM p{iters}
), d1 AS (
  SELECT tv, c11 - lam * v1 * v1 AS c11, c12 - lam * v1 * v2 AS c12,
         c21 - lam * v2 * v1 AS c21, c22 - lam * v2 * v2 AS c22,
         lam AS lam1, v1 AS u11, v2 AS u12 FROM l1
), {power_chain("q", "d1")}, l2 AS (
  SELECT *, {rayleigh} AS lam FROM q{iters}
), fin AS (
  SELECT u11, u12, v1 AS u21, v2 AS u22, lam1, lam AS lam2,
         ROUND(lam1 / tv, 6) AS r1, ROUND(lam / tv, 6) AS r2
  FROM l2
), rows_out AS (
  SELECT 1 AS principal_component_id, 'bal' AS feature, u11 AS numerical_value,
         lam1 AS eigenvalue, r1 AS explained_variance_ratio,
         r1 AS cumulative_explained_variance_ratio FROM fin
  UNION ALL SELECT 1, 'nat', u12, lam1, r1, r1 FROM fin
  UNION ALL SELECT 2, 'bal', u21, lam2, r2, ROUND(r1 + r2, 6) FROM fin
  UNION ALL SELECT 2, 'nat', u22, lam2, r2, ROUND(r1 + r2, 6) FROM fin
)
SELECT CAST(principal_component_id AS BIGINT) AS principal_component_id,
       feature, numerical_value, eigenvalue, explained_variance_ratio,
       cumulative_explained_variance_ratio
FROM rows_out ORDER BY principal_component_id, feature
"""


BQML_QUERIES["bqml_pca"] = (bqml_pca, _pca_oracle_sql())


def bqml_autoencoder_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE MODEL MODEL_TYPE='AUTOENCODER' + reconstruction-loss
    ML.DETECT_ANOMALIES (contamination contract): the linear-AE == PCA
    equivalence (ml/pca_model.py, Baldi & Hornik 1989) makes the whole
    chain — fit, per-row reconstruction MSE, exact order-statistic
    threshold, flags — deterministic, and the DuckDB oracle replays all
    of it. ref: BigQuery autoencoder anomaly-detection docs."""
    from .catalog import register_testdata
    from .workers.base import WorkerContext
    from .workers.sql_executor import SparkSQLExecutor

    register_testdata(spark, sf_dir)
    script = """
    CREATE OR REPLACE MODEL `p.d.ae_oracle`
    OPTIONS(MODEL_TYPE='AUTOENCODER', HIDDEN_UNITS=[8, 1, 8]) AS (
      SELECT CAST(c_acctbal AS FLOAT64) AS bal,
             CAST(c_nationkey AS FLOAT64) AS nat
      FROM customer
      WHERE c_acctbal IS NOT NULL AND c_nationkey IS NOT NULL
    );
    SELECT is_anomaly, COUNT(*) AS n,
           ROUND(MIN(mean_squared_error), 6) AS min_mse,
           ROUND(MAX(mean_squared_error), 6) AS max_mse
    FROM ML.DETECT_ANOMALIES(MODEL `p.d.ae_oracle`,
                             STRUCT(0.05 AS contamination),
      (SELECT CAST(c_acctbal AS FLOAT64) AS bal,
              CAST(c_nationkey AS FLOAT64) AS nat
       FROM customer
       WHERE c_acctbal IS NOT NULL AND c_nationkey IS NOT NULL))
    GROUP BY is_anomaly ORDER BY is_anomaly
    """
    w = SparkSQLExecutor(
        {"script": script, "dry_run": False}, WorkerContext(spark)
    )
    w.execute()
    return w.result


def _autoencoder_oracle_sql(iters: int = 48) -> str:
    """DuckDB replay: k=1 PCA fit + per-row reconstruction MSE (same
    fold order as pca_model._mse_expr) + exact order-statistic
    threshold at floor((1 - 0.05) * n) + 1, flagging >= (ADVICE r6:
    exactly ceil(c*n) rows without ties, nonzero with them)."""
    # proj = (0.0 + s1*u1) + s2*u2; xhat_j = 0.0 + proj*u_j;
    # mse = ((0.0 + e1*e1) + e2*e2) / 2.0
    proj = "((0.0 + v1 * u1) + v2 * u2)"
    e1 = f"(v1 - (0.0 + {proj} * u1))"
    e2 = f"(v2 - (0.0 + {proj} * u2))"
    mse = f"(((0.0 + {e1} * {e1}) + {e2} * {e2}) / 2.0)"
    return f"""
WITH {_pca_fit_prefix()}, {_pca_power_chain("p", "cov", iters)}, fin AS (
  SELECT v1 AS u1, v2 AS u2 FROM p{iters}
), scored AS (
  SELECT ROUND({mse}, 6) + 0 AS mse FROM std, fin
), nrow AS (
  SELECT COUNT(*) AS n FROM scored
), thr AS (
  SELECT mse AS t FROM (
    SELECT mse, ROW_NUMBER() OVER (ORDER BY mse) AS rn FROM scored)
  WHERE rn = (SELECT CAST(FLOOR((1.0 - 0.05) * n) AS BIGINT) + 1 FROM nrow)
)
SELECT is_anomaly, COUNT(*) AS n,
       ROUND(MIN(mse), 6) AS min_mse, ROUND(MAX(mse), 6) AS max_mse
FROM (SELECT mse, mse >= t AS is_anomaly FROM scored, thr)
GROUP BY is_anomaly ORDER BY is_anomaly
"""


BQML_QUERIES["bqml_autoencoder_anomalies"] = (
    bqml_autoencoder_anomalies,
    _autoencoder_oracle_sql(),
)


def bqml_explain_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML.EXPLAIN_FORECAST end-to-end (VERDICT r6 #4): per-timestamp
    decomposition for history + horizon — time_series_type/data, trend,
    seasonal_period_weekly, holiday_effect, residual, and the forecast
    interval columns. The fold replay runs over the per-series history
    persisted with the model (ml/forecast.explain_forecast_frame); the
    DuckDB oracle replays the SAME fold with per-step (trend, seasonal)
    emission appended to the flat accumulator, so every component is
    hash-certified. Components sum to ML.FORECAST's forecast_value
    (pytest-asserted in test_sql_ml)."""
    from .catalog import register_testdata
    from .workers.base import WorkerContext
    from .workers.sql_executor import SparkSQLExecutor

    register_testdata(spark, sf_dir)
    script = """
    CREATE OR REPLACE MODEL `p.d.rev_explain`
    OPTIONS(MODEL_TYPE='ARIMA_PLUS',
            TIME_SERIES_TIMESTAMP_COL='day',
            TIME_SERIES_DATA_COL='y',
            TIME_SERIES_ID_COL='event_type',
            HORIZON=7) AS (
      SELECT event_type, TIMESTAMP_TRUNC(ts, DAY) AS day,
             ROUND(SUM(value), 6) AS y
      FROM events GROUP BY event_type, day
    );
    SELECT * FROM ML.EXPLAIN_FORECAST(MODEL `p.d.rev_explain`,
                                      STRUCT(5 AS horizon))
    ORDER BY series_id, time_series_timestamp_us
    """
    w = SparkSQLExecutor(
        {"script": script, "dry_run": False}, WorkerContext(spark)
    )
    w.execute()
    return w.result


# ML.EXPLAIN_FORECAST oracle: the same HW/Holt fold as BQML_ARIMA_SQL,
# extended to append per-step one-step-ahead (trend, seasonal)
# predictions to the flat accumulator tail (state stays at fixed slots
# 1..10, so the seasonal window slices acc[5:10] instead of acc[5:]).
# History positions t <= m take the classical-init fitted line and
# seasonal indices (residual exactly 0 by construction); t > m read the
# appended pair at f[2t-5], f[2t-4] (Holt: f[t+2], seasonal 0).
_XF_NL = _HW_NL
_XF_ERR = _HW_ERR
_XF_HOLT_NL = "0.5 * x[1] + 0.5 * (acc[1] + acc[2])"
_XF_HOLT_ERR = "(x[1] - (acc[1] + acc[2]))"

BQML_EXPLAIN_FORECAST_SQL = f"""
WITH {_HW_DAILY_PTS}, base AS (
  SELECT event_type, ys, tus,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), ys[1:7]),
                     (a, x) -> a + x) / 7.0 AS l0,
         (list_reduce(list_prepend(CAST(0.0 AS DOUBLE), ys[8:14]),
                      (a, x) -> a + x) / 7.0
          - list_reduce(list_prepend(CAST(0.0 AS DOUBLE), ys[1:7]),
                        (a, x) -> a + x) / 7.0) / 7.0 AS b0
  FROM pts WHERE len(ys) >= 2
), fitted AS (
  SELECT event_type, ys, tus, l0, b0,
         CASE WHEN len(ys) >= 14 THEN
           list_reduce(
             list_prepend(
               list_concat([l0, b0, CAST(0.0 AS DOUBLE)],
                           list_transform(range(1, 8),
                             i -> ys[i] - (l0 + (CAST(i AS DOUBLE) - 4.0) * b0))),
               list_transform(ys[8:], v -> [v])),
             (acc, x) -> list_concat(
               list_concat(
                 [{_XF_NL},
                  0.3 * (({_XF_NL}) - acc[1]) + 0.7 * acc[2],
                  acc[3] + {_XF_ERR} * {_XF_ERR}],
                 list_concat(acc[5:10],
                   [0.3 * (x[1] - ({_XF_NL})) + 0.7 * acc[4]])),
               list_concat(acc[11:], [acc[1] + acc[2], acc[4]])))
         ELSE
           list_reduce(
             list_prepend([ys[1], CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)],
                          list_transform(ys[2:], v -> [v])),
             (acc, x) -> list_concat(
               [{_XF_HOLT_NL},
                0.3 * (({_XF_HOLT_NL}) - acc[1]) + 0.7 * acc[2],
                acc[3] + {_XF_HOLT_ERR} * {_XF_HOLT_ERR}],
               list_concat(acc[4:], [acc[1] + acc[2]])))
         END AS f,
         CASE WHEN len(ys) >= 14 THEN 7 ELSE 0 END AS per,
         CASE WHEN len(ys) >= 14 THEN len(ys) - 7 ELSE len(ys) - 1 END
           AS n_resid,
         tus[-1] AS last_us,
         (tus[-1] - tus[1]) // (len(tus) - 1) AS iv,
         len(ys) AS n
  FROM base
), hist_raw AS (
  SELECT event_type, tus[t] AS ts_us, ys[t] AS yv,
         CASE WHEN per > 0 THEN
           CASE WHEN t <= 7 THEN l0 + (CAST(t AS DOUBLE) - 4.0) * b0
                ELSE f[2 * t - 5] END
         ELSE
           CASE WHEN t = 1 THEN ys[1] ELSE f[t + 2] END
         END AS tr,
         CASE WHEN per > 0 THEN
           CASE WHEN t <= 7
                THEN ys[t] - (l0 + (CAST(t AS DOUBLE) - 4.0) * b0)
                ELSE f[2 * t - 4] END
         ELSE CAST(0.0 AS DOUBLE) END AS se_
  FROM fitted, UNNEST(range(1, n + 1)) AS u(t)
), hist AS (
  SELECT event_type AS series_id, ts_us AS time_series_timestamp_us,
         'history' AS time_series_type,
         ROUND(yv, 6) + 0 AS time_series_data,
         ROUND(tr, 6) + 0 AS trend,
         ROUND(se_, 6) + 0 AS seasonal_period_weekly,
         CAST(0.0 AS DOUBLE) AS holiday_effect,
         ROUND(yv - tr - se_ - 0.0, 6) + 0 AS residual,
         CAST(NULL AS DOUBLE) AS standard_error,
         CAST(NULL AS DOUBLE) AS confidence_level,
         CAST(NULL AS DOUBLE) AS prediction_interval_lower_bound,
         CAST(NULL AS DOUBLE) AS prediction_interval_upper_bound
  FROM hist_raw
), fcst AS (
  SELECT event_type AS series_id,
         last_us + h * iv AS time_series_timestamp_us,
         'forecast' AS time_series_type,
         CAST(NULL AS DOUBLE) AS time_series_data,
         ROUND(f[1] + h * f[2], 6) + 0 AS trend,
         ROUND(CASE WHEN per > 0 THEN f[4 + ((h - 1) % per)]
               ELSE 0.0 END, 6) + 0 AS seasonal_period_weekly,
         CAST(0.0 AS DOUBLE) AS holiday_effect,
         CAST(NULL AS DOUBLE) AS residual,
         ROUND(sqrt(f[3] / n_resid) * sqrt(h), 6) + 0 AS standard_error,
         CAST(0.95 AS DOUBLE) AS confidence_level,
         ROUND(((f[1] + h * f[2])
                + (CASE WHEN per > 0 THEN f[4 + ((h - 1) % per)]
                   ELSE 0.0 END) + 0.0)
               - 1.96 * (sqrt(f[3] / n_resid) * sqrt(h)), 6) + 0
           AS prediction_interval_lower_bound,
         ROUND(((f[1] + h * f[2])
                + (CASE WHEN per > 0 THEN f[4 + ((h - 1) % per)]
                   ELSE 0.0 END) + 0.0)
               + 1.96 * (sqrt(f[3] / n_resid) * sqrt(h)), 6) + 0
           AS prediction_interval_upper_bound
  FROM fitted, UNNEST(range(1, 6)) AS u(h)
)
SELECT * FROM hist UNION ALL SELECT * FROM fcst
ORDER BY series_id, time_series_timestamp_us
"""

BQML_QUERIES["bqml_explain_forecast"] = (
    bqml_explain_forecast,
    BQML_EXPLAIN_FORECAST_SQL,
)


def bqml_vocab_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """>10k-category TRANSFORM encoder scale path (VERDICT r6 #3): a
    10,001-category ML.LABEL_ENCODER vocabulary exceeds _VOCAB_MAX, so
    the fit persists it as a vocabulary table and the encode becomes an
    equi LEFT JOIN Spark broadcasts (BroadcastHashJoin — asserted in
    test_sql_ml) instead of a 10k-entry literal map. ML.TRANSFORM
    replays it over a probe mixing in-vocabulary, beyond-vocabulary and
    unseen categories; the DuckDB oracle replays the frequency-then-
    value vocabulary ranking and the left join by value."""
    from .catalog import register_testdata
    from .workers.base import WorkerContext
    from .workers.sql_executor import SparkSQLExecutor

    register_testdata(spark, sf_dir)
    script = """
    CREATE OR REPLACE MODEL `p.d.bigvocab91`
    TRANSFORM(ML.LABEL_ENCODER(cat) AS cat_enc)
    OPTIONS(MODEL_TYPE='KMEANS', NUM_CLUSTERS=2, MAX_ITERATIONS=1) AS
    SELECT CONCAT('c', CAST(r AS STRING)) AS cat
    FROM UNNEST(GENERATE_ARRAY(1, 10001)) AS r;
    SELECT CAST(cat_enc AS INT64) AS cat_enc,
           (SELECT COUNT(*) FROM orders WHERE o_orderkey <= 50) AS src_n
    FROM ML.TRANSFORM(MODEL `p.d.bigvocab91`,
      (SELECT CONCAT('c', CAST(r * 37 AS STRING)) AS cat
       FROM UNNEST(GENERATE_ARRAY(1, 400)) AS r
       UNION ALL SELECT 'zzz_unseen'))
    ORDER BY cat_enc
    """
    w = SparkSQLExecutor(
        {"script": script, "dry_run": False}, WorkerContext(spark)
    )
    w.execute()
    return w.result


BQML_VOCAB_BROADCAST_SQL = """
WITH vocab AS (
  SELECT cat AS v,
         row_number() OVER (ORDER BY COUNT(*) DESC, cat ASC) AS idx
  FROM (SELECT 'c' || CAST(x AS VARCHAR) AS cat FROM range(1, 10002) t(x))
  GROUP BY cat
), probe AS (
  SELECT 'c' || CAST(x * 37 AS VARCHAR) AS cat FROM range(1, 401) t(x)
  UNION ALL SELECT 'zzz_unseen'
)
SELECT CAST(coalesce(v.idx, 0) AS BIGINT) AS cat_enc,
       (SELECT COUNT(*) FROM orders WHERE o_orderkey <= 50) AS src_n
FROM probe p LEFT JOIN vocab v ON p.cat = v.v
ORDER BY cat_enc
"""

BQML_QUERIES["bqml_vocab_broadcast"] = (
    bqml_vocab_broadcast,
    BQML_VOCAB_BROADCAST_SQL,
)


def bqml_onehot_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """>10k-category ML.ONE_HOT_ENCODER scale path (round 8, VERDICT r7
    #3): above _VOCAB_MAX the encoder now joins the SAME persisted
    vocabulary table as LABEL_ENCODER (hinted BroadcastHashJoin) and
    wraps the joined index as its single sparse entry — EXACT
    semantics, closing the former hash-bucket divergence (the hashing
    trick remains as the opt-in drop => 'hash'). The probe mixes
    in-vocabulary, beyond-vocabulary and unseen categories plus a NULL;
    the DuckDB oracle replays the frequency-then-value ranking and the
    left join by value. The TRANSFORM consumes the encoder's single
    sparse entry immediately (``[OFFSET(0)]``) so the KMEANS host model
    sees numeric features; the struct-array shape itself is asserted in
    test_sql_ml (test_big_vocab_encoder_broadcast_paths)."""
    from .catalog import register_testdata
    from .workers.base import WorkerContext
    from .workers.sql_executor import SparkSQLExecutor

    register_testdata(spark, sf_dir)
    script = """
    CREATE OR REPLACE MODEL `p.d.bigonehot`
    TRANSFORM(ML.ONE_HOT_ENCODER(cat)[OFFSET(0)].index AS oh_idx,
              ML.ONE_HOT_ENCODER(cat)[OFFSET(0)].value AS oh_val)
    OPTIONS(MODEL_TYPE='KMEANS', NUM_CLUSTERS=2, MAX_ITERATIONS=1,
            STANDARDIZE_FEATURES=FALSE) AS
    SELECT CONCAT('c', CAST(r AS STRING)) AS cat
    FROM UNNEST(GENERATE_ARRAY(1, 10001)) AS r;
    SELECT oh_idx, oh_val,
           (SELECT COUNT(*) FROM orders WHERE o_orderkey <= 50) AS src_n
    FROM ML.TRANSFORM(MODEL `p.d.bigonehot`,
      (SELECT CONCAT('c', CAST(r * 53 AS STRING)) AS cat
       FROM UNNEST(GENERATE_ARRAY(1, 300)) AS r
       UNION ALL SELECT 'zzz_unseen'
       UNION ALL SELECT CAST(NULL AS STRING)))
    ORDER BY oh_idx
    """
    w = SparkSQLExecutor(
        {"script": script, "dry_run": False}, WorkerContext(spark)
    )
    w.execute()
    return w.result


BQML_ONEHOT_BROADCAST_SQL = """
WITH vocab AS (
  SELECT cat AS v,
         row_number() OVER (ORDER BY COUNT(*) DESC, cat ASC) AS idx
  FROM (SELECT 'c' || CAST(x AS VARCHAR) AS cat FROM range(1, 10002) t(x))
  GROUP BY cat
), probe AS (
  SELECT 'c' || CAST(x * 53 AS VARCHAR) AS cat FROM range(1, 301) t(x)
  UNION ALL SELECT 'zzz_unseen'
  UNION ALL SELECT CAST(NULL AS VARCHAR)
)
SELECT CAST(coalesce(v.idx, 0) AS BIGINT) AS oh_idx,
       CAST(1.0 AS DOUBLE) AS oh_val,
       (SELECT COUNT(*) FROM orders WHERE o_orderkey <= 50) AS src_n
FROM probe p LEFT JOIN vocab v ON p.cat = v.v
ORDER BY oh_idx
"""

BQML_QUERIES["bqml_onehot_broadcast"] = (
    bqml_onehot_broadcast,
    BQML_ONEHOT_BROADCAST_SQL,
)
