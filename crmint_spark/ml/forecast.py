"""BQML time-series surface: ``CREATE MODEL ... MODEL_TYPE='ARIMA_PLUS'``
and ``ML.FORECAST``.

BigQuery's ARIMA_PLUS is a proprietary auto-ARIMA ensemble; the engine
substitutes **Holt's linear exponential smoothing** (level + trend,
fixed alpha/beta) — a classical forecaster whose fit is a single
deterministic left fold over each ordered series, so the whole path is
reproducible in ANSI SQL and the DuckDB oracle certifies forecasts
value-for-value — including the prediction intervals (additive-error
bands, +/- z * sigma * sqrt(h) from the fit's one-step residual RMSE).
Documented divergence: no seasonality/holiday/anomaly decomposition;
interval widths come from Holt's additive-error model, not BigQuery's
ARIMA ensemble quantiles.

Execution shape: fitting is ONE groupBy(series) with a JVM-side
``array_sort`` + ``aggregate`` fold — no Python, no per-series jobs;
per-series state is 4 scalars, materialized on the driver exactly like
the other model registries. Forecasting expands ``sequence(1, horizon)``
per series — k*h rows from a k-row state table.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HOLT_ALPHA = 0.5
HOLT_BETA = 0.3


def fit_holt_state(
    df: DataFrame, ts_col: str, y_col: str, id_col: str | None
) -> list[dict]:
    """-> [{series_id, level, trend, last_us, iv_us, n_obs}, ...].

    Fold (identical expression order on both engines, so IEEE-identical):
      l_1 = y_1, b_1 = 0
      l_t = A*y_t + (1-A)*(l + b);  b_t = B*(l_t - l) + (1-B)*b
    """
    a, one_a = float(HOLT_ALPHA), 1.0 - HOLT_ALPHA
    b_, one_b = float(HOLT_BETA), 1.0 - HOLT_BETA
    sid = (
        F.col(id_col).cast("string")
        if id_col
        else F.lit("__all__")
    )
    pts = (
        df.select(
            sid.alias("series_id"),
            F.col(ts_col).alias("__ts"),
            F.col(y_col).cast("double").alias("__y"),
        )
        .groupBy("series_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("__ts", "__y"))).alias("p")
        )
    )
    ys = F.transform("p", lambda s: s["__y"])
    tus = F.transform(
        "p", lambda s: F.unix_micros(s["__ts"].cast("timestamp"))
    )

    def merge(acc, y):
        new_l = F.lit(a) * y + F.lit(one_a) * (acc["l"] + acc["b"])
        err = y - (acc["l"] + acc["b"])  # one-step-ahead residual
        return F.struct(
            new_l.alias("l"),
            (F.lit(b_) * (new_l - acc["l"]) + F.lit(one_b) * acc["b"]).alias(
                "b"
            ),
            (acc["sse"] + err * err).alias("sse"),
        )

    fitted = (
        pts.where(F.size("p") >= 2)
        .withColumn("ys", ys)
        .withColumn("tus", tus)
        .withColumn(
            "acc",
            F.aggregate(
                F.slice(F.col("ys"), 2, F.greatest(F.size("ys") - 1, F.lit(0))),
                F.struct(
                    F.element_at("ys", 1).alias("l"),
                    F.lit(0.0).alias("b"),
                    F.lit(0.0).alias("sse"),
                ),
                merge,
            ),
        )
        .select(
            "series_id",
            F.col("acc.l").alias("level"),
            F.col("acc.b").alias("trend"),
            F.col("acc.sse").alias("sse"),
            F.element_at("tus", -1).alias("last_us"),
            F.expr(
                "(element_at(tus, -1) - element_at(tus, 1)) div (size(tus) - 1)"
            ).alias("iv_us"),
            F.size("tus").cast("bigint").alias("n_obs"),
        )
    )
    return [
        {
            "series_id": r["series_id"],
            "level": float(r["level"]),
            "trend": float(r["trend"]),
            "sse": float(r["sse"]),
            "last_us": int(r["last_us"]),
            "iv_us": int(r["iv_us"]),
            "n_obs": int(r["n_obs"]),
        }
        for r in fitted.collect()
    ]


FORECAST_CONFIDENCE_LEVEL = 0.95
FORECAST_Z = 1.96  # two-sided 95% normal quantile


def forecast_frame(
    spark: SparkSession, state: list[dict], horizon: int
) -> DataFrame:
    """Expand the per-series state into h forecast rows each:
    (series_id, step, forecast_ts_us, forecast_value, standard_error,
    confidence_level, prediction_interval_lower_bound, ..._upper_bound).

    Intervals are Holt's additive-error bands: the one-step residual
    RMSE from the fit grows with sqrt(h), bounds are forecast +/- z *
    sigma * sqrt(h) — deterministic arithmetic over the fit state, so
    the DuckDB oracle certifies the bounds value-for-value (BigQuery's
    ML.FORECAST emits the same four interval columns)."""
    st = spark.createDataFrame(
        [
            (
                s["series_id"],
                s["level"],
                s["trend"],
                s["sse"],
                s["last_us"],
                s["iv_us"],
                s["n_obs"],
            )
            for s in state
        ],
        "series_id string, level double, trend double, sse double, "
        "last_us bigint, iv_us bigint, n_obs bigint",
    )
    point = F.col("level") + F.col("step") * F.col("trend")
    se = F.sqrt(F.col("sse") / (F.col("n_obs") - 1)) * F.sqrt(F.col("step"))
    return st.select(
        "series_id",
        F.explode(F.sequence(F.lit(1), F.lit(int(horizon)))).alias("step"),
        "level",
        "trend",
        "sse",
        "last_us",
        "iv_us",
        "n_obs",
    ).select(
        "series_id",
        "step",
        (F.col("last_us") + F.col("step") * F.col("iv_us")).alias(
            "forecast_ts_us"
        ),
        F.round(point, 6).alias("forecast_value"),
        F.round(se, 6).alias("standard_error"),
        F.lit(FORECAST_CONFIDENCE_LEVEL).alias("confidence_level"),
        F.round(point - F.lit(FORECAST_Z) * se, 6).alias(
            "prediction_interval_lower_bound"
        ),
        F.round(point + F.lit(FORECAST_Z) * se, 6).alias(
            "prediction_interval_upper_bound"
        ),
    )


_ML_FORECAST_RE = re.compile(
    r"ML\.FORECAST\s*\(\s*MODEL\s+`?([\w.\-]+)`?\s*"
    r"(?:,\s*STRUCT\s*\(\s*(\d+)\s+AS\s+horizon\s*\))?\s*\)",
    re.IGNORECASE,
)


def rewrite_ml_forecast(spark: SparkSession, stmt: str, registry) -> str:
    """Replace ML.FORECAST(MODEL m [, STRUCT(n AS horizon)]) with a temp
    view of the forecast rows."""
    counter = [0]

    def repl(m: re.Match) -> str:
        name, h = m.group(1), m.group(2)
        meta = registry.load_meta(name)
        horizon = int(h) if h else int(meta.get("horizon", 10))
        df = forecast_frame(spark, meta["state"], horizon)
        counter[0] += 1
        view = f"__ml_forecast_{counter[0]}"
        df.createOrReplaceTempView(view)
        return view

    return _ML_FORECAST_RE.sub(repl, stmt)


# z-scores for the supported anomaly_prob_threshold values (two-sided
# normal quantiles); BigQuery accepts any probability — the engine
# supports this table and errors otherwise (documented)
ANOMALY_Z = {0.9: 1.6449, 0.95: 1.96, 0.99: 2.5758}

_STRUCT_THRESHOLD_RE = re.compile(
    r"STRUCT\s*\(\s*([0-9.]+)\s+AS\s+anomaly_prob_threshold\s*\)",
    re.IGNORECASE,
)


def detect_anomalies_frame(
    spark: SparkSession,
    state: list[dict],
    data: DataFrame,
    ts_col: str,
    y_col: str,
    id_col: str | None,
    threshold: float,
) -> DataFrame:
    """Flag rows whose value falls outside the z * sigma band around the
    model's linear extrapolation at that timestamp; sigma is the
    one-step-ahead residual RMSE from the fit."""
    if threshold not in ANOMALY_Z:
        raise ValueError(
            f"anomaly_prob_threshold must be one of {sorted(ANOMALY_Z)}"
        )
    z = ANOMALY_Z[threshold]
    st = spark.createDataFrame(
        [
            (
                s["series_id"],
                s["level"],
                s["trend"],
                s["sse"],
                s["last_us"],
                s["iv_us"],
                s["n_obs"],
            )
            for s in state
        ],
        "series_id string, level double, trend double, sse double, "
        "last_us bigint, iv_us bigint, n_obs bigint",
    )
    sid = F.col(id_col).cast("string") if id_col else F.lit("__all__")
    rows = data.select(
        sid.alias("series_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
        F.col(y_col).cast("double").alias("y"),
    )
    j = rows.join(F.broadcast(st), "series_id")
    h = (F.col("ts_us") - F.col("last_us")).cast("double") / F.col("iv_us")
    expected = F.col("level") + h * F.col("trend")
    sigma = F.sqrt(F.col("sse") / (F.col("n_obs") - 1))
    return j.select(
        "series_id",
        "ts_us",
        F.round("y", 6).alias("value"),
        F.round(expected, 6).alias("expected_value"),
        F.round(F.lit(z) * sigma, 6).alias("band"),
        (F.abs(F.col("y") - expected) > F.lit(z) * sigma).alias(
            "is_anomaly"
        ),
    )


def rewrite_ml_detect_anomalies(
    spark: SparkSession, stmt: str, registry
) -> str:
    """Replace ML.DETECT_ANOMALIES(MODEL m, STRUCT(p AS
    anomaly_prob_threshold), (query)) with a temp view. Uses the
    balanced-paren call scanner — a non-greedy regex would truncate
    inner queries containing "))"."""
    from .sql_ml import _inner_query, _sub_ml_table_calls

    counter = [0]

    def handler(name: str, args: list[str]) -> str:
        if len(args) != 2:
            raise ValueError(
                "ML.DETECT_ANOMALIES expects (MODEL m, STRUCT(p AS "
                "anomaly_prob_threshold), (query))"
            )
        ms = _STRUCT_THRESHOLD_RE.match(args[0])
        if not ms:
            raise ValueError(f"bad anomaly threshold arg: {args[0]!r}")
        p = float(ms.group(1))
        meta = registry.load_meta(name)
        df = spark.sql(_inner_query(args[1]))
        cols = meta.get("detect_cols", {})
        out = detect_anomalies_frame(
            spark,
            meta["state"],
            df,
            cols.get("ts", "ts"),
            cols.get("y", "y"),
            cols.get("id"),
            p,
        )
        counter[0] += 1
        view = f"__ml_detect_{counter[0]}"
        out.createOrReplaceTempView(view)
        return view

    return _sub_ml_table_calls(stmt, "ML.DETECT_ANOMALIES", handler)
