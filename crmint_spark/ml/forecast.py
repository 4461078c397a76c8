"""BQML time-series surface: ``CREATE MODEL ... MODEL_TYPE='ARIMA_PLUS'``
and ``ML.FORECAST``.

BigQuery's ARIMA_PLUS is a proprietary auto-ARIMA ensemble; the engine
substitutes **Holt's linear exponential smoothing** (level + trend,
fixed alpha/beta) — a classical forecaster whose fit is a single
deterministic left fold over each ordered series, so the whole path is
reproducible in ANSI SQL and the DuckDB oracle certifies forecasts
value-for-value. Documented divergence: no seasonality/holiday/anomaly
decomposition, no prediction intervals (``standard_error`` is omitted
from the output).

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
        return F.struct(
            new_l.alias("l"),
            (F.lit(b_) * (new_l - acc["l"]) + F.lit(one_b) * acc["b"]).alias(
                "b"
            ),
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
                    F.element_at("ys", 1).alias("l"), F.lit(0.0).alias("b")
                ),
                merge,
            ),
        )
        .select(
            "series_id",
            F.col("acc.l").alias("level"),
            F.col("acc.b").alias("trend"),
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
            "last_us": int(r["last_us"]),
            "iv_us": int(r["iv_us"]),
            "n_obs": int(r["n_obs"]),
        }
        for r in fitted.collect()
    ]


def forecast_frame(
    spark: SparkSession, state: list[dict], horizon: int
) -> DataFrame:
    """Expand the per-series state into h forecast rows each:
    (series_id, step, forecast_ts_us, forecast_value)."""
    st = spark.createDataFrame(
        [
            (s["series_id"], s["level"], s["trend"], s["last_us"], s["iv_us"])
            for s in state
        ],
        "series_id string, level double, trend double, "
        "last_us bigint, iv_us bigint",
    )
    return st.select(
        "series_id",
        F.explode(F.sequence(F.lit(1), F.lit(int(horizon)))).alias("step"),
        "level",
        "trend",
        "last_us",
        "iv_us",
    ).select(
        "series_id",
        "step",
        (F.col("last_us") + F.col("step") * F.col("iv_us")).alias(
            "forecast_ts_us"
        ),
        F.round(
            F.col("level") + F.col("step") * F.col("trend"), 6
        ).alias("forecast_value"),
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
