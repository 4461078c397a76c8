"""BQML-in-SQL interception tests: the model_bqml.sql statement shapes
running end-to-end through SparkSQLExecutor."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crmint_spark.catalog import Catalog  # noqa: E402
from crmint_spark.workers import find_worker  # noqa: E402
from crmint_spark.workers.base import WorkerContext  # noqa: E402


@pytest.fixture()
def ctx(spark, tmp_path):
    c = WorkerContext(spark=spark, catalog=Catalog(spark, str(tmp_path / "wh")))
    import random

    random.seed(11)
    rows = []
    for i in range(300):
        x1, x2 = random.random(), random.random()
        rows.append((i, float(x1), float(x2), 1 if x1 + x2 > 1 else 0, x1 * 3 + x2))
    df = spark.createDataFrame(
        rows, "uid long, x1 double, x2 double, label int, target double"
    )
    df.createOrReplaceTempView("training_data")
    return c


def _run(ctx, script):
    w = find_worker("BQScriptExecutor")({"script": script, "dry_run": False}, ctx)
    w.execute()
    return w


def test_create_model_and_predict(ctx):
    w = _run(
        ctx,
        """
        CREATE OR REPLACE MODEL `p.d.clf`
        OPTIONS(MODEL_TYPE='LOGISTIC_REG', INPUT_LABEL_COLS=['label'],
                MAX_ITERATIONS=25) AS (
          SELECT x1, x2, label FROM training_data
        );
        SELECT uid, probability, predicted_label
        FROM ML.PREDICT(MODEL `p.d.clf`, (SELECT uid, x1, x2, label FROM training_data))
        """,
    )
    rows = w.result.collect()
    assert len(rows) == 300
    assert {r.predicted_label for r in rows} <= {0.0, 1.0}
    assert all(0.0 <= r.probability <= 1.0 for r in rows)
    assert "CREATE MODEL handled by Spark ML" in w.log


def test_ml_evaluate_classification(ctx):
    _run(
        ctx,
        """
        CREATE OR REPLACE MODEL `p.d.clf2`
        OPTIONS(MODEL_TYPE='LOGISTIC_REG', INPUT_LABEL_COLS=['label']) AS (
          SELECT x1, x2, label FROM training_data
        )
        """,
    )
    w = _run(
        ctx,
        "SELECT * FROM ML.EVALUATE(MODEL `p.d.clf2`, "
        "(SELECT x1, x2, label FROM training_data))",
    )
    row = w.result.first()
    assert row.roc_auc > 0.9
    assert row.accuracy > 0.8


def test_ml_regression_model(ctx):
    _run(
        ctx,
        """
        CREATE OR REPLACE MODEL `p.d.reg`
        OPTIONS(MODEL_TYPE='LINEAR_REG', INPUT_LABEL_COLS=['target']) AS (
          SELECT x1, x2, target FROM training_data
        )
        """,
    )
    w = _run(
        ctx,
        "SELECT * FROM ML.EVALUATE(MODEL `p.d.reg`, "
        "(SELECT x1, x2, target FROM training_data))",
    )
    row = w.result.first()
    assert row.rmse < 0.2
    assert row.r2 > 0.95
    w2 = _run(
        ctx,
        "SELECT uid, predicted_value FROM ML.PREDICT(MODEL `p.d.reg`, "
        "(SELECT uid, x1, x2 FROM training_data)) WHERE uid < 10",
    )
    assert w2.result.count() == 10


def test_ml_dnn_regressor_model(ctx):
    """DNN_REGRESSOR is a real MLP (ml/mlp.py): distributed-gradient
    training, JSON persistence, codegen'd-expression scoring — through
    the same CREATE MODEL / ML.EVALUATE / ML.PREDICT surface."""
    _run(
        ctx,
        """
        CREATE OR REPLACE MODEL `p.d.dnn`
        OPTIONS(MODEL_TYPE='DNN_REGRESSOR', INPUT_LABEL_COLS=['target'],
                HIDDEN_UNITS=[8], MAX_ITERATIONS=60, LEARN_RATE=0.1) AS (
          SELECT x1, x2, target FROM training_data
        )
        """,
    )
    w = _run(
        ctx,
        "SELECT * FROM ML.EVALUATE(MODEL `p.d.dnn`, "
        "(SELECT x1, x2, target FROM training_data))",
    )
    row = w.result.first()
    # target = 3*x1 + x2 (linear): the MLP must fit it closely
    assert row.r2 > 0.9, row
    w2 = _run(
        ctx,
        "SELECT uid, predicted_value FROM ML.PREDICT(MODEL `p.d.dnn`, "
        "(SELECT uid, x1, x2 FROM training_data)) WHERE uid < 10",
    )
    assert w2.result.count() == 10


def test_ml_arima_plus_forecast(ctx):
    """ARIMA_PLUS (Holt-smoothing stand-in, ml/forecast.py) through
    CREATE MODEL + ML.FORECAST: a rising linear series must forecast
    a continued rise with positive trend."""
    spark = ctx.spark
    import datetime

    rows = [
        (datetime.datetime(2024, 1, 1 + d), 100.0 + 10.0 * d)
        for d in range(20)
    ]
    spark.createDataFrame(rows, "ts timestamp, y double").createOrReplaceTempView(
        "series_data"
    )
    _run(
        ctx,
        """
        CREATE OR REPLACE MODEL `p.d.fc`
        OPTIONS(MODEL_TYPE='ARIMA_PLUS', TIME_SERIES_TIMESTAMP_COL='ts',
                TIME_SERIES_DATA_COL='y', HORIZON=3) AS (
          SELECT ts, y FROM series_data
        )
        """,
    )
    w = _run(ctx, "SELECT * FROM ML.FORECAST(MODEL `p.d.fc`)")
    rows = w.result.orderBy("step").collect()
    assert len(rows) == 3
    last_y = 100.0 + 10.0 * 19
    # monotone rising forecasts near the true line
    vals = [r["forecast_value"] for r in rows]
    assert vals[0] < vals[1] < vals[2]
    assert abs(vals[0] - (last_y + 10)) < 15
    # forecast timestamps advance by the observed 1-day interval
    assert rows[1]["forecast_ts_us"] - rows[0]["forecast_ts_us"] == 86400000000


def test_ml_arima_evaluate(ctx):
    import datetime

    spark = ctx.spark
    rows = [
        (datetime.datetime(2024, 1, 1 + d), 100.0 + 10.0 * d + (d % 2))
        for d in range(15)
    ]
    spark.createDataFrame(rows, "ts timestamp, y double").createOrReplaceTempView(
        "series_eval"
    )
    _run(
        ctx,
        """
        CREATE OR REPLACE MODEL `p.d.fce`
        OPTIONS(MODEL_TYPE='ARIMA_PLUS', TIME_SERIES_TIMESTAMP_COL='ts',
                TIME_SERIES_DATA_COL='y') AS (SELECT ts, y FROM series_eval)
        """,
    )
    w = _run(
        ctx,
        "SELECT * FROM ML.EVALUATE(MODEL `p.d.fce`, (SELECT 1))",
    )
    row = w.result.first()
    assert row["n_obs"] == 15 and row["rmse"] > 0


def test_ml_calls_with_nested_closing_parens(ctx):
    """Balanced-paren call scanning: inner queries ending in '))' (e.g.
    ROUND(SUM(x)) AS y) must not be truncated by the ML.* rewrites."""
    _run(
        ctx,
        """
        CREATE OR REPLACE MODEL `p.d.np`
        OPTIONS(MODEL_TYPE='LINEAR_REG', INPUT_LABEL_COLS=['target']) AS (
          SELECT x1, x2, target FROM training_data
        )
        """,
    )
    w = _run(
        ctx,
        "SELECT COUNT(*) AS n FROM ML.PREDICT(MODEL `p.d.np`, "
        "(SELECT uid, ROUND(ABS(x1)) AS x1, ROUND(ABS(x2)) AS x2 "
        "FROM training_data WHERE uid < ROUND(ABS(20))))",
    )
    assert w.result.first()["n"] == 20
    w2 = _run(
        ctx,
        "SELECT * FROM ML.EVALUATE(MODEL `p.d.np`, "
        "(SELECT x1, x2, ROUND(target, ABS(2)) AS target "
        "FROM training_data))",
    )
    assert w2.result.first()["rmse"] is not None
