"""ML compiler tests: golden-SQL fragments (the reference's
ml_model_templates_compiler_tests.py shape) + full end-to-end runs of
the generated training and predictive pipelines on driver testdata."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crmint_spark.catalog import Catalog, load  # noqa: E402
from crmint_spark.ml.compiler import (  # noqa: E402
    Compiler,
    MlModelConfig,
    Timespans,
    Variable,
)
from crmint_spark.pipeline import PipelineRunner, Status  # noqa: E402
from crmint_spark.workers.base import WorkerContext  # noqa: E402
from crmint_spark.workers.transports import FileRecordingTransport  # noqa: E402


@pytest.fixture()
def config():
    return MlModelConfig(
        name="propensity",
        model_type="LOGISTIC_REG",
        unique_id="user_id",
        variables=[
            Variable("view", "FEATURE", comparison="EQUAL", value="view"),
            Variable("click", "FEATURE", comparison="EQUAL", value="click"),
            Variable("signup", "FEATURE", comparison="EQUAL", value="signup"),
            Variable("purchase", "LABEL", comparison="EQUAL", value="purchase"),
        ],
        timespans=Timespans(training_days=30, predictive_days=1),
        class_imbalance=0,
        conversion_rate_segments=5,
        dataset="p.models",
    )


# -- golden-SQL fragments ---------------------------------------------------


def test_training_dataset_sql_fragments(config):
    sql = Compiler(config).build_dataset_sql("train")
    assert "SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)" in sql
    assert "AS f_click" in sql
    assert "MAX(CASE WHEN event_type = 'purchase'" in sql
    assert "(unique_id * 9973 + 7) % 100 < 90" in sql  # hash split
    assert "GROUP BY user_id" in sql


def test_calibration_split_complement(config):
    sql = Compiler(config).build_dataset_sql("calibrate")
    assert "(unique_id * 9973 + 7) % 100 >= 90" in sql


def test_rebalancing_union(config):
    config.class_imbalance = 4
    sql = Compiler(config).build_dataset_sql("train")
    assert "UNION ALL" in sql
    assert "% 4 = 0" in sql


def test_conversion_values_sql(config):
    sql = Compiler(config).conversion_values_sql("__predictions__")
    assert "NTILE(5) OVER (ORDER BY probability ASC" in sql
    assert "LAG(mx) OVER (ORDER BY segment)" in sql
    assert "LEAD(mn) OVER (ORDER BY segment)" in sql


def test_output_sql_range_join(config):
    sql = Compiler(config).output_sql("__predictions__", "__cv__")
    assert "p.probability >= cv.probability_range_start" in sql
    assert "p.probability <= cv.probability_range_end" in sql
    assert "AS normalized_score" in sql


def test_pipeline_shapes_and_crons(config):
    train_p, train_cron = Compiler(config).build_training_pipeline()
    pred_p, pred_cron = Compiler(config).build_predictive_pipeline()
    assert train_cron == "0 0 1 1,4,7,10 *"  # quarterly
    assert pred_cron == "0 0 * * *"  # daily
    assert list(train_p.jobs) == [
        "build_training_dataset",
        "train_model",
        "build_calibration_dataset",
        "score_calibration",
        "conversion_values",
    ]
    assert list(pred_p.jobs) == [
        "build_scoring_dataset",
        "predict",
        "output",
        "upload",
    ]
    # regression drops the conversion-value chain (ref: compiler.py:41-47)
    config.model_type = "LINEAR_REG"
    config.variables.append(Variable("spend", "FIRST_VALUE", value="purchase"))
    reg_p, _ = Compiler(config).build_training_pipeline()
    assert list(reg_p.jobs) == ["build_training_dataset", "train_model"]


# -- end-to-end -------------------------------------------------------------


def test_training_and_predictive_pipelines_end_to_end(spark, tmp_path, config):
    ctx = WorkerContext(spark=spark, catalog=Catalog(spark, str(tmp_path / "wh")))
    rec = FileRecordingTransport(str(tmp_path / "mp"))
    ctx.transport = rec
    # events table registered under its bare name for the dataset SQL
    load(spark, "/root/testdata/sf0.001", "events").createOrReplaceTempView("events")

    runner = PipelineRunner(ctx)
    train_p, _ = Compiler(config).build_training_pipeline()
    runs = runner.run(train_p)
    assert {r.status for r in runs.values()} == {Status.SUCCEEDED}, {
        k: (v.status, v.error) for k, v in runs.items()
    }
    cv = ctx.catalog.read("p.models.propensity_conversion_values")
    # sf0.001 has ~15 users; the 10% calibration split may underfill the
    # 5 segments — NTILE emits only as many non-empty buckets as rows
    assert 1 <= cv.count() <= 5
    cols = set(cv.columns)
    assert {"normalized_probability", "value",
            "probability_range_start", "probability_range_end"} <= cols

    pred_p, _ = Compiler(config).build_predictive_pipeline()
    runs = runner.run(pred_p)
    assert {r.status for r in runs.values()} == {Status.SUCCEEDED}, {
        k: (v.status, v.error) for k, v in runs.items()
    }
    out = ctx.catalog.read("p.models.propensity_output")
    assert out.count() > 0
    batches = rec.read_batches()
    assert sum(len(b) for b in batches) > 0


def test_ads_destination_pipeline_end_to_end(spark, tmp_path, config):
    """GOOGLE_ADS_OFFLINE_CONVERSION destination: upload goes through
    BQToAdsOfflineClickConversion with the ClickConversion template and
    output rows carry the first-touch gclid + RFC-3339 datetime
    (ref: predictive_pipeline.json:102-140, output.sql:104-133)."""
    from pyspark.sql import functions as F

    config.destination = "GOOGLE_ADS_OFFLINE_CONVERSION"
    config.output_parameters = {
        "customer_id": "123-456",
        "conversion_action_id": "789",
    }
    ctx = WorkerContext(spark=spark, catalog=Catalog(spark, str(tmp_path / "wh")))
    rec = FileRecordingTransport(str(tmp_path / "ads"))
    ctx.transport = rec
    # seed every event with a deterministic per-user gclid
    ev = load(spark, "/root/testdata/sf0.001", "events").withColumn(
        "props",
        F.concat(F.lit('{"gclid": "g'), F.col("user_id"), F.lit('"}')),
    )
    ev.createOrReplaceTempView("events")

    runner = PipelineRunner(ctx)
    runs = runner.run(Compiler(config).build_training_pipeline()[0])
    assert {r.status for r in runs.values()} == {Status.SUCCEEDED}
    pred_p, _ = Compiler(config).build_predictive_pipeline()
    assert pred_p.jobs["upload"].worker_class == "BQToAdsOfflineClickConversion"
    runs = runner.run(pred_p)
    assert {r.status for r in runs.values()} == {Status.SUCCEEDED}, {
        k: (v.status, v.error) for k, v in runs.items()
    }
    out = ctx.catalog.read("p.models.propensity_output")
    assert out.count() > 0
    row = out.first()
    assert row["gclid"].startswith("g") and "+" in row["datetime"] or row[
        "datetime"
    ].endswith("Z")
    payloads = [p for b in rec.read_batches() for p in b]
    assert payloads, "no conversions uploaded"
    # the ads sink wraps each request under "conversions" (<=2000/request)
    first = payloads[0]["conversions"][0]
    assert first["conversionAction"] == "customers/123-456/conversionActions/789"
    assert first["gclid"].startswith("g")
    assert first["currencyCode"] == "USD"


def test_regression_predictive_pipeline_end_to_end(spark, tmp_path, config):
    """LINEAR_REG: no conversion-values chain; output clamps the
    predicted value at 0 and doubles it as value/revenue; the MP upload
    sends revenue instead of score (ref: output.sql:57-67,
    google_analytics_mp_event.json:18-20)."""
    config.model_type = "LINEAR_REG"
    config.variables = [
        v for v in config.variables if v.role == "FEATURE"
    ] + [Variable("spend", "FIRST_VALUE", value="purchase")]
    ctx = WorkerContext(spark=spark, catalog=Catalog(spark, str(tmp_path / "wh")))
    rec = FileRecordingTransport(str(tmp_path / "mp"))
    ctx.transport = rec
    load(spark, "/root/testdata/sf0.001", "events").createOrReplaceTempView("events")

    runner = PipelineRunner(ctx)
    runs = runner.run(Compiler(config).build_training_pipeline()[0])
    assert {r.status for r in runs.values()} == {Status.SUCCEEDED}, {
        k: (v.status, v.error) for k, v in runs.items()
    }
    pred_p, _ = Compiler(config).build_predictive_pipeline()
    runs = runner.run(pred_p)
    assert {r.status for r in runs.values()} == {Status.SUCCEEDED}, {
        k: (v.status, v.error) for k, v in runs.items()
    }
    out = ctx.catalog.read("p.models.propensity_output")
    rows = out.collect()
    assert rows and all(r["value"] >= 0 and r["value"] == r["revenue"] for r in rows)
    payloads = [p for b in rec.read_batches() for p in b]
    params = payloads[0]["events"][0]["params"]
    assert "revenue" in params and "score" not in params


def test_first_party_dataset_sql(config):
    """First-party variables read table columns directly; mixed mode
    joins them to event aggregates on the unique id
    (ref: model_bqml.sql:53-69, 201-211)."""
    config.first_party_table = "crm.fp.users"
    config.variables = [
        Variable("lifetime_value", "FEATURE", source="first_party"),
        Variable("tier", "FEATURE", source="first_party"),
        Variable("converted", "LABEL", source="first_party"),
    ]
    sql = Compiler(config).build_dataset_sql("train")
    assert "lifetime_value AS f_lifetime_value" in sql
    assert "CAST(converted AS INT) AS label" in sql
    assert "FROM crm.fp.users" in sql
    assert "GROUP BY" not in sql  # no event aggregation in fp-only mode

    # mixed: events feature + first-party label/features
    config.variables.append(
        Variable("click", "FEATURE", comparison="EQUAL", value="click")
    )
    sql = Compiler(config).build_dataset_sql("train")
    assert "FROM fp JOIN ev USING (unique_id)" in sql
    assert "SUM(CASE WHEN event_type = 'click'" in sql
    assert "tier AS f_tier" in sql

    # fp variables without a table is a config error
    config.first_party_table = None
    with pytest.raises(ValueError, match="first_party_table"):
        Compiler(config).build_dataset_sql("train")


def test_first_party_pipeline_end_to_end(spark, tmp_path, config):
    """First-party-only training + prediction over a synthetic CRM
    table: columns in, label passthrough, same split/score/upload
    machinery."""
    from pyspark.sql import functions as F

    ctx = WorkerContext(spark=spark, catalog=Catalog(spark, str(tmp_path / "wh")))
    rec = FileRecordingTransport(str(tmp_path / "mp"))
    ctx.transport = rec
    # derive a deterministic first-party table from events
    ev = load(spark, "/root/testdata/sf0.001", "events")
    fp = ev.groupBy("user_id").agg(
        F.round(F.sum("value"), 2).alias("lifetime_value"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (F.max((F.col("event_type") == "purchase").cast("int"))).alias("converted"),
    )
    ctx.catalog.write(fp, "crm.fp.users")
    ev.createOrReplaceTempView("events")
    fp_view = ctx.catalog.register("crm.fp.users")
    spark.table(fp_view).createOrReplaceTempView("fp_users")

    config.first_party_table = "fp_users"
    config.variables = [
        Variable("lifetime_value", "FEATURE", source="first_party"),
        Variable("n_events", "FEATURE", source="first_party"),
        Variable("converted", "LABEL", source="first_party"),
    ]
    runner = PipelineRunner(ctx)
    runs = runner.run(Compiler(config).build_training_pipeline()[0])
    assert {r.status for r in runs.values()} == {Status.SUCCEEDED}, {
        k: (v.status, v.error) for k, v in runs.items()
    }
    runs = runner.run(Compiler(config).build_predictive_pipeline()[0])
    assert {r.status for r in runs.values()} == {Status.SUCCEEDED}, {
        k: (v.status, v.error) for k, v in runs.items()
    }
    assert ctx.catalog.read("p.models.propensity_output").count() > 0


def test_output_excludes_already_scored_users(spark, tmp_path, config):
    """Users who already carry the score event are dropped from the MP
    output (ref: output.sql:70-90 users_without_score)."""
    from pyspark.sql import functions as F

    ctx = WorkerContext(spark=spark, catalog=Catalog(spark, str(tmp_path / "wh")))
    ctx.transport = FileRecordingTransport(str(tmp_path / "mp"))
    ev = load(spark, "/root/testdata/sf0.001", "events")
    # seed: user with the smallest id already has a prob_propensity event
    scored_uid = ev.agg(F.min("user_id")).first()[0]
    seeded = ev.unionByName(
        ev.limit(1).select(
            F.lit(999999).alias("event_id"),
            F.col("ts"),
            F.lit(scored_uid).alias("user_id"),
            F.lit("prob_propensity").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit("{}").alias("props"),
        )
    )
    seeded.createOrReplaceTempView("events")
    runner = PipelineRunner(ctx)
    runs = runner.run(Compiler(config).build_training_pipeline()[0])
    assert {r.status for r in runs.values()} == {Status.SUCCEEDED}
    runs = runner.run(Compiler(config).build_predictive_pipeline()[0])
    assert {r.status for r in runs.values()} == {Status.SUCCEEDED}, {
        k: (v.status, v.error) for k, v in runs.items()
    }
    out = ctx.catalog.read("p.models.propensity_output")
    assert out.count() > 0
    assert out.filter(F.col("client_id") == scored_uid).count() == 0


def test_timespan_windows_anchor_at_snapshot(spark, tmp_path, config):
    """as_of_date anchors training/exclusion/predictive windows on the
    event date (ref: shared.py Timespan + model_bqml.sql:91-94)."""
    config.as_of_date = "2024-01-30"
    config.timespans = Timespans(
        training_days=20, predictive_days=5, exclusion_days=2
    )
    train_sql = Compiler(config).build_dataset_sql("train")
    assert (
        "BETWEEN DATE_SUB(DATE_SUB(DATE '2024-01-30', 2), 20) "
        "AND DATE_SUB(DATE '2024-01-30', 2)" in train_sql
    )
    score_sql = Compiler(config).build_dataset_sql("all")
    assert (
        "BETWEEN DATE_SUB(DATE_SUB(DATE '2024-01-30', 0), 5) "
        "AND DATE_SUB(DATE '2024-01-30', 0)" in score_sql
    )
    # windows actually restrict rows: the 5-day scoring window sees
    # fewer distinct users' events than the whole table at sf0.001
    load(spark, "/root/testdata/sf0.001", "events").createOrReplaceTempView("events")
    whole = spark.sql(Compiler(MlModelConfig(
        name="propensity", variables=config.variables, class_imbalance=0,
    )).build_dataset_sql("all")).count()
    windowed = spark.sql(score_sql).count()
    assert 0 < windowed <= whole
    narrow = spark.sql(train_sql).count()
    assert 0 < narrow  # 20-day window still populated
