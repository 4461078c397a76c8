"""The Phase-0 acceptance slice (SURVEY §7): run the reference's OWN
sample pipeline JSON (docs/pipelines/bqml/train_evaluate_model.json)
unchanged through the engine — legacy `{% VAR %}` templating, BQMLTrainer
with CREATE MODEL (linear_reg, FARM_FINGERPRINT hash split), and
BQQueryLauncher with an ML.EVALUATE query writing to a 3-part bq_*_id
destination.

The BigQuery public table it reads is replaced by a synthetic stand-in
registered under the same (sanitized) name; everything else is verbatim.
"""

from __future__ import annotations

import json
import os
import random
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crmint_spark.catalog import _safe_view_name  # noqa: E402
from crmint_spark.engine import Engine  # noqa: E402
from crmint_spark.pipeline import Status  # noqa: E402

REF_JSON = "/root/reference/docs/pipelines/bqml/train_evaluate_model.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_JSON), reason="reference checkout not present"
)


@pytest.fixture()
def stand_in_table(spark):
    """Synthetic rows matching the public real-estate table's columns."""
    random.seed(3)
    rows = []
    for i in range(400):
        surface = random.uniform(20, 300)
        rooms = random.randint(1, 8)
        price = surface * 2500 + rooms * 10000 + random.uniform(-5e4, 5e4)
        rows.append(
            (
                f"prop{i}",
                random.choice(["house", "apartment"]),
                random.choice(["SP", "RJ"]),
                float(price),
                float(surface),
                rooms,
                "x" * random.randint(10, 200),
                "BRL",
            )
        )
    df = spark.createDataFrame(
        rows,
        "id string, property_type string, state_name string, price double, "
        "surface_covered_in_m2 double, rooms int, description string, "
        "currency string",
    )
    view = _safe_view_name("properati-data-public.properties_br.properties_sell_201802")
    df.createOrReplaceTempView(view)
    return view


def test_reference_sample_pipeline_runs_unchanged(spark, tmp_path, stand_in_table):
    with open(REF_JSON) as f:
        data = json.load(f)
    eng = Engine(spark, str(tmp_path / "wh"))
    pipeline = eng.import_pipeline(data)
    assert [j.worker_class for j in pipeline.jobs.values()] == [
        "BQMLTrainer",
        "BQQueryLauncher",
    ]
    runs = eng.start(pipeline.name)
    assert eng.status(runs) == Status.SUCCEEDED, {
        k: (v.status, v.error) for k, v in runs.items()
    }
    # the evaluate job wrote metrics to {BQ_DATASET}.price_model_evaluation
    out = eng.catalog.read("predict_realestate_brasil.price_model_evaluation")
    row = out.first()
    assert row.rmse is not None and row.r2 is not None
    assert row.r2 > 0.5  # linear data -> linear_reg must fit decently

    # the second sample pipeline (predict.json): ML.PREDICT + empty
    # OVER() + 3-part destination, reusing the model just trained
    with open(os.path.join(os.path.dirname(REF_JSON), "predict.json")) as f:
        pdata = json.load(f)
    ppipe = eng.import_pipeline(pdata)
    runs = eng.start(ppipe.name)
    assert eng.status(runs) == Status.SUCCEEDED, {
        k: (v.status, v.error) for k, v in runs.items()
    }
    preds = eng.catalog.read("predict_realestate_brasil.predictions")
    assert preds.count() > 0
    assert "predicted_value" in preds.columns
    assert "row_number" in preds.columns
