"""REST facade tests (Flask test client) — the reference's API shapes."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crmint_spark.api import create_app  # noqa: E402
from crmint_spark.catalog import load  # noqa: E402
from crmint_spark.engine import Engine  # noqa: E402


@pytest.fixture()
def client(spark, tmp_path):
    eng = Engine(spark, str(tmp_path / "wh"))
    load(spark, "/root/testdata/sf0.001", "customer").createOrReplaceTempView(
        "customer"
    )
    app = create_app(eng)
    app.testing = True
    return app.test_client()


PIPELINE = {
    "name": "api_pipeline",
    "params": [],
    "jobs": [
        {
            "id": 1,
            "name": "agg",
            "worker_class": "SparkQueryLauncher",
            "params": [
                {
                    "name": "query",
                    "type": "sql",
                    "value": "SELECT c_mktsegment, COUNT(*) AS n FROM customer GROUP BY 1",
                },
                {"name": "destination_table", "type": "string", "value": "p.d.api_out"},
            ],
            "hash_start_conditions": [],
        }
    ],
}


def test_workers_catalog(client):
    res = client.get("/api/workers")
    assert res.status_code == 200
    names = set(res.get_json())
    assert {"BQScriptExecutor", "SparkSQLExecutor", "OperatorWorker"} <= names


def test_pipeline_crud_and_start(client):
    assert client.get("/api/pipelines").get_json() == []
    res = client.post("/api/pipelines", json=PIPELINE)
    assert res.status_code == 201
    listing = client.get("/api/pipelines").get_json()
    assert listing[0]["name"] == "api_pipeline"
    exported = client.get("/api/pipelines/api_pipeline").get_json()
    assert exported["jobs"][0]["worker_class"] == "SparkQueryLauncher"
    run = client.post("/api/pipelines/api_pipeline/start").get_json()
    assert run["status"] == "succeeded"
    assert run["jobs"]["agg"]["status"] == "succeeded"
    assert client.get("/api/pipelines/nope").status_code == 404


def test_pipeline_stop_endpoint(client):
    client.post("/api/pipelines", json=PIPELINE)
    # not running -> stopped False (ref: test_stop_fails_if_not_running)
    res = client.post("/api/pipelines/api_pipeline/stop")
    assert res.status_code == 200 and res.get_json() == {"stopped": False}
    assert client.post("/api/pipelines/nope/stop").status_code == 404


def test_engine_start_async_and_stop(spark, tmp_path):
    """Engine.start_async + stop reproduce the reference's enqueue/stop
    pair: a gated running job finishes with its natural status, its
    dependent never starts."""
    import threading

    from crmint_spark.engine import Engine
    from crmint_spark.pipeline import Pipeline, Status
    from crmint_spark.workers import WORKERS
    from crmint_spark.workers.base import Worker

    gate = threading.Event()
    started = threading.Event()

    class _EngGate(Worker):
        def _execute(self) -> None:
            started.set()
            assert gate.wait(timeout=30)

    WORKERS["EngGate"] = _EngGate
    eng = Engine(spark, str(tmp_path / "wh"))
    eng.import_pipeline(
        {
            "name": "gated",
            "jobs": [
                {"name": "slow", "worker_class": "EngGate", "params": []},
                {
                    "name": "after",
                    "worker_class": "Commenter",
                    "params": [{"name": "comment", "type": "text", "value": "x"}],
                    "hash_start_conditions": [
                        {"preceding_job": "slow", "condition": "success"}
                    ],
                },
            ],
        }
    )
    assert eng.stop("gated") is False
    eng.start_async("gated")
    assert started.wait(10)
    assert eng.stop("gated") is True
    gate.set()
    runs = eng.wait("gated", timeout=30)
    assert runs is not None
    assert runs["slow"].status == Status.SUCCEEDED
    assert runs["after"].status == Status.IDLE


def test_ml_model_registration_endpoint(client):
    res = client.post(
        "/api/ml-models",
        json={
            "name": "api_prop",
            "variables": [
                {"name": "view", "role": "FEATURE", "comparison": "EQUAL", "value": "view"},
                {"name": "purchase", "role": "LABEL", "comparison": "EQUAL", "value": "purchase"},
            ],
        },
    )
    assert res.status_code == 201
    body = res.get_json()
    assert body["training_pipeline"] == "api_prop - Training"
    listing = {p["name"]: p for p in client.get("/api/pipelines").get_json()}
    assert listing["api_prop - Training"]["run_on_schedule"] is True
