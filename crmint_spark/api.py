"""Thin REST facade over the Engine — the reference's Flask API surface
(ref: backend/controller/app.py:32-51 blueprints; pipeline endpoints
pipeline/views.py:150-275; ml-model endpoints ml_model/views.py:335-356;
worker catalog jobs_app.py) collapsed onto the in-process engine.

Process model note: the reference splits controller/jobs across two
services glued by Pub/Sub; here execution is synchronous in-process, so
``POST /api/pipelines/<name>/start`` returns the final per-job statuses
directly (the reference's client polls for them).
"""

from __future__ import annotations

from flask import Flask, jsonify, request

from .engine import Engine
from .ml.compiler import MlModelConfig, Timespans, Variable
from .workers import WORKERS


def create_app(engine: Engine) -> Flask:
    app = Flask("crmint_spark")

    @app.get("/api/workers")
    def list_workers():
        out = {}
        for name, cls in WORKERS.items():
            out[name] = [
                {"name": p[0], "type": p[1], "required": p[2], "default": p[3]}
                for p in cls.PARAMS
            ]
        return jsonify(out)

    @app.get("/api/pipelines")
    def list_pipelines():
        return jsonify(
            [
                {
                    "name": name,
                    "schedules": engine.schedules.get(name, []),
                    "run_on_schedule": engine.run_on_schedule.get(name, False),
                    "n_jobs": len(p.jobs),
                }
                for name, p in engine.pipelines.items()
            ]
        )

    @app.post("/api/pipelines")
    def import_pipeline():
        data = request.get_json(force=True)
        schedules = data.pop("schedules", [])
        run_on_schedule = data.pop("run_on_schedule", False)
        p = engine.import_pipeline(
            data, schedules=schedules, run_on_schedule=run_on_schedule
        )
        return jsonify({"name": p.name, "n_jobs": len(p.jobs)}), 201

    @app.get("/api/pipelines/<name>")
    def export_pipeline(name: str):
        if name not in engine.pipelines:
            return jsonify({"error": "not found"}), 404
        return jsonify(engine.export_pipeline(name))

    @app.post("/api/pipelines/<name>/start")
    def start_pipeline(name: str):
        if name not in engine.pipelines:
            return jsonify({"error": "not found"}), 404
        runs = engine.start(name)
        return jsonify(
            {
                "status": engine.status(runs).value,
                "jobs": {
                    jname: {"status": r.status.value, "error": r.error}
                    for jname, r in runs.items()
                },
            }
        )

    @app.post("/api/pipelines/<name>/stop")
    def stop_pipeline(name: str):
        """Reference POST /pipelines/<id>/stop (ref: pipeline/views.py,
        models.py:252-259): False when the pipeline has no run in
        flight."""
        if name not in engine.pipelines:
            return jsonify({"error": "not found"}), 404
        stopped = engine.stop(
            name,
            cancel_spark_jobs=bool(
                (request.get_json(silent=True) or {}).get("cancel_spark_jobs")
            ),
        )
        return jsonify({"stopped": stopped})

    @app.post("/api/ml-models")
    def register_ml_model():
        data = request.get_json(force=True)
        config = MlModelConfig(
            name=data["name"],
            model_type=data.get("model_type", "LOGISTIC_REG"),
            unique_id=data.get("unique_id", "user_id"),
            variables=[
                Variable(
                    v["name"],
                    v["role"],
                    comparison=v.get("comparison"),
                    value=v.get("value"),
                )
                for v in data.get("variables", [])
            ],
            hyperparams=data.get("hyperparams", {}),
            timespans=Timespans(**data.get("timespans", {})),
            class_imbalance=data.get("class_imbalance", 4),
            conversion_rate_segments=data.get("conversion_rate_segments", 10),
            dataset=data.get("dataset", "crmint.models"),
        )
        tname, pname = engine.register_ml_model(config)
        return (
            jsonify({"training_pipeline": tname, "predictive_pipeline": pname}),
            201,
        )

    return app
