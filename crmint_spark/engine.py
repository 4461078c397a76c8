"""Engine facade: the one-object API a reference user switches to.

Wraps the control plane (pipelines, schedules, ML-model configs) the way
the reference's Flask API does (ref: backend/controller/pipeline/
views.py, ml_model/views.py:335-356, starter/views.py:34-80), minus the
HTTP: import/export pipeline JSON, run by name, scheduled sweep, and
ML-model registration that materializes the compiled pipelines.
"""

from __future__ import annotations

import json
from datetime import datetime
from typing import Any

from pyspark.sql import SparkSession

from .catalog import Catalog
from .cron import cron_matches
from .ml.compiler import Compiler, MlModelConfig
from .pipeline import JobRun, Pipeline, PipelineRunner, Status
from .workers.base import WorkerContext


class Engine:
    def __init__(
        self,
        spark: SparkSession,
        warehouse_root: str,
        transport: Any = None,
        global_params: dict[str, Any] | None = None,
    ):
        self.spark = spark
        self.catalog = Catalog(spark, warehouse_root)
        self.ctx = WorkerContext(
            spark=spark, catalog=self.catalog, transport=transport
        )
        self.global_params = global_params or {}
        self.runner = PipelineRunner(self.ctx, self.global_params)
        self.pipelines: dict[str, Pipeline] = {}
        self.schedules: dict[str, list[str]] = {}
        self.run_on_schedule: dict[str, bool] = {}
        # per-pipeline in-flight state for start_async/stop
        self._active: dict[str, PipelineRunner] = {}
        self._threads: dict[str, Any] = {}
        self._results: dict[str, dict[str, JobRun]] = {}

    # -- pipeline CRUD (ref: pipeline/views.py) ---------------------------
    def add_pipeline(
        self,
        pipeline: Pipeline,
        schedules: list[str] | None = None,
        run_on_schedule: bool = False,
    ) -> None:
        self.pipelines[pipeline.name] = pipeline
        self.schedules[pipeline.name] = schedules or []
        self.run_on_schedule[pipeline.name] = run_on_schedule

    def import_pipeline(self, data: dict | str, **kw) -> Pipeline:
        """Accepts the reference's export JSON (dict or string)."""
        if isinstance(data, str):
            data = json.loads(data)
        p = Pipeline.from_json(data)
        self.add_pipeline(p, **kw)
        return p

    def export_pipeline(self, name: str) -> dict:
        return self.pipelines[name].to_json()

    # -- execution --------------------------------------------------------
    def start(self, name: str) -> dict[str, JobRun]:
        return self.runner.run(self.pipelines[name])

    def status(self, runs: dict[str, JobRun]) -> Status:
        return PipelineRunner.pipeline_status(runs)

    def start_async(self, name: str) -> None:
        """Background start, the reference's enqueue-and-return shape
        (ref: pipeline/views.py start → task queue). Each run gets its
        own PipelineRunner so concurrent pipelines don't share stop
        state; results land in ``wait(name)``."""
        import threading

        pipeline = self.pipelines[name]
        runner = PipelineRunner(self.ctx, self.global_params)
        self._active[name] = runner
        self._results.pop(name, None)

        def _run() -> None:
            try:
                self._results[name] = runner.run(pipeline)
            finally:
                self._active.pop(name, None)

        t = threading.Thread(target=_run, daemon=True)
        self._threads[name] = t
        t.start()

    def stop(self, name: str, cancel_spark_jobs: bool = False) -> bool:
        """Reference ``Pipeline.stop`` (models.py:252-259) over the
        in-flight run; False when the pipeline isn't running."""
        runner = self._active.get(name)
        return bool(runner and runner.stop(cancel_spark_jobs=cancel_spark_jobs))

    def wait(self, name: str, timeout: float | None = None) -> dict[str, JobRun] | None:
        """Join a start_async run; returns its job results (None while
        still running)."""
        t = self._threads.get(name)
        if t is not None:
            t.join(timeout)
        return self._results.get(name)

    def start_scheduled(self, when: datetime | None = None) -> dict[str, dict[str, JobRun]]:
        """The scheduled-start sweep (ref: starter/views.py:34-80):
        every run_on_schedule pipeline whose cron matches ``when``."""
        when = when or datetime.now()
        results: dict[str, dict[str, JobRun]] = {}
        for name, crons in self.schedules.items():
            if not self.run_on_schedule.get(name):
                continue
            if any(cron_matches(c, when) for c in crons):
                results[name] = self.start(name)
        return results

    # -- ML models (ref: ml_model/views.py:335-356) -----------------------
    def register_ml_model(self, config: MlModelConfig) -> tuple[str, str]:
        """Builds + registers the training and predictive pipelines;
        returns their names."""
        compiler = Compiler(config)
        train_p, train_cron = compiler.build_training_pipeline()
        pred_p, pred_cron = compiler.build_predictive_pipeline()
        self.add_pipeline(train_p, [train_cron], run_on_schedule=True)
        self.add_pipeline(pred_p, [pred_cron], run_on_schedule=True)
        return train_p.name, pred_p.name
