"""Worker base contract (ref: backend/jobs/workers/worker.py:34-128).

A worker declares PARAMS = [(name, type, required, default, label)],
receives rendered+typed params, and implements ``_execute``. Spark
actions are synchronous, so the reference's enqueue/waiter machinery
reduces to plain method calls; ``_enqueue`` is kept for workers that
fan out logical sub-steps (the pipeline runner executes them inline).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, ClassVar

from pyspark.sql import SparkSession


class WorkerException(Exception):
    """Permanent failure — no retry (ref: worker.py:30-31)."""


@dataclass
class WorkerContext:
    """Everything a worker needs from the engine."""

    spark: SparkSession
    catalog: Any = None  # crmint_spark.catalog.Catalog
    transport: Any = None  # injectable API transport for connector workers
    general_settings: dict[str, str] = field(default_factory=dict)


class Worker:
    PARAMS: ClassVar[list[tuple]] = []
    GLOBAL_SETTINGS: ClassVar[list[str]] = []
    MAX_ATTEMPTS: ClassVar[int] = 1

    def __init__(self, params: dict[str, Any], ctx: WorkerContext):
        self._params = dict(params)
        self._ctx = ctx
        self._workers_to_enqueue: list[tuple[str, dict[str, Any]]] = []
        self.log: list[str] = []
        for name, _ptype, required, default, _label in self.PARAMS:
            if name not in self._params:
                if required and default is None:
                    raise WorkerException(f"missing required param: {name}")
                self._params[name] = default

    # -- API mirrored from the reference ---------------------------------
    def log_info(self, msg: str) -> None:
        self.log.append(msg)

    def _enqueue(self, worker_class: str, params: dict[str, Any], delay: int = 0) -> None:
        self._workers_to_enqueue.append((worker_class, params))

    def execute(self) -> list[tuple[str, dict[str, Any]]]:
        self._execute()
        return self._workers_to_enqueue

    def _execute(self) -> None:  # pragma: no cover - abstract
        raise NotImplementedError

    def _source_table(self) -> str:
        """Source table id from either the engine's ``source_table``
        param or the reference's ``bq_project_id``/``bq_dataset_id``/
        ``bq_table_id`` triple (project optional — ref:
        bq_to_storage_exporter.py:26-33, ga_audiences_updater.py:34-36),
        so exported reference pipeline JSON runs unchanged."""
        if self._params.get("source_table"):
            return self._params["source_table"]
        ds = self._params.get("bq_dataset_id")
        tbl = self._params.get("bq_table_id")
        if ds and tbl:
            proj = self._params.get("bq_project_id")
            return ".".join(p for p in (proj, ds, tbl) if p)
        raise WorkerException(
            "missing required param: source_table "
            "(or bq_dataset_id + bq_table_id)"
        )
