"""Driver-side pipeline DAG runner.

Collapses the reference's control plane (Flask + MySQL + Pub/Sub; ref:
SURVEY §3) into an in-process orchestrator while preserving its
semantics and its public artifact — the pipeline JSON import/export
format (ref: backend/controller/pipeline/views.py:174-275):

- jobs carry ``worker_class`` + params + ``hash_start_conditions``
  (edges by job hash/id with condition success|fail|whatever,
  ref: models.py:690-732),
- a job starts only when ALL its preceding jobs are in inactive states
  and each edge condition is fulfilled: ``success`` -> succeeded,
  ``fail`` -> failed, ``whatever`` -> either (ref: models.py:880-911),
- a failed precondition marks the job failed without running it, and
  pipeline status is failed if ANY job failed, else succeeded
  (ref: models.py:295-330, 964-1035),
- params render Jinja global -> pipeline -> job contexts at start
  (ref: models.py:159-192),
- per-job retry up to MAX_ATTEMPTS on transient exceptions;
  WorkerException is permanent (ref: jobs_app.py:90-103),
- independent jobs run concurrently on a thread pool — Spark's
  scheduler handles the parallel job groups (SURVEY §3 mapping),
- ``stop()`` reproduces Pipeline.stop/Job.stop (ref: models.py:252-259,
  1043-1052): waiting jobs reset to idle and never start, running jobs
  go to ``stopping`` and keep their terminal status when the in-flight
  work completes; optionally the running jobs' Spark job groups are
  cancelled for a fast abort.
"""

from __future__ import annotations

import enum
import threading
from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor, wait
from dataclasses import dataclass, field
from typing import Any

from .templating import InlineFunctions, layer_contexts, render, worker_value
from .workers import find_worker
from .workers.base import WorkerContext, WorkerException


class Status(str, enum.Enum):
    IDLE = "idle"
    WAITING = "waiting"
    RUNNING = "running"
    STOPPING = "stopping"
    SUCCEEDED = "succeeded"
    FAILED = "failed"

    @property
    def inactive(self) -> bool:
        return self in (Status.IDLE, Status.SUCCEEDED, Status.FAILED)


@dataclass
class StartCondition:
    preceding_job: str  # job name
    condition: str = "success"  # success | fail | whatever


@dataclass
class JobSpec:
    name: str
    worker_class: str
    params: list[dict[str, Any]] = field(default_factory=list)
    start_conditions: list[StartCondition] = field(default_factory=list)
    max_attempts: int = 1


@dataclass
class JobRun:
    spec: JobSpec
    status: Status = Status.IDLE
    error: str | None = None
    log: list[str] = field(default_factory=list)


class Pipeline:
    def __init__(
        self,
        name: str,
        jobs: list[JobSpec],
        params: list[dict[str, Any]] | None = None,
    ):
        self.name = name
        self.jobs = {j.name: j for j in jobs}
        if len(self.jobs) != len(jobs):
            raise ValueError("duplicate job names")
        self.params = params or []
        for j in jobs:
            for sc in j.start_conditions:
                if sc.preceding_job not in self.jobs:
                    raise ValueError(
                        f"unknown preceding job: {sc.preceding_job}"
                    )

    # -- JSON import/export (the reference's public artifact) ------------
    @classmethod
    def from_json(cls, data: dict) -> "Pipeline":
        """Accepts the reference's export shape: ``{name, params, jobs:
        [{name, worker_class, params, hash_start_conditions: [
        {preceding_job_id, condition}]}]}`` with job ids/hashes resolved
        to names (ref: views.py:174-245, models.py:332-351)."""
        id_to_name: dict[Any, str] = {}
        for j in data.get("jobs", []):
            for key in ("id", "hash"):
                if key in j:
                    id_to_name[j[key]] = j["name"]
        jobs = []
        for j in data.get("jobs", []):
            scs = []
            for sc in j.get("hash_start_conditions", j.get("start_conditions", [])):
                pid = sc.get("preceding_job_id", sc.get("preceding_job"))
                scs.append(
                    StartCondition(
                        preceding_job=id_to_name.get(pid, pid),
                        condition=sc.get("condition", "success"),
                    )
                )
            jobs.append(
                JobSpec(
                    name=j["name"],
                    worker_class=j["worker_class"],
                    params=j.get("params", []),
                    start_conditions=scs,
                    max_attempts=int(j.get("max_attempts", 1)),
                )
            )
        return cls(data.get("name", "pipeline"), jobs, data.get("params", []))

    def to_json(self) -> dict:
        return {
            "name": self.name,
            "params": self.params,
            "jobs": [
                {
                    "name": j.name,
                    "worker_class": j.worker_class,
                    "params": j.params,
                    "hash_start_conditions": [
                        {
                            "preceding_job_id": sc.preceding_job,
                            "condition": sc.condition,
                        }
                        for sc in j.start_conditions
                    ],
                }
                for j in self.jobs.values()
            ],
        }


class PipelineRunner:
    def __init__(
        self,
        ctx: WorkerContext,
        global_params: dict[str, Any] | None = None,
        max_parallel: int = 8,
    ):
        self.ctx = ctx
        self.global_params = global_params or {}
        self.max_parallel = max_parallel
        # stop()-visible execution state (ref: models.py:252-259)
        self._lock = threading.Lock()
        self._runs: dict[str, JobRun] = {}
        self._pending: set[str] = set()
        self._running = False
        self._stop_requested = False
        self._pipeline_name = ""

    def _job_group(self, job_name: str) -> str:
        return f"crmint:{self._pipeline_name}:{job_name}"

    def stop(self, cancel_spark_jobs: bool = False) -> bool:
        """Reference ``Pipeline.stop`` semantics (models.py:252-259 +
        Job.stop models.py:1043-1052): returns False unless a run is in
        flight; waiting jobs reset to idle and are never started;
        running jobs move to ``stopping`` and take their natural
        terminal status when the in-flight work completes
        (models_tests.py: stop_succeeds_with_running -> SUCCEEDED).

        With ``cancel_spark_jobs=True`` the running jobs' Spark job
        groups are cancelled: in-flight actions abort and those jobs
        fail fast instead of running to completion (the engine's
        extension — BigQuery jobs in the reference always run out)."""
        with self._lock:
            if not self._running:
                return False
            self._stop_requested = True
            for name in list(self._pending):
                r = self._runs[name]
                if r.status in (Status.WAITING, Status.IDLE):
                    r.status = Status.IDLE
                    self._pending.discard(name)
            groups = []
            for name, r in self._runs.items():
                if r.status == Status.RUNNING:
                    r.status = Status.STOPPING
                    groups.append(self._job_group(name))
        if cancel_spark_jobs and groups:
            # one-shot cancel misses actions submitted a moment later
            # (cancelJobGroup only aborts currently-active jobs), so keep
            # re-cancelling until every stopping job has terminated
            def _reaper() -> None:
                import time

                for _ in range(240):  # <= 60 s
                    with self._lock:
                        active = [
                            self._job_group(name)
                            for name, r in self._runs.items()
                            if r.status == Status.STOPPING
                        ]
                    if not active:
                        return
                    for g in active:
                        try:
                            self.ctx.spark.sparkContext.cancelJobGroup(g)
                        except Exception:
                            pass
                    time.sleep(0.25)

            threading.Thread(target=_reaper, daemon=True).start()
        return True

    def _render_job_params(
        self, pipeline: Pipeline, job: JobSpec, functions: InlineFunctions
    ) -> dict[str, Any]:
        """global -> pipeline -> job context layering + typed coercion
        (ref: models.py:159-192, 1089-1114)."""
        pipeline_ctx = {
            p["name"]: p.get("value", "") for p in pipeline.params
        }
        context = layer_contexts(self.global_params, pipeline_ctx)
        rendered: dict[str, Any] = {}
        for p in job.params:
            raw = p.get("value", "")
            if isinstance(raw, list):  # JSON array value: render per element
                text: Any = [render(str(v), context, functions) for v in raw]
            else:
                text = render(str(raw), context, functions)
            rendered[p["name"]] = worker_value(p.get("type", "string"), text)
        return rendered

    def run(self, pipeline: Pipeline) -> dict[str, JobRun]:
        """Execute the DAG; returns per-job results. Raises nothing —
        inspect statuses (pipeline failed = any job failed,
        ref: models.py:295-311)."""
        runs = {name: JobRun(spec=spec) for name, spec in pipeline.jobs.items()}
        functions = InlineFunctions(self.ctx.spark)
        lock = self._lock
        pool = ThreadPoolExecutor(max_workers=self.max_parallel)
        pending: set[str] = set(runs)
        futures: dict[str, Any] = {}
        with lock:
            self._runs = runs
            self._pending = pending
            self._pipeline_name = pipeline.name
            self._running = True
            self._stop_requested = False

        def cond_fulfilled(sc: StartCondition) -> bool | None:
            """True/False once decidable, None while preceding active
            (ref: models.py:880-888)."""
            prev = runs[sc.preceding_job]
            if not prev.status.inactive or prev.status == Status.IDLE:
                return None
            if sc.condition == "success":
                return prev.status == Status.SUCCEEDED
            if sc.condition == "fail":
                return prev.status == Status.FAILED
            return True  # whatever

        def execute_job(name: str) -> None:
            run = runs[name]
            spec = run.spec
            try:
                # thread-local: tags every Spark action of this job so
                # stop(cancel_spark_jobs=True) can abort just this job
                self.ctx.spark.sparkContext.setJobGroup(
                    self._job_group(name),
                    f"pipeline {pipeline.name} job {name}",
                    interruptOnCancel=True,
                )
            except Exception:
                pass  # no SparkContext (e.g. Connect) — cancel unsupported
            try:
                # resolved inside the failure boundary: an unknown
                # worker_class in imported JSON marks THIS job failed
                # instead of blowing up the whole runner
                worker_cls = find_worker(spec.worker_class)
            except Exception as e:
                with lock:
                    run.status = Status.FAILED
                    run.error = f"unknown worker_class: {e}"
                return
            attempts = max(spec.max_attempts, worker_cls.MAX_ATTEMPTS)
            try:
                params = self._render_job_params(pipeline, spec, functions)
            except Exception as e:  # param render error fails the job
                with lock:
                    run.status = Status.FAILED
                    run.error = f"param render: {e}"
                return
            last_err: Exception | None = None
            for _ in range(max(attempts, 1)):
                try:
                    worker = worker_cls(params, self.ctx)
                    subworkers = worker.execute()
                    run.log.extend(worker.log)
                    # inline sub-worker execution (reference enqueues;
                    # Spark actions are synchronous)
                    for sub_cls, sub_params in subworkers:
                        sub = find_worker(sub_cls)(sub_params, self.ctx)
                        sub.execute()
                        run.log.extend(sub.log)
                    with lock:
                        # a STOPPING job that completes keeps its natural
                        # terminal status (ref: models_tests.py
                        # test_stop_succeeds_with_running)
                        run.status = Status.SUCCEEDED
                    return
                except WorkerException as e:
                    last_err = e
                    break  # permanent
                except Exception as e:  # transient -> retry
                    last_err = e
            with lock:
                run.status = Status.FAILED
                run.error = str(last_err)

        def schedule_ready() -> bool:
            """Start every startable job; returns True if progress is
            still possible. No-op once stop was requested (stopped
            pipelines never start dependent jobs, ref: models_tests.py
            test_stopping_one_job_should_not_start_dependent_jobs)."""
            progressed = False
            with lock:
                if self._stop_requested:
                    return False
                for name in list(pending):
                    run = runs[name]
                    decisions = [cond_fulfilled(sc) for sc in run.spec.start_conditions]
                    if any(d is None for d in decisions):
                        run.status = (
                            Status.WAITING if run.status == Status.IDLE else run.status
                        )
                        continue
                    pending.discard(name)
                    if all(decisions):
                        run.status = Status.RUNNING
                        futures[name] = pool.submit(execute_job, name)
                    else:
                        # precondition not met -> failed without running
                        # (ref: models.py:305-311 failure propagation)
                        run.status = Status.FAILED
                        run.error = "start condition not fulfilled"
                    progressed = True
            return progressed

        try:
            schedule_ready()
            while True:
                with lock:
                    snapshot = dict(futures)
                if not snapshot:
                    if not schedule_ready():
                        break
                    continue
                # first completion wakes the scheduler: successors of a
                # fast job start immediately even while a slow sibling
                # is still running
                done, _ = wait(set(snapshot.values()), return_when=FIRST_COMPLETED)
                with lock:
                    for name in [n for n, f in snapshot.items() if f in done]:
                        futures.pop(name, None)
                schedule_ready()
            with lock:
                # stop() resets un-started jobs to idle; anything still
                # waiting when the DAG drains ends idle too
                for name in list(pending):
                    if runs[name].status in (Status.WAITING, Status.IDLE):
                        runs[name].status = Status.IDLE
                        pending.discard(name)
        finally:
            with lock:
                self._running = False
            pool.shutdown(wait=True)
        return runs

    @staticmethod
    def pipeline_status(runs: dict[str, JobRun]) -> Status:
        if any(r.status == Status.FAILED for r in runs.values()):
            return Status.FAILED
        if all(r.status == Status.SUCCEEDED for r in runs.values()):
            return Status.SUCCEEDED
        return Status.IDLE
