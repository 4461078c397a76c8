"""Pipeline stop/cancel semantics, ported from the reference's stop
tests (ref: backend/tests/controller/integration/models_tests.py:99-165,
625-667), plus scheduler behavior (unknown worker containment,
first-completed wakeup)."""

from __future__ import annotations

import threading
import time

from crmint_spark.pipeline import (
    JobSpec,
    Pipeline,
    PipelineRunner,
    StartCondition,
    Status,
)
from crmint_spark.workers import WORKERS
from crmint_spark.workers.base import Worker, WorkerContext


class _Gate(Worker):
    """Blocks until its named event is set; records execution."""

    EVENTS: dict[str, threading.Event] = {}
    STARTED: dict[str, threading.Event] = {}
    RAN: list[str] = []

    PARAMS = [("gate", "string", True, "", "gate name")]

    def _execute(self) -> None:
        name = self._params["gate"]
        _Gate.STARTED.setdefault(name, threading.Event()).set()
        ev = _Gate.EVENTS.get(name)
        if ev is not None:
            assert ev.wait(timeout=30), f"gate {name} never released"
        _Gate.RAN.append(name)


class _Instant(Worker):
    RAN: list[str] = []
    PARAMS = [("tag", "string", True, "", "tag")]

    def _execute(self) -> None:
        _Instant.RAN.append(self._params["tag"])


WORKERS["TestGate"] = _Gate
WORKERS["TestInstant"] = _Instant


def _ctx(spark):
    return WorkerContext(spark=spark)


def _reset():
    _Gate.EVENTS.clear()
    _Gate.STARTED.clear()
    _Gate.RAN = []
    _Instant.RAN = []


def _gate_job(name, gate):
    return JobSpec(
        name=name, worker_class="TestGate",
        params=[{"name": "gate", "value": gate, "type": "string"}],
    )


def test_stop_fails_if_not_running(spark):
    runner = PipelineRunner(_ctx(spark))
    assert runner.stop() is False  # ref: test_stop_fails_if_not_running


def test_stop_resets_waiting_job_and_keeps_running_result(spark):
    """ref: test_stop_dependent_jobs — running job goes stopping then
    succeeds; its dependent (waiting) job resets to idle and never
    runs."""
    _reset()
    _Gate.EVENTS["g1"] = threading.Event()
    j1 = _gate_job("j1", "g1")
    j2 = JobSpec(
        name="j2", worker_class="TestInstant",
        params=[{"name": "tag", "value": "j2", "type": "string"}],
        start_conditions=[StartCondition(preceding_job="j1")],
    )
    p = Pipeline("stoptest", [j1, j2])
    runner = PipelineRunner(_ctx(spark), max_parallel=2)
    result: dict = {}
    t = threading.Thread(target=lambda: result.update(runner.run(p)))
    t.start()
    assert _Gate.STARTED.setdefault("g1", threading.Event()).wait(10)
    assert runner.stop() is True
    # second stop while still draining is a no-op=False once run ends
    _Gate.EVENTS["g1"].set()
    t.join(timeout=30)
    assert not t.is_alive()
    assert result["j1"].status == Status.SUCCEEDED
    assert result["j2"].status == Status.IDLE
    assert _Instant.RAN == []  # dependent never started
    assert runner.stop() is False
    assert PipelineRunner.pipeline_status(result) == Status.IDLE


def test_unknown_worker_class_fails_job_not_runner(spark):
    """An unknown worker_class (easy via imported JSON) must mark the
    job failed, not raise out of run()."""
    _reset()
    jobs = [
        JobSpec(name="bad", worker_class="NoSuchWorker"),
        JobSpec(
            name="after", worker_class="TestInstant",
            params=[{"name": "tag", "value": "after", "type": "string"}],
            start_conditions=[StartCondition(preceding_job="bad", condition="fail")],
        ),
    ]
    runner = PipelineRunner(_ctx(spark))
    runs = runner.run(Pipeline("badworker", jobs))
    assert runs["bad"].status == Status.FAILED
    assert "unknown worker_class" in runs["bad"].error
    # the fail-edge successor still ran
    assert runs["after"].status == Status.SUCCEEDED
    assert _Instant.RAN == ["after"]


def test_successor_starts_while_slow_sibling_runs(spark):
    """FIRST_COMPLETED scheduling: when a fast job finishes, its
    successor starts even though an unrelated slow job is still
    running (the old loop blocked on dict order)."""
    _reset()
    _Gate.EVENTS["slow"] = threading.Event()
    jobs = [
        _gate_job("slow", "slow"),
        JobSpec(
            name="fast", worker_class="TestInstant",
            params=[{"name": "tag", "value": "fast", "type": "string"}],
        ),
        JobSpec(
            name="fast_child", worker_class="TestGate",
            params=[{"name": "gate", "value": "child", "type": "string"}],
            start_conditions=[StartCondition(preceding_job="fast")],
        ),
    ]
    runner = PipelineRunner(_ctx(spark), max_parallel=3)
    result: dict = {}
    t = threading.Thread(
        target=lambda: result.update(runner.run(Pipeline("sched", jobs)))
    )
    t.start()
    # the child must START while "slow" is still gated
    started = _Gate.STARTED.setdefault("child", threading.Event()).wait(10)
    assert started, "successor did not start while sibling was running"
    _Gate.EVENTS["slow"].set()
    t.join(timeout=30)
    assert not t.is_alive()
    assert result["slow"].status == Status.SUCCEEDED
    assert result["fast_child"].status == Status.SUCCEEDED


def test_stop_cancels_spark_jobs_fast(spark):
    """stop(cancel_spark_jobs=True) aborts a running Spark action via
    its job group instead of waiting it out."""
    _reset()

    class _SparkSpin(Worker):
        STARTED = threading.Event()

        def _execute(self) -> None:
            _SparkSpin.STARTED.set()
            # ~minutes of work if not cancelled (max over strings —
            # ANSI-safe, unlike sum which would error on the hex cast)
            self._ctx.spark.range(2_000_000_000).selectExpr(
                "max(sha2(cast(id as string), 256))"
            ).collect()

    WORKERS["TestSparkSpin"] = _SparkSpin
    runner = PipelineRunner(_ctx(spark))
    result: dict = {}
    p = Pipeline("cancel", [JobSpec(name="spin", worker_class="TestSparkSpin")])
    t = threading.Thread(target=lambda: result.update(runner.run(p)))
    t.start()
    assert _SparkSpin.STARTED.wait(15)
    time.sleep(0.5)  # let the action reach the scheduler
    assert runner.stop(cancel_spark_jobs=True) is True
    t.join(timeout=60)
    assert not t.is_alive(), "cancelled job did not abort quickly"
    assert result["spin"].status == Status.FAILED
