"""OperatorWorker: any registered engine operator as a pipeline job.

Bridges the operator library (dedup / similarity / text / core queries)
into the DAG runner: a job names an operator from the registry, the
worker runs it against a source directory and writes the result table.
This is what makes 'build a training-data corpus' expressible as the
same pipeline JSON artifact the reference uses for marketing flows.
"""

from __future__ import annotations

from .base import Worker, WorkerException


class OperatorWorker(Worker):
    PARAMS = [
        ("operator", "string", True, "", "name from the query/operator registry"),
        ("sf_dir", "string", True, "", "input data directory"),
        ("destination_table", "string", True, "", "output table"),
        ("overwrite", "boolean", False, True, "write disposition"),
    ]

    def _execute(self) -> None:
        from ..registry import QUERIES

        name = self._params["operator"]
        fn = QUERIES.get(name)
        if fn is None:
            raise WorkerException(f"unknown operator: {name}")
        df = fn(self._ctx.spark, self._params["sf_dir"])
        disposition = (
            "WRITE_TRUNCATE" if self._params["overwrite"] else "WRITE_APPEND"
        )
        self._ctx.catalog.write(df, self._params["destination_table"], disposition)
        self.log_info(f"operator {name} -> {self._params['destination_table']}")
