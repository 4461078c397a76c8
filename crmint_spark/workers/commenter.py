"""No-op / forced-failure marker worker
(ref: backend/jobs/workers/commenter.py:21-32)."""

from __future__ import annotations

from .base import Worker, WorkerException


class Commenter(Worker):
    PARAMS = [
        ("comment", "text", False, "", "comment"),
        ("success", "boolean", True, True, "fail the job if false"),
    ]

    def _execute(self) -> None:
        if not self._params["success"]:
            raise WorkerException(f"forced failure: {self._params['comment']}")
        self.log_info(self._params["comment"])
