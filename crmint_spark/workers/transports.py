"""Transports for connector workers.

The reference talks to Google APIs through authorized clients its tests
replace with canned-response mocks (SURVEY §5). The engine inverts that:
workers take any picklable callable ``transport(batch: list[dict])``.
``FileRecordingTransport`` is the offline implementation — it persists
every batch as a JSON file, serving both tests and dry-run auditing.
Instances run inside executor tasks, so they must stay picklable and
import-safe (module-level class, stdlib only).
"""

from __future__ import annotations

import json
import os
import uuid


class FileRecordingTransport:
    """Writes each pushed batch to ``out_dir/<uuid>.json``."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir

    def __call__(self, batch: list[dict]) -> None:
        os.makedirs(self.out_dir, exist_ok=True)
        path = os.path.join(self.out_dir, f"{uuid.uuid4().hex}.json")
        with open(path, "w") as f:
            json.dump(batch, f)

    def read_batches(self) -> list[list[dict]]:
        out = []
        if os.path.isdir(self.out_dir):
            for name in sorted(os.listdir(self.out_dir)):
                with open(os.path.join(self.out_dir, name)) as f:
                    out.append(json.load(f))
        return out


class InMemoryAudienceTransport:
    """Driver-side audience API stub: list/insert/update with state."""

    def __init__(self, existing: list[dict] | None = None):
        self.existing = list(existing or [])
        self.inserted: list[dict] = []
        self.updated: list[tuple[str, dict]] = []

    def list_audiences(self) -> list[dict]:
        return list(self.existing)

    def insert_audience(self, payload: dict) -> None:
        self.inserted.append(payload)

    def update_audience(self, resource_name: str, payload: dict) -> None:
        self.updated.append((resource_name, payload))
