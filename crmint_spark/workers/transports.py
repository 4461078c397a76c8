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


class InMemoryGAConfigTransport:
    """Driver-side GA4 admin-API stub: conversion events, custom
    dimensions, data-import uploads with retention listing."""

    def __init__(self):
        self.conversion_events: list[tuple[str, str]] = []
        self.custom_dimensions: list[tuple[str, str, str, str]] = []
        self.chunks: list[bytes] = []
        self.finished = False
        self.uploads: list[dict] = []
        self.deleted: list[str] = []

    def create_conversion_event(self, property_id: str, event_name: str) -> None:
        from ..workers.ga_config import AlreadyExists

        if (property_id, event_name) in self.conversion_events:
            raise AlreadyExists(event_name)
        self.conversion_events.append((property_id, event_name))

    def create_custom_dimension(
        self, property_id: str, parameter_name: str, display_name: str, scope: str
    ) -> None:
        from ..workers.ga_config import AlreadyExists

        key = (property_id, parameter_name, display_name, scope)
        if key in self.custom_dimensions:
            raise AlreadyExists(parameter_name)
        self.custom_dimensions.append(key)

    def upload_chunk(self, property_id: str, dataset_id: str, chunk: bytes) -> None:
        self.chunks.append(chunk)

    def finish_upload(self, property_id: str, dataset_id: str) -> None:
        self.finished = True

    def list_uploads(self, property_id: str, dataset_id: str) -> list[dict]:
        return list(self.uploads)

    def delete_upload(self, property_id: str, dataset_id: str, upload_id: str) -> None:
        self.deleted.append(upload_id)


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
