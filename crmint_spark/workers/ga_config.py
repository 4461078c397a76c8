"""GA4 control-plane config workers — driver-side API calls behind the
injectable transport (no data plane involvement).

- ``GA4ConversionEventCreator`` (ref: backend/jobs/workers/ga/
  ga_conversion_event_creator_ga4.py:21-34; ga_utils.py:499-528):
  idempotent on already-exists (the reference swallows HTTP 409).
- ``GA4CustomDimensionCreator`` (ref: ga_custom_dimension_creator_ga4
  .py:21-42; ga_utils.py:439-496): validates scope/param name rules
  before calling.
- ``GADataImporter`` (ref: ga_data_importer.py:27-75; upload
  ga_utils.py:158-194; retention 116-155): exports a table to a single
  CSV, uploads via transport, then deletes oldest uploads beyond
  ``max_uploads``.
"""

from __future__ import annotations

import os
import re

from .base import Worker, WorkerException


class AlreadyExists(Exception):
    """Transport signals an already-existing resource (HTTP 409)."""


class GA4ConversionEventCreator(Worker):
    PARAMS = [
        ("property_id", "string", True, "", "GA4 property"),
        ("event_name", "string", True, "", "conversion event name"),
    ]

    def _execute(self) -> None:
        t = self._ctx.transport
        if t is None:
            raise WorkerException("needs an injected transport")
        try:
            t.create_conversion_event(
                self._params["property_id"], self._params["event_name"]
            )
            self.log_info(f"created conversion event {self._params['event_name']}")
        except AlreadyExists:
            # idempotent (ref: ga_utils.py:520-528)
            self.log_info(
                f"conversion event {self._params['event_name']} already exists"
            )


_PARAM_NAME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9_]{0,23}$")
_SCOPES = ("EVENT", "USER", "ITEM")


class GA4CustomDimensionCreator(Worker):
    PARAMS = [
        ("property_id", "string", True, "", "GA4 property"),
        ("parameter_name", "string", True, "", "event/user parameter"),
        ("display_name", "string", False, "", "display name"),
        ("scope", "string", True, "EVENT", "EVENT|USER|ITEM"),
    ]

    def _execute(self) -> None:
        t = self._ctx.transport
        if t is None:
            raise WorkerException("needs an injected transport")
        scope = self._params["scope"].upper()
        if scope not in _SCOPES:
            raise WorkerException(f"bad scope: {scope}")
        pname = self._params["parameter_name"]
        if not _PARAM_NAME_RE.match(pname):
            # validation rules (ref: ga_utils.py:439-496)
            raise WorkerException(f"invalid parameter name: {pname}")
        try:
            t.create_custom_dimension(
                self._params["property_id"],
                pname,
                self._params["display_name"] or pname,
                scope,
            )
            self.log_info(f"created custom dimension {pname}")
        except AlreadyExists:
            self.log_info(f"custom dimension {pname} already exists")


class GADataImporter(Worker):
    """Table -> single CSV -> chunked upload -> retention cleanup."""

    PARAMS = [
        ("source_table", "string", True, "", "proj.ds.table"),
        ("property_id", "string", True, "", "GA property"),
        ("dataset_id", "string", True, "", "data import set"),
        ("max_uploads", "number", False, 0, "keep newest N uploads (0 = all)"),
        ("staging_dir", "string", False, "", "CSV staging dir"),
    ]

    CHUNK_BYTES = 1024 * 1024  # 1 MB resumable chunks (ref: ga_utils.py:162)

    def _execute(self) -> None:
        t = self._ctx.transport
        if t is None:
            raise WorkerException("needs an injected transport")
        import tempfile

        staging = self._params["staging_dir"] or tempfile.mkdtemp(prefix="ga_import_")
        df = self._ctx.catalog.read(self._params["source_table"])
        # GA Data Import takes ONE csv file — coalesce(1) is deliberate
        df.coalesce(1).write.mode("overwrite").option("header", True).csv(staging)
        csv_path = next(
            os.path.join(staging, f)
            for f in os.listdir(staging)
            if f.endswith(".csv")
        )
        with open(csv_path, "rb") as f:
            while True:
                chunk = f.read(self.CHUNK_BYTES)
                if not chunk:
                    break
                t.upload_chunk(
                    self._params["property_id"], self._params["dataset_id"], chunk
                )
        t.finish_upload(self._params["property_id"], self._params["dataset_id"])
        max_keep = int(self._params["max_uploads"])
        if max_keep:
            uploads = sorted(
                t.list_uploads(
                    self._params["property_id"], self._params["dataset_id"]
                ),
                key=lambda u: u["uploadTime"],
            )
            # delete-oldest retention (ref: ga_utils.py:116-155)
            for u in uploads[:-max_keep]:
                t.delete_upload(
                    self._params["property_id"],
                    self._params["dataset_id"],
                    u["id"],
                )
                self.log_info(f"deleted old upload {u['id']}")
        self.log_info(f"uploaded {self._params['source_table']}")
