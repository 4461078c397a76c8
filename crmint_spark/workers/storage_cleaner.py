"""Warehouse maintenance: delete files matching glob patterns older than
N days (ref: backend/jobs/workers/storage/storage_cleaner.py:25-48;
glob matching storage_utils.py:24-47 via fnmatch on blob names, age via
``blob.updated``). Driver-side filesystem op on the warehouse dir."""

from __future__ import annotations

import fnmatch
import os
import time

from .base import Worker, WorkerException


class StorageCleaner(Worker):
    PARAMS = [
        ("file_patterns", "string_list", True, None, "glob patterns"),
        ("days_to_keep", "number", True, 30, "age threshold"),
        ("base_dir", "string", False, "", "root dir (defaults to catalog root)"),
        (
            "vacuum_time_travel",
            "boolean",
            False,
            False,
            "also prune expired time-travel versions (catalog-wide)",
        ),
        (
            "vacuum_partition_expiration",
            "boolean",
            False,
            False,
            "also drop partitions past their table's"
            " partition_expiration_days (catalog-wide)",
        ),
        (
            "vacuum_table_expiration",
            "boolean",
            False,
            False,
            "also drop whole tables past their expiration_timestamp"
            " (catalog-wide)",
        ),
    ]

    def _execute(self) -> None:
        if self._params.get("vacuum_time_travel"):
            if not self._ctx.catalog:
                raise WorkerException(
                    "vacuum_time_travel needs a catalog on the context"
                )
            pruned = self._ctx.catalog.vacuum_versions()
            self.log_info(
                f"vacuumed {pruned} expired time-travel versions"
                f" (window {self._ctx.catalog.time_travel_hours:g} h)"
            )
        if self._params.get("vacuum_partition_expiration"):
            if not self._ctx.catalog:
                raise WorkerException(
                    "vacuum_partition_expiration needs a catalog on the"
                    " context"
                )
            dropped = self._ctx.catalog.vacuum_expired_partitions()
            self.log_info(
                f"dropped {dropped} expired partitions"
                " (partition_expiration_days)"
            )
        if self._params.get("vacuum_table_expiration"):
            if not self._ctx.catalog:
                raise WorkerException(
                    "vacuum_table_expiration needs a catalog on the"
                    " context"
                )
            dropped = self._ctx.catalog.vacuum_expired_tables()
            self.log_info(
                f"dropped {dropped} expired tables (expiration_timestamp)"
            )
        base = self._params["base_dir"] or (
            self._ctx.catalog.root if self._ctx.catalog else None
        )
        if not base:
            raise WorkerException("StorageCleaner needs base_dir or catalog")
        cutoff = time.time() - self._params["days_to_keep"] * 86400
        removed = 0
        for dirpath, _dirs, files in os.walk(base):
            for fname in files:
                full = os.path.join(dirpath, fname)
                rel = os.path.relpath(full, base)
                if any(
                    fnmatch.fnmatch(rel, pat) or fnmatch.fnmatch(fname, pat)
                    for pat in self._params["file_patterns"]
                ) and os.path.getmtime(full) < cutoff:
                    os.remove(full)
                    removed += 1
        self.log_info(f"removed {removed} files older than {self._params['days_to_keep']}d")
