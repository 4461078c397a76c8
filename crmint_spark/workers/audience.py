"""Audience diff-and-patch workers.

Ports the reference's algorithm (ref: backend/jobs/workers/ga/
ga_utils.py:217-321 for UA, 324-436 for GA4; deep-compare
common/utils.py:6-36): read the config table, render one audience JSON
per row, fetch existing audiences from the (injected) API transport,
then split into insert vs update operations — an audience is an update
when its name matches an existing one AND its rendered payload is not a
deep-subset of the remote object.

The config table is small (one row per audience) — collected to the
driver, same as the reference; the diff is driver-side Python.
"""

from __future__ import annotations

import json
from typing import Any

from .base import Worker, WorkerException
from .streamer import render_row_template


def deep_subset(expected: Any, actual: Any) -> bool:
    """True if ``expected`` is recursively contained in ``actual``
    (ref: common/utils.py:6-36)."""
    if isinstance(expected, dict):
        if not isinstance(actual, dict):
            return False
        return all(k in actual and deep_subset(v, actual[k]) for k, v in expected.items())
    if isinstance(expected, list):
        if not isinstance(actual, list) or len(expected) != len(actual):
            return False
        return all(deep_subset(e, a) for e, a in zip(expected, actual))
    return expected == actual


def diff_audiences(
    rendered: list[dict],
    existing: list[dict],
    name_key: str = "name",
) -> tuple[list[dict], list[tuple[str, dict]]]:
    """-> (inserts, updates): updates carry the remote resource name
    (ref: ga_utils.py:265-281)."""
    by_name = {a.get(name_key): a for a in existing}
    inserts: list[dict] = []
    updates: list[tuple[str, dict]] = []
    for payload in rendered:
        name = payload.get(name_key)
        remote = by_name.get(name)
        if remote is None:
            inserts.append(payload)
        elif not deep_subset(payload, remote):
            updates.append((remote.get("resourceName", name), payload))
    return inserts, updates


class AudiencesUpdater(Worker):
    """Table -> audience JSON -> insert/update ops via transport."""

    PARAMS = [
        ("source_table", "string", False, "", "audience config table"),
        # reference addressing (ref: ga_audiences_updater.py:34-37,
        # ga_audiences_updater_ga4.py:29-32)
        ("bq_project_id", "string", False, "", "BQ Project ID"),
        ("bq_dataset_id", "string", False, "", "BQ Dataset ID"),
        ("bq_table_id", "string", False, "", "BQ Table ID"),
        ("bq_dataset_location", "string", False, "", "unused, reference-compat"),
        ("account_id", "string", False, "", "reference-compat, transport config"),
        ("property_id", "string", False, "", "reference-compat, transport config"),
        ("ga_property_id", "string", False, "", "reference-compat, transport config"),
        ("template", "text", True, "", "audience JSON template"),
        ("name_key", "string", False, "name", "identity field"),
    ]

    def _execute(self) -> None:
        t = self._ctx.transport
        if t is None:
            raise WorkerException("AudiencesUpdater needs an injected transport")
        rows = self._ctx.catalog.read(self._source_table()).collect()
        rendered = [
            render_row_template(self._params["template"], r.asDict()) for r in rows
        ]
        existing = t.list_audiences()
        inserts, updates = diff_audiences(
            rendered, existing, self._params["name_key"]
        )
        for payload in inserts:
            t.insert_audience(payload)
        for resource_name, payload in updates:
            t.update_audience(resource_name, payload)
        self.log_info(
            f"audiences: {len(inserts)} inserts, {len(updates)} updates"
        )


class GAAudiencesUpdater(AudiencesUpdater):
    pass


class GA4AudiencesUpdater(AudiencesUpdater):
    """GA4 flavor: strips output-only fields from remote objects before
    diffing, and warns (without attempting the update) when an immutable
    field drifted (ref: ga_utils.py:324-436)."""

    OUTPUT_ONLY = ("adsPersonalizationEnabled", "resourceName", "name")
    IMMUTABLE = ("membershipDurationDays", "exclusionDurationMode")

    def _execute(self) -> None:
        t = self._ctx.transport
        if t is None:
            raise WorkerException("AudiencesUpdater needs an injected transport")
        rows = self._ctx.catalog.read(self._source_table()).collect()
        rendered = [
            render_row_template(self._params["template"], r.asDict()) for r in rows
        ]
        name_key = self._params["name_key"]
        existing = t.list_audiences()
        stripped = [
            {
                k: v
                for k, v in a.items()
                if k not in self.OUTPUT_ONLY or k == name_key
            }
            for a in existing
        ]
        by_name = {a.get(name_key): (a, orig) for a, orig in zip(stripped, existing)}
        inserts: list[dict] = []
        updates: list[tuple[str, dict]] = []
        for payload in rendered:
            hit = by_name.get(payload.get(name_key))
            if hit is None:
                inserts.append(payload)
                continue
            remote, orig = hit
            drifted_immutable = [
                f
                for f in self.IMMUTABLE
                if f in payload and f in remote and payload[f] != remote[f]
            ]
            if drifted_immutable:
                self.log_info(
                    f"WARNING: audience {payload.get(name_key)} immutable "
                    f"field(s) changed, skipping: {drifted_immutable}"
                )
                continue
            if not deep_subset(payload, remote):
                updates.append((orig.get("resourceName", payload.get(name_key)), payload))
        for payload in inserts:
            t.insert_audience(payload)
        for resource_name, payload in updates:
            t.update_audience(resource_name, payload)
        self.log_info(
            f"audiences: {len(inserts)} inserts, {len(updates)} updates"
        )
