"""Row-streaming connector workers: table rows -> per-row JSON payloads
-> batched pushes to an external API.

Replaces the reference's coordinator/processor fan-out (1,000-row pages,
<=50 pages per coordinator, self-respawn — ref: backend/jobs/workers/
bigquery/bq_batch_worker.py:38-155, bq_to_measurement_protocol_ga4.py:
35-168) with Spark-native ``foreachPartition``: Spark's scheduler IS the
coordinator, partitions are the pages, and backpressure is task
scheduling. Per-row JSON uses the same ``string.Template`` semantics
(ref: bq_to_measurement_protocol_ga4.py:145-148).

The HTTP transport is injectable (tests pass a recording stub — the
same strategy as the reference's mocked Google clients). The transport
callable must be picklable: it runs inside executor tasks.
"""

from __future__ import annotations

import json
import string
from typing import Any, Callable

from .base import Worker, WorkerException

# Batching constants mirrored from the reference
MP_BATCH_SIZE_DEFAULT = 20  # ref: bq_to_measurement_protocol_ga4.py:60-61
ADS_MAX_PER_REQUEST = 2000  # ref: bq_to_ads_offline_click_conversion.py:38


def render_row_template(template: str, row: dict[str, Any]) -> dict:
    """``string.Template`` $var substitution into a JSON payload
    (ref: ga_utils.py:229-235)."""
    rendered = string.Template(template).substitute(
        {k: ("" if v is None else v) for k, v in row.items()}
    )
    return json.loads(rendered)


def _push_partition(
    rows,
    template: str,
    batch_size: int,
    transport: Callable[[list[dict]], None],
    wrap_key: str | None,
):
    buf: list[dict] = []
    for row in rows:
        buf.append(render_row_template(template, row.asDict()))
        if len(buf) >= batch_size:
            transport([{wrap_key: buf}] if wrap_key else list(buf))
            buf = []
    if buf:
        transport([{wrap_key: buf}] if wrap_key else list(buf))


class JsonTemplateSink(Worker):
    """Generic table -> templated-JSON -> batched transport sink."""

    # the reference's BQ-triple addressing is accepted everywhere a
    # source_table is (ref: bq_to_measurement_protocol_ga4.py:50-54,
    # bq_to_ads_offline_click_conversion.py:50-65)
    BQ_COMPAT_PARAMS = [
        ("bq_project_id", "string", False, "", "BQ Project ID"),
        ("bq_dataset_id", "string", False, "", "BQ Dataset ID"),
        ("bq_table_id", "string", False, "", "BQ Table ID"),
        ("bq_dataset_location", "string", False, "", "unused, reference-compat"),
    ]

    PARAMS = [
        ("source_table", "string", False, "", "proj.ds.table"),
        *BQ_COMPAT_PARAMS,
        ("template", "text", True, "", "JSON string.Template"),
        ("batch_size", "number", False, MP_BATCH_SIZE_DEFAULT, "rows per request"),
        ("partitions", "number", False, 0, "repartition count (0 = leave)"),
        ("wrap_key", "string", False, None, "wrap batches under this key"),
    ]

    def _execute(self) -> None:
        transport = self._ctx.transport
        if transport is None:
            raise WorkerException("JsonTemplateSink needs an injected transport")
        source = self._source_table()
        df = self._ctx.catalog.read(source)
        if self._params["partitions"]:
            df = df.repartition(int(self._params["partitions"]))
        template = self._params["template"]
        batch_size = int(self._params["batch_size"])
        wrap_key = self._params["wrap_key"]
        df.foreachPartition(
            lambda rows: _push_partition(rows, template, batch_size, transport, wrap_key)
        )
        self.log_info(f"streamed {source} to transport")


class BQToMeasurementProtocolGA4(JsonTemplateSink):
    """GA4 Measurement Protocol push (ref: bq_to_measurement_protocol_
    ga4.py:35-168): payload batches of ``mp_batch_size`` under an
    ``events`` envelope; debug mode targets the validation endpoint."""

    PARAMS = [
        ("source_table", "string", False, "", "proj.ds.table"),
        *JsonTemplateSink.BQ_COMPAT_PARAMS,
        ("measurement_id", "string", False, "", "reference-compat, transport config"),
        ("api_secret", "string", False, "", "reference-compat, transport config"),
        ("template", "text", True, "", "MP event JSON template"),
        ("mp_batch_size", "number", False, MP_BATCH_SIZE_DEFAULT, "batch"),
        ("debug", "boolean", False, False, "validation endpoint"),
    ]

    def _execute(self) -> None:
        self._params.setdefault("batch_size", self._params["mp_batch_size"])
        self._params.setdefault("partitions", 0)
        self._params.setdefault("wrap_key", None)
        super()._execute()


class BQToAdsOfflineClickConversion(JsonTemplateSink):
    """Ads offline click-conversion upload (ref:
    bq_to_ads_offline_click_conversion.py:41-231): <=2,000 conversions
    per request, partial-failure semantics left to the transport."""

    PARAMS = [
        ("source_table", "string", False, "", "proj.ds.table"),
        *JsonTemplateSink.BQ_COMPAT_PARAMS,
        ("template", "text", True, "", "ClickConversion JSON template"),
        ("customer_id", "string", False, "", "Ads customer id"),
    ]

    def _execute(self) -> None:
        self._params.setdefault("batch_size", ADS_MAX_PER_REQUEST)
        self._params.setdefault("partitions", 0)
        self._params.setdefault("wrap_key", "conversions")
        super()._execute()
