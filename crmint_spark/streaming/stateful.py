"""Custom stateful streaming operators via ``applyInPandasWithState``.

These are the operators Structured Streaming's built-in aggregations
can't express (SURVEY §2.2 streaming extension): arbitrary per-key state
with timeouts. State lives in the state store (RocksDB/HDFS-backed on a
cluster), keyed by the grouping column — partition-parallel and
fault-tolerant by construction.

Implemented:
- ``user_running_profile`` — per-user running profile (event count,
  total value, first/last seen) emitted on every update; the streaming
  twin of the batch per-user aggregate with no window bound.
- ``streaming_dedup_by_key`` — drop rows whose key was already seen
  (exact streaming dedup with unbounded-by-default state; production
  would set a TTL timeout per key).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PROFILE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("first_ts", TimestampType()),
        StructField("last_ts", TimestampType()),
    ]
)

_PROFILE_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("first_ts", TimestampType()),
        StructField("last_ts", TimestampType()),
    ]
)


def _update_profile(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, first_ts, last_ts = state.get
    else:
        n, total, first_ts, last_ts = 0, 0.0, None, None
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
        lo, hi = pdf["ts"].min(), pdf["ts"].max()
        first_ts = lo if first_ts is None or lo < first_ts else first_ts
        last_ts = hi if last_ts is None or hi > last_ts else last_ts
    state.update((n, total, first_ts, last_ts))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "first_ts": [first_ts],
            "last_ts": [last_ts],
        }
    )


def user_running_profile(events: DataFrame) -> DataFrame:
    """Unbounded per-user running profile (update-mode output)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=PROFILE_SCHEMA,
        stateStructType=_PROFILE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


DEDUP_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("is_first", LongType()),
    ]
)

_SEEN_STATE_SCHEMA = StructType([StructField("seen", LongType())])


def _dedup_events(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (event_id,) = key
    seen = state.exists
    out = []
    for pdf in pdfs:
        if pdf.empty:
            continue
        if not seen:
            first = pdf.iloc[[0]]
            out.append(
                pd.DataFrame(
                    {
                        "event_id": first["event_id"],
                        "user_id": first["user_id"],
                        "event_type": first["event_type"],
                        "is_first": [1],
                    }
                )
            )
            seen = True
    state.update((1,))
    yield from out or [pd.DataFrame(columns=[f.name for f in DEDUP_SCHEMA.fields])]


def streaming_dedup_by_key(events: DataFrame) -> DataFrame:
    """Emit only the first occurrence of each event_id across the whole
    stream (exact dedup; state = one marker per key)."""
    return events.groupBy("event_id").applyInPandasWithState(
        _dedup_events,
        outputStructType=DEDUP_SCHEMA,
        stateStructType=_SEEN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def enrich_with_dimension(events: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static join: enrich the event stream with a broadcastable
    dimension table — no state, the static side is re-read per
    micro-batch (picks up dimension updates automatically)."""
    return events.join(dim, on, "left")
