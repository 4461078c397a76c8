"""Variable discovery for ML-model configuration UIs.

Port of the reference's discovery queries (ref: backend/controller/
ml_model/bigquery.py:48-138 GA4 variables: top-100 events with their
param keys and value types; :140-162 first-party column listing with
JSON/RECORD exclusion), re-expressed on the engine's event schema
(``props`` JSON carries the event parameters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def discover_event_variables(events: DataFrame, top_n: int = 100) -> DataFrame:
    """Top-N event types by volume, with the JSON param keys observed and
    each key's dominant value type — the GA4 variable-discovery shape
    (ref: bigquery.py:72-118: top events + UNNEST(event_params) key/type
    harvest)."""
    top_events = (
        events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy(F.desc("n_events"), F.asc("event_type"))
        .limit(top_n)
    )
    keyed = (
        events.join(F.broadcast(top_events.select("event_type")), "event_type")
        .select(
            "event_type",
            F.explode(
                F.map_keys(
                    F.from_json("props", "map<string,string>")
                )
            ).alias("param_key"),
            F.from_json("props", "map<string,string>").alias("m"),
        )
        .select(
            "event_type",
            "param_key",
            F.when(
                F.col("m")[F.col("param_key")].cast("bigint").isNotNull(), "INT64"
            )
            .when(
                F.col("m")[F.col("param_key")].cast("double").isNotNull(), "FLOAT64"
            )
            .otherwise("STRING")
            .alias("value_type"),
        )
    )
    params = (
        keyed.groupBy("event_type", "param_key")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.array_join(F.sort_array(F.collect_set("value_type")), ",").alias(
                "value_types"
            ),
        )
    )
    return (
        top_events.join(params, "event_type", "left")
        .select(
            "event_type",
            "n_events",
            "param_key",
            "n_occurrences",
            "value_types",
        )
        .orderBy(F.desc("n_events"), F.asc("event_type"), F.asc("param_key"))
    )


_EXCLUDED_TYPES = ("map", "struct", "array")  # JSON/RECORD exclusion


def discover_first_party_columns(df: DataFrame) -> list[dict]:
    """Flat column listing for first-party tables, excluding nested/JSON
    columns exactly like the reference (ref: bigquery.py:156-161)."""
    out = []
    for field in df.schema.fields:
        tname = field.dataType.typeName()
        if tname in _EXCLUDED_TYPES:
            continue
        out.append({"name": field.name, "type": tname})
    return out
