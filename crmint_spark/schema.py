"""BigQuery-style JSON schema -> Spark StructType.

Re-expresses the reference's recursive SchemaField parser
(ref: backend/jobs/workers/bigquery/bq_utils.py:10-40): default type
STRING, default mode NULLABLE; RECORD/STRUCT recurse into ``fields``;
mode REPEATED wraps in ArrayType; REQUIRED -> nullable=False.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DateType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_TYPE_MAP: dict[str, DataType] = {
    "STRING": StringType(),
    "BYTES": StringType(),
    "INTEGER": LongType(),
    "INT64": LongType(),
    "INT": LongType(),
    "FLOAT": DoubleType(),
    "FLOAT64": DoubleType(),
    "DOUBLE": DoubleType(),
    "NUMERIC": DoubleType(),
    "BIGNUMERIC": DoubleType(),
    "BOOLEAN": BooleanType(),
    "BOOL": BooleanType(),
    "DATE": DateType(),
    "DATETIME": TimestampType(),
    "TIMESTAMP": TimestampType(),
    "TIME": StringType(),
    "JSON": StringType(),
    "GEOGRAPHY": StringType(),
}


def parse_field(item: dict) -> StructField:
    """One schema item -> StructField (recursing into RECORDs)."""
    name = item["name"]
    ftype = str(item.get("type", "STRING")).upper()
    mode = str(item.get("mode", "NULLABLE")).upper()

    if ftype in ("RECORD", "STRUCT"):
        dtype: DataType = StructType(
            [parse_field(sub) for sub in item.get("fields", [])]
        )
    else:
        if ftype not in _TYPE_MAP:
            raise ValueError(f"unsupported schema type: {ftype}")
        dtype = _TYPE_MAP[ftype]

    if mode == "REPEATED":
        return StructField(name, ArrayType(dtype), nullable=True)
    return StructField(name, dtype, nullable=(mode != "REQUIRED"))


def parse_schema(items: list[dict]) -> StructType:
    """Full JSON schema list -> StructType."""
    return StructType([parse_field(i) for i in items])


def format_bytes(size: float) -> str:
    """Human-readable bytes (ref: bq_utils.py:43-63) for dry-run cost
    reporting."""
    for unit in ("B", "KB", "MB", "GB", "TB", "PB"):
        if abs(size) < 1024.0 or unit == "PB":
            return f"{size:.2f} {unit}"
        size /= 1024.0
    return f"{size:.2f} PB"
