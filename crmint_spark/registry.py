"""Master query registry assembled from the core SQL-surface queries and
the large-scale extension operators.

``QUERIES``: name -> callable(spark, sf_dir) -> DataFrame
``ORACLES``: name -> DuckDB SQL string (absent key = rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .queries import CORE_QUERIES

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

for _name, (_fn, _sql) in CORE_QUERIES.items():
    QUERIES[_name] = _fn
    if _sql is not None:
        ORACLES[_name] = _sql


def register(name: str, fn: Callable[[SparkSession, str], DataFrame], sql: str | None):
    QUERIES[name] = fn
    if sql is not None:
        ORACLES[name] = sql
