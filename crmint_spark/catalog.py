"""Table-name mapping + testdata registration.

The reference addresses tables as ``project.dataset.table``
(ref: backend/jobs/workers/bigquery/bq_worker.py:61-66). Here a
``Catalog`` maps those 3-part names onto parquet directories under a
warehouse root, registering them as temp views so both the DataFrame API
and ``spark.sql`` resolve them.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _safe_view_name(table_id: str) -> str:
    """``proj.ds.tbl`` -> ``proj__ds__tbl`` (temp views are single-part)."""
    return re.sub(r"[^A-Za-z0-9_]", "_", table_id.replace(".", "__"))


def tune_session(spark: SparkSession) -> None:
    """Apply the engine's runtime-settable tuning to a caller-provided
    session, touching only confs still at their stock defaults (a
    session built by ``crmint_spark.session.get_spark`` already has
    these; a vanilla driver session gets 200 shuffle partitions and no
    AQE coalescing, which wastes 6x scheduling overhead at test scale).
    """
    try:
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            spark.conf.set("spark.sql.shuffle.partitions", "32")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    except Exception:
        pass  # read-only conf service (e.g. Connect) — run as-is


def register_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every driver testdata parquet as a temp view by bare name."""
    out: dict[str, DataFrame] = {}
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = load(spark, sf_dir, name)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's reader only
    accepts as int64 (``spark.sql.legacy.parquet.nanosAsLong``); convert
    to a proper micros timestamp here so every consumer sees TimestampType
    (matching DuckDB's micros truncation of the same values).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    tune_session(spark)
    if name == "events":
        # runtime-settable; required for TIMESTAMP(NANOS) parquet even
        # under a caller-provided session that didn't set it at build time
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long")))
    return df


class Catalog:
    """BigQuery-style 3-part name catalog over a parquet warehouse.

    Replaces the reference's implicit BigQuery catalog: tables are
    parquet dirs at ``<root>/<project>/<dataset>/<table>``; write
    dispositions map to Spark save modes
    (ref: bq_query_launcher.py:44-47, storage_to_bq_importer.py:71-79).
    """

    def __init__(self, spark: SparkSession, warehouse_root: str):
        self.spark = spark
        self.root = warehouse_root
        os.makedirs(warehouse_root, exist_ok=True)

    def path_for(self, table_id: str) -> str:
        parts = table_id.split(".")
        if len(parts) > 3:
            raise ValueError(f"bad table id: {table_id}")
        return os.path.join(self.root, *parts)

    def exists(self, table_id: str) -> bool:
        p = self.path_for(table_id)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") or f == "_SUCCESS" for f in os.listdir(p)
        )

    def read(self, table_id: str) -> DataFrame:
        return self.spark.read.parquet(self.path_for(table_id))

    def register(self, table_id: str) -> str:
        """Make the table resolvable from SQL; returns the view name."""
        view = _safe_view_name(table_id)
        self.read(table_id).createOrReplaceTempView(view)
        return view

    def write(
        self,
        df: DataFrame,
        table_id: str,
        disposition: str = "WRITE_TRUNCATE",
        create_if_needed: bool = True,
    ) -> None:
        """WRITE_TRUNCATE/WRITE_APPEND + CREATE_IF_NEEDED/CREATE_NEVER
        semantics (ref: bq_query_launcher.py:44-47)."""
        if not create_if_needed and not self.exists(table_id):
            raise ValueError(f"table {table_id} does not exist (CREATE_NEVER)")
        mode = {"WRITE_TRUNCATE": "overwrite", "WRITE_APPEND": "append"}[disposition]
        df.write.mode(mode).parquet(self.path_for(table_id))
        # downstream SQL jobs in the same pipeline address the table by
        # name immediately (BigQuery-catalog semantics)
        self.register(table_id)

    def drop(self, table_id: str) -> None:
        import shutil

        p = self.path_for(table_id)
        if os.path.isdir(p):
            shutil.rmtree(p)

    def list_tables(self, project: str, dataset: str) -> list[str]:
        """Equivalent of the reference's ``__TABLES_SUMMARY__`` metadata
        scan (ref: output.sql:2-7)."""
        base = os.path.join(self.root, project, dataset)
        if not os.path.isdir(base):
            return []
        return sorted(
            d for d in os.listdir(base) if os.path.isdir(os.path.join(base, d))
        )
