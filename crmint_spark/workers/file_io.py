"""File <-> table connectors.

``FileImporter`` ≈ ``StorageToBQImporter`` (ref: backend/jobs/workers/
bigquery/storage_to_bq_importer.py:25-92): CSV/NDJSON glob load with
header skipping, explicit JSON schema or inference, null marker,
bad-record budget, overwrite/append, create-if-needed.

``FileExporter`` ≈ ``BQToStorageExporter`` (ref: bq_to_storage_exporter
.py:23-55): table -> CSV or NDJSON, optional header, optional gzip.

Spark reads the glob natively and in parallel — the reference's
GCS-blob matching loop (storage_utils.py:24-47) disappears into the
datasource. PERMISSIVE mode + corrupt-record counting replaces
``max_bad_records``.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from ..schema import parse_schema
from .base import Worker, WorkerException


class FileImporter(Worker):
    PARAMS = [
        ("source_uris", "string_list", True, None, "file globs"),
        ("destination_table", "string", True, "", "proj.ds.table"),
        ("import_json", "boolean", False, False, "NDJSON instead of CSV"),
        ("csv_skip_leading_rows", "number", False, 0, "header rows to skip"),
        ("csv_null_marker", "string", False, None, "null marker"),
        ("schema", "text", False, "", "JSON schema (optional)"),
        ("errors_allowed", "number", False, 0, "max bad records"),
        ("import_overwrite", "boolean", False, True, "truncate vs append"),
        ("create_if_needed", "boolean", False, True, "create table if missing"),
    ]

    def _execute(self) -> None:
        spark = self._ctx.spark
        uris = self._params["source_uris"]
        schema = None
        if self._params["schema"]:
            schema = parse_schema(json.loads(self._params["schema"]))

        if self._params["import_json"]:
            reader = spark.read
            if schema is not None:
                reader = reader.schema(schema)
            df = reader.option("mode", "PERMISSIVE").option(
                "columnNameOfCorruptRecord", "_corrupt"
            ).json(uris)
        else:
            reader = (
                spark.read.option("mode", "PERMISSIVE")
                .option("columnNameOfCorruptRecord", "_corrupt")
                .option("header", self._params["csv_skip_leading_rows"] > 0)
                .option("multiLine", True)  # quoted newlines tolerated
                .option("escape", '"')
            )
            if self._params["csv_null_marker"] is not None:
                reader = reader.option("nullValue", self._params["csv_null_marker"])
            if schema is not None:
                reader = reader.schema(schema)
            else:
                reader = reader.option("inferSchema", True)
            df = reader.csv(uris)

        if "_corrupt" in df.columns:
            df = df.cache()
            bad = df.filter(F.col("_corrupt").isNotNull()).count()
            if bad > self._params["errors_allowed"]:
                raise WorkerException(
                    f"{bad} bad records > errors_allowed={self._params['errors_allowed']}"
                )
            df = df.filter(F.col("_corrupt").isNull()).drop("_corrupt")

        disposition = (
            "WRITE_TRUNCATE" if self._params["import_overwrite"] else "WRITE_APPEND"
        )
        self._ctx.catalog.write(
            df,
            self._params["destination_table"],
            disposition,
            create_if_needed=self._params["create_if_needed"],
        )
        self.log_info(f"imported {uris} -> {self._params['destination_table']}")


class FileExporter(Worker):
    PARAMS = [
        ("source_table", "string", False, "", "proj.ds.table"),
        # reference addressing (ref: bq_to_storage_exporter.py:26-33)
        ("bq_project_id", "string", False, "", "BQ Project ID"),
        ("bq_dataset_id", "string", False, "", "BQ Dataset ID"),
        ("bq_table_id", "string", False, "", "BQ Table ID"),
        ("destination_uri", "string", True, "", "output dir"),
        ("export_json", "boolean", False, False, "NDJSON instead of CSV"),
        ("export_gzip", "boolean", False, False, "gzip compression"),
        ("print_header", "boolean", False, True, "CSV header"),
    ]

    def _execute(self) -> None:
        source = self._source_table()
        df = self._ctx.catalog.read(source)
        writer = df.write.mode("overwrite")
        if self._params["export_gzip"]:
            writer = writer.option("compression", "gzip")
        if self._params["export_json"]:
            writer.json(self._params["destination_uri"])
        else:
            writer.option("header", self._params["print_header"]).csv(
                self._params["destination_uri"]
            )
        self.log_info(
            f"exported {source} -> {self._params['destination_uri']}"
        )


# Reference-compatible aliases
class StorageToBQImporter(FileImporter):
    pass


class BQToStorageExporter(FileExporter):
    pass
