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


def _offset_after_lines(path: str, n_lines: int, chunk: int = 65536) -> int:
    """Byte offset just past the ``n_lines``-th newline — reads only the
    file head, not the file."""
    seen = 0
    off = 0
    with open(path, "rb") as f:
        while seen < n_lines:
            buf = f.read(chunk)
            if not buf:
                return off  # fewer than n_lines lines: skip everything
            i = 0
            while seen < n_lines:
                j = buf.find(b"\n", i)
                if j < 0:
                    off += len(buf) - i
                    break
                off += j - i + 1
                i = j + 1
                seen += 1
    return off


def _lines_skipping(spark, uris: list[str], n_skip: int):
    """RDD of CSV lines with the first ``n_skip`` lines of EACH file
    dropped (ref: storage_to_bq_importer.py skip_leading_rows; Spark's
    header option can only skip one). The driver reads just each file's
    head to find the byte offset of line N, then the distributed read
    filters Hadoop ``(offset, line)`` pairs — large files stay split
    across executors and no extra pass over the data is made."""
    import glob as _glob

    sc = spark.sparkContext
    paths: list[str] = []
    for u in uris:
        paths.extend(sorted(_glob.glob(u)) or [u])
    rdds = []
    for p in paths:
        try:
            skip_off = _offset_after_lines(p, n_skip)
        except OSError:
            # non-local path the driver can't head-read: exact per-file
            # line indices instead (costs one extra pass over this file)
            rdds.append(
                sc.textFile(p)
                .zipWithIndex()
                .filter(lambda kv, n=n_skip: kv[1] >= n)
                .map(lambda kv: kv[0])
            )
            continue
        pairs = sc.newAPIHadoopFile(
            p,
            "org.apache.hadoop.mapreduce.lib.input.TextInputFormat",
            "org.apache.hadoop.io.LongWritable",
            "org.apache.hadoop.io.Text",
        )
        rdds.append(
            pairs.filter(lambda kv, o=skip_off: kv[0] >= o).map(lambda kv: kv[1])
        )
    return sc.union(rdds)


#: columnar formats Spark reads/writes natively (self-describing
#: schemas: csv-specific options do not apply). Avro needs the external
#: spark-avro package, so it is accepted only when that datasource
#: resolves (import-gated at call time).
_COLUMNAR_FORMATS = ("parquet", "orc")


def gzip_codec_for(fmt: str) -> str:
    """The per-format name of the gzip/deflate codec family: ORC has no
    'gzip' (zlib = same algorithm), avro only accepts 'deflate' (same
    algorithm again); everything else takes 'gzip' literally."""
    return "zlib" if fmt == "orc" else "deflate" if fmt == "avro" else "gzip"


class FileImporter(Worker):
    PARAMS = [
        ("source_uris", "string_list", True, None, "file globs"),
        ("destination_table", "string", True, "", "proj.ds.table"),
        ("source_format", "string", False, "", "csv|json|parquet|orc|avro"),
        ("import_json", "boolean", False, False, "NDJSON instead of CSV"),
        ("csv_skip_leading_rows", "number", False, 0, "header rows to skip"),
        ("csv_null_marker", "string", False, None, "null marker"),
        ("csv_field_delimiter", "string", False, None, "CSV delimiter"),
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

        fmt = (self._params["source_format"] or "").lower()
        if not fmt:
            fmt = "json" if self._params["import_json"] else "csv"
        if fmt in _COLUMNAR_FORMATS or fmt == "avro":
            # self-describing columnar input: schema travels with the
            # files; explicit schema (if given) projects/validates
            reader = spark.read
            if schema is not None:
                reader = reader.schema(schema)
            try:
                df = reader.format(fmt).load(uris)
            except Exception as e:
                raise WorkerException(
                    f"cannot read {fmt} input: {e}"
                ) from e
        elif fmt == "json":
            reader = spark.read
            if schema is not None:
                reader = reader.schema(schema)
            df = reader.option("mode", "PERMISSIVE").option(
                "columnNameOfCorruptRecord", "_corrupt"
            ).json(uris)
        else:
            n_skip = int(self._params["csv_skip_leading_rows"])
            reader = (
                spark.read.option("mode", "PERMISSIVE")
                .option("columnNameOfCorruptRecord", "_corrupt")
            )
            if self._params["csv_null_marker"] is not None:
                reader = reader.option("nullValue", self._params["csv_null_marker"])
            if self._params["csv_field_delimiter"]:
                reader = reader.option("sep", self._params["csv_field_delimiter"])
            if schema is not None:
                reader = reader.schema(schema)
            else:
                reader = reader.option("inferSchema", True)
            if n_skip > 1:
                # BigQuery skip_leading_rows=N skips N rows per file;
                # Spark's header option can only skip one, so feed the
                # parser a per-file line stream with the first N dropped
                # (quoted embedded newlines unsupported on this path)
                df = reader.csv(_lines_skipping(spark, uris, n_skip))
            else:
                df = (
                    reader.option("header", n_skip > 0)
                    .option("multiLine", True)  # quoted newlines tolerated
                    .option("escape", '"')
                    .csv(uris)
                )

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
        ("destination_format", "string", False, "", "csv|json|parquet|orc|avro"),
        ("export_json", "boolean", False, False, "NDJSON instead of CSV"),
        ("export_gzip", "boolean", False, False, "gzip compression"),
        ("print_header", "boolean", False, True, "CSV header"),
    ]

    def _execute(self) -> None:
        source = self._source_table()
        df = self._ctx.catalog.read(source)
        fmt = (self._params["destination_format"] or "").lower()
        if not fmt:
            fmt = "json" if self._params["export_json"] else "csv"
        writer = df.write.mode("overwrite")
        if self._params["export_gzip"]:
            writer = writer.option("compression", gzip_codec_for(fmt))
        if fmt in _COLUMNAR_FORMATS or fmt == "avro":
            try:
                writer.format(fmt).save(self._params["destination_uri"])
            except Exception as e:
                raise WorkerException(
                    f"cannot write {fmt} output: {e}"
                ) from e
        elif fmt == "json":
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
