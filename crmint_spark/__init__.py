"""crmint_spark — a PySpark-native analytics engine with the capabilities of
google-marketing-solutions/crmint.

The reference (studied read-only at /root/reference) is a pipeline
orchestrator whose data processing is delegated to BigQuery SQL. This
package re-expresses that surface Spark-first:

- ``session``     — tuned SparkSession builder (AQE, Arrow, broadcast).
- ``catalog``     — BigQuery-style ``project.dataset.table`` name mapping onto
                    the Spark catalog / parquet dirs.
- ``schema``      — BigQuery JSON schema -> StructType (ref: backend/jobs/
                    workers/bigquery/bq_utils.py:10-40).
- ``templating``  — Jinja2 param rendering + inline functions (ref:
                    backend/controller/models.py:159-192, inline.py:33-89).
- ``dialect``     — small BigQuery->Spark SQL rewriter + script splitter.
- ``pipeline``    — driver-side DAG runner replacing the reference's
                    Flask+Pub/Sub control plane (ref: models.py:880-1035).
- ``workers``     — the reference's 19 workers as Spark-native operators.
- ``operators``   — 100TB-scale extensions: dedup, similarity search,
                    text analysis, multimodal plumbing.
- ``ml``          — BQML-equivalent model compiler onto pyspark.ml.
- ``streaming``   — Structured Streaming ingestion (beyond reference parity).
"""

__version__ = "0.1.0"
