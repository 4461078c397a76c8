"""Verbatim execution of the reference's generated BQML SQL.

The reference's flagship artifacts — the rendered ``model_bqml.sql``
training script and the ``output.sql`` DECLARE + CTAS chain
(ref: backend/controller/ml_model/templates/) — must run UNMODIFIED
through ``SparkSQLExecutor`` and produce results that hash-match the
independent DuckDB recomputation (tests/parity.py mirrors the driver's
oracle compare)."""

from __future__ import annotations

import pytest

from crmint_spark.dialect import transpile_statement
from crmint_spark.ml.reference_templates import (
    ga4_classification_context,
    reference_templates_available,
    render_reference_template,
)

from conftest import SF_SMOKE
from parity import compare, duckdb_conn

needs_reference = pytest.mark.skipif(
    not reference_templates_available(), reason="reference checkout absent"
)


@needs_reference
def test_training_template_renders_single_create_model():
    sql = render_reference_template(
        "model_bqml.sql", ga4_classification_context(step="training")
    )
    assert sql.lstrip().upper().startswith("CREATE OR REPLACE MODEL")
    # jinja comment markers ('--') strip SQL comments at render time,
    # exactly like the reference compiler (ref: compiler.py:333-336)
    assert "--" not in sql
    assert "_TABLE_SUFFIX BETWEEN" in sql
    assert "UNNEST" in sql


@needs_reference
def test_training_verbatim_matches_duckdb(spark):
    from crmint_spark.queries_bqml import (
        BQML_TRAINING_VERBATIM_ORACLE,
        bqml_training_verbatim,
    )

    df = bqml_training_verbatim(spark, SF_SMOKE)
    compare(df, duckdb_conn(SF_SMOKE), BQML_TRAINING_VERBATIM_ORACLE)
    assert df.count() > 0


@needs_reference
def test_output_verbatim_matches_duckdb(spark):
    from crmint_spark.queries_bqml import (
        BQML_OUTPUT_VERBATIM_ORACLE,
        bqml_output_verbatim,
    )

    df = bqml_output_verbatim(spark, SF_SMOKE)
    compare(df, duckdb_conn(SF_SMOKE), BQML_OUTPUT_VERBATIM_ORACLE)
    assert df.count() > 0
    assert set(df.columns) == {
        "value", "normalized_score", "score", "client_id", "user_id",
        "event_name", "type",
    }


# ---------------------------------------------------------------------
# transpiler units for the script-surface rewrites the templates rely on
# ---------------------------------------------------------------------


def test_lateral_unnest_alias_shadowing():
    """BigQuery's ``events e, UNNEST(params) AS params`` idiom: the
    element alias shadows the array column; Spark needs a fresh name and
    renamed dotted references (ref: model_bqml.sql:166)."""
    out = transpile_statement(
        'SELECT e.unique_id FROM events AS e, UNNEST(params) AS params '
        'WHERE params.key = "x" AND COALESCE(params.value.int_value, 0) > 0'
    )
    assert "LATERAL (SELECT explode(params) AS __unnest_params)" in out
    assert "__unnest_params.key" in out
    assert "__unnest_params.value.int_value" in out
    # array argument itself is untouched
    assert "explode(params)" in out


def test_lateral_unnest_rename_is_scoped():
    """References outside the deriving subquery keep their names."""
    out = transpile_statement(
        "SELECT a.params.key FROM other a JOIN ("
        'SELECT unique_id FROM events, UNNEST(params) AS params '
        'WHERE params.key = "k") b ON TRUE'
    )
    assert out.startswith("SELECT a.params.key")
    assert "__unnest_params.key" in out


def test_correlated_unnest_with_outer_column_reference():
    """The aggregate_behavior feature shape: outer ``e.name`` inside the
    correlated array subquery becomes a lambda-captured column
    (ref: model_bqml.sql:220-248)."""
    out = transpile_statement(
        'SELECT IFNULL(SUM((SELECT 1 FROM UNNEST(e.params) '
        'WHERE e.name = "signup" AND key = "plan")), 0) FROM events e'
    )
    assert "get(transform(filter(e.params" in out
    assert '__u.key = "plan"' in out
    assert 'e.name = "signup"' in out  # outer ref not rewritten


def test_farm_fingerprint_portable_hash():
    out = transpile_statement("MOD(ABS(FARM_FINGERPRINT(user_id)), 100) < 90")
    assert "CONV(SUBSTR(MD5(CAST(user_id AS STRING)), 1, 15), 16, 10)" in out


def test_format_date_nested_calls():
    out = transpile_statement(
        "FORMAT_DATE(\"%Y%m%d\", DATE_SUB(CURRENT_DATE(), INTERVAL 30 DAY))"
    )
    # the CAST preserves BigQuery's DATE return type (Spark promotes
    # date +/- day-time interval to TIMESTAMP)
    assert out == (
        "date_format(CAST((CURRENT_DATE() - INTERVAL 30 DAY) AS DATE),"
        " 'yyyyMMdd')"
    )


def test_split_offset_literal_delimiter():
    # SPLIT's literal delimiter becomes a regex-escaped split(); OFFSET
    # becomes a 0-based subscript (this one is regex-safe so only the
    # quoting changes)
    out = transpile_statement('SPLIT(table_id, "events_")[OFFSET(1)]')
    assert out == "split(table_id, 'events_')[1]"


@needs_reference
def test_output_template_declare_chain_parses():
    sql = render_reference_template(
        "output.sql", ga4_classification_context(step="none")
    )
    from crmint_spark.dialect import classify_statement, split_script

    stmts = split_script(sql)
    kinds = [classify_statement(s)[0] for s in stmts]
    assert kinds == ["declare", "set", "sql"]
