"""Variable discovery + inline bigquery() function tests."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crmint_spark.catalog import load  # noqa: E402
from crmint_spark.ml.discovery import (  # noqa: E402
    discover_event_variables,
    discover_first_party_columns,
)
from crmint_spark.templating import InlineFunctions, render  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_discover_event_variables(spark):
    ev = load(spark, SF, "events")
    rows = discover_event_variables(ev, top_n=5).collect()
    assert {r.event_type for r in rows} == {
        "view", "click", "purchase", "signup", "error"
    }
    # every event carries the 'k' int param in testdata
    assert all(r.param_key == "k" for r in rows)
    assert all(r.value_types == "INT64" for r in rows)
    # volumes sorted desc
    vols = [r.n_events for r in rows]
    assert vols == sorted(vols, reverse=True)


def test_discover_first_party_columns(spark):
    cust = load(spark, SF, "customer")
    cols = discover_first_party_columns(cust)
    assert {"name": "c_custkey", "type": "long"} in cols
    assert {"name": "c_mktsegment", "type": "string"} in cols
    # nested/map columns excluded
    from pyspark.sql import functions as F

    nested = cust.withColumn("m", F.create_map(F.lit("a"), F.lit(1)))
    assert all(c["name"] != "m" for c in discover_first_party_columns(nested))


def test_inline_bigquery_function(spark):
    df = spark.createDataFrame([(7, "hello")], "id long, msg string")
    df.createOrReplaceTempView("p__d__greeting")
    fns = InlineFunctions(spark)
    out = render("{{ bigquery('p.d.greeting', 'msg') }}-{{ bigquery('p.d.greeting', 'id') }}", {}, fns)
    assert out == "hello-7"


def test_inline_bigquery_error_parity(spark):
    """Reference raises ValueError on missing table / empty table /
    unknown field (inline.py:51-80) — config typos must fail loudly."""
    import pytest

    spark.createDataFrame([(1,)], "id long").limit(0).createOrReplaceTempView(
        "p__d__empty"
    )
    fns = InlineFunctions(spark)
    with pytest.raises(ValueError, match="not found"):
        fns.bigquery("p.d.no_such_table", "x")
    with pytest.raises(ValueError, match="is empty"):
        fns.bigquery("p.d.empty", "id")
    spark.createDataFrame([(7,)], "id long").createOrReplaceTempView("p__d__one")
    with pytest.raises(ValueError, match="No field 'nope'"):
        fns.bigquery("p.d.one", "nope")
