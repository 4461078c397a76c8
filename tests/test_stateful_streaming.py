"""applyInPandasWithState + stream-static join tests."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from crmint_spark.catalog import load  # noqa: E402
from crmint_spark.streaming import events as sevents  # noqa: E402
from crmint_spark.streaming import stateful  # noqa: E402


@pytest.fixture()
def stream_dir(spark, tmp_path):
    out = str(tmp_path / "in")
    load(spark, "/root/testdata/sf0.001", "events").coalesce(1).write.json(out)
    return out


def _drain(stream_df, tmp_path, name, output_mode):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_user_running_profile_matches_batch(spark, tmp_path, stream_dir):
    stream = sevents.stream_events_from_dir(spark, stream_dir)
    profile = stateful.user_running_profile(stream)
    _drain(profile, tmp_path, "profiles", "update")
    got = spark.table("profiles")
    # update mode with availableNow over one file: one final row per user
    batch = (
        load(spark, "/root/testdata/sf0.001", "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    got_map = {r.user_id: (r.n_events, r.total_value) for r in got.collect()}
    for r in batch.collect():
        assert got_map[r.user_id][0] == r.n_events
        assert abs(got_map[r.user_id][1] - r.total_value) < 0.05


def test_streaming_dedup_emits_each_key_once(spark, tmp_path, stream_dir):
    stream = sevents.stream_events_from_dir(spark, stream_dir)
    deduped = stateful.streaming_dedup_by_key(stream)
    _drain(deduped, tmp_path, "deduped", "append")
    got = spark.table("deduped")
    n_events = load(spark, "/root/testdata/sf0.001", "events").count()
    assert got.count() == n_events  # event_ids unique in testdata
    assert got.select("event_id").distinct().count() == n_events


def test_stream_static_enrichment_join(spark, tmp_path, stream_dir):
    stream = sevents.stream_events_from_dir(spark, stream_dir)
    dim = spark.createDataFrame(
        [("view", "browse"), ("click", "browse"), ("purchase", "convert"),
         ("signup", "convert"), ("error", "ops")],
        "event_type string, category string",
    )
    enriched = stateful.enrich_with_dimension(stream, dim, "event_type")
    counts = enriched.groupBy("category").count()
    _drain(counts, tmp_path, "enriched", "complete")
    got = {r.category: r["count"] for r in spark.table("enriched").collect()}
    batch = {
        r.category: r["count"]
        for r in load(spark, "/root/testdata/sf0.001", "events")
        .join(dim, "event_type", "left")
        .groupBy("category")
        .count()
        .collect()
    }
    assert got == batch
