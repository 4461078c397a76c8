"""Regenerate PLANS.md: formatted physical plans for the headline
queries at sf0.1, as pushdown/broadcast/codegen evidence.

Usage: python tools/dump_plans.py
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crmint_spark.registry import QUERIES  # noqa: E402
from crmint_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SHOW = [
    ("q01_pricing_summary", "filter + column pruning reach the scan; partial agg"),
    ("q02_topk_revenue", "dimension joins broadcast; TakeOrderedAndProject top-k"),
    ("q03_semi_join", "IN-subquery planned as BroadcastHashJoin LeftSemi"),
    ("q06_range_join", "10-row build side -> BroadcastNestedLoopJoin for BETWEEN"),
    ("q07_first_touch", "single window sort per user partition"),
    ("dedup_minhash_lsh", "explode -> partial-MIN agg -> equi-join on band keys"),
    ("ann_cosine_topk", "JVM higher-order cosine, broadcast probe, top-k"),
    (
        "text_sequence_packing",
        "window partitioned by source (no global single-partition sort)",
    ),
    (
        "embedding_quantization",
        "per-row HOF quantization; shuffle carries scalars, never vectors",
    ),
    (
        "text_pii_redaction",
        "JVM regexp scrub, per-source rollup only",
    ),
    (
        "decontam_overlap",
        "broadcast eval-gram set; one reduce computes totals+hits (3 scans)",
    ),
    (
        "text_repetition",
        "explode n-grams -> partial agg on (doc, gram); text never shuffles",
    ),
    (
        "corpus_sample",
        "hash predicate folded into the scan projection; no shuffle pre-agg",
    ),
    (
        "q38_asof_attribution",
        "as-of join = union -> ONE shuffle on user_id -> one sort; no "
        "probe-side subquery or pair materialization",
    ),
    (
        "text_vocabulary",
        "wordcount with map-side partial agg; TakeOrderedAndProject top-k",
    ),
    (
        "text_winnowing",
        "per-row HOF sketching; only (sketch, count) shuffles",
    ),
    (
        "q40_funnel",
        "whole funnel chain in ONE groupBy(user) pass, no per-stage joins",
    ),
    (
        "q41_gapfill_ffill",
        "distributed day spine + co-partitioned join + windowed ffill",
    ),
    (
        "q47_daily_anomalies",
        "daily partial agg, then ONE ordered window per type for the "
        "rolling mean/std frame",
    ),
    (
        "dedup_fuzzy_words",
        "levenshtein verify only inside sorted-neighborhood windows",
    ),
    (
        "corpus_duplicate_passages",
        "explode -> distinct -> window count on chunk hash; no join back "
        "to text, no all-pairs stage",
    ),
    (
        "text_perplexity",
        "vocabulary groupBy + shuffle join on the word; corpus total "
        "rides as a broadcast 1-row aggregate",
    ),
    (
        "ann_ivf_topk",
        "literal-codebook argmin: assignment is map-only (no join, no "
        "shuffle); TakeOrdered top-k inside probed lists",
    ),
    (
        "q53_attribution_models",
        "user-equi join with time-range predicate (no cross join), "
        "per-conversion windows, one channel rollup",
    ),
    (
        "embedding_pq_codes",
        "PQ encode is Scan -> Project: codebooks are literal expressions "
        "(no join, no Exchange) — map-only at any corpus size",
    ),
    (
        "ann_ivfpq_topk",
        "IVF-PQ: coarse-probe filter + ADC literal-map lookups, one "
        "map-only pass + TakeOrderedAndProject",
    ),
    (
        "ann_ivfpq_rerank_topk",
        "re-rank stage: raw-vector read is candidate-bounded — "
        "PushedFilters In(vec_id, ...) at the parquet scan, no shuffle "
        "join",
    ),
    (
        "embedding_pca_top_component",
        "power-iteration steps are stride-sample scans + d-scalar "
        "shuffles; the result frame itself is a 64-row local relation",
    ),
    (
        "q59_vector_search",
        "VECTOR_SEARCH TVF: probe side broadcast (BroadcastNestedLoop"
        "Join BuildLeft), HOF distance in codegen, WindowGroupLimit "
        "partial top-k BEFORE the exchange",
    ),
    (
        "q83_vector_index_search",
        "index-routed VECTOR_SEARCH: exploded probe-list equi-join "
        "against the list_id-partitioned layout; PartitionFilters on "
        "list_id prune unprobed lists from the scan",
    ),
    (
        "bqml_kmeans",
        "KMEANS serve: broadcast centroid codebook, argmin fold in "
        "codegen (map-only assignment) -> one partial-agg exchange for "
        "the cluster counts",
    ),
    (
        "bqml_autoencoder_anomalies",
        "reconstruction anomalies: fused per-row error expression in "
        "codegen; the only wide step is the order-statistic threshold "
        "(TakeOrdered at fixture scale; approx-quantile is the "
        "documented 100 TB swap)",
    ),
    (
        "dml_time_travel",
        "FOR SYSTEM_TIME AS OF: the version directory joins as an "
        "ordinary pruned parquet scan — time travel adds zero plan "
        "overhead beyond the second scan",
    ),
    (
        "dedup_char_spans",
        "char-gram grid explode -> distinct-doc count on gram digest "
        "(text never shuffles) -> per-doc lag-window span merge",
    ),
    (
        "corpus_dsir_weights",
        "two fixed-B-row language models broadcast into the per-doc "
        "scoring join; shuffle rows carry (doc, bucket, count) only",
    ),
    (
        "ann_binary_hamming_topk",
        "1-bit codes: map-only bit_count(xor) Hamming scan + "
        "candidate-bounded rerank with PushedFilters In(vec_id, ...)",
    ),
    (
        "text_inverted_index",
        "postings explode + distinct; query touches only its own "
        "token posting lists (token IN filter before the join)",
    ),
    (
        "q65_gap_fill",
        "GAP_FILL: per-partition sequence() spine + one keyed join; "
        "fills are IGNORE NULLS navigation windows in-partition",
    ),
    (
        "q67_pipe_syntax",
        "pipe |> fold: nested subqueries collapse in Catalyst — the "
        "plan equals the standard-SQL twin (one agg, one TakeOrdered)",
    ),
    (
        "q73_range_sessionize",
        "RANGE_SESSIONIZE: 3 windows share ONE (key, lower, upper) "
        "sort — a single Exchange, no self-join, no driver loop",
    ),
    (
        "q76_geography",
        "ST_DISTANCE/DWITHIN: pure JVM trig inside WholeStageCodegen; "
        "no UDF, no shuffle for the per-row proximity scan",
    ),
    (
        "bqml_vocab_broadcast",
        ">10k-category LABEL encode: vocabulary table joined via "
        "hinted BroadcastHashJoin, never a 10k-entry literal map",
    ),
    (
        "q90_date_boundaries",
        "boundary-counting date functions: pure JVM arithmetic in one "
        "WholeStageCodegen span over the orders scan",
    ),
    # round 8 planes (VERDICT r8 #5: the late-session features had no
    # plan dumps) + round 9 additions
    (
        "dml_partitioned_table",
        "PARTITION BY honored: the final date-range read carries "
        "PartitionFilters on the derived __pk month key — months "
        "outside the bound are never listed or opened",
    ),
    (
        "dml_pruned_merge",
        "partition-pruned MERGE: the returned state read scans the "
        "post-swap layout; the probe-then-one-partition-write shape "
        "is inode-asserted in tests/test_partitioned_layout.py",
    ),
    (
        "dml_join_elimination",
        "constraint-driven join elimination: ONE FileScan of the fact "
        "(no Join operator), the IS NOT NULL guard pushed to the scan",
    ),
    (
        "dml_star_elimination",
        "multi-join star elimination (r9): all three PK/FK dim joins "
        "dropped — the plan is the bare fact-subset aggregation",
    ),
    (
        "dml_mv_rewrite",
        "MV smart rewrite: phase 'mv' reads the materialized table "
        "(p__crm__mvagg scan), phase 'fresh' recomputes over the "
        "mutated base — both visible in the union",
    ),
    (
        "dml_mv_containment",
        "MV containment rewrite (r9): the coarser GROUP BY "
        "re-aggregates the MV scan — the base table never appears",
    ),
    (
        "dml_index_delta",
        "incremental SEARCH freshness (r9): postings scan bucket-"
        "pruned AND __part-filtered to unchanged partitions; the "
        "delta branch is a self-subquery with PartitionFilters on "
        "the changed __pk values only",
    ),
    (
        "dml_vector_delta",
        "incremental VECTOR freshness (r9): probed-list layout scan "
        "over unchanged partitions UNION inline nearest-centroid "
        "assignment of the changed partitions' rows",
    ),
    (
        "q95_persistent_udfs",
        "persistent scalar UDFs expand inline at call sites (r11): "
        "the plan is ONE customer scan with the spliced CASE/CONCAT "
        "expressions in the projection - no extra joins, shuffles or "
        "Python UDFs from the function plane",
    ),
    (
        "q93_analyzer_index",
        "analyzer-faithful routing (r10): the named-LOG and NO_OP "
        "SEARCH forms serve from their matching postings layouts — "
        "tok_bucket PartitionFilters prune to the probed buckets; the "
        "corpus text column never enters the routed plans",
    ),
]


def main() -> None:
    spark = get_spark("plan-dump", cpus="8")
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# PLANS — physical-plan evidence (generated by tools/dump_plans.py)",
        "",
        f"Input: `{SF}`, AQE on, broadcast threshold 64 MB.",
        "",
    ]
    for name, why in SHOW:
        df = QUERIES[name](spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain(mode="formatted")
        plan = buf.getvalue()
        # keep the operator tree + scan details, drop codegen ids noise
        out += [f"## {name}", "", f"_{why}_", "", "```", plan.strip(), "```", ""]

    # HLL scale path: the approx_sketches rewrite keeps the same two-level
    # aggregation shape but each group's state is a fixed-size HLL sketch
    # (~2^lgConfigK registers) instead of an unbounded collect_set array —
    # the memory contract that lets the sketch algebra hold at 100 TB
    # cardinalities (dialect._rewrite_hll_family; exact sets stay the
    # oracle path).
    from crmint_spark.catalog import register_testdata
    from crmint_spark.dialect import transpile_statement

    register_testdata(spark, SF)
    hll_q = (
        "SELECT HLL_COUNT.MERGE(s) AS u FROM (SELECT event_type, "
        "HLL_COUNT.INIT(user_id) AS s FROM events GROUP BY event_type)"
    )
    df = spark.sql(transpile_statement(hll_q, approx_sketches=True))
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    out += [
        "## hll_approx_sketches (approx_sketches=True scale path)",
        "",
        "_same partial-agg shape as the exact-set default, but per-group "
        "state is a bounded DataSketches HLL buffer (hll_sketch_agg / "
        "hll_union_agg), not an unbounded collect_set array — constant "
        "memory per group at any cardinality_",
        "",
        "```",
        buf.getvalue().strip(),
        "```",
        "",
    ]
    with open(os.path.join(os.path.dirname(__file__), "..", "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("PLANS.md written")


if __name__ == "__main__":
    main()
