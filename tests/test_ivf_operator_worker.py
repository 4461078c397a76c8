"""IVF ANN index tests + the training-data corpus pipeline composed of
OperatorWorker jobs."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crmint_spark.catalog import Catalog, load  # noqa: E402
from crmint_spark.operators.ivf import (  # noqa: E402
    build_ivf_index,
    ivf_recall_vs_exact,
    ivf_search,
)
from crmint_spark.pipeline import JobSpec, Pipeline, PipelineRunner, Status  # noqa: E402
from crmint_spark.workers.base import WorkerContext  # noqa: E402

SF = "/root/testdata/sf0.001"


def _query_vec(spark):
    emb = load(spark, SF, "embeddings")
    row = emb.filter("vec_id = 0").first()
    return [float(x) for x in row.embedding]


def test_ivf_index_partitions_corpus(spark):
    emb = load(spark, SF, "embeddings")
    indexed, model = build_ivf_index(emb, n_lists=8)
    assert indexed.select("list_id").distinct().count() <= 8
    assert indexed.count() == emb.count()
    got = ivf_search(indexed, model, _query_vec(spark), top_k=5, n_probe=2)
    rows = got.collect()
    assert len(rows) == 5
    sims = [r.cos_sim for r in rows]
    assert sims == sorted(sims, reverse=True)


def test_ivf_recall_reasonable(spark):
    emb = load(spark, SF, "embeddings")
    # probing half the lists must recover most of the exact top-k on a
    # 500-vector corpus
    recall = ivf_recall_vs_exact(
        emb, _query_vec(spark), top_k=10, n_lists=8, n_probe=4
    )
    assert recall >= 0.5, recall


def test_deterministic_ivf_recall_vs_exact(spark):
    """The oracle-checkable projection-quantizer IVF must recover most
    of the exact top-k while scanning only the probed lists."""
    from crmint_spark.operators.ivf import ann_ivf_topk
    from crmint_spark.operators.similarity import ann_cosine_topk

    exact = {r.vec_id for r in ann_cosine_topk(spark, SF).collect()}
    approx_rows = ann_ivf_topk(spark, SF).collect()
    approx = {r.vec_id for r in approx_rows}
    assert len(approx_rows) == 10
    sims = [r.cos_sim for r in approx_rows]
    assert sims == sorted(sims, reverse=True)
    assert len(exact & approx) / 10.0 >= 0.5


def test_deterministic_ivf_prunes_lists(spark):
    """The probed-list semi-join must restrict the scan: the largest
    possible IVF_N_PROBE-list scan is a strict subset of the corpus."""
    from pyspark.sql import functions as F

    from crmint_spark.operators.ivf import (
        IVF_K,
        IVF_LLOYD_STEPS,
        IVF_N_PROBE,
        _assign,
        _recompute_centroids,
    )

    emb = load(spark, SF, "embeddings")
    n = emb.count()
    stride = max(n // IVF_K, 1)
    vecs = emb.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    cent = vecs.filter(
        (F.col("vec_id") % stride == 0) & (F.col("vec_id") < IVF_K * stride)
    ).select(
        (F.col("vec_id") / stride).cast("int").alias("list_id"),
        F.col("v").alias("c"),
    )
    for _ in range(IVF_LLOYD_STEPS):
        cent = _recompute_centroids(_assign(vecs, cent))
    counts = sorted(
        (
            r["cnt"]
            for r in _assign(vecs, cent)
            .groupBy("list_id")
            .agg(F.count("*").alias("cnt"))
            .collect()
        ),
        reverse=True,
    )
    assert len(counts) > IVF_N_PROBE
    worst = sum(counts[:IVF_N_PROBE])
    assert worst < n, (worst, n)


def test_training_data_pipeline_of_operators(spark, tmp_path):
    """normalize -> exact dedup -> quality -> token counts as one DAG of
    OperatorWorker jobs: the training-data corpus build as pipeline JSON."""
    ctx = WorkerContext(spark=spark, catalog=Catalog(spark, str(tmp_path / "wh")))

    def op_job(name, operator, dest, preceding=None):
        from crmint_spark.pipeline import StartCondition

        return JobSpec(
            name=name,
            worker_class="OperatorWorker",
            params=[
                {"name": "operator", "type": "string", "value": operator},
                {"name": "sf_dir", "type": "string", "value": SF},
                {"name": "destination_table", "type": "string", "value": dest},
            ],
            start_conditions=(
                [StartCondition(preceding)] if preceding else []
            ),
        )

    pipeline = Pipeline(
        "training-data-corpus",
        [
            op_job("normalize", "text_normalize", "corpus.clean.normalized"),
            op_job("dedup", "dedup_exact", "corpus.clean.dup_groups", "normalize"),
            op_job("quality", "text_quality", "corpus.clean.quality", "dedup"),
            op_job("tokens", "text_token_counts", "corpus.clean.tokens", "quality"),
        ],
    )
    runs = PipelineRunner(ctx).run(pipeline)
    assert {r.status for r in runs.values()} == {Status.SUCCEEDED}, {
        k: (v.status, v.error) for k, v in runs.items()
    }
    for t in ("normalized", "quality", "tokens"):
        assert ctx.catalog.read(f"corpus.clean.{t}").count() > 0
    # sf0.001 may genuinely contain no exact duplicates — table exists,
    # row count is data-dependent
    assert ctx.catalog.read("corpus.clean.dup_groups").count() >= 0


def test_ivf_partitioned_write_prunes(spark, tmp_path):
    """The partitioned IVF layout turns a probe into partition pruning:
    the scan plan carries the list_id filter as PartitionFilters, and
    only the probed lists' rows are read."""
    import pyspark.sql.functions as F

    from crmint_spark.operators.ivf import (
        ivf_probe_read,
        ivf_write_partitioned,
    )

    emb = spark.range(200).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 7).cast("int").alias("list_id"),
        F.transform(F.sequence(F.lit(1), F.lit(4)), lambda i: i * 0.5).alias("v"),
    )
    path = str(tmp_path / "ivf_corpus")
    ivf_write_partitioned(emb, path)
    probed = ivf_probe_read(spark, path, [1, 3])
    assert probed.count() == emb.filter(F.col("list_id").isin([1, 3])).count()
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan
