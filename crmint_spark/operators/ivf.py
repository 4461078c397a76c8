"""IVF approximate nearest-neighbor search (KMeans coarse quantizer).

The production-grade scale path beyond the sign-bit LSH buckets: learn
``n_lists`` coarse centroids with Spark ML KMeans, assign every vector
to its nearest centroid (the inverted list), and at query time probe
only the ``n_probe`` nearest lists.

At 100 TB: write the corpus partitioned by ``list_id`` — a probe then
touches n_probe/n_lists of the data via partition pruning, and each
list is scanned with the same JVM-side cosine kernel as the brute-force
baseline. Training runs on a sample; assignment is one broadcast-model
``transform``.
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans, KMeansModel
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import cosine_similarity


def build_ivf_index(
    emb: DataFrame,
    n_lists: int = 16,
    seed: int = 42,
    sample_fraction: float = 1.0,
) -> tuple[DataFrame, KMeansModel]:
    """-> (corpus with ``list_id``, fitted KMeans model).

    ``sample_fraction`` < 1 trains the quantizer on a sample (the 100 TB
    mode); assignment always covers the full corpus.
    """
    vecs = emb.withColumn("features", array_to_vector("embedding"))
    train = vecs if sample_fraction >= 1.0 else vecs.sample(
        fraction=sample_fraction, seed=seed
    )
    model = KMeans(k=n_lists, seed=seed, featuresCol="features").fit(train)
    assigned = (
        model.transform(vecs)
        .withColumnRenamed("prediction", "list_id")
        .drop("features")
    )
    return assigned, model


def ivf_search(
    indexed: DataFrame,
    model: KMeansModel,
    query_vec: list[float],
    top_k: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """Probe the n_probe nearest lists, exact cosine inside them."""
    spark = indexed.sparkSession
    centers = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    centers_df = spark.createDataFrame(
        centers, "list_id int, center array<double>"
    )
    qdf = spark.createDataFrame([(query_vec,)], "qvec array<double>")
    # rank centroids by distance to the query (tiny: n_lists rows)
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("center"), F.col("qvec"), lambda c, q: (c - q) * (c - q)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    probe_lists = [
        r.list_id
        for r in centers_df.crossJoin(F.broadcast(qdf))
        .select("list_id", dist.alias("d"))
        .orderBy("d", "list_id")
        .limit(n_probe)
        .collect()
    ]
    sim = cosine_similarity(F.col("embedding"), F.col("qvec"))
    return (
        indexed.filter(F.col("list_id").isin(probe_lists))
        .crossJoin(F.broadcast(qdf))
        .select("vec_id", "label", F.round(sim, 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(top_k)
    )


def ivf_recall_vs_exact(
    emb: DataFrame,
    query_vec: list[float],
    top_k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
) -> float:
    """Recall@k of the IVF probe against brute force — the index
    quality metric to monitor when tuning n_lists/n_probe."""
    sim = cosine_similarity(F.col("embedding"), F.col("qvec"))
    qdf = emb.sparkSession.createDataFrame([(query_vec,)], "qvec array<double>")
    exact = {
        r.vec_id
        for r in emb.crossJoin(F.broadcast(qdf))
        .select("vec_id", F.round(sim, 6).alias("s"))
        .orderBy(F.desc("s"), F.asc("vec_id"))
        .limit(top_k)
        .collect()
    }
    indexed, model = build_ivf_index(emb, n_lists=n_lists)
    approx = {
        r.vec_id
        for r in ivf_search(indexed, model, query_vec, top_k, n_probe).collect()
    }
    return len(exact & approx) / float(top_k)


def ann_ivf_topk(spark, sf_dir: str) -> DataFrame:
    """Registry entry: IVF-probed top-k against the same probe vector as
    ann_cosine_topk (vec_id = 0). Rows-only in the driver — KMeans
    centroids aren't SQL-reproducible — but the recall path against the
    exact oracle is pytest-asserted (test_ivf_operator_worker)."""
    from ..catalog import load

    emb = load(spark, sf_dir, "embeddings")
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    indexed, model = build_ivf_index(emb, n_lists=8)
    return ivf_search(indexed, model, qvec, top_k=10, n_probe=2)
