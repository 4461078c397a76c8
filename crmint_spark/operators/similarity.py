"""Similarity search over the ``embeddings`` table (array<float> column).

Two strategies:

- ``ann_cosine_topk``  — exact brute-force cosine top-k. JVM-side
  higher-order functions (zip_with/aggregate): no Python, no shuffle of
  vectors, a single pass + a tiny top-k sort. This is the baseline and
  the correctness oracle for the approximate path.
- ``ann_lsh_topk``     — sign-bit LSH bucketing on fixed dimensions:
  candidates share the query's bucket, then exact cosine within the
  bucket. At 100 TB the bucket key becomes the partition key, so a probe
  touches one partition instead of the full corpus (IVF-style).

Determinism: projections use the vector's own leading dimensions (sign
bits) rather than random hyperplanes, so the DuckDB oracle reproduces
buckets exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions import cosine_similarity

QUERY_VEC_ID = 0
TOP_K = 10
# 2^LSH_BITS buckets; sized so a bucket holds ~corpus/16 — scale this up
# with corpus size (the bucket count is the IVF nlist analogue)
LSH_BITS = 4


def _query_vec(emb: DataFrame):
    """The probe vector (vec_id = 0) as a broadcastable 1-row DF."""
    return emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qvec")
    )


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k against the probe vector."""
    emb = load(spark, sf_dir, "embeddings")
    q = _query_vec(emb)
    sim = cosine_similarity(F.col("embedding"), F.col("qvec"))
    return (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", F.round(sim, 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(TOP_K)
    )


ANN_COSINE_SQL = f"""
WITH q AS (
  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qvec
  FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
), scored AS (
  SELECT vec_id, label,
         list_sum(list_transform(range(1, len(embedding) + 1),
                  i -> CAST(embedding[i] AS DOUBLE) * qvec[i]))
         / (sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * sqrt(list_sum(list_transform(qvec, x -> x * x)))) AS sim
  FROM embeddings, q WHERE vec_id <> {QUERY_VEC_ID}
)
SELECT vec_id, label, ROUND(sim, 6) AS cos_sim
FROM scored ORDER BY cos_sim DESC, vec_id ASC LIMIT {TOP_K}
"""


def _bucket_expr(vec_col):
    """LSH bucket = sign bits of the first LSH_BITS dimensions."""
    return sum(
        F.when(F.element_at(vec_col, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(LSH_BITS)
    ).cast("int")


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed ANN: exact cosine within the probe's sign-bit bucket.

    The bucket restriction makes this approximate (recall < 1) but the
    scan is 1/2^bits of the corpus in expectation; at scale, partition
    (or Z-order) the corpus by bucket for partition-pruned probes.
    """
    emb = load(spark, sf_dir, "embeddings")
    q = _query_vec(emb)
    bucketed = emb.withColumn("bucket", _bucket_expr(F.col("embedding")))
    qb = q.withColumn("qbucket", _bucket_expr(F.col("qvec")))
    sim = cosine_similarity(F.col("embedding"), F.col("qvec"))
    return (
        bucketed.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(qb), F.col("bucket") == F.col("qbucket"))
        .select("vec_id", "label", F.round(sim, 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(TOP_K)
    )


def _bucket_sql(col: str) -> str:
    return " + ".join(
        f"CASE WHEN {col}[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END"
        for i in range(LSH_BITS)
    )


ANN_LSH_SQL = f"""
WITH q AS (
  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qvec,
         {_bucket_sql('embedding')} AS qbucket
  FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
), scored AS (
  SELECT vec_id, label,
         list_sum(list_transform(range(1, len(embedding) + 1),
                  i -> CAST(embedding[i] AS DOUBLE) * qvec[i]))
         / (sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * sqrt(list_sum(list_transform(qvec, x -> x * x)))) AS sim
  FROM embeddings, q
  WHERE vec_id <> {QUERY_VEC_ID}
    AND ({_bucket_sql('embedding')}) = qbucket
)
SELECT vec_id, label, ROUND(sim, 6) AS cos_sim
FROM scored ORDER BY cos_sim DESC, vec_id ASC LIMIT {TOP_K}
"""


def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector statistics (norm distribution) — the sanity
    profile a training pipeline runs before ANN indexing."""
    emb = load(spark, sf_dir, "embeddings")
    from ..functions import l2_norm

    norm = l2_norm(F.col("embedding"))
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.min(norm), 4).alias("min_norm"),
        F.round(F.max(norm), 4).alias("max_norm"),
        F.round(F.avg(norm), 4).alias("avg_norm"),
    )


NEAR_DUP_THRESHOLD = 0.99

# Dedup bucketing: bits scale with corpus size so the within-bucket
# all-pairs work stays bounded as the corpus grows (bits = log2(n /
# TARGET_BUCKET_SIZE), i.e. ~TARGET_BUCKET_SIZE vectors per bucket ->
# ~TARGET_BUCKET_SIZE^2/2 pairs per bucket regardless of n). Floor of
# DEDUP_MIN_BITS keeps tiny corpora selective; the ceiling is the
# vector dimensionality (sign bits come from leading dims). The same
# formula is computed in SQL inside the DuckDB oracle.
DEDUP_MIN_BITS = 4
TARGET_BUCKET_SIZE = 64


def _corpus_stats(spark: SparkSession, sf_dir: str) -> tuple[int, int]:
    """(n_vectors, n_dims) of the embeddings table, as cheaply as the
    storage allows: parquet footers driver-side for local paths, Spark
    metadata-count + 1-row probe otherwise (remote object stores)."""
    import os

    path = os.path.join(sf_dir, "embeddings.parquet")
    try:
        import pyarrow.parquet as pq

        f = pq.ParquetFile(path)
        n = f.metadata.num_rows
        first = f.read_row_group(0, columns=["embedding"]).column(0)[0]
        return n, len(first)
    except Exception:
        base = load(spark, sf_dir, "embeddings")
        return (
            base.count(),
            base.select(F.size("embedding")).limit(1).first()[0],
        )


def dedup_lsh_bits(n_vectors: int, n_dims: int) -> int:
    import math

    bits = max(
        DEDUP_MIN_BITS,
        math.ceil(math.log2(max(n_vectors, 1) / float(TARGET_BUCKET_SIZE))),
    )
    return min(bits, n_dims)


def _bucket_expr_n(vec_col, bits: int):
    return sum(
        F.when(F.element_at(vec_col, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(bits)
    ).cast("int")


def embedding_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates share a sign-bit
    LSH bucket (same partition at scale), verified with exact cosine
    >= NEAR_DUP_THRESHOLD. The vector analogue of MinHash dedup.

    The synthetic corpus has no true near-duplicates, so the input is
    self-seeded with a re-keyed copy of every 50th vector (vec_id % 50 =
    7 -> vec_id + 1000000, mirrored in the oracle): the pipeline is
    validated against real cos=1.0 duplicate pairs."""
    from ..functions import l2_norm

    base = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    emb = base.unionAll(
        base.filter(F.col("vec_id") % 50 == 7).select(
            (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
        )
    )
    # bits sizing needs only (row count, dims): read them from the
    # parquet footer / first row-group driver-side when the path is
    # local (zero Spark jobs), else fall back to a metadata-only count
    # job + a single-row limit scan. The +2% seeded copies don't move
    # ceil(log2(n/64)).
    n_base, n_dims = _corpus_stats(spark, sf_dir)
    bits = dedup_lsh_bits(n_base, n_dims)
    # normalize once per vector: the pairwise kernel is then a bare dot
    # product instead of dot + two norms (3x less array math per pair)
    vd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm = l2_norm(F.col("embedding"))
    # persist: both join sides derive from this — without it the scan +
    # HOF normalization runs once per side (measured 2x slower even at
    # 2k vectors; unit vectors are the same size as the input, and
    # MEMORY_AND_DISK spills at scale)
    bucketed = emb.select(
        "vec_id",
        F.transform(vd, lambda x: x / norm).alias("unit"),
        _bucket_expr_n(F.col("embedding"), bits).alias("bucket"),
    ).persist()
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.unit"), F.col("b.unit"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(dot, 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= NEAR_DUP_THRESHOLD)
    )


EMB_DEDUP_SQL = f"""
WITH seeded AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id, embedding
  FROM embeddings WHERE vec_id % 50 = 7
), params AS (
  SELECT LEAST(
           GREATEST({DEDUP_MIN_BITS},
                    CAST(CEIL(LOG2(COUNT(*) / {float(TARGET_BUCKET_SIZE)})) AS INT)),
           (SELECT len(embedding) FROM embeddings LIMIT 1)
         ) AS bits
  FROM embeddings
), bucketed AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(x AS DOUBLE)
                / sqrt(list_sum(list_transform(embedding,
                        y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS unit,
         CAST(list_sum(list_transform(range(1, (SELECT bits FROM params) + 1),
              i -> CASE WHEN embedding[i] >= 0
                        THEN CAST(POWER(2, i - 1) AS BIGINT) ELSE 0 END)) AS INT)
           AS bucket
  FROM seeded
), pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         list_sum(list_transform(range(1, len(a.unit) + 1),
                  i -> a.unit[i] * b.unit[i])) AS sim
  FROM bucketed a JOIN bucketed b
    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, ROUND(sim, 6) AS cos_sim
FROM pairs WHERE ROUND(sim, 6) >= {NEAR_DUP_THRESHOLD}
"""


CENTROID_DIMS = 8


def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid components (first CENTROID_DIMS dims) via
    posexplode -> groupBy(label, dim) — the distributed vector-mean that
    underlies IVF coarse quantizers and k-means steps. The shuffle
    carries (label, dim, partial sum/count), never whole vectors."""
    emb = load(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("dim", "val")
    ).filter(F.col("dim") < CENTROID_DIMS)
    # bigint dim: DuckDB generate_subscripts yields int64
    exploded = exploded.withColumn("dim", F.col("dim").cast("bigint"))
    return exploded.groupBy("label", "dim").agg(
        F.round(F.avg(F.col("val").cast("double")), 6).alias("centroid_val"),
        F.count(F.lit(1)).alias("n_vectors"),
    )


CENTROID_SQL = f"""
WITH exploded AS (
  SELECT label,
         generate_subscripts(embedding, 1) - 1 AS dim,
         UNNEST(embedding) AS val
  FROM embeddings
)
SELECT label, dim,
       ROUND(AVG(CAST(val AS DOUBLE)), 6) AS centroid_val,
       COUNT(*) AS n_vectors
FROM exploded WHERE dim < {CENTROID_DIMS}
GROUP BY label, dim
"""


EMB_NORM_SQL = """
WITH norms AS (
  SELECT label,
         sqrt(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
  FROM embeddings
)
SELECT label, COUNT(*) AS n_vectors,
       ROUND(MIN(norm), 4) AS min_norm,
       ROUND(MAX(norm), 4) AS max_norm,
       ROUND(AVG(norm), 4) AS avg_norm
FROM norms GROUP BY label
"""


# ---------------------------------------------------------------------------
# Int8 symmetric quantization: the storage/serving compression step for
# embedding tables (scale = max|x|/127, q = round-half-up(x/scale)).
# All per-row JVM HOF arithmetic — the only shuffle is the final tiny
# per-label rollup, and the shuffle rows carry scalars, never vectors.
# Cross-engine note: round-half-up is spelled floor(x + 0.5) so both
# engines compute the identical IEEE-double sequence; error sums use a
# left fold (F.aggregate / list_reduce) so addition order matches.

QUANT_LEVELS = 127


def embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label accounting of int8 quantization: quantized-value
    checksums plus mean absolute reconstruction error — the quality
    gate run before swapping a float32 ANN index for an int8 one."""
    emb = load(spark, sf_dir, "embeddings")
    vec = F.transform("embedding", lambda x: x.cast("double"))
    maxabs = F.array_max(F.transform(vec, lambda x: F.abs(x)))
    scale = maxabs / QUANT_LEVELS
    q = F.transform(vec, lambda x: F.floor(x / scale + 0.5))
    q_sum = F.aggregate(q, F.lit(0).cast("bigint"), lambda a, x: a + x)
    q_l1 = F.aggregate(
        q, F.lit(0).cast("bigint"), lambda a, x: a + F.abs(x)
    )
    err = F.aggregate(
        F.zip_with(q, vec, lambda qi, xi: F.abs(qi * scale - xi)),
        F.lit(0.0),
        lambda a, x: a + x,
    ) / F.size(vec)
    per_vec = emb.select(
        "label",
        q_sum.alias("q_sum"),
        q_l1.alias("q_l1"),
        err.alias("err"),
        scale.alias("scale"),
    )
    return per_vec.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum("q_sum").cast("bigint").alias("sum_q"),
        F.sum("q_l1").cast("bigint").alias("sum_q_l1"),
        F.round(F.avg("err"), 6).alias("avg_abs_err"),
        F.round(F.avg("scale"), 6).alias("avg_scale"),
    )


QUANT_SQL = f"""
WITH per_vec AS (
  SELECT label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
           / {QUANT_LEVELS} AS scale
  FROM embeddings
), quant AS (
  SELECT label, vec, scale,
         list_transform(vec, x -> floor(x / scale + 0.5)) AS q
  FROM per_vec
), checks AS (
  SELECT label, scale,
         CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(q, x -> CAST(x AS BIGINT))),
              (a, x) -> a + x) AS BIGINT) AS q_sum,
         CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(q, x -> CAST(abs(x) AS BIGINT))),
              (a, x) -> a + x) AS BIGINT) AS q_l1,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
              list_transform(list_zip(q, vec),
                p -> abs(p[1] * scale - p[2]))),
              (a, x) -> a + x) / len(vec) AS err
  FROM quant
)
SELECT label, COUNT(*) AS n_vectors,
       CAST(SUM(q_sum) AS BIGINT) AS sum_q,
       CAST(SUM(q_l1) AS BIGINT) AS sum_q_l1,
       ROUND(AVG(err), 6) AS avg_abs_err,
       ROUND(AVG(scale), 6) AS avg_scale
FROM checks GROUP BY label
"""


# ---------------------------------------------------------------------------
# Binary quantization + Hamming search (sign-bit codes; the 1-bit
# compression tier below int8/PQ — 64 dims -> 8 bytes/vector)

BQ_RERANK_R = 40
BQ_TOP_K = 10


def _pack_bits(vec_col, lo: int, hi: int):
    """Pack sign bits [lo, hi) of an array column into one BIGINT
    (<= 32 bits per word so the packing is portable — no sign-bit
    overflow in either engine)."""
    return F.aggregate(
        F.sequence(F.lit(lo), F.lit(hi - 1)),
        F.lit(0).cast("bigint"),
        lambda acc, i: acc
        + F.when(
            F.element_at(F.col(vec_col), i + 1) >= 0,
            # 2^(i-lo) as exact double->bigint (exponent <= 31;
            # shiftleft only takes literal shift amounts)
            F.pow(F.lit(2.0), (i - F.lit(lo)).cast("double")).cast(
                "bigint"
            ),
        ).otherwise(F.lit(0).cast("bigint")),
    )


def ann_binary_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage binary-quantized ANN: sign-bit codes (two 32-bit words
    per 64-dim vector — a 32x compression over float32) scanned with
    bit_count(xor) Hamming distance, top BQ_RERANK_R candidates exactly
    re-scored by cosine against their raw floats.

    Scale design: the code table is 16 bytes/vector, so the Hamming
    scan is a map-only pass over a table 32x smaller than the corpus —
    the classic first-tier filter in front of PQ/exact rerank. The R
    candidate ids are driver scalars, so the re-rank reads carry a
    pushed ``vec_id IN (...)`` parquet filter (R row-group lookups, no
    corpus scan; same contract as pq.ann_ivfpq_rerank_topk)."""
    emb = load(spark, sf_dir, "embeddings")
    codes = emb.select(
        "vec_id",
        _pack_bits("embedding", 0, 32).alias("w0"),
        _pack_bits("embedding", 32, 64).alias("w1"),
    )
    qc = codes.filter(F.col("vec_id") == QUERY_VEC_ID).first()
    ham = (
        F.bit_count(
            F.col("w0").bitwiseXOR(F.lit(int(qc["w0"])).cast("bigint"))
        )
        + F.bit_count(
            F.col("w1").bitwiseXOR(F.lit(int(qc["w1"])).cast("bigint"))
        )
    ).cast("bigint")
    cand = (
        codes.filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", ham.alias("hamming"))
        .orderBy(F.asc("hamming"), F.asc("vec_id"))
        .limit(BQ_RERANK_R)
        .collect()
    )
    cand_ids = [r["vec_id"] for r in cand]
    ham_by_id = {r["vec_id"]: int(r["hamming"]) for r in cand}
    # fresh scan so the IN filter reaches the parquet reader
    raw = load(spark, sf_dir, "embeddings").filter(
        F.col("vec_id").isin(cand_ids)
    )
    q = load(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") == QUERY_VEC_ID
    ).select(F.col("embedding").alias("qvec"))
    sim = cosine_similarity(F.col("embedding"), F.col("qvec"))
    ham_map = F.create_map(
        *[F.lit(x) for kv in ham_by_id.items() for x in kv]
    )
    return (
        raw.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.element_at(ham_map, F.col("vec_id"))
            .cast("bigint")
            .alias("hamming"),
            F.round(sim, 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(BQ_TOP_K)
    )


def _binary_hamming_sql() -> str:
    def pack(col: str, lo: int, hi: int) -> str:
        return (
            f"list_sum(list_transform(range({lo}, {hi}), i -> "
            f"CASE WHEN {col}[i + 1] >= 0 THEN (CAST(1 AS BIGINT) << (i - {lo})) "
            f"ELSE CAST(0 AS BIGINT) END))"
        )

    return f"""
WITH codes AS (
  SELECT vec_id,
         {pack('embedding', 0, 32)} AS w0,
         {pack('embedding', 32, 64)} AS w1
  FROM embeddings
), qc AS (
  SELECT w0 AS qw0, w1 AS qw1 FROM codes WHERE vec_id = {QUERY_VEC_ID}
), cand AS (
  SELECT vec_id,
         CAST(bit_count(xor(w0, qw0)) + bit_count(xor(w1, qw1)) AS BIGINT)
           AS hamming
  FROM codes, qc WHERE vec_id <> {QUERY_VEC_ID}
  ORDER BY hamming ASC, vec_id ASC LIMIT {BQ_RERANK_R}
), q AS (
  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qvec
  FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
)
SELECT e.vec_id, e.label, c.hamming,
       ROUND(
         list_sum(list_transform(range(1, len(e.embedding) + 1),
                  i -> CAST(e.embedding[i] AS DOUBLE) * qvec[i]))
         / (sqrt(list_sum(list_transform(e.embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * sqrt(list_sum(list_transform(qvec, x -> x * x)))), 6)
         AS cos_sim
FROM embeddings e JOIN cand c USING (vec_id), q
ORDER BY cos_sim DESC, vec_id ASC LIMIT {BQ_TOP_K}
"""


ANN_BINARY_HAMMING_SQL = _binary_hamming_sql()
