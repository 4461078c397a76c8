"""Deterministic PCA over the ``embeddings`` table (power iteration).

The top principal component of an embedding corpus is the workhorse
statistic of training-data pipelines: it drives whitening (the common
"remove the first component" post-processing of sentence embeddings,
Arora et al., ICLR 2017), embedding-drift monitoring between corpus
snapshots, and anisotropy diagnostics. Spark ML's PCA materializes the
full d x d covariance via RowMatrix; this operator instead runs POWER
ITERATION, whose per-step cost is one scalar-carrying aggregation —
the right shape when d is small and n is enormous:

- mean: posexplode to (dim, val) scalars, groupBy(dim) AVG — map-side
  combine, shuffle carries d partial sums regardless of corpus size.
- each iteration: C.v = (1/n) * sum_x (x - mu) * ((x - mu) . v)
  without ever forming C — per row ONE fused expression computes the
  centered vector and its projection s (JVM HOFs, no Python), then the
  same d-scalar shuffle sums s * (x - mu) per dim.
- v_{k+1} = round(C.v / ||C.v||, 6): iterates are ROUND()ed to 6 dp
  every step (exactly the Lloyd-step discipline in ivf.py), which
  absorbs engine-specific float-summation order so the DuckDB oracle
  reproduces the whole trajectory bit-for-bit; normalization happens on
  rounded inputs with correctly-rounded IEEE sqrt/divide on both
  engines.
- the fit runs on the same vec_id-stride trainer sample as the PQ/IVF
  quantizers (ivf._train_stride), so state and IO stay sample-sized at
  any corpus size.

PCA_ITERS fixed iterations from the deterministic e_1 start vector;
with the fixture's spectral gap the Rayleigh quotient stabilizes well
within that budget, and determinism — not last-ulp convergence — is
the contract the oracle certifies.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from .ivf import IVF_TRAIN_ROWS, _round6_half_up, _train_stride

PCA_ITERS = 24


def embedding_pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: (dim, mean_val, pc1, eigenvalue) — the per-dim
    corpus mean, the top principal direction, and its variance
    (Rayleigh quotient), all deterministic and oracle-certified.

    The whole fit runs on the stride-bounded trainer sample (<=
    ~IVF_TRAIN_ROWS rows at ANY corpus size), so since round 11 the
    sample is collected ONCE and the 24 power iterations run as plain
    driver float math instead of 24 explode+groupBy+collect Spark jobs
    (optimization guide §1.2/§5: the per-job scheduling + codegen
    overhead dominated — ~6 s for a 250x64 sample). Arithmetic is
    kept step-for-step identical to the previous in-engine form: the
    projection s is the same left fold in dim order, per-dim sums
    round to 6 dp through the same HALF_UP rule as Spark's ROUND
    (``_round6_half_up``), and normalization still uses Python round/
    sqrt on rounded inputs — so the iterate trajectory, and therefore
    the oracle-certified output, is bit-identical (parity-verified)."""
    from .similarity import _corpus_stats

    n_all, dims = _corpus_stats(spark, sf_dir)
    ts = _train_stride(n_all)
    sample = [
        [float(x) for x in r["v"]]
        for r in load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % ts == 0)
        .select(F.transform("embedding", lambda x: x.cast("double")).alias("v"))
        .collect()
    ]
    n = len(sample)

    mu = [
        _round6_half_up(sum(row[d] for row in sample) / n)
        for d in range(dims)
    ]
    centered = [[row[d] - mu[d] for d in range(dims)] for row in sample]

    v = [1.0] + [0.0] * (dims - 1)
    eig = 0.0
    for _ in range(PCA_ITERS):
        sums = [0.0] * dims
        for c in centered:
            # projection s: left fold in dim order — the exact order the
            # in-engine F.aggregate(zip_with(...)) fold used
            s = 0.0
            for d in range(dims):
                s = s + c[d] * v[d]
            for d in range(dims):
                sums[d] += c[d] * s
        w = [_round6_half_up(sums[d] / n) for d in range(dims)]
        eig = round(math.sqrt(sum(x * x for x in w)), 6)
        if eig == 0.0:
            break
        v = [round(x / eig, 6) for x in w]

    out = spark.createDataFrame(
        [(d, mu[d], v[d], eig) for d in range(dims)],
        "dim int, mean_val double, pc1 double, eigenvalue double",
    )
    return out


def _pca_oracle_sql(dims: int = 64) -> str:
    """The identical trajectory in DuckDB: stride-sampled vecs, rounded
    per-dim mean, then PCA_ITERS unrolled (project, reduce, normalize)
    CTE triples. Sums differ from Spark's only in float addition order,
    which the ROUND(..., 6) at every step absorbs; sqrt/divide run on
    rounded inputs so both engines emit the same iterate."""
    parts = [
        f"""params AS (
  SELECT GREATEST(CAST(CEIL(COUNT(*) / {IVF_TRAIN_ROWS}.0) AS BIGINT), 1)
           AS tstride
  FROM embeddings
), vecs AS MATERIALIZED (
  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings, params WHERE vec_id % tstride = 0
), nn AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM vecs
), mu AS MATERIALIZED (
  SELECT dim, ROUND(AVG(val), 6) AS m
  FROM (
    SELECT generate_subscripts(v, 1) - 1 AS dim, UNNEST(v) AS val FROM vecs
  ) GROUP BY dim
), centered AS MATERIALIZED (
  SELECT list_transform(range(1, {dims} + 1), i -> v[i] - ml[i]) AS c, n
  FROM vecs, (SELECT list(m ORDER BY dim) AS ml FROM mu), nn
), v_0 AS (
  SELECT [CAST(1.0 AS DOUBLE)] ||
         list_transform(range(1, {dims}), i -> CAST(0.0 AS DOUBLE)) AS vl,
         CAST(0.0 AS DOUBLE) AS eig
)"""
    ]
    for k in range(1, PCA_ITERS + 1):
        parts.append(
            f"""w_{k} AS MATERIALIZED (
  SELECT dim, ROUND(SUM(contrib) / ANY_VALUE(n), 6) AS w
  FROM (
    SELECT generate_subscripts(c, 1) - 1 AS dim,
           UNNEST(list_transform(c, x -> x * s)) AS contrib, n
    FROM (
      SELECT c,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(range(1, {dims} + 1), i -> c[i] * vl[i])),
               (a, x) -> a + x) AS s,
             n
      FROM centered, v_{k - 1}
    )
  ) GROUP BY dim
), v_{k} AS MATERIALIZED (
  SELECT CASE WHEN eig = 0 THEN (SELECT vl FROM v_{k - 1})
         ELSE list_transform(wl, x -> ROUND(x / eig, 6)) END AS vl,
         eig
  FROM (
    SELECT wl,
           ROUND(SQRT(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(wl, x -> x * x)), (a, x) -> a + x)), 6) AS eig
    FROM (SELECT list(w ORDER BY dim) AS wl FROM w_{k})
  )
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT CAST(dim AS INT) AS dim, m AS mean_val,
       vl[dim + 1] AS pc1,
       eig AS eigenvalue
FROM mu, v_{PCA_ITERS}
ORDER BY dim
"""
    )


PCA_SQL = _pca_oracle_sql()
