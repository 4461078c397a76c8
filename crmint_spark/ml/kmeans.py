"""BQML ``MODEL_TYPE='KMEANS'``: deterministic clustering with
``ML.PREDICT`` / ``ML.CENTROIDS`` / ``ML.EVALUATE`` serving.

BigQuery's KMEANS (clustering docs; CRMint passes CREATE MODEL OPTIONS
through verbatim) trains k-means++ with convergence stopping. The
engine substitutes a **deterministic bounded-sample Lloyd fit** — the
same trainer discipline as the PQ/IVF quantizers (operators/ivf.py):

- features: every numeric column of the training query, in SELECT
  order; rows with a NULL feature are dropped (documented divergence —
  BigQuery mean-imputes); non-numeric columns reject loudly (BigQuery
  one-hot-encodes them; feed ML.ONE_HOT_ENCODER through TRANSFORM).
- STANDARDIZE_FEATURES (default true): z-score with mean/stddev_pop
  ROUND()ed to 6 dp, standardized values ROUND()ed to 6 dp — the
  rounding absorbs engine-specific float-summation order so a DuckDB
  oracle replays the whole fit bit-for-bit (ivf.py:203 discipline).
- trainer sample: the 256 rows smallest by an engine-neutral
  arithmetic hash of the rounded standardized tuple (the q13
  ``hash_split_int`` trick — replayable in ANSI SQL, unlike
  xxhash64) — a TakeOrdered top-k, no global sort, driver state and
  fit cost corpus-size-independent.
- init: KMEANS++/RANDOM both map to k evenly-spaced rows of the sorted
  sample (documented divergence, deterministic by construction — the
  same class as the hparam grid substitution).
- Lloyd: fixed min(MAX_ITERATIONS, 10) rounds, no convergence test
  (determinism is the contract); assignment is argmin squared-L2 with
  first-lowest-id tie-break; new centroids are per-dim means
  accumulated in sample-rank order, ROUND()ed to 6 dp; a cluster that
  loses all members keeps its previous centroid.
- DISTANCE_TYPE: EUCLIDEAN; COSINE rejects loudly (operator pointer:
  operators/similarity.py implements cosine bucketing).

Serving is exact and distributed: assignment broadcasts the k x d
centroid literal and computes the same fold per row (no Python, no
shuffle); ML.EVALUATE aggregates Davies-Bouldin and mean squared
distance over the scored input.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KMEANS_TRAIN_ROWS = 256
KMEANS_MAX_LLOYD = 10

_NUMERIC = ("int", "bigint", "smallint", "tinyint", "double", "float")


def _feature_cols(df: DataFrame) -> list[str]:
    cols = []
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        if t in _NUMERIC or t.startswith("decimal"):
            cols.append(f.name)
        else:
            raise ValueError(
                f"KMEANS/PCA: column {f.name!r} has non-numeric type "
                f"{t}; BigQuery auto-encodes such columns — the engine "
                "needs numeric features: exclude it, or transform it "
                "numerically (ML.LABEL_ENCODER / ML.BUCKETIZE / a CASE "
                "expression). One-hot struct arrays are not consumable "
                "by the clustering trainers."
            )
    if not cols:
        raise ValueError("KMEANS: the training query has no feature columns")
    return cols


def fit_stats_and_sample(
    df: DataFrame, center: bool, scale: bool
) -> tuple[list[str], list[float], list[float], list[list[float]]]:
    """Shared deterministic trainer front-end (KMEANS here, PCA in
    pca_model.py): numeric feature columns, NULL rows dropped, 6 dp
    mean/stddev_pop stats, 6 dp standardized values, and the value-
    sorted engine-neutral hash-order top-256 sample (module docstring).
    -> (cols, mu, sigma, sample)."""
    cols = _feature_cols(df)
    d = len(cols)
    feats = df.select(
        *[F.col(c).cast("double").alias(c) for c in cols]
    ).na.drop()
    if center or scale:
        stats = feats.select(
            *[F.round(F.avg(c), 6).alias(f"mu{i}") for i, c in enumerate(cols)],
            *[
                F.round(F.stddev_pop(c), 6).alias(f"sd{i}")
                for i, c in enumerate(cols)
            ],
        ).first()
        mu = [float(stats[f"mu{i}"]) if center else 0.0 for i in range(d)]
        # constant columns standardize to 0 (sigma 1), as in BigQuery
        sigma = [
            float(stats[f"sd{i}"]) if scale and stats[f"sd{i}"] else 1.0
            for i in range(d)
        ]
    else:
        mu, sigma = [0.0] * d, [1.0] * d
    std = feats.select(
        *[
            F.round((F.col(c) - F.lit(mu[i])) / F.lit(sigma[i]), 6).alias(c)
            for i, c in enumerate(cols)
        ]
    )
    # engine-neutral sample hash over the exact integer micro-units of
    # the 6 dp standardized tuple: h = fold((h * 9973 + v_j) % p)
    h = F.lit(7).cast("bigint")
    for c in cols:
        v = F.round(F.col(c) * 1_000_000).cast("bigint")
        h = (h * 9973 + v) % 1_000_000_007
    sample_rows = (
        std.withColumn("__h", h)
        .orderBy("__h", *[F.col(c) for c in cols])
        .limit(KMEANS_TRAIN_ROWS)
        .collect()
    )
    sample = sorted([float(r[c]) for c in cols] for r in sample_rows)
    return cols, mu, sigma, sample


def fit_kmeans_state(
    df: DataFrame,
    k: int,
    max_iterations: int,
    standardize: bool,
) -> dict:
    """Deterministic Lloyd fit (module docstring) -> persistable state:
    {cols, mu, sigma, centroids (k x d, standardized space), k,
    standardize, iters, sample_n}."""
    cols, mu, sigma, sample = fit_stats_and_sample(
        df, center=standardize, scale=standardize
    )
    d = len(cols)
    m = len(sample)
    if m < k:
        raise ValueError(f"KMEANS: {m} rows < NUM_CLUSTERS={k}")
    # init: k evenly-spaced rows of the value-sorted sample
    cent = [list(sample[(i * m) // k]) for i in range(k)]
    iters = min(int(max_iterations), KMEANS_MAX_LLOYD)
    for _ in range(iters):
        sums = [[0.0] * d for _ in range(k)]
        cnts = [0] * k
        for row in sample:  # value order: the oracle folds in the same
            best, bd = 0, None
            for ci in range(k):
                dist = 0.0
                for j in range(d):
                    diff = row[j] - cent[ci][j]
                    dist += diff * diff
                if bd is None or dist < bd:
                    best, bd = ci, dist
            cnts[best] += 1
            for j in range(d):
                sums[best][j] += row[j]
        for ci in range(k):
            if cnts[ci]:
                cent[ci] = [
                    _round6(sums[ci][j] / cnts[ci]) for j in range(d)
                ]
    return {
        "cols": cols,
        "mu": mu,
        "sigma": sigma,
        "centroids": cent,
        "k": k,
        "standardize": bool(standardize),
        "iters": iters,
        "sample_n": m,
    }


def _round6(x: float) -> float:
    """Spark/DuckDB ROUND(x, 6): half-away-from-zero, exact over the
    bounded standardized range."""
    scaled = x * 1e6
    f = math.floor(abs(scaled) + 0.5)
    return math.copysign(f, x) / 1e6


def _std_expr(state: dict, c: str, i: int):
    mu, sigma = state["mu"][i], state["sigma"][i]
    return F.round(
        (F.col(c).cast("double") - F.lit(mu)) / F.lit(sigma), 6
    )


def assign_frame(spark: SparkSession, state: dict, df: DataFrame) -> DataFrame:
    """Input rows + ``centroid_id`` (1-based, BigQuery's convention) +
    ``nearest_centroid_distance`` (squared L2 in standardized space,
    rounded; `+ 0` kills the -0.0 hash class). Broadcast codebook,
    map-only — no shuffle, corpus-size-independent state."""
    cols, cent = state["cols"], state["centroids"]
    k, d = state["k"], len(cols)
    std = F.array(*[_std_expr(state, c, i) for i, c in enumerate(cols)])
    tmp = df.withColumn("__std", std)
    dists = [
        F.aggregate(
            F.zip_with(
                "__std",
                F.array(*[F.lit(cent[ci][j]) for j in range(d)]),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for ci in range(k)
    ]
    best = F.lit(0)
    bd = dists[0]
    for ci in range(1, k):
        cond = dists[ci] < bd
        best = F.when(cond, F.lit(ci)).otherwise(best)
        bd = F.when(cond, dists[ci]).otherwise(bd)
    return (
        tmp.withColumn("centroid_id", (best + 1).cast("bigint"))
        .withColumn(
            "nearest_centroid_distance", F.round(bd, 6) + F.lit(0.0)
        )
        .drop("__std")
    )


def centroids_frame(spark: SparkSession, state: dict) -> DataFrame:
    """ML.CENTROIDS: (centroid_id, feature, numerical_value) — values
    reported in the ORIGINAL feature space (standardization undone),
    rounded to 6 dp."""
    rows = []
    for ci, c in enumerate(state["centroids"]):
        for j, col in enumerate(state["cols"]):
            val = c[j] * state["sigma"][j] + state["mu"][j]
            rows.append((ci + 1, col, _round6(val)))
    return spark.createDataFrame(
        rows, "centroid_id bigint, feature string, numerical_value double"
    )


def evaluate_frame(
    spark: SparkSession, state: dict, df: DataFrame
) -> DataFrame:
    """ML.EVALUATE for KMEANS: davies_bouldin_index +
    mean_squared_distance (BigQuery's two clustering metrics). The
    per-cluster scatter aggregates distributedly; the k x k
    between-centroid matrix folds on the driver."""
    scored = assign_frame(spark, state, df)
    per = {
        int(r["centroid_id"]): (float(r["msd"]), int(r["n"]))
        for r in scored.groupBy("centroid_id")
        .agg(
            F.avg(F.sqrt("nearest_centroid_distance")).alias("msd"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    msd_row = scored.select(
        F.avg("nearest_centroid_distance").alias("msd")
    ).first()
    cent = state["centroids"]
    k = state["k"]
    db_terms = []
    for i in range(k):
        if i + 1 not in per:
            continue
        worst = 0.0
        for j in range(k):
            if j == i or j + 1 not in per:
                continue
            dij = math.sqrt(
                sum((a - b) * (a - b) for a, b in zip(cent[i], cent[j]))
            )
            if dij > 0:
                worst = max(worst, (per[i + 1][0] + per[j + 1][0]) / dij)
        db_terms.append(worst)
    db = sum(db_terms) / len(db_terms) if db_terms else 0.0
    return spark.createDataFrame(
        [(round(db, 6), round(float(msd_row["msd"]), 6))],
        "davies_bouldin_index double, mean_squared_distance double",
    )


def detect_distance_anomalies(
    spark: SparkSession, state: dict, df: DataFrame, contamination: float
) -> DataFrame:
    """KMEANS ML.DETECT_ANOMALIES (BigQuery's contamination contract):
    flag the ``contamination`` fraction of rows farthest from their
    nearest centroid. Threshold = the (floor((1-c)*n)+1)-th smallest
    nearest-centroid distance, flagging every row >= it — exactly
    ceil(c*n) rows without ties, never zero with them (ADVICE r6) —
    the same exact order statistic as the AUTOENCODER path
    (pca_model.py; approx-quantile is the documented 100 TB swap).
    Output adds ``normalized_distance`` (BigQuery's column) = the
    flagged row's distance."""
    if not 0.0 < contamination < 0.5:
        raise ValueError(
            f"contamination must be in (0, 0.5), got {contamination}"
        )
    scored = assign_frame(spark, state, df)
    n = scored.count()
    k_pos = math.floor((1.0 - contamination) * n)
    thr = float(
        scored.select("nearest_centroid_distance")
        .orderBy("nearest_centroid_distance")
        .offset(k_pos)
        .limit(1)
        .first()["nearest_centroid_distance"]
    )
    return scored.withColumn(
        "normalized_distance", F.col("nearest_centroid_distance")
    ).withColumn(
        "is_anomaly", F.col("nearest_centroid_distance") >= F.lit(thr)
    )
