"""BQML ``MODEL_TYPE='PCA'``: deterministic principal components with
``ML.PREDICT`` / ``ML.PRINCIPAL_COMPONENTS`` /
``ML.PRINCIPAL_COMPONENT_INFO`` serving.

BigQuery's PCA (dimensionality-reduction docs; CRMint passes CREATE
MODEL OPTIONS through verbatim) trains full/randomized SVD. The engine
substitutes **power iteration with deflation over the bounded trainer
sample** — the operators/pca.py discipline lifted to the BQML surface:

- features / NULL handling / stats / hash-order top-256 sample: the
  shared trainer front-end (ml/kmeans.fit_stats_and_sample). Features
  are always mean-centered (PCA requires it); SCALE_FEATURES (default
  false) additionally z-scores.
- covariance: C = (1/m) * sum_p p p^T accumulated in value-sorted
  sample order — exact fold, replayed identically by the DuckDB
  oracle (no rounding needed: both engines fold identical doubles in
  the same order).
- each component: PCA_ITERS power-iteration steps from e_1, every
  iterate ROUND()ed to 6 dp after normalization (the rounding absorbs
  correctly-rounded-sqrt/divide ulps and keeps the trajectory
  bit-reproducible); eigenvalue = Rayleigh quotient v^T C v, then
  Hotelling deflation C <- C - lambda v v^T before the next component.
- explained_variance_ratio = lambda_i / trace(C_0).

Documented divergences: fixed iteration count (determinism, not
last-ulp convergence, is the contract — same note as operators/pca.py),
components fit on the bounded sample, PCA_EXPLAINED_VARIANCE_RATIO
model option rejects loudly (use NUM_PRINCIPAL_COMPONENTS), and the
component SIGN follows the power-iteration start vector (BigQuery's
SVD sign is unspecified too).

Serving is map-only: ML.PREDICT projects each row onto the broadcast
loading vectors with one fused fold per component — no shuffle, no
Python.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .kmeans import _round6, fit_stats_and_sample

PCA_ITERS = 48  # 0.8^48 ~ 2e-5 residual mixing even at eigengap 0.8


def fit_pca_state(
    df: DataFrame, num_components: int, scale_features: bool
) -> dict:
    """Deterministic deflated power iteration (module docstring) ->
    {cols, mu, sigma, components (k x d), eigenvalues (k), total_var,
    scale, sample_n}."""
    cols, mu, sigma, sample = fit_stats_and_sample(
        df, center=True, scale=scale_features
    )
    d = len(cols)
    k = int(num_components)
    if not 1 <= k <= d:
        raise ValueError(
            f"PCA: NUM_PRINCIPAL_COMPONENTS={k} out of range 1..{d}"
        )
    m = len(sample)
    # covariance folds in value-sorted sample order (oracle-identical)
    cov = [[0.0] * d for _ in range(d)]
    for p in sample:
        for a in range(d):
            for b in range(d):
                cov[a][b] += p[a] * p[b]
    for a in range(d):
        for b in range(d):
            cov[a][b] = cov[a][b] / m
    total_var = 0.0
    for a in range(d):
        total_var += cov[a][a]
    comps: list[list[float]] = []
    eigs: list[float] = []
    c = [row[:] for row in cov]
    for _ in range(k):
        v = [1.0] + [0.0] * (d - 1)
        for _t in range(PCA_ITERS):
            w = []
            for a in range(d):
                acc = 0.0
                for b in range(d):
                    acc += c[a][b] * v[b]
                w.append(acc)
            nrm_sq = 0.0
            for a in range(d):
                nrm_sq += w[a] * w[a]
            nrm = math.sqrt(nrm_sq)
            if nrm == 0.0:
                break
            v = [_round6(w[a] / nrm) for a in range(d)]
        # Rayleigh quotient: lambda = v . (C v)
        lam = 0.0
        for a in range(d):
            acc = 0.0
            for b in range(d):
                acc += c[a][b] * v[b]
            lam += v[a] * acc
        lam = _round6(lam)
        comps.append(v)
        eigs.append(lam)
        # Hotelling deflation
        for a in range(d):
            for b in range(d):
                c[a][b] = c[a][b] - lam * v[a] * v[b]
    return {
        "cols": cols,
        "mu": mu,
        "sigma": sigma,
        "components": comps,
        "eigenvalues": eigs,
        "total_var": total_var,
        "scale": bool(scale_features),
        "sample_n": m,
    }


def project_frame(spark: SparkSession, state: dict, df: DataFrame) -> DataFrame:
    """ML.PREDICT for PCA: input rows + principal_component_1..k — the
    centered/scaled row dotted with each broadcast loading vector (one
    fused JVM fold per component; `+ 0` kills the -0.0 hash class)."""
    cols = state["cols"]
    d = len(cols)
    std = F.array(
        *[
            F.round(
                (F.col(c).cast("double") - F.lit(state["mu"][i]))
                / F.lit(state["sigma"][i]),
                6,
            )
            for i, c in enumerate(cols)
        ]
    )
    out = df.withColumn("__std", std)
    for ci, comp in enumerate(state["components"]):
        dot = F.aggregate(
            F.zip_with(
                "__std",
                F.array(*[F.lit(comp[j]) for j in range(d)]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        out = out.withColumn(
            f"principal_component_{ci + 1}", F.round(dot, 6) + F.lit(0.0)
        )
    return out.drop("__std")


def principal_components_frame(spark: SparkSession, state: dict) -> DataFrame:
    """ML.PRINCIPAL_COMPONENTS: (principal_component_id, feature,
    numerical_value) loadings — BigQuery's column shape."""
    rows = [
        (ci + 1, col, comp[j])
        for ci, comp in enumerate(state["components"])
        for j, col in enumerate(state["cols"])
    ]
    return spark.createDataFrame(
        rows,
        "principal_component_id bigint, feature string,"
        " numerical_value double",
    )


def principal_component_info_frame(
    spark: SparkSession, state: dict
) -> DataFrame:
    """ML.PRINCIPAL_COMPONENT_INFO: eigenvalue + explained variance
    ratio + cumulative ratio per component."""
    total = state["total_var"]
    rows = []
    cum = 0.0
    for ci, lam in enumerate(state["eigenvalues"]):
        ratio = _round6(lam / total) if total > 0 else 0.0
        cum = _round6(cum + ratio)
        rows.append((ci + 1, lam, ratio, cum))
    return spark.createDataFrame(
        rows,
        "principal_component_id bigint, eigenvalue double,"
        " explained_variance_ratio double,"
        " cumulative_explained_variance_ratio double",
    )


# ---------------------------------------------------------------------------
# AUTOENCODER (MODEL_TYPE='AUTOENCODER'): the engine serves the LINEAR
# autoencoder, which is exactly the PCA subspace (tied-weight linear
# AE minimizing reconstruction MSE spans the top-k principal
# directions — Baldi & Hornik 1989). DOCUMENTED DIVERGENCE: BigQuery
# trains a nonlinear network; the engine's latent space is the
# deterministic PCA fit above, so every serving path stays
# oracle-replicable. Bottleneck width = min(HIDDEN_UNITS).
#   ML.PREDICT          -> latent_col_0..k-1 (BigQuery's column names)
#   ML.EVALUATE         -> mean_absolute_error / mean_squared_error of
#                          the standardized-space reconstruction
#   ML.DETECT_ANOMALIES(MODEL m, STRUCT(c AS contamination), (q))
#                       -> per-row mean_squared_error + is_anomaly for
#                          the ceil(c*n) worst-reconstructed rows
#                          (threshold = the ceil((1-c)*n)-th smallest
#                          MSE — an exact order statistic, so the
#                          DuckDB oracle reproduces the flags;
#                          scale note: the order statistic is a global
#                          sort-and-offset — swap in approx_percentile
#                          at 100 TB, documented).
# ---------------------------------------------------------------------------


def _recon_error_exprs(state: dict):
    """(mse, mae) per-row reconstruction errors in standardized space;
    the mse fold order matches the DuckDB oracle exactly."""
    cols = state["cols"]
    d = len(cols)
    comps = state["components"]
    std = [
        F.round(
            (F.col(c).cast("double") - F.lit(state["mu"][i]))
            / F.lit(state["sigma"][i]),
            6,
        )
        for i, c in enumerate(cols)
    ]
    projs = []
    for comp in comps:
        acc = F.lit(0.0)
        for j in range(d):
            acc = acc + std[j] * F.lit(comp[j])
        projs.append(acc)
    mse = F.lit(0.0)
    mae = F.lit(0.0)
    for j in range(d):
        xhat = F.lit(0.0)
        for ci, comp in enumerate(comps):
            xhat = xhat + projs[ci] * F.lit(comp[j])
        err = std[j] - xhat
        mse = mse + err * err
        mae = mae + F.abs(err)
    return mse / F.lit(float(d)), mae / F.lit(float(d))


def _mse_expr(state: dict):
    return _recon_error_exprs(state)[0]


def reconstruction_errors(
    spark: SparkSession, state: dict, df: DataFrame
) -> DataFrame:
    """Input rows + 6 dp-rounded ``mean_squared_error`` (map-only)."""
    return df.withColumn(
        "mean_squared_error", F.round(_mse_expr(state), 6) + F.lit(0.0)
    )


def autoencoder_evaluate_frame(
    spark: SparkSession, state: dict, df: DataFrame
) -> DataFrame:
    mse, mae = _recon_error_exprs(state)
    return df.select(
        F.round(F.avg(mae), 6).alias("mean_absolute_error"),
        F.round(F.avg(mse), 6).alias("mean_squared_error"),
    )


def detect_reconstruction_anomalies(
    spark: SparkSession, state: dict, df: DataFrame, contamination: float
) -> DataFrame:
    """Flag the worst-reconstructed ``contamination`` fraction:
    threshold = the (floor((1-c)*n)+1)-th smallest MSE, flagging every
    row >= it — exactly ceil(c*n) rows without ties, never zero rows
    with them (ADVICE r6: the old strictly-greater form flagged
    floor(c*n) and could flag nothing on tied errors)."""
    if not 0.0 < contamination < 0.5:
        raise ValueError(
            f"contamination must be in (0, 0.5), got {contamination}"
        )
    scored = reconstruction_errors(spark, state, df)
    n = scored.count()
    k_pos = math.floor((1.0 - contamination) * n)
    thr_row = (
        scored.select("mean_squared_error")
        .orderBy("mean_squared_error")
        .offset(k_pos)
        .limit(1)
        .first()
    )
    thr = float(thr_row["mean_squared_error"])
    return scored.withColumn(
        "is_anomaly", F.col("mean_squared_error") >= F.lit(thr)
    )
