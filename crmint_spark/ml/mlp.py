"""Distributed multi-layer-perceptron regressor.

BQML's ``DNN_REGRESSOR`` (ref: backend/controller/ml_model/
compiler.py:50-62 allows DNN_* model types) has no Spark ML twin —
``MultilayerPerceptronClassifier`` exists, an MLP *regressor* does not.
This module implements one the way Spark ML implements its own iterative
estimators:

- **Training** = full-batch gradient descent. Each iteration is ONE
  distributed pass: ``mapInPandas`` computes gradient sums with numpy
  (vectorized backprop, no per-row Python), accumulated across all
  Arrow batches of a partition so exactly ONE param-sized row per
  partition reaches the driver — O(partitions x n_params) traffic,
  independent of data volume — which applies the Adam update. This is
  the treeAggregate-gradients contract Spark ML's own LBFGS/GBT loops
  use; data never leaves the executors.
- **Inference** = a generated Spark SQL expression (tanh + arithmetic
  over the standardized feature columns). No UDF, no Python at scoring
  time — the fitted network IS a codegen'd expression, so ML.PREDICT
  output stays inside whole-stage codegen at any scale.

Features are standardized (one agg pass) and the standardization is
folded into the scoring expression.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _shapes(d: int, hidden: list[int]) -> list[tuple[int, int]]:
    dims = [d] + list(hidden) + [1]
    return [(dims[i], dims[i + 1]) for i in range(len(dims) - 1)]


def _flatten(ws: list[np.ndarray], bs: list[np.ndarray]) -> np.ndarray:
    return np.concatenate([w.ravel() for w in ws] + [b.ravel() for b in bs])


def _unflatten(
    flat: np.ndarray, shapes: list[tuple[int, int]]
) -> tuple[list[np.ndarray], list[np.ndarray]]:
    ws, bs, i = [], [], 0
    for r, c in shapes:
        ws.append(flat[i : i + r * c].reshape(r, c))
        i += r * c
    for _, c in shapes:
        bs.append(flat[i : i + c])
        i += c
    return ws, bs


class MLPRegressorModel:
    """Fitted network: JSON-persistable, scores via a SQL expression."""

    def __init__(
        self,
        feature_cols: list[str],
        mu: list[float],
        sigma: list[float],
        hidden: list[int],
        flat_weights: list[float],
    ):
        self.feature_cols = list(feature_cols)
        self.mu = list(mu)
        self.sigma = list(sigma)
        self.hidden = list(hidden)
        self.flat_weights = list(flat_weights)

    def _expression(self) -> Column:
        shapes = _shapes(len(self.feature_cols), self.hidden)
        ws, bs = _unflatten(np.asarray(self.flat_weights), shapes)
        # NULL features are imputed to 0 exactly as in training
        # (na_value=0.0), so a row scores identically in both paths
        acts: list[Column] = [
            (
                F.coalesce(F.col(c).cast("double"), F.lit(0.0))
                - F.lit(self.mu[i])
            )
            / F.lit(self.sigma[i])
            for i, c in enumerate(self.feature_cols)
        ]
        for li, (w, b) in enumerate(zip(ws, bs)):
            nxt: list[Column] = []
            for j in range(w.shape[1]):
                z: Column = F.lit(float(b[j]))
                for i in range(w.shape[0]):
                    z = z + F.lit(float(w[i, j])) * acts[i]
                nxt.append(z if li == len(ws) - 1 else F.tanh(z))
            acts = nxt
        return acts[0]

    def transform(self, df: DataFrame) -> DataFrame:
        return df.withColumn("prediction", self._expression())

    def write(self) -> "MLPRegressorModel":
        """Spark ML writer-API shim: write().overwrite().save(path)."""
        return self

    def overwrite(self) -> "MLPRegressorModel":
        return self

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "mlp.json"), "w") as f:
            json.dump(
                {
                    "feature_cols": self.feature_cols,
                    "mu": self.mu,
                    "sigma": self.sigma,
                    "hidden": self.hidden,
                    "flat_weights": self.flat_weights,
                },
                f,
            )

    @classmethod
    def load(cls, path: str) -> "MLPRegressorModel":
        with open(os.path.join(path, "mlp.json")) as f:
            d = json.load(f)
        return cls(
            d["feature_cols"], d["mu"], d["sigma"], d["hidden"], d["flat_weights"]
        )

    @staticmethod
    def is_saved(path: str) -> bool:
        return os.path.exists(os.path.join(path, "mlp.json"))


class MLPRegressor:
    def __init__(
        self,
        feature_cols: list[str],
        label_col: str,
        hidden: list[int] | None = None,
        max_iter: int = 60,
        step: float = 0.1,
        l2: float = 1e-4,
        seed: int = 7,
    ):
        self.feature_cols = list(feature_cols)
        self.label_col = label_col
        self.hidden = [int(h) for h in (hidden or [8])]
        self.max_iter = int(max_iter)
        self.step = float(step)
        self.l2 = float(l2)
        self.seed = int(seed)

    def fit(self, df: DataFrame) -> MLPRegressorModel:
        feats, label = self.feature_cols, self.label_col
        d = len(feats)
        # BQML excludes NULL-label rows from training (features-only NULL
        # imputation stays, mirrored by the scoring expression); train and
        # compute standardization stats on the same filtered population.
        df = df.filter(F.col(label).isNotNull())
        stats = df.agg(
            *[F.avg(F.col(c).cast("double")).alias(f"mu_{i}") for i, c in enumerate(feats)],
            *[
                F.stddev_pop(F.col(c).cast("double")).alias(f"sd_{i}")
                for i, c in enumerate(feats)
            ],
            F.avg(F.col(label).cast("double")).alias("y_mu"),
        ).first()
        mu = [float(stats[f"mu_{i}"] or 0.0) for i in range(d)]
        sigma = [
            float(s) if (s := stats[f"sd_{i}"]) and s > 1e-12 else 1.0
            for i in range(d)
        ]
        y_mu = float(stats["y_mu"] or 0.0)

        shapes = _shapes(d, self.hidden)
        rng = np.random.default_rng(self.seed)
        ws = [
            rng.normal(0.0, 1.0 / np.sqrt(max(r, 1)), size=(r, c))
            for r, c in shapes
        ]
        bs = [np.zeros(c) for _, c in shapes]
        # output bias starts at the label mean: centered residual learning
        bs[-1][:] = y_mu
        # Adam state: each distributed pass is expensive relative to the
        # driver-side update, so spend it on a fast-converging optimizer
        m1 = np.zeros(_flatten(ws, bs).shape)
        m2 = np.zeros_like(m1)

        # the per-iteration pass only needs (features, label) as doubles;
        # cache the projected input so every iteration is a narrow scan
        data = df.select(
            *[F.col(c).cast("double").alias(c) for c in feats],
            F.col(label).cast("double").alias("__y"),
        ).persist()
        n_total = data.count()
        if n_total == 0:
            data.unpersist()
            raise ValueError("MLPRegressor: empty training input")

        mu_a = np.asarray(mu)
        sd_a = np.asarray(sigma)
        hidden = self.hidden
        n_params = _flatten(ws, bs).size
        grad_schema = "grad array<double>, sse double, n bigint"

        for it in range(self.max_iter):
            flat = _flatten(ws, bs)

            def batch_grads(batches, _flat=flat):
                # Accumulate across ALL Arrow batches of this partition and
                # yield exactly ONE param-sized row, so per-iteration driver
                # traffic is O(partitions x n_params), independent of data
                # volume (Spark ML's own treeAggregate contract).
                import pandas as pd

                _ws, _bs = _unflatten(_flat, shapes)
                acc = np.zeros(_flat.size)
                sse = 0.0
                n = 0
                for pdf in batches:
                    X = pdf[feats].to_numpy(dtype=float, na_value=0.0)
                    y = pdf["__y"].to_numpy(dtype=float, na_value=0.0)
                    a = (X - mu_a) / sd_a
                    acts = [a]
                    for li, (w, b) in enumerate(zip(_ws, _bs)):
                        z = acts[-1] @ w + b
                        acts.append(z if li == len(_ws) - 1 else np.tanh(z))
                    pred = acts[-1][:, 0]
                    err = pred - y
                    g_ws = [np.zeros_like(w) for w in _ws]
                    g_bs = [np.zeros_like(b) for b in _bs]
                    delta = err[:, None]
                    for li in range(len(_ws) - 1, -1, -1):
                        g_ws[li] = acts[li].T @ delta
                        g_bs[li] = delta.sum(axis=0)
                        if li > 0:
                            delta = (delta @ _ws[li].T) * (1.0 - acts[li] ** 2)
                    acc += _flatten(g_ws, g_bs)
                    sse += float((err**2).sum())
                    n += int(len(y))
                if n > 0:
                    yield pd.DataFrame(
                        {"grad": [acc.tolist()], "sse": [sse], "n": [n]}
                    )

            parts = data.mapInPandas(batch_grads, schema=grad_schema).collect()
            gsum = np.zeros(n_params)
            for row in parts:
                gsum += np.asarray(row["grad"])
            grad = gsum / n_total + self.l2 * flat
            b1, b2, eps = 0.9, 0.999, 1e-8
            m1 = b1 * m1 + (1 - b1) * grad
            m2 = b2 * m2 + (1 - b2) * grad * grad
            mhat = m1 / (1 - b1 ** (it + 1))
            vhat = m2 / (1 - b2 ** (it + 1))
            flat = flat - self.step * mhat / (np.sqrt(vhat) + eps)
            ws, bs = _unflatten(flat, shapes)

        data.unpersist()
        return MLPRegressorModel(feats, mu, sigma, hidden, _flatten(ws, bs).tolist())
