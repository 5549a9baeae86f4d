"""ML-based pair scorer (reference V6/V7 family, from scratch).

The reference's ml_based resolver builds a per-pair feature vector
(ml_based.py:76-164) and scores it with a trained classifier
(RandomForest at ml_based.py:166-240; a Keras NN at deep_learning.py:
115-187). Neither sklearn nor any DL framework is assumed here: the
scorer is a from-scratch numpy logistic regression —

* features are computed DISTRIBUTED (one batch-vectorized Arrow UDF per
  pair batch — functions.fuzzy kernels + set overlap, no per-row Python);
* training collects only the small labeled sample to the driver (the
  reference trains driver-side too), fits full-batch gradient descent
  with fixed seed/iterations — bit-deterministic;
* scoring broadcasts the weight vector into a pandas_udf: sigmoid(Xw+b)
  per Arrow batch, executor-side.

This is the supervised alternative to the rule-based evidence combiner in
operators.verify; the feature set is the text-pair subset of the
reference's 19 features (name ratios, token overlap, length difference).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from entity_deduplication_spark.functions.fuzzy import (
    batch_ratio,
    batch_token_set_ratio,
    batch_token_sort_ratio,
)

FEATURE_NAMES = [
    "ratio",
    "token_sort_ratio",
    "token_set_ratio",
    "token_jaccard",
    "len_ratio",
]


def _feature_matrix(t1: list[str], t2: list[str]) -> np.ndarray:
    """(batch x 5) float64 feature matrix, fully batch-vectorized."""
    n = len(t1)
    f = np.empty((n, 5), dtype=np.float64)
    f[:, 0] = batch_ratio(t1, t2) / 100.0
    f[:, 1] = batch_token_sort_ratio(t1, t2) / 100.0
    f[:, 2] = batch_token_set_ratio(t1, t2) / 100.0
    for i, (a, b) in enumerate(zip(t1, t2)):  # set ops; strings are short
        sa, sb = set(a.split()), set(b.split())
        u = len(sa | sb)
        f[i, 3] = len(sa & sb) / u if u else 1.0
    la = np.fromiter((len(s) for s in t1), dtype=np.float64, count=n)
    lb = np.fromiter((len(s) for s in t2), dtype=np.float64, count=n)
    f[:, 4] = np.minimum(la, lb) / np.maximum(np.maximum(la, lb), 1.0)
    return f


def pair_features(
    pairs: DataFrame, text1: str = "_t1", text2: str = "_t2"
) -> DataFrame:
    """Append ``features array<double>`` (FEATURE_NAMES order) per pair."""

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _feat(s1: pd.Series, s2: pd.Series) -> pd.Series:
        a = ["" if v is None else str(v) for v in s1]
        b = ["" if v is None else str(v) for v in s2]
        return pd.Series(list(_feature_matrix(a, b)))

    return pairs.withColumn("features", _feat(F.col(text1), F.col(text2)))


def fit_logistic(
    X: np.ndarray, y: np.ndarray, iters: int = 300, lr: float = 1.0
) -> tuple[np.ndarray, float]:
    """Deterministic full-batch GD logistic regression -> (weights, bias)."""
    w = np.zeros(X.shape[1])
    b = 0.0
    n = len(y)
    for _ in range(iters):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-np.clip(z, -30, 30)))
        g = p - y
        w -= lr * (X.T @ g) / n
        b -= lr * float(g.mean())
    return w, b


def train_pair_scorer(
    labeled: DataFrame, label_col: str = "label"
) -> tuple[np.ndarray, float]:
    """Fit on a (features, label) DataFrame — the labeled sample is small
    by construction (reference trains on ~10^3-10^4 pairs driver-side,
    ml_based.py:200-240); sort by features for order-independence."""
    pdf = labeled.select("features", label_col).toPandas()
    X = np.stack(pdf["features"].to_numpy())
    y = pdf[label_col].to_numpy().astype(np.float64)
    order = np.lexsort(X.T[::-1])
    return fit_logistic(X[order], y[order])


def score_with_model(
    pairs_with_features: DataFrame, w: np.ndarray, b: float
) -> DataFrame:
    """Append ``ml_score`` = sigmoid(features . w + b); weights broadcast
    in the UDF closure (tiny), evaluated per Arrow batch."""
    wv = np.asarray(w, dtype=np.float64)
    bv = float(b)

    @F.pandas_udf(T.DoubleType())
    def _score(feats: pd.Series) -> pd.Series:
        X = np.stack(feats.to_numpy())
        z = X @ wv + bv
        return pd.Series(1.0 / (1.0 + np.exp(-np.clip(z, -30, 30))))

    return pairs_with_features.withColumn(
        "ml_score", F.round(_score(F.col("features")), 4)
    )
