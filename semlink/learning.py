"""Learning / reranking surface (SURVEY M1-M3, S7, X7).

The reference trains a scikit-learn classifier over per-candidate
feature dicts and applies it when `learning=<model>` is requested. The
sandbox has no sklearn, and the Spark-first recast stores the model as
a plain numpy weight vector in a small parquet artifact (S7), broadcast
to executors, applied as ONE vectorized pandas UDF over the assembled
feature-vector column (X7) — a logistic layer, which is exactly the
shape of the reference's linear rerankers.

Training (M2) is a driver-side closed-form/gradient fit over a
SAMPLED labeled set — model fitting over ≤1e6 labeled pairs is not a
distributed problem; feature EXTRACTION at 10^12 rows is, and that
part stays in Spark.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

# fixed feature order for the X7 assembly (documented contract)
FEATURE_COLS = [
    "prior_prob", "link_prob", "sense_prob",
    "f_len_words", "f_len_chars", "f_is_initcap", "f_is_lower",
    "ctx_rel",
]


def assemble_features(cands: DataFrame) -> DataFrame:
    """X1 + X7: n-gram shape features + fixed-order feature vector."""
    d = (cands
         .withColumn("f_len_words", F.size(F.split("ngram", " ")).cast("double"))
         .withColumn("f_len_chars", F.length("ngram").cast("double"))
         .withColumn("f_is_initcap",
                     (F.col("ngram") == F.initcap("ngram")).cast("double"))
         .withColumn("f_is_lower",
                     (F.col("ngram") == F.lower("ngram")).cast("double")))
    if "ctx_rel" not in d.columns:
        d = d.withColumn("ctx_rel", F.lit(0.0))
    return d.withColumn(
        "features", F.array(*[F.col(c).cast("double") for c in FEATURE_COLS]))


def save_model(spark, weights: np.ndarray, bias: float, path: str) -> None:
    """S7: persist the weight vector as a one-row parquet artifact."""
    spark.createDataFrame(
        [([float(w) for w in weights], float(bias))],
        "weights array<double>, bias double").write.mode("overwrite").parquet(path)


def load_model(spark, path: str) -> tuple[np.ndarray, float]:
    row = spark.read.parquet(path).first()
    return np.array(row.weights), row.bias


def apply_model(cands: DataFrame, weights: np.ndarray, bias: float) -> DataFrame:
    """M1: vectorized σ(Xw + b) over the feature-vector column."""
    w = weights.astype("float64")
    b = float(bias)

    @F.pandas_udf(DoubleType())
    def score(feat: pd.Series) -> pd.Series:
        X = np.asarray(feat.tolist(), dtype="float64")
        if X.size == 0:
            return pd.Series(np.zeros(0))
        z = X @ w + b
        return pd.Series(1.0 / (1.0 + np.exp(-z)))

    return cands.withColumn("learning_score", score(F.col("features")))


def record_feedback(io, feedback: DataFrame) -> None:
    """M3: append user-labeled (mention, target, label) rows to the
    feedback table (the reference's /feedback route becomes an
    append-only table; training samples from it)."""
    io.write(feedback, "labeled_feedback", mode="append")


def fit_logistic(X: np.ndarray, y: np.ndarray, l2: float = 1e-3,
                 iters: int = 500, lr: float = 0.5) -> tuple[np.ndarray, float]:
    """M2: tiny deterministic batch gradient fit (driver-side, on a
    sample collected from the labeled_pairs join)."""
    Xs = np.hstack([X, np.ones((len(X), 1))])
    w = np.zeros(Xs.shape[1])
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(Xs @ w)))
        g = Xs.T @ (p - y) / len(y) + l2 * w
        w = w - lr * g
    return w[:-1], float(w[-1])
