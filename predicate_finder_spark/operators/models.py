"""Model-inference surface (M1/M2; SURVEY.md §2.9).

The reference scores candidates with a torch MGNN (mgnn/mgnn.py:98-125,
batched + padded in mgnn/test.py:24-91) and re-ranks with an XGBoost
regressor over 6 features (xgboost/test_xgb_pkl.py:72-74).  Neither torch
nor xgboost is in this container, so:

- the Spark-side shape is real: a scalar-iterator pandas UDF that loads the
  broadcast model ONCE per executor/python-worker and scores Arrow batches
  (the `predict_batch_udf` pattern) over the assembled feature columns;
- the model kernel is pluggable: a real booster's bytes load via
  ``framework='xgboost'`` when the library exists; otherwise a
  deterministic numpy linear model (fixed weights over the 6 features)
  stands in, keeping tests and plans identical.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_COLS = ["f_prior", "f_kg_support", "f_embed_sim", "f_overlap", "f_jw", "f_score"]

# deterministic stand-in weights: rank mostly by matcher score + overlap
_FALLBACK_W = np.array([0.05, 0.02, 0.1, 0.3, 0.03, 0.5])
_FALLBACK_B = 0.0


def _load_model(model_bytes: bytes | None, framework: str):
    if framework == "xgboost" and model_bytes is not None:
        try:
            import xgboost as xgb  # not in the sandbox image; works on clusters

            booster = xgb.Booster()
            booster.load_model(bytearray(model_bytes))

            def predict(X: np.ndarray) -> np.ndarray:
                return booster.inplace_predict(X)

            return predict, "xgboost"
        except ImportError:
            pass

    def predict(X: np.ndarray) -> np.ndarray:
        return X @ _FALLBACK_W + _FALLBACK_B

    return predict, "linear_fallback"


def make_rerank_udf(
    spark: SparkSession,
    model_bytes: bytes | None = None,
    framework: str = "xgboost",
):
    """Scalar-iterator pandas UDF: model loads once per worker, then scores
    every Arrow batch — the M2 inference pattern.  Input: one struct column
    of the 6 features."""
    bc = spark.sparkContext.broadcast(model_bytes)

    @F.pandas_udf(T.DoubleType())
    def rerank_udf(it: Iterator[pd.DataFrame]) -> Iterator[pd.Series]:
        predict, _ = _load_model(bc.value, framework)
        for pdf in it:
            X = pdf[FEATURE_COLS].to_numpy(dtype=np.float64)
            yield pd.Series(predict(X))

    return rerank_udf


def rerank(features: DataFrame, udf) -> DataFrame:
    """Add ``rerank_score`` from the feature columns."""
    feat = F.struct(*[F.col(c).cast("double").alias(c) for c in FEATURE_COLS])
    return features.withColumn("rerank_score", udf(feat))
