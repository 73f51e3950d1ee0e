"""Distributed dense-vector aggregation (A5/A6; reference embedding
mean/sum at baseline/baseline.py:31-41 and xgboost/utils.py:31-33 are
driver-side numpy loops).

Spark re-expression: posexplode the vector to (group, dim, val) rows, hash-
aggregate per (group, dim) — classic partial+final combine, fully JVM-side —
then reassemble the array ordered by dim.  Scales to any corpus size because
no vector ever lands on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_vector_agg(
    df: DataFrame,
    group_cols: list[str],
    vec_col: str,
    agg: str = "avg",
) -> DataFrame:
    """Per-group elementwise mean/sum of an array<float> column.

    Returns group_cols + ``vector`` (array<double>, ordered by dimension).
    """
    assert agg in ("avg", "sum")
    exploded = df.select(
        *group_cols, F.posexplode(F.col(vec_col)).alias("__dim", "__val")
    )
    agg_fn = F.avg if agg == "avg" else F.sum
    per_dim = exploded.groupBy(*group_cols, "__dim").agg(
        agg_fn(F.col("__val").cast("double")).alias("__agg")
    )
    return (
        per_dim.groupBy(*group_cols)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__dim", "__agg"))),
                lambda s: s["__agg"],
            ).alias("vector")
        )
    )


def label_centroids(embeddings: DataFrame, label_col: str = "label",
                    vec_col: str = "embedding") -> DataFrame:
    """Per-label centroid of an embedding table — the building block for
    IVF cell refinement (operators/ann.py) and class prototypes."""
    return group_vector_agg(embeddings, [label_col], vec_col, agg="avg")


def quantize_embedding(vec, n_bits: int = 8):
    """Symmetric per-vector int8 quantization of an ``array<float/double>``
    column -> struct(scale double, q array<int>).

    The 100 TB ANN memory lever: a float32 embedding column dominates the
    scan and shuffle bytes of every similarity stage; int8 cuts it 4x
    (storage AND bandwidth) at a ~0.4% max per-component error, which the
    cosine top-k ordering tolerates (tests pin the error bound and the
    recall on the synthetic embeddings).

    Pure column expressions — codegen'd, no UDF: scale = max|x| / (2^(b-1)
    - 1), q_i = floor(x_i / scale + 0.5) (explicit half-up, so DuckDB
    replays it bit-for-bit; Spark's round() is HALF_UP but DuckDB's is
    banker's on doubles — floor(+0.5) sidesteps the mode mismatch).
    All-zero vectors quantize to scale 0 / all-zero q (guarded division).
    """
    levels = float(2 ** (n_bits - 1) - 1)
    v = F.transform(vec, lambda x: x.cast("double"))
    mx = F.array_max(F.transform(v, F.abs))
    scale = F.when(mx > 0, mx / F.lit(levels)).otherwise(F.lit(0.0))
    q = F.when(
        mx > 0,
        F.transform(v, lambda x: F.floor(x / scale + F.lit(0.5)).cast("int")),
    ).otherwise(F.transform(v, lambda x: F.lit(0)))
    return F.struct(scale.alias("scale"), q.alias("q"))


def dequantize_embedding(qstruct):
    """Inverse of :func:`quantize_embedding`: array<double> = q * scale."""
    return F.transform(
        qstruct["q"], lambda x: x.cast("double") * qstruct["scale"]
    )
