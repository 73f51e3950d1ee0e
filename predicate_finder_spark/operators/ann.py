"""Similarity search over an embedding column.

- ``brute_force_topk``: exact cosine top-k via crossJoin + window — the
  correctness baseline (O(n*q), fine when the query set is small and
  broadcast).
- ``ivf_topk``: IVF-style approximate top-k — k-means-lite centroids
  (deterministic seeded sample), assign every vector to its nearest
  centroid (one broadcast join + argmin), probe only ``n_probe`` nearest
  cells per query.  The scale path: each query touches n_probe/n_cells of
  the corpus, and the heavy join is an equi-join on cell id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from predicate_finder_spark.functions.similarity import cosine_expr


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    quantized: bool = False,
) -> DataFrame:
    """Exact cosine top-k per query: broadcast the (small) query set against
    the corpus, window top-k.  Output: (query_id, vec_id, cosine, rank).

    ``quantized=True`` scores on int8-quantized vectors
    (functions/vectors.quantize_embedding) — the memory/bandwidth lever
    for the 100 TB scan: the corpus side streams 4x fewer bytes through
    the scan and the scorer, at a bounded cosine perturbation (top-10
    overlap >= 8/10 pinned in tests/test_vectors_partitions.py; rank is
    approximate, use for candidate generation + exact re-rank)."""
    if quantized:
        from predicate_finder_spark.functions.vectors import (
            dequantize_embedding,
            quantize_embedding,
        )

        vectors = vectors.select(
            F.col(id_col),
            dequantize_embedding(quantize_embedding(F.col(vec_col))).alias(vec_col),
        )
        queries = queries.select(
            F.col(query_id_col),
            dequantize_embedding(quantize_embedding(F.col(vec_col))).alias(vec_col),
        )
    from predicate_finder_spark.functions.similarity import dot_expr, norm_expr

    # norms are computed ONCE per side, in projections BELOW the cross join
    # (each corpus row meets every query row: inlining cosine_expr there
    # re-evaluated the corpus norm per (row, query) and the query norm per
    # corpus row).  Same expressions, same float order — values unchanged.
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qv"),
        norm_expr(F.col(vec_col)).alias("__qn"),
    )
    # a single-file parquet scan plans one task regardless of cores; the
    # per-row cosine work would then run serially.  Spread BEFORE the norm
    # projection, and only when the scan's parallelism is below the session
    # default — at real scale inputs carry enough splits and this is a
    # no-op, so no corpus shuffle is added.
    corpus = vectors.select(F.col(id_col), F.col(vec_col))
    default_par = vectors.sparkSession.sparkContext.defaultParallelism
    if corpus.rdd.getNumPartitions() < default_par:
        # hash on the unique id, not round-robin: round-robin pays a local
        # sort of its input (sortBeforeRepartition) serialized inside the
        # under-parallel scan task — exactly what the spread is avoiding —
        # and hash assignment is deterministic under task retry
        corpus = corpus.repartition(default_par, F.col(id_col))
    corpus = corpus.select(
        F.col(id_col), F.col(vec_col), norm_expr(F.col(vec_col)).alias("__vn")
    )
    scored = corpus.crossJoin(F.broadcast(q)).withColumn(
        "cosine",
        dot_expr(F.col(vec_col), F.col("__qv"))
        / (F.col("__vn") * F.col("__qn") + F.lit(1e-9)),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def _seed_vectors(
    vectors: DataFrame, n_cells: int, id_col: str, vec_col: str
) -> DataFrame:
    """Deterministic centroid seeds: the n_cells lowest-id vectors via
    orderBy().limit() — Catalyst plans this as TakeOrderedAndProject, a
    *distributed* top-k (per-partition heap + driver merge of n_cells rows).

    Never a global ``Window.orderBy``: that forces the entire vectors table
    through ONE task — at 100 TB the single bottleneck of the ANN path
    (tests/test_ann.py pins the plan shape).
    """
    return vectors.select(F.col(id_col), F.col(vec_col)).orderBy(F.col(id_col).asc()).limit(n_cells)


def build_ivf_cells(
    vectors: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """One-pass IVF index: centroids = deterministic seed sample
    (distributed top-k by id), then assign each vector to its nearest
    centroid.

    Returns (centroids(cell_id, centroid), assigned(…, cell_id)).  At 100 TB
    the assignment is one broadcast join + argmin over n_cells — a narrow
    stage; ``refine_ivf`` Lloyd-iterates from here, same shape.
    """
    spark = vectors.sparkSession
    seeds = sorted(
        _seed_vectors(vectors, n_cells, id_col, vec_col).collect(),
        key=lambda r: r[id_col],
    )
    vec_t = vectors.schema[vec_col].dataType
    centroids = spark.createDataFrame(
        [(i, list(r[vec_col])) for i, r in enumerate(seeds)],
        schema=f"cell_id int, centroid {vec_t.simpleString()}",
    )
    cent_arr = F.array(*[F.array(*[F.lit(float(x)) for x in r[vec_col]]) for r in seeds])
    n = len(seeds)
    sims = F.transform(cent_arr, lambda c: cosine_expr(F.col(vec_col), c))
    best = F.expr(
        "array_position(transform(sequence(1, {n}), i -> element_at(__sims, i)), array_max(__sims)) - 1".format(n=n)
    )
    assigned = (
        vectors.withColumn("__sims", sims)
        .withColumn("cell_id", best.cast("int"))
        .drop("__sims")
    )
    return centroids, assigned


def refine_ivf(
    vectors: DataFrame,
    centroids: DataFrame,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Lloyd iterations over the IVF cells — the iterative-algorithm shape
    on Spark: each round is (assign via broadcast argmin) -> (recompute
    centroids via distributed per-dimension mean, functions/vectors.py) ->
    materialize.  Driver holds only the k centroid vectors; the corpus
    never leaves the executors.

    Returns (refined_centroids, assigned).
    """
    from predicate_finder_spark.functions.vectors import group_vector_agg

    if n_iter < 1:
        raise ValueError("refine_ivf needs n_iter >= 1 (use build_ivf_cells for 0)")
    spark = vectors.sparkSession
    cents = centroids
    assigned = None
    for _ in range(n_iter):
        rows = cents.collect()
        cent_arr = F.array(*[F.array(*[F.lit(float(x)) for x in r["centroid"]]) for r in rows])
        n = len(rows)
        sims = F.transform(cent_arr, lambda c: cosine_expr(F.col(vec_col), c))
        best = F.expr(
            "array_position(transform(sequence(1, {n}), i -> element_at(__sims, i)), "
            "array_max(__sims)) - 1".format(n=n)
        )
        assigned = (
            vectors.withColumn("__sims", sims)
            .withColumn("cell_id", best.cast("int"))
            .drop("__sims")
        )
        cents = (
            group_vector_agg(assigned, ["cell_id"], vec_col, agg="avg")
            .select("cell_id", F.col("vector").alias("centroid"))
        )
        # materialize the new centroids before the next driver collect
        cents = spark.createDataFrame(cents.collect(), schema=cents.schema)
    return cents, assigned


def ivf_topk(
    assigned: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: per query, rank cells by centroid cosine, probe
    the best ``n_probe`` cells via equi-join on cell_id, then exact cosine
    + window top-k within the probed subset."""
    qc = queries.crossJoin(F.broadcast(centroids)).withColumn(
        "__csim", cosine_expr(F.col(vec_col), F.col("centroid"))
    )
    wq = Window.partitionBy(query_id_col).orderBy(F.col("__csim").desc(), F.col("cell_id").asc())
    probe = (
        qc.withColumn("__rc", F.row_number().over(wq))
        .filter(F.col("__rc") <= n_probe)
        .select(F.col(query_id_col), F.col(vec_col).alias("__qv"), "cell_id")
    )
    scored = assigned.join(probe, "cell_id").withColumn(
        "cosine", cosine_expr(F.col(vec_col), F.col("__qv"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )
