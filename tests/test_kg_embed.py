"""TransE embedding fit (operators/kg_embed.py): bounded deterministic
fit, distributed scoring, link-prediction eval."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from predicate_finder_spark.operators.kg_embed import (
    deserialize_transe,
    fit_transe,
    link_prediction_eval,
    serialize_transe,
    transe_score_udf,
)

SCHEMA = "subj string, pred string, obj string"


@pytest.fixture(scope="module")
def ring_graph(spark):
    """Structured graph TransE can actually learn: 'next' walks a 12-cycle
    and 'prev' walks it backwards — each relation is one consistent
    translation, TransE's exact modeling assumption."""
    n = 12
    rows = [(f"e{i}", "next", f"e{(i + 1) % n}") for i in range(n)]
    rows += [(f"e{(i + 1) % n}", "prev", f"e{i}") for i in range(n)]
    triples = spark.createDataFrame(rows, SCHEMA)
    ents = spark.createDataFrame([(f"e{i}",) for i in range(n)], "entity string")
    return triples, ents


def test_serialize_roundtrip():
    blob = serialize_transe(["a", "b"], [[1.0, 0.0], [0.0, 1.0]], ["r"], [[0.5, 0.5]])
    en, ev, rn, rv = deserialize_transe(blob)
    assert en == ["a", "b"] and rn == ["r"]
    assert ev.shape == (2, 2) and rv.shape == (1, 2)


def test_fit_is_deterministic(spark, ring_graph):
    triples, ents = ring_graph
    m1 = fit_transe(triples, ents, dim=8, iters=50)
    m2 = fit_transe(triples.repartition(7), ents, dim=8, iters=50)
    assert m1 == m2  # bit-identical bytes at any parallelism


@pytest.fixture(scope="module")
def fitted(spark, ring_graph):
    triples, ents = ring_graph
    return fit_transe(triples, ents, dim=16, iters=300, n_neg=4)


def test_true_triples_outscore_corrupted(spark, ring_graph, fitted):
    triples, ents = ring_graph
    from predicate_finder_spark.operators.kg_negatives import corrupt_triples

    rows = corrupt_triples(triples, ents, n_neg=4)
    scored = rows.withColumn(
        "score", transe_score_udf(fitted)(F.col("subj"), F.col("pred"), F.col("obj"))
    )
    means = {
        r["label"]: r["m"]
        for r in scored.groupBy("label").agg(F.avg("score").alias("m")).collect()
    }
    assert means[1.0] > means[0.0] + 0.2, means


def test_link_prediction_beats_random(spark, ring_graph, fitted):
    triples, ents = ring_graph
    res = link_prediction_eval(triples, fitted, k=3)
    assert res["n"] == 24
    # random ranking over 12 entities: hits@3 = 0.25, mean rank = 6.5
    assert res["hits@3"] >= 0.7, res
    assert res["mean_rank"] <= 3.0, res


def test_unknown_entities_score_null(spark, fitted):
    df = spark.createDataFrame([("e0", "next", "MISSING")], SCHEMA)
    r = df.select(
        transe_score_udf(fitted)(F.col("subj"), F.col("pred"), F.col("obj")).alias("s")
    ).first()
    assert r["s"] is None


def test_bounded_sample_path(spark, ring_graph):
    """max_triples below the set size forces the md5-threshold sample; the
    fit must still run and stay deterministic."""
    triples, ents = ring_graph
    m1 = fit_transe(triples, ents, dim=4, iters=10, max_triples=10)
    m2 = fit_transe(triples, ents, dim=4, iters=10, max_triples=10)
    assert m1 == m2


def test_empty_triples_raise(spark):
    t = spark.createDataFrame([], SCHEMA)
    e = spark.createDataFrame([("a",)], "entity string")
    with pytest.raises(ValueError, match="empty triple set"):
        fit_transe(t, e)
