"""Fitted re-ranker: distributed features -> single-node numpy logistic fit
-> broadcast fitted weights -> measurable accuracy lift.

This is the end-to-end loop the reference trains off-cluster
(QueryFilter.py negative sampling + split, get_train_data.py features,
train_xgb.py fit, test_xgb_pkl.py re-rank, performance.py cal_acc), run on
the paraphrased synthetic question set where the baseline IDF x cosine
scorer has no lexical signal.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from predicate_finder_spark.operators.features import negative_sample, train_dev_split
from predicate_finder_spark.operators.models import (
    FEATURE_COLS,
    _load_model,
    deserialize_linear_model,
    make_rerank_udf,
    rerank,
    serialize_linear_model,
)
from predicate_finder_spark.operators.scoring import collect_embeddings
from predicate_finder_spark.operators.train import fit_linear_reranker
from predicate_finder_spark.plans.questions import (
    argmax_answers,
    question_accuracy,
    question_candidates,
    question_features,
)
from predicate_finder_spark.synth import synth_question_set


def test_linear_model_roundtrip():
    w = np.array([0.1, -2.0, 3.5])
    blob = serialize_linear_model(w, 0.25)
    w2, b2 = deserialize_linear_model(blob)
    assert np.allclose(w, w2) and b2 == 0.25
    predict, kind = _load_model(blob, "linear")
    assert kind == "linear_fitted"
    X = np.array([[1.0, 1.0, 1.0], [0.0, 0.0, 0.0]])
    assert np.allclose(predict(X), X @ w + 0.25)


def test_fit_recovers_separating_feature(spark):
    """On a synthetic set where exactly one feature separates the labels,
    the fitted raw-space weight on that feature dominates."""
    rows = []
    for i in range(200):
        label = float(i % 2)
        feats = [0.5, 0.1, 0.3, 0.0, 0.2 + 0.6 * label, 0.4]  # f_jw separates
        rows.append((*feats, label))
    df = spark.createDataFrame(
        rows, ", ".join(f"{c} double" for c in FEATURE_COLS) + ", label double"
    )
    w, b = deserialize_linear_model(fit_linear_reranker(df))
    j = FEATURE_COLS.index("f_jw")
    assert w[j] > 0
    assert abs(w[j]) > 3 * max(abs(x) for k, x in enumerate(w) if k != j)


@pytest.fixture(scope="module")
def para_questions(spark):
    t = synth_question_set(spark, 160, paraphrase=True)
    emb = collect_embeddings(t["embeddings"])
    cands = question_candidates(
        spark, t["questions"], t["aliases"], t["kg_triples"], t["embeddings"]
    )
    feats = question_features(spark, cands, t["kg_triples"], emb).persist()
    feats.count()
    return t, feats


def test_fitted_reranker_beats_baseline_and_fallback(spark, para_questions):
    """The VERDICT-r2 gap: scorer='rerank' with FITTED weights must beat
    both the baseline scorer and the hand-weight fallback on held-out
    questions (reference eval semantics, performance.py:5-30)."""
    t, feats = para_questions
    gold_keyed = t["gold"].select(F.col("qid").alias("url"), "entity", "pred")
    labeled = negative_sample(feats, gold_keyed, key=("url", "entity"))
    split = train_dev_split(labeled, "url")
    model = fit_linear_reranker(split.filter(F.col("split") == "train"))

    dev_urls = split.filter(F.col("split") == "dev").select("url").distinct()
    dev = feats.join(dev_urls, "url", "left_semi")
    assert dev.count() > 0

    fitted_ans = argmax_answers(
        rerank(dev, make_rerank_udf(spark, model, framework="linear")),
        rank_col=F.col("rerank_score"),
    )
    fallback_ans = argmax_answers(
        rerank(dev, make_rerank_udf(spark)), rank_col=F.col("rerank_score")
    )
    baseline_ans = argmax_answers(dev)

    acc_fit = question_accuracy(fitted_ans, t["gold"])
    acc_fb = question_accuracy(fallback_ans, t["gold"])
    acc_base = question_accuracy(baseline_ans, t["gold"])

    # paraphrased surfaces: the baseline has no embedding/token signal
    assert acc_fit["exact"] > acc_base["exact"], (acc_fit, acc_base)
    assert acc_fit["exact"] > acc_fb["exact"], (acc_fit, acc_fb)
    assert acc_fit["exact"] >= 0.8, acc_fit


def test_fitted_matcher_beats_fixed_weights(spark):
    """VERDICT-r3 item 5: the M1 matcher's fc weights get a real fit
    (mgnn/train.py:116-217 analog) and must beat the hand-fixed fallback at
    ranking the gold predicate top-1 on held-out questions."""
    from pyspark.sql import Window

    from predicate_finder_spark.operators.models import make_matcher_udf
    from predicate_finder_spark.operators.train import fit_matcher
    from predicate_finder_spark.plans.questions import (
        question_candidates,
        question_matcher_channels,
    )
    from predicate_finder_spark.synth import build_ontology

    t = synth_question_set(spark, 200)
    emb = collect_embeddings(t["embeddings"])
    cands = question_candidates(
        spark, t["questions"], t["aliases"], t["kg_triples"], t["embeddings"]
    ).withColumnRenamed("url", "qid")
    gold = t["gold"].select("qid", F.col("pred").alias("g_pred"))
    base = (
        question_matcher_channels(spark, cands, build_ontology(spark), emb)
        .join(gold, "qid")
        .withColumn("label", (F.col("pred") == F.col("g_pred")).cast("double"))
        .persist()
    )
    # deterministic 80/20 split on the question key
    is_dev = F.conv(F.substring(F.md5(F.col("qid")), 1, 4), 16, 10).cast("long") % 5 == 0
    train, dev = base.filter(~is_dev), base.filter(is_dev)
    model = fit_matcher(train)

    def top1_acc(model_bytes):
        m = make_matcher_udf(spark, emb, model_bytes=model_bytes)
        scored = dev.withColumn(
            "ms", m("rel_tokens", "syntax_path", "hier", "pred_tokens")
        )
        w = Window.partitionBy("qid").orderBy(F.desc("ms"), F.asc("pred"))
        top = scored.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
        return top.agg(
            F.avg((F.col("pred") == F.col("g_pred")).cast("double"))
        ).first()[0]

    fixed, fitted = top1_acc(None), top1_acc(model)
    base.unpersist()
    assert fitted >= 0.8, (fixed, fitted)
    assert fitted >= fixed + 0.2, (fixed, fitted)
