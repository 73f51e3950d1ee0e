"""The reference's own task, Spark-first: question -> (entity, predicate).

This is the literal pipeline of baseline/baseline.py:96-169 (lifecycle
SURVEY.md §3.1) re-expressed as one DataFrame plan:

  per question: tokenize (C1) -> entity linking (J1, was Falcon REST) ->
  remove entity tokens from the question (baseline.py:118-123) ->
  candidate predicates for the entity in BOTH directions (J2, was live
  SPARQL GetPredicateList, DataExtract.py:22-63) -> blacklist (F2) +
  DISTINCT (F7) -> score = max n-gram cosine x max-IDF (C6/A5/A1) ->
  argmax over ALL (entity, predicate) pairs per question (W1,
  baseline.py:156-160 argmaxes over predicates then entities).

Evaluation mirrors cal_acc (xgboost/performance.py:5-30): exact match on
entity AND predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from predicate_finder_spark.functions.text import tokenize, uri_localname
from predicate_finder_spark.operators.linking import link_mentions, resolve_mentions
from predicate_finder_spark.operators.mentions import generate_mentions
from predicate_finder_spark.operators.scoring import (
    build_idf,
    collect_embeddings,
    collect_idf,
    make_scorer_udf,
)


def answer_questions(
    spark: SparkSession,
    questions: DataFrame,
    aliases: DataFrame,
    kg_triples: DataFrame,
    embeddings: DataFrame,
    blacklist: tuple[str, ...] = ("#", "subject", "wiki", "hypernym", "gender"),
    max_ngram: int = 2,
) -> DataFrame:
    """questions(qid, question) -> (qid, entity, pred_uri, pred, score).

    One row per question: the argmax (entity, predicate) pair.
    """
    import re as _re

    sent = questions.select(
        F.col("qid").alias("url"),
        F.lit(0).alias("sent_id"),
        F.col("question").alias("sentence"),
        tokenize("question").alias("tokens"),
    )
    mentions = generate_mentions(sent, max_n=3)
    resolved = resolve_mentions(link_mentions(mentions, aliases))

    # candidate predicates: entity as subject AND as object (DataExtract.py:25-41)
    pattern = "|".join(_re.escape(b) for b in blacklist)
    kg = kg_triples.filter(~F.col("p").rlike(pattern))
    by_s = kg.select(F.col("s").alias("entity"), F.col("p").alias("pred_uri"))
    by_o = kg.select(F.col("o").alias("entity"), F.col("p").alias("pred_uri"))
    ent_preds = by_s.unionByName(by_o).distinct()  # F7: SELECT DISTINCT ?uri

    cands = resolved.join(ent_preds, "entity")

    # remove the entity's tokens from the question (baseline.py:118-123)
    with_toks = cands.join(sent.select("url", "tokens"), "url")
    ent_toks = F.split(F.lower(F.regexp_replace(F.col("entity"), "_", " ")), " ")
    rel_tokens = F.filter(
        F.transform(F.col("tokens"), F.lower),
        lambda t: ~F.array_contains(ent_toks, t),
    )
    scored_input = (
        with_toks.withColumn("rel_tokens", rel_tokens)
        .withColumn("pred", uri_localname("pred_uri"))
        .withColumn(
            "pred_tokens",
            F.split(F.lower(F.trim(F.regexp_replace("pred", "([A-Z])", " $1"))), r"[\s_]+"),
        )
    )

    idf = build_idf(sent)
    scorer = make_scorer_udf(
        spark, collect_embeddings(embeddings), collect_idf(idf), max_ngram=max_ngram
    )
    scored = scored_input.withColumn(
        "score", scorer(F.col("rel_tokens"), F.col("pred_tokens"))
    )

    # argmax over all (entity, predicate) pairs per question, prior-weighted
    # like Spotlight confidence re-ranks entities (baseline.py:159-160)
    w = Window.partitionBy("url").orderBy(
        (F.col("score") * F.col("prior")).desc(), F.col("pred").asc(), F.col("entity").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("url").alias("qid"), "entity", "pred_uri", "pred",
            F.col("score").cast("double").alias("score"),
        )
    )


def question_accuracy_by_template(answers: DataFrame, gold: DataFrame) -> DataFrame:
    """cal_acc_template semantics (reference xgboost/performance.py:33-67):
    exact-match (entity AND predicate) accuracy grouped by
    sparql_template_id.  ``gold`` must carry sparql_template_id (the
    template-position-aware parse in sources/corpus.py parse_gold does).

    One groupBy shuffle on a 5-value key — trivially scale-safe.
    """
    j = answers.join(
        gold.select(
            "qid",
            F.col("entity").alias("g_ent"),
            F.col("pred").alias("g_pred"),
            "sparql_template_id",
        ),
        "qid",
    )
    hit = ((F.col("entity") == F.col("g_ent")) & (F.col("pred") == F.col("g_pred"))).cast("double")
    return j.groupBy("sparql_template_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(hit), 6).alias("exact_acc"),
    )


def question_accuracy(answers: DataFrame, gold: DataFrame) -> dict[str, float]:
    """cal_acc semantics (performance.py:5-30): exact match on entity AND
    predicate; also the per-component accuracies the reference prints."""
    j = answers.join(gold.select("qid", F.col("entity").alias("g_ent"),
                                 F.col("pred").alias("g_pred")), "qid")
    agg = j.agg(
        F.avg(((F.col("entity") == F.col("g_ent")) & (F.col("pred") == F.col("g_pred"))).cast("double")).alias("exact"),
        F.avg((F.col("entity") == F.col("g_ent")).cast("double")).alias("entity_acc"),
        F.avg((F.col("pred") == F.col("g_pred")).cast("double")).alias("pred_acc"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    return {k: float(agg[k]) for k in ("exact", "entity_acc", "pred_acc", "n")}
