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
    scorer_vocab,
)


def question_candidates(
    spark: SparkSession,
    questions: DataFrame,
    aliases: DataFrame,
    kg_triples: DataFrame,
    embeddings: DataFrame,
    blacklist: tuple[str, ...] = ("#", "subject", "wiki", "hypernym", "gender"),
    max_ngram: int = 2,
) -> DataFrame:
    """The scored candidate frame BEFORE the per-question argmax: one row
    per (question, entity, predicate) candidate with
    (url, entity, prior, pred_uri, pred, rel_tokens, pred_tokens, score).

    Exposed separately from :func:`answer_questions` so the re-ranker
    training loop (operators/train.py) can negative-sample and re-score
    the same candidates the baseline argmax sees.
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
    idf_dict = collect_idf(idf)
    # bounded embedding pull: question tokens ⊆ IDF vocab, predicate camel
    # words from the KG — never an unfiltered toPandas of the table
    emb_dict = collect_embeddings(
        embeddings, vocab=scorer_vocab(idf_dict, kg_triples=kg_triples)
    )
    scorer = make_scorer_udf(spark, emb_dict, idf_dict, max_ngram=max_ngram)
    return scored_input.withColumn(
        "score", scorer(F.col("rel_tokens"), F.col("pred_tokens"))
    )


def argmax_answers(scored: DataFrame, rank_col=None) -> DataFrame:
    """Per-question argmax over the candidate frame -> one answer row.

    Default ranking is the baseline's prior-weighted score (Spotlight
    confidence re-ranks entities, baseline.py:159-160); pass ``rank_col``
    (e.g. ``F.col('rerank_score')``) to argmax a re-ranked column instead.
    """
    rank = rank_col if rank_col is not None else (F.col("score") * F.col("prior"))
    w = Window.partitionBy("url").orderBy(
        rank.desc(), F.col("pred").asc(), F.col("entity").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("url").alias("qid"), "entity", "pred_uri", "pred",
            F.col("score").cast("double").alias("score"),
        )
    )


def question_features(spark: SparkSession, cands: DataFrame, kg_triples: DataFrame,
                      emb: dict) -> DataFrame:
    """Add the 6 re-ranker FEATURE_COLS to question candidates (the
    question-pipeline twin of operators/features.py build_features):

      f_prior       link prior
      f_answer_sim  cosine(question tokens, KG answer tokens) — the
                    rewritten-query execution is a KG (s, p) lookup with
                    min(o) as the deterministic first answer
      f_embed_sim   baseline score when positive
      f_overlap     token-overlap(rel_tokens, pred_tokens)
      f_jw          alignment Jaro-Winkler: each predicate word matched to
                    its best question word (jaro_winkler_align_udf) — the
                    question's rel span is stopword-heavy, so the flagship's
                    mean-pairwise cha_sim kernel would drown the signal
      f_score       baseline score (the model-score slot)
    """
    from predicate_finder_spark.functions.similarity import jaro_winkler_align_udf
    from predicate_finder_spark.functions.text import token_overlap_ratio
    from predicate_finder_spark.operators.features import make_answer_sim_udf

    answer_sim = make_answer_sim_udf(spark, emb)
    answers = kg_triples.groupBy(
        F.col("s").alias("entity"), F.col("p").alias("pred_uri")
    ).agg(F.min("o").alias("__ans"))
    ans_tokens = F.split(F.lower(uri_localname(F.col("__ans"))), "_")
    return (
        cands.join(answers, ["entity", "pred_uri"], "left")
        .withColumn(
            "f_answer_sim",
            F.when(
                F.col("__ans").isNotNull(),
                answer_sim(F.col("rel_tokens"), ans_tokens),
            ).otherwise(F.lit(0.0)),
        )
        .drop("__ans")
        .withColumn("f_prior", F.col("prior").cast("double"))
        .withColumn(
            "f_embed_sim",
            F.when(F.col("score") > 0, F.col("score")).otherwise(F.lit(0.0)),
        )
        .withColumn("f_overlap", token_overlap_ratio(F.col("rel_tokens"), F.col("pred_tokens")))
        .withColumn("f_jw", jaro_winkler_align_udf(F.col("rel_tokens"), F.col("pred_tokens")))
        .withColumn("f_score", F.col("score").cast("double"))
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
    scored = question_candidates(
        spark, questions, aliases, kg_triples, embeddings,
        blacklist=blacklist, max_ngram=max_ngram,
    )
    return argmax_answers(scored)


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


def question_matcher_channels(
    spark: SparkSession,
    cands: DataFrame,
    ontology: DataFrame,
    emb: dict,
) -> DataFrame:
    """Attach the M1 matcher's four channels + their 8 interaction cosines
    to question candidates (mgnn/test.py:24-91 assembles the same four
    inputs per candidate): query channel = rel_tokens, syntax channel =
    dependency path across the rel span, hier channel = ontology labels of
    the candidate predicate, rel channel = predicate camel words.

    Output adds ``syntax_path``, ``hier``, ``channels`` (array<double>[8],
    models.make_matcher_features_udf).  The ontology side aggregates to one
    row per predicate, then joins broadcast — dictionary-sized.
    """
    from predicate_finder_spark.operators.models import make_matcher_features_udf
    from predicate_finder_spark.operators.syntax import make_syntax_path_udf

    onto = ontology.groupBy("predicate").agg(
        F.flatten(F.collect_list(F.split("label", " "))).alias("hier")
    )
    syn = make_syntax_path_udf()
    feats_udf = make_matcher_features_udf(spark, emb)
    return (
        cands.join(
            F.broadcast(onto), cands["pred"] == onto["predicate"], "left"
        )
        .drop("predicate")
        .withColumn("hier", F.coalesce("hier", F.array().cast("array<string>")))
        .withColumn(
            "syntax_path",
            syn(F.col("rel_tokens"), F.lit(0),
                F.greatest(F.size("rel_tokens") - 1, F.lit(0))),
        )
        .withColumn(
            "channels",
            feats_udf("rel_tokens", "syntax_path", "hier", "pred_tokens"),
        )
    )
