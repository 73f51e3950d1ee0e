"""Candidate scoring: IDF build + IDF x cosine ranker + top-1 window.

Semantics follow the reference's best artifact, the baseline scorer
(baseline/baseline.py:96-169): for each candidate predicate, score =
max over question n-grams of cosine(ngram-mean-embedding,
predicate-mean-embedding) x max-IDF of the predicate's words (default IDF
2.0 for OOV, baseline.py:133-138; +1e-9 cosine guard, baseline.py:149-152).

The scorer is a scalar pandas UDF over Arrow batches holding two broadcast
dictionaries (embedding matrix + IDF map) — the idiomatic Spark port of the
reference's driver-resident GloVe matrix.  At 100 TB the dictionaries ship
once per executor, not per task.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def build_idf(sent_df: DataFrame) -> DataFrame:
    """IDF over corpus tokens: idf(word) = log2(N_docs / df) (A1; reference
    baseline/baseline.py:59-93, log2 at :86-87).

    Classic two-phase hash aggregation — Spark does partial (map-side)
    aggregation of the (url, word) dedup and the per-word counts
    automatically; no driver loops.
    """
    docs = sent_df.select("url", F.explode(F.transform("tokens", F.lower)).alias("word")).distinct()
    n_docs = sent_df.select("url").distinct().count()
    return docs.groupBy("word").agg(F.count(F.lit(1)).alias("df")).select(
        "word", F.log2(F.lit(float(n_docs)) / F.col("df")).alias("idf")
    )


def collect_embeddings(embeddings: DataFrame) -> dict[str, np.ndarray]:
    pdf = embeddings.toPandas()
    return {w: np.asarray(v, dtype=np.float64) for w, v in zip(pdf["word"], pdf["vector"])}


def collect_idf(idf: DataFrame) -> dict[str, float]:
    pdf = idf.toPandas()
    return dict(zip(pdf["word"], pdf["idf"]))


def make_scorer_udf(
    spark: SparkSession,
    emb: dict[str, np.ndarray],
    idf: dict[str, float],
    max_ngram: int = 2,
    default_idf: float = 2.0,
):
    """Factory: (rel_tokens array<string>, pred_tokens array<string>) ->
    score double.  Broadcast the dictionaries once (closure capture of the
    Broadcast object, not the dicts — pitfall: plain closure capture would
    re-pickle per task)."""
    emb_bc = spark.sparkContext.broadcast(emb)
    idf_bc = spark.sparkContext.broadcast(idf)

    @F.pandas_udf(T.DoubleType())
    def score_udf(rel_tokens: pd.Series, pred_tokens: pd.Series) -> pd.Series:
        E = emb_bc.value
        I = idf_bc.value

        def mean_vec(words) -> np.ndarray | None:
            vs = [E[w] for w in words if w in E]
            if not vs:
                return None
            return np.mean(vs, axis=0)

        out = np.zeros(len(rel_tokens), dtype=np.float64)
        for i, (rel, pw) in enumerate(zip(rel_tokens, pred_tokens)):
            rel = [t.lower() for t in (list(rel) if rel is not None else [])]
            pw = [t.lower() for t in (list(pw) if pw is not None else [])]
            pv = mean_vec(pw)
            if pv is None:
                continue
            pn = np.linalg.norm(pv)
            best = 0.0
            for n in range(1, max_ngram + 1):
                for j in range(0, len(rel) - n + 1):
                    gv = mean_vec(rel[j : j + n])
                    if gv is None:
                        continue
                    c = float(gv @ pv) / (float(np.linalg.norm(gv)) * float(pn) + 1e-9)
                    if c > best:
                        best = c
            # max-IDF of predicate words, default 2.0 (baseline.py:133-138)
            widf = max((I.get(w, 0.0) for w in pw), default=0.0)
            if widf <= 0.0:
                widf = default_idf
            out[i] = best * widf
        return pd.Series(out)

    return score_udf


def score_candidates(candidates: DataFrame, score_udf) -> DataFrame:
    """Embedding score (pandas UDF) x direction-agreement boost (pure column
    expression).

    The direction signal is the Spark analog of the reference's syntax-path
    channel (pretreatment/syntactic_tree.py:24-80 encodes the dependency
    direction between entity and wh-word; the MGNN consumes it as its 2nd
    input): a relation surface shaped "is ... of" asserts the *reverse*
    direction ("O is the birth place of S" => (S, birthPlace, O)), while a
    plain verb phrase asserts forward.  A candidate whose join direction
    (``rule``) agrees with the surface pattern gets a 1.1x boost — this
    breaks the exact score tie when the KG holds the same predicate in both
    directions for an entity pair.
    """
    base = score_udf(F.col("rel_tokens"), F.col("pred_tokens"))
    first = F.lower(F.element_at(F.col("rel_tokens"), 1))
    last = F.lower(F.element_at(F.col("rel_tokens"), -1))
    surface_reversed = first.isin("is", "was", "are", "were") & (last == F.lit("of"))
    agrees = surface_reversed == (F.col("rule") == F.lit("reverse"))
    return candidates.withColumn(
        "score", base * F.when(agrees, F.lit(1.1)).otherwise(F.lit(1.0))
    )


def top1_per_pair(scored: DataFrame) -> DataFrame:
    """W1: argmax candidate per (url, sent_id, unordered entity pair) —
    row_number over (score desc, pred asc, subj asc) for a deterministic
    tie-break (reference sorts then takes [0]: mgnn/test.py:196-198,
    xgboost/test_xgb_pkl.py:81-83).  The pair is unordered so forward- and
    reverse-direction candidates compete: one sentence asserts one relation
    per entity pair, exactly like one LC-QuAD question yields one
    (entity, predicate) answer in the reference."""
    w = Window.partitionBy(
        "url", "sent_id", F.least("subj", "obj"), F.greatest("subj", "obj")
    ).orderBy(F.col("score").desc(), F.col("pred").asc(), F.col("subj").asc())
    return scored.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def to_triples(top1: DataFrame) -> DataFrame:
    """Final triples(subj, pred, obj, score, url, provenance)."""
    return top1.select(
        "subj", "pred", "obj",
        F.col("score").cast("double").alias("score"),
        "url",
        F.struct(
            F.lit("score_top1").alias("stage"), F.col("rule").alias("rule")
        ).alias("provenance"),
    )
