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
    automatically; no driver loops.  N_docs is folded into the plan as a
    broadcast 1-row cross join instead of a separate ``.count()`` — a
    separate count would scan the (100 TB) corpus twice.
    """
    docs = sent_df.select("url", F.explode(F.transform("tokens", F.lower)).alias("word")).distinct()
    n = sent_df.agg(F.countDistinct("url").alias("__n_docs"))
    return (
        docs.groupBy("word")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n))
        .select("word", "df", F.log2(F.col("__n_docs") / F.col("df")).alias("idf"))
    )


def collect_embeddings(
    embeddings: DataFrame, vocab: set[str] | None = None
) -> dict[str, np.ndarray]:
    """Embedding dict for the scorer broadcast.  ``vocab`` (the capped IDF
    vocabulary + any extra tokens) restricts the pull — on open web text the
    embedding table is unbounded and an unfiltered toPandas() is a driver
    OOM.  The filter is pushed into the scan (isin over a driver-known set
    when small, else a broadcast semi-join)."""
    if vocab is not None:
        if len(vocab) <= 10_000:
            embeddings = embeddings.filter(F.col("word").isin(*vocab))
        else:
            spark = embeddings.sparkSession
            vdf = spark.createDataFrame([(w,) for w in sorted(vocab)], "word string")
            embeddings = embeddings.join(F.broadcast(vdf), "word", "left_semi")
    pdf = embeddings.toPandas()
    return {w: np.asarray(v, dtype=np.float64) for w, v in zip(pdf["word"], pdf["vector"])}


def scorer_vocab(
    idf: dict[str, float],
    kg_triples: DataFrame | None = None,
    ontology: DataFrame | None = None,
    include_object_localnames: bool = False,
) -> set[str]:
    """The bounded token universe the scorer (and the rerank channels) can
    ever look up — the ``vocab`` argument for :func:`collect_embeddings`.

    Composition (each part bounded, never corpus-sized):
    - the capped IDF vocabulary (question/relation-surface tokens all come
      from the corpus, so the capped IDF keys are exactly the rel tokens
      that will carry a vector; words dropped by the cap score as OOV in
      BOTH dictionaries — consistent semantics, documented in
      PipelineConfig.max_vocab);
    - predicate tokens: camelCase words + the raw localname of every
      distinct KG predicate (the scorer looks up camel words; the matcher's
      hier fallback looks up the localname) — bounded by the KG's predicate
      vocabulary, a dimension-sized distinct;
    - ontology labels (looked up whole by the matcher's hier channel);
    - optionally (rerank path) KG object-localname tokens, the answer-sim
      channel's lookups (features.py) — bounded by the KG entity-name
      vocabulary, NOT by the corpus.
    """
    from predicate_finder_spark.functions.text import camel_split, uri_localname

    vocab = {w.lower() for w in idf}
    frames = []
    if kg_triples is not None:
        preds = kg_triples.select(uri_localname(F.col("p")).alias("ln")).distinct()
        frames.append(
            preds.select(F.explode(camel_split(F.col("ln"))).alias("t"))
        )
        frames.append(preds.select(F.lower(F.col("ln")).alias("t")))
        if include_object_localnames:
            frames.append(
                kg_triples.select(F.col("o").alias("u"))
                .distinct()
                .select(
                    F.explode(
                        F.split(F.lower(uri_localname(F.col("u"))), "_")
                    ).alias("t")
                )
            )
    if ontology is not None:
        frames.append(
            ontology.select(
                F.explode(
                    F.array(
                        F.lower(F.col("label")),
                        F.lower(F.coalesce(F.col("range_label"), F.col("label"))),
                    )
                ).alias("t")
            )
        )
    if frames:
        allf = frames[0]
        for f in frames[1:]:
            allf = allf.unionByName(f)
        vocab.update(
            r["t"] for r in allf.distinct().collect() if r["t"]
        )
    return vocab


def collect_idf(
    idf: DataFrame, min_df: int = 1, max_entries: int | None = None
) -> dict[str, float]:
    """IDF dict for the scorer broadcast, with a bounded driver pull.

    On open web text the vocabulary is unbounded (every typo is a word), so
    the collect is capped BEFORE it reaches the driver: ``min_df`` drops
    hapaxes (words below the floor fall back to the scorer's default_idf —
    exactly what an OOV word gets), ``max_entries`` keeps the top-K by
    document frequency via a distributed top-k (orderBy+limit ->
    TakeOrderedAndProject, never a single-partition window).

    ``idf`` may be an external (word, idf)-only table (extract_triples
    accepts one).  Without a ``df`` column, ``max_entries`` orders by idf
    ASC instead — idf = log2(N/df) is monotone decreasing in df, so
    idf-ascending IS df-descending and the top-K-by-frequency intent is
    preserved exactly; ``min_df`` is skipped (the floor needs N, which a
    bare idf table doesn't carry) rather than raising at plan time.
    """
    has_df = "df" in idf.columns
    if min_df > 1 and has_df:
        idf = idf.filter(F.col("df") >= min_df)
    if max_entries is not None:
        order = (
            [F.col("df").desc(), F.col("word").asc()]
            if has_df
            else [F.col("idf").asc(), F.col("word").asc()]
        )
        idf = idf.orderBy(*order).limit(max_entries)
    pdf = idf.select("word", "idf").toPandas()
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
        dim = len(next(iter(E.values()))) if E else 0
        # per-batch memoization: predicates repeat heavily within a batch
        # (every candidate pair scores the whole predicate vocabulary), and
        # so do question tokens — cache both.
        pred_cache: dict[tuple, tuple] = {}
        tok_cache: dict[str, np.ndarray | None] = {}

        def tok_vec(t: str):
            v = tok_cache.get(t, False)
            if v is False:
                v = E.get(t)
                tok_cache[t] = v
            return v

        def pred_stats(pw_raw) -> tuple:
            key = tuple(pw_raw) if pw_raw is not None else ()
            got = pred_cache.get(key)
            if got is None:
                pw = [t.lower() for t in key]
                vs = [v for v in (tok_vec(w) for w in pw) if v is not None]
                if vs:
                    pv = np.mean(vs, axis=0)
                    pn = float(np.linalg.norm(pv))
                else:
                    pv, pn = None, 0.0
                widf = max((I.get(w, 0.0) for w in pw), default=0.0)
                if widf <= 0.0:
                    widf = default_idf
                got = (pv, pn, widf)
                pred_cache[key] = got
            return got

        gram_cache: dict[tuple, tuple] = {}

        def gram_matrix(rel_raw) -> tuple:
            """(G, row_norms) of all n-gram mean vectors for one relation
            span — cached per distinct span: every candidate predicate of a
            pair shares the span, so G is built once per pair, not once per
            candidate row.  Windowed sums accumulate left-to-right like
            np.mean; OOV tokens contribute zero to the sum / nothing to the
            count — identical arithmetic to the scalar formulation."""
            key = tuple(rel_raw) if rel_raw is not None else ()
            got = gram_cache.get(key)
            if got is not None:
                return got
            rel = [t.lower() for t in key]
            n = len(rel)
            G = None
            if n:
                V = np.zeros((n, dim), dtype=np.float64)
                m = np.zeros(n, dtype=np.float64)
                for j, t in enumerate(rel):
                    v = tok_vec(t)
                    if v is not None:
                        V[j] = v
                        m[j] = 1.0
                grams = []
                for ln in range(1, min(max_ngram, n) + 1):
                    sums = V[: n - ln + 1].copy()
                    counts = m[: n - ln + 1].copy()
                    for t in range(1, ln):
                        sums += V[t : t + n - ln + 1]
                        counts += m[t : t + n - ln + 1]
                    valid = counts > 0
                    if valid.any():
                        grams.append(sums[valid] / counts[valid, None])
                if grams:
                    G = np.vstack(grams)
            got = (G, np.linalg.norm(G, axis=1) if G is not None else None)
            gram_cache[key] = got
            return got

        out = np.zeros(len(rel_tokens), dtype=np.float64)
        for i, (rel, pw_raw) in enumerate(zip(rel_tokens, pred_tokens)):
            pv, pn, widf = pred_stats(pw_raw)
            if pv is None:
                continue
            G, gn = gram_matrix(rel)
            best = 0.0
            if G is not None:
                # ONE matvec per row against the cached gram matrix
                sims = (G @ pv) / (gn * pn + 1e-9)
                best = max(0.0, float(sims.max()))
            # max-IDF of predicate words, default 2.0 (baseline.py:133-138)
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
    # try_element_at: ANSI-safe when rel_tokens is empty (adjacent mentions
    # produce a zero-length between-span slice; element_at would throw
    # INVALID_ARRAY_INDEX_IN_ELEMENT_AT under Spark 4's default ANSI mode).
    # A null first/last token means "no surface signal" -> not reversed.
    first = F.lower(F.try_element_at(F.col("rel_tokens"), F.lit(1)))
    last = F.lower(F.try_element_at(F.col("rel_tokens"), F.lit(-1)))
    surface_reversed = F.coalesce(
        first.isin("is", "was", "are", "were") & (last == F.lit("of")), F.lit(False)
    )
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
