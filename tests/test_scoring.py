"""IDF (A1), scorer (C6 x A1), top-1 window (W1), blacklist (F2), guards."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from predicate_finder_spark.operators.predicates import (
    candidate_predicates,
    enrich_ontology,
)
from predicate_finder_spark.operators.scoring import (
    build_idf,
    make_scorer_udf,
    top1_per_pair,
)


def test_idf_log2(spark):
    # idf = log2(N/df), reference baseline/baseline.py:86-87
    sent = spark.createDataFrame(
        [("u1", 0, "x", ["apple", "pie"]), ("u2", 0, "y", ["apple"])],
        "url string, sent_id int, sentence string, tokens array<string>",
    )
    idf = {r["word"]: r["idf"] for r in build_idf(sent).collect()}
    assert abs(idf["apple"] - math.log2(2 / 2)) < 1e-9
    assert abs(idf["pie"] - math.log2(2 / 1)) < 1e-9


def test_scorer_exact_ngram_wins(spark):
    emb = {
        "birth": np.array([1.0, 0.0, 0.0]),
        "place": np.array([0.0, 1.0, 0.0]),
        "death": np.array([0.0, 0.0, 1.0]),
    }
    idf = {"birth": 2.0, "place": 1.0, "death": 2.0}
    udf = make_scorer_udf(spark, emb, idf, max_ngram=2)
    df = spark.createDataFrame(
        [(["has", "birth", "place"], ["birth", "place"]),
         (["has", "birth", "place"], ["death", "place"])],
        "rel_tokens array<string>, pred_tokens array<string>",
    ).withColumn("score", udf(F.col("rel_tokens"), F.col("pred_tokens")))
    s_birth, s_death = [r["score"] for r in df.collect()]
    assert abs(s_birth - 2.0) < 1e-6  # cosine 1.0 * max idf 2.0
    assert s_death < s_birth


def test_scorer_oov_default_idf(spark):
    emb = {"a": np.array([1.0, 0.0])}
    udf = make_scorer_udf(spark, emb, {}, max_ngram=1, default_idf=2.0)
    df = spark.createDataFrame(
        [(["a"], ["a"])], "rel_tokens array<string>, pred_tokens array<string>"
    ).withColumn("score", udf(F.col("rel_tokens"), F.col("pred_tokens")))
    # cosine 1.0 * default 2.0 (reference baseline.py:133-138)
    assert abs(df.first()["score"] - 2.0) < 1e-6


def test_score_candidates_adjacent_mentions_empty_span(spark):
    # Adjacent linked entities yield a zero-length between-span slice;
    # element_at would throw under ANSI — try_element_at must treat the
    # empty rel_tokens as "no surface signal" (not reversed).
    from predicate_finder_spark.operators.scoring import score_candidates

    emb = {"t": np.array([1.0, 0.0])}
    udf = make_scorer_udf(spark, emb, {"t": 1.0}, max_ngram=1)
    cands = spark.createDataFrame(
        [("u", 0, "A", "B", "p", ["t"], ["t"], "forward"),
         ("u", 0, "A", "B", "p", ["t"], ["t"], "reverse"),
         ("u", 1, "A", "B", "p", [], ["t"], "forward"),
         ("u", 1, "A", "B", "p", [], ["t"], "reverse")],
        "url string, sent_id int, subj string, obj string, pred string, "
        "rel_tokens array<string>, pred_tokens array<string>, rule string",
    )
    rows = {(r["sent_id"], r["rule"]): r["score"] for r in score_candidates(cands, udf).collect()}
    # empty span: no crash, forward (not-reversed agrees) gets the boost
    assert rows[(1, "forward")] == 0.0 and rows[(1, "reverse")] == 0.0
    assert rows[(0, "forward")] > rows[(0, "reverse")]


def test_top1_deterministic_tiebreak(spark):
    rows = [
        ("u", 0, "A", "B", "zeta", 1.0),
        ("u", 0, "A", "B", "alpha", 1.0),
        ("u", 0, "B", "A", "beta", 1.0),  # same unordered pair, reversed
    ]
    df = spark.createDataFrame(
        rows, "url string, sent_id int, subj string, obj string, pred string, score double"
    )
    got = top1_per_pair(df).collect()
    assert len(got) == 1 and got[0]["pred"] == "alpha"


def test_collect_idf_caps_driver_pull(spark):
    from predicate_finder_spark.operators.scoring import collect_idf

    # adversarially wide vocabulary: 1000 hapaxes + 1 common word
    sent = spark.createDataFrame(
        [(f"u{i}", 0, "s", [f"w{i}", "common"]) for i in range(1000)],
        "url string, sent_id int, sentence string, tokens array<string>",
    )
    idf = build_idf(sent)
    floored = collect_idf(idf, min_df=2)
    assert set(floored) == {"common"}
    capped = collect_idf(idf, max_entries=10)
    assert len(capped) == 10 and "common" in capped
    # broadcast budget: 10 entries of (word, float) stay tiny
    import sys
    assert sum(sys.getsizeof(k) + 8 for k in capped) < 4096


def test_collect_embeddings_vocab_filter(spark):
    from predicate_finder_spark.operators.scoring import collect_embeddings

    emb = spark.createDataFrame(
        [("a", [1.0]), ("b", [2.0]), ("c", [3.0])], "word string, vector array<double>"
    )
    d = collect_embeddings(emb, vocab={"a", "c"})
    assert set(d) == {"a", "c"}


def test_collect_embeddings_bounded_on_huge_table(spark):
    """The flagship wiring (plans/pipeline.py) must never pull an unbounded
    embeddings table to the driver: with a vocab, a 10^6-row table collects
    at most |vocab| rows, through BOTH the isin path (small vocab) and the
    broadcast-semi-join path (large vocab)."""
    from pyspark.sql import functions as F

    from predicate_finder_spark.operators.scoring import collect_embeddings

    emb = spark.range(1_000_000).select(
        F.concat(F.lit("w"), F.col("id")).alias("word"),
        F.array(F.lit(0.5)).alias("vector"),
    )
    small_vocab = {f"w{i}" for i in range(50)} | {"not_in_table"}
    d = collect_embeddings(emb, vocab=small_vocab)
    assert len(d) == 50
    big_vocab = {f"w{i}" for i in range(20_000)}  # > the 10k isin cutoff
    d2 = collect_embeddings(emb, vocab=big_vocab)
    assert len(d2) == 20_000


def test_scorer_vocab_covers_all_lookups(spark):
    """scorer_vocab = capped IDF keys + predicate camel words + predicate
    localnames + ontology labels (+ object localname tokens for rerank) —
    exactly the token universe the scorer / matcher / answer-sim can probe,
    and nothing corpus-sized."""
    from predicate_finder_spark.operators.scoring import scorer_vocab

    kg = spark.createDataFrame(
        [
            ("Alba_Arnheim", "http://x.org/ontology/birthPlace", "Rosa_Bexley"),
            ("Alba_Arnheim", "http://x.org/ontology/teamSport", "Rosa_Bexley"),
        ],
        "s string, p string, o string",
    )
    onto = spark.createDataFrame(
        [("birthPlace", "birth place", "Settlement Kind")],
        "predicate string, label string, range_label string",
    )
    v = scorer_vocab({"The": 1.0, "fast": 2.0}, kg_triples=kg, ontology=onto)
    # idf keys lowered + camel words + raw localnames + whole labels
    assert {"the", "fast", "birth", "place", "team", "sport",
            "birthplace", "teamsport", "birth place", "settlement kind"} <= v
    # entity names only appear when the rerank answer-sim channel asks
    assert "alba" not in v and "rosa" not in v
    v2 = scorer_vocab({}, kg_triples=kg, include_object_localnames=True)
    assert {"rosa", "bexley"} <= v2


def test_blacklist_filter(spark):
    pairs = spark.createDataFrame(
        [("u", 0, "A", "B", 1.0, ["x"])],
        "url string, sent_id int, e1 string, e2 string, pair_prior double, rel_tokens array<string>",
    )
    kg = spark.createDataFrame(
        [
            ("A", "http://dbpedia.org/ontology/birthPlace", "B"),
            ("A", "http://purl.org/dc/terms/subject", "B"),
            ("A", "http://x/core#broader", "B"),
            ("A", "http://dbpedia.org/ontology/wikiPageWikiLink", "B"),
        ],
        "s string, p string, o string",
    )
    got = candidate_predicates(pairs, kg)
    assert [r["pred"] for r in got.collect()] == ["birthPlace"]


def test_ontology_single_row_guard(spark):
    cands = spark.createDataFrame(
        [("u", 0, "A", "B", "p://x/unique", "unique", ["t"], 1.0, "forward"),
         ("u", 0, "A", "B", "p://x/dupe", "dupe", ["t"], 1.0, "forward")],
        "url string, sent_id int, subj string, obj string, pred_uri string, "
        "pred string, rel_tokens array<string>, pair_prior double, rule string",
    )
    onto = spark.createDataFrame(
        [("unique", "unique label", "range1"),
         ("dupe", "l1", "r1"), ("dupe", "l2", "r2")],
        "predicate string, label string, range_label string",
    )
    got = {r["pred"]: r["hier"] for r in enrich_ontology(cands, onto).collect()}
    assert got["unique"] == ["unique label", "range1"]
    # >1 ontology rows -> fallback [pred, pred] (DataExtract.py:120-123)
    assert got["dupe"] == ["dupe", "dupe"]
