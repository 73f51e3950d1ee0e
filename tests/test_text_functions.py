"""Unit tests for SURVEY.md §2.8 scalar functions (C1-C5, U2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from predicate_finder_spark.functions import text as TX


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_tokenize_pads_punctuation(spark):
    got = _one(spark, TX.tokenize(F.lit("Hello, world! Is it?")))
    assert got == ["Hello", ",", "world", "!", "Is", "it", "?"]


def test_tokenize_collapses_whitespace(spark):
    assert _one(spark, TX.tokenize(F.lit("  a   b  "))) == ["a", "b"]


def test_sentences_split(spark):
    got = _one(spark, TX.sentences(F.lit("A b. C d! E f? G")))
    assert got == ["A b.", "C d!", "E f?", "G"]


def test_camel_split(spark):
    # reference split_predicate baseline/baseline.py:44-56
    assert _one(spark, TX.camel_split(F.lit("birthPlace"))) == ["birth", "place"]
    assert _one(spark, TX.camel_split(F.lit("longRunningThing"))) == [
        "long", "running", "thing",
    ]
    assert _one(spark, TX.camel_split(F.lit("simple"))) == ["simple"]


def test_uri_localname(spark):
    # reference uri.split('/')[-1] (baseline.py:130)
    assert (
        _one(spark, TX.uri_localname(F.lit("http://dbpedia.org/ontology/birthPlace")))
        == "birthPlace"
    )


def test_normalize_entity(spark):
    # reference QueryFilter.py:119-122
    assert _one(spark, TX.normalize_entity(F.lit("Alba_Arnheim"))) == "alba arnheim"
    assert _one(spark, TX.normalize_entity(F.lit("  A.B_c!  "))) == "ab c"


def test_ngrams(spark):
    got = _one(spark, TX.ngram_texts(TX.tokenize(F.lit("a b c")), 2))
    assert got == ["a b", "b c"]
    assert _one(spark, TX.ngram_texts(TX.tokenize(F.lit("a")), 2)) == []


def test_wh_word_last_wins_and_fallback(spark):
    # reference get_qword DataExtract.py:9-19: LAST wh-word, else first token
    toks = TX.tokenize(F.lit("What city is where he lives"))
    assert _one(spark, TX.wh_word(toks)) == "where"
    toks2 = TX.tokenize(F.lit("Name the capital"))
    assert _one(spark, TX.wh_word(toks2)) == "name"


def test_token_overlap_ratio(spark):
    # intended semantics of reference utils.py:38-44 (list-& bug fixed)
    a = F.array(F.lit("A"), F.lit("b"), F.lit("c"))
    b = F.array(F.lit("a"), F.lit("x"))
    assert abs(_one(spark, TX.token_overlap_ratio(a, b)) - 1 / 3) < 1e-9


def test_fold_diacritics(spark):
    from predicate_finder_spark.functions.text import fold_diacritics

    df = spark.createDataFrame(
        [("josé", "jose"), ("françois", "francois"), ("łódź", "lodz"),
         ("straße", "strasse"), ("smørrebrød", "smorrebrod"),
         ("cæsar", "caesar"), ("œuvre", "oeuvre"),
         ("plain ascii stays", "plain ascii stays")],
        "raw string, want string",
    )
    rows = df.select("want", fold_diacritics("raw").alias("got")).collect()
    for r in rows:
        assert r.got == r.want, (r.got, r.want)
    # idempotence: folding folded text is a no-op
    rows2 = df.select(
        (fold_diacritics(fold_diacritics("raw")) == fold_diacritics("raw")).alias("ok")
    ).collect()
    assert all(r.ok for r in rows2)
