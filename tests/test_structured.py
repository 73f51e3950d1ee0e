"""Structured-data extraction (operators/structured.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from predicate_finder_spark.operators import structured


def _page(spark, html: str, url: str = "https://p.org/1"):
    return spark.createDataFrame(
        [(url, html.encode())], "url string, html binary"
    )


def test_jsonld_triples_fixture(spark):
    html = (
        '<html><head><script type="application/ld+json">'
        '{"@id":"doc:a","@type":"Person","name":"Ada","born":"1815"}'
        "</script></head><body>"
        '<script type="application/ld+json">{"name":"NoId"}</script>'
        '<script type="application/ld+json">{broken</script></body></html>'
    )
    rows = {
        (r["subj"], r["pred"], r["obj"])
        for r in structured.jsonld_triples(_page(spark, html)).collect()
    }
    # @-keys dropped, @id lifted to subj; second block defaults subj=url;
    # the malformed third block vanishes without poisoning the others
    assert rows == {
        ("doc:a", "name", "Ada"),
        ("doc:a", "born", "1815"),
        ("https://p.org/1", "name", "NoId"),
    }


def test_infobox_facts_fixture(spark):
    html = (
        '<table><tr class="r"><th>Birth Place</th><td>London, <b>UK</b></td></tr>'
        "<tr><th>Known For</th><td>  Analytical   Engine </td></tr>"
        "<tr><td>spacer-no-th</td></tr></table>"
    )
    rows = {
        (r["key"], r["value"])
        for r in structured.infobox_facts(_page(spark, html)).collect()
    }
    # snake_case keys, inner markup stripped, whitespace collapsed,
    # header-less layout rows dropped
    assert rows == {
        ("birth_place", "London, UK"),
        ("known_for", "Analytical Engine"),
    }


def test_synth_corpus_structured_channels(spark, corpus):
    """The synthetic crawl carries a JSON-LD block (head) and an infobox
    (aside) — both dropped whole by the text extractor, so the structured
    channels coexist with the byte-identical extraction invariant."""
    from predicate_finder_spark.operators.extract import extract_pages

    pages = corpus["pages"]
    n = pages.count()

    n_en = pages.filter(F.col("lang") == "en").count()
    tri = structured.jsonld_triples(pages).cache()
    # name + inLanguage per page, plus 'about' on en pages (planted fact)
    assert tri.count() == 2 * n + n_en
    # subject defaults to @id, which synth sets to the page url
    assert tri.filter(F.col("subj") != F.col("url")).count() == 0
    langs = structured.jsonld_triples(pages).filter(F.col("pred") == "inLanguage")
    mismatch = (
        langs.join(pages.select("url", "lang"), "url")
        .filter(F.col("obj") != F.col("lang"))
        .count()
    )
    assert mismatch == 0

    facts = structured.infobox_facts(pages)
    by_key = {r["key"]: r["n"] for r in
              facts.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_key.pop("page_language") == n
    assert by_key.pop("page_id") == n
    # the planted predicate rows: one per en page, keys are ontology labels
    assert sum(by_key.values()) == n_en

    # invariant: re-extraction over the enriched html is byte-identical
    re_extracted = extract_pages(pages.select("url", "warc_ts", "html", "lang", "text"))
    diff = (
        re_extracted.select("url", F.col("text").alias("t2"))
        .join(pages.select("url", "text"), "url")
        .filter(F.col("t2") != F.col("text"))
        .count()
    )
    assert diff == 0


def test_structured_triples_are_gold_subset(spark, corpus):
    """The fused channel (subject from JSON-LD 'about', predicate/object
    from the infobox, both linked through the alias dictionary) recovers
    exactly one gold triple per en page — precision 1.0 with zero model
    involvement."""
    pages = corpus["pages"]
    n_en = pages.filter(F.col("lang") == "en").count()
    tri = structured.structured_triples(
        pages, corpus["aliases"], corpus["ontology"]
    ).cache()
    assert tri.count() == n_en
    # every emitted triple is gold (left_anti against gold is empty)
    non_gold = tri.join(
        corpus["gold_triples"], ["url", "subj", "pred", "obj"], "left_anti"
    ).count()
    assert non_gold == 0
    # contract columns match the text channel's to_triples output
    assert set(tri.columns) == {"subj", "pred", "obj", "score", "url", "provenance"}
