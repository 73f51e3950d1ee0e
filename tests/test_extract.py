"""Extraction: pure-function kernel + the byte-identical per-url invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from predicate_finder_spark.operators.extract import extract_pages, extract_text_py


def test_kernel_strips_boilerplate():
    html = (
        b"<html><head><title>t</title><script>var x;</script></head><body>"
        b"<nav>Home</nav><div class=\"ads\">Buy!</div>"
        b"<article><p>First one.</p><p>Second one.</p></article>"
        b"<footer>&copy; me</footer></body></html>"
    )
    assert extract_text_py(html) == "First one. Second one."


def test_kernel_entities_and_nesting():
    assert extract_text_py(b"<p>a &amp; b &lt;c&gt;</p>") == "a & b <c>"
    assert extract_text_py(None) == ""
    assert extract_text_py(b"") == ""


def test_kernel_is_pure():
    html = b"<p>same input</p>"
    assert extract_text_py(html) == extract_text_py(html)


def test_byte_identical_invariant(spark, corpus):
    """north_rule invariant: extracted text == gold text for every url."""
    out = extract_pages(corpus["pages"], replace=False)
    bad = out.filter(F.col("text_extracted") != F.col("text")).count()
    total = out.count()
    assert total > 0 and bad == 0


def test_extraction_deterministic_across_repartition(spark, corpus):
    a = extract_pages(corpus["pages"]).select("url", "text")
    b = extract_pages(corpus["pages"].repartition(11)).select("url", "text")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
