"""URL canonicalization / host extraction (functions/urls)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from predicate_finder_spark.functions.urls import canonicalize_url, url_host


def _run(spark, cases, fn):
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    out = [r["v"] for r in df.select(fn(F.col("url")).alias("v")).collect()]
    for (u, want), got in zip(cases, out):
        assert got == want, f"{u!r}: got {got!r}, want {want!r}"


def test_url_host(spark):
    _run(spark, [
        ("http://Example.COM/a/b", "example.com"),
        ("https://user:pw@Sub.Site.org:8443/x?q=1", "sub.site.org"),
        ("ftp://files.example.net:21/", "files.example.net"),
        ("not a url", ""),
        ("/relative/path", ""),
    ], url_host)


def test_canonicalize_scheme_host_port(spark):
    _run(spark, [
        ("HTTP://Example.COM:80/Path/File.html", "http://example.com/Path/File.html"),
        ("HTTPS://EXAMPLE.com:443/a", "https://example.com/a"),
        # non-default port survives
        ("http://example.com:8080/a", "http://example.com:8080/a"),
        # https:80 is a real non-default port -> kept
        ("https://example.com:80/a", "https://example.com:80/a"),
        # userinfo stripped, path case preserved
        ("http://alice@Example.com/CaseSensitive", "http://example.com/CaseSensitive"),
    ], canonicalize_url)


def test_canonicalize_fragment_and_tracking(spark):
    _run(spark, [
        ("http://e.com/a#section-2", "http://e.com/a"),
        ("http://e.com/a?utm_source=tw&x=1", "http://e.com/a?x=1"),
        ("http://e.com/a?x=1&utm_medium=email", "http://e.com/a?x=1"),
        ("http://e.com/a?utm_source=tw", "http://e.com/a"),
        ("http://e.com/a?utm_source=t&utm_term=u&x=2#f", "http://e.com/a?x=2"),
        ("http://e.com/a?gclid=abc123&fbclid=z", "http://e.com/a"),
        ("http://e.com/a?keep=utm_sourceish", "http://e.com/a?keep=utm_sourceish"),
        # no scheme: cleanup only, never invented into an absolute URL
        ("page.html?utm_campaign=x#top", "page.html"),
    ], canonicalize_url)


def test_canonicalize_idempotent(spark):
    """canonicalize(canonicalize(u)) == canonicalize(u) — the property a
    crawl-frontier dedup key needs."""
    urls = [
        "HTTP://A.com:80/p?utm_source=x&q=1#f",
        "https://u@B.org:443/Q?gclid=1",
        "http://c.net/x?a=1&b=2",
        "relative/p?utm_term=z",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(canonicalize_url(F.col("url")).alias("u1"))
    twice = once.select(F.col("u1"), canonicalize_url(F.col("u1")).alias("u2"))
    for r in twice.collect():
        assert r["u1"] == r["u2"]


def test_duckdb_parity_on_synth_urls(spark):
    """The same regex chain in DuckDB (RE2) yields byte-identical output —
    the portability claim the q67 oracle depends on."""
    duckdb = pytest.importorskip("duckdb")
    urls = [
        "HTTP://Example.COM:80/Path?utm_source=a&x=1#frag",
        "https://user@Site.ORG:443/A/B?gclid=9",
        "http://plain.net/ok?a=1",
        "noscheme/path?utm_medium=m&k=v",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r["v"] for r in df.select(canonicalize_url(F.col("url")).alias("v")).collect()]
    t = r"(utm_[a-z]+|gclid|fbclid|msclkid|ref)=[^&#]*"
    sql = f"""
      WITH s AS (
        SELECT url,
               regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1) AS scheme,
               regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS hostport,
               regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '') AS rest
        FROM df
      ), h AS (
        SELECT *, lower(regexp_replace(hostport, '^[^@]*@', '')) AS host0 FROM s
      ), h2 AS (
        SELECT *,
          CASE WHEN lower(scheme) = 'http'  AND host0 LIKE '%:80'
                 THEN regexp_replace(host0, ':80$', '')
               WHEN lower(scheme) = 'https' AND host0 LIKE '%:443'
                 THEN regexp_replace(host0, ':443$', '')
               ELSE host0 END AS host
        FROM h
      ), c AS (
        SELECT *,
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            rest, '#.*$', ''), '&{t}', '', 'g'), '\\?{t}&', '?'), '\\?{t}$', '') AS rest_c,
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            url, '#.*$', ''), '&{t}', '', 'g'), '\\?{t}&', '?'), '\\?{t}$', '') AS url_c
        FROM h2
      )
      SELECT CASE WHEN scheme <> '' THEN lower(scheme) || '://' || host || rest_c
                  ELSE url_c END AS v
      FROM c
    """
    import pandas as pd
    pdf = pd.DataFrame({"url": urls})
    con = duckdb.connect()
    con.register("df", pdf)
    want = [r[0] for r in con.execute(sql).fetchall()]
    assert got == want
