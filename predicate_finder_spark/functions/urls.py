"""URL normalization / host extraction for web-corpus curation.

Common-Crawl-style corpora key everything on the page URL (the north
rule's input table is ``(url, warc_ts, html, text, lang)``), and the
first curation step of any crawl pipeline is URL canonicalization —
the same page arrives as ``http://Example.com/a?utm_source=x#frag`` and
``http://example.com/a`` across crawls, and exact-URL dedup is worthless
until those collapse.

Everything here is a chain of ``regexp_extract`` / ``regexp_replace`` /
``lower`` — pure whole-stage-codegen column expressions, zero Python per
row at corpus scale, and every regex is in the Java-regex ∩ RE2 subset
(character classes, bounded repetition, alternation — no lookaround, no
backreferences) so the DuckDB oracle computes byte-identical output
(same constraint as analysis.PII_PATTERNS).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
# params that identify a campaign/click, never a resource (public lists:
# utm_* from Google Analytics docs, gclid/fbclid/msclkid click ids)
_TRACKING = r"(utm_[a-z]+|gclid|fbclid|msclkid|ref)=[^&#]*"


def url_host(url: Column) -> Column:
    """Lowercased host of a URL (userinfo and port stripped); '' if the
    value has no ``scheme://`` prefix."""
    hostport = F.regexp_extract(url, _SCHEME_RE + r"([^/?#]*)", 2)
    no_user = F.regexp_replace(hostport, "^[^@]*@", "")
    return F.lower(F.regexp_replace(no_user, ":[0-9]+$", ""))


def canonicalize_url(url: Column) -> Column:
    """Canonical form: lowercase scheme+host, strip userinfo / default
    ports (``:80`` http, ``:443`` https) / fragment / tracking params,
    then tidy leftover separators.  Path+query case is preserved (paths
    are case-sensitive per RFC 3986; only scheme/host are not).

    Rows with no ``scheme://`` prefix pass through with only the
    fragment/tracking cleanup — never guessed into absolute URLs.
    """
    scheme = F.regexp_extract(url, _SCHEME_RE, 1)
    hostport = F.regexp_extract(url, _SCHEME_RE + r"([^/?#]*)", 2)
    rest = F.regexp_replace(url, _SCHEME_RE + "[^/?#]*", "")
    host = F.lower(F.regexp_replace(hostport, "^[^@]*@", ""))
    host = F.when(
        (F.lower(scheme) == "http") & host.endswith(":80"),
        F.regexp_replace(host, ":80$", ""),
    ).when(
        (F.lower(scheme) == "https") & host.endswith(":443"),
        F.regexp_replace(host, ":443$", ""),
    ).otherwise(host)
    cleaned_rest = _strip_noise(rest)
    return F.when(
        scheme != "",
        F.concat(F.lower(scheme), F.lit("://"), host, cleaned_rest),
    ).otherwise(_strip_noise(url))


def _strip_noise(part: Column) -> Column:
    """Drop fragment + tracking params from a path?query[#fragment] part.

    Three ordered passes keep the query-string separators well-formed
    without regex backreferences (whose replacement syntax differs
    between Java regex and RE2, breaking oracle portability):
    ``&track=v`` anywhere is dropped; a leading ``?track=v&`` hands its
    ``?`` to the next param; a now-lone ``?track=v`` disappears.
    """
    out = F.regexp_replace(part, "#.*$", "")
    out = F.regexp_replace(out, "&" + _TRACKING, "")
    out = F.regexp_replace(out, r"\?" + _TRACKING + "&", "?")
    return F.regexp_replace(out, r"\?" + _TRACKING + "$", "")
