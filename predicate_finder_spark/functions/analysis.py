"""Text-analysis column functions for training-data pipelines.

Language ID, quality scoring, token counting, fingerprinting — all pure
Column expressions so a 100 TB corpus pays zero Python cost.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from predicate_finder_spark.functions.text import ngram_texts, tokenize

# Tiny per-language stopword profiles for the n-gram/stopword-hit heuristic.
# Deliberately small + deterministic (no external model in the sandbox).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "was", "that", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "von"),
    "fr": ("le", "la", "les", "et", "est", "une", "un", "des", "du", "que"),
    "es": ("el", "la", "los", "las", "y", "es", "un", "una", "de", "que"),
    "zh": ("的", "是", "了", "在", "和", "有", "我", "不", "这", "人"),
}

ENGLISH_STOPWORDS = LANG_PROFILES["en"] + (
    "for", "on", "with", "as", "at", "by", "an", "be", "are", "from",
)


def _hits(tokens_lower: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(tokens_lower, lambda t: t.isin(*words)))


def lang_hits(tokens_lower: Column) -> Column:
    """Per-profile hit counts -> array<int>, profile order.  Split out so a
    caller scoring many texts can materialize the array once in its own
    projection (see plans/curation.py) and feed it to :func:`lang_id`."""
    return F.array(*[_hits(tokens_lower, words) for words in LANG_PROFILES.values()])


def lang_id(
    text: Column, tokens: Column | None = None, hits: Column | None = None
) -> Column:
    """Heuristic language ID: argmax of stopword-profile hits -> string.

    Returns the language with the most profile-word hits; 'und'
    (undetermined) when nothing matches.  Deterministic tie-break by
    profile order (``array_position`` returns the FIRST max index, exactly
    the strictly-greater chain the loop formulation used).

    Implementation note (measured round 6): the original fold built nested
    ``when`` chains where every profile's hit count re-appeared inside
    conditional branches of later iterations — conditionally-evaluated
    subtrees are exempt from Catalyst's subexpression elimination, so the
    expression (and its generated code) grew multiplicatively and the
    tokenize subtree was re-evaluated many times per row (57 s first-call /
    8 s warm for the 200k-page curation gate vs 1.6 s for this shape,
    value-identical on all rows).

    ``tokens``: optional pre-lowered token array (shares one tokenize with
    other gates).  ``hits``: optional pre-computed :func:`lang_hits` array
    (shares the profile scan between the max and argmax references).
    """
    if hits is None:
        toks = tokens if tokens is not None else F.transform(tokenize(text), F.lower)
        hits = lang_hits(toks)
    names = F.array(*[F.lit(lang) for lang in LANG_PROFILES])
    m = F.array_max(hits)
    return F.when(
        m > 0, F.element_at(names, F.array_position(hits, m).cast("int"))
    ).otherwise(F.lit("und"))


def token_count(text: Column) -> Column:
    """Whitespace+punct token count (C1 tokenizer)."""
    return F.size(tokenize(text))


def word_token_count_bpe_ish(text: Column) -> Column:
    """BPE-ish token estimate: word-piece regex split — words, digits runs,
    and individual punctuation each count; long words count ceil(len/4)
    pieces (a deterministic stand-in for a real BPE vocab)."""
    toks = tokenize(text)
    return F.aggregate(
        toks,
        F.lit(0),
        lambda acc, t: acc + F.greatest(F.lit(1), F.ceil(F.length(t) / 4).cast("int")),
    )


def quality_score(text: Column, tokens: Column | None = None) -> Column:
    """Document quality in [0,1]: blend of length, alpha ratio, stopword
    ratio, and mean word length sanity — the usual web-corpus filters
    (C4-style heuristics), as one codegen'd expression.

    ``tokens``: optional pre-lowered token array — callers computing
    several token-level gates (plans/curation.py) materialize the array
    once in its own projection instead of re-tokenizing per sub-score."""
    toks = tokens if tokens is not None else F.transform(tokenize(text), F.lower)
    n = F.size(toks)
    n_d = n.cast("double")
    alpha = F.size(F.filter(toks, lambda t: t.rlike("^[a-z]+$"))).cast("double")
    stop = _hits(toks, ENGLISH_STOPWORDS).cast("double")
    mean_len = F.when(n > 0, F.length(F.array_join(toks, "")) / n_d).otherwise(F.lit(0.0))
    len_score = F.least(n_d / F.lit(100.0), F.lit(1.0))
    alpha_score = F.when(n > 0, alpha / n_d).otherwise(F.lit(0.0))
    stop_score = F.least(F.when(n > 0, stop / n_d).otherwise(F.lit(0.0)) * 4.0, F.lit(1.0))
    word_len_score = F.when((mean_len >= 3) & (mean_len <= 10), 1.0).otherwise(0.5)
    return (len_score + alpha_score + stop_score + word_len_score) / 4.0


# PII redaction patterns, ordered most-specific first (an email contains
# digit runs a looser pattern could claim).  Each regex is valid and
# equivalent under BOTH Java regex (Spark codegen) and RE2 (DuckDB
# oracle): character classes, bounded repetition, and \b only.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,3}[- ]\d{3,4}[- ]\d{3,4}\b", "<PHONE>"),
)


def pii_scrub(text: Column) -> Column:
    """Redact emails / IPv4s / intl phone numbers with typed placeholder
    tokens — a chained ``regexp_replace``, so the whole scrub stays inside
    whole-stage codegen (zero Python per row at corpus scale)."""
    out = text
    for _name, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_hit_count(text: Column) -> Column:
    """Number of PII matches in the document (sum over pattern types).
    Counted on the raw text per pattern via ``regexp_extract_all`` (the
    ordered scrub makes overlap impossible: '@' and digit-dot runs are
    disjoint alphabets, and the phone pattern's leading '+' cannot start
    inside an email/IP match)."""
    total = F.lit(0)
    for _name, pat, _repl in PII_PATTERNS:
        total = total + F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
    return total


def repetition_ratio(text: Column, n: int = 2) -> Column:
    """Gopher-style repetition signal: fraction of n-gram occurrences that
    are duplicates (``1 - distinct/total``), 0.0 for texts shorter than n
    tokens.  High values flag boilerplate/spam for curation filters."""
    g = ngram_texts(tokenize(text), n)
    total = F.size(g)
    return F.when(
        total > 0,
        F.lit(1.0) - F.size(F.array_distinct(g)).cast("double") / total.cast("double"),
    ).otherwise(F.lit(0.0))
