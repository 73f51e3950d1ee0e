"""Text / string column functions (SURVEY.md §2.8).

One deterministic tokenizer shared by every stage — the reference mixes
nltk.word_tokenize (baseline/baseline.py:107) with str.split()
(xgboost/utils.py:22), a parity hazard this engine deliberately avoids.

All functions here are pure Column expressions: they stay inside
WholeStageCodegen, never touch Python at execution time.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# wh-words per reference pretreatment/DataExtract.py:9-19 (get_qword)
WH_WORDS = ("what", "which", "who", "whom", "whose", "where", "when", "how")

_PUNCT_PAD = r"([?.,!;:()\"'])"
_PUNCT_PAD_PY = re.compile(_PUNCT_PAD)


def py_tokenize(s: str | None) -> list[str]:
    """Python twin of :func:`tokenize` for pandas-UDF interiors (the one
    place row-level Python is allowed).  MUST stay in lockstep with the
    column version — equality on punctuated text is pinned by
    tests/test_bpe.py."""
    return _PUNCT_PAD_PY.sub(r" \1 ", s or "").split()


def tokenize(col: Column | str) -> Column:
    """Deterministic whitespace+punctuation tokenizer -> array<string>.

    Pads punctuation with spaces then splits on whitespace runs; empty
    tokens dropped.  (C1; replaces nltk.word_tokenize at
    baseline/baseline.py:107 with a pure, pinned implementation.)
    """
    padded = F.regexp_replace(F.col(col) if isinstance(col, str) else col, _PUNCT_PAD, r" $1 ")
    return F.filter(F.split(F.trim(padded), r"\s+"), lambda t: t != F.lit(""))


def sentences(col: Column | str) -> Column:
    """Split text into sentences on terminal punctuation -> array<string>.

    Keeps the terminator attached (lookbehind split), trims, drops empties.
    """
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, r"(?<=[.!?])\s+")
    return F.filter(F.transform(parts, F.trim), lambda s: s != F.lit(""))


def camel_split(col: Column | str) -> Column:
    """camelCase -> lowercased word array (C2).

    Reference split_predicate at baseline/baseline.py:44-56:
    'birthPlace' -> ['birth', 'place'].
    """
    c = F.col(col) if isinstance(col, str) else col
    spaced = F.regexp_replace(c, r"([A-Z])", r" $1")
    return F.filter(
        F.split(F.lower(F.trim(spaced)), r"[\s_]+"), lambda t: t != F.lit("")
    )


def uri_localname(col: Column | str) -> Column:
    """Last URI path segment (C4) — ``uri.split('/')[-1]`` everywhere in the
    reference (baseline/baseline.py:130, DataExtract.py:145,175)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring_index(c, "/", -1)


def normalize_entity(col: Column | str) -> Column:
    """Entity surface normalization (F4; reference QueryFilter.py:119-122).

    Lowercase, strip non-alphanumerics (keep separators), split on
    underscore/space runs, drop empties, rejoin with single spaces.
    """
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(F.lower(c), r"[^a-z0-9_\s]", "")
    toks = F.filter(F.split(cleaned, r"[_\s]+"), lambda t: t != F.lit(""))
    return F.array_join(toks, " ")


def ngrams(tokens: Column, n: int) -> Column:
    """All contiguous n-grams of a token array -> array<array<string>> (C3).

    Reference get_ngram at baseline/baseline.py:21-28.  Pure higher-order
    expression: empty when fewer than ``n`` tokens.
    """
    return F.when(
        F.size(tokens) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(tokens) - n),
            lambda i: F.slice(tokens, i + 1, n),
        ),
    ).otherwise(F.array().cast("array<array<string>>"))


def ngram_texts(tokens: Column, n: int) -> Column:
    """n-grams joined with spaces -> array<string>."""
    return F.transform(ngrams(tokens, n), lambda g: F.array_join(g, " "))


def wh_word(tokens: Column) -> Column:
    """Question-word detection (C5; reference DataExtract.py:9-19): the LAST
    wh-word in the token list, falling back to the first token."""
    lowered = F.transform(tokens, F.lower)
    whs = F.filter(lowered, lambda t: t.isin(*WH_WORDS))
    # try_element_at: ANSI-safe on empty arrays (element_at throws)
    return F.coalesce(F.try_element_at(whs, F.lit(-1)), F.try_element_at(lowered, F.lit(1)))


def token_overlap_ratio(a: Column, b: Column) -> Column:
    """|set(a) ∩ set(b)| / |set(a)| (U2 — the reference's *intended*
    semantics; its list-`&` at xgboost/utils.py:43 is a TypeError bug we fix
    rather than replicate)."""
    ai = F.array_distinct(F.transform(a, F.lower))
    bi = F.array_distinct(F.transform(b, F.lower))
    return F.when(F.size(ai) > 0, F.size(F.array_intersect(ai, bi)) / F.size(ai)).otherwise(
        F.lit(0.0)
    )


# Latin diacritic fold map: source chars and their ASCII bases, one-to-one
# (translate() is a parallel per-char map — ordering within the strings is
# the pairing).  Covers the Latin-1 + common Latin-2 letters DBpedia alias
# surfaces actually carry; ß/æ/œ expand to two chars so they go through
# replace, not translate.
_FOLD_SRC = "áàâäãåāăéèêëēěíìîïīóòôöõøōőúùûüūůűýÿñńçćčšśžźżłđďřť"
_FOLD_DST = "aaaaaaaaeeeeeeiiiiioooooooouuuuuuuyynncccsszzzlddrt"


def fold_diacritics(col: Column | str) -> Column:
    """ASCII-fold Latin diacritics (lowercase input assumed — compose with
    ``F.lower``): á→a, ø→o, ß→ss, … as one codegen'd translate + two
    replaces.  The alias-dictionary normalization step: DBpedia surface
    forms carry accents, crawl text often drops them, and an exact-surface
    join misses the pair unless both sides fold.  Engine-portable: the
    map is explicit (no locale, no ICU), so the oracle replays it as a
    replace chain."""
    c = F.col(col) if isinstance(col, str) else col
    folded = F.translate(c, _FOLD_SRC, _FOLD_DST)
    folded = F.regexp_replace(folded, "ß", "ss")
    folded = F.regexp_replace(folded, "æ", "ae")
    return F.regexp_replace(folded, "œ", "oe")
