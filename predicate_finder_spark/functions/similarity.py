"""Similarity kernels.

- ``cosine_expr``: pure Column expression over two array<float/double>
  columns (zip_with + aggregate) — codegen'd, used for ANN baselines and the
  DuckDB-oracle-checked queries.
- ``jaro_winkler_udf``: Arrow-batched pandas UDF (no Spark builtin exists;
  reference xgboost/utils.py:47-54 averages JW over token pairs).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    """cosine(a, b) with the reference's +1e-9 denominator guard
    (baseline/baseline.py:149-152)."""
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b) + F.lit(1e-9))


# ---------------------------------------------------------------------------
# Jaro-Winkler (pure python, wrapped in a vectorized pandas UDF)
# ---------------------------------------------------------------------------
def _jaro(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if not len1 or not len2:
        return 0.0
    match_dist = max(len1, len2) // 2 - 1
    m1 = [False] * len1
    m2 = [False] * len2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - match_dist)
        hi = min(len2, i + match_dist + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(len1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / len1 + matches / len2 + (matches - t) / matches) / 3.0


def jaro_winkler(s1: str, s2: str, p: float = 0.1, boost_threshold: float = 0.7) -> float:
    """Jaro-Winkler similarity (prefix-boosted Jaro), pure python.

    The prefix boost applies only when the Jaro similarity exceeds
    ``boost_threshold`` (0.7) — Winkler's original definition, and the one
    DuckDB's ``jaro_winkler_similarity`` implements (verified empirically
    over 3k fuzzed pairs), so the oracle can check this kernel bit-for-bit.
    Empty-string inputs return 0.0, also matching DuckDB (whose kernel
    treats an empty side as no-match even when both sides are empty).
    """
    if not s1 or not s2:
        return 0.0
    j = _jaro(s1, s2)
    if j <= boost_threshold:
        return j
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        prefix += 1
    return j + prefix * p * (1.0 - j)


@F.pandas_udf(T.DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized (Arrow-batched) Jaro-Winkler over two string columns."""
    return pd.Series(
        [jaro_winkler(x or "", y or "") for x, y in zip(a, b)], dtype="float64"
    )


@F.pandas_udf(T.DoubleType())
def jaro_winkler_tokens_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Mean pairwise Jaro-Winkler over two token-array columns — the
    reference's cha_sim feature (xgboost/utils.py:47-54), fixed semantics."""
    out = []
    for ta, tb in zip(a, b):
        ta = list(ta) if ta is not None else []
        tb = list(tb) if tb is not None else []
        if not ta or not tb:
            out.append(0.0)
            continue
        total = sum(jaro_winkler(x, y) for x in ta for y in tb)
        out.append(total / (len(ta) * len(tb)))
    return pd.Series(out, dtype="float64")


@F.pandas_udf(T.DoubleType())
def jaro_winkler_align_udf(query_tokens: pd.Series, target_tokens: pd.Series) -> pd.Series:
    """Greedy-alignment Jaro-Winkler: for each TARGET token take the best
    JW match among the QUERY tokens, then average over target tokens.

    The mean-PAIRWISE kernel above (the reference's cha_sim,
    xgboost/utils.py:47-54) is right for short relation spans, but over a
    whole question the stopwords ("what is the ...") dilute every
    predicate's score toward the same mid-0.2s and the ranking signal
    drowns.  Aligning each predicate word to its best question word keeps
    the character signal ("birt plac" -> birthPlace scores ~0.96 while
    headOffice stays ~0.5) regardless of how much else the question says.
    Asymmetric on purpose: extra query tokens are free, missing predicate
    words are penalized.
    """
    out = []
    for tq, tt in zip(query_tokens, target_tokens):
        tq = list(tq) if tq is not None else []
        tt = list(tt) if tt is not None else []
        if not tq or not tt:
            out.append(0.0)
            continue
        out.append(
            sum(max(jaro_winkler(t, q) for q in tq) for t in tt) / len(tt)
        )
    return pd.Series(out, dtype="float64")
