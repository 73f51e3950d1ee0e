"""Sentence splitting + candidate mention generation.

Replaces the reference's per-question tokenize loops
(baseline/baseline.py:102-123) with explode-based narrow transforms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from predicate_finder_spark.functions.text import ngram_texts, sentences, tokenize


def explode_sentences(pages: DataFrame, languages: tuple[str, ...] = ("en",)) -> DataFrame:
    """pages -> sentences(url, sent_id, sentence, tokens).

    Language filter first (F5; reference DataExtract.py:76) so the explode
    never materializes non-target rows — Catalyst pushes the lang filter
    into the parquet scan.
    """
    return (
        pages.filter(F.col("lang").isin(*languages))
        .select("url", F.posexplode(sentences("text")).alias("sent_id", "sentence"))
        .withColumn("tokens", tokenize("sentence"))
        .withColumn("sent_id", F.col("sent_id").cast("int"))
    )


def generate_mentions(sent_df: DataFrame, max_n: int = 3) -> DataFrame:
    """sentences -> mentions(url, sent_id, start, length, surface).

    Candidate surfaces are all 1..max_n token n-grams, lowercased.  One
    explode of the concatenated per-n arrays (single narrow stage, ~max_n x
    token-count rows; the alias join immediately after filters it down).
    """
    # lower each token ONCE in its own projection (a token is re-read by up
    # to max_n * 2 - 1 grams; the previous shape re-ran lower over the whole
    # joined gram inside the interpreted HOF).  Per-token lowercase + join
    # is value-identical to join + lowercase: gram tokens are separated by
    # spaces, so Java's only context-sensitive lowercase mapping (final
    # sigma) sees the same right-context either way.  The projection is
    # referenced several times by the gram expression, so CollapseProject
    # keeps the boundary and lower runs once per token.
    base = sent_df.select(
        "url", "sent_id", F.transform(F.col("tokens"), F.lower).alias("__lt")
    )
    toks = F.col("__lt")
    # one nested higher-order expression: for each valid n, for each start
    # offset, emit struct(start, length, surface) — flatten and explode once.
    # (The start index comes straight from the inner lambda variable; no
    # per-row positional arithmetic.)
    grams = F.flatten(
        F.transform(
            F.filter(
                F.sequence(F.lit(1), F.lit(max_n)), lambda n: n <= F.size(toks)
            ),
            lambda n: F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.struct(
                    i.cast("int").alias("start"),
                    n.cast("int").alias("length"),
                    F.array_join(F.slice(toks, i + 1, n), " ").alias("surface"),
                ),
            ),
        )
    )
    return base.select(
        "url", "sent_id", F.explode(grams).alias("g")
    ).select("url", "sent_id", "g.start", "g.length", "g.surface")
