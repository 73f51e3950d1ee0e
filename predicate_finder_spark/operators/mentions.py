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
    def _gram_struct(n: int):
        # NB: must be a 1-arg lambda — a second (even defaulted) parameter
        # makes pyspark pass the array index into it.
        return lambda t: F.struct(F.lit(n).alias("length"), F.lower(t).alias("surface"))

    per_n = [
        F.transform(ngram_texts(F.col("tokens"), n), _gram_struct(n))
        for n in range(1, max_n + 1)
    ]
    grams = F.concat(*per_n) if len(per_n) > 1 else per_n[0]
    # position of an n-gram inside the concat = its index within its n-block
    out = (
        sent_df.select(
            "url", "sent_id", F.size("tokens").alias("n_tok"),
            F.posexplode(grams).alias("pos", "g"),
        )
        .withColumn("length", F.col("g.length"))
        .withColumn(
            "start",
            # block n starts after sum_{m<n} (n_tok - m + 1) entries
            F.col("pos")
            - F.when(F.col("length") > 1,
                     F.aggregate(
                         F.sequence(F.lit(1), F.col("length") - 1),
                         F.lit(0),
                         lambda acc, m: acc + F.greatest(F.col("n_tok") - m + 1, F.lit(0)),
                     )).otherwise(F.lit(0)),
        )
        .select(
            "url", "sent_id",
            F.col("start").cast("int").alias("start"),
            F.col("length").cast("int").alias("length"),
            F.col("g.surface").alias("surface"),
        )
    )
    return out
