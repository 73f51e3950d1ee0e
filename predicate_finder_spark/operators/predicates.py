"""Mention pairing + candidate predicate generation + ontology enrichment.

Replaces the reference's per-entity live SPARQL lookups (GetPredicateList,
pretreatment/DataExtract.py:22-63 — entity-as-subject and entity-as-object
queries) with two equi-joins against a local ``kg_triples`` table, unioned;
and GetHierLabel (DataExtract.py:66-123) with an ontology dimension join
guarded by the reference's "exactly one row" rule (DataExtract.py:120-123).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from predicate_finder_spark.functions.text import camel_split, uri_localname
from predicate_finder_spark.operators.joins import salted_join


def pair_mentions(resolved: DataFrame, sent_df: DataFrame) -> DataFrame:
    """Consecutive linked mentions per sentence -> pairs with the relation
    surface tokens between the two spans.

    Uses lead() over (url, sent_id) ordered by start — O(n) per sentence,
    no self-join blow-up (scale: sentences with k mentions yield k-1 pairs,
    not k^2).
    """
    w = Window.partitionBy("url", "sent_id").orderBy(F.col("start").asc())
    pairs = (
        resolved.select(
            "url", "sent_id", "start", "length", "entity", "prior",
            F.lead("entity").over(w).alias("entity2"),
            F.lead("prior").over(w).alias("prior2"),
            F.lead("start").over(w).alias("start2"),
            F.lead("length").over(w).alias("length2"),
        )
        .filter(F.col("entity2").isNotNull())
        .filter(F.col("start2") >= F.col("start") + F.col("length"))
    )
    # relation surface = tokens strictly between the two spans
    out = (
        pairs.join(sent_df.select("url", "sent_id", "tokens"), ["url", "sent_id"])
        .withColumn(
            "rel_tokens",
            F.slice(
                F.col("tokens"),
                F.col("start") + F.col("length") + 1,
                F.greatest(F.col("start2") - F.col("start") - F.col("length"), F.lit(0)),
            ),
        )
        .select(
            "url", "sent_id",
            F.col("entity").alias("e1"), F.col("entity2").alias("e2"),
            (F.col("prior") * F.col("prior2")).alias("pair_prior"),
            "rel_tokens",
        )
    )
    return out


def candidate_predicates(
    pairs: DataFrame,
    kg_triples: DataFrame,
    blacklist: tuple[str, ...] = ("#", "subject", "wiki", "hypernym", "gender"),
    salt_buckets: int = 0,
) -> DataFrame:
    """pairs ⋈ kg_triples in BOTH directions (entity-as-subject and
    entity-as-object, reference DataExtract.py:25-41), blacklist-filtered
    (F2, DataExtract.py:58-62), distinct (F7).

    Output: (url, sent_id, subj, obj, pred_uri, pred, rel_tokens, rule).
    ``salt_buckets`` > 1 switches to the salted join for Zipfian head
    entities (SURVEY.md §4.2(1)).
    """
    import re as _re

    pattern = "|".join(_re.escape(b) for b in blacklist)
    kg = kg_triples.filter(~F.col("p").rlike(pattern)).select("s", "p", "o").distinct()

    # Explode each pair into both orientations BEFORE the join: one probe
    # frame, ONE kg join — a union of two per-direction joins would duplicate
    # the whole upstream pairs subtree in the physical plan and scan kg twice
    # (verified via explain; SURVEY.md J2 needs both directions, reference
    # DataExtract.py:25-41).
    both = pairs.select(
        "url", "sent_id", "rel_tokens", "pair_prior",
        F.explode(
            F.array(
                F.struct(
                    F.col("e1").alias("s"), F.col("e2").alias("o"),
                    F.lit("forward").alias("rule"),
                ),
                F.struct(
                    F.col("e2").alias("s"), F.col("e1").alias("o"),
                    F.lit("reverse").alias("rule"),
                ),
            )
        ).alias("d"),
    ).select("url", "sent_id", "rel_tokens", "pair_prior", "d.s", "d.o", "d.rule")

    if salt_buckets > 1:
        j = salted_join(both, kg, ["s", "o"], buckets=salt_buckets, salt_source="url")
    else:
        j = both.join(kg, ["s", "o"], "inner")
    # no dropDuplicates here: duplicate candidates (the same pair mentioned
    # at two positions in a sentence) are legitimate evidence rows, and the
    # top-1 window downstream picks exactly one row per pair anyway — a
    # dedup would cost a full extra shuffle for zero output change
    return j.select(
        "url", "sent_id",
        F.col("s").alias("subj"), F.col("o").alias("obj"),
        F.col("p").alias("pred_uri"), "rel_tokens", "pair_prior", "rule",
    ).withColumn("pred", uri_localname("pred_uri"))


def enrich_ontology(candidates: DataFrame, ontology: DataFrame) -> DataFrame:
    """Left-join ontology labels with the reference's exactly-one-row guard
    (DataExtract.py:120-123): a predicate with != 1 ontology rows falls back
    to [pred, pred] (reference mgnn/test.py:158-160).

    Adds ``hier`` array<string>: [label, range_label] or fallback.
    """
    w = Window.partitionBy("predicate")
    onto = (
        ontology.withColumn("__n", F.count(F.lit(1)).over(w))
        .filter(F.col("__n") == 1)
        .drop("__n")
    )
    out = candidates.join(
        F.broadcast(onto), candidates["pred"] == onto["predicate"], "left"
    ).drop("predicate")
    return out.withColumn(
        "hier",
        F.when(
            F.col("label").isNotNull(),
            F.array(F.col("label"), F.coalesce(F.col("range_label"), F.col("label"))),
        ).otherwise(F.array(F.col("pred"), F.col("pred"))),
    ).drop("label", "range_label")


def predicate_words(candidates: DataFrame) -> DataFrame:
    """camelCase-split the predicate local name (C2) -> ``pred_tokens``."""
    return candidates.withColumn("pred_tokens", camel_split("pred"))
