"""Deterministic synthetic corpus (FIXTURES.md).

Generates the ``pages`` input table plus the dictionary tables that replace
the reference's remote services (SPARQL endpoint -> ``kg_triples``,
Spotlight/Falcon -> ``aliases``, GetHierLabel -> ``ontology``, GloVe ->
``embeddings``) and the by-construction ``gold_triples``.

Design constraints:
- **Scale-proof determinism**: every random choice is a pure function of
  (page_id, sentence_idx, tag) via md5 — no RNG state, no driver loops over
  rows — so the generator itself distributes and the corpus is identical at
  any parallelism.  (Only the tiny dictionaries are driver-built.)
- **Zipfian subjects** (exponent 1.1): head entities appear in many pages so
  salted-join skew handling is actually exercised (SURVEY.md §7 watch list).
- **Gold known by construction**: each sentence realizes one (s, p, o) from
  a fixed template per predicate whose surface words are the predicate's
  camelCase words, so the IDF x cosine scorer (reference
  baseline/baseline.py:96-169 semantics) can recover p from text.
"""

from __future__ import annotations

import hashlib
import math
import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from predicate_finder_spark.functions.analysis import LANG_PROFILES

ONTOLOGY_NS = "http://dbpedia.org/ontology/"

# camelCase predicates; template words = camel words (baseline.py:44-56).
PREDICATES = [
    "birthPlace", "deathPlace", "capitalCity", "headOffice",
    "spokenLanguage", "writtenWork", "foundingYear", "borderCountry",
    "riverMouth", "teamSport", "alumniSchool", "marketTown",
]

# blacklisted URIs the candidate filter must drop (DataExtract.py:58-62)
BLACKLISTED_URIS = [
    "http://www.w3.org/2004/02/skos/core#broader",
    "http://purl.org/dc/terms/subject",
    "http://dbpedia.org/ontology/wikiPageWikiLink",
    "http://purl.org/linguistics/gold/hypernym",
]

_FIRST = [
    "Alba", "Boris", "Clara", "Dario", "Elena", "Farid", "Greta", "Hugo",
    "Irene", "Jonas", "Kiara", "Liam", "Mona", "Nils", "Olga", "Pavel",
    "Queenie", "Rosa", "Stefan", "Tilda",
]
_SECOND = [
    "Arnheim", "Bexley", "Corvado", "Drenthe", "Elsinore", "Fallkirk",
    "Granada", "Hordaland", "Ithaca", "Jutland",
]

NON_EN_LANGS = ["de", "fr", "es", "zh"]


def entity_names(n: int = 200) -> list[str]:
    """Deterministic canonical entity names, underscore style (max 200)."""
    assert n <= len(_FIRST) * len(_SECOND)
    return [f"{_FIRST[i % 20]}_{_SECOND[i // 20]}" for i in range(n)]


def _u(*cols) -> F.Column:
    """Uniform [0,1) as a pure function of the key columns (md5-based)."""
    key = F.concat_ws("|", *[c if isinstance(c, F.Column) else F.lit(str(c)) for c in cols])
    return (
        F.conv(F.substring(F.md5(key), 1, 12), 16, 10).cast("double")
        % F.lit(1000003.0)
    ) / F.lit(1000003.0)


def _pick(arr_lit: F.Column, u: F.Column, n: int) -> F.Column:
    return F.element_at(arr_lit, (F.floor(u * n) + 1).cast("int"))


def _camel_words(pred: str) -> list[str]:
    out, cur = [], ""
    for ch in pred:
        if ch.isupper() and cur:
            out.append(cur.lower())
            cur = ch
        else:
            cur += ch
    out.append(cur.lower())
    return out


def sentence_rows(
    spark: SparkSession,
    n_pages: int,
    n_entities: int = 200,
    ids: DataFrame | None = None,
) -> DataFrame:
    """One row per (page, sentence): the generative frame everything else
    derives from.  Pure column expressions over spark.range(n_pages) — or,
    when ``ids`` is given (a DataFrame with a ``page_id`` column and any
    passthrough columns, e.g. the driver's ``documents`` table), over those
    ids instead, so external corpora can seed deterministic pages."""
    ents = entity_names(n_entities)
    surfaces = [e.replace("_", " ") for e in ents]
    ent_arr = F.array(*[F.lit(s) for s in surfaces])
    ent_canon_arr = F.array(*[F.lit(e) for e in ents])
    pred_arr = F.array(*[F.lit(p) for p in PREDICATES])
    pred_words_arr = F.array(*[F.lit(" ".join(_camel_words(p))) for p in PREDICATES])
    lang_arr = F.array(*[F.lit(x) for x in NON_EN_LANGS])

    base = ids if ids is not None else spark.range(n_pages).withColumnRenamed("id", "page_id")
    df = (
        base
        .withColumn("url", F.format_string("https://example.org/page/%08d", F.col("page_id")))
        .withColumn("lang", F.when(_u(F.col("page_id"), "lang") < 0.9, "en").otherwise(
            _pick(lang_arr, _u(F.col("page_id"), "lang2"), len(NON_EN_LANGS))))
        .withColumn("n_sent", (1 + F.pmod(F.conv(F.substring(F.md5(
            F.concat(F.col("url"), F.lit("#k"))), 1, 8), 16, 10).cast("long"), 3)).cast("int"))
        .withColumn("sent_idx", F.explode(F.sequence(F.lit(0), F.col("n_sent") - 1)))
    )

    us = _u(F.col("page_id"), F.col("sent_idx"), "s")
    # Zipf-ish inverse transform: idx = floor(E * u^2) — polynomial head
    # skew (head entity ~7% of rows at E=200), O(1) per row instead of a
    # 200-element CDF scan.  (Exact-Zipf is not required, only a heavy head
    # so salted joins are load-bearing.)
    sidx = F.least(F.floor(n_entities * F.pow(us, 2.0)).cast("int"), F.lit(n_entities - 1))
    uo = _u(F.col("page_id"), F.col("sent_idx"), "o")
    oidx = F.pmod(sidx + 1 + F.floor(uo * (n_entities - 1)).cast("int"), F.lit(n_entities))
    up = _u(F.col("page_id"), F.col("sent_idx"), "p")
    pidx = F.floor(up * len(PREDICATES)).cast("int")
    reversed_ = _u(F.col("page_id"), F.col("sent_idx"), "r") < 0.1

    df = (
        df.withColumn("subj", F.element_at(ent_canon_arr, sidx + 1))
        .withColumn("subj_surface", F.element_at(ent_arr, sidx + 1))
        .withColumn("obj", F.element_at(ent_canon_arr, oidx.cast("int") + 1))
        .withColumn("obj_surface", F.element_at(ent_arr, oidx.cast("int") + 1))
        .withColumn("pred", F.element_at(pred_arr, pidx + 1))
        .withColumn("pred_words", F.element_at(pred_words_arr, pidx + 1))
        .withColumn("reversed", reversed_)
    )

    en_sentence = F.when(
        F.col("reversed"),
        F.concat(F.col("obj_surface"), F.lit(" is "), F.col("pred_words"),
                 F.lit(" of "), F.col("subj_surface"), F.lit(".")),
    ).otherwise(
        F.concat(F.col("subj_surface"), F.lit(" has "), F.col("pred_words"),
                 F.lit(" "), F.col("obj_surface"), F.lit(".")),
    )
    # non-en sentences: stopword-profile filler so lang_id() is testable
    filler = {lang: " ".join(LANG_PROFILES[lang][:6]) + "." for lang in NON_EN_LANGS}
    non_en_sentence = F.lit(filler[NON_EN_LANGS[0]])
    for lang in NON_EN_LANGS[1:]:
        non_en_sentence = F.when(F.col("lang") == lang, F.lit(filler[lang])).otherwise(
            non_en_sentence
        )

    return df.withColumn(
        "sentence", F.when(F.col("lang") == "en", en_sentence).otherwise(non_en_sentence)
    )


def build_pages(rows: DataFrame) -> DataFrame:
    """Assemble pages(url, warc_ts, html, text, lang) from sentence rows.

    ``text`` is the gold extraction output (byte-identical invariant);
    ``html`` wraps it in nav/ads/footer boilerplate the extractor must strip.
    """
    pages = (
        rows.groupBy("page_id", "url", "lang")
        .agg(
            F.array_join(F.transform(F.array_sort(F.collect_list(
                F.struct("sent_idx", "sentence"))), lambda s: s["sentence"]), " ").alias("text"),
            # one representative gold fact per en page (min sent_idx) —
            # planted in the structured channels (JSON-LD 'about' subject +
            # infobox predicate/object row) so structured_triples recovers
            # a gold subset; non-en pages plant nothing (gold is en-only)
            F.min(F.when(F.col("lang") == "en", F.struct(
                "sent_idx", "subj_surface", "pred_words", "obj_surface"
            ))).alias("fact"),
        )
        .withColumn("warc_ts", F.timestamp_seconds(
            F.lit(1767225600) + (F.col("page_id") % 30) * 86400 + F.col("page_id") % 86400))
    )
    html = F.concat(
        F.lit("<html><head><title>"), F.col("url"),
        # structured-data channel (operators/structured.py): a schema.org
        # JSON-LD block in <head> — the whole head is dropped by the
        # extractor, so the byte-identical text invariant is untouched
        F.lit('</title><script type="application/ld+json">{"@id":"'),
        F.col("url"),
        F.lit('","@type":"WebPage","name":"Page '),
        F.col("page_id").cast("string"),
        F.lit('","inLanguage":"'), F.col("lang"), F.lit('"'),
        F.when(
            F.col("fact").isNotNull(),
            F.concat(F.lit(',"about":"'), F.col("fact.subj_surface"), F.lit('"')),
        ).otherwise(F.lit("")),
        F.lit('}</script><script>var x=1;</script></head><body>'
              '<nav>Home | About | Contact | <a href="'),
        F.format_string("https://example.org/page/%08d", F.col("page_id") + 1),
        F.lit('">next</a> <a href="'),
        F.format_string(
            "HTTPS://Partner%d.Example.NET:443/ref/%08d?utm_source=synth",
            F.pmod(F.col("page_id"), F.lit(7)), F.col("page_id"),
        ),
        # links live inside <nav>, which the extractor drops whole — the
        # byte-identical text invariant is untouched by the link markup
        # infobox channel: key/value table inside <aside> (also dropped
        # whole by the extractor — invariant untouched)
        F.lit('">partner</a></nav>'
              '<aside class="infobox"><table><tr><th>Page Language</th><td>'),
        F.col("lang"),
        F.lit("</td></tr><tr><th>Page Id</th><td>"),
        F.col("page_id").cast("string"),
        F.lit("</td></tr>"),
        F.when(
            F.col("fact").isNotNull(),
            F.concat(F.lit("<tr><th>"), F.col("fact.pred_words"),
                     F.lit("</th><td>"), F.col("fact.obj_surface"),
                     F.lit("</td></tr>")),
        ).otherwise(F.lit("")),
        F.lit('</table></aside>'
              '<div class="ads">Buy now! Limited offer!</div><article><p>'),
        F.regexp_replace(F.col("text"), r"(?<=[.!?]) ", "</p><p>"),
        F.lit("</p></article><footer>&copy; 2026 example.org</footer></body></html>"),
    )
    return pages.select(
        "url", "warc_ts", html.cast("binary").alias("html"), "text", "lang"
    )


def build_gold(rows: DataFrame) -> DataFrame:
    """gold_triples(url, subj, pred, obj) — English pages only."""
    return (
        rows.filter(F.col("lang") == "en")
        .select("url", "subj", "pred", "obj")
        .distinct()
    )


def build_kg(rows: DataFrame) -> DataFrame:
    """kg_triples(s, p, o): gold triples with full ontology URIs, plus per
    (s, o) pair 2 distractor predicates and (for ~30% of pairs) a
    blacklisted-URI triple, so candidate filtering (F2) and scoring (C6/A1)
    are both load-bearing."""
    gold = (
        rows.filter(F.col("lang") == "en")
        .select("subj", "pred", "obj").distinct()
    )
    base = gold.select(
        F.col("subj").alias("s"),
        F.concat(F.lit(ONTOLOGY_NS), F.col("pred")).alias("p"),
        F.col("obj").alias("o"),
    )
    pairs = gold.select("subj", "obj").distinct()
    k = len(PREDICATES)
    pred_arr = F.array(*[F.lit(p) for p in PREDICATES])
    d1 = F.floor(_u(F.col("subj"), F.col("obj"), "d1") * k).cast("int")
    d2 = F.pmod(d1 + 1 + F.floor(_u(F.col("subj"), F.col("obj"), "d2") * (k - 1)).cast("int"), F.lit(k))
    distract = pairs.select(
        F.col("subj").alias("s"),
        F.explode(F.array(
            F.concat(F.lit(ONTOLOGY_NS), F.element_at(pred_arr, d1 + 1)),
            F.concat(F.lit(ONTOLOGY_NS), F.element_at(pred_arr, d2.cast("int") + 1)),
        )).alias("p"),
        F.col("obj").alias("o"),
    )
    bad_arr = F.array(*[F.lit(b) for b in BLACKLISTED_URIS])
    bad = (
        pairs.filter(_u(F.col("subj"), F.col("obj"), "bl") < 0.3)
        .select(
            F.col("subj").alias("s"),
            _pick(bad_arr, _u(F.col("subj"), F.col("obj"), "bl2"), len(BLACKLISTED_URIS)).alias("p"),
            F.col("obj").alias("o"),
        )
    )
    return base.unionByName(distract).unionByName(bad).distinct()


def build_aliases(spark: SparkSession, n_entities: int = 200) -> DataFrame:
    """aliases(alias, entity, prior): full normalized surface (prior .95)
    plus the ambiguous first-token alias shared by ~10 entities each
    (prior .5/rank) — exercises ambiguity + containment resolution."""
    ents = entity_names(n_entities)
    rows = []
    for e in ents:
        full = e.replace("_", " ").lower()
        rows.append((full, e, 0.95))
        first = e.split("_")[0].lower()
        rank = _SECOND.index(e.split("_")[1]) + 1
        rows.append((first, e, round(0.5 / rank, 6)))
    return spark.createDataFrame(rows, schema="alias string, entity string, prior double")


def build_ontology(spark: SparkSession) -> DataFrame:
    """ontology(predicate, label, range_label); 'marketTown' gets two rows to
    exercise the exactly-one guard (reference DataExtract.py:120-123)."""
    rows = []
    for p in PREDICATES:
        label = " ".join(_camel_words(p))
        rows.append((p, label, "place" if "Place" in p or "City" in p else "thing"))
    rows.append(("marketTown", "market town", "settlement"))
    return spark.createDataFrame(
        rows, schema="predicate string, label string, range_label string"
    )


def build_embeddings(spark: SparkSession, dim: int = 16) -> DataFrame:
    """embeddings(word, vector): deterministic unit vectors seeded per word
    (stand-in for GloVe, reference baseline/baseline.py:16-18).  Identical
    surface words get identical vectors; distinct words are near-orthogonal
    in expectation, so exact n-gram matches win the cosine argmax."""
    vocab = {"has", "is", "of", "the", "and"}
    for p in PREDICATES:
        vocab.update(_camel_words(p))
    rows = []
    for w in sorted(vocab):
        seed = int(hashlib.md5(w.encode()).hexdigest()[:8], 16)
        rng = random.Random(seed)
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        rows.append((w, [float(x / n) for x in v]))
    return spark.createDataFrame(rows, schema="word string, vector array<float>")


def synth_question_set(
    spark: SparkSession, n_questions: int, n_entities: int = 200,
    paraphrase: bool = False,
) -> dict[str, DataFrame]:
    """LC-QuAD-shaped fixture for the question pipeline (plans/questions.py):
    questions + gold (qid, entity, pred) + a KG holding each question's
    answer triple in the right direction plus 2 same-direction distractor
    predicates per question (so scoring, not lookup, decides).

    ``paraphrase=True`` replaces each predicate's surface words in the
    QUESTION with truncated variants (``birth place`` -> ``birt plac``):
    deterministic out-of-vocabulary paraphrases that keep high character
    similarity but zero token overlap / no embedding.  This is the regime
    the reference built its learned re-ranker for (questions that don't
    repeat the predicate's words verbatim) — the baseline IDF x cosine
    scorer loses its signal while character-level features (Jaro-Winkler)
    retain it, so a FITTED re-ranker separates from both the baseline and
    any hand-weight fallback.
    """
    ents = entity_names(n_entities)
    surfaces = [e.replace("_", " ") for e in ents]
    ent_arr = F.array(*[F.lit(s) for s in surfaces])
    ent_canon_arr = F.array(*[F.lit(e) for e in ents])
    pred_arr = F.array(*[F.lit(p) for p in PREDICATES])
    def _surface(p: str) -> str:
        words = _camel_words(p)
        if paraphrase:
            words = [w[:-1] if len(w) > 2 else w for w in words]
        return " ".join(words)
    pred_words_arr = F.array(*[F.lit(_surface(p)) for p in PREDICATES])
    k = len(PREDICATES)

    q = spark.range(n_questions).withColumnRenamed("id", "qnum").withColumn(
        "qid", F.format_string("q%06d", F.col("qnum"))
    )
    ue = _u(F.col("qid"), "e")
    eidx = F.least(F.floor(n_entities * F.pow(ue, 2.0)).cast("int"), F.lit(n_entities - 1))
    uo = _u(F.col("qid"), "o")
    oidx = F.pmod(eidx + 1 + F.floor(uo * (n_entities - 1)).cast("int"), F.lit(n_entities)).cast("int")
    pidx = F.floor(_u(F.col("qid"), "p") * k).cast("int")
    d1 = F.pmod(pidx + 1 + F.floor(_u(F.col("qid"), "d1") * (k - 1)).cast("int"), F.lit(k)).cast("int")
    d2 = F.pmod(pidx + 2 + F.floor(_u(F.col("qid"), "d2") * (k - 2)).cast("int"), F.lit(k)).cast("int")
    reversed_ = _u(F.col("qid"), "r") < 0.15

    q = (
        q.withColumn("entity", F.element_at(ent_canon_arr, eidx + 1))
        .withColumn("surface", F.element_at(ent_arr, eidx + 1))
        .withColumn("other", F.element_at(ent_canon_arr, oidx + 1))
        .withColumn("pred", F.element_at(pred_arr, pidx + 1))
        .withColumn("pred_words", F.element_at(pred_words_arr, pidx + 1))
        .withColumn("d1", F.element_at(pred_arr, d1 + 1))
        .withColumn("d2", F.element_at(pred_arr, d2 + 1))
        .withColumn("reversed", reversed_)
        .withColumn(
            "question",
            F.when(
                reversed_,
                F.concat(F.lit("Whose "), F.col("pred_words"), F.lit(" is "),
                         F.col("surface"), F.lit("?")),
            ).otherwise(
                F.concat(F.lit("What is the "), F.col("pred_words"), F.lit(" of "),
                         F.col("surface"), F.lit("?")),
            ),
        )
        .persist()
    )

    def uri(c):
        return F.concat(F.lit(ONTOLOGY_NS), c)

    # answer triple: forward -> (entity, p, other); reversed -> (other, p, entity)
    s_col = F.when(F.col("reversed"), F.col("other")).otherwise(F.col("entity"))
    o_col = F.when(F.col("reversed"), F.col("entity")).otherwise(F.col("other"))
    kg = q.select(
        s_col.alias("s"),
        F.explode(F.array(uri(F.col("pred")), uri(F.col("d1")), uri(F.col("d2")))).alias("p"),
        o_col.alias("o"),
    ).distinct()

    return {
        "questions": q.select("qid", "question"),
        "gold": q.select("qid", "entity", "pred"),
        "kg_triples": kg,
        "aliases": build_aliases(spark, n_entities),
        "embeddings": build_embeddings(spark),
    }


def synth_corpus(spark: SparkSession, n_pages: int, n_entities: int = 200) -> dict[str, DataFrame]:
    """Full fixture set: pages + dictionaries + gold.

    The generative frame is persisted — pages, gold, and kg_triples all
    derive from it, and without the persist each consumer would re-run the
    whole generator lineage.
    """
    rows = sentence_rows(spark, n_pages, n_entities).persist()
    return {
        "pages": build_pages(rows),
        "gold_triples": build_gold(rows),
        "kg_triples": build_kg(rows),
        "aliases": build_aliases(spark, n_entities),
        "ontology": build_ontology(spark),
        "embeddings": build_embeddings(spark),
    }


# --- labeled quality sample (operators/quality.py fitting fixture) -------

_CLEAN_SENTS = [
    "the committee agreed that the proposal was sound and they moved to adopt it",
    "she walked along the river in the early morning while the town was still quiet",
    "after the meeting he wrote a short summary and sent it to the whole team",
    "the harvest was late that year because the rains had come early in the season",
    "a small library stood at the corner where the old road met the new bridge",
    "they discussed the plan over dinner and decided to leave before sunrise",
    "the teacher explained the idea again slowly until every student could follow",
    "when the storm passed the fishermen returned to the harbor with a full catch",
]

_SPAM_SENTS = [
    "buy now 4999 4999 buy now 4999 4999 buy now 4999 4999",
    "click click click 777 777 777 click click click 777 777 777",
    "win win win 100 100 100 win win win 100 100 100",
    "zzz qqq zzz qqq 555 zzz qqq zzz qqq 555 zzz qqq",
    "free free free 2026 2026 free free free 2026 2026 free free",
    "sale sale 99 99 sale sale 99 99 sale sale 99 99",
    "xx yy xx yy 42 42 xx yy xx yy 42 42",
    "subscribe subscribe 000 000 subscribe subscribe 000 000 subscribe subscribe 000 000",
]


def synth_quality_sample(spark: SparkSession, n: int = 400) -> DataFrame:
    """Labeled documents for quality-classifier fitting: ``(doc_id, text,
    label)`` with label 1.0 = clean prose (stopword-rich, alphabetic) and
    0.0 = spam (repetitive, digit-laden).  Same scale-proof determinism as
    the corpus generator: every choice is md5(doc_id, slot) — no RNG state,
    identical at any parallelism."""
    clean = F.array(*[F.lit(s) for s in _CLEAN_SENTS])
    spam = F.array(*[F.lit(s) for s in _SPAM_SENTS])
    label = (F.col("id") % 2).cast("double")
    pool = F.when(label == 1.0, clean).otherwise(spam)
    sents = [
        _pick(pool, _u("quality", F.col("id"), k), len(_CLEAN_SENTS))
        for k in range(3)
    ]
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" . ", *sents).alias("text"),
        label.alias("label"),
    )
