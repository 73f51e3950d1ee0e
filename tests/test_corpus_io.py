"""S1/S2/K1 scans and sinks + F3 URI extraction."""

from __future__ import annotations

import json

from predicate_finder_spark.sources.corpus import (
    extract_gold_uris,
    parse_gold,
    read_question_corpus,
    read_tsv,
    write_tsv,
)


def test_json_corpus_scan_and_template_filter(spark, tmp_path):
    items = [
        {"_id": "1", "corrected_question": "Who wrote X?",
         "sparql_query": "SELECT ?uri WHERE { <http://dbpedia.org/resource/X> <http://dbpedia.org/ontology/author> ?uri }",
         "sparql_template_id": 2},
        {"_id": "2", "corrected_question": "complex one",
         "sparql_query": "SELECT ...", "sparql_template_id": 305},
    ]
    p = str(tmp_path / "corpus.json")
    with open(p, "w") as f:
        json.dump(items, f)
    df = read_question_corpus(spark, p)
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["_id"] == "1"  # template 305 filtered (F1)
    all_rows = read_question_corpus(spark, p, simple_only=False).count()
    assert all_rows == 2


def test_uri_extraction(spark, tmp_path):
    items = [{"_id": "1", "corrected_question": "q",
              "sparql_query": "SELECT ?uri WHERE { <http://x/resource/Ent> <http://x/ontology/pred> ?uri }",
              "sparql_template_id": 1}]
    p = str(tmp_path / "c.json")
    with open(p, "w") as f:
        json.dump(items, f)
    got = extract_gold_uris(read_question_corpus(spark, p)).first()
    assert got["uri1"] == "http://x/resource/Ent"
    assert got["uri2"] == "http://x/ontology/pred"


def test_parse_gold_template_positions(spark, tmp_path):
    # templates 1/101: predicate URI first, entity second; 2/151/152: entity
    # first (reference QueryFilter.py get_for_1_101 vs get_for_2/151_152)
    items = [
        {"_id": "a", "corrected_question": "q101",
         "sparql_query": "SELECT ?uri WHERE { ?x <http://x/ontology/author> <http://x/resource/Book_A> }",
         "sparql_template_id": 101},
        {"_id": "b", "corrected_question": "q151",
         "sparql_query": "SELECT ?uri WHERE { <http://x/resource/Book_A> <http://x/ontology/author> ?uri }",
         "sparql_template_id": 151},
        {"_id": "c", "corrected_question": "q2",
         "sparql_query": "SELECT ?uri WHERE { <http://x/resource/City_B> <http://x/ontology/mayor> ?uri }",
         "sparql_template_id": 2},
    ]
    p = str(tmp_path / "corpus.json")
    with open(p, "w") as f:
        json.dump(items, f)
    got = {r["_id"]: r for r in parse_gold(read_question_corpus(spark, p)).collect()}
    # 101: URIs appear (pred, ent) in the text but gold must still be
    # (entity=Book_A, pred=author) — position chosen per template id
    assert got["a"]["entity"] == "Book_A" and got["a"]["pred"] == "author"
    assert got["b"]["entity"] == "Book_A" and got["b"]["pred"] == "author"
    assert got["c"]["entity"] == "City_B" and got["c"]["pred"] == "mayor"
    assert got["a"]["entity_surface"] == "Book"  # first underscore segment


def test_tsv_roundtrip(spark, tmp_path, corpus):
    out = str(tmp_path / "gold_tsv")
    gold = corpus["gold_triples"].limit(20)
    write_tsv(gold, out)
    back = read_tsv(spark, out, "url string, subj string, pred string, obj string")
    # header row excluded via schema? csv with header option on write: re-read skips via filter
    back = back.filter("url <> 'url'")
    assert back.count() == 20
    a = {tuple(r) for r in gold.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b
