"""Dedup operators: exact, n-gram Jaccard, MinHash-LSH, SimHash, embedding."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from predicate_finder_spark.operators import dedup


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog while birds sing in the trees"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("dog", "cat")),  # near dup of 0
        (3, "completely different text about spark shuffle partitions and joins"),
        (4, "another unrelated document mentioning parquet files and row groups"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_dedup(docs):
    kept = sorted(r["doc_id"] for r in dedup.exact_dedup(docs).collect())
    assert kept == [0, 2, 3, 4]  # doc 1 collapsed into 0


def test_ngram_jaccard_pairs(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and 0.5 <= pairs[(0, 2)] < 1.0
    assert (0, 3) not in pairs


def test_minhash_lsh_finds_near_dups(docs):
    got = {(r["id_a"], r["id_b"]) for r in
           dedup.minhash_lsh_pairs(docs, num_hashes=16, bands=8, verify_threshold=0.5).collect()}
    assert (0, 1) in got and (0, 2) in got
    assert (0, 3) not in got and (3, 4) not in got


def test_simhash_pairs(docs):
    got = {(r["id_a"], r["id_b"]) for r in dedup.simhash_pairs(docs, max_hamming=10).collect()}
    assert (0, 1) in got and (0, 2) in got
    assert (0, 3) not in got


def test_embedding_cosine_pairs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),   # near dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),      # orthogonal
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r["id_a"], r["id_b"]) for r in
           dedup.embedding_cosine_pairs(vecs, threshold=0.95, n_planes=4).collect()}
    assert (0, 1) in got and (0, 2) not in got
