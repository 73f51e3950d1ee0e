"""Concat-and-chunk sequence packing vs a pure-Python oracle."""

from __future__ import annotations

import hashlib

from predicate_finder_spark.operators.packing import pack_chunks


def _py_bucket(doc_id: int, n: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % n


def _py_pack(rows, budget, n_buckets):
    """rows: [(doc_id, n_tokens)] -> {doc_id: (bucket, off, chunk, spanned)}"""
    streams = {}
    for doc_id, n_tok in sorted(rows):
        b = _py_bucket(doc_id, n_buckets)
        off = streams.get(b, 0)
        chunk = off // budget
        spanned = (off + max(n_tok, 1) - 1) // budget - chunk + 1
        streams[b] = off + n_tok
        yield doc_id, (b, off, chunk, spanned)


def test_pack_matches_python_oracle(spark):
    rows = [(i, f"{'tok ' * ((i * 7) % 23 + 1)}") for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["bucket"], r["tok_offset"], r["chunk_id"], r["chunks_spanned"])
        for r in pack_chunks(docs, budget=16, n_buckets=4).collect()
    }
    want = dict(_py_pack([(i, (i * 7) % 23 + 1) for i in range(200)], 16, 4))
    assert got == want


def test_pack_offsets_are_contiguous_per_bucket(spark):
    docs = spark.createDataFrame(
        [(i, "a b c d e") for i in range(50)], "doc_id long, text string"
    )
    out = pack_chunks(docs, budget=7, n_buckets=3).collect()
    by_bucket = {}
    for r in sorted(out, key=lambda r: (r["bucket"], r["doc_id"])):
        assert r["tok_offset"] == by_bucket.get(r["bucket"], 0)
        by_bucket[r["bucket"]] = r["tok_offset"] + r["n_tokens"]
        # 5 tokens into budget-7 chunks: spans 1 or 2 chunks, never more
        assert r["chunks_spanned"] in (1, 2)


def test_pack_zero_token_doc(spark):
    docs = spark.createDataFrame(
        [(1, "   "), (2, "x y")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in pack_chunks(docs, budget=4, n_buckets=1).collect()}
    assert got[1]["n_tokens"] == 0
    assert got[1]["chunks_spanned"] == 1
    assert got[2]["n_tokens"] == 2


def test_pack_explicit_token_column(spark):
    docs = spark.createDataFrame([(1, 10), (2, 10)], "doc_id long, n_tok long")
    got = {
        r["doc_id"]: r
        for r in pack_chunks(
            docs, budget=8, n_buckets=1, tokens_col="n_tok"
        ).collect()
    }
    first, second = got[1], got[2]
    assert first["tok_offset"] == 0 and first["chunks_spanned"] == 2
    assert second["tok_offset"] == 10 and second["chunk_id"] == 1


def test_sliding_chunks_hand_computed(spark):
    """10 tokens, size 4, stride 3 -> chunks at 0,3,6 (full) and 9 (tail
    of 1): n_chunks = ceil((10-4)/3)+1 = 3... verify the exact windows."""
    from predicate_finder_spark.operators.packing import sliding_chunks

    text = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(1, text), (2, "a b"), (3, "")],
                               "doc_id int, text string")
    got = {
        (r.id, r.chunk_id): (r.start, r.n_tokens, r.chunk)
        for r in sliding_chunks(df, size=4, stride=3).collect()
    }
    # doc 1: ceil(6/3)+1 = 3 chunks
    assert got[(1, 0)] == (0, 4, "t0 t1 t2 t3")
    assert got[(1, 1)] == (3, 4, "t3 t4 t5 t6")
    assert got[(1, 2)] == (6, 4, "t6 t7 t8 t9")
    assert (1, 3) not in got
    # doc 2: fits in one chunk; doc 3 (empty): no chunks
    assert got[(2, 0)] == (0, 2, "a b")
    assert {k[0] for k in got} == {1, 2}


def test_sliding_chunks_cover_every_token(spark):
    """Every token index is covered by at least one chunk, and consecutive
    chunks overlap by exactly size - stride (except the tail)."""
    from predicate_finder_spark.operators.packing import sliding_chunks

    text = " ".join(f"w{i}" for i in range(137))
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    rows = sorted(
        sliding_chunks(df, size=16, stride=11).collect(),
        key=lambda r: r.chunk_id,
    )
    covered = set()
    for r in rows:
        covered.update(range(r.start, r.start + r.n_tokens))
    assert covered == set(range(137))
    for a, b in zip(rows, rows[1:]):
        assert b.start - a.start == 11


def test_sliding_chunks_bad_params(spark):
    from predicate_finder_spark.operators.packing import sliding_chunks

    df = spark.createDataFrame([(1, "x")], "doc_id int, text string")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="stride"):
        sliding_chunks(df, size=4, stride=5)
