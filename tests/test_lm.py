"""Bigram-LM perplexity scoring (operators/lm.py) — CCNet-style gate."""

from __future__ import annotations

import math

import pytest

from predicate_finder_spark.operators import lm


@pytest.fixture(scope="module")
def tiny_lm(spark):
    train = spark.createDataFrame([(0, "a b a b a c")], "doc_id long, text string")
    ctx, bgs, v = lm.fit_bigram_lm(train)
    return ctx.cache(), bgs.cache(), v


def test_fit_counts(tiny_lm):
    ctx, bgs, v = tiny_lm
    assert v == 3  # {a, b, c}
    assert {r["u"]: r["c_u"] for r in ctx.collect()} == {"a": 3, "b": 2}
    assert {(r["u"], r["w"]): r["c_uw"] for r in bgs.collect()} == {
        ("a", "b"): 2,
        ("b", "a"): 2,
        ("a", "c"): 1,
    }


def test_perplexity_hand_values(spark, tiny_lm):
    ctx, bgs, v = tiny_lm
    docs = spark.createDataFrame(
        [(0, "a b"), (1, "a z"), (2, "z q"), (3, "solo")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in lm.perplexity(docs, ctx, bgs, v).collect()}
    # p(b|a) = (2+1)/(3+3) = 1/2 -> log2 = -1 -> ppl 1.0 exactly
    assert got[0]["n_bigrams"] == 1 and got[0]["log2_ppl"] == pytest.approx(1.0)
    # unseen continuation: p(z|a) = 1/6
    assert got[1]["log2_ppl"] == pytest.approx(-math.log2(1 / 6), abs=2e-6)
    # unseen context: p = 1/V = 1/3
    assert got[2]["log2_ppl"] == pytest.approx(math.log2(3), abs=2e-6)
    # < 2 tokens: no bigrams, no row
    assert 3 not in got


def test_perplexity_partition_invariant(spark, tiny_lm):
    ctx, bgs, v = tiny_lm
    rows = [(i, " ".join("a b c a b z"[: 2 * (i % 5 + 1)].split())) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, lm.perplexity(docs.repartition(1), ctx, bgs, v).collect()))
    b = sorted(map(tuple, lm.perplexity(docs.repartition(7), ctx, bgs, v).collect()))
    assert a == b  # micro-unit BIGINT sums: bit-equal at any parallelism


def test_perplexity_python_twin(spark):
    """Full fit+score pipeline vs a pure-python reference implementation."""
    from collections import Counter

    texts = {
        0: "the cat sat on the mat",
        1: "the dog sat on the log near the mat",
        2: "a cat and a dog met on a log",
        3: "quantum flux harmonics destabilize the manifold",
    }
    rows = [(i, t) for i, t in texts.items()]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    train = docs.filter("doc_id < 3")  # fit on the in-domain docs only
    ctx, bgs, v = lm.fit_bigram_lm(train)
    got = {r["doc_id"]: (r["n_bigrams"], r["log2_ppl"])
           for r in lm.perplexity(docs, ctx, bgs, v).collect()}

    c_u, c_uw = Counter(), Counter()
    vocab = set()
    for i, t in texts.items():
        if i >= 3:
            continue
        ts = t.split()
        vocab.update(ts)
        for a, b in zip(ts, ts[1:]):
            c_u[a] += 1
            c_uw[(a, b)] += 1
    for i, t in texts.items():
        ts = t.split()
        micros = [
            math.floor(math.log2((c_uw[(a, b)] + 1) / (c_u[a] + len(vocab))) * 1e6 + 0.5)
            for a, b in zip(ts, ts[1:])
        ]
        n = len(ts) - 1
        assert got[i][0] == n
        assert got[i][1] == pytest.approx(-(sum(micros) / 1e6) / n, abs=1e-12)
    # fluent docs under the corpus score lower than the off-domain one
    assert max(got[i][1] for i in (0, 1, 2)) < got[3][1]
