"""C9 dependency path: heuristic parse + LCA walk incl. dead-loop guard."""

from __future__ import annotations

from pyspark.sql import functions as F

from predicate_finder_spark.operators.syntax import (
    heuristic_parse,
    make_syntax_path_udf,
    shortest_path,
)


def test_heuristic_parse_shapes():
    toks = "Alba Arnheim has birth place Mona Bexley .".split()
    heads, deprels = heuristic_parse(toks)
    assert len(heads) == len(deprels) == len(toks)
    root = heads.index(-1)
    assert toks[root] == "has" and deprels[root] == "root"


def test_shortest_path_through_root():
    toks = "Alba has place Mona".split()
    heads, deprels = heuristic_parse(toks)
    path = shortest_path(toks, heads, deprels, 0, 3)
    # path runs src -> ... -> lca -> ... -> dst, interleaved deprel/token
    assert path[1] == "Alba" and path[-1] == "Mona"
    assert "has" in path  # the verb root is on the path
    assert len(path) % 2 == 0


def test_dead_loop_guard():
    # cyclic parse (reference guard syntactic_tree.py:41-43,60-62)
    toks = ["a", "b", "c"]
    heads = [1, 0, 1]  # a <-> b cycle; c hangs off b
    deprels = ["x", "y", "z"]
    assert shortest_path(toks, heads, deprels, 0, 2) in ([], ["x", "a", "y", "b", "z", "c"])
    # must terminate (the assert above would hang forever without the guard)


def test_out_of_range_indices():
    toks = ["a"]
    heads, deprels = heuristic_parse(toks)
    assert shortest_path(toks, heads, deprels, 0, 5) == []


def test_syntax_path_udf(spark):
    df = spark.createDataFrame(
        [("Alba Arnheim has birth place Mona Bexley".split(), 0, 5)],
        "tokens array<string>, src int, dst int",
    )
    udf = make_syntax_path_udf()
    got = df.select(udf(F.col("tokens"), F.col("src"), F.col("dst")).alias("p")).first()["p"]
    assert got and got[1] == "Alba" and got[-1] == "Mona"
