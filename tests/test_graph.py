"""Connected components (large-star/small-star) vs a union-find oracle."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from predicate_finder_spark.operators.graph import cluster_dedup, connected_components


def _union_find_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # fold to the true minimum per component
    roots = {}
    for v in range(n_nodes):
        r = find(v)
        roots.setdefault(r, []).append(v)
    out = {}
    for members in roots.values():
        m = min(members)
        for v in members:
            out[v] = m
    return out


def _spark_components(spark, edges, vertices=None):
    df = spark.createDataFrame(edges or [(0, 0)], "id_a long, id_b long")
    if not edges:
        df = df.filter(F.lit(False))
    verts = None
    if vertices is not None:
        verts = spark.createDataFrame([(v,) for v in vertices], "doc_id long")
    got = connected_components(df, vertices=verts)
    return {r["node"]: r["component"] for r in got.collect()}


def test_two_components_and_chain(spark):
    edges = [(0, 1), (1, 2), (2, 3), (10, 11), (11, 12)]
    got = _spark_components(spark, edges)
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10, 12: 10}


def test_long_chain_converges_fast(spark):
    # a 60-node path is the worst case for naive min-propagation
    # (60 rounds); large-star/small-star must finish in O(log^2).
    edges = [(i, i + 1) for i in range(60)]
    got = _spark_components(spark, edges, vertices=range(61))
    assert got == {i: 0 for i in range(61)}


def test_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 40 + 20 * trial
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(int(n * 0.8))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        want = _union_find_components(n, edges)
        got = _spark_components(spark, edges, vertices=range(n))
        assert got == want, f"trial {trial} mismatch"


def test_isolated_vertices_are_singletons(spark):
    got = _spark_components(spark, [(1, 2)], vertices=[1, 2, 3, 4])
    assert got == {1: 1, 2: 1, 3: 3, 4: 4}


def test_empty_pairs(spark):
    got = _spark_components(spark, [], vertices=[5, 6])
    assert got == {5: 5, 6: 6}


def test_cluster_dedup_transitive_counterexample(spark):
    # {1,2,3} with pairs (1,3),(2,3): per-pair id_b-dropping keeps {1,2};
    # cluster semantics must keep only the component minimum, {1}.
    docs = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 3), (2, 3)], "id_a long, id_b long")
    kept = cluster_dedup(docs, pairs)
    assert [r["doc_id"] for r in kept.collect()] == [1]


def test_cluster_dedup_keeps_unpaired_docs(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(0, 4), (4, 5)], "id_a long, id_b long")
    kept = cluster_dedup(docs, pairs)
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 1, 2, 3]


# --- pagerank ------------------------------------------------------------

def _pagerank_py(edges, n_iter=5, damping=85, scale=10**12, vertices=()):
    """Pure-python twin of operators/graph.pagerank's integer recurrence."""
    from collections import Counter, defaultdict

    e = sorted(set(edges))
    nodes = sorted({u for u, _ in e} | {v for _, v in e} | set(vertices))
    n = len(nodes)
    deg = Counter(u for u, _ in e)
    teleport = ((100 - damping) * scale) // (100 * n)
    r = {v: scale // n for v in nodes}
    for _ in range(n_iter):
        contrib = defaultdict(int)
        for u, v in e:
            contrib[v] += r[u] // deg[u]
        dang = sum(r[v] for v in nodes if deg.get(v, 0) == 0)
        share = dang // n
        r = {
            v: teleport + (damping * (contrib.get(v, 0) + share)) // 100
            for v in nodes
        }
    return r


def _spark_pagerank(spark, edges, **kw):
    from predicate_finder_spark.operators.graph import pagerank

    df = spark.createDataFrame(edges, "src string, dst string")
    return {
        r["node"]: r["rank_units"]
        for r in pagerank(df, **kw).collect()
    }


def test_pagerank_matches_python_twin(spark):
    # deterministic pseudo-random digraph with hubs, chains and danglers
    random.seed(7)
    edges = [(f"n{random.randrange(30)}", f"n{random.randrange(30)}") for _ in range(120)]
    edges += [(f"n{i}", "hub") for i in range(10)]        # hub in-links
    edges += [("hub", "sink")]                            # sink dangles
    got = _spark_pagerank(spark, edges, n_iter=5)
    want = _pagerank_py(edges, n_iter=5)
    assert got == want


def test_pagerank_hub_ranks_highest(spark):
    # every spoke links to hub; hub spreads back across all spokes, so its
    # in-mass (8 whole ranks) dwarfs any spoke's (1/8 of hub's)
    edges = [(f"n{i}", "hub") for i in range(8)]
    edges += [("hub", f"n{i}") for i in range(8)]
    got = _spark_pagerank(spark, edges, n_iter=10)
    assert max(got, key=got.get) == "hub"
    assert got == _pagerank_py(edges, n_iter=10)


def test_pagerank_partition_invariant(spark):
    """The integer-units design goal: identical rank_units regardless of
    input partitioning (float PageRank cannot promise this)."""
    from predicate_finder_spark.operators.graph import pagerank

    random.seed(11)
    edges = [(f"n{random.randrange(40)}", f"n{random.randrange(40)}") for _ in range(200)]
    df = spark.createDataFrame(edges, "src string, dst string")
    a = {r["node"]: r["rank_units"] for r in pagerank(df, n_iter=4).collect()}
    b = {
        r["node"]: r["rank_units"]
        for r in pagerank(df.repartition(13), n_iter=4).collect()
    }
    assert a == b


def test_pagerank_isolated_vertices_get_teleport_only(spark):
    edges = [("a", "b")]
    verts = spark.createDataFrame([("a",), ("b",), ("z",)], "id string")
    df = spark.createDataFrame(edges, "src string, dst string")
    from predicate_finder_spark.operators.graph import pagerank

    got = {r["node"]: r["rank_units"] for r in pagerank(df, vertices=verts, n_iter=3).collect()}
    want = _pagerank_py(edges, n_iter=3, vertices=["z"])
    assert got == want
    # z receives only teleport + its dangling share back
    assert got["z"] < got["b"]


# --- redirect chain resolution / canonicalization -------------------------

def test_resolve_chains_terminal_targets(spark):
    from predicate_finder_spark.operators.graph import resolve_chains

    m = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"),      # 3-link chain
         ("x", "y"),                               # 1-link
         ("p", "q"), ("q", "p")],                  # cycle: dropped
        "src string, dst string",
    )
    got = {(r.src, r.target) for r in resolve_chains(m).collect()}
    assert got == {("a", "d"), ("b", "d"), ("c", "d"), ("x", "y")}


def test_resolve_chains_long_chain_within_doubling(spark):
    from predicate_finder_spark.operators.graph import resolve_chains

    links = [(f"n{i}", f"n{i+1}") for i in range(20)]  # 20-link chain
    m = spark.createDataFrame(links, "src string, dst string")
    got = {r.src: r.target for r in resolve_chains(m, max_doubling=5).collect()}
    assert got == {f"n{i}": "n20" for i in range(20)}


def test_canonicalize_entities_rewrites_both_sides(spark):
    from predicate_finder_spark.operators.graph import canonicalize_entities

    triples = spark.createDataFrame(
        [("a", "p", "x"), ("c", "p", "z")], "subj string, pred string, obj string"
    )
    redirects = spark.createDataFrame(
        [("a", "b"), ("b", "final"), ("x", "final")], "src string, dst string"
    )
    got = {(r.subj, r.pred, r.obj) for r in canonicalize_entities(triples, redirects).collect()}
    # a -> final (2-link), x -> final; c and z untouched (no redirect)
    assert got == {("final", "p", "final"), ("c", "p", "z")}
