"""Graph-analytics kernels (operators/graph.py): exact invariants on
hand-built graphs plus cross-formulation equality (degree-ordered
orientation vs brute force). Oracle parity at sf0.01 runs in
test_oracle_parity.py like every registered query."""

import itertools

import pytest
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.operators import graph


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], "src long, dst long"
    )


def _triangles(spark, pairs):
    """Run the degree-ordered triangle kernel on an explicit edge list by
    monkey-free reuse: build the same pipeline graph_triangle_counts uses,
    starting from the edge frame."""
    edges = _edges_df(spark, pairs)
    deg = (
        graph._sym(edges)
        .groupBy(F.col("a").alias("node"))
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    e = (
        edges.join(deg.withColumnRenamed("node", "src"), "src")
        .withColumnRenamed("deg", "dsrc")
        .join(
            deg.withColumnRenamed("node", "dst").withColumnRenamed("deg", "ddst"),
            "dst",
        )
    )
    fwd = F.struct("dsrc", "src") < F.struct("ddst", "dst")
    oriented = e.select(
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("v"),
        F.when(fwd, F.col("ddst")).otherwise(F.col("dsrc")).alias("dv"),
    ).persist()
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    wedges = o1.join(
        o2,
        (F.col("o1.u") == F.col("o2.u"))
        & (F.struct("o1.dv", "o1.v") < F.struct("o2.dv", "o2.v")),
    ).select(
        F.col("o1.u").alias("apex"), F.col("o1.v").alias("x"), F.col("o2.v").alias("y")
    )
    closing = oriented.select(F.col("u").alias("x"), F.col("v").alias("y"))
    tri = wedges.join(closing, ["x", "y"])
    out = {
        r["part_id"]: r["n"]
        for r in tri.select(F.explode(F.array("apex", "x", "y")).alias("part_id"))
        .groupBy("part_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    oriented.unpersist()
    return out


def _brute_triangles(pairs):
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = dict.fromkeys(adj, 0)
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            counts[a] += 1
            counts[b] += 1
            counts[c] += 1
    return {k: v for k, v in counts.items() if v}


def test_triangles_k4(spark):
    """K4: every node sits in C(3,2)=3 triangles; 4 triangles total."""
    k4 = list(itertools.combinations(range(4), 2))
    out = _triangles(spark, k4)
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangles_triangle_free(spark):
    """A 6-cycle has no triangles — empty output."""
    cyc = [(i, i + 1) for i in range(5)] + [(0, 5)]
    assert _triangles(spark, cyc) == {}


def test_triangles_match_brute_force_random(spark):
    """Seeded random graph incl. a high-degree low-id hub (the shape that
    breaks id-ordering but not degree-ordering): kernel == brute force."""
    import random

    rng = random.Random(42)
    n = 40
    pairs = {(0, j) for j in range(1, n)}  # node 0 is a hub
    while len(pairs) < 200:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    pairs = sorted(pairs)
    assert _triangles(spark, pairs) == _brute_triangles(pairs)


def test_bfs_hops_exact_on_fixture(spark, sf_oracle):
    """BFS distances equal single-source Dijkstra (unit weights) computed
    driver-side on the collected edge list."""
    import collections

    edges = graph.copurchase_edges(spark, sf_oracle).select("src", "dst").collect()
    adj = collections.defaultdict(set)
    for r in edges:
        adj[r["src"]].add(r["dst"])
        adj[r["dst"]].add(r["src"])
    src = min(adj)
    dist = {src: 0}
    frontier = [src]
    for h in range(1, graph.BFS_MAX_HOPS + 1):
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = h
                    nxt.append(v)
        frontier = nxt
    got = {
        r["part_id"]: r["hops"]
        for r in graph.graph_bfs_hops(spark, sf_oracle).collect()
    }
    assert got == dist


def test_pagerank_uniform_on_regular_graph(spark, sf_oracle, monkeypatch):
    """On a k-regular graph (a cycle) PageRank is exactly uniform: the
    recurrence maps the uniform vector to itself, so every iterate stays
    1/N regardless of iteration count."""
    cyc = [(i, (i + 1) % 8 if i < 7 else 0) for i in range(8)]
    cyc = [(min(a, b), max(a, b)) for a, b in [(i, (i + 1) % 8) for i in range(8)]]
    monkeypatch.setattr(
        graph, "copurchase_edges", lambda s, d: _edges_df(spark, sorted(set(cyc)))
    )
    rows = graph.graph_pagerank(spark, sf_oracle).collect()
    assert len(rows) == 8
    for r in rows:
        assert r["pagerank"] == pytest.approx(1.0 / 8, abs=1e-9)


def test_pagerank_mass_conserved_on_fixture(spark, sf_oracle):
    """No dangling nodes (symmetric graph) → total rank mass stays 1."""
    total = (
        graph.graph_pagerank(spark, sf_oracle)
        .agg(F.sum("pagerank").alias("s"))
        .collect()[0]["s"]
    )
    assert total == pytest.approx(1.0, abs=1e-4)


def test_edge_fanout_cap_mirrored(spark, sf_oracle):
    """The MAX_BASKET cap actually gates the self-join input: no order
    contributes more than C(MAX_BASKET, 2) pairs, and the weights count
    orders (max weight ≤ number of orders)."""
    e = graph.copurchase_edges(spark, sf_oracle)
    mx = e.agg(F.max("n_orders").alias("m")).collect()[0]["m"]
    assert 1 <= mx < 100
    assert e.filter(F.col("src") >= F.col("dst")).count() == 0
