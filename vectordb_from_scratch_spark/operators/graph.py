"""Graph analytics over a co-purchase graph derived from ``lineitem``:
edge extraction, triangle counting, BFS shortest paths, PageRank.

The reference has no graph surface (SURVEY.md §2.3 lists "iterative" as a
reference-absent extension category; ``dedup.connected_components`` was its
only member). These operators round out the iterative family with the three
classic distributed-graph kernels a training-data pipeline runs over
document/link graphs — here expressed over the natural TPC-H-ish graph:
parts are nodes, and two parts are linked when they co-occur in an order.

Scale design (100 TB):
- **Edge derivation is fanout-capped**: an order with B distinct parts
  emits C(B,2) pairs; ``MAX_BASKET`` drops pathological baskets before the
  self-join (mirrored in every oracle), so pair volume is ≤496·|orders| —
  linear, the same hot-key discipline as ``dedup.JACCARD_MAX_POSTING``.
- **Triangle counting uses degree-ordered orientation** (the standard
  distributed formulation): each undirected edge points from its
  lower-(degree,id) endpoint to the higher one, so every triangle is
  counted exactly once at its minimum-degree apex and per-node wedge
  fanout is bounded by out-degree² ≤ O(m) total — a low-id hub can never
  blow up the wedge join the way id-ordering allows. The oracle uses the
  simple id-ordered 3-way join: identical exact counts, different plan.
- **BFS and PageRank keep all state as (node, value) DataFrames** — one
  join + one aggregation (two shuffles) per iteration, nothing
  proportional to the graph ever touches the driver. BFS's early-exit
  check is a scalar ``count()`` per level (same discipline as
  ``dedup.connected_components``'s convergence probe); PageRank is fully
  declarative — ten chained join+agg stages over a persisted weighted
  adjacency, the same broadcast-glued recurrence style as
  ``classifier.train_weights``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.registry import register, track_persist
from vectordb_from_scratch_spark.session import load_table

#: Orders with more than this many distinct parts are excluded from the
#: graph: C(B,2) pair fanout must be bounded per basket or one degenerate
#: order produces a quadratic edge blowup. TPC-H-ish orders carry ≤13
#: distinct parts, so at fixture scale the cap drops nothing — it exists
#: for the 100 TB corpus where basket size is not schema-bounded.
MAX_BASKET = 32

#: BFS level cap: hops beyond this are not explored. Fixed (not derived)
#: because the output contract is "nodes within K hops", and the oracle's
#: recursive CTE needs the same literal bound for termination.
BFS_MAX_HOPS = 6

PAGERANK_ITERS = 10
PAGERANK_DAMPING = 0.85

# Shared oracle CTE prefix: distinct (order, part) items, basket-size cap,
# then the id-ordered undirected edge list with co-occurrence weights.
_EDGES_CTE = f"""
items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
oksz AS (SELECT ok FROM items GROUP BY ok HAVING count(*) <= {MAX_BASKET}),
basket AS (SELECT i.ok, i.pk FROM items i JOIN oksz USING (ok)),
edges AS (SELECT a.pk AS src, b.pk AS dst, count(*)::BIGINT AS n_orders
          FROM basket a JOIN basket b ON a.ok = b.ok AND a.pk < b.pk
          GROUP BY 1, 2)
"""


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst, n_orders) with src < dst: distinct part pairs that
    co-occur in an order, weighted by how many orders share them.

    Plan: distinct items (one shuffle on the pair), basket-size filter
    (groupBy ok — same key as the upcoming self-join, so AQE reuses the
    partitioning), self-join on ok with pk ordering, then the edge
    groupBy. Pair fanout per order is capped at C(MAX_BASKET, 2)."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    ok_small = (
        items.groupBy("ok").count().filter(F.col("count") <= MAX_BASKET).select("ok")
    )
    basket = items.join(ok_small, "ok")
    a = basket.alias("a")
    b = basket.alias("b")
    return (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")))
        .groupBy(F.col("a.pk").alias("src"), F.col("b.pk").alias("dst"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


def _sym(edges: DataFrame) -> DataFrame:
    """Both directions of the undirected edge list: (a, b)."""
    return edges.select(F.col("src").alias("a"), F.col("dst").alias("b")).unionAll(
        edges.select(F.col("dst").alias("a"), F.col("src").alias("b"))
    )


# --- edge weights ------------------------------------------------------------

_EDGE_W_SQL = f"""
WITH {_EDGES_CTE}
SELECT src, dst, n_orders
FROM edges
ORDER BY n_orders DESC, src, dst
LIMIT 50
"""


@register("graph_edge_weights", _EDGE_W_SQL)
def graph_edge_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 co-purchase edges by weight — the edge-derivation step
    surfaced as its own query (deterministic cut: integer weight, then the
    unique (src, dst) pair)."""
    return (
        copurchase_edges(spark, sf_dir)
        .orderBy(F.desc("n_orders"), "src", "dst")
        .limit(50)
    )


# --- triangle counting -------------------------------------------------------

_TRI_SQL = f"""
WITH {_EDGES_CTE},
tri AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        FROM edges e1
        JOIN edges e2 ON e2.src = e1.dst
        JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst),
m AS (SELECT a AS part_id FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri)
SELECT part_id, count(*)::BIGINT AS n_triangles
FROM m GROUP BY 1
"""


@register("graph_triangle_counts", _TRI_SQL)
def graph_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(part_id, n_triangles) for every node in ≥1 triangle — exact.

    Degree-ordered orientation: edge {u,v} points from the endpoint with
    the smaller (degree, id) to the larger, every triangle is a single
    wedge at its minimum-(degree, id) apex plus one closing-edge lookup,
    and wedge fanout is bounded by oriented out-degree (≤ O(√m) on any
    graph) instead of raw degree. The oracle counts the same triangles
    with the textbook id-ordered 3-way self-join."""
    edges = track_persist(copurchase_edges(spark, sf_dir).select("src", "dst"))
    deg = _sym(edges).groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
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
    oriented = track_persist(
        e.select(
            F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("u"),
            F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("v"),
            F.when(fwd, F.col("ddst")).otherwise(F.col("dsrc")).alias("dv"),
        )
    )
    o1 = oriented.alias("o1")
    o2 = oriented.alias("o2")
    wedges = o1.join(
        o2,
        (F.col("o1.u") == F.col("o2.u"))
        & (F.struct("o1.dv", "o1.v") < F.struct("o2.dv", "o2.v")),
    ).select(
        F.col("o1.u").alias("apex"), F.col("o1.v").alias("x"), F.col("o2.v").alias("y")
    )
    # {x,y} closes the triangle; its orientation is forced to x→y because
    # (deg_x, x) < (deg_y, y) held in the wedge condition
    closing = oriented.select(F.col("u").alias("x"), F.col("v").alias("y"))
    tri = wedges.join(closing, ["x", "y"])
    return (
        tri.select(F.explode(F.array("apex", "x", "y")).alias("part_id"))
        .groupBy("part_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


# --- BFS shortest hops -------------------------------------------------------

_BFS_SQL = f"""
WITH RECURSIVE {_EDGES_CTE},
sym AS (SELECT src AS a, dst AS b FROM edges UNION ALL SELECT dst, src FROM edges),
walk(node, hops) AS (
    SELECT (SELECT min(src) FROM edges), 0
    UNION
    SELECT sym.b, walk.hops + 1
    FROM walk JOIN sym ON sym.a = walk.node
    WHERE walk.hops < {BFS_MAX_HOPS}
)
SELECT node AS part_id, min(hops)::BIGINT AS hops
FROM walk GROUP BY 1
"""


@register("graph_bfs_hops", _BFS_SQL)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(part_id, hops): minimum hop count from the lowest part id to every
    node reachable within BFS_MAX_HOPS — exact integer distances.

    Level-synchronous frontier BFS: each level is one join (frontier ×
    adjacency) + one distinct + one anti-join against the visited set.
    The per-level early-exit probe is a scalar count, the only driver
    value in the loop; the frontier/visited tables never leave executors.
    The source seed is itself a 1-row aggregate — no driver collect."""
    edges = copurchase_edges(spark, sf_dir).select("src", "dst")
    sym = _sym(edges).persist()
    frontier = edges.agg(F.min("src").alias("node"))
    visited = frontier.withColumn("hops", F.lit(0).cast("long")).persist()
    pinned = [sym, visited]
    for h in range(1, BFS_MAX_HOPS + 1):
        nxt = (
            frontier.join(sym, frontier["node"] == sym["a"])
            .select(F.col("b").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .withColumn("hops", F.lit(h).cast("long"))
        ).persist()
        pinned.append(nxt)
        if nxt.limit(1).count() == 0:
            break
        visited = visited.unionAll(nxt).persist()
        pinned.append(visited)
        frontier = nxt.select("node")
    from vectordb_from_scratch_spark.registry import track

    for df in pinned[:-1]:
        track(df)
    track(pinned[-1])
    return visited.select(F.col("node").alias("part_id"), "hops")


# --- PageRank ----------------------------------------------------------------


def _pagerank_sql() -> str:
    d = PAGERANK_DAMPING
    ctes = ["pr0 AS (SELECT node, 1.0/(SELECT n FROM nn) AS r FROM nodes)"]
    for i in range(1, PAGERANK_ITERS + 1):
        ctes.append(
            f"pr{i} AS (SELECT w.b AS node, "
            f"{1 - d:.2f}/(SELECT n FROM nn) + {d}*sum(p.r * w.w) AS r "
            f"FROM adjw w JOIN pr{i - 1} p ON p.node = w.a GROUP BY w.b)"
        )
    return f"""
WITH {_EDGES_CTE},
sym AS (SELECT src AS a, dst AS b FROM edges UNION ALL SELECT dst, src FROM edges),
nodes AS (SELECT DISTINCT a AS node FROM sym),
nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
degs AS (SELECT a AS node, count(*)::DOUBLE AS outdeg FROM sym GROUP BY 1),
adjw AS (SELECT s.a, s.b, 1.0/d.outdeg AS w FROM sym s JOIN degs d ON d.node = s.a),
{",".join(ctes)}
SELECT node AS part_id, round(r, 8) AS pagerank FROM pr{PAGERANK_ITERS}
"""


@register("graph_pagerank", _pagerank_sql())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(part_id, pagerank) after PAGERANK_ITERS power-method steps with
    damping 0.85 over the symmetrized co-purchase graph.

    Fully declarative recurrence (no driver synchronization): the weighted
    adjacency (a, b, 1/outdeg_a) is persisted once, and each iteration is
    one join + one groupBy-sum over it, glued to the previous iteration's
    ranks. The graph is symmetric, so every node has in- and out-edges —
    no dangling-mass term. Node count enters the plan as a broadcast 1-row
    aggregate, not a collected scalar. Output rounded to 8 dp on both
    sides (double summation order differs across engines at ~1e-16
    relative; ranks are ~1/N)."""
    edges = copurchase_edges(spark, sf_dir).select("src", "dst")
    sym = _sym(edges)
    nodes = track_persist(sym.select(F.col("a").alias("node")).distinct())
    nn = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    degs = sym.groupBy("a").agg(F.count(F.lit(1)).cast("double").alias("outdeg"))
    adjw = track_persist(
        sym.join(degs, "a").select("a", "b", (F.lit(1.0) / F.col("outdeg")).alias("w"))
    )
    d = PAGERANK_DAMPING
    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("r")
    )
    for _ in range(PAGERANK_ITERS):
        contrib = (
            adjw.join(ranks, adjw["a"] == ranks["node"])
            .groupBy("b")
            .agg(F.sum(F.col("r") * F.col("w")).alias("mass"))
        )
        ranks = contrib.crossJoin(F.broadcast(nn)).select(
            F.col("b").alias("node"),
            (F.lit(1 - d) / F.col("n") + F.lit(d) * F.col("mass")).alias("r"),
        )
    return ranks.select(
        F.col("node").alias("part_id"), F.round("r", 8).alias("pagerank")
    )
