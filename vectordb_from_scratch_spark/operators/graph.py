"""Graph analytics over a co-purchase graph derived from ``lineitem``:
edge extraction, triangle counting, local clustering coefficients,
connected components, BFS shortest paths, weighted single-source shortest
paths (Bellman-Ford), PageRank (uniform and weighted), k-core
decomposition, and personalized PageRank.

The reference has no graph surface (SURVEY.md §2.3 lists "iterative" as a
reference-absent extension category; ``dedup.connected_components`` was its
only member). These operators round out the iterative family with the
classic distributed-graph kernels a training-data pipeline runs over
document/link graphs — here expressed over the natural TPC-H-ish graph:
parts are nodes, and two parts are linked when they co-occur in an order.

Every kernel takes the EDGE LIST as a DataFrame (r6: the registered
queries are thin wrappers over reusable library functions, the same
query-vs-API split as ``knn.topk``/``ivf.search``), so ``tools/stress.py``
can drive them on synthetic corpora with planted pathologies.

Scale design (100 TB):
- **Edge derivation is fanout-capped**: an order with B distinct parts
  emits C(B,2) pairs; ``MAX_BASKET`` drops pathological baskets before the
  self-join (mirrored in every oracle), so pair volume is ≤496·|orders| —
  linear, the same hot-key discipline as ``dedup.JACCARD_MAX_POSTING``.
- **The edge list is built once per (session, corpus)** and shared by all
  ten graph queries through ``shared_edges`` — a process-level cache with
  the same warmer / STRICT_SERVE discipline as the ANN index tiers
  (``registry.WARMERS``), so bench separates derivation cost (measured by
  ``graph_edge_weights``, the cold surface) from iteration cost. At
  100 TB this is "materialize the edge table, then run every analytic
  against it" — never re-derive per query.
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
  declarative — ``iters`` chained join+agg stages over a persisted
  weighted adjacency, the same broadcast-glued recurrence style as
  ``classifier.train_weights``. Past a handful of iterations the chained
  plan itself becomes the bottleneck (driver-side analysis and
  cache-manager plan matching grow superlinearly in plan depth —
  measured, see ``bfs_hops``), so the kernel truncates lineage with a
  lazy ``localCheckpoint`` every ``checkpoint_every`` iterations
  (default 8; value-neutral, pinned by test).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vectordb_from_scratch_spark import registry
from vectordb_from_scratch_spark.functions import texthash
from vectordb_from_scratch_spark.registry import register, track, track_persist
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

#: Default lineage-truncation cadence for PageRank (see module
#: docstring): a run pays at most ceil(iters/8) re-materializations of
#: one small (node, r) table — the default 10-iteration queries
#: checkpoint once, a 25-50 iteration stress run three to six times.
#: Measured at 400k orders: 2.6s/iteration WITH the cadence vs
#: 5.5s/iteration fully chained (SCALE.md r6).
PAGERANK_CHECKPOINT_EVERY = 8

#: Broadcast the per-iteration FRONTIER state (bfs_hops / sssp_weighted)
#: into the join against the cached adjacency when the adjacency's ROW
#: COUNT — an upper bound on the state's row count, and a number the
#: kernel already has (the cached artifact's materializing count) — stays
#: under this. Catalyst can't pick this side itself: the state is
#: aggregate-derived each iteration, so its size estimate is garbage.
#: 10M rows of (long, double) state is ≤ ~300 MB built — the SGNS
#: embedding-state gate's envelope; past it the kernels fall back to the
#: co-partitioned shuffle joins that scale to billion-node graphs (the
#: .hint("merge") pins that route so the planner can't flip to an
#: adjacency broadcast).
#:
#: Scope is DELIBERATELY only the two frontier kernels, whose state is
#: EAGERLY checkpointed each round so the broadcast build reads a
#: materialized RDD: measured −25/−35% at sf0.1 (OPTIMIZATION_r11.md).
#: The same wrapper on the LAZY-chained kernels (pagerank / ppr / hits /
#: lpa / random_walks, state checkpointed every 8 rounds or lazily) was
#: measured and REJECTED — the per-iteration broadcast build re-executes
#: the state lineage (graph_pagerank 11–15 s → 33–48 s, 3× worse).
ITER_STATE_BROADCAST_MAX = 10_000_000


def _iter_state(state: DataFrame, bcast: bool) -> DataFrame:
    """The gated broadcast wrapper the frontier kernels apply to their
    eagerly-checkpointed state before joining the cached adjacency."""
    return F.broadcast(state) if bcast else state.hint("merge")

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


def copurchase_edges_from_items(
    items: DataFrame, pre_distinct: bool = False
) -> DataFrame:
    """(src, dst, n_orders) with src < dst from a raw (ok, pk) item list
    (duplicates allowed): distinct part pairs that co-occur in an order,
    weighted by how many orders share them.

    Plan: distinct items (one shuffle on the pair), basket-size filter
    (groupBy ok — same key as the upcoming self-join, so AQE reuses the
    partitioning), self-join on ok with pk ordering, then the edge
    groupBy. Pair fanout per order is capped at C(MAX_BASKET, 2).

    The distinct item table PERSISTS for the build (released with the
    query's tracked frames): three consumers read it — the basket-size
    aggregate and both self-join sides — and without the persist Spark
    re-executes the distinct subtree per consumer once plans diverge
    past exchange reuse (measured at 1M orders: 57s -> ~12s derive,
    r6b).

    ``pre_distinct=True`` (r11): the caller passes an ALREADY-distinct
    (and ideally persisted) item table — the incremental entries derive
    base and delta edges from disjoint slices of ONE distinct pass
    instead of paying the lineitem-scale distinct shuffle twice. Exact:
    ok-disjoint slices make both the distinct and the per-ok basket
    counts decompose."""
    if pre_distinct:
        items = items.select("ok", "pk")
    else:
        items = track_persist(items.select("ok", "pk").distinct())
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


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UNCACHED edge derivation over the sf_dir lineitem table — the
    cold-build surface (``graph_edge_weights`` times this); the analytic
    queries go through :func:`shared_edges` instead."""
    li = load_table(spark, sf_dir, "lineitem")
    return copurchase_edges_from_items(
        li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
    )


#: Process-level edge-table cache, same regime as dedup._BANDS_CACHE /
#: ivf/lsh._BUILD_CACHE: the co-purchase edge list is a derived INDEX over
#: the corpus shared by nine analytic queries (triangles / clustering /
#: components / BFS / SSSP / PageRank ×2 / k-core / PPR) — at 100 TB you
#: materialize it once and run every analytic against it. Deliberately
#: excluded from the per-query release.
_EDGES_CACHE: dict = {}


def shared_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (src, dst, n_orders) edge table, built once per (session,
    corpus) and Spark-cached. Under ``registry.STRICT_SERVE`` a cold cache
    raises (bench must run :func:`warm_graph` outside the timed region);
    default mode builds on demand for standalone/driver invocations."""
    key = (spark.sparkContext.applicationId, sf_dir)
    registry.require_warm(_EDGES_CACHE, key, "graph edge table")
    if key not in _EDGES_CACHE:
        # lazy persist: the first consuming action materializes the cache
        _EDGES_CACHE[key] = copurchase_edges(spark, sf_dir).persist()
    return _EDGES_CACHE[key]


# Derived-adjacency artifacts, one per consumption shape (r6): a graph
# store at 100 TB materializes ADJACENCY LISTS — hash-partitioned on the
# iteration join key, weights pre-normalized — not just the edge list;
# every iterative kernel was otherwise re-deriving its own (one shuffle +
# one aggregate + a join, ~1/3 of each kernel's bench wall). Cached per
# (session, corpus, kind) beside the edge table, shared across kernels
# (pagerank_weighted and ppr consume the SAME adj_weighted), built by the
# warmer so bench times iteration, not derivation.
_ART_CACHE: dict = {}


def _adj_from(sym: DataFrame, weighted: bool) -> DataFrame:
    """(a, b, w) transition table from a symmetrized edge frame:
    w = n_orders/Σ n_orders per source (weighted) or 1/outdeg (uniform),
    hash-partitioned on the join key ``a``."""
    if weighted:
        wsum = sym.groupBy("a").agg(F.sum("w0").cast("double").alias("tot"))
        return (
            sym.join(wsum, "a")
            .select("a", "b", (F.col("w0").cast("double") / F.col("tot")).alias("w"))
            .repartition("a")
        )
    degs = sym.groupBy("a").agg(F.count(F.lit(1)).cast("double").alias("outdeg"))
    return (
        sym.join(degs, "a")
        .select("a", "b", (F.lit(1.0) / F.col("outdeg")).alias("w"))
        .repartition("a")
    )


def _adj_indexed(sym: DataFrame) -> DataFrame:
    """(a, b, idx, deg): the symmetric adjacency with a DETERMINISTIC
    per-source neighbor index (row_number over sorted neighbor ids) and
    the out-degree — the lookup table hash-driven random walks step
    through. One shuffle (both windows share the partition key)."""
    w = Window.partitionBy("a").orderBy("b")
    return sym.select(
        "a",
        "b",
        (F.row_number().over(w) - 1).alias("idx"),
        F.count(F.lit(1)).over(Window.partitionBy("a")).alias("deg"),
    ).repartition("a")


_ARTIFACTS = {
    "sym_a": lambda e: _sym(e.select("src", "dst")).repartition("a"),
    "sym_b": lambda e: _sym(e.select("src", "dst")).repartition("b"),
    "adj_indexed": lambda e: _adj_indexed(_sym(e.select("src", "dst"))),
    "adj_uniform": lambda e: _adj_from(_sym(e.select("src", "dst")), False),
    "adj_weighted": lambda e: _adj_from(_sym_w(e), True),
    "symw_cost": lambda e: _sym_w(e)
    .select("a", "b", (F.lit(1.0) / F.col("w0")).alias("w"))
    .repartition("a"),
    "oriented": lambda e: oriented_edges(e.select("src", "dst")).repartition("u"),
    # the DeepWalk corpus chain as store artifacts (the `oriented`
    # precedent: graph_random_walks measures the walk DERIVATION, its
    # consumers serve the shared corpus): deterministic walks, and the
    # skip-gram pair table the embedding trainer consumes
    "walks": lambda e: random_walks(e.select("src", "dst")),
    "skipgrams": lambda e: walk_skipgrams(random_walks(e.select("src", "dst"))),
}


def shared_artifact(spark: SparkSession, sf_dir: str, kind: str) -> DataFrame:
    """A persisted derived-adjacency artifact over the shared edges (see
    ``_ARTIFACTS`` for the kinds). Same warm/serve discipline as
    :func:`shared_edges`."""
    key = (spark.sparkContext.applicationId, sf_dir, kind)
    registry.require_warm(_ART_CACHE, key, f"graph {kind} artifact")
    if key not in _ART_CACHE:
        _ART_CACHE[key] = _ARTIFACTS[kind](shared_edges(spark, sf_dir)).persist()
    return _ART_CACHE[key]


#: The distinct (customer, part) bipartite purchase table — consumed by
#: HITS (its directed graph) and the recommender (ownership sets). Part
#: of the same materialized graph store, cached separately because it
#: derives from the base tables, not the co-purchase edges.
_PURCHASES_CACHE: dict = {}


def shared_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    registry.require_warm(_PURCHASES_CACHE, key, "graph purchase table")
    if key not in _PURCHASES_CACHE:
        _PURCHASES_CACHE[key] = purchase_edges(spark, sf_dir).persist()
    return _PURCHASES_CACHE[key]


def warm_graph(
    spark: SparkSession,
    sf_dir: str,
    kinds: tuple[str, ...] = tuple(_ARTIFACTS),
    with_edges: bool = True,
    with_purchases: bool = True,
) -> None:
    """Build + materialize the shared edge table and the requested
    adjacency/purchase artifacts outside any timed region. Each query's
    registered warmer passes ONLY the artifact kinds that query consumes
    (``_QUERY_GRAPH_NEEDS``, ADVICE r6 #2) — a session that only runs
    graph_components never pays for (or holds) the five adjacency shapes
    it doesn't read."""
    key = (spark.sparkContext.applicationId, sf_dir)
    # artifacts derive from the edge table, so a kinds-bearing call builds
    # it implicitly even with with_edges=False (ADVICE r7: the artifact
    # loop dereferenced _EDGES_CACHE[key] unconditionally — a KeyError
    # foot-gun for any caller outside _QUERY_GRAPH_NEEDS)
    need_edges = with_edges or any(
        (spark.sparkContext.applicationId, sf_dir, k) not in _ART_CACHE
        for k in kinds
    )
    if need_edges and key not in _EDGES_CACHE:
        edges = copurchase_edges(spark, sf_dir).persist()
        edges.count()
        _EDGES_CACHE[key] = edges
    for kind in kinds:
        akey = (spark.sparkContext.applicationId, sf_dir, kind)
        if akey not in _ART_CACHE:
            art = _ARTIFACTS[kind](_EDGES_CACHE[key]).persist()
            art.count()
            _ART_CACHE[akey] = art
    if with_purchases and key not in _PURCHASES_CACHE:
        pur = purchase_edges(spark, sf_dir).persist()
        pur.count()
        _PURCHASES_CACHE[key] = pur


def release_graph_store(sf_dir: str | None = None) -> None:
    """Evict the session-lifetime graph store (edges + adjacency
    artifacts + purchase table) — all corpora, or just one ``sf_dir``
    (ADVICE r6 #2: a multi-corpus session otherwise holds every corpus's
    persisted frames forever). Safe to call mid-session: the caches
    rebuild lazily on next use (or via the warmers under STRICT_SERVE)."""
    for cache in (_EDGES_CACHE, _ART_CACHE, _PURCHASES_CACHE):
        for key in list(cache):
            if sf_dir is not None and key[1] != sf_dir:
                continue
            try:
                cache.pop(key).unpersist()
            except Exception:
                pass  # session already stopped
    for key in list(_SGNS_CACHE):
        if sf_dir is None or key[1] == sf_dir:
            _SGNS_CACHE.pop(key)  # localCheckpoint state frees on GC


def _sym(edges: DataFrame) -> DataFrame:
    """Both directions of the undirected edge list: (a, b)."""
    return edges.select(F.col("src").alias("a"), F.col("dst").alias("b")).unionAll(
        edges.select(F.col("dst").alias("a"), F.col("src").alias("b"))
    )


def _sym_w(edges: DataFrame) -> DataFrame:
    """Both directions with the co-occurrence weight: (a, b, w0)."""
    return edges.select(
        F.col("src").alias("a"), F.col("dst").alias("b"), F.col("n_orders").alias("w0")
    ).unionAll(
        edges.select(
            F.col("dst").alias("a"),
            F.col("src").alias("b"),
            F.col("n_orders").alias("w0"),
        )
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
    unique (src, dst) pair). Deliberately UNCACHED: this is the measured
    cold-build surface; everything else reuses ``shared_edges``."""
    return (
        copurchase_edges(spark, sf_dir)
        .orderBy(F.desc("n_orders"), "src", "dst")
        .limit(50)
    )


def merge_edge_delta(
    base_edges: DataFrame, new_items: DataFrame, pre_distinct: bool = False
) -> DataFrame:
    """Incrementally maintain the co-purchase edge artifact: derive edges
    from a batch of NEW orders only, then sum-merge them into the base
    table. Co-purchase counts are ADDITIVE over disjoint order sets (the
    per-order C(B,2) pair sets are independent, and ``MAX_BASKET`` applies
    within each order), so the delta never has to re-touch the historical
    item table — the contract is that ``new_items`` carries WHOLE orders
    (an order split across base and delta would double-count its
    within-order distinct pairs).

    At 100 TB this is the nightly maintenance path: delta derivation is
    proportional to the NEW orders, and the merge is one sum-aggregate
    shuffle keyed on the edge — the same "append a delta, never rebuild"
    discipline as the catalog's BM25/IVF segment deltas. Full-outer
    semantics fall out of the union+groupBy shape (an edge present in
    only one side keeps its count)."""
    delta = copurchase_edges_from_items(new_items, pre_distinct=pre_distinct)
    return (
        base_edges.select("src", "dst", "n_orders")
        .unionByName(delta)
        .groupBy("src", "dst")
        .agg(F.sum("n_orders").cast("long").alias("n_orders"))
    )


_EDGES_INCR_SQL = f"""
WITH {_EDGES_CTE}
SELECT src, dst, n_orders FROM edges
"""


@register("graph_edges_incremental", _EDGES_INCR_SQL)
def graph_edges_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split the corpus into a base (90% of orders) and a delta batch
    (orders with key % 10 == 0), maintain the edge artifact with
    :func:`merge_edge_delta`, and return the merged table. The oracle is
    the FULL re-derivation over all of lineitem — equality proves the
    incremental arithmetic is exact, not approximately refreshed."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
    # one distinct pass for both slices (r11, see graph_ktruss_incremental)
    items_d = track_persist(items.distinct())
    base = copurchase_edges_from_items(
        items_d.filter(F.col("ok") % 10 != 0), pre_distinct=True
    )
    return merge_edge_delta(
        base, items_d.filter(F.col("ok") % 10 == 0), pre_distinct=True
    )


# --- triangle counting -------------------------------------------------------

# Per-node triangle counts as a reusable CTE suffix (consumed by the
# triangle query and the clustering-coefficient query): the textbook
# id-ordered 3-way self-join — deliberately a DIFFERENT formulation than
# the kernel's degree-ordered orientation.
_TRI_COUNTS_CTE = """
tri AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        FROM edges e1
        JOIN edges e2 ON e2.src = e1.dst
        JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst),
m AS (SELECT a AS part_id FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri),
tcounts AS (SELECT part_id, count(*)::BIGINT AS n_triangles FROM m GROUP BY 1)
"""

_TRI_SQL = f"""
WITH {_EDGES_CTE},
{_TRI_COUNTS_CTE}
SELECT part_id, n_triangles FROM tcounts
"""


def oriented_edges(
    edges: DataFrame,
    n_edges: int | None = None,
    deg: DataFrame | None = None,
) -> DataFrame:
    """Degree-ordered orientation of an undirected (src, dst) edge list:
    (u, v, dv) where {src,dst} points from the smaller (degree, id)
    endpoint to the larger. The wedge join fans out by ORIENTED
    out-degree, which is O(√m)-bounded on any graph — the hub-proof
    property ``tools/stress.py graph`` measures directly.

    ``n_edges`` (r11): callers that already know the edge count (the
    truss peel's per-round state counts) pass it so the NODE-sized degree
    table broadcasts into both endpoint joins instead of sort-merging the
    edge list twice — gated on the same envelope as the frontier-state
    broadcasts; past the gate the shuffle joins keep the scalable route.

    ``deg`` (r12): a prebuilt (node, deg) table — degrees of ``edges``'
    symmetrization — sparing the 2|E|-row aggregate when the caller
    already holds one (the incremental truss composition computes base
    degrees once and threads them through orientation AND delta)."""
    if deg is None:
        deg = _sym(edges).groupBy(F.col("a").alias("node")).agg(
            F.count(F.lit(1)).alias("deg")
        )
    bcast = n_edges is not None and n_edges <= ITER_STATE_BROADCAST_MAX

    def deg_as(name: str) -> DataFrame:
        d = deg.withColumnRenamed("node", name)
        return F.broadcast(d) if bcast else d

    e = (
        edges.join(deg_as("src"), "src")
        .withColumnRenamed("deg", "dsrc")
        .join(
            deg_as("dst").withColumnRenamed("deg", "ddst"),
            "dst",
        )
    )
    fwd = F.struct("dsrc", "src") < F.struct("ddst", "dst")
    return e.select(
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("v"),
        F.when(fwd, F.col("ddst")).otherwise(F.col("dsrc")).alias("dv"),
    )


#: Sizing rule for the wedge-join exchange (the one shuffle whose volume
#: is wedge-shaped, not edge-shaped): target post-shuffle bytes per
#: partition and the serialized width of one (apex, x, y) wedge row.
#: 64 MB/partition keeps each ShuffledHashJoin stream partition's working
#: set far under executor memory at ANY wedge volume — the r6b defect was
#: 1.96B wedge rows forced through the session-default 32 partitions
#: (~1.5 GB + sort state each: spill, superlinear wall, 48 GB driver heap).
WEDGE_PARTITION_TARGET_BYTES = 64 << 20
WEDGE_ROW_BYTES = 32
WEDGE_MAX_PARTITIONS = 4096

#: Per-partition budget for a ShuffledHashJoin's BUILD side (the hash
#: map is pinned execution memory and cannot spill): an exchange feeding
#: an SHJ must be wide enough that build_rows · row_bytes per partition
#: stays a few MB even with every core building concurrently. The truss
#: decrement join's build side is edge-shaped while its stream side is
#: frontier-shaped — sizing the exchange on the stream alone let a 26M-
#: edge build side land as 32 × ~800k-row hash maps (measured OOM at the
#: 1M-order design point).
SHJ_BUILD_TARGET_BYTES = 4 << 20


def _wedge_stats(oriented: DataFrame) -> tuple[int, int]:
    """(wedge estimate Σ_u C(outdeg(u), 2), edge count) — one cheap
    scalar aggregate over the (persisted) oriented table, the same
    convergence-probe discipline as ``bfs_hops``."""
    row = (
        oriented.groupBy("u")
        .agg(F.count(F.lit(1)).alias("od"))
        .agg(
            F.sum(F.col("od") * (F.col("od") - 1) / 2).alias("w"),
            F.sum("od").alias("m"),
        )
        .collect()[0]
    )
    return int(row["w"] or 0), int(row["m"] or 0)


def _wedge_partitions(oriented: DataFrame, n_wedges: int | None = None) -> int:
    """Exchange width for the wedge join, derived from the measured wedge
    estimate. Never below the session default, capped at
    ``WEDGE_MAX_PARTITIONS`` (a runaway-estimate backstop; AQE coalesces
    small partitions but never splits oversized ones, so overestimating
    is the safe direction). Deliberately sized on the UNFILTERED wedge
    volume even when the bloom prefilter is active — the filter's pass
    rate is corpus-dependent, and overpartitioning a small stream is
    benign where underpartitioning a large one spills."""
    if n_wedges is None:
        n_wedges, _ = _wedge_stats(oriented)
    floor = oriented.sparkSession.sparkContext.defaultParallelism
    return int(
        min(
            WEDGE_MAX_PARTITIONS,
            max(floor, n_wedges * WEDGE_ROW_BYTES // WEDGE_PARTITION_TARGET_BYTES + 1),
        )
    )


#: Bloom-bitmap prefilter sizing for the wedge-closing join: the bitmap
#: is a (word_idx, 64-bit word) table of ``≈ n_edges/4`` words (16 bits
#: per edge → ~6% false-positive rate at k=1), capped at 8M words
#: (512 Mbit ≈ a 64 MB broadcast of bit payload). Past the cap the
#: achievable false-positive rate degrades with |E|; when it can no
#: longer beat ``TRI_BLOOM_MAX_FPP`` the filter is SKIPPED — the kernel
#: falls back to the plain (exact) shuffle rather than paying a
#: broadcast + per-wedge probe that filters nothing.
TRI_BLOOM_WORDS_CAP = 8 << 20
TRI_BLOOM_MIN_WORDS = 1 << 12
TRI_BLOOM_MAX_FPP = 0.25

#: Wedge floor below which the bloom prefilter is SKIPPED (VERDICT r7
#: #5): under ~32M wedges the unfiltered exchange is ≤ ~1 GB spread over
#: the session's partitions — the bitmap build + broadcast + per-wedge
#: probe costs more than the shuffle it saves (measured: the 1/mod²-
#: sized sampled estimator paid +2.5s for a workload whose exchange was
#: already cheap). At and above the floor the filter's savings dominate
#: (SCALE.md r7: 95% of shuffled bytes were non-closing wedges).
TRI_BLOOM_WEDGE_FLOOR = 32 << 20

#: r11 second gate, for the DELTA regimes (warm/incremental truss): the
#: 32M floor models the FULL enumeration, where wedge volume and closing-
#: edge volume rise together. A delta-sized frontier against a full graph
#: inverts that: n_cand ≈ 10× n_edges at the 1M-order design point while
#: the bitmap build stays edge-proportional, so the filter pays for
#: itself far below the absolute floor. Engage when the wedge stream
#: dwarfs the build side (ratio) AND is big enough for the broadcast
#: probe to matter (absolute). Measured on the warm-truss round-1 kernel
#: (tools/truss_bloom_probe.py): 13.4M wedges / 1.31M edges, 6.62 s →
#: 5.18 s with identical triangle output.
TRI_BLOOM_RATIO = 8
TRI_BLOOM_RATIO_FLOOR = 4 << 20


def _bloom_pays(n_cand: int, n_edges: int) -> bool:
    """Cost-based bloom-prefilter gate: absolute floor (full-enumeration
    calibration) or the delta-regime ratio test."""
    return n_cand >= TRI_BLOOM_WEDGE_FLOOR or (
        n_cand >= TRI_BLOOM_RATIO_FLOOR and n_cand >= TRI_BLOOM_RATIO * n_edges
    )


def _close_wedges(cand: DataFrame, closing: DataFrame, n_edges: int,
                  n_cand: int, n_part: int | None = None,
                  bcast: bool = False, bloom: bool | None = None) -> DataFrame:
    """The wedge-closing join every triangle kernel funnels through:
    keep the ``cand`` rows whose (x, y) pair is an actual edge of
    ``closing`` (a distinct id-ordered edge list, so the inner join
    matches at most once per candidate — pure filtering, value-neutral
    across routes).

    Routes, CALLER-decided (r12, guide §2.4/§3.1 — measured per regime,
    tools/tri_profile.py):
    - ``bcast=True``: broadcast the closing SET itself — one in-stage
      hash probe, no bitmap build pass, no exchange on EITHER side,
      exact (the bloom filter only ever pre-filtered this same join).
      The wedge stream then never leaves the stage that generates it.
      Right for the DELTA/frontier regime, where the candidate stream
      dwarfs the edge-sized closing side and the per-call exchanges it
      removes repeat every round; measured WORSE for the one-shot full
      enumeration (graph_triangle_counts 3.3→7.0 s: the driver-serial
      broadcast build of a 1.3M-row relation costs more than the single
      exchange it replaces), so callers must gate it on both the regime
      and the ITER_STATE_BROADCAST_MAX envelope.
    - otherwise the r7 route verbatim: bloom-bitmap prefilter when
      ``bloom`` says it pays (callers keep their calibrated gates),
      wedge-estimate-scaled exchanges, sort-free ShuffledHashJoin built
      on the edge-sized closing side."""
    if bcast:
        return cand.join(F.broadcast(closing), ["x", "y"])
    if bloom is None:
        bloom = _bloom_pays(n_cand, n_edges)
    bm = _closing_bitmap(closing, n_edges) if bloom else None
    if bm is not None:
        bitmap, n_words = bm
        cand = cand.join(
            F.broadcast(bitmap),
            F.pmod(F.xxhash64("x", "y"), F.lit(n_words)) == F.col("w_idx"),
        ).filter(
            F.expr(
                "(word & shiftleft(CAST(1 AS BIGINT), "
                "CAST(pmod(xxhash64(y, x), 64) AS INT))) != 0"
            )
        ).drop("w_idx", "word")
    if n_part is None:
        n_part = int(
            min(
                WEDGE_MAX_PARTITIONS,
                max(
                    closing.sparkSession.sparkContext.defaultParallelism,
                    n_cand * WEDGE_ROW_BYTES // WEDGE_PARTITION_TARGET_BYTES + 1,
                    n_edges * WEDGE_ROW_BYTES // SHJ_BUILD_TARGET_BYTES + 1,
                ),
            )
        )
    return cand.repartition(n_part, "x", "y").join(
        closing.repartition(n_part, "x", "y").hint("shuffle_hash"), ["x", "y"]
    )


def _closing_bitmap(closing: DataFrame, n_edges: int) -> tuple[DataFrame, int] | None:
    """Broadcastable k=1 bloom bitmap over the closing-edge set, as a
    (w_idx, word) table: word index = xxhash64(x,y) mod n_words, bit =
    xxhash64(y,x) mod 64 (the swapped-argument hash is an independent
    draw). Returns (bitmap, n_words), or None when the capped bitmap
    cannot reach a useful false-positive rate for this edge count."""
    if n_edges <= 0:
        return None
    n_words = min(TRI_BLOOM_WORDS_CAP, max(TRI_BLOOM_MIN_WORDS, n_edges // 4))
    if n_edges / (64.0 * n_words) > TRI_BLOOM_MAX_FPP:
        return None
    bitmap = (
        closing.select(
            F.pmod(F.xxhash64("x", "y"), F.lit(n_words)).alias("w_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pmod(xxhash64(y, x), 64) AS INT))"
            ).alias("w_bit"),
        )
        .groupBy("w_idx")
        .agg(F.expr("bit_or(w_bit)").alias("word"))
    )
    return bitmap, n_words


def triangle_counts(edges: DataFrame, oriented: DataFrame | None = None) -> DataFrame:
    """(part_id, n_triangles) for every node in ≥1 triangle — exact.

    Degree-ordered orientation: every triangle is a single wedge at its
    minimum-(degree, id) apex plus one closing-edge lookup, and wedge
    fanout is bounded by oriented out-degree instead of raw degree. The
    oracle counts the same triangles with the textbook id-ordered 3-way
    self-join. The oriented table persists hash-partitioned on the wedge
    apex, so the self-join is co-partitioned out of cache (no exchange on
    either side). ``oriented`` lets callers serve the prebuilt artifact
    (``shared_artifact(..., "oriented")``).

    The closing-edge join is the ONLY stage whose shuffle volume is
    wedge-shaped (O(Σ outdeg²)); two measures keep it linear in wedge
    volume and inside default heap (SCALE.md r7 — the r6b run needed a
    48 GB driver and grew 4.2× wall for 2.5× wedges):

    - **bloom-bitmap prefilter** (the big one): only wedges whose {x,y}
      is an actual edge survive the join — 5% on the design corpus —
      so a k=1 bloom bitmap over the closing-edge set, broadcast-joined
      into the wedge stream BEFORE the exchange (``_closing_bitmap``),
      cuts the shuffled volume to closure-rate + false positives. The
      broadcast join preserves the cached co-partitioning (no extra
      exchange), every probe is whole-stage-codegen integer work, and
      false positives are eliminated by the real equi-join — the filter
      is value-neutral by construction, which is why the oracle needs
      no change.
    - **exchange width scaled by the measured wedge estimate**
      (``_wedge_partitions``) instead of the session default, and the
      join runs as a ShuffledHashJoin built on the edge-sized closing
      side — the wedge stream is never sorted."""
    if oriented is None:
        oriented = track_persist(oriented_edges(edges).repartition("u"))
    tri = triangle_enum(oriented)
    return (
        tri.select(F.explode(F.array("apex", "x", "y")).alias("part_id"))
        .groupBy("part_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def triangle_enum(oriented: DataFrame) -> DataFrame:
    """Every triangle exactly once as (apex, x, y) — apex the minimum-
    (degree, id) corner, (deg_x, x) < (deg_y, y). The shared enumeration
    under :func:`triangle_counts` and :func:`ktruss` (see
    ``triangle_counts`` for the linearity measures: bloom-bitmap
    prefilter, estimate-scaled exchange, sort-free closing join).
    ``oriented`` should be persisted hash-partitioned on ``u``."""
    n_wedges, n_edges = _wedge_stats(oriented)
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
    # One-shot full enumeration: the r7 route (bloom prefilter + SHJ),
    # with the bloom gated by _bloom_pays (r12) — absolute floor OR the
    # r11 ratio test — instead of the absolute floor alone. The ratio
    # test models exactly this shape: wedge volume (shuffle saved) vs
    # edge volume (bitmap build cost); the incremental truss's base seed
    # enumeration (33.0M wedges / 1.07M edges at sf0.1) sat 1.6% under
    # the absolute floor while its wedge exchange was the query's single
    # heaviest stage (123 of 491 core-s, r12 event-log attribution).
    # Measured A/B at that point: see OPTIMIZATION_r12.md. The broadcast-
    # closing route stays out — it measured 2× WORSE here (_close_wedges).
    return _close_wedges(
        wedges,
        closing,
        n_edges,
        n_wedges,
        _wedge_partitions(oriented, n_wedges),
        bloom=_bloom_pays(n_wedges, n_edges),
    )


@register("graph_triangle_counts", _TRI_SQL)
def graph_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return triangle_counts(
        shared_edges(spark, sf_dir).select("src", "dst"),
        oriented=shared_artifact(spark, sf_dir, "oriented"),
    )


# --- local clustering coefficient --------------------------------------------

_CLUSTER_COEFF_SQL = f"""
WITH {_EDGES_CTE},
sym AS (SELECT src AS a, dst AS b FROM edges UNION ALL SELECT dst, src FROM edges),
deg AS (SELECT a AS part_id, count(*)::BIGINT AS degree FROM sym GROUP BY 1),
{_TRI_COUNTS_CTE}
SELECT d.part_id, d.degree,
       round(2.0::DOUBLE * coalesce(t.n_triangles, 0) /
             (d.degree * (d.degree - 1)), 8) AS clustering_coeff
FROM deg d LEFT JOIN tcounts t USING (part_id)
WHERE d.degree >= 2
"""


def clustering_coeff(edges: DataFrame, oriented: DataFrame | None = None) -> DataFrame:
    """(part_id, degree, clustering_coeff): the local clustering
    coefficient 2·T(v) / (deg(v)·(deg(v)−1)) for every node of degree ≥ 2
    — how close each part's co-purchase neighborhood is to a clique (the
    basket-cohesion signal recommenders threshold on). Composes the two
    tables the family already builds: per-node triangle counts (the
    degree-ordered kernel) left-joined onto degrees (one groupBy over the
    symmetrized edges) — no new join shape, exact."""
    deg = (
        _sym(edges)
        .groupBy(F.col("a").alias("part_id"))
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tri = triangle_counts(edges, oriented=oriented)
    return (
        deg.filter(F.col("degree") >= 2)
        .join(tri, "part_id", "left")
        .select(
            "part_id",
            "degree",
            F.round(
                F.lit(2.0)
                * F.coalesce(F.col("n_triangles"), F.lit(0))
                / (F.col("degree") * (F.col("degree") - F.lit(1))),
                8,
            ).alias("clustering_coeff"),
        )
    )


@register("graph_clustering_coeff", _CLUSTER_COEFF_SQL)
def graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    return clustering_coeff(
        shared_edges(spark, sf_dir).select("src", "dst"),
        oriented=shared_artifact(spark, sf_dir, "oriented"),
    )


# --- connected components ----------------------------------------------------

_COMPONENTS_SQL = f"""
WITH RECURSIVE {_EDGES_CTE},
sym AS (SELECT src AS a, dst AS b FROM edges UNION ALL SELECT dst, src FROM edges),
nodes AS (SELECT DISTINCT a AS node FROM sym),
reach AS (SELECT node, node AS r FROM nodes
          UNION
          SELECT sym.b, reach.r FROM reach JOIN sym ON sym.a = reach.node),
comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node)
SELECT node AS part_id, component,
       (count(*) OVER (PARTITION BY component))::BIGINT AS component_size
FROM comp
"""


@register("graph_components", _COMPONENTS_SQL)
def graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(part_id, component, component_size) over the co-purchase graph —
    min-label propagation, the SAME kernel ``dedup_components`` runs over
    the MinHash candidate graph (operators/dedup.py:connected_components),
    pointed at the shared edge cache: the classic-kernel set (triangles /
    components / BFS / PageRank) closes at near-zero marginal cost. The
    oracle is the recursive-CTE transitive closure; the basket cap is
    mirrored inside ``_EDGES_CTE``."""
    from vectordb_from_scratch_spark.operators.dedup import connected_components

    edges = shared_edges(spark, sf_dir).select("src", "dst")
    labels = connected_components(
        edges,
        a_col="src",
        b_col="dst",
        # serve the b-partitioned symmetric adjacency the session already
        # warms for LPA (r11): the 2|E|-row repartition+persist used to
        # run inside this query's timed region
        sym=shared_artifact(spark, sf_dir, "sym_b"),
    )
    w = Window.partitionBy("label")
    return labels.select(
        F.col("node").alias("part_id"),
        F.col("label").alias("component"),
        F.count(F.lit(1)).over(w).alias("component_size"),
    )


# --- label-propagation communities --------------------------------------------

#: Synchronous LPA iteration count (= the oracle's unroll depth). Fixed,
#: not convergence-probed: synchronous LPA on near-bipartite regions can
#: oscillate forever, so the kernel's contract is "the label state after
#: exactly K deterministic steps" — the only version both engines can
#: agree on exactly.
LPA_ITERS = 4


def _lpa_sql(iters: int = LPA_ITERS) -> str:
    ctes = ["l0 AS (SELECT DISTINCT a AS node, a AS label FROM sym)"]
    for i in range(1, iters + 1):
        ctes.append(
            f"""l{i} AS (SELECT node, label FROM (
  SELECT s.a AS node, l.label AS label,
         row_number() OVER (PARTITION BY s.a ORDER BY count(*) DESC, l.label) AS rk
  FROM sym s JOIN l{i - 1} l ON l.node = s.b
  GROUP BY s.a, l.label) t WHERE rk = 1)"""
        )
    return f"""
WITH {_EDGES_CTE},
sym AS (SELECT src AS a, dst AS b FROM edges UNION ALL SELECT dst, src FROM edges),
{",".join(ctes)}
SELECT node AS part_id, label AS community FROM l{iters}
"""


def lpa_communities(
    edges: DataFrame, iters: int = LPA_ITERS, sym: DataFrame | None = None
) -> DataFrame:
    """(part_id, community): synchronous label propagation (Raghavan et
    al. 2007) — every node simultaneously adopts the most frequent label
    among its neighbors, ties broken by the smaller label, starting from
    identity labels. After K steps, labels approximate communities
    (densely linked part clusters); unlike :func:`graph_components` this
    splits a connected graph into cohesive regions rather than just
    reachability classes.

    Fully deterministic (the asynchronous/random-order variants are not)
    and therefore FULL-value-oracle-able via an unrolled CTE. Each step
    is one join against the hash-partitioned adjacency, one (node, label)
    count aggregate, and one per-node top-1 window — Spark plans the
    window as WindowGroupLimit, so only each node's best label survives
    the final exchange. State is (node, label); nothing touches the
    driver; lineage is one linear chain of K stages (no double
    references, so no checkpoint needed at default depth).

    ONE exchange per iteration (r11, guide §2.1): the joined frame is
    repartitioned by ``node`` alone before the aggregate — hash(node)
    satisfies both the (node, label) grouping clustering AND the window's
    partitioning, so the count and the top-1 limit run in the SAME stage
    instead of exchanging once on (node, label) and again on (node).
    Early iterations carry near-edge-cardinality (node, label) pairs, so
    the partial-agg shuffle the fused shape forgoes saved little anyway;
    measured 13.3 s → 7.4 s cold / 9.9 s → 5.4 s warm for the 4-round
    chain at sf0.1 (tools/lpa_iter_probe.py, identical label checksums)."""
    if sym is None:
        sym = track_persist(_sym(edges).repartition("b"))
    labels = sym.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("label"))
    for _ in range(iters):
        cnt = (
            sym.join(labels, sym["b"] == labels["node"])
            .select(sym["a"].alias("node"), "label")
            .repartition("node")
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            cnt.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("node", "label")
        )
    return labels.select(F.col("node").alias("part_id"), F.col("label").alias("community"))


@register("graph_lpa_communities", _lpa_sql())
def graph_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lpa_communities(
        shared_edges(spark, sf_dir).select("src", "dst"),
        sym=shared_artifact(spark, sf_dir, "sym_b"),
    )


# --- BFS shortest hops -------------------------------------------------------


def bfs_sql(source_expr: str = "(SELECT min(src) FROM edges)",
            max_hops: int = BFS_MAX_HOPS) -> str:
    """Recursive-CTE BFS oracle, parameterized on seed and hop bound so
    tests can pin :func:`bfs_hops` at non-default arguments."""
    return f"""
WITH RECURSIVE {_EDGES_CTE},
sym AS (SELECT src AS a, dst AS b FROM edges UNION ALL SELECT dst, src FROM edges),
walk(node, hops) AS (
    SELECT {source_expr}, 0
    UNION
    SELECT sym.b, walk.hops + 1
    FROM walk JOIN sym ON sym.a = walk.node
    WHERE walk.hops < {max_hops}
)
SELECT node AS part_id, min(hops)::BIGINT AS hops
FROM walk GROUP BY 1
"""


def bfs_hops(
    edges: DataFrame,
    source: int | None = None,
    max_hops: int = BFS_MAX_HOPS,
    sym: DataFrame | None = None,
) -> DataFrame:
    """(part_id, hops): minimum hop count from ``source`` (default: the
    lowest node id, as a 1-row aggregate — no driver collect) to every
    node reachable within ``max_hops`` — exact integer distances.
    Reusable as a library call (seed/hops are arguments, r6 — the
    registered query keeps the min-src contract for the oracle).

    Level-synchronous frontier BFS: each level is one join (frontier ×
    adjacency) + one distinct + one anti-join against the visited set;
    the frontier/visited tables never leave executors. Each level's
    frontier is an EAGER ``localCheckpoint``, not a persist (r6,
    measured): iterative loops over persisted frames grow the LOGICAL
    plan every level even though the data is cached, and driver-side
    analysis + cache-manager plan matching go superlinear in that depth —
    per-level wall grew 1.5s → 2.4s → 8s → 24s → 54s on EMPTY frontiers
    at sf0.1 before the change, flat ~0.4s/level after. The checkpoint is
    the level's materializing job, the early-exit probe is then a cheap
    scalar count on checkpointed rows, and the visited set stays a union
    of shallow checkpointed leaves (never re-persisted, never re-derived).

    The adjacency persists HASH-PARTITIONED on its join key (r6,
    measured): a plain ``persist`` caches rows but not a partitioning, so
    every level's join re-exchanged the full 2·|E| adjacency; caching it
    as hashpartitioning(a) makes the per-level exchange frontier-sized —
    the Pregel co-location argument, and the difference between shuffling
    the graph once vs. once per iteration at 100 TB."""
    own_sym = sym is None
    if own_sym:
        sym = _sym(edges).repartition("a").persist()
    # gated frontier broadcast (r11, guide §3.1): frontier and visited
    # rows are both ≤ |V| ≤ the adjacency's row count, and both are
    # eagerly checkpointed below so the broadcast build is a cheap read
    # of a materialized RDD — measured −25% at sf0.1
    bcast_state = sym.count() <= ITER_STATE_BROADCAST_MAX
    if source is None:
        frontier = edges.agg(F.min("src").alias("node"))
    else:
        frontier = edges.sparkSession.createDataFrame([(source,)], "node long")
    visited = frontier.withColumn("hops", F.lit(0).cast("long")).localCheckpoint()
    frontier = visited.select("node")
    for h in range(1, max_hops + 1):
        f_in = _iter_state(frontier, bcast_state)
        nxt = (
            f_in.join(sym, f_in["node"] == sym["a"])
            .select(F.col("b").alias("node"))
            .distinct()
            .join(
                _iter_state(visited, bcast_state), "node", "left_anti"
            )
            .withColumn("hops", F.lit(h).cast("long"))
        ).localCheckpoint()
        if nxt.limit(1).count() == 0:
            break
        visited = visited.unionAll(nxt)
        frontier = nxt.select("node")
    if own_sym:
        track(sym)
    return visited.select(F.col("node").alias("part_id"), "hops")


@register("graph_bfs_hops", bfs_sql())
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bfs_hops(
        shared_edges(spark, sf_dir).select("src", "dst"),
        sym=shared_artifact(spark, sf_dir, "sym_a"),
    )


# --- weighted single-source shortest paths -----------------------------------

#: Hop bound for the Bellman-Ford relaxation (and the oracle's walk
#: recursion). Low because the co-purchase graph is dense (diameter ~3-4
#: at fixture scale) AND because the oracle enumerates every ≤K-hop walk —
#: exponential in K, so the registered query keeps K small; the kernel
#: itself takes any bound (each extra hop is one more join+min round).
SSSP_MAX_HOPS = 3


def sssp_sql(source_expr: str = "(SELECT min(src) FROM edges)",
             max_hops: int = SSSP_MAX_HOPS) -> str:
    """Recursive-CTE oracle: min over every ≤max_hops-hop walk's length.
    Edge cost is 1.0/n_orders on BOTH engines, and both accumulate a
    path's length left-to-right (walk.d + w here, dist + w in the
    kernel), so the float sums are bitwise-identical; IEEE addition is
    monotone, which makes Bellman-Ford's extend-only-the-min equal to the
    walk-wise min in floats, not just in exact arithmetic."""
    return f"""
WITH RECURSIVE {_EDGES_CTE},
sym AS (SELECT src AS a, dst AS b, n_orders FROM edges
        UNION ALL SELECT dst, src, n_orders FROM edges),
walk(node, d, hops) AS (
    SELECT {source_expr}, 0.0::DOUBLE, 0
    UNION
    SELECT sym.b, walk.d + 1.0::DOUBLE / sym.n_orders, walk.hops + 1
    FROM walk JOIN sym ON sym.a = walk.node
    WHERE walk.hops < {max_hops}
)
SELECT node AS part_id, round(min(d), 8) AS dist
FROM walk GROUP BY 1
"""


def sssp_weighted(
    edges: DataFrame,
    source: int | None = None,
    max_hops: int = SSSP_MAX_HOPS,
    symw: DataFrame | None = None,
) -> DataFrame:
    """(part_id, dist): cheapest ≤max_hops-hop path cost from ``source``
    (default: the lowest node id as a 1-row aggregate) where traversing an
    edge costs 1.0/n_orders — strong co-purchase ties are short, so dist
    ranks parts by how tightly they chain to the seed part through
    frequently-shared baskets.

    Distributed Bellman-Ford, exact under the hop bound: each round
    relaxes every edge out of the current distance table — one join
    against the hash-partitioned adjacency + one groupBy-min (the same
    two-shuffle iteration shape as PageRank), nothing graph-sized on the
    driver, lineage truncated per round with a lazy ``localCheckpoint``
    (see ``bfs_hops``). Unreachable nodes are absent from the output on
    both engines."""
    if symw is None:
        symw = track_persist(
            _sym_w(edges)
            .select("a", "b", (F.lit(1.0) / F.col("w0")).alias("w"))
            .repartition("a")
        )
    # gated frontier broadcast (r11, guide §3.1): the distance table's
    # rows ≤ |V| ≤ the adjacency's row count, and it is checkpointed
    # EVERY round below, so the per-iteration broadcast build evaluates
    # one round of lineage, not the whole chain — measured −35% at sf0.1
    bcast_state = symw.count() <= ITER_STATE_BROADCAST_MAX
    if source is None:
        dist = edges.agg(F.min("src").alias("node")).select(
            "node", F.lit(0.0).alias("d")
        )
    else:
        dist = edges.sparkSession.createDataFrame(
            [(source, 0.0)], "node long, d double"
        )
    for _ in range(max_hops):
        d_in = _iter_state(dist, bcast_state)
        relaxed = (
            d_in.join(symw, d_in["node"] == symw["a"])
            .select(F.col("b").alias("node"), (F.col("d") + F.col("w")).alias("d"))
        )
        dist = (
            dist.unionAll(relaxed)
            .groupBy("node")
            .agg(F.min("d").alias("d"))
            .localCheckpoint(eager=False)
        )
    return dist.select(F.col("node").alias("part_id"), F.round("d", 8).alias("dist"))


@register("graph_sssp_weighted", sssp_sql())
def graph_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sssp_weighted(
        shared_edges(spark, sf_dir),
        symw=shared_artifact(spark, sf_dir, "symw_cost"),
    )


# --- sampled-source betweenness (Brandes 2001) --------------------------------

#: Seeds for the dependency accumulation: sampled in cross-engine md5
#: order (the walks/DSIR uniform discipline), so "4 random sources"
#: reproduces in both engines. Sampled-source betweenness (Brandes-Pich
#: 2007) is the production form — exact all-sources Brandes is O(V·E)
#: and nobody runs it on a big graph.
BETW_SEEDS = 4
#: BFS horizon (levels 0..BETW_HOPS). Like the hop-bounded SSSP: the
#: co-purchase graph's diameter is ~3-4 at fixture scale, and the bound
#: keeps the oracle's unrolled level chain fixed-size. Dependencies of
#: nodes deeper than the horizon are truncated — bounded-horizon
#: betweenness, documented, same contract both engines.
BETW_HOPS = 3


def betweenness_sampled(
    edges: DataFrame,
    n_seeds: int = BETW_SEEDS,
    max_hops: int = BETW_HOPS,
    sym: DataFrame | None = None,
) -> DataFrame:
    """(part_id, betweenness): Brandes dependency accumulation from
    ``n_seeds`` md5-sampled sources, hop-bounded at ``max_hops`` —
    which parts sit on the shortest co-purchase chains between other
    parts (the bridge/broker score; degree finds hubs, betweenness finds
    chokepoints).

    Forward: level-synchronous BFS carrying σ (shortest-path counts) —
    per level one frontier×adjacency join + a (seed, node) combine +
    an anti-join against the visited set; σ sums over ALL level-(h-1)
    parents, exact integers in doubles. Backward: Brandes' δ(v) =
    Σ_{w∈succ(v)} σ_v/σ_w·(1+δ_w), one join per level from the deepest
    level up (successor = adjacency edge into the next BFS level — the
    DAG membership is recomputed per level join, never materialized).
    Every frontier/δ frame is an eager localCheckpoint (the bfs_hops
    lineage discipline). State is ≤ seeds·|V| rows — the scale argument
    for sampling sources instead of looping all of them.

    Output: every visited non-seed (node) with its accumulated
    dependency summed over seeds (deepest-level nodes at δ=0 included),
    rounded 6dp. FULL value oracle: the unrolled level chain replays
    both phases in DuckDB."""
    own_sym = sym is None
    if own_sym:
        sym = _sym(edges).repartition("a").persist()
    # gated state broadcast (r11, the bfs_hops discipline): every level/δ
    # frame below is an EAGER localCheckpoint, so the broadcast build reads
    # a materialized RDD — the precondition the pagerank-family rejection
    # established (see ITER_STATE_BROADCAST_MAX). Gate on the broadcast
    # FRAMES' own envelope (ADVICE r11): visited/succ grow to
    # n_seeds × reachable-node rows, so the bound is n_seeds × the NODE
    # count (one node-sized aggregate, reused by the seed draw's distinct
    # anyway), not the edge count alone — an edge-count gate understates
    # the frame by up to n_seeds× near the boundary.
    n_nodes = sym.select("a").distinct().count()
    bcast_state = n_seeds * n_nodes <= ITER_STATE_BROADCAST_MAX
    seeds = _md5_seeds(sym, n_seeds)
    l0 = seeds.select(
        "s", F.col("s").alias("v"), F.lit(1.0).alias("sigma")
    ).localCheckpoint()
    levels = [l0]
    visited = l0.select("s", "v")
    frontier = l0
    for _h in range(1, max_hops + 1):
        f_in = _iter_state(frontier, bcast_state)
        cand = (
            f_in.join(sym, f_in["v"] == sym["a"])
            .select("s", F.col("b").alias("vn"), "sigma")
            .groupBy("s", "vn")
            .agg(F.sum("sigma").alias("sigma"))
            .withColumnRenamed("vn", "v")
        )
        lh = cand.join(
            _iter_state(visited, bcast_state), ["s", "v"], "left_anti"
        ).localCheckpoint()
        levels.append(lh)
        visited = visited.unionAll(lh.select("s", "v"))
        frontier = lh
    # backward: cur = (s, w, sigma, delta) of level h+1
    cur = levels[max_hops].withColumn("delta", F.lit(0.0)).localCheckpoint()
    contribs = [cur.select("s", "v", "delta")]
    for h in range(max_hops - 1, 0, -1):
        lower = levels[h]
        succ = cur.select(
            F.col("s").alias("s2"),
            F.col("v").alias("w"),
            F.col("sigma").alias("sigma_w"),
            F.col("delta").alias("delta_w"),
        )
        low_in = _iter_state(lower, bcast_state)
        dep = (
            low_in.join(sym, low_in["v"] == sym["a"])
            .join(
                _iter_state(succ, bcast_state),
                (F.col("s") == F.col("s2")) & (F.col("b") == F.col("w")),
            )
            .groupBy("s", "v")
            .agg(
                F.sum(
                    F.col("sigma") / F.col("sigma_w") * (F.lit(1.0) + F.col("delta_w"))
                ).alias("dep")
            )
        )
        cur = (
            lower.join(dep, ["s", "v"], "left")
            .select(
                "s",
                "v",
                "sigma",
                F.coalesce(F.col("dep"), F.lit(0.0)).alias("delta"),
            )
            .localCheckpoint()
        )
        contribs.append(cur.select("s", "v", "delta"))
    out = contribs[0]
    for c in contribs[1:]:
        out = out.unionAll(c)
    if own_sym:
        track(sym)
    return (
        out.groupBy(F.col("v").alias("part_id"))
        .agg(F.round(F.sum("delta"), 6).alias("betweenness"))
    )


def betweenness_sql(
    n_seeds: int = BETW_SEEDS, max_hops: int = BETW_HOPS
) -> str:
    """Both Brandes phases as a fixed unrolled level chain. MATERIALIZED
    throughout: l{h} feeds the next level's candidates, the visited
    anti-joins, AND the backward join."""
    seed_h = texthash.hash60_sql("CAST(a AS VARCHAR)")
    ctes = [
        "sym AS (SELECT src AS a, dst AS b FROM edges "
        "UNION ALL SELECT dst, src FROM edges)",
        f"seeds AS (SELECT a AS s FROM (SELECT DISTINCT a FROM sym) "
        f"ORDER BY {seed_h} ASC, a ASC LIMIT {n_seeds})",
        "l0 AS MATERIALIZED (SELECT s, s AS v, 1.0::DOUBLE AS sigma FROM seeds)",
    ]
    vis = ["SELECT s, v FROM l0"]
    for h in range(1, max_hops + 1):
        vis_sql = " UNION ALL ".join(vis)
        ctes.append(
            f"l{h} AS MATERIALIZED (SELECT c.s, c.v, c.sigma FROM ("
            f"SELECT l.s, sym.b AS v, sum(l.sigma) AS sigma "
            f"FROM l{h - 1} l JOIN sym ON sym.a = l.v GROUP BY 1, 2) c "
            f"LEFT JOIN ({vis_sql}) w ON w.s = c.s AND w.v = c.v "
            f"WHERE w.v IS NULL)"
        )
        vis.append(f"SELECT s, v FROM l{h}")
    ctes.append(
        f"d{max_hops} AS (SELECT s, v, sigma, 0.0::DOUBLE AS delta "
        f"FROM l{max_hops})"
    )
    for h in range(max_hops - 1, 0, -1):
        ctes.append(
            f"d{h} AS MATERIALIZED (SELECT l.s, l.v, l.sigma, "
            f"coalesce(dep.dep, 0.0) AS delta FROM l{h} l LEFT JOIN ("
            f"SELECT l.s, l.v, sum(l.sigma / u.sigma * (1.0 + u.delta)) AS dep "
            f"FROM l{h} l JOIN sym ON sym.a = l.v "
            f"JOIN d{h + 1} u ON u.s = l.s AND u.v = sym.b GROUP BY 1, 2"
            f") dep ON dep.s = l.s AND dep.v = l.v)"
        )
    union = " UNION ALL ".join(
        f"SELECT s, v, delta FROM d{h}" for h in range(1, max_hops + 1)
    )
    return (
        f"WITH {_EDGES_CTE},\n"
        + ",\n".join(ctes)
        + f"\nSELECT v AS part_id, round(sum(delta), 6) AS betweenness "
        f"FROM ({union}) GROUP BY 1"
    )


@register("graph_betweenness", betweenness_sql())
def graph_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    return betweenness_sampled(
        shared_edges(spark, sf_dir),
        sym=shared_artifact(spark, sf_dir, "sym_a"),
    )


# --- sampled-seed closeness / harmonic centrality -----------------------------

#: Closeness horizon — one deeper than betweenness (no σ/δ state to
#: carry, and the recursive oracle dedups (seed, node, hops) tuples so
#: the CTE stays seeds·|V|·hops-bounded, never walk-enumerating).
CLOSE_HOPS = 4


def _md5_seeds(sym: DataFrame, n_seeds: int) -> DataFrame:
    """The shared seed draw: n node ids in cross-engine md5 order."""
    return (
        sym.select("a")
        .distinct()
        .orderBy(
            texthash.hash60(F.col("a").cast("string")).asc(), F.col("a").asc()
        )
        .limit(n_seeds)
        .select(F.col("a").alias("s"))
    )


def closeness_sampled(
    edges: DataFrame,
    n_seeds: int = BETW_SEEDS,
    max_hops: int = CLOSE_HOPS,
    sym: DataFrame | None = None,
) -> DataFrame:
    """(part_id, n_reached, sum_hops, closeness, harmonic) for the
    md5-sampled seed nodes: classic closeness n/Σd and harmonic Σ1/d
    over everything within ``max_hops`` — how quickly a part's
    co-purchase neighborhood expands (the centrality every
    "which SKUs anchor the catalog" report wants next to betweenness's
    chokepoints).

    The same multi-source level-synchronous BFS as the betweenness
    forward pass minus the σ bookkeeping: per level one frontier ×
    adjacency join + distinct + visited anti-join, frames eagerly
    localCheckpoint'd; the final score is one seeds-sized aggregate.
    FULL value oracle via a recursive-CTE min-hops walk."""
    own_sym = sym is None
    if own_sym:
        sym = _sym(edges).repartition("a").persist()
    # gated state broadcast (r11): frames are eager checkpoints, the
    # bfs_hops precondition — see ITER_STATE_BROADCAST_MAX. The visited
    # frame is n_seeds × reachable-node rows, so the gate is
    # n_seeds × node count like betweenness_sampled's (ADVICE r11).
    n_nodes = sym.select("a").distinct().count()
    bcast_state = n_seeds * n_nodes <= ITER_STATE_BROADCAST_MAX
    visited = (
        _md5_seeds(sym, n_seeds)
        .select("s", F.col("s").alias("v"), F.lit(0).cast("long").alias("hops"))
        .localCheckpoint()
    )
    frontier = visited.select("s", "v")
    for h in range(1, max_hops + 1):
        f_in = _iter_state(frontier, bcast_state)
        nxt = (
            f_in.join(sym, f_in["v"] == sym["a"])
            .select("s", F.col("b").alias("v"))
            .distinct()
            .join(
                _iter_state(visited.select("s", "v"), bcast_state),
                ["s", "v"],
                "left_anti",
            )
            .withColumn("hops", F.lit(h).cast("long"))
        ).localCheckpoint()
        visited = visited.unionAll(nxt)
        frontier = nxt.select("s", "v")
    if own_sym:
        track(sym)
    reached = visited.filter(F.col("hops") > 0)
    return reached.groupBy(F.col("s").alias("part_id")).agg(
        F.count(F.lit(1)).alias("n_reached"),
        F.sum("hops").alias("sum_hops"),
        F.round(F.count(F.lit(1)) / F.sum("hops"), 6).alias("closeness"),
        F.round(F.sum(F.lit(1.0) / F.col("hops")), 6).alias("harmonic"),
    )


def closeness_sql(
    n_seeds: int = BETW_SEEDS, max_hops: int = CLOSE_HOPS
) -> str:
    seed_h = texthash.hash60_sql("CAST(a AS VARCHAR)")
    return f"""
WITH RECURSIVE {_EDGES_CTE},
sym AS (SELECT src AS a, dst AS b FROM edges UNION ALL SELECT dst, src FROM edges),
seeds AS (SELECT a AS s FROM (SELECT DISTINCT a FROM sym)
          ORDER BY {seed_h} ASC, a ASC LIMIT {n_seeds}),
walk(s, node, hops) AS (
    SELECT s, s, 0 FROM seeds
    UNION
    SELECT walk.s, sym.b, walk.hops + 1
    FROM walk JOIN sym ON sym.a = walk.node
    WHERE walk.hops < {max_hops}
),
mins AS (SELECT s, node, min(hops) AS d FROM walk GROUP BY 1, 2)
SELECT s AS part_id,
       count(*)::BIGINT AS n_reached,
       sum(d)::BIGINT AS sum_hops,
       round(count(*) * 1.0 / sum(d), 6) AS closeness,
       round(sum(1.0 / d), 6) AS harmonic
FROM mins WHERE d > 0 GROUP BY 1
"""


@register("graph_closeness", closeness_sql())
def graph_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    return closeness_sampled(
        shared_edges(spark, sf_dir),
        sym=shared_artifact(spark, sf_dir, "sym_a"),
    )


# --- PageRank ----------------------------------------------------------------


def _pagerank_sql(weighted: bool = False) -> str:
    d = PAGERANK_DAMPING
    if weighted:
        adj = """wsum AS (SELECT a AS node, sum(w0)::DOUBLE AS tot FROM sym GROUP BY 1),
adjw AS (SELECT s.a, s.b, s.w0 / t.tot AS w FROM sym s JOIN wsum t ON t.node = s.a)"""
        sym = """sym AS (SELECT src AS a, dst AS b, n_orders AS w0 FROM edges
       UNION ALL SELECT dst, src, n_orders FROM edges)"""
    else:
        adj = """degs AS (SELECT a AS node, count(*)::DOUBLE AS outdeg FROM sym GROUP BY 1),
adjw AS (SELECT s.a, s.b, 1.0/d.outdeg AS w FROM sym s JOIN degs d ON d.node = s.a)"""
        sym = "sym AS (SELECT src AS a, dst AS b FROM edges UNION ALL SELECT dst, src FROM edges)"
    ctes = ["pr0 AS (SELECT node, 1.0/(SELECT n FROM nn) AS r FROM nodes)"]
    for i in range(1, PAGERANK_ITERS + 1):
        ctes.append(
            f"pr{i} AS (SELECT w.b AS node, "
            f"{1 - d:.2f}/(SELECT n FROM nn) + {d}*sum(p.r * w.w) AS r "
            f"FROM adjw w JOIN pr{i - 1} p ON p.node = w.a GROUP BY w.b)"
        )
    return f"""
WITH {_EDGES_CTE},
{sym},
nodes AS (SELECT DISTINCT a AS node FROM sym),
nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
{adj},
{",".join(ctes)}
SELECT node AS part_id, round(r, 8) AS pagerank FROM pr{PAGERANK_ITERS}
"""


def pagerank(
    edges: DataFrame,
    iters: int = PAGERANK_ITERS,
    damping: float = PAGERANK_DAMPING,
    weighted: bool = False,
    checkpoint_every: int | None = PAGERANK_CHECKPOINT_EVERY,
    adj: DataFrame | None = None,
) -> DataFrame:
    """(part_id, pagerank) after ``iters`` power-method steps over the
    symmetrized co-purchase graph.

    ``weighted=False``: the uniform random surfer, w(a→b) = 1/outdeg(a).
    ``weighted=True``: the natural random surfer on a co-purchase graph —
    w(a→b) = n_orders(a,b) / Σ_c n_orders(a,c), so a follower walks to
    frequently-co-bought parts proportionally (VERDICT r6 #4: the edge
    weights the derivation already computes stop being discarded).

    Fully declarative recurrence (no driver synchronization): the weighted
    adjacency is persisted once, and each iteration is one join + one
    groupBy-sum over it, glued to the previous iteration's ranks. The
    graph is symmetric, so every node has in- and out-edges — no
    dangling-mass term. Node count enters the plan as a broadcast 1-row
    aggregate, not a collected scalar. ``checkpoint_every=K`` truncates
    lineage with a lazy ``localCheckpoint`` after every K iterations so
    iteration counts well past 10 don't grow an unbounded chained plan
    (analysis cost is linear in plan depth; the checkpoint trades one
    re-materialization of the small (node, r) table per K steps). Output
    rounded to 8 dp on both sides (double summation order differs across
    engines at ~1e-16 relative; ranks are ~1/N)."""
    # the adjacency persists hash-partitioned on the join key (see
    # bfs_hops): each iteration then exchanges only the (node, r) ranks,
    # never the 2·|E| edge table; ``adj`` serves the prebuilt artifact
    if adj is not None:
        adjw = adj
    elif weighted:
        adjw = track_persist(_adj_from(_sym_w(edges), True))
    else:
        adjw = track_persist(_adj_from(_sym(edges.select("src", "dst")), False))
    # NOT broadcasting the node-sized ranks into this join (r11): measured
    # 3x WORSE (11-15 s -> 33-48 s at sf0.1) — ranks is a LAZY chain
    # (checkpointed only every 8 rounds), so the per-iteration broadcast
    # build re-executes the whole rank lineage; see OPTIMIZATION_r11.md.
    nodes = track_persist(adjw.select(F.col("a").alias("node")).distinct())
    nn = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    d = damping
    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("r")
    )
    for i in range(1, iters + 1):
        contrib = (
            adjw.join(ranks, adjw["a"] == ranks["node"])
            .groupBy("b")
            .agg(F.sum(F.col("r") * F.col("w")).alias("mass"))
        )
        ranks = contrib.crossJoin(F.broadcast(nn)).select(
            F.col("b").alias("node"),
            (F.lit(1 - d) / F.col("n") + F.lit(d) * F.col("mass")).alias("r"),
        )
        if checkpoint_every and i % checkpoint_every == 0 and i < iters:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select(
        F.col("node").alias("part_id"), F.round("r", 8).alias("pagerank")
    )


@register("graph_pagerank", _pagerank_sql())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pagerank(
        shared_edges(spark, sf_dir).select("src", "dst"),
        adj=shared_artifact(spark, sf_dir, "adj_uniform"),
    )


@register("graph_pagerank_weighted", _pagerank_sql(weighted=True))
def graph_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pagerank(
        shared_edges(spark, sf_dir),
        weighted=True,
        adj=shared_artifact(spark, sf_dir, "adj_weighted"),
    )


# --- k-core ------------------------------------------------------------------

#: Degree threshold for the registered k-core query. Calibrated against
#: the fixture graph's degree distribution (median degree ~90-120 at
#: every sf): k=80 peels a real boundary — ~7% of nodes cascade out over
#: 5 rounds at sf0.01/sf0.1 — where small k removes nothing (min degree
#: is ~40) and k>100 empties the graph.
KCORE_K = 80

#: Peeling-round bound shared by kernel and oracle. The kernel early-exits
#: at the fixpoint (a round that removes nothing), the oracle unrolls
#: exactly this many rounds; the two agree at ANY graph by construction —
#: once the peel is stable, further rounds are identity, and if it is NOT
#: stable after ROUNDS rounds both sides have applied the identical
#: truncation. Fixture convergence is 5 rounds (measured, all sf).
KCORE_ROUNDS = 8


def _kcore_sql(k: int = KCORE_K, rounds: int = KCORE_ROUNDS) -> str:
    # every peel CTE is MATERIALIZED: d{i} references d{i-1} three times
    # (directly + twice through n{i}), so DuckDB's default CTE inlining
    # would expand the chain to 3^rounds base-table scans — enough to
    # exhaust file handles before it exhausts patience.
    ctes = ["d0 AS MATERIALIZED (SELECT a, b FROM sym)"]
    for i in range(1, rounds + 1):
        ctes.append(
            f"n{i} AS MATERIALIZED (SELECT a AS node FROM d{i - 1} "
            f"GROUP BY a HAVING count(*) >= {k}),\n"
            f"d{i} AS MATERIALIZED (SELECT d.a, d.b FROM d{i - 1} d "
            f"JOIN n{i} x ON d.a = x.node JOIN n{i} y ON d.b = y.node)"
        )
    return f"""
WITH {_EDGES_CTE},
sym AS (SELECT src AS a, dst AS b FROM edges UNION ALL SELECT dst, src FROM edges),
{",".join(ctes)}
SELECT a AS part_id, count(*)::BIGINT AS core_degree
FROM d{rounds} GROUP BY a
"""


def kcore(
    edges: DataFrame,
    k: int = KCORE_K,
    rounds: int = KCORE_ROUNDS,
    sym: DataFrame | None = None,
) -> DataFrame:
    """(part_id, core_degree): the nodes of the k-core — the maximal
    subgraph where every node keeps degree >= k — with their degree
    INSIDE the core. Iterative peeling (Matula & Beck 1983, distributed
    as in Montresor et al.): drop all nodes of degree < k, recompute
    degrees on the induced subgraph, repeat; removals cascade, which is
    why one HAVING pass is not enough.

    INCREMENTAL degree maintenance (r7, VERDICT r6 #2): iteration state
    is the NODE-sized (node, deg) table, never the edge list. Each round
    removes the frontier (deg < k) and subtracts its contributions from
    surviving neighbors — one ShuffledHashJoin of the cached symmetric
    adjacency against the frontier (built on the frontier side: the
    adjacency is streamed from cache, never sorted, never re-shuffled —
    it persists hash-partitioned on the join key) plus a node-sized
    merge. The r6 kernel re-aggregated full-graph degrees AND
    ``localCheckpoint``-ed the surviving EDGE table every round, so the
    peel-to-empty worst case paid rounds × O(|E|) materializations (42s
    at 1M orders); per-round cost is now proportional to the frontier's
    incident edges plus one cached-adjacency scan, and the only
    checkpointed state is node-sized. Correctness is unchanged: each
    original edge (a, b) decrements each endpoint at most once — exactly
    when the other endpoint's removal round precedes its own — so the
    maintained degree equals the degree inside the induced surviving
    subgraph, which is what the oracle's per-round re-aggregation
    computes. Early exit at the fixpoint (empty frontier) is
    value-neutral against the oracle's fixed unroll — see
    ``KCORE_ROUNDS``. Nodes isolated by the peel (degree 0) are absent
    from the output on both engines (the oracle's final GROUP BY only
    sees nodes with surviving edges)."""
    if sym is None:
        sym = track_persist(_sym(edges).repartition("a"))
    # gated frontier broadcast (r11, the bfs_hops discipline): the frontier
    # is a filter over the eagerly-checkpointed node-sized degree state, so
    # the broadcast build reads a materialized RDD; past the gate the
    # frontier-built ShuffledHashJoin keeps the scalable route
    bcast_state = sym.count() <= ITER_STATE_BROADCAST_MAX
    deg = (
        sym.groupBy(F.col("a").alias("node"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint()
    )
    for _ in range(rounds):
        frontier = deg.filter(F.col("deg") < k).select("node")
        if frontier.limit(1).count() == 0:
            break
        f_a = frontier.withColumnRenamed("node", "a")
        dec = (
            sym.join(
                F.broadcast(f_a) if bcast_state else f_a.hint("shuffle_hash"),
                "a",
            )
            .groupBy(F.col("b").alias("node"))
            .agg(F.count(F.lit(1)).alias("d"))
        )
        deg = (
            deg.join(frontier, "node", "left_anti")
            .join(dec, "node", "left")
            .select(
                "node",
                (F.col("deg") - F.coalesce(F.col("d"), F.lit(0))).alias("deg"),
            )
        ).localCheckpoint()
    return deg.filter(F.col("deg") >= 1).select(
        F.col("node").alias("part_id"), F.col("deg").alias("core_degree")
    )


@register("graph_kcore", _kcore_sql())
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kcore(
        shared_edges(spark, sf_dir).select("src", "dst"),
        sym=shared_artifact(spark, sf_dir, "sym_a"),
    )


# --- k-truss -------------------------------------------------------------------

#: Support threshold for the registered k-truss query: an edge survives
#: while it closes ≥ k-2 triangles in the surviving subgraph. Calibrated
#: against the fixture support distribution (sf0.01 per-edge support
#: p25 = 8, median 10): k=10 peels a real boundary (~25% of edges in
#: round 1, then cascades) where k ≤ 4 removes almost nothing.
TRUSS_K = 10

#: Peeling-round bound shared by kernel and oracle — the same
#: identical-truncation contract as ``KCORE_ROUNDS``: the kernel
#: early-exits at the fixpoint, the oracle unrolls exactly this many
#: rounds, and the two agree on ANY graph by construction.
TRUSS_ROUNDS = 3


def _ktruss_sql(k: int = TRUSS_K, rounds: int = TRUSS_ROUNDS) -> str:
    # MATERIALIZED for the same reason as _kcore_sql: t{i} is referenced
    # by y{i+1}, s{i+1} and t{i+1} — default CTE inlining would expand
    # the chain exponentially. Support of edge (src, dst) = count of
    # common neighbors c: one join leg per endpoint over the
    # symmetrized view.
    ctes = ["t0 AS MATERIALIZED (SELECT src, dst FROM edges)"]
    for i in range(1, rounds + 1):
        ctes.append(
            f"y{i} AS MATERIALIZED (SELECT src AS a, dst AS b FROM t{i - 1} "
            f"UNION ALL SELECT dst, src FROM t{i - 1}),\n"
            f"s{i} AS MATERIALIZED (SELECT e.src, e.dst, count(*)::BIGINT AS sup "
            f"FROM t{i - 1} e JOIN y{i} n1 ON n1.a = e.src "
            f"JOIN y{i} n2 ON n2.a = e.dst AND n2.b = n1.b "
            f"GROUP BY e.src, e.dst),\n"
            f"t{i} AS MATERIALIZED (SELECT e.src, e.dst FROM t{i - 1} e "
            f"LEFT JOIN s{i} s ON s.src = e.src AND s.dst = e.dst "
            f"WHERE coalesce(s.sup, 0) >= {k - 2})"
        )
    fin = (
        f"yf AS MATERIALIZED (SELECT src AS a, dst AS b FROM t{rounds} "
        f"UNION ALL SELECT dst, src FROM t{rounds}),\n"
        f"sf AS (SELECT e.src, e.dst, count(*)::BIGINT AS sup "
        f"FROM t{rounds} e JOIN yf n1 ON n1.a = e.src "
        f"JOIN yf n2 ON n2.a = e.dst AND n2.b = n1.b GROUP BY e.src, e.dst)"
    )
    return f"""
WITH {_EDGES_CTE},
{",".join(ctes)},
{fin}
SELECT e.src, e.dst, coalesce(s.sup, 0) AS support
FROM t{rounds} e LEFT JOIN sf s ON s.src = e.src AND s.dst = e.dst
"""


def edge_support(
    cur: DataFrame,
    oriented: DataFrame | None = None,
    n_edges: int | None = None,
    deg: DataFrame | None = None,
) -> DataFrame:
    """(src, dst, sup): per-edge triangle support over an id-ordered
    (src < dst) edge list — every edge that closes at least one
    triangle, counted by the shared enumeration (:func:`triangle_enum`,
    bloom prefilter and all) with each triangle exploded to its three
    normalized edges. Edges in no triangle are absent (callers coalesce
    to 0). ``n_edges`` rides into :func:`oriented_edges`' degree
    broadcast gate; ``deg`` serves a prebuilt degree table (r12)."""
    if oriented is None:
        oriented = track_persist(
            oriented_edges(cur, n_edges=n_edges, deg=deg).repartition("u")
        )
    tri = triangle_enum(oriented)
    pairs = tri.select(
        F.explode(
            F.array(
                F.struct(
                    F.least("apex", "x").alias("s"), F.greatest("apex", "x").alias("d")
                ),
                F.struct(
                    F.least("apex", "y").alias("s"), F.greatest("apex", "y").alias("d")
                ),
                F.struct(F.least("x", "y").alias("s"), F.greatest("x", "y").alias("d")),
            )
        ).alias("e")
    ).select(F.col("e.s").alias("src"), F.col("e.d").alias("dst"))
    return pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("sup"))


#: Frontier fraction at or above which a peel round re-enumerates the
#: surviving subgraph instead of decrementing from the frontier — see
#: :func:`ktruss` (uniform-thinning crossover ≈ 0.2).
TRUSS_REENUM_FRAC = 0.2


def _frontier_triangles(
    frontier: DataFrame,
    graph_edges: DataFrame,
    n_edges: int,
    deg: DataFrame | None = None,
) -> tuple[DataFrame, int]:
    """(triples, n_cand): every triangle of ``graph_edges`` containing at
    least one ``frontier`` edge, de-duplicated by sorted node triple
    (column ``t`` = array[a,b,c]) — the shared kernel behind the k-truss
    decrement rounds AND the incremental support delta
    (:func:`truss_support_delta`). Each frontier edge pivots on its
    min-(degree, id) endpoint so candidate fanout is Σ min-deg
    (hub-proof, the same discipline as the degree orientation); closing
    uses the bloom-bitmap prefilter above ``TRI_BLOOM_WEDGE_FLOOR`` and
    an estimate-scaled sort-free ShuffledHashJoin. ``n_edges`` sizes the
    SHJ build side. Both frames must be id-ordered (src < dst) edge
    lists. ``deg`` (r11) serves a prebuilt (node, deg) table — degrees of
    ``graph_edges``' symmetrization — sparing the per-call 2|E|-row
    aggregate; the pivot choice only shapes fanout, the sorted-triple
    dedup keeps the output exact either way."""
    spark = graph_edges.sparkSession
    floor_part = spark.sparkContext.defaultParallelism
    sym_s = graph_edges.select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    ).unionAll(
        graph_edges.select(F.col("dst").alias("a"), F.col("src").alias("b"))
    )
    deg_s = (
        deg
        if deg is not None
        else sym_s.groupBy(F.col("a").alias("node")).agg(
            F.count(F.lit(1)).alias("deg")
        )
    )
    # r11: the degree table is NODE-sized — broadcast it into both
    # endpoint joins (gated on the edge count the caller already has, the
    # ITER_STATE_BROADCAST_MAX envelope) instead of sort-merging the
    # frontier twice against an aggregate whose size estimate is garbage
    small_graph = n_edges <= ITER_STATE_BROADCAST_MAX

    def deg_as(name: str) -> DataFrame:
        d = deg_s.withColumnRenamed("node", name)
        return F.broadcast(d) if small_graph else d

    r = (
        frontier.join(deg_as("src"), "src")
        .withColumnRenamed("deg", "ds")
        .join(
            deg_as("dst").withColumnRenamed("deg", "dd"),
            "dst",
        )
    )
    fwd = F.struct("ds", "src") < F.struct("dd", "dst")
    # eager checkpoint (r11): the pivot feeds BOTH the wedge estimate and
    # the candidate expansion — unmaterialized it re-executed the frontier
    # ⋈ deg ⋈ deg subtree once per consumer (guide §7.2)
    piv = r.select(
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("p"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("q"),
        F.when(fwd, F.col("ds")).otherwise(F.col("dd")).alias("dp"),
    ).localCheckpoint()
    # ONE pass for both scalars (r12): the wedge estimate and the pivot
    # row count ride the same aggregate over the checkpointed pivot —
    # every frontier call (peel decrement rounds, the warm twin's 8
    # truncation-replay rounds, the support delta) pays one job here,
    # not two
    est_row = piv.agg(
        F.sum("dp").alias("c"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    n_cand = int(est_row["c"] or 0)
    n_piv = int(est_row["n"])
    n_part = int(
        min(
            WEDGE_MAX_PARTITIONS,
            max(
                floor_part,
                n_cand * WEDGE_ROW_BYTES // WEDGE_PARTITION_TARGET_BYTES + 1,
                # the closing build side is edge-shaped: keep each
                # partition's unspillable hash map small
                n_edges * WEDGE_ROW_BYTES // SHJ_BUILD_TARGET_BYTES + 1,
            ),
        )
    )
    # broadcast the frontier-sized pivot into the adjacency expansion when
    # it fits (delta regimes: the pivot is delta-sized while sym_s is the
    # full graph — streaming the cached edge table beats sorting it);
    # large decrement-round frontiers keep the shuffle route
    piv_in = F.broadcast(piv) if n_piv <= ITER_STATE_BROADCAST_MAX else piv
    cand = (
        piv_in.join(sym_s, piv_in["p"] == sym_s["a"])
        .filter(F.col("b") != F.col("q"))
        .select(
            "p",
            "q",
            F.col("b").alias("w"),
            F.least("q", F.col("b")).alias("x"),
            F.greatest("q", F.col("b")).alias("y"),
        )
    )
    closing = graph_edges.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    # frontier regime keeps the r11 route (bloom per _bloom_pays + SHJ).
    # r12 measured the broadcast-closing alternative FLAT-to-noise here
    # (warm 13.4 s → 14.5 s, incremental ~24.5 s both routes, 3-repeat
    # medians): the per-call driver-serial broadcast build of the edge-
    # sized closing relation eats exactly what the removed exchanges save.
    tri = _close_wedges(
        cand.select("p", "q", "w", "x", "y"), closing, n_edges, n_cand, n_part
    )
    trid = tri.select(F.array_sort(F.array("p", "q", "w")).alias("t")).distinct()
    return trid, n_cand


def _triple_edge_counts(trid: DataFrame) -> DataFrame:
    """Sorted node triples → per-edge triangle counts (src, dst, c):
    each triple explodes to its three id-ordered edges."""
    return (
        trid.select(
            F.explode(
                F.array(
                    F.struct(F.col("t")[0].alias("s"), F.col("t")[1].alias("d")),
                    F.struct(F.col("t")[0].alias("s"), F.col("t")[2].alias("d")),
                    F.struct(F.col("t")[1].alias("s"), F.col("t")[2].alias("d")),
                )
            ).alias("e")
        )
        .select(F.col("e.s").alias("src"), F.col("e.d").alias("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def ktruss(
    edges: DataFrame,
    k: int = TRUSS_K,
    rounds: int = TRUSS_ROUNDS,
    oriented0: DataFrame | None = None,
    reenum_frac: float = TRUSS_REENUM_FRAC,
    support0: DataFrame | None = None,
    capture_states: list | None = None,
    state0: DataFrame | None = None,
) -> DataFrame:
    """(src, dst, support): the edges of the k-truss — the maximal
    subgraph where every edge participates in ≥ k-2 triangles — with
    each survivor's support measured INSIDE the truss (Cohen 2008).

    FRONTIER-PROPORTIONAL peeling (r8, VERDICT r7 #1 — the edge-centric
    twin of the r7 k-core decrement): iteration state is the edge-sized
    (src, dst, sup) table, seeded by ONE full bloom-prefiltered
    enumeration (:func:`edge_support`); after that no round re-enumerates
    the surviving subgraph. Per round:

    - frontier R = edges with sup < k-2 (one filter over checkpointed
      state);
    - enumerate ONLY the triangles of the pre-removal subgraph S that
      contain a frontier edge: expand each removed edge from its
      min-(degree, id) endpoint's adjacency (fanout bounded by min
      degree, the same hub-proofing as the orientation) and close
      against the surviving edge set — a bloom-bitmap prefilter and an
      estimate-scaled sort-free ShuffledHashJoin, exactly the exact
      kernel's measures, but over the frontier's incident wedges instead
      of all wedges;
    - de-duplicate triangles by sorted node triple (a triangle with two
      or three frontier edges must decrement each survivor ONCE), explode
      to the three normalized edges, and subtract per-survivor counts.

    The maintained sup equals support inside the induced surviving
    subgraph — each triangle of S \\ R is untouched (no frontier edge),
    each destroyed triangle decrements each of its surviving edges
    exactly once — which is what the oracle's per-round full
    re-aggregation computes (``_ktruss_sql``). Early exit at the empty
    frontier is value-neutral against the oracle's fixed unroll
    (``TRUSS_ROUNDS`` identical-truncation contract). ``oriented0`` lets
    the seeding enumeration serve the prebuilt full-graph orientation
    artifact.

    ADAPTIVE route per round: the decrement is frontier-proportional,
    but when the frontier is a large FRACTION of the graph (round 1 at
    a peel-heavy k removes most edges — measured 89% at sf0.1) the
    frontier's incident wedges EXCEED the whole graph's wedge volume
    (Σ_R min-deg ≈ 3× Σ C(outdeg,2) at that fraction) while the
    survivors' wedge volume collapses quadratically — so a round whose
    frontier fraction is ≥ ``reenum_frac`` re-enumerates the (small)
    surviving subgraph instead (uniform-thinning crossover: re-enum ∝
    W·(1-f)², decrement ∝ f·Σ min-deg ≈ 2.5·f·W → f* ≈ 0.2). Both
    routes produce support inside the surviving subgraph exactly, so
    the choice is value-neutral (pinned by
    ``test_graph.py::test_ktruss_decrement_and_reenum_routes_agree``).

    ``support0`` (VERDICT r8 #2) serves a PREBUILT whole-graph support
    table — the incrementally-maintained artifact from
    :func:`truss_support_delta` — so a warm peel skips the seed
    enumeration entirely (the ~95–140 s floor at the 1M design point)
    and pays only the rounds."""
    cur = edges.select("src", "dst")
    if state0 is not None:
        # complete prejoined (src, dst, sup) state from the caller — a
        # narrow projection of an already-materialized frame (r12): the
        # incremental entry's maintained artifact covers EVERY merged
        # edge with sup coalesced to 0, so the seed join below would be
        # a self-join of the same checkpointed table. Skipping it saves
        # one edge-sized join + one checkpoint materialization.
        state = state0
    else:
        sup0 = (
            support0.select("src", "dst", "sup")
            if support0 is not None
            else edge_support(cur, oriented=oriented0)
        )
        state = (
            cur.join(sup0, ["src", "dst"], "left")
            .select(
                "src", "dst", F.coalesce(F.col("sup"), F.lit(0)).alias("sup")
            )
            .localCheckpoint()
        )
    n_state = state.count()
    if capture_states is not None:
        capture_states.append((state, n_state))
    debug = bool(os.environ.get("SPARK_GRAFT_TRUSS_DEBUG"))
    for rnd in range(rounds):
        t_round = time.perf_counter()
        removed = state.filter(F.col("sup") < k - 2).select("src", "dst")
        n_removed = removed.count()
        if n_removed == 0:
            break
        if n_state and n_removed / n_state >= reenum_frac:
            # large frontier: survivors are the small side — one
            # enumeration over them re-measures support directly
            surv = (
                state.filter(F.col("sup") >= k - 2)
                .select("src", "dst")
                .localCheckpoint()
            )
            sup_new = edge_support(surv, n_edges=n_state - n_removed)
            state = (
                surv.join(sup_new, ["src", "dst"], "left")
                .select(
                    "src",
                    "dst",
                    F.coalesce(F.col("sup"), F.lit(0)).alias("sup"),
                )
                .localCheckpoint()
            )
            n_state = n_state - n_removed
            if capture_states is not None:
                capture_states.append((state, n_state))
            if debug:
                print(
                    f"[truss] round {rnd}: reenum removed={n_removed} "
                    f"left={n_state} {time.perf_counter() - t_round:.1f}s"
                )
            continue
        # enumerate ONLY the triangles of the pre-removal subgraph S that
        # contain a frontier edge (shared kernel — also the incremental
        # support delta's workhorse), then decrement each survivor once
        trid, n_cand = _frontier_triangles(
            removed, state.select("src", "dst"), n_state
        )
        dec = _triple_edge_counts(trid)
        state = (
            state.filter(F.col("sup") >= k - 2)
            .join(dec, ["src", "dst"], "left")
            .select(
                "src",
                "dst",
                (F.col("sup") - F.coalesce(F.col("c"), F.lit(0))).alias("sup"),
            )
            .localCheckpoint()
        )
        n_state = n_state - n_removed
        if capture_states is not None:
            capture_states.append((state, n_state))
        if debug:
            print(
                f"[truss] round {rnd}: decrement removed={n_removed} "
                f"cand={n_cand} left={n_state} "
                f"{time.perf_counter() - t_round:.1f}s"
            )
    if capture_states is not None:
        # early fixpoint exit: later rounds are identity — pad so callers
        # always receive rounds + 1 states
        while len(capture_states) < rounds + 1:
            capture_states.append(capture_states[-1])
    return state.select("src", "dst", F.col("sup").alias("support"))


@register("graph_ktruss", _ktruss_sql())
def graph_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ktruss(
        shared_edges(spark, sf_dir).select("src", "dst"),
        oriented0=shared_artifact(spark, sf_dir, "oriented"),
    )


def truss_support_delta(
    base_edges: DataFrame,
    base_support: DataFrame,
    new_items: DataFrame,
    pre_distinct: bool = False,
    base_deg: DataFrame | None = None,
) -> DataFrame:
    """Incrementally maintain the whole-graph per-edge support artifact
    under a WHOLE-ORDER delta batch (VERDICT r8 #2 — the
    ``merge_edge_delta`` discipline extended one derived table deeper):
    returns (src, dst, n_orders, sup) for the merged graph.

    Orders only ADD edges, so support is monotone under the delta and
    decomposes exactly: every triangle of the merged graph either
    existed in the base (no new edge — already counted in
    ``base_support``) or contains ≥ 1 new edge. The delta therefore
    enumerates ONLY triangles incident to new edges
    (:func:`_frontier_triangles` with frontier = new edges over the
    merged edge set — cost ∝ Σ min-deg over NEW edges, never the whole
    graph's wedge volume) and adds each such triangle once to each of
    its three edges; a brand-new edge starts from sup 0 and receives
    all its triangles this way (each contains itself). Weight bumps on
    existing edges (n_orders) never change support — support counts
    distinct edge pairs, not weights.

    This is the nightly path that makes repeated truss peels warm:
    maintain (edges, support) per delta batch, then
    ``ktruss(..., support0=maintained)`` skips the seed enumeration —
    the ~95–140 s floor at the 1M-order design point — and pays only
    the peel rounds (SCALE.md r9)."""
    merged = merge_edge_delta(
        base_edges, new_items, pre_distinct=pre_distinct
    ).localCheckpoint()
    n_edges = merged.count()
    new_e = merged.select("src", "dst").join(
        base_edges.select("src", "dst"), ["src", "dst"], "left_anti"
    )
    # ``base_deg`` (r12): merged degrees from the prebuilt base degree
    # table + the new edges' endpoint counts — the node-sized _merged_deg
    # merge (exact: the union is edge-disjoint) instead of re-aggregating
    # the 2|E|-row merged symmetrization inside _frontier_triangles. The
    # new-edge set then feeds two consumers (degree merge + frontier), so
    # it is checkpointed once.
    deg_m = None
    if base_deg is not None:
        new_e = new_e.localCheckpoint(eager=False)
        deg_m = _merged_deg(base_deg, new_e)
    trid, _ = _frontier_triangles(
        new_e, merged.select("src", "dst"), n_edges, deg=deg_m
    )
    delta = _triple_edge_counts(trid)
    return (
        merged.join(base_support, ["src", "dst"], "left")
        .join(delta, ["src", "dst"], "left")
        .select(
            "src",
            "dst",
            "n_orders",
            (
                F.coalesce(F.col("sup"), F.lit(0))
                + F.coalesce(F.col("c"), F.lit(0))
            ).alias("sup"),
        )
    )


def _merged_deg(base_deg: DataFrame, d: DataFrame) -> DataFrame:
    """Degrees of (base-state ∪ delta) from the PREBUILT base-state degree
    table plus the delta's endpoint counts — a node-sized merge instead of
    the 2|E|-row symmetrize-and-count (r11; exact: the union is disjoint,
    so degrees add)."""
    d_deg = (
        d.select(F.col("src").alias("node"))
        .unionAll(d.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("dd"))
    )
    return (
        base_deg.join(d_deg, "node", "full_outer")
        .select(
            "node",
            (
                F.coalesce(F.col("deg"), F.lit(0))
                + F.coalesce(F.col("dd"), F.lit(0))
            ).alias("deg"),
        )
    )


def ktruss_truncation_delta(
    base_states: list,
    delta_edges: DataFrame,
    k: int = TRUSS_K,
    rounds: int = TRUSS_ROUNDS,
    base_degs: list | None = None,
) -> DataFrame:
    """Delta-proportional warm k-truss (VERDICT r10 #3) that replicates
    the TRUNCATION contract exactly: the registered truss queries are
    "the state after exactly TRUSS_ROUNDS synchronized peel rounds" (the
    oracle's identical-truncation unroll — at fixture scale this is far
    from the fixpoint, so a converge-further shortcut would NOT match).
    The twin therefore replays the delta THROUGH each round against the
    base peel's per-round artifact states, never re-peeling the graph.

    Orders only ADD edges, and each round is monotone under insertion:
    supports within a superset subgraph are >= supports within the base's
    (S_r^merged ⊇ S_r^base by induction). So round r's merged state
    decomposes as base state E_r ⊕ a delta set D_r, and support within
    S_{r-1} is the base artifact support PLUS the count of triangles
    containing >= 1 D_{r-1} edge — one :func:`_frontier_triangles` pass
    with a DELTA-sized frontier per round. D_r advances as

      D_r = {D_{r-1} edges with corrected sup >= k-2}
          ∪ {base edges removed at base round r whose correction
             promotes them — necessarily inside the frontier-triangle
             counts, so found by a broadcast join, never a scan}.

    Cost per round: frontier wedge enumeration ∝ D, one cached-artifact
    filter, broadcast joins on the (small) correction table. The final
    answer re-corrects supports within S_rounds the same way. Exact for
    ANY graph — no fixpoint/convergence assumption anywhere.

    ``base_states``: list of ``rounds + 1`` (state_df, n_edges) pairs
    from the base peel — state r holds (src, dst, sup) with sup measured
    inside base-round-r's surviving subgraph (capture_states of
    :func:`ktruss`)."""
    debug = bool(os.environ.get("SPARK_GRAFT_TRUSS_DEBUG"))
    t0 = time.perf_counter()
    d = delta_edges.select("src", "dst").localCheckpoint()
    n_d = d.count()
    if debug:
        print(f"[truss-delta] delta: {n_d} edges {time.perf_counter() - t0:.1f}s")
    c = None
    for r in range(1, rounds + 1):
        if n_d == 0:
            # the delta died out: every later merged round equals the
            # base round — serve the artifact directly
            fin, _ = base_states[rounds]
            return fin.select("src", "dst", F.col("sup").alias("support"))
        eb, nb = base_states[r - 1]
        s_prev = eb.select("src", "dst").unionAll(d)
        deg_r = (
            _merged_deg(base_degs[r - 1], d) if base_degs is not None else None
        )
        trid, _ = _frontier_triangles(d, s_prev, nb + n_d, deg=deg_r)
        c = _triple_edge_counts(trid).localCheckpoint()
        # delta survivors: support within S_{r-1} is just their count
        d_surv = (
            d.join(F.broadcast(c), ["src", "dst"], "left")
            .filter(F.coalesce(F.col("c"), F.lit(0)) >= k - 2)
            .select("src", "dst", F.lit(0).alias("promo"))
        )
        # promoted base edges: below threshold in the base round, pushed
        # over it by delta-incident triangles — all inside c by
        # construction, so the probe side is the correction table
        promoted = (
            eb.filter(F.col("sup") < k - 2)
            .join(F.broadcast(c), ["src", "dst"])
            .filter((F.col("sup") + F.col("c")) >= k - 2)
            .select("src", "dst", F.lit(1).alias("promo"))
        )
        # one checkpoint + one pass for both counts (per-round fixed job
        # overhead is a measurable slice of a delta-sized round)
        d_next = d_surv.unionAll(promoted).localCheckpoint()
        tag_counts = dict(
            (row["promo"], row["n"])
            for row in d_next.groupBy("promo").agg(F.count(F.lit(1)).alias("n")).collect()
        )
        n_surv = tag_counts.get(0, 0)
        n_promoted = tag_counts.get(1, 0)
        # fixpoint short-circuit: every delta edge survived, nothing was
        # promoted, and the base artifact round is an identity (padded
        # same-object state) ⇒ S_r == S_{r-1} and every later round —
        # including the final support correction, whose enumeration would
        # replay this round's exact inputs — is the identity of this one.
        # Serve the output from the correction table already in hand.
        stable = (
            n_promoted == 0
            and n_surv == n_d
            and base_states[r][0] is base_states[r - 1][0]
        )
        if stable:
            if debug:
                print(
                    f"[truss-delta] round {r}: stable at D={n_d} "
                    f"{time.perf_counter() - t0:.1f}s cumulative"
                )
            break
        d = d_next.select("src", "dst")
        n_d = n_surv + n_promoted
        c = None  # this round's counts are not the final correction
        if debug:
            print(
                f"[truss-delta] round {r}: D={n_d} "
                f"{time.perf_counter() - t0:.1f}s cumulative"
            )
    eb, nb = base_states[rounds]
    if n_d == 0:
        return eb.select("src", "dst", F.col("sup").alias("support"))
    if c is None:
        s_fin = eb.select("src", "dst").unionAll(d)
        trid, _ = _frontier_triangles(d, s_fin, nb + n_d)
        c = _triple_edge_counts(trid)
    return (
        eb.join(F.broadcast(c), ["src", "dst"], "left")
        .select(
            "src",
            "dst",
            (F.col("sup") + F.coalesce(F.col("c"), F.lit(0))).alias("support"),
        )
        .unionAll(
            d.join(F.broadcast(c), ["src", "dst"], "left").select(
                "src",
                "dst",
                F.coalesce(F.col("c"), F.lit(0)).alias("support"),
            )
        )
    )


@register("graph_ktruss_incremental", _ktruss_sql())
def graph_ktruss_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The warm-peel composition, end to end: split orders 90/10 (the
    ``graph_edges_incremental`` split), seed-enumerate support on the
    BASE graph only, maintain (edges, support) through the whole-order
    delta (:func:`truss_support_delta`), then peel with the maintained
    support as ``support0`` — no full-graph seed enumeration touches
    the merged graph anywhere. The oracle is the SAME full k-truss
    recomputation as ``graph_ktruss`` (``_ktruss_sql`` over all of
    lineitem): hash equality proves the incremental support arithmetic
    AND the warm peel are exact, not approximately refreshed."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
    # ONE distinct pass serves base and delta derivation (r11): the ok%10
    # slices are order-disjoint, so distinct and basket counts decompose
    items_d = track_persist(items.distinct())
    base = copurchase_edges_from_items(
        items_d.filter(F.col("ok") % 10 != 0), pre_distinct=True
    ).localCheckpoint()
    n_base = base.count()
    # ONE base degree pass (r12) serves the seed orientation AND (via the
    # node-sized _merged_deg) the delta's merged-degree table — the 2|E|
    # aggregate used to run twice, once inside each
    base_deg = (
        _sym(base)
        .groupBy(F.col("a").alias("node"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=False)
    )
    base_sup = edge_support(
        base.select("src", "dst"), n_edges=n_base, deg=base_deg
    )
    maintained = truss_support_delta(
        base,
        base_sup,
        items_d.filter(F.col("ok") % 10 == 0),
        pre_distinct=True,
        base_deg=base_deg,
    ).localCheckpoint()
    # state0: maintained covers every merged edge with sup already
    # coalesced — the peel can consume it directly instead of re-joining
    # the frame with itself (r12)
    return ktruss(
        maintained.select("src", "dst"),
        state0=maintained.select("src", "dst", "sup"),
    )


#: (applicationId, sf_dir) → (base_edges, base_support), both persisted +
#: materialized: the nightly-maintained artifact pair that the warm-regime
#: twin serves from. Deliberately OUTSIDE the per-query release (it is
#: cross-query state, like the ANN build caches).
_TRUSS_BASE_CACHE: dict = {}


def _base_items(spark: SparkSession, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    )


def warm_truss_base(spark: SparkSession, sf_dir: str) -> None:
    """Build the base-graph (edges, support) artifact pair outside any
    timed region — the state a nightly maintenance job would already
    have on disk when the delta batch arrives."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _TRUSS_BASE_CACHE:
        items = _base_items(spark, sf_dir)
        base = copurchase_edges_from_items(
            items.filter(F.col("ok") % 10 != 0)
        ).persist()
        n_base = base.count()
        sup = edge_support(base.select("src", "dst"), n_edges=n_base).persist()
        sup.count()
        # the base peel's PER-ROUND states (src, dst, sup-within-round-r
        # subgraph) — the r11 artifact that lets the warm twin replay the
        # delta through each truncation round (ktruss_truncation_delta)
        # instead of re-peeling the merged graph. Each state is
        # localCheckpoint-materialized by the peel itself.
        states: list = []
        ktruss(base.select("src", "dst"), support0=sup, capture_states=states)
        _TRUSS_BASE_CACHE[key] = (base, sup, states)


registry.WARMERS["graph_ktruss_warm"] = warm_truss_base


@register("graph_ktruss_warm", _ktruss_sql())
def graph_ktruss_warm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`graph_ktruss_incremental`'s WARM regime, measured honestly
    (VERDICT r9 #1): the cold entry deliberately rebuilds the base
    edges + seed support inside its timed region so the driver can
    hash-check the whole composition, which makes its bench number
    show MORE than the full recompute — the opposite of the feature's
    point. This twin serves the base (edges, support) pair from
    ``_TRUSS_BASE_CACHE`` (built by :func:`warm_truss_base` outside the
    timer, the ivf_search_prebuilt discipline) so the timed region is
    exactly what a nightly delta batch costs: merge the 10% order delta
    into the edge set and replay it through the peel's per-round base
    states (:func:`ktruss_truncation_delta`, r11 — one delta-sized
    frontier enumeration per truncation round, instead of re-peeling
    the whole merged graph). Same result, same full-recompute oracle as
    the cold entry; under ``registry.STRICT_SERVE`` a cold base cache
    raises."""
    key = (spark.sparkContext.applicationId, sf_dir)
    registry.require_warm(_TRUSS_BASE_CACHE, key, "k-truss base artifact")
    if key not in _TRUSS_BASE_CACHE:
        warm_truss_base(spark, sf_dir)
    base, base_sup, base_states = _TRUSS_BASE_CACHE[key]
    items = _base_items(spark, sf_dir)
    # truss class ignores edge weights, so the merged edge SET is
    # base ∪ (new-order pairs \ base) — no need to materialize the
    # weight-merged table the way the support-artifact path does
    delta_edges = (
        copurchase_edges_from_items(items.filter(F.col("ok") % 10 == 0))
        .select("src", "dst")
        .join(base.select("src", "dst"), ["src", "dst"], "left_anti")
    )
    return ktruss_truncation_delta(base_states, delta_edges)


# --- personalized PageRank ---------------------------------------------------

#: Power-iteration count for PPR (also the oracle's CTE unroll depth).
#: Shorter than global PageRank's 10: the restart mass (1-d per step into
#: the seed) makes the iteration contract geometrically, and 8 steps put
#: the truncation error below the 8 dp round.
PPR_ITERS = 8


def _ppr_sql(
    iters: int = PPR_ITERS,
    damping: float = PAGERANK_DAMPING,
    source_expr: str = "(SELECT min(src) FROM edges)",
) -> str:
    d = damping
    seed = source_expr
    ctes = [f"pr0 AS (SELECT {seed} AS node, 1.0::DOUBLE AS r)"]
    for i in range(1, iters + 1):
        ctes.append(
            f"c{i} AS (SELECT w.b AS node, {d} * sum(p.r * w.w) AS r "
            f"FROM adjw w JOIN pr{i - 1} p ON p.node = w.a GROUP BY w.b),\n"
            f"pr{i} AS (SELECT node, sum(r) AS r FROM "
            f"(SELECT node, r FROM c{i} UNION ALL SELECT {seed}, {1 - d:.2f}::DOUBLE) "
            f"GROUP BY node)"
        )
    return f"""
WITH {_EDGES_CTE},
sym AS (SELECT src AS a, dst AS b, n_orders AS w0 FROM edges
        UNION ALL SELECT dst, src, n_orders FROM edges),
wsum AS (SELECT a AS node, sum(w0)::DOUBLE AS tot FROM sym GROUP BY 1),
adjw AS (SELECT s.a, s.b, s.w0 / t.tot AS w FROM sym s JOIN wsum t ON t.node = s.a),
{",".join(ctes)}
SELECT node AS part_id, round(r, 8) AS ppr FROM pr{iters}
"""


def personalized_pagerank(
    edges: DataFrame,
    source: int | None = None,
    iters: int = PPR_ITERS,
    damping: float = PAGERANK_DAMPING,
    adj: DataFrame | None = None,
) -> DataFrame:
    """(part_id, ppr): personalized PageRank from ``source`` (default:
    the lowest node id as a 1-row aggregate — no driver collect) over the
    WEIGHTED co-purchase transitions w(a→b) = n_orders(a,b)/Σ_c
    n_orders(a,c). The random surfer restarts at the seed with
    probability 1-d every step, so mass concentrates in the seed's
    co-purchase neighborhood: this is the "parts related to part X"
    recommender, where global PageRank is the "important parts" ranking.

    Same declarative iteration as :func:`pagerank` — persisted weighted
    adjacency, one join + one groupBy-sum per step — except the teleport
    term is a union with the 1-row seed frame instead of a uniform
    additive constant, and rank state starts as the seed point-mass (the
    support grows by one hop per iteration; nodes never reached hold
    exactly zero and are absent on both engines)."""
    adjw = adj if adj is not None else track_persist(_adj_from(_sym_w(edges), True))
    if source is None:
        seed = edges.agg(F.min("src").alias("node"))
    else:
        seed = edges.sparkSession.createDataFrame([(source,)], "node long")
    d = damping
    ranks = seed.select("node", F.lit(1.0).alias("r"))
    for i in range(1, iters + 1):
        contrib = (
            adjw.join(ranks, adjw["a"] == ranks["node"])
            .groupBy("b")
            .agg((F.lit(d) * F.sum(F.col("r") * F.col("w"))).alias("r"))
            .select(F.col("b").alias("node"), "r")
        )
        ranks = (
            contrib.unionByName(seed.select("node", F.lit(1 - d).alias("r")))
            .groupBy("node")
            .agg(F.sum("r").alias("r"))
        )
        if i % PAGERANK_CHECKPOINT_EVERY == 0 and i < iters:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select(F.col("node").alias("part_id"), F.round("r", 8).alias("ppr"))


@register("graph_ppr", _ppr_sql())
def graph_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    return personalized_pagerank(
        shared_edges(spark, sf_dir),
        adj=shared_artifact(spark, sf_dir, "adj_weighted"),
    )


# --- deterministic random-walk corpus (DeepWalk preprocessing) -----------------

#: Steps per walk beyond the seed (= the oracle's unroll depth). One
#: walk per node; the registered output is (steps+1)·|V| rows.
WALK_STEPS = 4


def _walks_sql(steps: int = WALK_STEPS) -> str:
    ctes = [
        """adj AS (SELECT a, b,
               row_number() OVER (PARTITION BY a ORDER BY b) - 1 AS idx,
               (count(*) OVER (PARTITION BY a))::BIGINT AS deg
        FROM sym)""",
        "w0 AS (SELECT DISTINCT a AS walk_id, a AS node FROM sym)",
    ]
    for i in range(1, steps + 1):
        pick = texthash.hash60_sql(f"w.walk_id::VARCHAR || '_{i}'")
        ctes.append(
            f"w{i} AS (SELECT w.walk_id, a2.b AS node FROM w{i - 1} w "
            f"JOIN adj a2 ON a2.a = w.node AND a2.idx = {pick} % a2.deg)"
        )
    selects = [
        f"SELECT walk_id, {i}::BIGINT AS step, node FROM w{i}"
        for i in range(steps + 1)
    ]
    return f"""
WITH {_EDGES_CTE},
sym AS (SELECT src AS a, dst AS b FROM edges UNION ALL SELECT dst, src FROM edges),
{",".join(ctes)}
{" UNION ALL ".join(selects)}
"""


def random_walks(
    edges: DataFrame, steps: int = WALK_STEPS, adj: DataFrame | None = None
) -> DataFrame:
    """(walk_id, step, node): one DETERMINISTIC uniform random walk per
    node over the symmetrized co-purchase graph — the DeepWalk/node2vec
    (p=q=1) corpus-generation step, the graph analog of the engine's
    seeded samplers. Step i of walk w moves to sorted-neighbor index
    hash60(w || '_' || i) mod deg(cur): derandomized exactly like the
    DSIR/domain-mixture md5 uniforms, so the walk corpus is reproducible
    run-to-run AND value-oracled end-to-end (DuckDB replays the identical
    walks through the identical row_number-indexed adjacency).

    Scale shape: the indexed adjacency persists hash-partitioned on the
    step join key; each step is ONE join of the (walks)-sized frontier
    against it — walk state never includes history (the output is the
    union of per-step frames), lineage is truncated per step with a lazy
    localCheckpoint, and nothing walks on the driver. At 100 TB this is
    the standard embarrassingly-scalable walk generator: 10⁹ walks × K
    steps = K frontier-sized joins against a co-located adjacency."""
    if adj is None:
        adj = track_persist(_adj_indexed(_sym(edges)))
    cur = (
        adj.select(F.col("a").alias("walk_id"))
        .distinct()
        .select("walk_id", F.col("walk_id").alias("node"))
    )
    out = cur.select("walk_id", F.lit(0).cast("long").alias("step"), "node")
    for i in range(1, steps + 1):
        pick = F.pmod(
            texthash.hash60(
                F.concat_ws("_", F.col("walk_id").cast("string"), F.lit(str(i)))
            ),
            F.col("deg"),
        )
        cur = (
            cur.join(adj, (cur["node"] == adj["a"]) & (adj["idx"] == pick))
            .select("walk_id", F.col("b").alias("node"))
            .localCheckpoint(eager=False)
        )
        out = out.unionByName(
            cur.select("walk_id", F.lit(i).cast("long").alias("step"), "node")
        )
    return out


@register("graph_random_walks", _walks_sql())
def graph_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return random_walks(
        shared_edges(spark, sf_dir).select("src", "dst"),
        adj=shared_artifact(spark, sf_dir, "adj_indexed"),
    )


# node2vec biased second-order walks (Grover & Leskovec 2016), with the
# paper's return/in-out parameters as INTEGER weights so the whole
# selection stays exact cross-engine: candidate b from cur with previous
# node prev weighs RETURN_W if b == prev (1/p), COMMON_W if {prev, b} is
# an edge (1), FAR_W otherwise (1/q) — the constants below encode p=4,
# q=2 scaled by 4. The draw is the md5 uniform mapped onto the
# cumulative weights over candidates sorted by id: u = hash60(walk||step)
# mod Σw picks the unique candidate with cum-w ≤ u < cum. Every term is
# integer, the tie order is total, and the edge-membership test is a
# join against the id-ordered edge list — all replayable in SQL.
N2V_RETURN_W = 1
N2V_COMMON_W = 4
N2V_FAR_W = 2
N2V_STEPS = 3


def _n2v_sql(steps: int = N2V_STEPS) -> str:
    ctes = [
        """adj AS MATERIALIZED (SELECT a, b,
               row_number() OVER (PARTITION BY a ORDER BY b) - 1 AS idx,
               (count(*) OVER (PARTITION BY a))::BIGINT AS deg
        FROM sym)""",
        "w0 AS (SELECT DISTINCT a AS walk_id, a AS node FROM sym)",
    ]
    pick1 = texthash.hash60_sql("w.walk_id::VARCHAR || '_1'")
    ctes.append(
        f"s1 AS MATERIALIZED (SELECT w.walk_id, w.node AS prev, a2.b AS cur "
        f"FROM w0 w JOIN adj a2 ON a2.a = w.node AND a2.idx = {pick1} % a2.deg)"
    )
    for t in range(2, steps + 1):
        h = texthash.hash60_sql(f"walk_id::VARCHAR || '_{t}'")
        ctes.append(
            f"""c{t} AS MATERIALIZED (
  SELECT s.walk_id, s.cur, a.b,
         CASE WHEN a.b = s.prev THEN {N2V_RETURN_W}
              WHEN e.src IS NOT NULL THEN {N2V_COMMON_W}
              ELSE {N2V_FAR_W} END AS w
  FROM s{t - 1} s JOIN sym a ON a.a = s.cur
  LEFT JOIN edges e ON e.src = least(s.prev, a.b)
                   AND e.dst = greatest(s.prev, a.b)),
u{t} AS (SELECT walk_id, ({h}) % sum(w) AS u FROM c{t} GROUP BY walk_id),
r{t} AS (SELECT walk_id, cur, b, w,
                sum(w) OVER (PARTITION BY walk_id ORDER BY b) AS cum
         FROM c{t}),
s{t} AS MATERIALIZED (SELECT r.walk_id, r.cur AS prev, r.b AS cur
  FROM r{t} r JOIN u{t} u ON u.walk_id = r.walk_id
  WHERE r.cum - r.w <= u.u AND u.u < r.cum)"""
        )
    selects = ["SELECT walk_id, 0::BIGINT AS step, node FROM w0"] + [
        f"SELECT walk_id, {t}::BIGINT AS step, cur AS node FROM s{t}"
        for t in range(1, steps + 1)
    ]
    return f"""
WITH {_EDGES_CTE},
sym AS (SELECT src AS a, dst AS b FROM edges UNION ALL SELECT dst, src FROM edges),
{",".join(ctes)}
{" UNION ALL ".join(selects)}
"""


def node2vec_walks(
    edges: DataFrame, steps: int = N2V_STEPS, adj: DataFrame | None = None
) -> DataFrame:
    """(walk_id, step, node): one deterministic node2vec walk per node —
    first hop uniform (the :func:`random_walks` rule), subsequent hops
    biased by the second-order return/in-out weights (see the constants
    above). State is (walk_id, prev, cur); each step is one join against
    the cached adjacency (the candidate fan-out), one join against the
    id-ordered edge list (the {prev, candidate} membership test the
    in-out bias needs), and two walk-partitioned windows (total weight +
    cumulative weight) feeding the hash-uniform pick — all exact integer
    arithmetic, value-oracled step for step. Lineage truncates per step;
    nothing walks on the driver."""
    if adj is None:
        adj = track_persist(_adj_indexed(_sym(edges)))
    eidx = edges.select("src", "dst")
    seeds = (
        adj.select(F.col("a").alias("walk_id"))
        .distinct()
        .select("walk_id", F.col("walk_id").alias("node"))
    )
    out = seeds.select("walk_id", F.lit(0).cast("long").alias("step"), "node")
    pick1 = F.pmod(
        texthash.hash60(F.concat_ws("_", F.col("walk_id").cast("string"), F.lit("1"))),
        F.col("deg"),
    )
    s = (
        seeds.join(adj, (seeds["node"] == adj["a"]) & (adj["idx"] == pick1))
        .select("walk_id", F.col("node").alias("prev"), F.col("b").alias("cur"))
        .localCheckpoint(eager=False)
    )
    out = out.unionByName(
        s.select("walk_id", F.lit(1).cast("long").alias("step"), F.col("cur").alias("node"))
    )
    for t in range(2, steps + 1):
        cand = (
            s.join(adj, s["cur"] == adj["a"])
            .select("walk_id", "prev", "cur", "b")
            .join(
                eidx,
                (F.least("prev", "b") == F.col("src"))
                & (F.greatest("prev", "b") == F.col("dst")),
                "left",
            )
            .select(
                "walk_id",
                "cur",
                "b",
                F.when(F.col("b") == F.col("prev"), F.lit(N2V_RETURN_W))
                .when(F.col("src").isNotNull(), F.lit(N2V_COMMON_W))
                .otherwise(F.lit(N2V_FAR_W))
                .cast("long")
                .alias("w"),
            )
        )
        wtot = Window.partitionBy("walk_id")
        wcum = Window.partitionBy("walk_id").orderBy("b")
        h = texthash.hash60(
            F.concat_ws("_", F.col("walk_id").cast("string"), F.lit(str(t)))
        )
        scored = cand.select(
            "walk_id",
            "cur",
            "b",
            "w",
            F.sum("w").over(wcum).alias("cum"),
            F.pmod(h, F.sum("w").over(wtot)).alias("u"),
        )
        s = (
            scored.filter(
                (F.col("cum") - F.col("w") <= F.col("u")) & (F.col("u") < F.col("cum"))
            )
            .select("walk_id", F.col("cur").alias("prev"), F.col("b").alias("cur"))
            .localCheckpoint(eager=False)
        )
        out = out.unionByName(
            s.select(
                "walk_id", F.lit(t).cast("long").alias("step"), F.col("cur").alias("node")
            )
        )
    return out


@register("graph_node2vec_walks", _n2v_sql())
def graph_node2vec_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return node2vec_walks(
        shared_edges(spark, sf_dir).select("src", "dst"),
        adj=shared_artifact(spark, sf_dir, "adj_indexed"),
    )


#: Skip-gram context radius over the walk corpus (word2vec's `window`).
SKIPGRAM_WINDOW = 2


def _skipgrams_sql(steps: int = WALK_STEPS, window: int = SKIPGRAM_WINDOW) -> str:
    return f"""
WITH walks AS ({_walks_sql(steps).strip()})
SELECT c.node AS center, o.node AS context, count(*)::BIGINT AS n_pairs
FROM walks c
JOIN walks o ON o.walk_id = c.walk_id
            AND o.step BETWEEN c.step - {window} AND c.step + {window}
            AND o.step <> c.step
WHERE c.node <> o.node
GROUP BY 1, 2
"""


def walk_skipgrams(
    walks: DataFrame, window: int = SKIPGRAM_WINDOW
) -> DataFrame:
    """(center, context, n_pairs): word2vec-style skip-gram pairs from a
    walk corpus — for every walk position, every other node within
    ``window`` steps, aggregated to pair counts (the (node, node)
    co-occurrence table an embedding trainer consumes; self-pairs from
    revisits are dropped — they carry no gradient). One self-join keyed
    on walk_id (bounded fanout: ≤ 2·window contexts per position) + one
    count aggregate; at 100 TB both shuffle on keys whose cardinality
    the walk corpus bounds (pairs ≤ (steps+1)·2w·|walks|)."""
    c = walks.alias("c")
    o = walks.alias("o")
    return (
        c.join(
            o,
            (F.col("c.walk_id") == F.col("o.walk_id"))
            & (F.col("o.step") >= F.col("c.step") - window)
            & (F.col("o.step") <= F.col("c.step") + window)
            & (F.col("o.step") != F.col("c.step")),
        )
        .filter(F.col("c.node") != F.col("o.node"))
        .groupBy(F.col("c.node").alias("center"), F.col("o.node").alias("context"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register("graph_walk_skipgrams", _skipgrams_sql())
def graph_walk_skipgrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The second DeepWalk stage: the deterministic walk corpus reduced
    to skip-gram training pairs — closing the graph-embedding
    preprocessing pipeline (adjacency → walks → co-occurrence pairs),
    value-oracled end-to-end through both stages."""
    return walk_skipgrams(shared_artifact(spark, sf_dir, "walks"))


# --- in-engine word2vec (SGNS over the walk corpus) ---------------------------

#: Embedding trainer constants (VERDICT r7 #3 — closing adjacency →
#: walks → skip-grams → VECTORS in-engine). Small on purpose: every
#: gradient step is value-oracled through DuckDB, so the unrolled CTE
#: chain must stay legible; the kernel itself takes dims/iters as
#: arguments and scales the same way at any size.
EMB_DIMS = 4
EMB_ITERS = 4
EMB_NEG = 2
EMB_ETA = 2.0

#: Hash-init denominators: init values are dyadic rationals
#: (h % 2^20) / 2^21 - 0.25 ∈ [-0.25, 0.25) — EXACTLY representable
#: doubles, so both engines start from bit-identical state.
_EMB_INIT_MOD = 1 << 20
_EMB_INIT_DEN = float(1 << 21)


def _emb_init_cols(prefix: str, dims: int) -> list:
    return [
        (
            F.pmod(
                texthash.hash60(
                    F.concat(
                        F.lit(f"{prefix}_"),
                        F.col("node").cast("string"),
                        F.lit(f"_{d}"),
                    )
                ),
                F.lit(_EMB_INIT_MOD),
            )
            / F.lit(_EMB_INIT_DEN)
            - F.lit(0.25)
        ).alias(f"{prefix}{d}")
        for d in range(dims)
    ]


def node_embeddings(
    edges: DataFrame,
    steps: int = WALK_STEPS,
    window: int = SKIPGRAM_WINDOW,
    dims: int = EMB_DIMS,
    iters: int = EMB_ITERS,
    neg: int = EMB_NEG,
    eta: float = EMB_ETA,
    adj: DataFrame | None = None,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """(part_id, e0..e{dims-1}): trained node embeddings — word2vec
    skip-gram with negative sampling (Mikolov et al. 2013) over the
    deterministic walk corpus, as FULL-BATCH synchronous gradient
    descent in the :mod:`classifier` discipline: per iteration ONE
    pair-sized join (train pairs ⋈ in-vectors ⋈ out-vectors, all hash
    joins on node keys) and TWO node-sized gradient aggregates, no
    driver loop over samples, every arithmetic step replayed exactly by
    the DuckDB oracle.

    Derandomization makes SGD oracle-able: negatives for pair (c, o)
    are nodes at index hash60(c_o_j) mod |V| of the sorted vocabulary
    (the md5-uniform discipline of the walks/DSIR samplers; collisions
    with the true context are kept — both engines compute them
    identically), and both embedding tables initialize from dyadic-
    rational hash draws instead of RNG state. Batch (not per-sample)
    updates make the result partition-order-independent — the property
    that lets 1000 executors train without a parameter server; this is
    one synchronous step of distributed SGNS (the Spark analog of
    MLlib Word2Vec's per-partition updates, minus the nondeterministic
    merge). The vocabulary index is the distributed zipWithIndex shape
    (``_vocab_index``): range-partitioned per-partition offsets, no
    single-task global sort (VERDICT r8 #4).

    Scale shape: pairs ≤ (steps+1)·2·window·|V| rows; each iteration's
    joins shuffle pair-sized frames on node keys; gradients are
    map-side-combinable sums; state is two |V|×dims tables,
    lineage-truncated per iteration."""
    in_e, _, _, _ = _train_sgns(
        edges, steps, window, dims, iters, neg, eta, adj, pairs
    )
    return in_e.select(
        F.col("node").alias("part_id"),
        *[F.round(F.col(f"i{d}"), 6).alias(f"e{d}") for d in range(dims)],
    )


def _vocab_index(nodes: DataFrame) -> DataFrame:
    """(node, idx): the dense ascending-node index, distributed
    (VERDICT r8 #4). The r8 form — ``row_number() OVER (ORDER BY
    node)`` — funnels every node id through ONE task (a SinglePartition
    Exchange); this is the zipWithIndex shape instead: range-partition
    on node (partitions are disjoint ordered ranges), sort within
    partitions, collect ONE COUNT PER PARTITION (bounded,
    broadcast-class), and emit idx = partition offset + local position.
    The mapping is identical to the global row_number for ANY choice of
    range bounds — offsets absorb whatever split the sampler picked —
    so the DuckDB oracle keeps replaying the plain window form. The
    ranged frame is checkpointed eagerly: the counts pass and the rank
    pass must observe the SAME physical layout (range-sampler re-runs
    are not guaranteed to draw identical bounds)."""
    import numpy as np
    import pandas as pd  # noqa: F401 — mapInPandas batches

    spark = nodes.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        nodes.repartitionByRange(p, "node")
        .sortWithinPartitions("node")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = {
        int(r["pid"]): int(r["c"])
        for r in ranged.groupBy("pid").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    def assign(batches):
        seen = 0
        for pdf in batches:
            if not len(pdf):
                continue
            base = offsets[int(pdf["pid"].iloc[0])]
            out = pdf[["node"]].copy()
            out["idx"] = np.arange(base + seen, base + seen + len(pdf), dtype="int64")
            seen += len(pdf)
            yield out

    node_type = nodes.schema["node"].dataType.simpleString()
    return ranged.mapInPandas(assign, schema=f"node {node_type}, idx long")


def _train_sgns(
    edges: DataFrame,
    steps: int = WALK_STEPS,
    window: int = SKIPGRAM_WINDOW,
    dims: int = EMB_DIMS,
    iters: int = EMB_ITERS,
    neg: int = EMB_NEG,
    eta: float = EMB_ETA,
    adj: DataFrame | None = None,
    pairs: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame, int]:
    """(in-vectors (node, i0..), out-vectors (node, o0..), vocab
    (node, idx), |V|) — the raw trainer behind :func:`node_embeddings`,
    unrounded so downstream consumers (the eval query) compose before
    the output round. ``pairs`` serves the prebuilt skip-gram artifact
    (``shared_artifact(..., "skipgrams")``) — identical content to the
    in-line derivation by determinism."""
    if pairs is None:
        pairs = walk_skipgrams(
            random_walks(edges, steps=steps, adj=adj), window=window
        )
    vocab_nodes = (
        _sym(edges).select(F.col("a").alias("node")).distinct()
    )
    vocab = _vocab_index(vocab_nodes)
    nv = vocab.count()
    pos = pairs.select(
        "center", "context", "n_pairs", F.lit(1.0).alias("y")
    )
    negs = (
        pairs.select(
            "center",
            "context",
            "n_pairs",
            F.explode(F.array(*[F.lit(j) for j in range(1, neg + 1)])).alias("j"),
        )
        .withColumn(
            "nidx",
            F.pmod(
                texthash.hash60(
                    F.concat_ws(
                        "_",
                        F.col("center").cast("string"),
                        F.col("context").cast("string"),
                        F.col("j").cast("string"),
                    )
                ),
                F.lit(nv),
            ),
        )
        .join(
            # node-sized lookup against the pair-sized draw table: same
            # broadcast rationale (and size gate) as the training joins
            F.broadcast(vocab) if nv <= 10_000_000 else vocab,
            F.col("nidx") == F.col("idx"),
        )
        .select(
            "center",
            F.col("node").alias("context"),
            "n_pairs",
            F.lit(0.0).alias("y"),
        )
    )
    train = pos.unionByName(negs).localCheckpoint(eager=False)
    in_e = vocab_nodes.select("node", *_emb_init_cols("i", dims))
    out_e = vocab_nodes.select("node", *_emb_init_cols("o", dims))
    # The embedding state is |V| rows of dims doubles. When that fits an
    # executor comfortably, broadcast it into the pair join so the
    # pair-sized train table is NEVER shuffled or sorted per iteration
    # (guide §3.1 — Catalyst's static estimate for the distinct-derived
    # node table undershoots so badly it planned both joins sort-merge,
    # shuffling the 60·|V|-row train table twice per gradient). Gated on
    # the ALREADY-COMPUTED vocabulary size, not a local-mode constant:
    # past the cap (|V|·(dims+1)·8B ≈ 400 MB) the plan falls back to the
    # shuffle joins that scale to billion-node vocabularies.
    bcast_state = nv <= 10_000_000
    for _ in range(iters):
        in_side = in_e.withColumnRenamed("node", "center")
        out_side = out_e.withColumnRenamed("node", "context")
        if bcast_state:
            in_side, out_side = F.broadcast(in_side), F.broadcast(out_side)
        tr = train.join(in_side, "center").join(out_side, "context")
        dot = sum(F.col(f"i{d}") * F.col(f"o{d}") for d in range(dims))
        gw = F.col("n_pairs") * (
            F.lit(1.0) / (F.lit(1.0) + F.exp(-dot)) - F.col("y")
        )
        # materialize the scored pair table ONCE per iteration: both
        # gradient aggregates read it, and without the checkpoint each
        # re-evaluated the whole join chain (the plan held two copies of
        # the pair join per round — guide §7.2's duplicated-subtree smell)
        tr = tr.withColumn("gw", gw).localCheckpoint(eager=False)
        # per-node WEIGHTED-AVERAGE gradient (÷ Σ n_pairs): step size is
        # bounded by eta·max|vec| regardless of a node's pair mass — the
        # hub-proofing without which high-degree nodes take degree-sized
        # steps and oscillate (measured: un-normalized updates pushed
        # co-occurring pairs APART at every tested eta)
        ing = tr.groupBy(F.col("center").alias("node")).agg(
            *[
                (F.sum(F.col("gw") * F.col(f"o{d}")) / F.sum("n_pairs")).alias(
                    f"g{d}"
                )
                for d in range(dims)
            ]
        )
        outg = tr.groupBy(F.col("context").alias("node")).agg(
            *[
                (F.sum(F.col("gw") * F.col(f"i{d}")) / F.sum("n_pairs")).alias(
                    f"g{d}"
                )
                for d in range(dims)
            ]
        )
        in_e = (
            in_e.join(ing, "node", "left")
            .select(
                "node",
                *[
                    (
                        F.col(f"i{d}")
                        - F.lit(eta) * F.coalesce(F.col(f"g{d}"), F.lit(0.0))
                    ).alias(f"i{d}")
                    for d in range(dims)
                ],
            )
            .localCheckpoint(eager=False)
        )
        out_e = (
            out_e.join(outg, "node", "left")
            .select(
                "node",
                *[
                    (
                        F.col(f"o{d}")
                        - F.lit(eta) * F.coalesce(F.col(f"g{d}"), F.lit(0.0))
                    ).alias(f"o{d}")
                    for d in range(dims)
                ],
            )
            .localCheckpoint(eager=False)
        )
    return in_e, out_e, vocab, nv


def _node_emb_sql(
    steps: int = WALK_STEPS,
    window: int = SKIPGRAM_WINDOW,
    dims: int = EMB_DIMS,
    iters: int = EMB_ITERS,
    neg: int = EMB_NEG,
    eta: float = EMB_ETA,
) -> tuple[str, str]:
    """(CTE chain, final in-table name) for the unrolled SGNS trainer —
    shared by the embeddings query and the eval query."""
    dcols = list(range(dims))

    def init_cols(prefix: str) -> str:
        outs = []
        for d in dcols:
            h = texthash.hash60_sql(f"'{prefix}_' || node::VARCHAR || '_{d}'")
            outs.append(
                f"(({h}) % {_EMB_INIT_MOD}) / {_EMB_INIT_DEN} - 0.25 AS {prefix}{d}"
            )
        return ", ".join(outs)

    nh = texthash.hash60_sql(
        "center::VARCHAR || '_' || context::VARCHAR || '_' || j::VARCHAR"
    )
    junnest = ", ".join(str(j) for j in range(1, neg + 1))
    # every CTE is MATERIALIZED (the _kcore_sql lesson): walks is
    # referenced by pairs (twice) and vnodes, train by every iteration,
    # in{t}/out{t} by three successors each — default inlining would
    # re-expand the whole unrolled chain exponentially
    parts = [
        f"walks AS MATERIALIZED ({_walks_sql(steps).strip()})",
        f"""pairs AS MATERIALIZED (
SELECT c.node AS center, o.node AS context, count(*)::BIGINT AS n_pairs
FROM walks c
JOIN walks o ON o.walk_id = c.walk_id
            AND o.step BETWEEN c.step - {window} AND c.step + {window}
            AND o.step <> c.step
WHERE c.node <> o.node
GROUP BY 1, 2)""",
        "vnodes AS MATERIALIZED (SELECT DISTINCT walk_id AS node FROM walks)",
        "vocab AS MATERIALIZED (SELECT node, row_number() OVER (ORDER BY node) - 1 AS idx FROM vnodes)",
        "nv AS MATERIALIZED (SELECT count(*)::BIGINT AS nv FROM vnodes)",
        f"""train AS MATERIALIZED (
SELECT center, context, n_pairs, 1.0 AS y FROM pairs
UNION ALL
SELECT p.center, v.node AS context, p.n_pairs, 0.0 AS y
FROM pairs p
CROSS JOIN (SELECT unnest([{junnest}]) AS j) jj
CROSS JOIN nv
JOIN vocab v ON v.idx = ({nh}) % nv.nv)""",
        f"in0 AS MATERIALIZED (SELECT node, {init_cols('i')} FROM vnodes)",
        f"out0 AS MATERIALIZED (SELECT node, {init_cols('o')} FROM vnodes)",
    ]
    for t in range(1, iters + 1):
        dot = " + ".join(f"i.i{d} * o.o{d}" for d in dcols)
        icols = ", ".join(f"i.i{d}" for d in dcols)
        ocols = ", ".join(f"o.o{d}" for d in dcols)
        parts.append(
            f"""j{t} AS MATERIALIZED (
SELECT tr.center, tr.context, tr.n_pairs, {icols}, {ocols},
       tr.n_pairs * (1.0 / (1.0 + exp(-({dot}))) - tr.y) AS gw
FROM train tr
JOIN in{t - 1} i ON i.node = tr.center
JOIN out{t - 1} o ON o.node = tr.context)"""
        )
        ing = ", ".join(f"sum(gw * o{d}) / sum(n_pairs) AS g{d}" for d in dcols)
        outg = ", ".join(f"sum(gw * i{d}) / sum(n_pairs) AS g{d}" for d in dcols)
        iupd = ", ".join(
            f"p.i{d} - {eta} * coalesce(g.g{d}, 0) AS i{d}" for d in dcols
        )
        oupd = ", ".join(
            f"p.o{d} - {eta} * coalesce(g.g{d}, 0) AS o{d}" for d in dcols
        )
        parts.append(
            f"ing{t} AS MATERIALIZED (SELECT center AS node, {ing} FROM j{t} GROUP BY 1)"
        )
        parts.append(
            f"in{t} AS MATERIALIZED (SELECT p.node, {iupd} FROM in{t - 1} p "
            f"LEFT JOIN ing{t} g USING (node))"
        )
        parts.append(
            f"outg{t} AS MATERIALIZED (SELECT context AS node, {outg} FROM j{t} GROUP BY 1)"
        )
        parts.append(
            f"out{t} AS MATERIALIZED (SELECT p.node, {oupd} FROM out{t - 1} p "
            f"LEFT JOIN outg{t} g USING (node))"
        )
    return ",\n".join(parts), f"in{iters}"


def _node_embeddings_sql() -> str:
    ctes, fin = _node_emb_sql()
    ecols = ", ".join(f"round(i{d}, 6) AS e{d}" for d in range(EMB_DIMS))
    return f"WITH {ctes}\nSELECT node AS part_id, {ecols} FROM {fin}"


@register("graph_node_embeddings", _node_embeddings_sql())
def graph_node_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third DeepWalk stage (VERDICT r7 #3): adjacency → walks →
    skip-gram pairs → TRAINED VECTORS, all in-engine, the whole train
    value-oracled to 6 decimals through DuckDB's identical unrolled
    gradient chain."""
    return node_embeddings(
        shared_edges(spark, sf_dir).select("src", "dst"),
        pairs=shared_artifact(spark, sf_dir, "skipgrams"),
    )


# --- degree assortativity ------------------------------------------------------

_ASSORT_SQL = f"""
WITH {_EDGES_CTE},
sym AS (SELECT src AS a, dst AS b FROM edges UNION ALL SELECT dst, src FROM edges),
deg AS (SELECT a AS node, count(*)::DOUBLE AS deg FROM sym GROUP BY 1)
SELECT count(*) AS n_dir_edges, round(corr(x.deg, y.deg), 8) AS assortativity
FROM sym s JOIN deg x ON x.node = s.a JOIN deg y ON y.node = s.b
"""


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """(n_dir_edges, assortativity): the Pearson correlation of endpoint
    degrees over the symmetrized edge list (Newman 2002) — positive when
    high-degree parts co-purchase with other high-degree parts
    (assortative mixing), negative for hub-and-spoke structure. One of
    the cheapest whole-graph health numbers: two degree joins feeding a
    single ``corr`` aggregate (Pearson over directed edge instances, each
    undirected edge contributing both orientations — the standard
    convention, mirrored in the oracle). No iteration, nothing on the
    driver; the correlation is a map-side-combinable moment aggregate."""
    sym = _sym(edges)
    deg = sym.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("double").alias("deg")
    )
    dx = deg.select(F.col("node").alias("_xa"), F.col("deg").alias("da"))
    dy = deg.select(F.col("node").alias("_yb"), F.col("deg").alias("db"))
    return (
        sym.join(dx, sym["a"] == dx["_xa"])
        .join(dy, sym["b"] == dy["_yb"])
        .agg(
            F.count(F.lit(1)).alias("n_dir_edges"),
            F.covar_samp("da", "db").alias("_cov"),
            F.stddev_samp("da").alias("_sa"),
            F.stddev_samp("db").alias("_sb"),
        )
        # explicit Pearson assembly: under ANSI mode F.corr raises
        # divide-by-zero on a degree-regular graph (zero variance) where
        # SQL corr — and the DuckDB oracle — return NULL
        .select(
            "n_dir_edges",
            F.round(
                F.when(
                    (F.col("_sa") > 0) & (F.col("_sb") > 0),
                    F.col("_cov") / (F.col("_sa") * F.col("_sb")),
                ),
                8,
            ).alias("assortativity"),
        )
    )


@register("graph_assortativity", _ASSORT_SQL)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return degree_assortativity(shared_edges(spark, sf_dir).select("src", "dst"))


# --- HITS on the bipartite purchase graph ------------------------------------

#: HITS power-iteration count (= the oracle's CTE unroll depth). The
#: bipartite spectrum contracts fast (gap = (σ2/σ1)² of the purchase
#: matrix); 6 double steps put successive-iterate movement below the
#: 8 dp output round on every fixture sf.
HITS_ITERS = 6

# The purchase graph is DIRECTED bipartite (customer → part via
# orders⋈lineitem), so hubs and authorities are distinct score families —
# on the undirected co-purchase graph HITS would degenerate to hub ==
# authority (the adjacency is symmetric and both iterations collapse to
# power iteration on A²), which is why this kernel gets its own edge
# derivation instead of ``shared_edges``.
# MATERIALIZED: DuckDB inlines plain CTEs per reference — pedges appears
# in 2·iters CTEs and each inline re-opens the parquet scans (fd
# exhaustion at iters=6), and every a{i}r/h{i}r is referenced twice (the
# select and its own L2-norm scalar subquery).
_PEDGES_CTE = """
pedges AS MATERIALIZED (SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
"""


def _hits_sql(iters: int = HITS_ITERS) -> str:
    ctes = ["h0 AS (SELECT DISTINCT c AS node, 1.0::DOUBLE AS s FROM pedges)"]
    for i in range(1, iters + 1):
        ctes.append(
            f"a{i}r AS MATERIALIZED (SELECT e.p AS node, sum(h.s) AS s FROM pedges e "
            f"JOIN h{i - 1} h ON h.node = e.c GROUP BY 1)"
        )
        ctes.append(
            f"a{i} AS (SELECT node, s / sqrt((SELECT sum(s*s) FROM a{i}r)) AS s FROM a{i}r)"
        )
        ctes.append(
            f"h{i}r AS MATERIALIZED (SELECT e.c AS node, sum(a.s) AS s FROM pedges e "
            f"JOIN a{i} a ON a.node = e.p GROUP BY 1)"
        )
        ctes.append(
            f"h{i} AS (SELECT node, s / sqrt((SELECT sum(s*s) FROM h{i}r)) AS s FROM h{i}r)"
        )
    return f"""
WITH {_PEDGES_CTE.strip()},
{",".join(ctes)}
SELECT 'part' AS kind, node AS node_id, round(s, 8) AS score FROM a{iters}
UNION ALL
SELECT 'customer' AS kind, node AS node_id, round(s, 8) AS score FROM h{iters}
"""


def purchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(c, p): the distinct customer→part purchase edges — the directed
    bipartite graph HITS runs on."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )


def hits(edges: DataFrame, iters: int = HITS_ITERS) -> DataFrame:
    """(kind, node_id, score): HITS hub/authority scores (Kleinberg 1999)
    after ``iters`` mutually-recursive power steps over a directed
    bipartite (c, p) edge list, L2-normalized per half-step as in the
    paper. Authorities are parts many well-connected customers buy; hubs
    are customers whose baskets concentrate on authoritative parts.

    Same declarative iteration discipline as :func:`pagerank`: the edge
    table persists TWICE, hash-partitioned on each join key (``c`` for
    the authority half-step, ``p`` for the hub half-step), so every
    iteration exchanges only the (node, score) tables; the L2 norm enters
    as a broadcast 1-row aggregate (never a collected scalar). Unlike
    PageRank, each half-step's RAW score table is EAGERLY
    ``localCheckpoint``-ed (the k-core discipline): the norm aggregate
    and the normalized projection both consume it, and that double
    reference doubles the LOGICAL PLAN every half-step — a 4^iters tree
    that at iters=6 OOM-ed the driver merely STRINGIFYING the plan, which
    a cache can't fix because caching dedups execution, not the plan.
    The checkpoint replaces the subtree with a LogicalRDD, so plan size
    stays constant per iteration; its cost is one materializing job per
    half-step over a (node, score)-sized table. Scores round to 8 dp on
    both engines (summation-order divergence is ~1e-15 relative)."""
    e_c = track_persist(edges.repartition("c"))
    e_p = track_persist(edges.repartition("p"))
    hub = (
        e_c.select(F.col("c").alias("node"))
        .distinct()
        .select("node", F.lit(1.0).alias("s"))
    )
    auth = None
    for i in range(1, iters + 1):
        ar = (
            e_c.join(hub, e_c["c"] == hub["node"])
            .groupBy("p")
            .agg(F.sum("s").alias("m"))
        ).localCheckpoint()
        an = ar.agg(F.sqrt(F.sum(F.col("m") * F.col("m"))).alias("nrm"))
        auth = ar.crossJoin(F.broadcast(an)).select(
            F.col("p").alias("node"), (F.col("m") / F.col("nrm")).alias("s")
        )
        hr = (
            e_p.join(auth, e_p["p"] == auth["node"])
            .groupBy("c")
            .agg(F.sum("s").alias("m"))
        ).localCheckpoint()
        hn = hr.agg(F.sqrt(F.sum(F.col("m") * F.col("m"))).alias("nrm"))
        hub = hr.crossJoin(F.broadcast(hn)).select(
            F.col("c").alias("node"), (F.col("m") / F.col("nrm")).alias("s")
        )
    out = lambda df, kind: df.select(
        F.lit(kind).alias("kind"),
        F.col("node").alias("node_id"),
        F.round("s", 8).alias("score"),
    )
    return out(auth, "part").unionByName(out(hub, "customer"))


@register("graph_hits", _hits_sql())
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hits(shared_purchases(spark, sf_dir))



# --- sampled triangle estimation (DOULION) -------------------------------------

#: Edge-sampling modulus for the DOULION estimator: keep an edge iff
#: hash60(src||'_'||dst) % TRI_SAMPLE_MOD == 0 (p = 1/TRI_SAMPLE_MOD).
#: Deterministic, so the "estimator" is value-oracle-able end to end —
#: DuckDB reproduces the identical sample and the identical estimate.
TRI_SAMPLE_MOD = 5

_TRI_EST_SQL = f"""
WITH {{edges_cte}},
se AS (SELECT src, dst FROM edges
       WHERE {{h}} % {{mod}} = 0),
tri AS (SELECT count(*)::BIGINT AS t
        FROM se e1
        JOIN se e2 ON e2.src = e1.dst
        JOIN se e3 ON e3.src = e1.src AND e3.dst = e2.dst)
SELECT (SELECT count(*) FROM se)::BIGINT AS n_sampled_edges,
       t AS sampled_triangles,
       (t * {{scale}})::BIGINT AS est_total_triangles
FROM tri
"""


def triangle_estimate(
    edges: DataFrame, mod: int = TRI_SAMPLE_MOD, oriented: DataFrame | None = None
) -> DataFrame:
    """(n_sampled_edges, sampled_triangles, est_total_triangles): DOULION
    (Tsourakakis et al. 2009) — count triangles on a p=1/mod edge sample
    and scale by 1/p³ for an unbiased estimate of the total. The sample
    is a DETERMINISTIC hash of the edge key, which makes this estimator a
    full value oracle (DuckDB draws the identical sample) and makes
    re-runs reproducible — the property a 100 TB nightly metric needs
    anyway. Cost: the wedge join runs on |E|/mod edges, so the dominant
    O(Σ out-deg²) term shrinks ~mod² — the cheap first answer before
    paying for the exact kernel."""
    if oriented is not None:
        # serve the PREBUILT full-graph orientation restricted to the
        # sampled edge keys (r8): a degree orientation only needs SOME
        # consistent total vertex order for exactly-once counting, so
        # full-graph (deg, id) order is as valid on the sampled subgraph
        # as the sample's own — and skips rebuilding degrees + two joins
        # per estimate (measured 6.3s → 2.6s at sf0.1). The id-ordered
        # edge key {least, greatest}(u, v) reconstructs the hash the
        # oracle samples on.
        kept_o = oriented.filter(
            texthash.hash60(
                F.concat_ws(
                    "_",
                    F.least("u", "v").cast("string"),
                    F.greatest("u", "v").cast("string"),
                )
            )
            % mod
            == 0
        ).localCheckpoint(eager=False)
        per_node = triangle_counts(edges, oriented=kept_o)
        ne = kept_o.agg(F.count(F.lit(1)).alias("n_sampled_edges"))
    else:
        kept = edges.select("src", "dst").filter(
            texthash.hash60(
                F.concat_ws(
                    "_", F.col("src").cast("string"), F.col("dst").cast("string")
                )
            )
            % mod
            == 0
        )
        # materialize the sample once: the md5 edge-key filter costs ~1s
        # per evaluation and the orientation + wedge kernel scans `kept`
        # ~5× (degree agg, two endpoint joins, wedge stats, closing side)
        kept = kept.localCheckpoint(eager=False)
        per_node = triangle_counts(kept)
        ne = kept.agg(F.count(F.lit(1)).alias("n_sampled_edges"))
    tri = per_node.agg(
        (F.coalesce(F.sum("n_triangles"), F.lit(0)) / 3).cast("long").alias("t")
    )
    return ne.crossJoin(tri).select(
        "n_sampled_edges",
        F.col("t").alias("sampled_triangles"),
        (F.col("t") * mod * mod * mod).cast("long").alias("est_total_triangles"),
    )


@register(
    "graph_triangle_estimate",
    _TRI_EST_SQL.format(
        edges_cte=_EDGES_CTE,
        h=texthash.hash60_sql("src::VARCHAR || '_' || dst::VARCHAR"),
        mod=TRI_SAMPLE_MOD,
        scale=TRI_SAMPLE_MOD**3,
    ),
)
def graph_triangle_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return triangle_estimate(
        shared_edges(spark, sf_dir),
        oriented=shared_artifact(spark, sf_dir, "oriented"),
    )


# --- item-item collaborative-filtering cosine ----------------------------------

CF_TOP = 50

_CF_COSINE_SQL = f"""
WITH {_EDGES_CTE},
sym AS (SELECT src AS a, dst AS b, n_orders AS w FROM edges
        UNION ALL SELECT dst, src, n_orders FROM edges),
s AS (SELECT a AS node, sum(w)::DOUBLE AS tot FROM sym GROUP BY 1),
scored AS (SELECT e.src, e.dst,
                  round(e.n_orders / sqrt(sa.tot * sb.tot), 6) AS cf_cosine
           FROM edges e
           JOIN s sa ON sa.node = e.src
           JOIN s sb ON sb.node = e.dst),
r AS (SELECT src, dst, cf_cosine,
             row_number() OVER (ORDER BY cf_cosine DESC, src, dst) AS rk
      FROM scored)
SELECT src, dst, cf_cosine FROM r WHERE rk <= {CF_TOP}
"""


def cf_cosine_pairs(edges: DataFrame, top: int = CF_TOP) -> DataFrame:
    """(src, dst, cf_cosine): item-item collaborative-filtering scores —
    the co-occurrence count normalized by the geometric mean of each
    part's total co-occurrence mass, n(a,b)/√(S_a·S_b) — the "customers
    who bought X also bought Y" ranking, strong for pairs whose
    co-occurrence is large RELATIVE to both parts' overall popularity
    (raw n_orders just surfaces popular×popular). Derived entirely from
    the cached edge table: one degree-mass aggregate joined back onto the
    edges, then a global top-``top`` (TakeOrderedAndProject — a k-row
    driver result, no full sort)."""
    sym = _sym_w(edges)
    mass = sym.groupBy(F.col("a").alias("node")).agg(
        F.sum("w0").cast("double").alias("tot")
    )
    ma = mass.select(F.col("node").alias("_a"), F.col("tot").alias("ta"))
    mb = mass.select(F.col("node").alias("_b"), F.col("tot").alias("tb"))
    return (
        edges.join(ma, edges["src"] == ma["_a"])
        .join(mb, edges["dst"] == mb["_b"])
        .select(
            "src",
            "dst",
            F.round(
                F.col("n_orders") / F.sqrt(F.col("ta") * F.col("tb")), 6
            ).alias("cf_cosine"),
        )
        .orderBy(F.desc("cf_cosine"), "src", "dst")
        .limit(top)
    )


@register("graph_cf_cosine", _CF_COSINE_SQL)
def graph_cf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cf_cosine_pairs(shared_edges(spark, sf_dir))


#: Cohort size for the embedding eval (matched across cohorts).
EMB_EVAL_PAIRS = 50

#: Session-lifetime trained-embedding store: (app_id, sf_dir) ->
#: (in_e, out_e, vocab, nv). The eval query SERVES trained vectors the
#: way ivf_search_prebuilt serves a built index — the trainer query
#: (graph_node_embeddings) keeps paying its full training inside its
#: timed region; this cache only spares its CONSUMERS a retrain.
_SGNS_CACHE: dict = {}


def shared_sgns(spark: SparkSession, sf_dir: str):
    """Trained SGNS state over the shared graph store, built once per
    (session, corpus) from the skipgrams artifact. Deterministic, so
    cache hits are value-identical to a fresh train."""
    key = (spark.sparkContext.applicationId, sf_dir)
    registry.require_warm(_SGNS_CACHE, key, "trained sgns embeddings")
    if key not in _SGNS_CACHE:
        _SGNS_CACHE[key] = _train_sgns(
            shared_edges(spark, sf_dir).select("src", "dst"),
            pairs=shared_artifact(spark, sf_dir, "skipgrams"),
        )
    return _SGNS_CACHE[key]


def embedding_pair_eval(
    edges: DataFrame,
    n_pairs_eval: int = EMB_EVAL_PAIRS,
    dims: int = EMB_DIMS,
    adj: DataFrame | None = None,
    pairs: DataFrame | None = None,
    trained: tuple | None = None,
) -> DataFrame:
    """(pair_kind, n_pairs, mean_cosine): intrinsic eval of the trained
    vectors against the model's own similarity (in·out cosine — the
    score SGNS trains, Mikolov et al. 2013 §2) over three deterministic
    cohorts:

    - ``trained_top`` — the ``n_pairs_eval`` most frequent skip-gram
      pairs: training must rank these far above chance (pinned > random
      in tests; measured +0.44 vs +0.04 at the registered constants);
    - ``cf_overlap`` — skip-gram pairs ranked by their co-purchase
      CF-cosine strength (:func:`cf_cosine_pairs`' scoring): the
      cross-signal check that embedding affinity tracks the independent
      co-purchase statistic. Restricted to pairs the walk corpus
      actually visited — the raw CF top-k is NOT a valid eval cohort at
      one walk per node (measured: 1 of its 50 pairs appears in the
      corpus; scoring unvisited pairs measures walk coverage, not
      training);
    - ``random`` — md5-uniform vocabulary pairs (self-pairs dropped
      identically on both engines), the chance baseline.

    FULL value oracle: trainer, cohort construction, and cosine
    arithmetic all replayed in DuckDB. The cohort top-k windows are
    global but k-bounded (row_number over n_pairs / cf score with id
    tie-breaks)."""
    if trained is None:
        trained = _train_sgns(
            edges.select("src", "dst"), dims=dims, adj=adj, pairs=pairs
        )
    in_e, out_e, vocab, nv = trained
    spark = edges.sparkSession
    if pairs is None:
        pairs = walk_skipgrams(
            random_walks(edges.select("src", "dst"), adj=adj)
        ).localCheckpoint(eager=False)
    wtop = Window.orderBy(F.desc("n_pairs"), "center", "context")
    tt = (
        pairs.withColumn("rk", F.row_number().over(wtop))
        .filter(F.col("rk") <= n_pairs_eval)
        .select(
            F.lit("trained_top").alias("pair_kind"),
            F.col("center").alias("src"),
            F.col("context").alias("dst"),
        )
    )
    sym = _sym_w(edges)
    mass = sym.groupBy(F.col("a").alias("node")).agg(
        F.sum("w0").cast("double").alias("tot")
    )
    ma = mass.select(F.col("node").alias("_a"), F.col("tot").alias("ta"))
    mb = mass.select(F.col("node").alias("_b"), F.col("tot").alias("tb"))
    cf_scored = (
        edges.join(ma, edges["src"] == ma["_a"])
        .join(mb, edges["dst"] == mb["_b"])
        .select(
            "src",
            "dst",
            F.round(
                F.col("n_orders") / F.sqrt(F.col("ta") * F.col("tb")), 6
            ).alias("cf_cosine"),
        )
    )
    wcf = Window.orderBy(F.desc("cf_cosine"), "src", "dst")
    cfo = (
        cf_scored.join(
            pairs,
            (cf_scored["src"] == pairs["center"])
            & (cf_scored["dst"] == pairs["context"]),
            "semi",
        )
        .withColumn("rk", F.row_number().over(wcf))
        .filter(F.col("rk") <= n_pairs_eval)
        .select(F.lit("cf_overlap").alias("pair_kind"), "src", "dst")
    )
    draws = spark.range(1, n_pairs_eval + 1).select(F.col("id").alias("j"))
    ra = F.pmod(
        texthash.hash60(F.concat(F.lit("ra_"), F.col("j").cast("string"))),
        F.lit(nv),
    )
    rb = F.pmod(
        texthash.hash60(F.concat(F.lit("rb_"), F.col("j").cast("string"))),
        F.lit(nv),
    )
    va = vocab.select(F.col("idx").alias("ia"), F.col("node").alias("src"))
    vb = vocab.select(F.col("idx").alias("ib"), F.col("node").alias("dst"))
    rnd = (
        draws.select(ra.alias("ia"), rb.alias("ib"))
        .join(F.broadcast(va), "ia")
        .join(F.broadcast(vb), "ib")
        .filter(F.col("src") != F.col("dst"))
        .select(F.lit("random").alias("pair_kind"), "src", "dst")
    )
    allp = tt.unionByName(cfo).unionByName(rnd)
    ea = in_e.select(
        F.col("node").alias("src"),
        *[F.col(f"i{d}").alias(f"a{d}") for d in range(dims)],
    )
    eb = out_e.select(
        F.col("node").alias("dst"),
        *[F.col(f"o{d}").alias(f"b{d}") for d in range(dims)],
    )
    dot = sum(F.col(f"a{d}") * F.col(f"b{d}") for d in range(dims))
    na = sum(F.col(f"a{d}") * F.col(f"a{d}") for d in range(dims))
    nb = sum(F.col(f"b{d}") * F.col(f"b{d}") for d in range(dims))
    return (
        allp.join(ea, "src")
        .join(eb, "dst")
        .select("pair_kind", (dot / F.sqrt(na * nb)).alias("cos"))
        .groupBy("pair_kind")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg("cos"), 6).alias("mean_cosine"),
        )
    )


def _embedding_eval_sql(
    n_pairs_eval: int = EMB_EVAL_PAIRS,
    dims: int = EMB_DIMS,
    iters: int = EMB_ITERS,
) -> str:
    ctes, fin = _node_emb_sql(dims=dims, iters=iters)
    fout = f"out{iters}"
    dcols = list(range(dims))
    ha = texthash.hash60_sql("'ra_' || j::VARCHAR")
    hb = texthash.hash60_sql("'rb_' || j::VARCHAR")
    dot = " + ".join(f"ia.i{d} * ib.o{d}" for d in dcols)
    na = " + ".join(f"ia.i{d} * ia.i{d}" for d in dcols)
    nb = " + ".join(f"ib.o{d} * ib.o{d}" for d in dcols)
    return f"""
WITH {_EDGES_CTE},
{ctes},
tt AS (SELECT 'trained_top' AS pair_kind, center AS src, context AS dst FROM (
    SELECT center, context,
           row_number() OVER (ORDER BY n_pairs DESC, center, context) AS rk
    FROM pairs) WHERE rk <= {n_pairs_eval}),
symw AS (SELECT src AS a, dst AS b, n_orders AS w FROM edges
         UNION ALL SELECT dst, src, n_orders FROM edges),
mass AS (SELECT a AS node, sum(w)::DOUBLE AS tot FROM symw GROUP BY 1),
cfsc AS (SELECT e.src, e.dst,
                round(e.n_orders / sqrt(sa.tot * sb.tot), 6) AS cf_cosine
         FROM edges e
         JOIN mass sa ON sa.node = e.src
         JOIN mass sb ON sb.node = e.dst),
cfo AS (SELECT 'cf_overlap' AS pair_kind, src, dst FROM (
    SELECT c.src, c.dst,
           row_number() OVER (ORDER BY c.cf_cosine DESC, c.src, c.dst) AS rk
    FROM cfsc c SEMI JOIN pairs p ON p.center = c.src AND p.context = c.dst)
    WHERE rk <= {n_pairs_eval}),
rnd AS (SELECT 'random' AS pair_kind, va.node AS src, vb.node AS dst
        FROM (SELECT unnest(range(1, {n_pairs_eval + 1})) AS j) jj
        CROSS JOIN nv
        JOIN vocab va ON va.idx = ({ha}) % nv.nv
        JOIN vocab vb ON vb.idx = ({hb}) % nv.nv
        WHERE va.node <> vb.node),
allp AS (SELECT * FROM tt UNION ALL SELECT * FROM cfo UNION ALL SELECT * FROM rnd),
cosd AS (SELECT p.pair_kind,
                ({dot}) / sqrt(({na}) * ({nb})) AS cos
         FROM allp p
         JOIN {fin} ia ON ia.node = p.src
         JOIN {fout} ib ON ib.node = p.dst)
SELECT pair_kind, count(*)::BIGINT AS n_pairs, round(avg(cos), 6) AS mean_cosine
FROM cosd GROUP BY 1
"""


@register("graph_embedding_eval", _embedding_eval_sql())
def graph_embedding_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intrinsic eval of the trained node embeddings (VERDICT r7 #3's
    second half): the model must score its frequent co-occurrences and
    the CF-strongest visited pairs above hash-random pairs. FULL value
    oracle — trainer, cohorts, and cosine arithmetic all replayed in
    DuckDB."""
    return embedding_pair_eval(
        shared_edges(spark, sf_dir),
        pairs=shared_artifact(spark, sf_dir, "skipgrams"),
        trained=shared_sgns(spark, sf_dir),
    )


# --- per-customer recommendations (item-kNN) ------------------------------------

#: Neighbors kept per part in the truncated item-item model — the
#: standard item-kNN memory bound: candidate fanout per customer is
#: |owned parts| · REC_MODEL_K instead of |owned| · avg-degree.
REC_MODEL_K = 8
REC_TOP = 5

_RECS_SQL = f"""
WITH {_EDGES_CTE},
pe AS (SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
       FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
sym AS (SELECT src AS a, dst AS b, n_orders AS w FROM edges
        UNION ALL SELECT dst, src, n_orders FROM edges),
s AS (SELECT a AS node, sum(w)::DOUBLE AS tot FROM sym GROUP BY 1),
cf AS (SELECT y.a, y.b,
              floor(y.w / sqrt(sa.tot * sb.tot) * 1000000 + 0.5)::BIGINT AS si
       FROM sym y JOIN s sa ON sa.node = y.a JOIN s sb ON sb.node = y.b),
model AS (SELECT a, b, si FROM (
            SELECT a, b, si,
                   row_number() OVER (PARTITION BY a ORDER BY si DESC, b) AS rk
            FROM cf) t WHERE rk <= {REC_MODEL_K}),
cand AS (SELECT pe.c, m.b,
                sum(m.si)::BIGINT AS score_micro,
                count(*)::BIGINT AS n_paths
         FROM pe JOIN model m ON m.a = pe.p
         WHERE NOT EXISTS (SELECT 1 FROM pe o WHERE o.c = pe.c AND o.p = m.b)
         GROUP BY 1, 2)
SELECT c AS custkey, b AS part_id, score_micro, n_paths, rk
FROM (SELECT c, b, score_micro, n_paths,
             row_number() OVER (PARTITION BY c ORDER BY score_micro DESC, b) AS rk
      FROM cand) t
WHERE rk <= {REC_TOP}
"""


def recommend_parts(
    purchases: DataFrame,
    edges: DataFrame,
    model_k: int = REC_MODEL_K,
    top: int = REC_TOP,
) -> DataFrame:
    """(custkey, part_id, score_micro, n_paths, rk): item-kNN
    recommendations — per customer, the ``top`` parts they have NOT
    bought, scored by the sum of CF-cosine similarity to the parts they
    own, through a model truncated to each part's ``model_k`` strongest
    neighbors (the memory bound that makes item-kNN serve at scale: the
    model is O(parts·k), candidate fanout is |owned|·k, never
    |owned|·degree).

    Exactness discipline: similarities are micro-scaled integers
    (floor(cf·1e6 + 0.5) — the cross-engine half-rule), so candidate
    scores are exact integer sums and every ranking tie-break is
    deterministic on both engines; cf itself is bit-identical because it
    is one IEEE expression over exact integer inputs. Plan: the model is
    two joins + one per-part WindowGroupLimit over the cached edges;
    recommendation is one join on the owned parts, one anti-join to
    remove already-owned, one integer aggregate, one per-customer
    top-``top`` window."""
    sym = _sym_w(edges)
    mass = sym.groupBy(F.col("a").alias("node")).agg(
        F.sum("w0").cast("double").alias("tot")
    )
    ma = mass.select(F.col("node").alias("_a"), F.col("tot").alias("ta"))
    mb = mass.select(F.col("node").alias("_b"), F.col("tot").alias("tb"))
    cf = (
        sym.join(ma, sym["a"] == ma["_a"])
        .join(mb, sym["b"] == mb["_b"])
        .select(
            "a",
            "b",
            F.floor(
                F.col("w0") / F.sqrt(F.col("ta") * F.col("tb")) * 1000000 + 0.5
            )
            .cast("long")
            .alias("si"),
        )
    )
    wm = Window.partitionBy("a").orderBy(F.desc("si"), F.asc("b"))
    model = (
        cf.withColumn("rk", F.row_number().over(wm))
        .filter(F.col("rk") <= model_k)
        .select("a", "b", "si")
    )
    pur = track_persist(purchases.select("c", "p").distinct())
    cand = (
        pur.join(model, pur["p"] == model["a"])
        .select("c", "b", "si")
        .join(
            pur.select("c", F.col("p").alias("b")),
            ["c", "b"],
            "left_anti",
        )
        .groupBy("c", "b")
        .agg(
            F.sum("si").alias("score_micro"),
            F.count(F.lit(1)).alias("n_paths"),
        )
    )
    wr = Window.partitionBy("c").orderBy(F.desc("score_micro"), F.asc("b"))
    return (
        cand.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= top)
        .select(
            F.col("c").alias("custkey"),
            F.col("b").alias("part_id"),
            "score_micro",
            "n_paths",
            "rk",
        )
    )


@register("graph_recommendations", _RECS_SQL)
def graph_recommendations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return recommend_parts(
        shared_purchases(spark, sf_dir).select("c", "p"),
        shared_edges(spark, sf_dir),
    )

# The co-purchase queries share one warmer FUNCTION but each registers
# only the graph-store pieces it consumes: (artifact kinds, needs edges,
# needs purchases). The builds run once per session, outside bench's
# timed regions (graph_edge_weights has NO warmer — it is the measured
# derivation), and a query never warms — or holds — an adjacency shape
# it doesn't read (ADVICE r6 #2).
_QUERY_GRAPH_NEEDS: dict[str, tuple[tuple[str, ...], bool, bool]] = {
    "graph_hits": ((), False, True),
    "graph_triangle_counts": (("oriented",), True, False),
    "graph_clustering_coeff": (("oriented",), True, False),
    "graph_components": (("sym_b",), True, False),
    "graph_bfs_hops": (("sym_a",), True, False),
    "graph_betweenness": (("sym_a",), True, False),
    "graph_closeness": (("sym_a",), True, False),
    "graph_sssp_weighted": (("symw_cost",), True, False),
    "graph_pagerank": (("adj_uniform",), True, False),
    "graph_pagerank_weighted": (("adj_weighted",), True, False),
    "graph_kcore": (("sym_a",), True, False),
    "graph_ktruss": (("oriented",), True, False),
    "graph_random_walks": (("adj_indexed",), True, False),
    "graph_walk_skipgrams": (("walks",), True, False),
    "graph_node_embeddings": (("skipgrams",), True, False),
    "graph_node2vec_walks": (("adj_indexed",), True, False),
    "graph_ppr": (("adj_weighted",), True, False),
    "graph_assortativity": ((), True, False),
    "graph_lpa_communities": (("sym_b",), True, False),
    "graph_triangle_estimate": (("oriented",), True, False),
    "graph_cf_cosine": ((), True, False),
    "graph_recommendations": ((), True, True),
}


def _graph_warmer(kinds: tuple[str, ...], with_edges: bool, with_purchases: bool):
    def warm(spark: SparkSession, sf_dir: str) -> None:
        warm_graph(
            spark,
            sf_dir,
            kinds=kinds,
            with_edges=with_edges,
            with_purchases=with_purchases,
        )

    return warm


for _q, _needs in _QUERY_GRAPH_NEEDS.items():
    registry.WARMERS[_q] = _graph_warmer(*_needs)


def _warm_embedding_eval(spark: SparkSession, sf_dir: str) -> None:
    """graph_embedding_eval serves PREBUILT trained vectors (the
    ivf_search_prebuilt discipline): warm the corpus chain AND the
    trained state outside the timed region. The trainer query keeps its
    own training inside its timing. Populates ``_SGNS_CACHE`` directly —
    the warm_graph discipline: a warmer must never route through the
    strict-serve accessor it exists to satisfy."""
    warm_graph(spark, sf_dir, kinds=("skipgrams",), with_purchases=False)
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _SGNS_CACHE:
        _SGNS_CACHE[key] = _train_sgns(
            shared_edges(spark, sf_dir).select("src", "dst"),
            pairs=shared_artifact(spark, sf_dir, "skipgrams"),
        )


registry.WARMERS["graph_embedding_eval"] = _warm_embedding_eval
