"""Sharded graph ANN (HNSW-family) — the graph-index tier the reference
lacks (its registry stops at flat/ivf/lsh, ``app/core/vector_db.py:81-84``),
built the way distributed vector stores actually deploy HNSW: one
navigable-small-world graph PER SHARD, queries fan out to every shard and
merge per-shard top-k (the Elasticsearch/OpenSearch/Vespa architecture —
a single global graph cannot be built or traversed across executors).

Spark design:
- **shard**: deterministic ``md5(vec_id) % SHARDS`` — membership depends
  only on the id, never on partitioning, so builds are reproducible.
- **build**: one shuffle on shard, then each shard's graph is constructed
  in a single grouped-map Arrow call (``applyInPandas``): nodes inserted
  in vec_id order in deterministic index batches (``BUILD_BATCH``), each
  batch member drawing its EXACT top-``EF_CONSTRUCTION`` prefix
  neighbors as candidates (one sgemm + one argpartition per batch —
  affordable because members-per-graph is bounded), the HNSW diversity
  heuristic picking ``M`` links from them (clustered data needs the
  different-direction links), edges bidirectional, adjacency shrunk to
  ``M_MAX`` by the same diversity heuristic + the lifeline rule. Insert
  order, batch
  boundaries, and all tie-breaks are pinned (score DESC, id ASC) → the
  graph is a pure function of the corpus.
- **serve**: the graph table (vec_id, embedding, neighbors) is cached
  with shards whole within partitions, so search is a ZERO-SHUFFLE
  ``mapInPandas`` pass: each partition accumulates its complete shards,
  beam-searches every query against each shard's adjacency, and emits
  per-shard top-k; a global rank window (WindowGroupLimit) merges
  O(shards·k) rows per query. At 100 TB the graph persists
  ``partitionBy(shard)`` and the same kernel runs on the pruned scan.

Correctness contract (tests/test_ann_recall.py): recall@10 pinned vs the
exact flat scan, plus the strong invariant — with ``ef`` ≥ shard size the
beam cannot evict, and the lifeline pruning rule (see
``_build_shard_graph``) guarantees every node stays reachable from the
entry (bare similarity pruning can disconnect the graph — found by the
hypothesis property test, worth ~16 recall points at 200k×64), so
full-beam search == exhaustive scan and the sharded result EQUALS the
exact k-NN, rank for rank. The reachability invariant itself is
property-tested over arbitrary random corpora in tests/test_properties.py.
"""

from __future__ import annotations

import heapq

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vectordb_from_scratch_spark import registry
from vectordb_from_scratch_spark.functions import texthash
from vectordb_from_scratch_spark.registry import register
from vectordb_from_scratch_spark.session import load_table

SHARDS = 8
M = 16  # out-degree target at insert
M_MAX = 24  # adjacency cap after reverse-edge additions
EF_CONSTRUCTION = 64
EF_SEARCH = 64
DEFAULT_K = 10
N_QUERIES = 10


def _beam(
    adj: list,
    Xu: np.ndarray,
    q: np.ndarray,
    ef: int,
    entry: int = 0,
    allowed: np.ndarray | None = None,
):
    """Best-first NSW search over adjacency lists: returns [(sim, node)]
    of up to ``ef`` best nodes. Ties pop deterministically (heap orders by
    (score, node)); neighbor dots run as one gemv per expansion.

    ``allowed`` (optional bool mask) is the filter-aware mode (VERDICT r8
    #1, the hnswlib-style filtered search): NAVIGATION runs over the full
    graph — every admissible node still enters the candidate heap, so the
    beam can cross non-passing regions — but only ``allowed`` nodes enter
    the result heap, and ``ef`` bounds the PASSING results. Termination
    invariant the widening loop stands on: the early break requires
    ``len(res) >= ef``, so a return with fewer than ``ef`` results means
    the candidate heap drained — the entire reachable component was
    traversed and the result is EXACT over reachable passing nodes."""
    d0 = float(Xu[entry] @ q)
    visited = np.zeros(len(Xu), dtype=bool)
    visited[entry] = True
    cand = [(-d0, entry)]  # max-heap on similarity
    if allowed is None:
        res = [(d0, entry)]  # min-heap keeps the ef best
        while cand:
            nd, u = heapq.heappop(cand)
            if len(res) >= ef and -nd < res[0][0]:
                break
            nbrs = [v for v in adj[u] if not visited[v]]
            if not nbrs:
                continue
            visited[np.array(nbrs)] = True
            sims = Xu[nbrs] @ q
            for v, dv in zip(nbrs, sims):
                dv = float(dv)
                if len(res) < ef or dv > res[0][0]:
                    heapq.heappush(cand, (-dv, v))
                    heapq.heappush(res, (dv, v))
                    if len(res) > ef:
                        heapq.heappop(res)
        return res
    res = [(d0, entry)] if allowed[entry] else []
    while cand:
        nd, u = heapq.heappop(cand)
        if len(res) >= ef and -nd < res[0][0]:
            break
        nbrs = [v for v in adj[u] if not visited[v]]
        if not nbrs:
            continue
        visited[np.array(nbrs)] = True
        sims = Xu[nbrs] @ q
        for v, dv in zip(nbrs, sims):
            dv = float(dv)
            # expansion gate keys on the worst PASSING result — while
            # fewer than ef passing nodes are known, everything expands
            if len(res) < ef or dv > res[0][0]:
                heapq.heappush(cand, (-dv, v))
                if allowed[v]:
                    heapq.heappush(res, (dv, v))
                    if len(res) > ef:
                        heapq.heappop(res)
    return res


def _beam_filtered(
    adj: list,
    Xu: np.ndarray,
    q: np.ndarray,
    ef: int,
    k: int,
    allowed: np.ndarray,
):
    """Filter-aware beam sized to guarantee "k passing results or proof
    of exhaustion" in ONE pass: the beam runs at ``ef' = max(ef, k)``
    (capped at the shard size), so by the ``_beam`` termination
    invariant every return either carries a full beam — ≥ ef' ≥ k
    passing results — or proves the reachable component held fewer
    passing nodes than ef', i.e. ALL of them were found. The
    widen-and-retry loop the probed tiers would need collapses here
    because ef bounds PASSING results (not visited nodes): there is no
    third outcome to retry. At ``ef`` ≥ shard size this IS the filtered
    exact scan of the shard — the full-beam == exact contract extends
    unchanged (pinned in tests/test_catalog.py)."""
    n = len(Xu)
    return _beam(adj, Xu, q, min(n, max(ef, k)), allowed=allowed)


def _connect(
    node: int,
    links: list,
    adj: list,
    in_lower: list,
    Xu: np.ndarray,
    m_max: int,
    slack: int = 0,
    diverse: bool = False,
) -> None:
    """Wire ``node`` → ``links`` bidirectionally, pruning any overflowing
    adjacency to ``m_max`` best-by-similarity (tie: lower node id) —
    EXCEPT that a node's LAST incoming edge from a lower-index node is
    never pruned (the "lifeline" rule). Bare similarity pruning can
    disconnect the graph (found by the hypothesis property test: n=13,
    d=3 — unreachable nodes mean silent recall loss that only grows with
    corpus size, since larger shards prune more). With every node
    keeping ≥1 incoming edge from below, reachability from the entry
    node follows by induction, which is exactly the invariant the
    full-ef == exact contract stands on; the degree cap is soft by at
    most the handful of lifelines. ``slack`` adds prune hysteresis (used
    by the batched builder): an adjacency may grow to m_max+slack before
    one prune takes it back to m_max — fewer prune passes, each deciding
    with more candidates in view; the final graph's degrees stay within
    m_max+slack and the lifeline rule applies at every prune."""
    adj[node] = links
    for v in links:
        adj[v].append(node)
        in_lower[node] += 1
        if len(adj[v]) > m_max + slack:
            cand = np.asarray(adj[v])
            sims = Xu[cand] @ Xu[v]
            order = np.lexsort((cand, -sims))
            if diverse:
                # diversity-heuristic shrink (batched builder): keeping
                # only top-by-similarity here starves the graph of its
                # cross-cluster reverse edges as clusters fill in —
                # measured recall 0.60 vs 0.93 at 25k×64 over 64
                # clusters. Far candidates score low to v but LOWER to
                # every kept neighbor, so the heuristic retains them.
                keep = _select_diverse(cand[order], sims[order], Xu, m_max)
            else:
                keep = [int(cand[j]) for j in order[:m_max]]
            kept = set(keep)
            for j in order:
                u = int(cand[j])
                if u in kept:
                    continue
                if u > v and in_lower[u] == 1:
                    keep.append(u)  # lifeline: u's only path from below
                elif u > v:
                    in_lower[u] -= 1
            adj[v] = keep


def _build_shard_graph(Xu: np.ndarray, m: int, m_max: int, efc: int) -> list:
    """Sequential reference builder: insert nodes 0..n-1 (caller
    pre-sorts by vec_id), connect each to its ``m`` beam-nearest among
    the current graph (lifeline-pruned — see ``_connect``). Kept as the
    semantic reference for the property tests; production builds go
    through ``_build_shard_graph_batched``."""
    n = len(Xu)
    adj: list[list[int]] = [[] for _ in range(n)]
    in_lower = [0] * n  # incoming edges from lower-index nodes, per node
    for i in range(1, n):
        found = _beam(adj[:i], Xu[:i], Xu[i], max(efc, m), entry=0)
        # m best: similarity DESC, node ASC — pinned order
        found.sort(key=lambda t: (-t[0], t[1]))
        _connect(i, [v for _, v in found[:m]], adj, in_lower, Xu, m_max)
    return adj


#: Nodes per insert batch: one sgemm + one argpartition per batch, so
#: larger batches amortize better; bounded so the (prefix × batch) score
#: matrix stays small (25k × 512 float32 = 50 MB at the member cap).
BUILD_BATCH = 512

#: Prune hysteresis for the batched builder: adjacency may overshoot
#: m_max by this much before one (diversity-heuristic) prune takes it
#: back — fewer prune passes, each deciding with more candidates in
#: view. Degrees stay within m_max + slack; measured at 25k×64 over 64
#: clusters: slack 24 is both the fastest (6.1× the 500/s sequential
#: rate) and the best-recall (1.000 at ef=64) setting tried.
PRUNE_SLACK = 24


def _exact_links_batch(Xf: np.ndarray, lo: int, hi: int, m: int) -> list:
    """Exact top-``m`` prefix neighbors for nodes [lo, hi): one
    (batch × d)·(d × lo) sgemm, one row-wise argpartition, and a
    deterministic tie rule — selection order is (sim DESC, node ASC),
    and when the cut value is tied, LOWER node ids win (argpartition
    alone would pick boundary ties arbitrarily). Returns one
    (nodes, sims) array pair per batch node, sorted (sim DESC, node
    ASC)."""
    # (batch, lo) row-major: per-ROW argpartition runs on contiguous
    # memory — the transposed (lo, batch) layout measured 6× slower in
    # the column-wise introselect
    S = Xf[lo:hi] @ Xf[:lo].T
    mm = min(m, lo)
    sel = np.argpartition(-S, mm - 1, axis=1)[:, :mm]  # ties arbitrary
    selS = np.take_along_axis(S, sel, axis=1)
    cut = selS.min(axis=1)  # per-row m-th best similarity
    # rows whose cut value also occurs outside the selection need the
    # deterministic boundary rule; everywhere else argpartition's pick IS
    # the unique top-m set
    eq_total = (S == cut[:, None]).sum(axis=1)
    eq_sel = (selS == cut[:, None]).sum(axis=1)
    links = []
    for t in range(S.shape[0]):
        nodes, sims = sel[t], selS[t]
        if eq_total[t] != eq_sel[t]:
            row = S[t]
            definite = nodes[sims > cut[t]]
            ties = np.flatnonzero(row == cut[t])  # ascending node ids
            nodes = np.concatenate([definite, ties[: mm - len(definite)]])
            sims = row[nodes]
        order = np.lexsort((nodes, -sims))
        links.append((nodes[order], sims[order]))
    return links


def _select_diverse(
    cand: np.ndarray, simq: np.ndarray, Xf: np.ndarray, m: int
) -> list:
    """HNSW neighbor-selection heuristic (Malkov & Yashunin Alg. 4) over
    an exact candidate pool sorted (sim DESC, node ASC): keep a candidate
    only if it is closer to the new node than to every already-kept
    neighbor, then fill to ``m`` from the pruned, best-first. Pure exact
    top-m links all point into the node's own cluster on clustered data —
    measured recall collapse 0.93 → 0.47 at 200k×64 over 64 clusters —
    while this rule keeps links in DIFFERENT directions (the long-range
    shortcuts beam navigation needs). One small gemm for the
    candidate×candidate sims; the running max-to-kept makes the scan
    O(|cand|·m) with one vector op per kept link."""
    if len(cand) <= m:
        return [int(v) for v in cand]
    Sc = Xf[cand] @ Xf[cand].T  # (c, c) candidate-candidate sims
    maxk = np.full(len(cand), -np.inf, dtype=Sc.dtype)
    kept: list[int] = []
    skipped: list[int] = []
    for idx in range(len(cand)):
        if len(kept) == m:
            break
        if simq[idx] > maxk[idx]:
            kept.append(idx)
            np.maximum(maxk, Sc[idx], out=maxk)
        else:
            skipped.append(idx)
    if len(kept) < m:
        kept.extend(skipped[: m - len(kept)])
        kept.sort()  # restore (sim DESC, node ASC) order
    return [int(cand[i]) for i in kept]


def _build_shard_graph_batched(
    Xu: np.ndarray, m: int, m_max: int, efc: int, batch: int = BUILD_BATCH
) -> list:
    """Batched insertion (r4 verdict #2): nodes arrive in deterministic
    index-order batches; every batch member takes its ``efc`` EXACT
    nearest neighbors in the FROZEN prefix graph as a candidate pool
    (one sgemm + one argpartition per batch — no per-node Python beam),
    the HNSW diversity heuristic picks ``m`` links from the pool
    (``_select_diverse`` — mandatory on clustered data), and edges apply
    in ascending node order under the same lifeline-pruned ``_connect``
    rule as the sequential builder.

    Exact selection is affordable precisely because of the repo's own
    shard-sizing rule: members-per-graph is bounded (GRAPH_MAX_MEMBERS,
    enforced by md5 sub-sharding), so the O(shard²·d) total cost is
    capped per graph and scale comes from graph COUNT — while a beam's
    only advantage, sub-quadratic growth in shard size, never
    materializes under the bound. Links are a superset-quality version
    of what beam search approximates; measured ~7× the sequential build
    rate at 25k×64 with recall unchanged (SCALE.md round 5).

    Batch-boundary tie rule (the documented semantic difference from the
    sequential builder): members of one batch never link to each other —
    their ``m`` nearest come from the frozen prefix only, and reverse
    edges within a batch exist only prefix→member. Batch sizes are a
    pure function of n (ramp: a batch never exceeds the frozen prefix
    size), keeping the graph a deterministic function of the corpus;
    float32 scoring is deterministic too (same kernel, same input, same
    order), with ties pinned by ``_exact_links_batch``. ``efc`` is
    unused here — exact selection has no beam width; the signature
    matches the sequential builder so callers can swap freely.
    Reachability is unaffected: every node still keeps ≥1 incoming edge
    from a lower-index node, so the full-ef == exact contract and the
    connectivity property hold for either builder."""
    n = len(Xu)
    adj: list[list[int]] = [[] for _ in range(n)]
    in_lower = [0] * n
    Xf = np.ascontiguousarray(Xu, dtype=np.float32)
    c = max(efc, m)  # candidate pool width for the diversity selection
    i = 1
    while i < n:
        j = min(n, i + min(batch, i))  # ramp: batch ≤ frozen prefix
        for t, (cand, simq) in enumerate(_exact_links_batch(Xf, i, j, c)):
            links = _select_diverse(cand, simq, Xf, m)
            _connect(
                i + t, links, adj, in_lower, Xu, m_max,
                slack=PRUNE_SLACK, diverse=True,
            )
        i = j
    return adj


def _normalize(X: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    return X / np.where(norms == 0, 1.0, norms)


def build_graphs(
    emb: DataFrame,
    shards: int = SHARDS,
    m: int = M,
    m_max: int = M_MAX,
    efc: int = EF_CONSTRUCTION,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(shard, vec_id, embedding, neighbors): one NSW graph per shard.
    One shuffle (groupBy shard); each graph is built in a single
    grouped-map call, deterministic for a given corpus."""
    import pandas as pd

    id_type = emb.schema[id_col].dataType.simpleString()
    vec_type = emb.schema[vec_col].dataType.simpleString()

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        X = np.stack(pdf[vec_col].to_list()).astype("float64")
        Xu = _normalize(X)
        adj = _build_shard_graph_batched(Xu, m, m_max, efc)
        ids = pdf[id_col].to_list()
        return pd.DataFrame(
            {
                "shard": pdf["shard"].to_numpy(),
                id_col: ids,
                vec_col: pdf[vec_col],
                "neighbors": [[ids[v] for v in a] for a in adj],
            }
        )

    sharded = emb.select(
        (texthash.hash60(F.col(id_col).cast("string")) % shards)
        .cast("int")
        .alias("shard"),
        id_col,
        vec_col,
    )
    return sharded.groupBy("shard").applyInPandas(
        build,
        schema=(
            f"shard int, {id_col} {id_type}, {vec_col} {vec_type}, "
            f"neighbors array<{id_type}>"
        ),
    )


def search_graphs(
    graph: DataFrame,
    qpdf,
    k: int = DEFAULT_K,
    ef: int = EF_SEARCH,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    grouped: bool = False,
) -> DataFrame:
    """Fan a query batch out to every shard graph and merge: per-shard
    top-k under the exact global tie order, then one rank window over
    O(shards·k) rows per query.

    ``grouped=False`` (serve path): zero-shuffle mapInPandas — valid ONLY
    when shards are whole within partitions (the cached build output
    guarantees this; batches of one partition are accumulated, so a shard
    split across Arrow batches is reassembled). A shard split across
    PARTITIONS fails loudly (adjacency references a missing node).
    ``grouped=True`` (catalog path over a parquet-read graph, where the
    scanner may split a shard's file): pays one groupBy(shard) shuffle of
    the graph table for unconditional correctness.

    Filter-aware mode (VERDICT r8 #1): a boolean ``passing`` column on
    ``graph`` marks the metadata-filter survivors; the beam then
    navigates the FULL shard graph but admits only passing nodes to the
    result heap (``_beam_filtered``), and ``k`` is guaranteed per shard
    whenever the reachable component holds k passing nodes — no column
    means unfiltered search, byte-identical to before."""
    import pandas as pd

    from vectordb_from_scratch_spark.operators import knn

    Q = _normalize(np.stack(qpdf["query_vec"].to_list()).astype("float64"))
    qids = qpdf["query_id"].to_numpy()

    def search_shard(g: pd.DataFrame):
        g = g.sort_values(id_col).reset_index(drop=True)
        ids = g[id_col].to_list()
        pos = {v: i for i, v in enumerate(ids)}
        Xu = _normalize(np.stack(g[vec_col].to_list()).astype("float64"))
        adj = [[pos[v] for v in nbrs] for nbrs in g["neighbors"].to_list()]
        mask = (
            g["passing"].to_numpy(dtype=bool) if "passing" in g.columns else None
        )
        out_q, out_id, out_s = [], [], []
        for qi, q in zip(qids, Q):
            res = (
                _beam(adj, Xu, q, ef)
                if mask is None
                else _beam_filtered(adj, Xu, q, ef, k, mask)
            )
            sims = np.array([s for s, _ in res])
            nodes = np.array([v for _, v in res])
            # rank by (score desc, positional id asc) — positions are in
            # id-sorted order, so this matches the global (score, id) tie
            sel = knn.local_topk_indices(sims, nodes, k)
            out_q.extend([int(qi)] * len(sel))
            out_id.extend(ids[v] for v in nodes[sel])
            out_s.extend(float(x) for x in sims[sel])
        return pd.DataFrame({"query_id": out_q, id_col: out_id, "score": out_s})

    def search_iter(batches):
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        if pdf.empty:
            return
        for _, g in pdf.groupby("shard", sort=True):
            yield search_shard(g)

    id_type = graph.schema[id_col].dataType.simpleString()
    out_schema = f"query_id long, {id_col} {id_type}, score double"
    if grouped:
        per_shard = graph.groupBy("shard").applyInPandas(
            lambda pdf: search_shard(pdf), schema=out_schema
        )
    else:
        per_shard = graph.mapInPandas(search_iter, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        per_shard.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, F.round("score", 6).alias("score"), "rank")
    )


#: per-process graph cache, same regime as ivf._BUILD_CACHE: build once,
#: search many; the catalog persists graphs as sidecar tables instead.
_BUILD_CACHE: dict = {}


def built_graph(spark: SparkSession, sf_dir: str, shards: int = SHARDS) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, shards)
    if key not in _BUILD_CACHE:
        emb = load_table(spark, sf_dir, "embeddings")
        g = build_graphs(emb, shards=shards).cache()
        g.count()
        _BUILD_CACHE[key] = g
    return _BUILD_CACHE[key]


def build_and_search(
    spark: SparkSession,
    sf_dir: str,
    k: int = DEFAULT_K,
    ef: int = EF_SEARCH,
    n_queries: int = N_QUERIES,
) -> DataFrame:
    from vectordb_from_scratch_spark.operators import knn

    qpdf, _ = knn.fixture_query_set(spark, sf_dir, n_queries)
    g = built_graph(spark, sf_dir)
    return search_graphs(g, qpdf, k=k, ef=ef)


@register("hnsw_search")  # rows-only: graph construction is not SQL-expressible
def hnsw_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cold build + sharded graph search. Correctness carried by
    tests/test_ann_recall.py: pinned recall vs exact, full-ef == exact,
    and construction determinism."""
    res = build_and_search(spark, sf_dir)
    return res.select(
        "query_id", "vec_id", "score", F.col("rank").cast("long").alias("rnk")
    )


def warm_hnsw(spark: SparkSession, sf_dir: str) -> None:
    from vectordb_from_scratch_spark.operators import knn

    built_graph(spark, sf_dir)
    knn.fixture_query_set(spark, sf_dir, N_QUERIES)


registry.WARMERS["hnsw_search_prebuilt"] = warm_hnsw


@register("hnsw_search_prebuilt")  # rows-only: depends on graph build
def hnsw_search_prebuilt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query path against the process-cached graph — the serving regime.
    Under registry.STRICT_SERVE a cold cache raises, keeping the
    cold/serve bench split honest."""
    registry.require_warm(
        _BUILD_CACHE,
        (spark.sparkContext.applicationId, sf_dir, SHARDS),
        "hnsw",
    )
    return hnsw_search(spark, sf_dir)


def _make_pair_topk(id_col: str, vec_col: str, k: int, ef: int):
    """The cogroup kernel shared by the full-fan-out and routed
    distributed searches: one (graph rows, query rows) pair per task —
    rebuild the shard adjacency, beam every query in the right frame,
    emit per-shard top-k under the exact global tie order. A boolean
    ``passing`` column on the graph side switches every beam to the
    filter-aware kernel (the same contract as ``search_graphs``)."""
    import pandas as pd

    from vectordb_from_scratch_spark.operators import knn

    def pair_topk(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            return pd.DataFrame({"query_id": [], id_col: [], "score": []}).astype(
                {"query_id": "int64", "score": "float64"}
            )
        g_ = left.sort_values(id_col).reset_index(drop=True)
        ids = g_[id_col].to_list()
        pos = {v: i for i, v in enumerate(ids)}
        Xu = _normalize(np.stack(g_[vec_col].to_list()).astype("float64"))
        adj = [[pos[v] for v in nbrs] for nbrs in g_["neighbors"].to_list()]
        mask = (
            g_["passing"].to_numpy(dtype=bool) if "passing" in g_.columns else None
        )
        Qm = _normalize(np.stack(right["query_vec"].to_list()).astype("float64"))
        qids = right["query_id"].to_numpy()
        out_q: list = []
        out_id: list = []
        out_s: list = []
        for qi, qv in zip(qids, Qm):
            res = (
                _beam(adj, Xu, qv, ef)
                if mask is None
                else _beam_filtered(adj, Xu, qv, ef, k, mask)
            )
            sims = np.array([s for s, _ in res])
            nodes = np.array([v for _, v in res])
            sel = knn.local_topk_indices(sims, nodes, k)
            out_q.extend([int(qi)] * len(sel))
            out_id.extend(ids[v] for v in nodes[sel])
            out_s.extend(float(x) for x in sims[sel])
        return pd.DataFrame({"query_id": out_q, id_col: out_id, "score": out_s})

    return pair_topk


def search_graphs_distributed(
    graph: DataFrame,
    queries: DataFrame,
    k: int = DEFAULT_K,
    ef: int = EF_SEARCH,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    shard_ids: list | None = None,
    n_queries_hint: int | None = None,
    queries_per_block: int = 4096,
) -> DataFrame:
    """Fan-out graph search for UNBOUNDED query batches: queries stay a
    Spark DataFrame end to end — no driver pandas, no query matrix in any
    closure (the large-Q exit ``ivf.search_distributed`` provides for the
    IVF tier, here for the graph tier). Queries are hash-blocked and
    replicated across shards; graph shards are replicated across query
    blocks; each (shard, qblk) cogroup pair beams its block's queries
    against its complete shard adjacency and emits per-shard top-k under
    the exact global tie order, merged by the standard rank window.
    Results are identical to ``search_graphs`` for the same queries.

    The graph-side replication factor is ceil(Q/queries_per_block) —
    full fan-out is inherently every-query × every-shard work; when that
    product is too large, the routed tier (IVF probe pruning) is the
    scale path, not a bigger fan-out — see ``routed_search_distributed``."""
    if shard_ids is None:
        shard_ids = sorted(
            r["shard"] for r in graph.select("shard").distinct().collect()
        )
    nq = n_queries_hint if n_queries_hint is not None else queries.count()
    nqb = max(1, -(-int(nq) // queries_per_block))
    gcols = ["shard", id_col, vec_col, "neighbors"] + (
        ["passing"] if "passing" in graph.columns else []
    )
    g = graph.select(
        *gcols,
        F.explode(F.sequence(F.lit(0), F.lit(nqb - 1))).alias("qblk"),
    )
    q = queries.select(
        "query_id",
        "query_vec",
        F.pmod(F.xxhash64("query_id"), F.lit(nqb)).cast("int").alias("qblk"),
        F.explode(
            F.array(*[F.lit(int(s)).cast("int") for s in shard_ids])
        ).alias("shard"),
    )
    id_type = graph.schema[id_col].dataType.simpleString()
    per_pair = (
        g.groupBy("shard", "qblk")
        .cogroup(q.groupBy("shard", "qblk"))
        .applyInPandas(
            _make_pair_topk(id_col, vec_col, k, ef),
            schema=f"query_id long, {id_col} {id_type}, score double",
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        per_pair.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, F.round("score", 6).alias("score"), "rank")
    )


registry.WARMERS["hnsw_search_bigq"] = warm_hnsw


@register("hnsw_search_bigq")  # rows-only: depends on graph build
def hnsw_search_bigq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The large-batch exit for the graph tier (completing the bigq
    family: ivf_search_bigq, lsh_search_bigq): same beams, same scores as
    hnsw_search, but the queries ride the plan as a DataFrame — no
    driver collect, so the batch size is unbounded. The fixture's 10
    queries anchor correctness (equality with the driver-side path and
    the cogroup plan shape are asserted in tests/test_plans.py)."""
    from vectordb_from_scratch_spark.operators import knn

    _, queries = knn.fixture_query_set(spark, sf_dir, N_QUERIES)
    g = built_graph(spark, sf_dir)
    res = search_graphs_distributed(
        g,
        queries,
        shard_ids=list(range(SHARDS)),
        n_queries_hint=N_QUERIES,
    )
    return res.select(
        "query_id", "vec_id", "score", F.col("rank").cast("long").alias("rnk")
    )


@register("hnsw_graph_degrees")  # rows-only: graph build not SQL-expressible
def hnsw_graph_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacency-degree distribution per shard — the graph-health
    diagnostic (degree collapse ⇒ recall collapse), the analog of
    ivf_cluster_sizes for the graph tier."""
    g = built_graph(spark, sf_dir)
    return (
        g.select("shard", F.size("neighbors").alias("degree"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("degree").alias("min_degree"),
            F.round(F.avg("degree"), 2).alias("avg_degree"),
            F.max("degree").alias("max_degree"),
        )
    )


# --- IVF-routed graph search (cluster-partitioned graphs + probe pruning) ----
#
# The md5-sharded index above fans every query to every shard — random
# shards all look like the global distribution, so nothing can be
# pruned. Partitioning the graphs by IVF CLUSTER instead makes the
# shards semantic: a query probes the top-n closest centroids (the same
# driver-side policy as ivf.search) and beams only those clusters'
# graphs. This is the IVF×HNSW composition real systems run at extreme
# scale (SCALE.md "Round 4b" remedy): probe pruning bounds the fan-out,
# the graph bounds the within-cluster scan, and with the graph table
# persisted partitionBy(cluster) the probe filter is partition pruning.
#
# Exactness invariant (tests): probing EVERY cluster at full ef must
# equal the exact scan — approximation decomposes into exactly two
# knobs, probe count (IVF's) and beam width (the graph's).


def build_graphs_by(
    emb: DataFrame,
    shard_col: str,
    m: int = M,
    m_max: int = M_MAX,
    efc: int = EF_CONSTRUCTION,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """build_graphs over a caller-supplied partition column (e.g. the IVF
    cluster assignment) instead of the md5 shard."""
    import pandas as pd

    id_type = emb.schema[id_col].dataType.simpleString()
    vec_type = emb.schema[vec_col].dataType.simpleString()

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        X = np.stack(pdf[vec_col].to_list()).astype("float64")
        adj = _build_shard_graph_batched(_normalize(X), m, m_max, efc)
        ids = pdf[id_col].to_list()
        return pd.DataFrame(
            {
                "shard": pdf["shard"].to_numpy(),
                id_col: ids,
                vec_col: pdf[vec_col],
                "neighbors": [[ids[v] for v in a] for a in adj],
            }
        )

    sharded = emb.select(F.col(shard_col).cast("int").alias("shard"), id_col, vec_col)
    return sharded.groupBy("shard").applyInPandas(
        build,
        schema=(
            f"shard int, {id_col} {id_type}, {vec_col} {vec_type}, "
            f"neighbors array<{id_type}>"
        ),
    )


def routed_search(
    graph: DataFrame,
    qpdf,
    probes: list[tuple],
    k: int = DEFAULT_K,
    ef: int = EF_SEARCH,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    grouped: bool = False,
) -> DataFrame:
    """Search only the probed (query, cluster) pairs: ``probes`` is the
    driver-computed [(query_id, shard)] routing table. The graph scan is
    filtered to the probed clusters (partition pruning on a persisted
    layout); inside the kernel each cluster beams ONLY the queries routed
    to it.

    ``grouped`` has the same contract as ``search_graphs``: False for the
    cached build output (shards whole within partitions, zero shuffle);
    True for a parquet-read graph (catalog path), where the scanner may
    split a shard's file across tasks and one groupBy(shard) shuffle buys
    unconditional adjacency completeness."""
    import pandas as pd

    from vectordb_from_scratch_spark.operators import knn

    Q = _normalize(np.stack(qpdf["query_vec"].to_list()).astype("float64"))
    qids = qpdf["query_id"].to_numpy()
    qpos = {int(q): i for i, q in enumerate(qids)}
    by_shard: dict[int, list[int]] = {}
    for qid, shard in probes:
        by_shard.setdefault(int(shard), []).append(qpos[int(qid)])

    def search_one_shard(shard: int, g: pd.DataFrame) -> pd.DataFrame:
        routed = by_shard.get(int(shard), [])
        out_q: list = []
        out_id: list = []
        out_s: list = []
        if routed:
            g = g.sort_values(id_col).reset_index(drop=True)
            ids = g[id_col].to_list()
            pos = {v: i for i, v in enumerate(ids)}
            Xu = _normalize(np.stack(g[vec_col].to_list()).astype("float64"))
            adj = [[pos[v] for v in nbrs] for nbrs in g["neighbors"].to_list()]
            mask = (
                g["passing"].to_numpy(dtype=bool)
                if "passing" in g.columns
                else None
            )
            for qi in routed:
                res = (
                    _beam(adj, Xu, Q[qi], ef)
                    if mask is None
                    else _beam_filtered(adj, Xu, Q[qi], ef, k, mask)
                )
                sims = np.array([s for s, _ in res])
                nodes = np.array([v for _, v in res])
                sel = knn.local_topk_indices(sims, nodes, k)
                out_q.extend([int(qids[qi])] * len(sel))
                out_id.extend(ids[v] for v in nodes[sel])
                out_s.extend(float(x) for x in sims[sel])
        return pd.DataFrame({"query_id": out_q, id_col: out_id, "score": out_s})

    def search_iter(batches):
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        if pdf.empty:
            return
        for shard, g in pdf.groupby("shard", sort=True):
            yield search_one_shard(int(shard), g)

    pruned = graph.filter(F.col("shard").isin(sorted(by_shard)))
    id_type = graph.schema[id_col].dataType.simpleString()
    out_schema = f"query_id long, {id_col} {id_type}, score double"
    if grouped:
        per_shard = pruned.groupBy("shard").applyInPandas(
            lambda pdf: search_one_shard(int(pdf["shard"].iloc[0]), pdf),
            schema=out_schema,
        )
    else:
        per_shard = pruned.mapInPandas(search_iter, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        per_shard.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, F.round("score", 6).alias("score"), "rank")
    )


_ROUTED_CACHE: dict = {}


def routed_built_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-partitioned graphs over the fixture, sharing the cached
    IVF assignments (one k-means, three consumers: ivf search, SemDeDup,
    routed graphs)."""
    from vectordb_from_scratch_spark.operators import ivf

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _ROUTED_CACHE:
        _, assignments = ivf.built_index(spark, sf_dir)
        emb = load_table(spark, sf_dir, "embeddings")
        joined = emb.join(assignments, "vec_id").withColumnRenamed(
            "cluster_id", "shard"
        )
        g = build_graphs_by(joined, "shard").cache()
        g.count()
        _ROUTED_CACHE[key] = g
    return _ROUTED_CACHE[key]


def routed_build_and_search(
    spark: SparkSession,
    sf_dir: str,
    k: int = DEFAULT_K,
    ef: int = EF_SEARCH,
    n_probes: int = None,
    n_queries: int = N_QUERIES,
) -> DataFrame:
    from vectordb_from_scratch_spark.operators import ivf, knn

    centroids, _ = ivf.built_index(spark, sf_dir)
    qpdf, _ = knn.fixture_query_set(spark, sf_dir, n_queries)
    g = routed_built_graph(spark, sf_dir)
    probes = ivf.probe_clusters(
        centroids,
        list(zip(qpdf["query_id"], qpdf["query_vec"])),
        ivf.DEFAULT_N_PROBES if n_probes is None else n_probes,
    )
    return routed_search(g, qpdf, probes, k=k, ef=ef)


@register("hnsw_search_routed")  # rows-only: k-means + graph build not SQL
def hnsw_search_routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-routed graph search: probe the top clusters, beam only their
    graphs — the bounded-fan-out composition for extreme scale. Recall
    and the all-probes+full-ef == exact invariant are pinned in
    tests/test_ann_recall.py."""
    res = routed_build_and_search(spark, sf_dir)
    return res.select(
        "query_id", "vec_id", "score", F.col("rank").cast("long").alias("rnk")
    )


def routed_search_distributed(
    graph: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = DEFAULT_K,
    ef: int = EF_SEARCH,
    n_probes: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries_hint: int | None = None,
    queries_per_block: int = 4096,
) -> DataFrame:
    """IVF-routed graph search for UNBOUNDED query batches: probes run
    in-plan (``ivf.probe_clusters_df`` — queries ⋈ broadcast centroids →
    rank window), each probed (query, cluster) pair cogroups with that
    cluster's graph, and nothing about the batch ever reaches the
    driver. Query replication is n_probes (each query visits only its
    probed clusters), the graph side is semi-join-pruned to probed
    clusters, and hash-blocking bounds per-task query counts exactly as
    in ``search_graphs_distributed``. Same beams, same tie order — the
    unbounded-Q twin of ``routed_search``."""
    from vectordb_from_scratch_spark.operators import ivf

    if n_probes is None:
        n_probes = ivf.DEFAULT_N_PROBES
    probes = ivf.probe_clusters_df(centroids, queries, n_probes).select(
        F.col("query_id"), F.col("cluster_id").cast("int").alias("shard")
    )
    nq = n_queries_hint if n_queries_hint is not None else queries.count()
    nqb = max(1, -(-int(nq) // queries_per_block))
    routed_q = probes.join(queries, "query_id").select(
        "shard",
        "query_id",
        "query_vec",
        F.pmod(F.xxhash64("query_id"), F.lit(nqb)).cast("int").alias("qblk"),
    )
    gcols = ["shard", id_col, vec_col, "neighbors"] + (
        ["passing"] if "passing" in graph.columns else []
    )
    pruned = graph.join(
        probes.select("shard").distinct(), "shard", "left_semi"
    ).select(
        *gcols,
        F.explode(F.sequence(F.lit(0), F.lit(nqb - 1))).alias("qblk"),
    )
    id_type = graph.schema[id_col].dataType.simpleString()
    per_pair = (
        pruned.groupBy("shard", "qblk")
        .cogroup(routed_q.groupBy("shard", "qblk"))
        .applyInPandas(
            _make_pair_topk(id_col, vec_col, k, ef),
            schema=f"query_id long, {id_col} {id_type}, score double",
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        per_pair.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, F.round("score", 6).alias("score"), "rank")
    )


@register("hnsw_search_routed_bigq")  # rows-only: k-means + graph build not SQL
def hnsw_search_routed_bigq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The routed tier's large-batch exit: in-plan probes + probe-routed
    cogroups, no driver collect anywhere. Equality with the driver-path
    hnsw_search_routed (same probes, same beams) is asserted in
    tests/test_plans.py — the fixture's 10 queries anchor correctness,
    the plan shape carries the unbounded-Q claim."""
    from vectordb_from_scratch_spark.operators import ivf, knn

    centroids, _ = ivf.built_index(spark, sf_dir)
    _, queries = knn.fixture_query_set(spark, sf_dir, N_QUERIES)
    g = routed_built_graph(spark, sf_dir)
    res = routed_search_distributed(
        g, centroids, queries, n_queries_hint=N_QUERIES
    )
    return res.select(
        "query_id", "vec_id", "score", F.col("rank").cast("long").alias("rnk")
    )


# --- bounded sub-sharding (the shard-sizing rule, enforced) ------------------
#
# The 2M measurement (SCALE.md) showed what happens when per-graph
# membership grows with N: build wall grows superlinearly and beam
# recall inside oversized graphs sags. The production rule — hold
# members-per-graph bounded by growing the graph count — as code:
# clusters larger than ``max_members`` split into md5 sub-shards, the
# probe router expands a probed cluster to all its sub-shards, and
# nothing else changes (the union of a cluster's sub-graphs IS the
# cluster, so candidate membership per probe is identical; asserted).

GRAPH_MAX_MEMBERS = 25_000
_SUB_STRIDE = 1 << 20  # composite shard id = cluster * stride + sub


def build_graphs_bounded(
    emb: DataFrame,
    shard_col: str,
    max_members: int = GRAPH_MAX_MEMBERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **kw,
):
    """(graph, nsub): like build_graphs_by but any shard larger than
    ``max_members`` splits into ceil(count/max_members) md5 sub-shards.
    ``nsub`` maps original shard → sub-shard count (what the probe
    router needs). The per-shard counts are one tiny aggregate."""
    import math

    counts = {
        r["s"]: r["c"]
        for r in emb.groupBy(F.col(shard_col).alias("s"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    nsub = {int(s): max(1, math.ceil(c / max_members)) for s, c in counts.items()}
    mapping = emb.sparkSession.createDataFrame(
        [(s, n) for s, n in nsub.items()], "s int, nsub int"
    )
    sub = F.pmod(texthash.hash60(F.col(id_col).cast("string")), F.col("nsub"))
    composite = (
        emb.join(F.broadcast(mapping), emb[shard_col] == F.col("s"))
        .select(
            (F.col(shard_col).cast("long") * _SUB_STRIDE + sub)
            .cast("int")
            .alias("shard"),
            id_col,
            vec_col,
        )
    )
    return build_graphs_by(composite, "shard", id_col=id_col, vec_col=vec_col, **kw), nsub


def expand_probes(probes: list[tuple], nsub: dict) -> list[tuple]:
    """Expand (query_id, cluster) routing to every sub-shard of the
    probed cluster — the union of a cluster's sub-graphs is the cluster,
    so probe semantics are unchanged."""
    out = []
    for qid, shard in probes:
        for j in range(nsub.get(int(shard), 1)):
            out.append((int(qid), int(shard) * _SUB_STRIDE + j))
    return out
