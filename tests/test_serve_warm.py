"""The *_prebuilt serve twins' warm-cache contract (VERDICT r3 item 4 /
ADVICE r3): under registry.STRICT_SERVE a cold build cache raises instead
of silently training inside what bench.py times as "serve cost"; after
the registered warmer runs, the serve call succeeds and touches no
training path. Default (lenient) mode still builds on demand — the
driver's correctness harness may invoke a prebuilt query standalone."""

import pytest

from vectordb_from_scratch_spark import registry
from vectordb_from_scratch_spark.operators import hnsw, ivf, lsh, pq, textstats

CASES = [
    ("ivf_search_prebuilt", ivf, "_BUILD_CACHE"),
    ("lsh_search_prebuilt", lsh, "_BUILD_CACHE"),
    ("pq_search_prebuilt", pq, "_BUILD_CACHE"),
    ("ivfpq_search_prebuilt", pq, "_IVFPQ_CACHE"),
    ("hnsw_search_prebuilt", hnsw, "_BUILD_CACHE"),
    ("text_bm25_search_prebuilt", textstats, "_BM25_INDEX_CACHE"),
]


@pytest.fixture
def strict_serve():
    registry.STRICT_SERVE = True
    yield
    registry.STRICT_SERVE = False


@pytest.mark.parametrize("name,mod,cache_attr", CASES)
def test_prebuilt_raises_cold_under_strict(
    spark, sf_small, strict_serve, name, mod, cache_attr
):
    cache = getattr(mod, cache_attr)
    saved = dict(cache)
    cache.clear()
    if cache_attr == "_IVFPQ_CACHE":
        # ivfpq composes pq: its own co-location cache is the guard key
        pq._BUILD_CACHE.clear()
    try:
        with pytest.raises(RuntimeError, match="cold build cache"):
            registry.QUERIES[name](spark, sf_small)
    finally:
        cache.update(saved)


def test_warmers_registered_for_every_prebuilt_query():
    prebuilt = [n for n in registry.QUERIES if n.endswith("_prebuilt")]
    assert prebuilt, "expected prebuilt serve twins to be registered"
    missing = [n for n in prebuilt if n not in registry.WARMERS]
    assert not missing, f"prebuilt queries without a warmer: {missing}"


@pytest.mark.parametrize("name,mod,cache_attr", CASES)
def test_warm_then_serve_does_not_train(
    spark, sf_small, strict_serve, monkeypatch, name, mod, cache_attr
):
    """After the warmer, the timed serve call must complete WITHOUT
    touching any training entry point — monkeypatch them to explode."""
    registry.WARMERS[name](spark, sf_small)

    def boom(*a, **k):
        raise AssertionError("serve path invoked a build/train function")

    monkeypatch.setattr(ivf, "train_centroids", boom)
    monkeypatch.setattr(pq, "train_codebooks", boom)
    monkeypatch.setattr(lsh, "compute_buckets", boom)
    # bm25 serve must read the persisted postings, never re-tokenize documents
    monkeypatch.setattr(textstats, "load_table", boom)
    assert registry.QUERIES[name](spark, sf_small).count() > 0


def test_graph_artifacts_raise_cold_under_strict(spark, sf_small, strict_serve):
    """The r6 graph-store artifacts (adjacencies, purchase table) carry
    the same warm/serve contract as the ANN build caches: under
    STRICT_SERVE an artifact-consuming query must refuse to derive its
    adjacency inside the timed region."""
    from vectordb_from_scratch_spark.operators import graph

    saved_e = dict(graph._EDGES_CACHE)
    saved_a = dict(graph._ART_CACHE)
    saved_p = dict(graph._PURCHASES_CACHE)
    graph._EDGES_CACHE.clear()
    graph._ART_CACHE.clear()
    graph._PURCHASES_CACHE.clear()
    try:
        for name in ("graph_pagerank", "graph_bfs_hops", "graph_hits"):
            with pytest.raises(RuntimeError, match="cold build cache"):
                registry.QUERIES[name](spark, sf_small)
    finally:
        graph._EDGES_CACHE.update(saved_e)
        graph._ART_CACHE.update(saved_a)
        graph._PURCHASES_CACHE.update(saved_p)


def test_graph_artifacts_warm_then_serve(spark, sf_small, strict_serve, monkeypatch):
    """After warm_graph, the artifact consumers serve without re-deriving
    anything corpus-shaped: the edge/purchase derivations are
    monkeypatched to explode."""
    from vectordb_from_scratch_spark.operators import graph

    names = (
        "graph_pagerank",
        "graph_pagerank_weighted",
        "graph_ppr",
        "graph_bfs_hops",
        "graph_lpa_communities",
        "graph_kcore",
        "graph_sssp_weighted",
        "graph_triangle_counts",
        "graph_hits",
        "graph_recommendations",
    )
    # r7: warming is PER QUERY (each warms only the artifact kinds it
    # consumes — ADVICE r6 #2), so every query under test runs its own
    # warmer before the derivations are booby-trapped
    for name in names:
        registry.WARMERS[name](spark, sf_small)

    def boom(*a, **k):
        raise AssertionError("serve path re-derived a graph artifact")

    monkeypatch.setattr(graph, "copurchase_edges", boom)
    monkeypatch.setattr(graph, "purchase_edges", boom)
    monkeypatch.setattr(graph, "oriented_edges", boom)
    monkeypatch.setattr(graph, "_adj_from", boom)
    for name in names:
        n = registry.QUERIES[name](spark, sf_small).count()
        # kcore legitimately peels the sf0.001 graph to empty (K=80 is
        # calibrated to the bigger fixtures); the serve contract here is
        # "ran without touching a derivation", not non-emptiness
        assert n > 0 or name == "graph_kcore", name
        registry.release_tracked()


@pytest.mark.parametrize(
    "name,mod,cache_attr",
    [
        ("graph_ktruss_warm", None, "_TRUSS_BASE_CACHE"),
        ("dedup_minhash_delta_warm", None, "_MINHASH_BASE_CACHE"),
    ],
)
def test_incremental_warm_twins_contract(
    spark, sf_small, strict_serve, name, mod, cache_attr
):
    """The r10 warm-regime twins (VERDICT r9 #1): cold cache raises under
    STRICT_SERVE; after the warmer, the twin returns EXACTLY the cold
    composition's rows (the delta fold is the same arithmetic — only
    where the base state comes from differs)."""
    from vectordb_from_scratch_spark.operators import dedup, graph

    mod = graph if name.startswith("graph") else dedup
    cache = getattr(mod, cache_attr)
    saved = dict(cache)
    cache.clear()
    try:
        with pytest.raises(RuntimeError, match="cold build cache"):
            registry.QUERIES[name](spark, sf_small)
        registry.WARMERS[name](spark, sf_small)
        got = sorted(map(tuple, registry.QUERIES[name](spark, sf_small).collect()))
        registry.release_tracked()
        cold_name = (
            "graph_ktruss_incremental"
            if name.startswith("graph")
            else "dedup_minhash_incremental"
        )
        want = sorted(
            map(tuple, registry.QUERIES[cold_name](spark, sf_small).collect())
        )
        registry.release_tracked()
        assert got == want and got
    finally:
        cache.clear()
        cache.update(saved)
