"""Recall@k of the approximate indexes (IVF, LSH) against the exact flat
scan — the invariant the reference never asserts (its e2e tests only check
non-empty results, test_ivf_e2e.py:263-264)."""

import pytest
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.operators import ivf, knn, lsh
from vectordb_from_scratch_spark.session import load_table

K = 10
N_QUERIES = 20


@pytest.fixture(scope="module")
def exact_topk(spark, sf_small):
    emb = load_table(spark, sf_small, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = knn.topk(emb, q, k=K).collect()
    truth = {}
    for r in res:
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])
    return truth


def _recall(approx_rows, truth):
    got = {}
    for r in approx_rows:
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    per_q = [len(got.get(q, set()) & t) / len(t) for q, t in truth.items()]
    return sum(per_q) / len(per_q)


def test_ivf_recall(spark, sf_small, exact_topk):
    """The fixture's neighbors sit at mean cosine ~0.30 (near-random data),
    which bounds what ANY probe-pruned index can recall without scanning
    most of the corpus. Measured on this fixture: n_clusters=16 & probes=8
    → ~0.85; threshold set just below as a regression guard."""
    res = ivf.build_and_search(
        spark, sf_small, k=K, n_probes=8, n_queries=N_QUERIES, n_clusters=16
    )
    r = _recall(res.collect(), exact_topk)
    assert r >= 0.7, f"IVF recall@{K} = {r:.3f} < 0.7 (n_probes=8/16)"


def test_ivf_full_probe_is_exact(spark, sf_small, exact_topk):
    """Probing every cluster must reproduce the exact scan (the rerank is
    exact — approximation comes only from probe pruning)."""
    res = ivf.build_and_search(spark, sf_small, k=K, n_probes=64, n_queries=N_QUERIES)
    r = _recall(res.collect(), exact_topk)
    assert r == 1.0, f"full-probe IVF recall = {r:.3f} != 1.0"


def test_lsh_recall_multiprobe(spark, sf_small, exact_topk):
    """BASELINE.md self-imposed target: LSH recall@10 >= 0.8 vs exact flat,
    asserted on the REGISTERED lsh_search configuration (16 tables × 8 bits,
    1-bit multiprobe — measures ~0.84 on this fixture; the reference's own
    8×16 defaults measure ~0.10 and its tests never assert recall)."""
    res = lsh.build_and_search(
        spark, sf_small, k=K, n_queries=N_QUERIES, n_tables=16, n_bits=8, n_flips=1
    )
    r = _recall(res.collect(), exact_topk)
    assert r >= 0.8, f"LSH recall@{K} = {r:.3f} < 0.8 (BASELINE.md target)"


def test_lsh_reference_defaults_return_results(spark, sf_small):
    """Reference-parity smoke at its own defaults (8 tables × 16 bits):
    non-empty results with self-match at rank 1 — the exact strength of the
    reference's own assertion (test_lsh_simhash_e2e.py:128-131)."""
    res = lsh.build_and_search(spark, sf_small, k=K, n_queries=5).collect()
    assert res, "no results"
    top1 = {r["query_id"]: r["vec_id"] for r in res if r["rank"] == 1}
    assert all(q == v for q, v in top1.items())


def test_sq8_recall(spark, sf_small, exact_topk):
    """int8 scalar quantization loses ~log2(amax/127) bits of mantissa per
    element; on unit-scale data the quantized cosine ordering should agree
    with the float scan for nearly all of the top-k — well above what
    probe-pruned indexes manage, because SQ8 still scans everything."""
    from vectordb_from_scratch_spark.operators import quantization

    emb = load_table(spark, sf_small, "embeddings")
    enc = quantization.sq8_encode(emb)
    qpdf = (
        enc.filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), "codes", "norm2")
        .toPandas()
    )
    qpdf["codes"] = qpdf["codes"].map(list)
    res = quantization.sq8_topk_pandas(enc, qpdf, k=K)
    r = _recall(res.collect(), exact_topk)
    assert r >= 0.9, f"SQ8 recall@{K} = {r:.3f} < 0.9"


def test_pq_recall(spark, sf_small, exact_topk):
    """PQ (8×8-dim subspaces, 256 codes) + shortlist-100 exact rerank must
    recover nearly all of the exact top-10: the ADC shortlist only needs
    the true neighbors somewhere in its top-100 of a 500-vector corpus,
    then the rerank restores exact ordering."""
    from vectordb_from_scratch_spark.operators import pq

    res = pq.build_and_search(spark, sf_small, k=K, n_queries=N_QUERIES, shortlist=100)
    r = _recall(res.collect(), exact_topk)
    assert r >= 0.9, f"PQ recall@{K} = {r:.3f} < 0.9 (shortlist=100)"


def test_pq_full_shortlist_is_exact(spark, sf_small, exact_topk):
    """A shortlist as large as the corpus must reproduce the exact scan —
    approximation comes only from shortlist pruning, never the rerank."""
    from vectordb_from_scratch_spark.operators import pq

    res = pq.build_and_search(spark, sf_small, k=K, n_queries=N_QUERIES, shortlist=10**6)
    r = _recall(res.collect(), exact_topk)
    assert r == 1.0, f"full-shortlist PQ recall = {r:.3f} != 1.0"


def test_pandas_topk_matches_expr_topk(spark, sf_small):
    """The BLAS scale path must agree with the expression path exactly
    (same scores mod float assoc, same ids)."""
    emb = load_table(spark, sf_small, "embeddings")
    qpdf = (
        emb.filter(F.col("vec_id") < 5)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
        .toPandas()
    )
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    a = {(r["query_id"], r["vec_id"]) for r in knn.topk(emb, q, k=K).collect()}
    b = {(r["query_id"], r["vec_id"]) for r in knn.topk_pandas(emb, qpdf, k=K).collect()}
    assert a == b


def test_blocked_neardup_recovers_top_pairs(spark, sf_small):
    """The LSH-blocked all-pairs path must recover most of the exact
    top-20 pairs — high-cosine pairs are exactly the ones LSH makes
    collide, so recall here should beat point-query recall."""
    from vectordb_from_scratch_spark.operators.dedup import (
        embedding_pairs_blocked,
        embedding_pairs_topk,
    )
    from vectordb_from_scratch_spark.session import load_table as lt

    emb = lt(spark, sf_small, "embeddings")
    exact = {(r["vec_a"], r["vec_b"]) for r in embedding_pairs_topk(emb, k=20).collect()}
    blocked = {
        (r["vec_a"], r["vec_b"]) for r in embedding_pairs_blocked(emb, k=20).collect()
    }
    recall = len(exact & blocked) / len(exact)
    assert recall >= 0.6, f"blocked near-dup pair recall = {recall:.2f}"


def test_blocked_seg_pairs_topk_paths_agree():
    """The bucket-pair kernel keeps the pinned total order (score desc,
    a asc, b asc — VERDICT r2 #3's discipline) on BOTH its code paths:
    the direct triangle (small buckets) and the chunked threshold
    selection (hot buckets) must produce identical top-k for the same
    input, including at score ties."""
    import numpy as np

    from vectordb_from_scratch_spark.operators.dedup import _seg_pairs_topk

    rng = np.random.default_rng(3)
    # clustered codes => plenty of exact integer-score ties
    base = rng.integers(-3, 4, size=(40, 8)).astype("float64")
    Bm = np.repeat(base, 20, axis=0)  # 800 rows, heavy duplication
    bid = np.arange(800, dtype="int64")
    bn2 = np.einsum("ij,ij->i", Bm, Bm)

    a1, b1, s1 = _seg_pairs_topk(Bm[:500], bid[:500], bn2[:500], 10)  # direct
    a2, b2, s2 = _seg_pairs_topk(Bm[:500].copy(), bid[:500], bn2[:500], 10)
    assert list(a1) == list(a2) and list(b1) == list(b2)

    # same 600-row input through both paths: force chunked by size (>512)
    full = _seg_pairs_topk(Bm[:600], bid[:600], bn2[:600], 10)
    # reference: brute-force with the pinned order
    G = Bm[:600] @ Bm[:600].T
    denom = np.sqrt(np.outer(bn2[:600], bn2[:600]))
    S = np.where(denom > 0, G / np.where(denom == 0, 1.0, denom), 0.0)
    iu, ju = np.triu_indices(600, k=1)
    aa, bb, ss = bid[iu], bid[ju], S[iu, ju]
    order = np.lexsort((bb, aa, -ss))[:10]
    assert list(full[0]) == list(aa[order])
    assert list(full[1]) == list(bb[order])
    assert np.allclose(full[2], ss[order])


def test_corpus_stats_cache(sf_small):
    """Parquet-footer stats must match the actual table and be cached
    under a source-fingerprinted key (path + mtime + size), so an
    in-place regeneration can never serve stale stats."""
    import os

    from vectordb_from_scratch_spark.operators import dedup

    dedup._GUARD_STATS_CACHE.clear()
    n, dims = dedup.embedding_corpus_stats(sf_small)
    assert n > 0 and dims == 64
    st = os.stat(os.path.join(str(sf_small), "embeddings.parquet"))
    key = (str(sf_small), st.st_mtime_ns, st.st_size)
    assert dedup._GUARD_STATS_CACHE[key] == (n, dims)


def test_neardup_auto_routes_by_corpus_size(spark, sf_small):
    """The size guard (VERDICT #5): under the broadcast threshold the auto
    router must produce EXACTLY the exact kernel's top-k; forced over the
    threshold it must produce exactly the blocked kernel's top-k."""
    from vectordb_from_scratch_spark.operators.dedup import (
        embedding_pairs_auto,
        embedding_pairs_blocked,
        embedding_pairs_topk,
    )
    from vectordb_from_scratch_spark.session import load_table as lt

    emb = lt(spark, sf_small, "embeddings")
    key = lambda rows: [(r["vec_a"], r["vec_b"], r["score"], r["rnk"]) for r in rows]

    exact = key(embedding_pairs_topk(emb, k=20).collect())
    routed_small = key(embedding_pairs_auto(emb, k=20).collect())
    assert routed_small == exact  # fixture is under the default threshold

    blocked = key(embedding_pairs_blocked(emb, k=20).collect())
    routed_big = key(embedding_pairs_auto(emb, k=20, max_broadcast_bytes=1).collect())
    assert routed_big == blocked  # past the threshold: the scale path


def test_ivfpq_recall(spark, sf_small, exact_topk):
    """Composed IVF probe + PQ ADC + rerank: recall is bounded by the IVF
    probe (the ADC shortlist only reorders within probed clusters), so the
    threshold matches the IVF-alone guarantee."""
    from vectordb_from_scratch_spark.operators import pq

    res = pq.ivfpq_search_df(
        spark, sf_small, k=K, n_probes=32, n_queries=N_QUERIES, shortlist=100
    )
    r = _recall(res.collect(), exact_topk)
    assert r >= 0.8, f"IVFPQ recall@{K} = {r:.3f} < 0.8 (probes=32/64)"


def test_ivfpq_full_probe_full_shortlist_is_exact(spark, sf_small, exact_topk):
    from vectordb_from_scratch_spark.operators import pq

    res = pq.ivfpq_search_df(
        spark, sf_small, k=K, n_probes=64, n_queries=N_QUERIES, shortlist=10**6
    )
    r = _recall(res.collect(), exact_topk)
    assert r == 1.0, f"full IVFPQ recall = {r:.3f} != 1.0"


def test_sq8_encoders_identical(spark, sf_small):
    """The Arrow-kernel encoder and the expression encoder must emit
    IDENTICAL codes (same IEEE double ops: divide, multiply, floor) — the
    scale path may never drift from the oracle-checked one."""
    from vectordb_from_scratch_spark.operators import quantization as qz

    emb = load_table(spark, sf_small, "embeddings")
    a = {r["vec_id"]: (tuple(r["codes"]), r["norm2"]) for r in qz.sq8_encode(emb).collect()}
    b = {
        r["vec_id"]: (tuple(r["codes"]), r["norm2"])
        for r in qz.sq8_encode_pandas(emb).collect()
    }
    assert a == b


def test_cascade_recall(spark, sf_small, exact_topk):
    """Binary→SQ8→exact funnel: with a 200-wide Hamming prefilter on a
    500-vector corpus the funnel should recover nearly all of the exact
    top-10 (both pruning tiers are generous at fixture scale)."""
    from vectordb_from_scratch_spark.operators import knn, quantization

    qpdf, _ = knn.fixture_query_set(spark, sf_small, N_QUERIES)
    res = quantization.cascade_search(
        load_table(spark, sf_small, "embeddings"), qpdf, k=K, prefilter=200
    )
    r = _recall(res.collect(), exact_topk)
    assert r >= 0.85, f"cascade recall@{K} = {r:.3f} < 0.85"


def test_cascade_full_prefilter_matches_sq8(spark, sf_small, exact_topk):
    """prefilter == corpus disables tier 1; the funnel then equals the
    SQ8 ordering reranked exact — recall must match the SQ8 tier's."""
    from vectordb_from_scratch_spark.operators import knn, quantization

    qpdf, _ = knn.fixture_query_set(spark, sf_small, N_QUERIES)
    res = quantization.cascade_search(
        load_table(spark, sf_small, "embeddings"), qpdf, k=K, prefilter=10**6
    )
    r = _recall(res.collect(), exact_topk)
    assert r >= 0.9, f"no-prefilter cascade recall@{K} = {r:.3f} < 0.9"


def test_mmr_diversifies_and_stays_deterministic(spark, sf_small):
    """MMR must (a) be idempotent across runs, (b) keep the top-1 (pure
    relevance at the first pick), and (c) actually reorder vs plain
    top-k for at least one query at λ=0.5 (otherwise the penalty term is
    dead code on this fixture)."""
    from vectordb_from_scratch_spark.operators import knn
    from vectordb_from_scratch_spark.operators.search_ext import mmr_rerank

    emb = load_table(spark, sf_small, "embeddings")
    qpdf, queries_df = knn.fixture_query_set(spark, sf_small, 10)
    short = knn.topk(emb, queries_df, k=50)
    cand = short.select("query_id", "vec_id").join(
        emb.select("vec_id", "embedding"), "vec_id"
    )
    run1 = {(r["query_id"], r["mmr_rank"]): r["vec_id"]
            for r in mmr_rerank(cand, qpdf, k=10, lam=0.5).collect()}
    run2 = {(r["query_id"], r["mmr_rank"]): r["vec_id"]
            for r in mmr_rerank(cand, qpdf, k=10, lam=0.5).collect()}
    assert run1 == run2
    plain = {(r["query_id"], r["rank"]): r["vec_id"] for r in short.collect()}
    for q in {k[0] for k in run1}:
        assert run1[(q, 1)] == plain[(q, 1)]  # first pick is pure relevance
    assert any(
        run1[(q, r)] != plain[(q, r)]
        for q, r in run1
        if (q, r) in plain and r > 1
    )


def test_blocked_neardup_partitioning_invariant(spark, sf_small):
    """The bucket-group design must produce IDENTICAL output under any
    input partitioning: bucket contents are a pure function of the data,
    per-bucket scoring uses the pinned tie order, and the shortlist/
    rerank are globally ordered. A partitioning-dependent result would
    mean a batch-boundary or chunk-boundary leak in the kernel."""
    from vectordb_from_scratch_spark.operators.dedup import embedding_pairs_blocked
    from vectordb_from_scratch_spark.session import load_table

    emb = load_table(spark, sf_small, "embeddings")
    a = sorted(
        tuple(r) for r in embedding_pairs_blocked(emb.repartition(3), k=20).collect()
    )
    b = sorted(
        tuple(r) for r in embedding_pairs_blocked(emb.repartition(17), k=20).collect()
    )
    assert a == b and len(a) == 20


# --- sharded graph (HNSW-family) ---------------------------------------------


def test_hnsw_full_ef_is_exact(spark, sf_small, exact_topk):
    """With ef >= shard size the beam cannot evict and the NSW insert
    rule keeps each shard connected, so full-beam sharded search must
    EQUAL the exact flat scan rank for rank — approximation comes only
    from beam pruning, exactly the IVF full-probe discipline."""
    from vectordb_from_scratch_spark.operators import hnsw, knn

    qpdf, _ = knn.fixture_query_set(spark, sf_small, N_QUERIES)
    g = hnsw.built_graph(spark, sf_small)
    res = hnsw.search_graphs(g, qpdf, k=K, ef=10**6)
    r = _recall(res.collect(), exact_topk)
    assert r == 1.0, f"full-ef sharded graph recall = {r:.3f} != 1.0"


def test_pca_reduced_ivf_recall_curve(spark, sf_small):
    """The reduced-dim index composition (VERDICT r8 #6): recall@10 of
    IVF-over-PCA-reduced vectors vs the full-dim exact scan must be
    (weakly) monotone in r and above the BASELINE.md floors — on this
    flat-spectrum fixture the honest curve is LOW (≈0.22/0.31/0.48),
    and the guard pins that the measurement keeps telling the truth,
    not that compaction magically works where the spectrum says it
    can't."""
    from vectordb_from_scratch_spark import registry
    from vectordb_from_scratch_spark.operators import pca

    rows = pca.eval_pca_ivf_recall(spark, sf_small).collect()
    by_r = {}
    for r in rows:
        by_r.setdefault(r["r"], []).append(r["overlap_at_k"])
    assert sorted(by_r) == sorted(pca.PCA_INDEX_RS)
    rec = {r: sum(v) / (len(v) * pca.PCA_RECALL_K) for r, v in by_r.items()}
    floors = {8: 0.10, 16: 0.15, 32: 0.30}
    for r, floor in floors.items():
        assert rec[r] >= floor, (r, rec)
    assert rec[8] <= rec[16] + 0.05 and rec[16] <= rec[32] + 0.05, rec
    registry.release_tracked()


def test_pca_route_rerank_matches_full_dim_route(spark, sf_small):
    """The constructive composition: routing in r-dim PCA space with
    full-dim exact rerank must land within 0.1 recall of the FULL-DIM
    route under the identical (n_clusters, n_probes) config — i.e. the
    compacted coarse quantizer is ~free — and far above the
    reduced-SCORING curve (which test_pca_reduced_ivf_recall_curve pins
    at 0.22–0.48 on this corpus)."""
    from vectordb_from_scratch_spark import registry
    from vectordb_from_scratch_spark.operators import pca

    rows = pca.eval_pca_route_rerank(spark, sf_small).collect()
    by_r = {}
    for r in rows:
        by_r.setdefault(r["r"], []).append(r["overlap_at_k"])
    rec = {r: sum(v) / (len(v) * pca.PCA_RECALL_K) for r, v in by_r.items()}
    assert sorted(by_r) == sorted((*pca.PCA_INDEX_RS, pca.DIMS))
    full = rec[pca.DIMS]
    assert full >= 0.6, rec
    for r in pca.PCA_INDEX_RS:
        assert rec[r] >= full - 0.1, (r, rec)
        assert rec[r] >= 0.6, (r, rec)
    registry.release_tracked()


def test_filtered_beam_kernel_guarantee():
    """`hnsw._beam_filtered` contract (VERDICT r8 #1), pinned at the
    kernel: for ANY mask it returns at least min(k, n_passing) results
    (full beam, or a proof-of-exhaustion traversal of the reachable
    component — which the lifeline rule makes the whole shard), and at
    ef >= n its top-k EQUALS the brute-force filtered ranking under the
    exact global tie order (score DESC, node ASC). Clustered vectors so
    navigation must cross non-passing regions."""
    import numpy as np

    from vectordb_from_scratch_spark.operators import hnsw

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((4, 16))
    X = np.concatenate(
        [c + 0.15 * rng.standard_normal((50, 16)) for c in centers]
    )
    Xu = X / np.linalg.norm(X, axis=1, keepdims=True)
    adj = hnsw._build_shard_graph_batched(Xu, hnsw.M, hnsw.M_MAX, hnsw.EF_CONSTRUCTION)
    n, k = len(Xu), 10
    for seed, frac in ((0, 0.5), (1, 0.1), (2, 0.03)):
        mask = np.random.default_rng(seed).random(n) < frac
        if not mask.any():
            continue
        q = Xu[int(np.flatnonzero(mask)[0])]  # a passing node's own vector
        for ef in (4, hnsw.EF_SEARCH, n):
            res = hnsw._beam_filtered(adj, Xu, q, ef, k, mask)
            assert len(res) >= min(k, int(mask.sum())), (frac, ef, len(res))
            assert all(mask[v] for _, v in res)
        res = sorted(hnsw._beam_filtered(adj, Xu, q, n, k, mask),
                     key=lambda t: (-t[0], t[1]))[:k]
        sims = Xu[mask] @ q
        nodes = np.flatnonzero(mask)
        order = np.lexsort((nodes, -sims))[:k]
        assert [v for _, v in res] == [int(nodes[i]) for i in order]


def test_hnsw_recall_at_default_ef(spark, sf_small, exact_topk):
    """Default ef=64 over the fixture shards: measured 1.0 (shards are
    small); guard pinned at 0.9 so a graph-quality regression (degree
    collapse, broken reverse edges) fails loudly."""
    from vectordb_from_scratch_spark.operators import hnsw

    res = hnsw.build_and_search(spark, sf_small, k=K, n_queries=N_QUERIES)
    r = _recall(res.collect(), exact_topk)
    assert r >= 0.9, f"sharded graph recall@{K} = {r:.3f} < 0.9"


def test_hnsw_build_deterministic(spark, sf_small):
    """The graph is a pure function of the corpus: two independent builds
    (cache bypassed) produce identical adjacency — insert order and all
    tie-breaks are pinned, so partitioning and scheduling can't leak in."""
    from vectordb_from_scratch_spark.operators import hnsw
    from vectordb_from_scratch_spark.session import load_table

    emb = load_table(spark, sf_small, "embeddings")

    def adjacency(df):
        return {
            r["vec_id"]: tuple(r["neighbors"])
            for r in hnsw.build_graphs(df).collect()
        }

    a = adjacency(emb)
    b = adjacency(emb.repartition(5, F.col("label")))
    assert a == b


def test_eval_ann_ndcg_consistent_with_pinned_recall(spark, sf_small):
    """The eval operator's numbers must agree with the BASELINE.md pinned
    SQ8 contract: mean recall@10 >= 0.9, nDCG in [0, 1] and >= recall's
    floor (binary-relevance nDCG can't be 0 when recall is positive)."""
    from vectordb_from_scratch_spark.operators.evalmetrics import eval_ann_ndcg

    rows = eval_ann_ndcg(spark, sf_small).collect()
    assert rows
    mean_rec = sum(r["recall_at_k"] for r in rows) / len(rows)
    assert mean_rec >= 0.9, mean_rec
    for r in rows:
        assert 0.0 <= r["ndcg_at_k"] <= 1.0
        assert (r["ndcg_at_k"] > 0) == (r["recall_at_k"] > 0)


def test_hnsw_routed_all_probes_full_ef_is_exact(spark, sf_small, exact_topk):
    """IVF-routed graph search: probing EVERY cluster at full ef must
    equal the exact scan — the approximation decomposes into exactly two
    knobs (probe count, beam width), each with its own exactness limit."""
    from vectordb_from_scratch_spark.operators import hnsw

    res = hnsw.routed_build_and_search(
        spark, sf_small, k=K, ef=10**6, n_probes=10**6, n_queries=N_QUERIES
    )
    r = _recall(res.collect(), exact_topk)
    assert r == 1.0, f"all-probes full-ef routed recall = {r:.3f} != 1.0"


def test_hnsw_routed_matches_ivf_at_same_probes(spark, sf_small, exact_topk):
    """Default 8/64 probes: the routed graph searches exactly the
    clusters IVF probes, and at fixture cluster sizes (~8 members,
    ef=64) the beam is exhaustive — so the routed result must EQUAL the
    IVF result pair-for-pair. The probe ceiling (0.615 measured on this
    near-random fixture at a 12.5% scan fraction) belongs to IVF's
    contract, not the graph's; the graph's own knob is covered by the
    full-ef invariant above."""
    from vectordb_from_scratch_spark.operators import hnsw, ivf

    routed = hnsw.routed_build_and_search(spark, sf_small, k=K, n_queries=N_QUERIES)
    via_ivf = ivf.build_and_search(spark, sf_small, k=K, n_queries=N_QUERIES)
    got = {(r["query_id"], r["rank"], r["vec_id"]) for r in routed.collect()}
    want = {(r["query_id"], r["rank"], r["vec_id"]) for r in via_ivf.collect()}
    assert got == want
    r = _recall(routed.collect(), exact_topk)
    assert r >= 0.5, f"probe-ceiling sanity: routed recall@{K} = {r:.3f}"


def test_hnsw_bounded_subshards_preserve_probe_semantics(spark, sf_small, exact_topk):
    """The shard-sizing rule as code: forcing a tiny max_members splits
    clusters into sub-graphs whose sizes respect the bound (within hash
    slack), and because a cluster's sub-graphs union to the cluster, the
    expanded-probe full-ef search still EQUALS the exact scan when every
    cluster is probed — sub-sharding changes wall-clock shape only,
    never candidates."""
    from pyspark.sql import functions as F2

    from vectordb_from_scratch_spark.operators import hnsw, ivf, knn
    from vectordb_from_scratch_spark.session import load_table

    centroids, assignments = ivf.built_index(spark, sf_small)
    emb = load_table(spark, sf_small, "embeddings")
    joined = emb.join(assignments, "vec_id").withColumnRenamed("cluster_id", "shard")
    g, nsub = hnsw.build_graphs_bounded(joined, "shard", max_members=10)
    g = g.cache()
    sizes = {r["shard"]: r["c"] for r in g.groupBy("shard").agg(F2.count(F2.lit(1)).alias("c")).collect()}
    assert any(n > 1 for n in nsub.values()), "bound must actually split"
    assert max(sizes.values()) <= 3 * 10, sizes  # md5 slack on tiny groups

    qpdf, _ = knn.fixture_query_set(spark, sf_small, N_QUERIES)
    all_probes = [
        (int(q), int(c))
        for q in qpdf["query_id"]
        for c in {r["cluster_id"] for r in centroids.select("cluster_id").collect()}
    ]
    res = hnsw.routed_search(
        g, qpdf, hnsw.expand_probes(all_probes, nsub), k=K, ef=10**6
    )
    r = _recall(res.collect(), exact_topk)
    assert r == 1.0, f"bounded all-probes full-ef recall = {r:.3f} != 1.0"


def test_blockjoin_tie_rule_on_duplicate_heavy_corpus(spark):
    """The block kernel's argpartition boundary-tie rule under maximal
    stress: a corpus of repeated vectors puts every score in a tie group,
    so which ids survive the per-block cap is decided ENTIRELY by the
    deterministic lowest-id rule — results must equal the expression
    path's global (score DESC, id ASC) window, rank for rank."""
    import numpy as np

    from vectordb_from_scratch_spark.operators import knn

    # one-hot base vectors: every cosine is EXACTLY 0.0 or 1.0 in both
    # engines and in every BLAS block (gaussian duplicates would give
    # ulp-distinct scores across blocks — float ranking is only
    # cross-engine-stable when the dots are exactly representable, the
    # same reason the fixture embeds integer-valued vectors)
    base = np.eye(8)[:5]
    rows = [(i, [float(x) for x in base[i // 12]]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(3)],
        "query_id long, query_vec array<double>",
    )
    want = [
        (r.query_id, r.vec_id, r.rank)
        for r in knn.topk(df, queries, k=15).collect()
    ]
    got = [
        (r.query_id, r.vec_id, r.rank)
        for r in knn.topk_blockjoin(
            df,
            queries,
            k=15,
            n_corpus_hint=60,
            n_queries_hint=3,
            rows_per_block=7,
            queries_per_block=2,
        ).collect()
    ]
    # the k boundary lands INSIDE the exact 0.0 tie group (48 zero-scored
    # rows for 3 remaining slots) — the per-block cut must pick lowest ids
    assert sorted(got) == sorted(want) and len(got) == 45


def test_pq_blockjoin_tie_rule_on_duplicate_codes(spark):
    """PQ's block kernel hits exact ADC ties whenever two corpus rows
    share codes — guaranteed here by duplicating vectors — and the
    per-block shortlist cut must resolve them by lowest id, identically
    to the broadcast-LUT path."""
    import numpy as np
    import pandas as pd

    from vectordb_from_scratch_spark.operators import pq

    rng = np.random.default_rng(4)
    base = rng.standard_normal((6, 16))
    rows = [(i, [float(x) for x in base[i // 10]]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = pq.train_codebooks(df, m=4, k=8, n_hint=60)
    codes = pq.encode(df, books).cache()
    codes.count()
    qpdf = pd.DataFrame(
        {"query_id": range(3), "query_vec": [list(map(float, base[i])) for i in range(3)]}
    )
    queries = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(3)],
        "query_id long, query_vec array<double>",
    )
    want = sorted(
        (r.query_id, r.vec_id, r.rank)
        for r in pq.search(df, codes, books, qpdf, k=12, shortlist=20).collect()
    )
    got = sorted(
        (r.query_id, r.vec_id, r.rank)
        for r in pq.search_blockjoin(
            df,
            codes,
            books,
            queries,
            k=12,
            shortlist=20,
            n_corpus_hint=60,
            n_queries_hint=3,
            rows_per_block=9,
            queries_per_block=2,
        ).collect()
    )
    assert got == want and len(got) == 36
