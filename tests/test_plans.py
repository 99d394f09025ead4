"""Plan-property regression tests: the scale guarantees each headline
operator claims must be VISIBLE in its physical plan. A refactor that
silently turns a broadcast into a sort-merge, loses a pushed filter, or
starts shuffling full windows fails here, not in a 100 TB incident."""

from __future__ import annotations

import pytest

from vectordb_from_scratch_spark import plans, registry


@pytest.fixture(scope="module")
def q(spark, sf_oracle):
    def build(name):
        return registry.QUERIES[name](spark, sf_oracle)

    return build


def test_knn_topk_limits_window_before_shuffle(q):
    df = q("knn_cosine_topk")
    # rank<=k must prune map-side: the corpus never shuffles whole
    assert plans.has_window_group_limit(df)
    # queries joined by broadcast, not shuffled against the corpus
    assert plans.has_broadcast_join(df)


def test_knn_filter_pushdown_reaches_scan(q):
    pushed = " ".join(plans.pushed_filters(q("knn_cosine_filtered")))
    assert "LessThan(label,5" in pushed  # metadata filter at the parquet scan


def test_tpch_q3_all_dims_broadcast_no_sortmerge(q):
    df = q("tpch_q3_shipping_priority")
    assert plans.count(df, "BroadcastHashJoin") >= 2
    assert plans.count(df, "SortMergeJoin") == 0
    pushed = " ".join(plans.pushed_filters(df))
    assert "c_mktsegment" in pushed and "o_orderdate" in pushed


def test_tpch_q1_prunes_columns(q):
    # 7-column aggregate over a 11-column table: scan must not read the rest
    schemas = plans.scan_read_schemas(q("tpch_q1_pricing_summary"))
    assert schemas and all("l_partkey" not in s and "l_suppkey" not in s for s in schemas)


def test_q4_semi_join_stays_semi(q):
    df = q("tpch_q4_order_priority")
    assert "LeftSemi" in plans.physical_plan(df)
    schemas = plans.scan_read_schemas(df)
    # lineitem side reads exactly the 2 join columns
    assert any("l_orderkey" in s and "l_extendedprice" not in s for s in schemas)


def test_asof_join_single_shuffle_no_join_operator(q):
    df = q("events_asof_last_view")
    p = plans.physical_plan(df)
    # the union+window as-of has NO join operator at all; state is carried
    # by one window over one hash exchange on the key
    assert "Join" not in p
    assert plans.n_shuffles(df) <= 2  # key exchange (+ AQE final coalesce)


def test_range_join_is_plain_equi_join(q):
    df = q("events_range_pairs")
    p = plans.physical_plan(df)
    assert "BroadcastNestedLoop" not in p and "CartesianProduct" not in p


def test_ivf_assignment_is_single_pass_no_shuffle(spark, sf_oracle):
    from vectordb_from_scratch_spark.operators import ivf
    from vectordb_from_scratch_spark.session import load_table

    emb = load_table(spark, sf_oracle, "embeddings")
    centroids = ivf.train_centroids(emb, n_clusters=8)
    assignments = ivf.assign(emb, centroids)
    p = plans.physical_plan(assignments)
    # centroid matrix rides inside the Arrow kernel: one scan, no join, no
    # shuffle of embeddings
    assert "MapInPandas" in p and plans.n_shuffles(assignments) == 0, p


def test_bm25_topk_is_distributed_take_ordered(q):
    df = q("text_bm25_search")
    p = plans.physical_plan(df)
    # global top-10 must be per-partition heaps (TakeOrderedAndProject),
    # never a single-partition window over the full candidate set
    assert "TakeOrderedAndProject" in p


def test_blockjoin_knn_cogroups_and_matches_blas_path(spark, sf_oracle):
    """>10⁵-query exit for flat k-NN: both sides blocked and cogrouped
    (FlatMapCoGroupsInPandas in the plan — no broadcast of queries, no
    query matrix in any closure), results identical to the broadcast BLAS
    path, and the auto-dispatcher routes Spark-DataFrame batches past the
    threshold to it."""
    from pyspark.sql import functions as F

    from vectordb_from_scratch_spark.operators import knn
    from vectordb_from_scratch_spark.session import load_table

    df = registry.QUERIES["knn_cosine_blockjoin"](spark, sf_oracle)
    p = plans.physical_plan(df)
    assert "FlatMapCoGroupsInPandas" in p
    assert "BroadcastExchange" not in p  # neither side is broadcast

    blas = registry.QUERIES["knn_cosine_topk_blas"](spark, sf_oracle)
    emb = load_table(spark, sf_oracle, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    routed = knn.topk_auto(emb, queries, k=10, blockjoin_min_queries=5)
    assert "FlatMapCoGroupsInPandas" in plans.physical_plan(routed)
    got = sorted(
        (r.query_id, r.vec_id, round(r.score, 6), r.rank) for r in routed.collect()
    )
    want = sorted((r.query_id, r.vec_id, r.score, r.rnk) for r in blas.collect())
    assert got == want


def test_hnsw_bigq_cogroups_and_matches_driver_path(spark, sf_oracle):
    """The graph tier's large-batch exit: queries ride the plan as a
    DataFrame (FlatMapCoGroupsInPandas — no broadcast/collect of the
    batch), with results identical to the driver-side fan-out search."""
    df = registry.QUERIES["hnsw_search_bigq"](spark, sf_oracle)
    p = plans.physical_plan(df)
    assert "FlatMapCoGroupsInPandas" in p
    got = sorted(map(tuple, df.collect()))
    want = sorted(
        map(tuple, registry.QUERIES["hnsw_search"](spark, sf_oracle).collect())
    )
    assert got == want and len(got) > 0
    # and the routed twin: in-plan probes + probe-routed cogroups
    rdf = registry.QUERIES["hnsw_search_routed_bigq"](spark, sf_oracle)
    assert "FlatMapCoGroupsInPandas" in plans.physical_plan(rdf)
    rgot = sorted(map(tuple, rdf.collect()))
    rwant = sorted(
        map(
            tuple,
            registry.QUERIES["hnsw_search_routed"](spark, sf_oracle).collect(),
        )
    )
    assert rgot == rwant and len(rgot) > 0


def test_hnsw_bigq_filtered_matches_driver_path(spark, sf_oracle):
    """Filter-aware search extends to the distributed exits (r9): a
    `passing` flag on the graph table rides the cogroup into the
    filtered beam kernel, results equal the (already filter-aware)
    driver-side fan-out, and every hit passes the filter."""
    from pyspark.sql import functions as F

    from vectordb_from_scratch_spark.operators import hnsw, knn

    qpdf, queries = knn.fixture_query_set(spark, sf_oracle, 6)
    g = hnsw.built_graph(spark, sf_oracle).withColumn(
        "passing", F.col("vec_id") % 3 == 0
    )
    drv = hnsw.search_graphs(g, qpdf, k=10)
    dist = hnsw.search_graphs_distributed(
        g, queries, k=10, shard_ids=list(range(hnsw.SHARDS)), n_queries_hint=6
    )
    got = sorted(map(tuple, dist.collect()))
    want = sorted(map(tuple, drv.collect()))
    assert got == want and len(got) > 0
    assert all(vid % 3 == 0 for _, vid, _, _ in got)


def test_minhash_incremental_delta_is_exercised(spark, sf_oracle):
    """`dedup_minhash_incremental` equals the full recompute BY ORACLE
    (test_oracle_parity covers the hash); this pins the non-vacuity the
    hash can't: the fixture's 90/10 split actually produces pairs that
    TOUCH the delta batch, so the delta joins — not just the carried
    base state — are on the verified path."""
    from vectordb_from_scratch_spark.operators import dedup

    rows = dedup.dedup_minhash_incremental(spark, sf_oracle).collect()
    touch = [r for r in rows if r["doc_a"] % 10 == 0 or r["doc_b"] % 10 == 0]
    assert rows and touch, (len(rows), len(touch))
    full = {
        (r["doc_a"], r["doc_b"]): r["n_shared_bands"]
        for r in dedup.dedup_minhash_lsh(spark, sf_oracle).collect()
    }
    got = {(r["doc_a"], r["doc_b"]): r["n_shared_bands"] for r in rows}
    assert got == full


def test_pq_bigq_cogroups_and_matches_closure_path(spark, sf_oracle):
    """The compressed tier's large-batch exit: block-joined ADC + in-plan
    rerank (FlatMapCoGroupsInPandas, no LUT closure), identical results
    to the broadcast-LUT path."""
    df = registry.QUERIES["pq_search_bigq"](spark, sf_oracle)
    assert "FlatMapCoGroupsInPandas" in plans.physical_plan(df)
    got = sorted(map(tuple, df.collect()))
    want = sorted(
        map(tuple, registry.QUERIES["pq_search"](spark, sf_oracle).collect())
    )
    assert got == want and len(got) > 0
    # the composed tier too: in-plan probes + per-query LUTs in the kernel
    idf = registry.QUERIES["ivfpq_search_bigq"](spark, sf_oracle)
    igot = sorted(map(tuple, idf.collect()))
    iwant = sorted(
        map(tuple, registry.QUERIES["ivfpq_search"](spark, sf_oracle).collect())
    )
    assert igot == iwant and len(igot) > 0


def test_cascade_bigq_cogroups_and_matches_driver_path(spark, sf_oracle):
    """The cascade funnel's large-batch exit (VERDICT r6 #5): queries
    ride the plan as a DataFrame (FlatMapCoGroupsInPandas, no toPandas /
    no query matrix in a closure), with results EQUAL to the driver-path
    cascade — both paths share the same unit kernel and the same global
    (hamming, sq8, exact) windows over exact integer scores, so blocking
    cannot perturb the result."""
    df = registry.QUERIES["knn_cascade_bigq"](spark, sf_oracle)
    p = plans.physical_plan(df)
    assert "FlatMapCoGroupsInPandas" in p
    got = sorted(map(tuple, df.collect()))
    want = sorted(
        map(tuple, registry.QUERIES["knn_cascade"](spark, sf_oracle).collect())
    )
    assert got == want and len(got) > 0


def test_bm25_prebuilt_prunes_postings_partitions(spark, sf_oracle):
    """The materialized-index serve path must read only the query terms'
    hash buckets of the postings layout: PartitionFilters on term_bucket
    at the scan, the term filter pushed, and strictly fewer buckets
    scanned than exist on disk."""
    import os
    import re

    from vectordb_from_scratch_spark.operators import textstats

    path = textstats.ensure_bm25_index(spark, sf_oracle)
    df = registry.QUERIES["text_bm25_search_prebuilt"](spark, sf_oracle)
    p = plans.physical_plan(df)
    m = re.search(r"PartitionFilters: \[[^\]]*term_bucket[^\]]*IN \(([^)]*)\)", p)
    assert m, f"no term_bucket partition filter in plan:\n{p}"
    scanned = len(m.group(1).split(","))
    on_disk = len(
        [
            e
            for e in os.listdir(os.path.join(path, "postings"))
            if e.startswith("term_bucket=")
        ]
    )
    assert scanned <= len(textstats._BM25_TERMS) < on_disk
    assert any("In(term" in f for f in plans.pushed_filters(df))


def test_gapfill_aggregates_before_grid_join(q):
    df = q("events_gapfill_hourly")
    p = plans.physical_plan(df)
    # the dense grid is generated+broadcast; the fact table must never be
    # nested-loop-joined raw — only the aggregated counts meet the grid
    assert "BroadcastHashJoin LeftOuter" in p


def test_q2_window_runs_over_aggregated_rows(q):
    df = q("tpch_q2_min_cost_supplier")
    p = plans.physical_plan(df)
    # map-side combine before the (partkey, suppkey) exchange; the window
    # min re-partitions aggregate output only
    assert "SortMergeJoin" not in p  # every dim side broadcasts


def test_retention_two_shuffles_no_join(q):
    df = q("events_retention_cohorts")
    p = plans.physical_plan(df)
    # windowed first-seen rides the user_id exchange; distinct reuses it
    # (clustering on a key subset); only the cell agg re-shuffles.
    # formatted mode lists each node twice → 4 counted = 2 real exchanges
    assert "Join" not in p
    assert plans.n_shuffles(df) <= 4


def test_knn_auto_dispatches_kernel_by_batch_size(spark, sf_oracle):
    """topk_auto (the serving-path dispatcher): small batches must compile
    to the pure-expression plan (no Python evaluation node anywhere),
    large batches to the per-partition BLAS kernel (MapInPandas)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from vectordb_from_scratch_spark.operators import knn
    from vectordb_from_scratch_spark.session import load_table

    emb = load_table(spark, sf_oracle, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    small = knn.topk_auto(emb, q, k=5)
    p_small = plans.physical_plan(small)
    assert "MapInPandas" not in p_small and "ArrowEvalPython" not in p_small
    assert plans.has_window_group_limit(small)

    qpdf = q.toPandas()
    big = knn.topk_auto(
        emb,
        pd.concat([qpdf] * 10, ignore_index=True).assign(
            query_id=lambda d: range(len(d))
        ),
        k=5,
    )
    assert "MapInPandas" in plans.physical_plan(big)


def test_simhash_banded_no_quadratic_join(q):
    """dedup_simhash must pair via the band-bucket equi-join — no
    BroadcastNestedLoopJoin / CartesianProduct anywhere in the plan."""
    df = q("dedup_simhash")
    p = plans.physical_plan(df)
    assert "NestedLoop" not in p and "CartesianProduct" not in p
    # the pairing join must be an equi-join (hash/merge on the band key;
    # broadcast at fixture scale, sort-merge past the broadcast threshold)
    assert "HashJoin" in p or "SortMergeJoin" in p


def test_jaccard_hot_shingle_cap_is_broadcast_anti(q):
    """The posting-list cap must subtract the hot set via a broadcast
    anti-join (the hot set is tiny), not shuffle the posting table."""
    df = q("dedup_jaccard_pairs")
    p = plans.physical_plan(df)
    assert "BroadcastHashJoin" in p and "LeftAnti" in p


def test_tfidf_broadcast_df_and_window_limit(q):
    """text_tfidf_topterms: the vocabulary (df) side must broadcast and the
    per-doc rank must prune map-side — no sort-merge join anywhere."""
    df = q("text_tfidf_topterms")
    p = plans.physical_plan(df)
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p
    assert plans.has_window_group_limit(df)


def test_vocab_join_auto_routes_by_corpus_size(spark, sf_oracle, monkeypatch):
    """The corpus-vocabulary joins (tf-idf, surprisal) must broadcast below
    the measured corpus-size threshold and fall back to a term-keyed
    shuffle join above it (VERDICT r3 #2: a web-scale vocabulary is a
    multi-GB broadcast). Both routes must exist in the same code path."""
    from vectordb_from_scratch_spark.operators import textstats

    for name in ("text_tfidf_topterms", "text_unigram_surprisal", "text_bigram_perplexity"):
        p = plans.physical_plan(registry.QUERIES[name](spark, sf_oracle))
        assert "BroadcastHashJoin" in p, f"{name}: fixture vocab must broadcast"
    monkeypatch.setattr(textstats, "VOCAB_BROADCAST_MAX_CORPUS_BYTES", 0)
    for name in ("text_tfidf_topterms", "text_unigram_surprisal", "text_bigram_perplexity"):
        df = registry.QUERIES[name](spark, sf_oracle)
        p = plans.physical_plan(df)
        # past the threshold the vocab join must NOT be planned as an
        # explicit broadcast (AQE may still convert at runtime on tiny
        # fixtures — the static plan is what the hint controls)
        assert "SortMergeJoin" in p or "ShuffledHashJoin" in p, (
            f"{name}: oversized vocab must shuffle-join, not broadcast"
        )


def test_full_outer_join_is_shuffle_join(q):
    """A FULL OUTER join cannot broadcast either side (both must observe
    unmatched rows) — Catalyst must plan a shuffle join here."""
    p = plans.physical_plan(q("join_full_outer_reconcile"))
    assert "SortMergeJoin FullOuter" in p or "ShuffledHashJoin FullOuter" in p
    assert "BroadcastHashJoin FullOuter" not in p


def test_codec_pipelines_have_zero_shuffles(q):
    """The WAV/PNG encode→decode chains are mapInPandas compositions over
    the scan — embarrassingly parallel, not a single Exchange."""
    for name in ("multimodal_wav_decode", "multimodal_png_decode", "multimodal_audio_windows"):
        df = q(name)
        assert plans.n_shuffles(df) == 0, name


def test_minhash_simhash_signatures_scan_local(spark, sf_oracle):
    """MinHash signatures must stay shuffle-free (scan-local array
    expressions); SimHash signatures explode for the 64 codegen'd vote
    sums (HOF filters are CodegenFallback — measured 10x slower) but the
    exploded table must COMBINE map-side before its one exchange (partial
    HashAggregate below the shuffle → shuffle bytes are corpus-count-
    sized, never shingle-sized). Both hash each shingle exactly once."""
    from vectordb_from_scratch_spark.operators import dedup
    from vectordb_from_scratch_spark.session import load_table

    docs = load_table(spark, sf_oracle, "documents")
    mh = dedup.minhash_signatures(docs)
    assert plans.n_shuffles(mh) == 0
    assert plans.physical_plan(mh).count("md5") == 1

    sh = dedup.simhash_signatures(docs)
    # exactly one exchange, counted in simple mode (one line per node —
    # formatted mode lists each node twice, tree + details section, so
    # n_shuffles() there double-counts any nonzero total)
    simple = plans.physical_plan(sh, mode="simple")
    assert simple.count("Exchange") == 1, simple
    assert plans.physical_plan(sh).count("md5") == 1
    lines = simple.splitlines()
    agg_below = [
        i
        for i, ln in enumerate(lines)
        if "HashAggregate" in ln
        and any("Exchange" in up for up in lines[:i])
    ]
    assert agg_below, simple


def test_stratified_quota_limits_window_map_side(q):
    """rank<=quota must compile to WindowGroupLimit: each map task keeps
    its local top-quota per stratum before the exchange, so a skewed
    stratum cannot skew the shuffle."""
    assert plans.has_window_group_limit(q("sampling_stratified_exact"))


def test_q1_decimal_is_single_scan_partial_agg(q):
    """The decimal lane keeps q1's plan shape: one scan, no joins, and
    column pruning to exactly the aggregated columns."""
    df = q("tpch_q1_decimal")
    # exactly the one groupBy shuffle (simple mode: one line per node)
    assert plans.physical_plan(df, mode="simple").count("Exchange") == 1
    schemas = plans.scan_read_schemas(df)
    assert schemas and all("l_partkey" not in s for s in schemas)


def test_hamming_topk_stays_jvm_side(q):
    """The 1-bit tier's claim is 'pure codegen': no Python eval node
    anywhere, the query side broadcast, and map-side top-k pruning."""
    df = q("knn_hamming_topk")
    p = plans.physical_plan(df)
    assert "BatchEvalPython" not in p and "MapInPandas" not in p
    assert plans.has_broadcast_join(df)
    assert plans.has_window_group_limit(df)


def test_sq8_expression_plan_broadcasts_and_prunes(q):
    df = q("knn_sq8_topk")
    assert plans.has_broadcast_join(df)
    assert plans.has_window_group_limit(df)
    # codes are derived in-plan from the embedding column: the scan reads
    # only (vec_id, embedding)
    schemas = plans.scan_read_schemas(df)
    assert schemas and all("label" not in s for s in schemas)


def test_pq_encode_is_single_pass_no_shuffle(spark, sf_oracle):
    """PQ encode must be one Arrow pass over the corpus — zero exchanges,
    exactly like IVF assignment."""
    import numpy as np

    from vectordb_from_scratch_spark.operators import pq
    from vectordb_from_scratch_spark.session import load_table

    emb = load_table(spark, sf_oracle, "embeddings")
    books = np.zeros((pq.M_SUBSPACES, 4, 64 // pq.M_SUBSPACES))
    enc = pq.encode(emb, books)
    p = plans.physical_plan(enc)
    assert "MapInPandas" in p and plans.n_shuffles(enc) == 0, p


def test_keep_best_adds_no_text_shuffle(q):
    """Canonical selection must not shuffle document text: the only new
    data movement beyond the components build is the (doc_id, n_words)
    projection joining the label table."""
    df = q("dedup_canonical_keep_best")
    schemas = plans.scan_read_schemas(df)
    # every documents scan reads at most (doc_id, text) — no extra columns
    assert schemas and all("source" not in s and "lang" not in s for s in schemas)


def test_day_partitioned_rollup_prunes_partitions(q):
    """The day filter must resolve to PartitionFilters at the scan (struck
    at planning time — 3 of 30 directories), not a post-scan Filter over
    the whole table."""
    df = q("events_partition_pruned_rollup")
    p = plans.physical_plan(df)
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", p)
    assert m and "day" in m.group(1) and ">=" in m.group(1) and "<=" in m.group(1), p


def test_mg_candidate_pass_is_scan_local(spark, sf_oracle):
    """Heavy hitters pass 1 (Misra-Gries partials) must have ZERO
    exchanges — the whole point is summarizing without shuffling the
    vocabulary. Pass 2 (exact recount of candidates) is allowed exactly
    one aggregate exchange."""
    from pyspark.sql import functions as F

    from vectordb_from_scratch_spark.functions import texthash
    from vectordb_from_scratch_spark.operators import sketches

    toks = spark.read.parquet(f"{sf_oracle}/documents.parquet").select(
        F.explode(texthash.words("text")).alias("w")
    )
    assert plans.n_shuffles(sketches.misra_gries_partials(toks)) == 0
    # one real aggregate exchange (formatted mode lists nodes twice)
    assert plans.n_shuffles(sketches.heavy_hitters(toks)) <= 2


def test_histogram_quantiles_single_broadcast_no_sort(spark, sf_oracle):
    """The stats frame (5 rows) must broadcast back onto the scan; no
    global sort appears anywhere (the selection is integer comparisons
    over a windowed cumsum per type, not an order-by of the data)."""
    df = registry.QUERIES["sketch_histogram_quantiles"](spark, sf_oracle)
    p = plans.physical_plan(df)
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_image_neardup_banded_equi_joins_only(spark, sf_oracle):
    """The Hamming<=1 pair search must run as equi-joins on the hash
    words — a nested-loop/cartesian plan would mean the banding
    regressed to quadratic."""
    df = registry.QUERIES["multimodal_image_neardup"](spark, sf_oracle)
    p = plans.physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p


def test_outliers_broadcast_moments(spark, sf_oracle):
    """events_value_outliers: the per-type moment frame broadcasts; the
    events table is scanned, never shuffle-joined."""
    df = registry.QUERIES["events_value_outliers"](spark, sf_oracle)
    p = plans.physical_plan(df)
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p


def test_salted_skew_join_is_shuffle_join_on_salted_key(q):
    """The registered salted-join demo must actually run the salted
    SHUFFLE shape (merge-hinted — Catalyst would broadcast the tiny dim
    at fixture scale and hide the mechanism under test)."""
    df = q("events_salted_skew_join")
    p = plans.physical_plan(df)
    assert "SortMergeJoin" in p and "BroadcastHashJoin" not in p


def test_no_cartesian_or_row_python_udf_in_any_registered_query(spark, sf_oracle):
    """Repo-wide plan-hygiene sweep: every registered query's physical plan
    is built (not executed) and screened for the two anti-patterns the
    engine bans outright — CartesianProduct (an unbroadcast cross join:
    O(N·M) at scale) and BatchEvalPython (row-at-a-time Python UDF: the
    10-100x-slower-than-Arrow path). Catching these at PLAN time means a
    future operator can't reintroduce them and pass by being fast on
    fixtures."""
    from vectordb_from_scratch_spark import plans, registry

    offenders: dict[str, list[str]] = {}
    for name, fn in sorted(registry.QUERIES.items()):
        p = plans.physical_plan(fn(spark, sf_oracle))
        hits = [
            pat for pat in ("CartesianProduct", "BatchEvalPython") if pat in p
        ]
        if hits:
            offenders[name] = hits
    assert not offenders, f"anti-pattern plans: {offenders}"


def test_hnsw_serve_search_is_zero_shuffle_plus_merge(spark, sf_oracle):
    """The sharded-graph SERVE path: the only Exchange in the plan is the
    final per-query merge window (which must group-limit map-side); the
    graph itself is read from the cached build, never reshuffled."""
    from vectordb_from_scratch_spark.operators import hnsw, knn

    qpdf, _ = knn.fixture_query_set(spark, sf_oracle, 5)
    g = hnsw.built_graph(spark, sf_oracle)
    df = hnsw.search_graphs(g, qpdf, k=5)
    text = plans.physical_plan(df)
    # the cached InMemoryRelation embeds the BUILD plan (with its shard
    # shuffle) in the formatted text — only the serve tree above it counts
    serve_tree = text.split("InMemoryRelation", 1)[0]
    assert serve_tree.count("Exchange") == 1
    assert serve_tree.count("WindowGroupLimit") == 2  # partial + final
    assert "InMemoryTableScan" in serve_tree


def test_maxsim_single_shuffle_scan_local_chunks(q):
    """text_maxsim_search: chunking + embedding are scan-local (explode +
    MapInPandas, no per-doc window), so the only Exchange is the final
    per-doc aggregate; top-10 must be TakeOrderedAndProject."""
    df = q("text_maxsim_search")
    p = plans.physical_plan(df)
    assert "MapInPandas" in p
    assert "TakeOrderedAndProject" in p
    assert plans.n_shuffles(df) <= 2  # doc aggregate (+ AQE coalesce)


def test_hybrid_rrf_pool_join_is_broadcastable(q):
    """search_hybrid_rrf: the fusion joins two <=20-row rank lists — it
    must never plan a sort-merge join of corpus-sized inputs."""
    df = q("search_hybrid_rrf")
    p = plans.physical_plan(df)
    assert "TakeOrderedAndProject" in p  # both pools and the final top-10


def test_bigq_search_plans_never_collect_and_match_driver_path(spark, sf_oracle, monkeypatch):
    """The r4-verdict-#4 exit: ivf_search_bigq / lsh_search_bigq must
    build their ENTIRE plan without any driver materialization (collect /
    toPandas / localIterator banned while the plan is constructed), and
    their results must equal the driver-side path row for row — same
    probes, same normalize-then-einsum scores, same tie-breaks."""
    from pyspark.sql import DataFrame

    from vectordb_from_scratch_spark.operators import ivf, knn, lsh

    # warm every process cache the bigq entries read (index builds and
    # the fixture query set legitimately collect — once, at build time)
    ivf.warm_ivf(spark, sf_oracle)
    lsh.warm_lsh(spark, sf_oracle)
    knn.fixture_query_set(spark, sf_oracle, 10)
    driver_ivf = {tuple(r) for r in registry.QUERIES["ivf_search"](spark, sf_oracle).collect()}
    driver_lsh = {tuple(r) for r in registry.QUERIES["lsh_search"](spark, sf_oracle).collect()}

    def banned(self, *a, **k):  # pragma: no cover - failure path
        raise AssertionError("driver materialization inside bigq plan construction")

    with monkeypatch.context() as m:
        m.setattr(DataFrame, "collect", banned)
        m.setattr(DataFrame, "toPandas", banned)
        m.setattr(DataFrame, "toLocalIterator", banned)
        bigq_ivf = registry.QUERIES["ivf_search_bigq"](spark, sf_oracle)
        bigq_lsh = registry.QUERIES["lsh_search_bigq"](spark, sf_oracle)

    assert {tuple(r) for r in bigq_ivf.collect()} == driver_ivf
    assert {tuple(r) for r in bigq_lsh.collect()} == driver_lsh
    # and the rerank is the joined kernel, not a closure matrix: the plan
    # must join the query relation (visible as a join above MapInPandas)
    for df in (bigq_ivf, bigq_lsh):
        p = plans.physical_plan(df)
        assert "MapInPandas" in p


def test_prefix_jaccard_join_never_broadcasts(q):
    """The four corpus-sized joins in dedup_jaccard_prefix (df table,
    prefix self-join, both verify posting legs) are pinned to SORT-MERGE:
    Catalyst's static size estimate under the explode→window→filter
    lineage planned them all as BroadcastHashJoins (never demoted by AQE)
    and the ~GB hashed relations OOM-ed at the 400k stress point;
    shuffled-hash then overran the per-task build-map slice because SHJ
    cannot spill. A posting join must never hash-build (SCALE.md r6)."""
    df = q("dedup_jaccard_prefix")
    p = plans.physical_plan(df)
    assert "BroadcastHashJoin" not in p and "ShuffledHashJoin" not in p
    assert "SortMergeJoin" in p
