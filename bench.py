"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line. The driver records this per round as BENCH_r{N}.json."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vectordb_from_scratch_spark import registry  # noqa: E402
from vectordb_from_scratch_spark.session import get_spark  # noqa: E402

#: Queries deliberately NOT timed, each justified line-by-line (VERDICT
#: r9 #5: everything else in the registry is benched automatically, so a
#: new query can't silently drop out of the round record the way the old
#: hand-maintained list drifted).
SKIP = {
    # byte-identical plan to tpch_q1_pricing_summary with DECIMAL(12,2)
    # arithmetic — a numeric-types oracle twin, not a distinct operator;
    # timing it would double-count q1's scan in the total
    "tpch_q1_decimal": "types twin of tpch_q1_pricing_summary",
}

#: The r9 bench ordering, frozen: per-query numbers are only comparable
#: round-over-round if the query that PAYS each shared build cache's cold
#: cost stays the same (e.g. ivf_search builds the index that
#: ivf_cluster_sizes then reads warm). Newly-registered queries append
#: after these in name order via the registry sweep below.
_HEADLINE_R9 = [
    "knn_cosine_topk",
    "knn_cosine_topk_blas",
    "knn_cosine_batch100",
    "knn_cosine_blockjoin",
    "knn_cosine_filtered",
    "knn_l2_topk",
    "tpch_q1_pricing_summary",
    "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_type_profit",
    "tpch_q10_returned_items",
    "tpch_q12_priority_shipping",
    "tpch_q14_promo_effect",
    "tpch_q13_customer_distribution",
    "tpch_q18_large_volume_customer",
    "tpch_q21_waiting_supplier",
    "tpch_q16_supplier_variety",
    "tpch_q20_excess_shipments",
    "window_running_customer_totals",
    "window_frames",
    "events_gapfill_hourly",
    "events_sessionization",
    "events_tumbling_windows",
    "events_asof_last_view",
    "events_range_pairs",
    "events_retention_cohorts",
    "events_partition_pruned_rollup",
    "streaming_attribution_pairs",
    "dedup_minhash_lsh",
    "dedup_minhash_incremental",
    "dedup_components",
    "dedup_decontaminate",
    "dedup_decontaminate_bloom",
    "dedup_embedding_neardup",
    "dedup_embedding_neardup_blocked",
    "dedup_canonical_keep_best",
    "dedup_winnow_overlaps",
    "dedup_jaccard_prefix",
    "sampling_dsir_logweights",
    "pipeline_training_prep",
    "pipeline_clean_corpus",
    "pipeline_clean_corpus_classified",
    "pipeline_sequence_packing",
    "pipeline_curriculum_bins",
    "sampling_component_split",
    "text_quality_scores",
    "text_char_entropy",
    "text_repetition_scores",
    "text_bm25_search",
    "text_bm25_search_prebuilt",
    "text_unigram_surprisal",
    "text_bigram_perplexity",
    "text_pii_scrub",
    "text_ngram_novelty",
    "text_winnow_fingerprints",
    "dedup_semantic_prune",
    "dedup_span_coverage",
    "pipeline_cut_dup_spans",
    "quality_classifier_scores",
    "sampling_domain_mixture",
    "graph_edge_weights",
    "graph_triangle_counts",
    "graph_clustering_coeff",
    "graph_components",
    "graph_pagerank",
    "graph_pagerank_weighted",
    "graph_bfs_hops",
    "graph_betweenness",
    "graph_closeness",
    "graph_sssp_weighted",
    "graph_kcore",
    "graph_ktruss",
    "graph_ktruss_incremental",
    "graph_ppr",
    "graph_hits",
    "graph_lpa_communities",
    "graph_assortativity",
    "graph_cf_cosine",
    "graph_recommendations",
    "graph_triangle_estimate",
    "graph_random_walks",
    "graph_walk_skipgrams",
    "graph_node2vec_walks",
    "graph_node_embeddings",
    "graph_embedding_eval",
    "graph_edges_incremental",
    "chunk_documents",
    "events_trailing_hour_window",
    "events_ewma_by_user",
    "events_cusum_drift",
    "embed_documents",
    "text_search_e2e",
    "text_maxsim_search",
    "text_bpe_merges",
    "text_bpe_token_counts",
    "text_bpe_merges_mid",
    "text_bpe_merges_big",
    "text_bpe_token_counts_big",
    "text_zipf_fit",
    "pipeline_packing_bpe",
    "search_hybrid_rrf",
    "embedding_label_medoids",
    "ivf_search",
    "ivf_search_prebuilt",
    "lsh_search",
    "lsh_search_prebuilt",
    "knn_sq8_topk_kernel",
    "knn_hamming_topk",
    "pq_search",
    "pq_search_prebuilt",
    "pq_search_bigq",
    "ivfpq_search",
    "ivfpq_search_prebuilt",
    "ivfpq_search_bigq",
    "hnsw_search",
    "hnsw_search_prebuilt",
    "hnsw_search_routed",
    "hnsw_search_bigq",
    "hnsw_search_routed_bigq",
    "knn_cascade",
    "knn_cascade_bigq",
    "knn_radius_search",
    "knn_mmr_diversified",
    "sketch_hll_estimate",
    "sketch_histogram_quantiles",
    "sketch_countmin_estimate",
    "sketch_kmv_estimate",
    "sketch_kmv_intersection",
    "eval_ann_ndcg",
    "eval_mrl_overlap",
    "embedding_pca_components",
    "embedding_pca_components_r4",
    "eval_pca_ivf_recall",
    "eval_pca_route_rerank",
    "embedding_pca_scores",
    "embedding_jl_project",
    "eval_jl_distortion",
    "eval_pca_recon_error",
    "embedding_drift",
    "profile_orders",
    "events_value_outliers",
    "events_mad_outliers",
    "events_mad_outliers_sketch",
    "events_salted_skew_join",
    "events_rollup_incremental",
    "sql_api_top_customers_window",
    "text_heavy_hitters",
    "multimodal_jpeg_decode",
    "multimodal_jpeg_color_decode",
    "multimodal_jpeg_420_decode",
    "multimodal_image_ahash",
    "multimodal_image_neardup",
    "multimodal_audio_neardup",
    "export_shard_manifest",
    "dq_constraint_audit",
    "events_zorder_box",
]

#: HEADLINE = the frozen r9 ordering, then every other registered query
#: (minus the justified SKIP list) in name order. Derived, not listed:
#: the registry is the single source of truth for what gets timed.
HEADLINE = [q for q in _HEADLINE_R9 if q in registry.QUERIES] + sorted(
    q for q in registry.QUERIES if q not in set(_HEADLINE_R9) | set(SKIP)
)


def _start_python_worker_keepalive(spark, interval: float = 45.0):
    """Keep the Python worker pool warm for the whole run (r11).

    Spark 4.1's PythonWorkerFactory hard-codes a 1-minute idle timeout
    (``IDLE_WORKER_TIMEOUT_NS``): after any >60s stretch of JVM-only
    queries the ENTIRE idle worker pool is culled, and the next
    Arrow/pandas query pays a 32-fork import storm measured at 10-13s on
    this box — charged to whichever query happens to follow the gap
    (multimodal_jpeg_decode drew it in one run, _color_decode in another).
    ``releaseWorker`` refreshes a factory-global ``lastActivityNs``, so one
    single-partition no-op Python task per interval keeps every pooled
    worker alive. This is session infrastructure in the same class as the
    JVM warm-up below — it does not touch any query's computation; the
    cost is ~0.6s of one core per interval (<2% of one of 32 cores).
    Documented in OPTIMIZATION_r11.md ("Benchmark record")."""
    import threading

    one = spark.range(0, 1, 1, 1)  # exactly one partition -> one worker task
    stop = threading.Event()

    def loop() -> None:
        while not stop.wait(interval):
            try:
                spark.sparkContext.setJobDescription("python-worker keepalive")
                one.mapInPandas(lambda it: it, "id long").count()
            except Exception:
                return

    t = threading.Thread(target=loop, daemon=True, name="py-worker-keepalive")
    t.start()
    return stop


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/parquet footers so per-query numbers measure the query,
    # not session startup (the driver compares totals at fixed sf).
    registry.QUERIES["knn_cosine_topk"](spark, sf_dir).count()
    # Warm the Python worker pool to its PEAK demand (same discipline),
    # then keep it warm across JVM-only stretches — see
    # _start_python_worker_keepalive. Peak = 2 workers × cores: chained
    # Python stages with no exchange between them (synth→decode/hash
    # pairs) hold one worker per LEVEL per task, so a cores-sized warmup
    # leaves the second wave to pay the fork storm mid-run (measured:
    # multimodal_image_ahash drew 21.7s when only 33 workers were warm).
    p = spark.sparkContext.defaultParallelism
    ident = lambda it: it  # noqa: E731
    (
        spark.range(0, p, 1, p)
        .mapInPandas(ident, "id long")
        .mapInPandas(ident, "id long")
        .count()
    )
    # Keep the returned stop event and set it once the timed loop is done
    # (ADVICE r11: the daemon thread should not outlive the measurement).
    keepalive_stop = _start_python_worker_keepalive(spark)

    # Serve twins (*_prebuilt) must never include build cost in their
    # timed region: run each one's registered warmer OUTSIDE the timer,
    # and flip STRICT_SERVE so a cold cache raises instead of silently
    # building (the cold/serve split then measures what it claims).
    registry.STRICT_SERVE = True

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = registry.QUERIES.get(name)
        if fn is None:
            continue
        warmer = registry.WARMERS.get(name)
        if warmer is not None:
            warmer(spark, sf_dir)
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        dt = round(time.perf_counter() - t0, 3)
        timings[name] = dt
        total += dt
        print(f"# {name}: {dt:.3f}s rows={n}", file=sys.stderr)

    keepalive_stop.set()
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Persist the COMPLETE per-query record in-repo (VERDICT r6 #6): the
    # driver's tail capture truncates long stdout (only 65 of 129 r6
    # timings were recoverable), so round-over-round regressions need a
    # durable file. One file per run, keyed by a monotonic-ish stamp.
    bdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".benchmarks")
    os.makedirs(bdir, exist_ok=True)
    stamp = time.strftime("%Y%m%dT%H%M%S")
    full = {
        "metric": "headline_queries_detail",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "stamp": stamp,
    }
    with open(os.path.join(bdir, f"bench_full_{stamp}.json"), "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)
    with open(os.path.join(bdir, "bench_full.json"), "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)

    # Full record first (per-query timings), then two compact lines that
    # BOTH fit the driver's ~2000-char tail capture, ending with the
    # minimal total line its parser expects. The driver's tail keeps the
    # END of stdout, so when the full per-query line outgrows the capture
    # window its truncated FRONT loses "metric"/"value" (this made
    # BENCH_r03.json parse as null) — PERF_r10/r11 had empty per_query
    # maps for exactly that reason. The per-FAMILY subtotal line (r12,
    # VERDICT r11 #2) is ~700 chars, so family-granularity comparisons
    # survive the capture even though per-query ones don't.
    print(
        json.dumps(
            {
                "metric": "headline_queries_detail",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    per_family: dict[str, float] = {}
    for name, dt in timings.items():
        fam = name.split("_", 1)[0]
        per_family[fam] = per_family.get(fam, 0.0) + dt
    print(
        json.dumps(
            {
                "metric": "headline_family_totals",
                "value": round(total, 3),
                "unit": "sec",
                "per_family": {f: round(v, 1) for f, v in sorted(per_family.items())},
                "sf": sf_val,
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 3),
                "unit": "sec",
                "n_queries": len(timings),
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
