"""SCALE.md core-count scaling rows (VERDICT r11 #6): time the heaviest
registered queries on a K×-replicated sf1-class corpus
(tools/make_scaled_corpus.py) at two core counts, one fresh session per
count, bench methodology (.count() on the registered query).

Usage: python tools/scaling_cores.py <cpus> [sf_dir] [out_tsv]
Run once per core count; ratios assembled by hand into SCALE.md.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = (
    "dedup_minhash_lsh",
    "dedup_jaccard_prefix",
    "graph_pagerank",
    "graph_pagerank_weighted",
    "graph_node_embeddings",
    "graph_node2vec_walks",
    "streaming_attribution_pairs",
    "graph_ktruss",
    "graph_ktruss_warm",
    "graph_ktruss_incremental",
)


def main() -> None:
    cpus = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfbig"
    out = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/scaling_c{cpus}.tsv"
    from vectordb_from_scratch_spark.session import get_spark
    from vectordb_from_scratch_spark import registry
    import vectordb_from_scratch_spark.operators  # noqa: F401

    spark = get_spark("scaling-cores", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    registry.QUERIES["knn_cosine_topk"](spark, sf_dir).count()  # JVM warmup
    with open(out, "w") as fh:
        for name in QUERIES:
            spark.sparkContext.setJobDescription(f"scaling c{cpus} {name}")
            t = time.perf_counter()
            n = registry.QUERIES[name](spark, sf_dir).count()
            dt = time.perf_counter() - t
            print(f"c{cpus}\t{name}\t{dt:.1f}\trows={n}", flush=True)
            fh.write(f"{name}\t{dt:.1f}\t{n}\n")
            fh.flush()


if __name__ == "__main__":
    main()
