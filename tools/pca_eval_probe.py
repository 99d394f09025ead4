"""Phase breakdown of eval_pca_ivf_recall at sf0.1 (guide §1): where do
the seconds go — PCA fit, reduced projection, exact reference, per-r
train/assign/search, final union job?"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vectordb_from_scratch_spark.session import get_spark, load_table  # noqa: E402
from vectordb_from_scratch_spark.operators import pca as P  # noqa: E402
from vectordb_from_scratch_spark.operators import ivf as ivf_ops  # noqa: E402
from vectordb_from_scratch_spark.operators import knn  # noqa: E402
from vectordb_from_scratch_spark.registry import track_persist  # noqa: E402
from vectordb_from_scratch_spark import registry  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("pca-eval-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    t = time.perf_counter()
    r_max = max(P.PCA_INDEX_RS)
    mu, comps = P.fit_pca_topr(spark, sf_dir, r_max)
    print(f"fit_pca_topr: {time.perf_counter() - t:.2f}s")

    emb = load_table(spark, sf_dir, "embeddings")
    t = time.perf_counter()
    reduced = track_persist(
        emb.select("vec_id", P.pca_project_col(F.col("embedding"), mu, comps).alias("rv"))
    )
    n = reduced.count()
    print(f"reduced persist+count: {time.perf_counter() - t:.2f}s n={n}")

    t = time.perf_counter()
    fq = emb.filter(F.col("vec_id") < P.PCA_RECALL_Q).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("query_vec"),
    )
    full_top = knn.topk(emb, fq, k=P.PCA_RECALL_K).select("query_id", "vec_id")
    full_top = full_top.localCheckpoint()
    print(f"full-dim exact reference: {time.perf_counter() - t:.2f}s")

    n_clusters = max(1, min(ivf_ops.DEFAULT_N_CLUSTERS, n // 8 or 1))
    for r in P.PCA_INDEX_RS:
        red_r = reduced.select("vec_id", F.slice(F.col("rv"), 1, r).alias("rv"))
        t = time.perf_counter()
        sc.setJobDescription(f"train r={r}")
        centroids = ivf_ops.train_centroids(red_r, n_clusters=n_clusters, vec_col="rv", n_hint=n)
        print(f"  train r={r}: {time.perf_counter() - t:.2f}s")
        t = time.perf_counter()
        assignments = ivf_ops.assign(red_r, centroids, id_col="vec_id", vec_col="rv")
        rq = red_r.filter(F.col("vec_id") < P.PCA_RECALL_Q).select(
            F.col("vec_id").alias("query_id"), F.col("rv").alias("query_vec")
        )
        red_top = ivf_ops.search(
            red_r, centroids, assignments, rq, k=P.PCA_RECALL_K,
            id_col="vec_id", vec_col="rv",
        ).select("query_id", "vec_id")
        red_top.write.format("noop").mode("overwrite").save()
        print(f"  assign+search r={r}: {time.perf_counter() - t:.2f}s")

    # whole registered query, for reference
    for rep in range(2):
        t = time.perf_counter()
        registry.QUERIES["eval_pca_ivf_recall"](spark, sf_dir).count()
        print(f"registered eval_pca_ivf_recall rep{rep}: {time.perf_counter() - t:.2f}s")
    for rep in range(2):
        t = time.perf_counter()
        registry.QUERIES["eval_pca_route_rerank"](spark, sf_dir).count()
        print(f"registered eval_pca_route_rerank rep{rep}: {time.perf_counter() - t:.2f}s")


if __name__ == "__main__":
    main()
