"""Scale-up stress check: run the vector kernels far beyond fixture size
to verify the plans hold when N grows 100x (the fixture's embeddings
table is 2k rows at sf0.1; this synthesizes up to 200k x 64 and measures
build/search throughput). Results recorded in SCALE.md.

Usage: python tools/stress.py [n_rows] [dims] [mode]
  mode: core (default, the original kernel battery) | cascade | neardup
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.operators import ivf, knn, lsh
from vectordb_from_scratch_spark.operators.dedup import embedding_pairs_topk
from vectordb_from_scratch_spark.session import get_spark


def run_cascade(spark, emb, n: int, d: int, n_queries: int, qpdf) -> None:
    """Binary→SQ8→exact funnel at scale: the shortlist the global merge
    sees is O(partitions · Q · k) rows regardless of N — print it so the
    claim is measured, not asymptotic."""
    from vectordb_from_scratch_spark.operators import quantization

    n_parts = emb.rdd.getNumPartitions()
    t0 = time.perf_counter()
    res = quantization.cascade_search(emb, qpdf, k=10, prefilter=200)
    cnt = res.count()
    t = time.perf_counter() - t0
    print(
        f"cascade Q={len(qpdf)}: {t:6.2f}s ({cnt} rows; global merge input "
        f"<= parts*Q*k = {n_parts}*{len(qpdf)}*10 = {n_parts * len(qpdf) * 10} "
        f"rows vs corpus {n} — shuffle stays O(parts*k))"
    )


def run_neardup(spark, emb, n: int, d: int) -> None:
    """Blocked near-dup at scale + the auto-route guard decision."""
    from vectordb_from_scratch_spark.operators import dedup

    route = (
        "exact-broadcast"
        if n * d * 8 <= dedup.EXACT_PAIRS_MAX_BROADCAST_BYTES
        else "lsh-blocked"
    )
    bits = dedup.blocked_n_bits(n)
    print(
        f"auto-route at n={n}, d={d}: {n * d * 8 / 1e6:.0f}MB corpus -> {route}; "
        f"blocked key width auto-scales to {bits} bits "
        f"(~{n / (1 << bits):.0f} vectors/bucket)"
    )
    t0 = time.perf_counter()
    cnt = dedup.embedding_pairs_blocked(emb, k=20, dims=d, n_rows=n).count()
    t = time.perf_counter() - t0
    print(f"blocked near-dup top-20: {t:6.2f}s ({cnt} rows) at {n} x {d}")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    mode = sys.argv[3] if len(sys.argv) > 3 else "core"
    n_queries = 100
    spark = get_spark("stress")
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.default_rng(42)
    # clustered data so IVF has structure to find
    centers = rng.standard_normal((64, d)).astype("float32")
    assign = rng.integers(0, 64, size=n)
    X = centers[assign] + 0.3 * rng.standard_normal((n, d)).astype("float32")

    # land the corpus in parquet first: production-shaped input (columnar
    # scan + Arrow), not pickle-serialized python rows
    import pandas as pd

    path = f"/tmp/stress_emb_{n}_{d}"
    pdf = pd.DataFrame({"vec_id": np.arange(n, dtype="int64"), "embedding": list(X)})
    spark.createDataFrame(pdf).repartition(32).write.mode("overwrite").parquet(path)
    emb = spark.read.parquet(path)
    emb.count()
    print(f"corpus: {n} x {d} (parquet at {path})")

    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    qpdf = queries.toPandas()

    if mode == "cascade":
        return run_cascade(spark, emb, n, d, n_queries, qpdf)
    if mode == "neardup":
        return run_neardup(spark, emb, n, d)

    t0 = time.perf_counter()
    cnt = knn.topk_pandas(emb, qpdf, k=10).count()
    t_blas = time.perf_counter() - t0
    print(f"flat BLAS kNN   Q={n_queries}: {t_blas:6.2f}s  ({cnt} rows, "
          f"{n * n_queries / t_blas / 1e6:.0f}M scores/s)")

    t0 = time.perf_counter()
    cents = ivf.train_centroids(emb)
    asg = ivf.assign(emb, cents).persist()
    asg.count()
    t_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    cnt = ivf.search(emb, cents, asg, queries, k=10).count()
    t_ivf = time.perf_counter() - t0
    print(f"IVF build: {t_build:6.2f}s  search Q={n_queries}: {t_ivf:6.2f}s ({cnt} rows)")

    t0 = time.perf_counter()
    H = lsh.hyperplanes(d)
    buckets = lsh.compute_buckets(emb, H).persist()
    buckets.count()
    t_lb = time.perf_counter() - t0
    t0 = time.perf_counter()
    cnt = lsh.search(emb, buckets, queries, H, k=10, n_flips=1).count()
    t_ls = time.perf_counter() - t0
    print(f"LSH build: {t_lb:6.2f}s  search Q={n_queries}: {t_ls:6.2f}s ({cnt} rows)")

    t0 = time.perf_counter()
    cnt = embedding_pairs_topk(emb, k=20).count()
    t_pairs = time.perf_counter() - t0
    print(f"all-pairs top-20: {t_pairs:6.2f}s ({n*(n-1)//2} pairs scored, "
          f"{n * (n - 1) / 2 / t_pairs / 1e6:.0f}M pairs/s)")

    from vectordb_from_scratch_spark.operators import pq, quantization

    t0 = time.perf_counter()
    enc = quantization.sq8_encode_pandas(emb).persist()
    enc.count()
    t_sq_enc = time.perf_counter() - t0
    sq_qpdf = (
        enc.filter(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("query_id"), "codes", "norm2")
        .toPandas()
    )
    sq_qpdf["codes"] = sq_qpdf["codes"].map(list)
    t0 = time.perf_counter()
    cnt = quantization.sq8_topk_pandas(enc, sq_qpdf, k=10).count()
    t_sq = time.perf_counter() - t0
    print(f"SQ8 encode: {t_sq_enc:6.2f}s  search Q={n_queries}: {t_sq:6.2f}s "
          f"({cnt} rows, {n * n_queries / t_sq / 1e6:.0f}M scores/s)")
    enc.unpersist()

    t0 = time.perf_counter()
    books = pq.train_codebooks(emb)
    codes = pq.encode(emb, books).persist()
    codes.count()
    t_pq_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    cnt = pq.search(emb, codes, books, qpdf, k=10).count()
    t_pq = time.perf_counter() - t0
    print(f"PQ build: {t_pq_build:6.2f}s  ADC+rerank Q={n_queries}: {t_pq:6.2f}s ({cnt} rows)")
    codes.unpersist()


if __name__ == "__main__":
    main()
