"""Scale-up stress check: run the vector kernels far beyond fixture size
to verify the plans hold when N grows 100x (the fixture's embeddings
table is 2k rows at sf0.1; this synthesizes up to 200k x 64 and measures
build/search throughput). Results recorded in SCALE.md.

Usage: python tools/stress.py [n_rows] [dims] [mode]
  mode: core (default, the original kernel battery) | wide (d=1024 ANN battery, r10) | cascade | neardup | zorder | hnsw | hnswrouted | hnswbounded | blockjoin | hybrid | winnow | semprune | dupspan | graph | graph2 | truss | walks | recsys | robust | prefixjoin | bpe | betw | pca
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


def run_blockjoin(spark, emb, n: int, d: int) -> None:
    """>10⁵-query flat k-NN through the cogrouped block join (r4 verdict
    #7): queries stay a Spark DataFrame end to end — no collect,
    broadcast, or closure carries them — and the inherent N·Q scoring
    work runs as one dense matmul per (corpus block × query block)
    pair. A 50-query subset is value-checked against the broadcast BLAS
    path, which the fixture oracle in turn pins against DuckDB."""
    q_n = min(n, 100_000)
    queries = emb.filter(F.col("vec_id") < q_n).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    t0 = time.perf_counter()
    res = knn.topk_blockjoin(
        emb, queries, k=10, n_corpus_hint=n, n_queries_hint=q_n
    )
    cnt = res.count()
    t = time.perf_counter() - t0
    ncb = -(-n // knn.BLOCK_ROWS_CORPUS)
    nqb = -(-q_n // knn.BLOCK_ROWS_QUERIES)
    print(
        f"blockjoin Q={q_n}: {t:6.2f}s ({cnt} rows over {ncb}x{nqb} block "
        f"pairs; {q_n * n / t / 1e6:,.0f}M scored pairs/s wall)"
    )
    sub = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    ).toPandas()
    sub["query_vec"] = sub["query_vec"].map(list)
    a = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in res.filter(F.col("query_id") < 50).collect()
    }
    b = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in knn.topk_pandas(emb, sub, k=10).collect()
    }
    print(f"50-query subset equals BLAS path: {a == b} ({len(a)} result rows)")


def run_hybrid(spark, emb, n: int, d: int) -> None:
    """Catalog hybrid search at scale: ingest n chunks, build the lexical
    sidecar once, then measure (a) the cold sidecar build, (b) the warm
    hybrid query (partition-pruned postings + vector leg + RRF), and
    (c) a single-chunk delta — which must stay partition-scoped (wall
    independent of n up to the touched-partition rewrite)."""
    import shutil
    import tempfile

    from vectordb_from_scratch_spark.catalog import VectorCatalog

    root = tempfile.mkdtemp(prefix="stress_hybrid_")
    try:
        cat = VectorCatalog(spark, root)
        lib = cat.create_library("stress", d)
        doc = cat.create_document(lib, "d1")
        rng = np.random.default_rng(7)
        vocab = [f"w{i:04d}" for i in range(2000)]
        texts = [
            " ".join(rng.choice(vocab, size=24)) + (" needle" if i % 997 == 0 else "")
            for i in range(n)
        ]
        vecs = rng.standard_normal((n, d)).astype("float32")
        t0 = time.perf_counter()
        cat.add_chunks(
            lib,
            doc,
            [{"text": t, "embedding": v.tolist()} for t, v in zip(texts, vecs)],
            ids=[f"c{i:07d}" for i in range(n)],
        )
        t_ingest = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = cat.search_hybrid(lib, "needle w0001", k=10)
        t_cold = time.perf_counter() - t0  # includes the sidecar build
        t0 = time.perf_counter()
        res = cat.search_hybrid(lib, "needle w0002", k=10)
        t_warm = time.perf_counter() - t0
        print(
            f"hybrid n={n}: ingest {t_ingest:6.2f}s, first query (builds "
            f"sidecar) {t_cold:6.2f}s, warm query {t_warm:6.2f}s "
            f"({len(res)} results)"
        )
        def index_bytes():
            import os

            total = 0
            for base, _, files in os.walk(cat._index_dir(lib)):
                total += sum(os.path.getsize(os.path.join(base, f)) for f in files)
            return total

        size0 = index_bytes()
        t0 = time.perf_counter()
        cat.add_chunks(
            lib,
            doc,
            [{"text": "needle needle needle probe", "embedding": vecs[0].tolist()}],
            ids=["delta-0"],
        )
        t_delta = time.perf_counter() - t0
        written = index_bytes() - size0
        res = cat.search_hybrid(lib, "needle", k=3)
        hit = "delta-0" in [r.chunk_id for r in res]
        print(
            f"hybrid delta: single-chunk add {t_delta:6.2f}s, index grew "
            f"{written/1024:.0f} KB (append-only segment + tombstone + one "
            f"doclens partition — write volume O(delta), not O(vocabulary)); "
            f"new chunk served: {hit}"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


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


def run_wide(spark, emb, n: int, d: int, n_queries: int, qpdf) -> None:
    """The d=1024 design point (VERDICT r9 #3): the reference's actual
    embedding width (Cohere embed-english-v3.0) is 16x the d=64 every
    other SCALE.md row measures, which changes Arrow batch economics,
    score-matrix chunk shapes, PQ subspace width (128-dim subspaces at
    m=8), and the blocked near-dup bucket fill. Runs the ANN tiers +
    blocked near-dup; deliberately SKIPS the all-pairs kernel (honestly
    quadratic — 16x the flops would be an hour of measured nothing-new;
    the blocking threshold already documents when not to run it)."""
    from vectordb_from_scratch_spark.operators import dedup, hnsw, pq, quantization

    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )

    for tag in ("cold", "warm"):
        # cold includes the first full-corpus parquet read + Arrow pass
        # (n*d*8 bytes — 1.6 GB at 200k×1024); warm is the serve rate
        t0 = time.perf_counter()
        cnt = knn.topk_pandas(emb, qpdf, k=10).count()
        t = time.perf_counter() - t0
        print(f"flat BLAS kNN ({tag}) Q={n_queries}: {t:6.2f}s  ({cnt} rows, "
              f"{n * n_queries / t / 1e6:.0f}M scores/s)")

    t0 = time.perf_counter()
    cents = ivf.train_centroids(emb)
    asg = ivf.assign(emb, cents).persist()
    asg.count()
    t_build = time.perf_counter() - t0
    for tag in ("cold", "warm"):
        t0 = time.perf_counter()
        cnt = ivf.search(emb, cents, asg, queries, k=10).count()
        t_ivf = time.perf_counter() - t0
        print(f"IVF build: {t_build:6.2f}s  search ({tag}) Q={n_queries}: "
              f"{t_ivf:6.2f}s ({cnt} rows)")
    asg.unpersist()

    t0 = time.perf_counter()
    enc = quantization.sq8_encode_pandas(emb).persist()
    enc.count()
    t_enc = time.perf_counter() - t0
    sq_qpdf = (
        enc.filter(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("query_id"), "codes", "norm2")
        .toPandas()
    )
    sq_qpdf["codes"] = sq_qpdf["codes"].map(list)
    t0 = time.perf_counter()
    cnt = quantization.sq8_topk_pandas(enc, sq_qpdf, k=10).count()
    t_sq = time.perf_counter() - t0
    print(f"SQ8 encode: {t_enc:6.2f}s  search Q={n_queries}: {t_sq:6.2f}s "
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
    print(f"PQ build: {t_pq_build:6.2f}s  ADC+rerank Q={n_queries}: {t_pq:6.2f}s "
          f"({cnt} rows; {d // pq.M_SUBSPACES}-dim subspaces)")
    codes.unpersist()

    shards = max(hnsw.SHARDS, n // 25_000)
    t0 = time.perf_counter()
    g = hnsw.build_graphs(emb, shards=shards).persist()
    g.count()
    t_hb = time.perf_counter() - t0
    qp = qpdf.iloc[:20]
    t0 = time.perf_counter()
    res = hnsw.search_graphs(g, qp, k=10).collect()
    t_hs = time.perf_counter() - t0
    got = {(r["query_id"], r["vec_id"]) for r in res}
    want = {
        (r["query_id"], r["vec_id"])
        for r in knn.topk_pandas(emb, qp, k=10).collect()
    }
    print(
        f"hnsw build: {t_hb:6.2f}s at {shards} shards; serve Q=20: "
        f"{t_hs:6.2f}s; recall@10 = {len(got & want) / len(want):.3f}"
    )
    g.unpersist()

    run_neardup(spark, emb, n, d)


def run_zorder(spark, n: int) -> None:
    """Z-order vs size-split layout at scale: same rows, same file count,
    same 2-D box — measure (a) how many files' footer stats can skip the
    box and (b) the filter+agg wall time on each layout. The zorder
    claim in SCALE.md is this measurement, not an asymptotic argument."""
    import glob

    import pyarrow.parquet as pa
    from pyspark.sql import functions as F

    from vectordb_from_scratch_spark.operators.layout import _morton_expr

    n_files = 64
    u_max, v_max = 1500, 560.0
    ev = (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            F.pmod(F.xxhash64("id"), F.lit(u_max)).alias("user_id"),
            # skewed toward small values, like the fixture
            (
                F.pow(F.pmod(F.xxhash64(F.col("id") + 7), F.lit(100000)) / 100000.0, 2.0)
                * v_max
            ).alias("value"),
        )
    )
    nat_path, z_path = f"/tmp/stress_nat_{n}", f"/tmp/stress_z_{n}"
    t0 = time.perf_counter()
    ev.repartition(n_files).write.mode("overwrite").parquet(nat_path)
    t_nat = time.perf_counter() - t0
    ub = f"least(255, CAST(user_id * 256 DIV {u_max} AS INT))"
    vb = f"least(255, CAST(floor(value / {v_max} * 256) AS INT))"
    t0 = time.perf_counter()
    (
        ev.withColumn("zub", F.expr(ub))
        .withColumn("zvb", F.expr(vb))
        .withColumn("zcode", F.expr(_morton_expr("zub", "zvb")))
        .repartitionByRange(n_files, "zcode")
        .sortWithinPartitions("zcode")
        .drop("zub", "zvb", "zcode")
        .write.mode("overwrite")
        .parquet(z_path)
    )
    t_z = time.perf_counter() - t0
    print(f"write: natural {t_nat:.1f}s, zorder {t_z:.1f}s (the clustering premium)")

    box = dict(u0=100, u1=460, v0=50.0, v1=150.0)  # ~24% x ~18% of the space

    def skippable(path: str) -> tuple[int, int]:
        files = glob.glob(path + "/*.parquet")
        skip = 0
        for f in files:
            md = pa.ParquetFile(f).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            lo_u = min(md.row_group(g).column(idx["user_id"]).statistics.min for g in range(md.num_row_groups))
            hi_u = max(md.row_group(g).column(idx["user_id"]).statistics.max for g in range(md.num_row_groups))
            lo_v = min(md.row_group(g).column(idx["value"]).statistics.min for g in range(md.num_row_groups))
            hi_v = max(md.row_group(g).column(idx["value"]).statistics.max for g in range(md.num_row_groups))
            if hi_u < box["u0"] or lo_u > box["u1"] or hi_v < box["v0"] or lo_v > box["v1"]:
                skip += 1
        return skip, len(files)

    for name, path in (("natural", nat_path), ("zorder", z_path)):
        df = spark.read.parquet(path)
        t0 = time.perf_counter()
        cnt = (
            df.filter(
                (F.col("user_id").between(box["u0"], box["u1"]))
                & (F.col("value").between(box["v0"], box["v1"]))
            ).count()
        )
        dt = time.perf_counter() - t0
        s, tot = skippable(path)
        print(f"{name}: box-count {cnt} in {dt:.2f}s; skippable files {s}/{tot}")


def run_hnsw(spark, emb, n: int, d: int, qpdf) -> None:
    """Sharded NSW at scale: build rate per shard (the Python insert loop
    is the cost), serve latency over the cached graph, and measured
    recall vs the exact scan — plus the shard-count scaling rule (shards
    grow with N so per-shard build time stays bounded; build parallelism
    = shards, so wall time is the per-shard rate, not N)."""
    from vectordb_from_scratch_spark.operators import hnsw

    shards = max(hnsw.SHARDS, n // 25_000)  # bound ~25k nodes/shard
    t0 = time.perf_counter()
    g = hnsw.build_graphs(emb, shards=shards).cache()
    g.count()
    t_build = time.perf_counter() - t0
    print(
        f"hnsw build: {t_build:6.2f}s at {shards} shards "
        f"(~{n // shards} nodes/shard, {n / t_build:.0f} inserts/s wall)"
    )
    qp = qpdf.iloc[:20]
    t0 = time.perf_counter()
    res = hnsw.search_graphs(g, qp, k=10).collect()
    t_serve = time.perf_counter() - t0
    got = {(r["query_id"], r["vec_id"]) for r in res}
    exact = knn.topk_pandas(emb, qp, k=10).collect()
    want = {(r["query_id"], r["vec_id"]) for r in exact}
    print(
        f"hnsw serve Q=20: {t_serve:6.2f}s; recall@10 = "
        f"{len(got & want) / len(want):.3f} vs exact "
        f"(merge input <= shards*Q*k = {shards * 20 * 10} rows)"
    )


def run_hnsw_routed(spark, emb, n: int, d: int, qpdf) -> None:
    """Routed (IVF-cluster-partitioned) graphs vs full fan-out at scale:
    the measurement behind SCALE.md's 'routed composition' claim — probe
    pruning should cut serve cost at a bounded recall price (the IVF
    probe ceiling), with build cost comparable (same total inserts)."""
    from vectordb_from_scratch_spark.operators import hnsw

    cents = ivf.train_centroids(emb)  # 64 clusters, sampled driver-side
    assigns = ivf.assign(emb, cents)
    joined = emb.join(assigns, "vec_id").withColumnRenamed("cluster_id", "shard")
    t0 = time.perf_counter()
    g = hnsw.build_graphs_by(joined, "shard").cache()
    g.count()
    t_build = time.perf_counter() - t0
    print(f"routed build: {t_build:6.2f}s over 64 cluster graphs")
    qp = qpdf.iloc[:20]
    exact = knn.topk_pandas(emb, qp, k=10).collect()
    want = {(r["query_id"], r["vec_id"]) for r in exact}
    for probes in (8, 16, 32):
        pr = ivf.probe_clusters(
            cents, list(zip(qp["query_id"], qp["query_vec"])), probes
        )
        t0 = time.perf_counter()
        res = hnsw.routed_search(g, qp, pr, k=10).collect()
        t = time.perf_counter() - t0
        got = {(r["query_id"], r["vec_id"]) for r in res}
        print(
            f"routed serve Q=20 probes={probes}/64: {t:5.2f}s "
            f"recall={len(got & want) / len(want):.3f}"
        )


def run_hnsw_bounded(spark, emb, n: int, d: int, qpdf) -> None:
    """The shard-sizing rule enforced: same clusters as hnswrouted, but
    members-per-graph bounded at 25k (oversized clusters split into md5
    sub-shards; probes expand to all sub-shards of a probed cluster).
    Compare against hnswrouted's unbounded numbers at the same N."""
    from vectordb_from_scratch_spark.operators import hnsw

    cents = ivf.train_centroids(emb)
    assigns = ivf.assign(emb, cents)
    joined = emb.join(assigns, "vec_id").withColumnRenamed("cluster_id", "shard")
    t0 = time.perf_counter()
    g, nsub = hnsw.build_graphs_bounded(joined, "shard")
    g = g.cache()
    n_graphs = g.select("shard").distinct().count()
    t_build = time.perf_counter() - t0
    print(
        f"bounded build: {t_build:6.2f}s over {n_graphs} graphs "
        f"(max members {hnsw.GRAPH_MAX_MEMBERS}; split clusters: "
        f"{sum(1 for v in nsub.values() if v > 1)}/{len(nsub)})"
    )
    qp = qpdf.iloc[:20]
    exact = knn.topk_pandas(emb, qp, k=10).collect()
    want = {(r["query_id"], r["vec_id"]) for r in exact}
    for probes in (8, 16):
        pr = ivf.probe_clusters(
            cents, list(zip(qp["query_id"], qp["query_vec"])), probes
        )
        t0 = time.perf_counter()
        res = hnsw.routed_search(g, qp, hnsw.expand_probes(pr, nsub), k=10).collect()
        t = time.perf_counter() - t0
        got = {(r["query_id"], r["vec_id"]) for r in res}
        print(
            f"bounded serve Q=20 probes={probes}/64: {t:5.2f}s "
            f"recall={len(got & want) / len(want):.3f}"
        )


def run_semprune(spark, emb, n: int, d: int) -> None:
    """SemDeDup at scale: with the member cap, total compute is
    N·cap·d/2 (linear in N) and per-task memory is O(chunk·cap) —
    measure wall time and the shard layout so the linearity claim in
    SCALE.md is a number, not an asymptote. k is held at the fixture's
    64 clusters precisely to FORCE skewed oversized clusters (2M/64 =
    31k members ≫ cap), the failure mode this bound exists for."""
    from vectordb_from_scratch_spark.operators import dedup

    cents = ivf.train_centroids(emb)
    asg = ivf.assign(emb, cents).persist()
    k_clusters = asg.select("cluster_id").distinct().count()
    t0 = time.perf_counter()
    res = dedup.semantic_prune(emb, asg)
    n_pruned = res.filter(F.col("action") == "prune").count()
    t = time.perf_counter() - t0
    import math

    n_shards = sum(
        math.ceil(r["c"] / dedup.SEMANTIC_MAX_MEMBERS)
        for r in asg.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    print(
        f"semprune n={n}: {t:6.2f}s ({n_pruned} pruned of {n}; "
        f"{k_clusters} clusters -> {n_shards} bounded shards of "
        f"<=~{dedup.SEMANTIC_MAX_MEMBERS}; per-task mem <= "
        f"{dedup._SEM_CHUNK * dedup.SEMANTIC_MAX_MEMBERS * 8 / 1e6:.0f}MB)"
    )
    asg.unpersist()


def run_winnow(spark, n: int) -> None:
    """Winnow partial-overlap pairs at corpus scale, with the DERIVED
    hot-posting cap (max(5, ceil(log2 n_docs))): synthesize n docs of
    unique words, inject a 12-word boilerplate sentence into EVERY doc
    (its inner prints have df = n — the cap must drop them or the
    inverted-index self-join is n²/2), and copy a 20-word run from the
    previous doc into 1% of docs (true partial overlaps the cap must
    keep: 20 >= w+k-1 guarantees >= WINNOW_MIN_SHARED shared prints).
    Print wall + emitted pair volume so 'bounded as N grows' is a
    number: pairs <= cap · postings, i.e. O(N log N), never N²."""
    import math

    import pandas as pd

    from vectordb_from_scratch_spark.operators import dedup

    boiler = " ".join(f"commonboiler{i}" for i in range(12))
    rows = []
    for i in range(n):
        words = [f"w{i}x{j}" for j in range(48)]
        if i % 100 == 1:  # copy a 20-word run from the previous doc
            words[14:34] = [f"w{i - 1}x{j}" for j in range(10, 30)]
        rows.append((i, " ".join(words[:24]) + " " + boiler + " " + " ".join(words[24:])))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    path = f"/tmp/stress_docs_{n}"
    spark.createDataFrame(pdf).repartition(32).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    docs.count()

    cap = max(dedup.WINNOW_MIN_POSTING_CAP, math.ceil(math.log2(n)))
    t0 = time.perf_counter()
    pairs = dedup.winnow_overlap_pairs_from(docs)
    n_pairs = pairs.count()
    t = time.perf_counter() - t0
    n_true = pairs.filter(F.col("doc_b") - F.col("doc_a") == 1).count()
    expected = sum(1 for i in range(n) if i % 100 == 1)
    print(
        f"winnow n={n}: {t:6.2f}s  derived cap={cap}; {n_pairs} pairs emitted "
        f"({n_true}/{expected} planted adjacent overlaps found; boilerplate "
        f"df={n} prints capped — pair volume O(N log N), not N²)"
    )


def run_betw(spark, n_orders: int) -> None:
    """Sampled-source betweenness + closeness on the planted-pathology
    graph corpus (hub part on 1-in-5 orders — the frontier×adjacency
    joins inherit raw-degree skew exactly like the walk family): measure
    each kernel's wall and the forward state volume so 'state ≤
    seeds·|V|' is a number, not an asymptote."""
    from vectordb_from_scratch_spark.operators import graph

    items, edges, P, n_items, m, t_edges = _graph_corpus(spark, n_orders)
    sym = graph._sym(edges).repartition("a").persist()
    sym.count()
    nv = sym.select("a").distinct().count()

    t0 = time.perf_counter()
    betw = graph.betweenness_sampled(edges, sym=sym)
    nb = betw.count()
    t_b = time.perf_counter() - t0

    t0 = time.perf_counter()
    close = graph.closeness_sampled(edges, sym=sym)
    nc = close.count()
    t_c = time.perf_counter() - t0
    print(
        f"betw n_orders={n_orders}: edges {m} ({t_edges:.1f}s), |V|={nv}; "
        f"betweenness {t_b:6.2f}s ({nb} scored rows, state <= "
        f"{graph.BETW_SEEDS}*{nv}={graph.BETW_SEEDS * nv}); "
        f"closeness {t_c:6.2f}s ({nc} seeds)"
    )
    sym.unpersist()
    edges.unpersist()
    items.unpersist()


def run_pca(spark, n: int, d: int) -> None:
    """The PCA moment pass at synthetic corpus scale: the claim under
    test is that shuffle volume is d² PER ARROW BATCH — independent of
    corpus rows — so wall tracks the scan, not the reduction. Also times
    the JL projection (map-side, zero exchanges) on the same frame."""
    import numpy as np

    from vectordb_from_scratch_spark.operators import pca

    rng = np.random.default_rng(42)
    path = f"/tmp/stress_pca_{n}_{d}"
    (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(d - 1)),
                lambda i: F.sin(F.col("id") * 0.37 + i * 1.13),
            ).alias("embedding"),
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(path + "/embeddings.parquet")
    )

    t0 = time.perf_counter()
    mu, v1, eig1, v2, eig2, trace = pca.fit_pca2(spark, path)
    t_fit = time.perf_counter() - t0
    t0 = time.perf_counter()
    cnt = pca.embedding_jl_project(spark, path).count()
    t_jl = time.perf_counter() - t0
    print(
        f"pca n={n} d={d}: moment pass + eigensolve {t_fit:6.2f}s "
        f"(shuffle = {d}+{d * d} cells/batch, corpus-row-independent); "
        f"jl project {t_jl:6.2f}s ({cnt} rows, zero-Exchange map pass); "
        f"explained l1/trace={eig1 / trace:.3f}"
    )


def _bpe_corpus(spark, n: int) -> str:
    """n-distinct-word synthetic corpus (the fixture has 31 — here the
    distinct-word table is the workload): random 6-12-char words over an
    8-letter alphabet in 50-word docs, plus a 200-word Zipf-ish head
    repeated in every doc so the learned merges are non-degenerate."""
    import random

    import pandas as pd

    rng = random.Random(42)
    alpha = "abcdefgh"
    head = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(4, 8)))
        for _ in range(200)
    ]
    rows, wid = [], 0
    n_docs = max(1, n // 50)
    for i in range(n_docs):
        words = [
            f"{''.join(rng.choice(alpha) for _ in range(rng.randint(6, 12)))}{wid + j}"
            for j in range(50)
        ]
        wid += 50
        words += rng.sample(head, 10)
        rows.append((i, " ".join(words)))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    path = f"/tmp/stress_bpe_{n}"
    spark.createDataFrame(pdf).repartition(32).write.mode("overwrite").parquet(
        path + "/documents.parquet"
    )
    return path


def run_bpe(spark, n: int) -> None:
    """The RETIRED r8 per-round distributed trainer at a web-scale-shaped
    vocabulary — kept for comparison against `bpe_local`. Prints the
    one-time corpus aggregation wall and the per-round wall separately:
    the scale claim is that rounds cost O(vocab · word_len) — they never
    rescan the corpus."""
    from vectordb_from_scratch_spark.operators import bpe

    path = _bpe_corpus(spark, n)

    t0 = time.perf_counter()
    from vectordb_from_scratch_spark.registry import track_persist

    wf = track_persist(bpe.word_frequencies(spark, path))
    n_vocab = wf.count()
    t_corpus = time.perf_counter() - t0

    words = wf.coalesce(max(1, min(32, n_vocab // 65536 + 1)))
    walls = []
    for rank in range(1, 11):
        t0 = time.perf_counter()
        best = (
            bpe._pair_counts(words)
            .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )[0]
        walls.append(time.perf_counter() - t0)
        words = words.withColumn(
            "s", bpe.merge_pair(F.col("s"), best["l"], best["r"])
        )
        if rank % 4 == 0:
            words = track_persist(words)
    print(
        f"bpe vocab={n_vocab}: corpus agg {t_corpus:6.2f}s; "
        f"10 rounds {sum(walls):6.2f}s (per-round min/median/max "
        f"{min(walls):.2f}/{sorted(walls)[len(walls) // 2]:.2f}/{max(walls):.2f}s "
        f"— rounds touch only the distinct-word table)"
    )


def run_minhash_incr(spark, n: int) -> None:
    """Incremental MinHash-LSH maintenance at design point (r9): n docs
    of 30 unique words with a planted near-dup every 100 docs, split
    90/10. Times (a) the FULL band self-join over everything — the
    nightly cost WITHOUT maintenance — vs (b) the delta regime: base
    band table precomputed and persisted (the maintained state), pay
    only delta signatures + the two delta-sided band joins."""
    import pandas as pd

    from vectordb_from_scratch_spark import registry
    from vectordb_from_scratch_spark.operators import dedup

    rows = []
    for i in range(n):
        words = [f"w{i}x{j}" for j in range(30)]
        # plant near-dups in BOTH regimes: (6,7) mod 100 stays entirely
        # in the base (its pairs ride the carried state), (39,40) mod
        # 100 has its higher doc in the delta (its pairs must come from
        # the delta joins) — so neither path can be vacuously fast
        if i % 100 in (7, 40):
            words = [f"w{i - 1}x{j}" for j in range(27)] + [
                f"w{i}x{j}" for j in range(27, 30)
            ]
        rows.append((i, " ".join(words)))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    path = f"/tmp/stress_mh_{n}"
    spark.createDataFrame(pdf).repartition(32).write.mode("overwrite").parquet(
        path + "/documents.parquet"
    )
    docs = spark.read.parquet(path + "/documents.parquet")
    docs.count()

    def pair_counts(left, right):
        a, b = left.alias("a"), right.alias("b")
        return (
            a.join(
                b,
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .agg(F.count(F.lit(1)).alias("n_shared_bands"))
        )

    t0 = time.perf_counter()
    all_bands = dedup.minhash_bands(dedup.minhash_signatures(docs)).persist()
    n_full = pair_counts(all_bands, all_bands).count()
    t_full = time.perf_counter() - t0
    all_bands.unpersist()
    registry.release_tracked()

    base = docs.filter(F.col("doc_id") % 10 != 0)
    delta = docs.filter(F.col("doc_id") % 10 == 0)
    # the maintained state is stored PRE-PARTITIONED on the band key
    # (bucketed at 100 TB): the delta joins then reuse its partitioning
    # and exchange only the delta side — without this the "incremental"
    # join silently re-shuffles the whole base band table every night
    base_bands = (
        dedup.minhash_bands(dedup.minhash_signatures(base))
        .repartition(64, "band_id", "band_key")
        .persist()
    )
    base_bands.count()  # materialized OUTSIDE the timer
    t0 = time.perf_counter()
    delta_bands = dedup.minhash_bands(dedup.minhash_signatures(delta)).persist()
    a, b = base_bands.alias("a"), delta_bands.alias("b")
    cross = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key")),
        )
        .groupBy(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )
    n_new = cross.unionByName(pair_counts(delta_bands, delta_bands)).count()
    t_delta = time.perf_counter() - t0
    print(
        f"minhash_incr n_docs={n}: full self-join {t_full:6.2f}s "
        f"({n_full} pairs) vs delta-only maintenance {t_delta:6.2f}s "
        f"({n_new} new-pair rows) — {t_full / max(t_delta, 1e-9):.1f}x"
    )
    base_bands.unpersist()
    delta_bands.unpersist()


def run_bpe_local(spark, n: int, n_merges: int = 1024) -> None:
    """The r9 production trainer (VERDICT r8 #3) at a web-scale-shaped
    vocabulary: one distributed corpus aggregation + bounded collect,
    then the exact driver-side heap loop to ``n_merges``, then the
    rank-priority encoding pass over the distinct-word table. The scale
    claims: the merge loop is corpus-independent (it sees only the
    bounded word-count table) and encoding is one Arrow pass over the
    Heaps-law vocabulary."""
    from vectordb_from_scratch_spark.operators import bpe
    from vectordb_from_scratch_spark.registry import track_persist

    path = _bpe_corpus(spark, n)

    t0 = time.perf_counter()
    wf = track_persist(bpe.word_frequencies(spark, path))
    n_vocab = wf.count()
    collected = (
        wf.select("word", "freq")
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(bpe.BPE_TRAIN_WORDS)
        .collect()
    )
    t_corpus = time.perf_counter() - t0

    t0 = time.perf_counter()
    merges = bpe.train_merges_local(
        [(r["word"], r["freq"]) for r in collected], n_merges
    )
    t_train = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_rows = bpe.encode_token_counts(wf, merges).agg(
        F.count(F.lit(1)), F.sum("n_tokens")
    ).collect()[0]
    t_encode = time.perf_counter() - t0
    print(
        f"bpe_local vocab={n_vocab}: corpus agg+collect {t_corpus:6.2f}s; "
        f"{len(merges)} merges trained in {t_train:6.2f}s "
        f"({len(merges) / max(t_train, 1e-9):,.0f} merges/s, driver-side); "
        f"rank-priority encode of {n_rows[0]} words "
        f"({int(n_rows[1])} tokens) {t_encode:6.2f}s"
    )


def run_dupspan(spark, n: int) -> None:
    """Exact-substring dedup at corpus scale, on the same adversarial
    corpus shape as run_winnow: a 12-word boilerplate sentence in EVERY
    doc (df = n — exactly the text substring dedup exists to cut) plus a
    20-word run copied from the previous doc into 1% of docs. The design
    claim to verify: everything is occurrence-LINEAR (a shingle shared by
    M docs costs M rows, never M² — there is no pair join in the plan),
    so wall should scale ~N and the boilerplate needs no cap. Also scores
    the corpus with the in-engine classifier (T codegen agg passes) —
    the train+score wall is the whole measurement."""
    import pandas as pd

    from vectordb_from_scratch_spark.operators import classifier, dedup

    boiler = " ".join(f"commonboiler{i}" for i in range(12))
    rows = []
    for i in range(n):
        words = [f"w{i}x{j}" for j in range(48)]
        if i % 100 == 1:  # copy a 20-word run from the previous doc
            words[14:34] = [f"w{i - 1}x{j}" for j in range(10, 30)]
        rows.append(
            (
                i,
                " ".join(words[:24]) + " " + boiler + " " + " ".join(words[24:]),
                "en" if i % 3 == 0 else "de",
            )
        )
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    path = f"/tmp/stress_docs_span_{n}"
    spark.createDataFrame(pdf).repartition(32).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    docs.count()

    t0 = time.perf_counter()
    cov = dedup.span_coverage(docs).persist()
    n_rows = cov.count()
    t_cov = time.perf_counter() - t0
    stats = cov.agg(
        F.avg("dup_coverage").alias("avg"),
        F.sum("covered_tokens").alias("cut"),
        F.sum("n_tokens").alias("tot"),
    ).collect()[0]
    planted = cov.filter(F.col("doc_id") % 100 == 1).agg(
        F.avg("covered_tokens").alias("c")
    ).collect()[0]["c"]
    cov.unpersist()
    t0 = time.perf_counter()
    cut = dedup.cut_dup_spans(docs)
    kept = cut.agg(F.sum("kept_tokens").alias("k")).collect()[0]["k"]
    t_cut = time.perf_counter() - t0
    t0 = time.perf_counter()
    scored = classifier.score_documents(docs)
    # agg over score (not count(): count prunes the score projection and
    # would time only the training chain, not the corpus-wide scoring pass)
    row = scored.agg(
        F.count(F.lit(1)).alias("n"), F.avg("score").alias("avg_score")
    ).collect()[0]
    n_scored, avg_score = row["n"], row["avg_score"]
    t_clf = time.perf_counter() - t0
    print(
        f"dupspan n={n}: coverage {t_cov:6.2f}s ({n_rows} rows, "
        f"avg coverage {stats['avg']:.3f}, planted docs avg covered "
        f"{planted:.1f} tokens); cut {t_cut:6.2f}s "
        f"(corpus {stats['tot']} -> {kept} tokens, "
        f"{stats['cut']} duplicated cut); classifier train+score "
        f"{t_clf:6.2f}s ({n_scored} rows, avg score {avg_score:.2e}) — "
        f"all occurrence-linear, no pair join"
    )



def run_simhash(spark, n: int) -> None:
    """Block-combination SimHash banding (VERDICT r10 #1) at corpus scale:
    n docs of 48 distinct synthetic words, 1-in-100 a near-copy of its
    predecessor (differs in 5 of 48 words — Hamming-close fingerprints).
    Claims to verify:

    - candidate volume ~ planted pairs + hash noise, NOT ~n²: the old
      8x4-bit banding had 16 possible buckets per band, so its banded
      join examined ~n²/2 pairs (6x10^10 at 400k) regardless of data;
      the 16-bit pair keys give 28·n²/2^16 worst-case and far less on
      real (spread-out) fingerprints;
    - planted-pair recall 100% (banding is EXACT for Hamming <= 6);
    - wall ~linear in n.
    """
    import pandas as pd

    from vectordb_from_scratch_spark import registry
    from vectordb_from_scratch_spark.operators import dedup

    rows = []
    for i in range(n):
        words = [f"w{i}x{j}" for j in range(48)]
        if i % 100 == 1:  # near-copy: 5 of 48 words differ
            words = [f"w{i - 1}x{j}" for j in range(43)] + [
                f"w{i}x{j}" for j in range(43, 48)
            ]
        rows.append((i, " ".join(words)))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    path = f"/tmp/stress_docs_simhash_{n}"
    spark.createDataFrame(pdf).repartition(32).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    docs.count()

    t0 = time.perf_counter()
    sig = dedup.simhash_signatures(docs).persist()
    n_sig = sig.count()
    t_sig = time.perf_counter() - t0

    t0 = time.perf_counter()
    cand = dedup.simhash_candidate_pairs(sig).persist()
    n_cand = cand.count()
    t_cand = time.perf_counter() - t0

    t0 = time.perf_counter()
    hamming = sum(
        F.bit_count(F.col(f"ha{j}").bitwiseXOR(F.col(f"hb{j}")))
        for j in range(dedup.SIMHASH_N_BLOCKS)
    )
    out = cand.filter(hamming <= dedup._HAMMING_MAX).select(
        "doc_a", "doc_b", hamming.cast("long").alias("hamming")
    )
    planted = out.filter(
        (F.col("doc_b") == F.col("doc_a") + 1) & (F.col("doc_b") % 100 == 1)
    ).count()
    n_pairs = out.count()
    t_filter = time.perf_counter() - t0
    # exactness denominator: of the planted pairs, how many are TRULY at
    # Hamming <= 6? (5-of-48-word edits often land past the threshold —
    # banding promises every <=6 pair, not every planted edit.) Direct
    # per-pair join over the 1-in-100 planted ids — O(n/100), no quadratic.
    sa = sig.select(*[F.col(c).alias(f"{c}_a") for c in sig.columns])
    sb = sig.select(*[F.col(c).alias(f"{c}_b") for c in sig.columns])
    truth = (
        sa.filter((F.col("doc_id_a") % 100 == 0))
        .join(sb, F.col("doc_id_b") == F.col("doc_id_a") + 1)
        .select(
            sum(
                F.bit_count(
                    F.col(f"b{j}_a").bitwiseXOR(F.col(f"b{j}_b"))
                )
                for j in range(dedup.SIMHASH_N_BLOCKS)
            ).alias("h")
        )
    )
    n_true = truth.filter(F.col("h") <= dedup._HAMMING_MAX).count()
    sig.unpersist()
    cand.unpersist()
    registry.release_tracked()
    quad = n * (n - 1) // 4  # the old fixed-16-bucket candidate volume ~n²/2 over 8 bands /4
    print(
        f"simhash n={n}: sig {t_sig:6.2f}s ({n_sig} docs) | "
        f"candidates {t_cand:6.2f}s -> {n_cand} "
        f"({n_cand / max(quad, 1):.2e} of old ~n^2/2 regime; theory "
        f"28n^2/2^17={28 * n * n / (1 << 17):.2e}) | "
        f"filter {t_filter:6.2f}s -> {n_pairs} pairs, "
        f"planted-at-<=6 recall {planted}/{n_true}"
    )


def run_fuzzy(spark, n: int) -> None:
    """Name-level fuzzy join (VERDICT r10 #2) at corpus scale: n parts
    over a name vocabulary that GROWS with n (n/4 distinct names, 4 parts
    per name), names are 9-hex-char tags + a shared head noun — so the
    old last-token blocking degenerates to ONE block (n²/2 levenshtein
    evals: 8x10^10 at 400k) while the Ed-Join prefix filter sees diverse
    grams. 1-in-50 names is a planted 1-char edit of another name.
    Claims: candidate NAME pairs ~ planted + noise (not vocab²/2), 100%
    planted recall, wall ~linear in n."""
    import hashlib

    import pandas as pd

    from vectordb_from_scratch_spark import registry
    from vectordb_from_scratch_spark.operators import textstats

    n_names = n // 4
    names = []
    for v in range(n_names):
        tag = hashlib.md5(f"name{v}".encode()).hexdigest()[:9]
        if v % 50 == 1:  # planted: 1-char edit of the previous name's tag
            base = hashlib.md5(f"name{v - 1}".encode()).hexdigest()[:9]
            tag = ("z" if base[0] != "z" else "y") + base[1:]
        names.append(f"{tag} widget")
    rows = [(i, names[i % n_names]) for i in range(n)]
    pdf = pd.DataFrame(rows, columns=["p_partkey", "p_name"])
    path = f"/tmp/stress_parts_fuzzy_{n}"
    spark.createDataFrame(pdf).repartition(32).write.mode("overwrite").parquet(path)
    sf_dir = f"/tmp/stress_fuzzy_sf_{n}"
    import os
    import shutil

    os.makedirs(sf_dir, exist_ok=True)
    shutil.rmtree(f"{sf_dir}/part.parquet", ignore_errors=True)
    shutil.copytree(path, f"{sf_dir}/part.parquet")

    t0 = time.perf_counter()
    out = textstats.fuzzy_part_name_matches(spark, sf_dir).persist()
    n_out = out.count()
    t_all = time.perf_counter() - t0
    n_planted_names = sum(1 for v in range(n_names) if v % 50 == 1)
    planted_names = (
        out.select("name_a", "name_b").distinct().count()
    )
    out.unpersist()
    registry.release_tracked()
    print(
        f"fuzzy n={n} ({n_names} names, old-blocking regime ~n^2/2="
        f"{n * n // 2:.1e} levenshteins): {t_all:6.2f}s -> {n_out} part pairs, "
        f"{planted_names} matched name pairs (2x{n_planted_names} planted directed)"
    )


def run_prefixjoin(spark, n: int) -> None:
    """Lossless prefix-filtered Jaccard join + DSIR weights at corpus
    scale, on the adversarial corpus shape the PPJoin filter exists for:
    a 12-word boilerplate sentence in EVERY doc (df = n hot shingles — the
    case JACCARD_MAX_POSTING was imposed to survive, at the price of
    recall) plus 1-in-100 docs that near-copy their predecessor
    (shingle Jaccard ~0.8 — the planted truth). Claims to verify:

    - candidate volume ~ planted pairs (the hot boilerplate shingles sort
      to the frequent end of the (df, s) order and never enter a prefix),
      against a full inverted-index join that would be ~C(n,2)-ish;
    - planted-pair recall = 100% with ZERO cap tuning;
    - wall ~linear in n.

    DSIR on the same corpus checks the other new selection operator:
    hashed-bigram bucket aggregation + broadcast log-ratio join, ~linear.
    """
    import pandas as pd

    from vectordb_from_scratch_spark.operators import dedup, sampling

    boiler = " ".join(f"commonboiler{i}" for i in range(12))
    rows = []
    for i in range(n):
        words = [f"w{i}x{j}" for j in range(48)]
        if i % 100 == 1:  # near-copy of the previous doc: differs in 5 words
            words = [f"w{i - 1}x{j}" for j in range(43)] + [
                f"w{i}x{j}" for j in range(43, 48)
            ]
        rows.append(
            (
                i,
                " ".join(words[:24]) + " " + boiler + " " + " ".join(words[24:]),
                "en" if i % 3 == 0 else "de",
            )
        )
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    path = f"/tmp/stress_docs_prefix_{n}"
    spark.createDataFrame(pdf).repartition(32).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    docs.count()

    t0 = time.perf_counter()
    pairs = dedup.jaccard_prefix_pairs(docs).persist()
    n_pairs = pairs.count()
    t_join = time.perf_counter() - t0
    planted = pairs.filter(
        (F.col("doc_b") == F.col("doc_a") + 1) & (F.col("doc_b") % 100 == 1)
    ).count()
    n_planted = (n - 1) // 100 + (1 if (n - 1) % 100 >= 1 else 0)
    jmin = pairs.agg(F.min("jaccard")).collect()[0][0]
    pairs.unpersist()
    from vectordb_from_scratch_spark import registry

    registry.release_tracked()

    t0 = time.perf_counter()
    w = sampling.dsir_log_weights(docs, F.col("lang") == "en")
    row = w.agg(F.count(F.lit(1)).alias("n"), F.avg("log_weight").alias("avg")).collect()[0]
    t_dsir = time.perf_counter() - t0
    registry.release_tracked()
    print(
        f"prefixjoin n={n}: join {t_join:6.2f}s -> {n_pairs} pairs "
        f"(planted recall {planted}/{n_planted}, min jaccard {jmin:.3f}, "
        f"boilerplate df={n} never joined); "
        f"dsir {t_dsir:6.2f}s ({row['n']} docs, avg logw {row['avg']:.3f})"
    )


def _graph_corpus(spark, n_orders: int):
    """Synthetic order/part corpus with BOTH graph pathologies planted
    (shared by the ``graph`` and ``graph2`` modes):

    - a HUB part (pk=0) riding 1 in 5 orders — the degree-skew case the
      degree-ordered triangle orientation exists for: under naive
      id-ordering the minimum-id hub would anchor C(deg_hub, 2) wedges;
    - 1-in-101 orders carry MAX_BASKET+16 distinct parts — past the
      C(B,2) fanout cap, so the derivation must DROP them entirely.

    Generated distributed (spark.range + hash expressions — nothing
    proportional to the graph touches the driver). Returns the persisted
    (items, edges) pair plus the edge-derivation wall."""
    from vectordb_from_scratch_spark.operators import graph

    P = max(n_orders // 5, 1000)
    big_basket = graph.MAX_BASKET + 16
    orders = spark.range(n_orders).select(F.col("id").alias("ok"))
    bsize = F.when(F.col("ok") % 101 == 0, F.lit(big_basket)).otherwise(
        2 + F.pmod(F.xxhash64("ok"), F.lit(11))
    )
    items = orders.select(
        "ok", F.explode(F.sequence(F.lit(0), bsize - F.lit(1))).alias("j")
    ).select("ok", (1 + F.pmod(F.xxhash64("ok", "j"), F.lit(P))).alias("pk"))
    hub = orders.filter(F.col("ok") % 5 == 0).select("ok", F.lit(0).alias("pk"))
    items = items.unionAll(hub).repartition(32).persist()
    n_items = items.count()

    t0 = time.perf_counter()
    edges = graph.copurchase_edges_from_items(items).persist()
    m = edges.count()
    t_edges = time.perf_counter() - t0
    return items, edges, P, n_items, m, t_edges


def run_graph(spark, n_orders: int) -> None:
    """Graph-kernel battery at design point (VERDICT r6 #1): edge
    derivation wall + the cap actually binding, measured wedge volume
    under BOTH orientations (the hub-proofness number), and walls for
    triangles / components / BFS / PageRank (10 iters, and 25 iters with
    the checkpoint_every=8 lineage truncation)."""
    from vectordb_from_scratch_spark import registry
    from vectordb_from_scratch_spark.operators import dedup, graph

    items, edges, P, n_items, m, t_edges = _graph_corpus(spark, n_orders)

    sizes = items.distinct().groupBy("ok").count()
    kept_max = (
        sizes.filter(F.col("count") <= graph.MAX_BASKET)
        .agg(F.max("count"))
        .collect()[0][0]
    )
    dropped = sizes.filter(F.col("count") > graph.MAX_BASKET).count()
    hub_deg = (
        graph._sym(edges.select("src", "dst"))
        .filter(F.col("a") == 0)
        .count()
    )
    print(
        f"graph n_orders={n_orders} P={P}: {n_items} items -> {m} edges "
        f"in {t_edges:6.2f}s (dropped {dropped} over-cap baskets, "
        f"max kept basket {kept_max} <= {graph.MAX_BASKET}, hub degree {hub_deg})"
    )

    # wedge volume under both orientations: the number the degree-ordered
    # formulation exists to bound. id-ordering puts the low-id hub at the
    # apex of C(hub_deg, 2) wedges; degree-ordering orients the hub's
    # edges INTO it.
    c2 = lambda c: (F.col(c) * (F.col(c) - 1) / 2)
    w_deg = (
        graph.oriented_edges(edges.select("src", "dst"))
        .groupBy("u").agg(F.count(F.lit(1)).alias("od"))
        .agg(F.sum(c2("od")).cast("long"), F.max("od"))
        .collect()[0]
    )
    w_id = (
        edges.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
        .agg(F.sum(c2("od")).cast("long"), F.max("od"))
        .collect()[0]
    )
    print(
        f"wedges degree-ordered: {w_deg[0]:,} (max outdeg {w_deg[1]}) vs "
        f"id-ordered: {w_id[0]:,} (max outdeg {w_id[1]}) — "
        f"{w_id[0] / max(w_deg[0], 1):.1f}x fanout avoided"
    )

    t0 = time.perf_counter()
    nt = graph.triangle_counts(edges.select("src", "dst")).count()
    print(f"triangles: {time.perf_counter() - t0:6.2f}s ({nt} nodes in triangles)")
    registry.release_tracked()

    t0 = time.perf_counter()
    nc = dedup.connected_components(
        edges.select("src", "dst"), a_col="src", b_col="dst"
    ).count()
    print(f"components: {time.perf_counter() - t0:6.2f}s ({nc} labeled nodes)")
    registry.release_tracked()

    t0 = time.perf_counter()
    nb = graph.bfs_hops(edges.select("src", "dst")).count()
    print(f"bfs(<= {graph.BFS_MAX_HOPS} hops): {time.perf_counter() - t0:6.2f}s ({nb} reached)")
    registry.release_tracked()

    t0 = time.perf_counter()
    npr = graph.pagerank(edges, weighted=True).count()
    print(f"pagerank 10 iters (weighted): {time.perf_counter() - t0:6.2f}s ({npr} nodes)")
    registry.release_tracked()

    t0 = time.perf_counter()
    npr = graph.pagerank(
        edges, iters=25, weighted=True,
        checkpoint_every=graph.PAGERANK_CHECKPOINT_EVERY,
    ).count()
    print(f"pagerank 25 iters (ckpt/8): {time.perf_counter() - t0:6.2f}s ({npr} nodes)")
    registry.release_tracked()
    edges.unpersist()
    items.unpersist()


def run_graph2(spark, n_orders: int) -> None:
    """Round-6 additions to the graph family, on the same planted-hub /
    oversized-basket corpus as ``run_graph``: clustering coefficients
    (rides the triangle kernel — the marginal cost over triangles is one
    degree aggregate + a join), weighted SSSP (Bellman-Ford, ≤3 hops),
    k-core peeling (the cascade depth is the thing to watch: each round
    is a degree agg + two semi-joins, and the planted hub survives every
    round), and personalized PageRank (8 iters from the hub seed — the
    seed with the worst fanout, since hop 1 reaches ~P nodes).

    k for the k-core is derived from the corpus (median symmetric degree
    ≈ avg basket spread), not the fixture constant, so peeling actually
    cascades instead of deleting everything in round 1."""
    from vectordb_from_scratch_spark import registry
    from vectordb_from_scratch_spark.operators import graph

    items, edges, P, n_items, m, t_edges = _graph_corpus(spark, n_orders)
    print(
        f"graph2 n_orders={n_orders} P={P}: {n_items} items -> {m} edges "
        f"in {t_edges:6.2f}s"
    )

    t0 = time.perf_counter()
    cc = graph.clustering_coeff(edges.select("src", "dst"))
    row = cc.agg(
        F.count(F.lit(1)).alias("n"), F.avg("clustering_coeff").alias("avg")
    ).collect()[0]
    print(
        f"clustering_coeff: {time.perf_counter() - t0:6.2f}s "
        f"({row['n']} nodes, avg {row['avg']:.4f})"
    )
    registry.release_tracked()

    t0 = time.perf_counter()
    ns = graph.sssp_weighted(edges, source=0).count()
    print(
        f"sssp(<= {graph.SSSP_MAX_HOPS} hops, hub seed): "
        f"{time.perf_counter() - t0:6.2f}s ({ns} reached)"
    )
    registry.release_tracked()

    # k at the 25th degree percentile: low enough that a core SURVIVES
    # (k = median peels this corpus to empty — every removal lowers a
    # survivor's degree below the median in turn), high enough that the
    # peeling actually cascades through multiple rounds. Also timed: the
    # peel-to-empty worst case at k = median (maximum cascade depth).
    degs = graph._sym(edges.select("src", "dst")).groupBy("a").agg(
        F.count(F.lit(1)).alias("deg")
    )
    k25, k50 = degs.agg(
        F.expr("percentile_approx(deg, 0.25)"), F.expr("percentile_approx(deg, 0.5)")
    ).collect()[0]
    t0 = time.perf_counter()
    nk = graph.kcore(edges.select("src", "dst"), k=int(k25)).count()
    print(
        f"kcore(k={int(k25)} = p25 degree, {graph.KCORE_ROUNDS} rounds max): "
        f"{time.perf_counter() - t0:6.2f}s ({nk} core nodes)"
    )
    registry.release_tracked()
    t0 = time.perf_counter()
    nk = graph.kcore(edges.select("src", "dst"), k=int(k50)).count()
    print(
        f"kcore(k={int(k50)} = median degree, peel-to-empty worst case): "
        f"{time.perf_counter() - t0:6.2f}s ({nk} core nodes)"
    )
    registry.release_tracked()

    t0 = time.perf_counter()
    npr = graph.personalized_pagerank(edges, source=0).count()
    print(
        f"ppr({graph.PPR_ITERS} iters, hub seed): "
        f"{time.perf_counter() - t0:6.2f}s ({npr} nodes reached)"
    )
    registry.release_tracked()

    t0 = time.perf_counter()
    nl = graph.lpa_communities(edges.select("src", "dst")).count()
    print(
        f"lpa({graph.LPA_ITERS} iters): {time.perf_counter() - t0:6.2f}s "
        f"({nl} labeled nodes)"
    )
    registry.release_tracked()

    t0 = time.perf_counter()
    row = graph.triangle_estimate(edges).collect()[0]
    print(
        f"triangle_estimate(p=1/{graph.TRI_SAMPLE_MOD}): "
        f"{time.perf_counter() - t0:6.2f}s (est {row['est_total_triangles']:,} "
        f"from {row['n_sampled_edges']:,} sampled edges)"
    )
    registry.release_tracked()

    # HITS on the raw bipartite order→part items (orders as "customers");
    # the planted hub part rides 1 in 5 orders, so the authority
    # distribution carries exactly the skew HITS concentrates on.
    t0 = time.perf_counter()
    nh = graph.hits(
        items.select(F.col("ok").alias("c"), F.col("pk").alias("p"))
    ).count()
    print(
        f"hits({graph.HITS_ITERS} iters, bipartite {n_orders}x{P}): "
        f"{time.perf_counter() - t0:6.2f}s ({nh} scored nodes)"
    )
    registry.release_tracked()
    edges.unpersist()
    items.unpersist()


def run_truss(spark, n_orders: int) -> None:
    """k-truss at design point (r7), on the planted-hub corpus: the peel
    runs one bloom-prefiltered triangle enumeration PER ROUND over the
    surviving subgraph, so the number to watch is whether later rounds
    get cheaper as the graph shrinks (they must — the enumeration is
    wedge-shaped in the survivors). k is derived from the measured
    support quartile so the peel actually cascades."""
    from vectordb_from_scratch_spark import registry
    from vectordb_from_scratch_spark.operators import graph

    items, edges, P, n_items, m, t_edges = _graph_corpus(spark, n_orders)
    print(f"truss n_orders={n_orders} P={P}: {m} edges in {t_edges:6.2f}s")

    t0 = time.perf_counter()
    sup = graph.edge_support(edges.select("src", "dst")).persist()
    n_sup = sup.count()
    k25, k50 = sup.agg(
        F.expr("percentile_approx(sup, 0.25)"), F.expr("percentile_approx(sup, 0.5)")
    ).collect()[0]
    print(
        f"support pass: {time.perf_counter() - t0:6.2f}s "
        f"({n_sup} edges in triangles, p25 {k25}, p50 {k50})"
    )
    sup.unpersist()
    registry.release_tracked()

    for kk, label in ((int(k25) + 2, "p25 support"), (int(k50) + 2, "median support")):
        t0 = time.perf_counter()
        nt = graph.ktruss(edges.select("src", "dst"), k=kk).count()
        print(
            f"ktruss(k={kk} = {label}+2, {graph.TRUSS_ROUNDS} rounds max): "
            f"{time.perf_counter() - t0:6.2f}s ({nt} surviving edges)"
        )
        registry.release_tracked()
    edges.unpersist()
    items.unpersist()


def run_truss_incr(spark, n_orders: int) -> None:
    """Warm-peel design point (r9, VERDICT r8 #2): split the planted-hub
    corpus's orders 90/10, measure (a) the cold full-graph seed
    enumeration, (b) the incremental support maintenance over the 10%
    whole-order delta, and (c) the warm peel served from the maintained
    artifact — the claim is warm-peel wall ≈ rounds-only cost, with the
    seed pass amortized into (b)'s new-edge-proportional delta."""
    from vectordb_from_scratch_spark import registry
    from vectordb_from_scratch_spark.operators import graph

    items, edges, P, n_items, m, t_edges = _graph_corpus(spark, n_orders)
    print(f"truss_incr n_orders={n_orders} P={P}: {m} edges in {t_edges:6.2f}s")

    t0 = time.perf_counter()
    sup_full = graph.edge_support(edges.select("src", "dst")).persist()
    n_sup = sup_full.count()
    k25 = int(sup_full.agg(F.expr("percentile_approx(sup, 0.25)")).collect()[0][0])
    t_cold_seed = time.perf_counter() - t0
    print(f"cold seed enumeration (full graph): {t_cold_seed:6.2f}s ({n_sup} edges)")
    sup_full.unpersist()
    registry.release_tracked()

    base_items = items.filter(F.col("ok") % 10 != 0)
    delta_items = items.filter(F.col("ok") % 10 == 0)
    base = graph.copurchase_edges_from_items(base_items).localCheckpoint()
    t0 = time.perf_counter()
    base_sup = graph.edge_support(base.select("src", "dst"))
    maintained = graph.truss_support_delta(base, base_sup, delta_items).persist()
    n_m = maintained.count()
    t_base = time.perf_counter() - t0
    # the nightly regime pays only the delta: re-measure it alone with
    # the base support already materialized
    base_sup2 = graph.edge_support(base.select("src", "dst")).localCheckpoint()
    t0 = time.perf_counter()
    m2 = graph.truss_support_delta(base, base_sup2, delta_items)
    n_m2 = m2.count()
    t_delta = time.perf_counter() - t0
    print(
        f"maintained support: base-seed+delta {t_base:6.2f}s; "
        f"delta alone (base support warm) {t_delta:6.2f}s ({n_m} edges)"
    )
    registry.release_tracked()

    kk = k25 + 2
    t0 = time.perf_counter()
    nt_w = graph.ktruss(
        maintained.select("src", "dst"), k=kk,
        support0=maintained.select("src", "dst", "sup"),
    ).count()
    t_warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    nt_c = graph.ktruss(maintained.select("src", "dst"), k=kk).count()
    t_cold = time.perf_counter() - t0
    assert nt_w == nt_c, (nt_w, nt_c)
    print(
        f"ktruss(k={kk}): warm peel {t_warm:6.2f}s vs cold {t_cold:6.2f}s "
        f"({nt_w} surviving edges; warm skips the {t_cold_seed:5.1f}s-class "
        f"seed pass, paying only rounds)"
    )
    maintained.unpersist()
    edges.unpersist()
    items.unpersist()


def run_vocabidx(spark, n_orders: int) -> None:
    """The SGNS vocabulary index at the 1M-order graph (r9, VERDICT r8
    #4): the distributed zipWithIndex shape vs the single-task global
    row_number it replaced — same mapping (asserted on a sample), walls
    printed for both."""
    from pyspark.sql import Window

    from vectordb_from_scratch_spark.operators import graph

    items, edges, P, n_items, m, t_edges = _graph_corpus(spark, n_orders)
    nodes = graph._sym(edges.select("src", "dst")).select(
        F.col("a").alias("node")
    ).distinct().persist()
    nn = nodes.count()
    print(f"vocabidx n_orders={n_orders}: {nn} nodes, {m} edges in {t_edges:6.2f}s")

    t0 = time.perf_counter()
    vi = graph._vocab_index(nodes).persist()
    n1 = vi.count()
    t_dist = time.perf_counter() - t0
    t0 = time.perf_counter()
    w = Window.orderBy("node")
    vw = nodes.select(
        "node", (F.row_number().over(w) - 1).cast("long").alias("idx")
    ).persist()
    n2 = vw.count()
    t_single = time.perf_counter() - t0
    bad = vi.join(vw, "node").filter(vi["idx"] != vw["idx"]).count()
    assert bad == 0 and n1 == n2 == nn
    print(
        f"vocab index: distributed zipWithIndex {t_dist:6.2f}s vs "
        f"single-task row_number {t_single:6.2f}s (mappings identical)"
    )
    vi.unpersist()
    vw.unpersist()
    nodes.unpersist()
    edges.unpersist()
    items.unpersist()


def run_walks(spark, n_orders: int) -> None:
    """Walk-family design point on the planted-hub corpus (VERDICT r7
    #4): node2vec's candidate join fans out by RAW degree of the walk's
    current node — unlike the hub-proof oriented wedge join — so the
    number to watch is whether the hub's visit mass × its degree binds
    the wall. Measures uniform walks, skip-grams, node2vec walks, and
    the full SGNS train, with the hub's degree and visit mass printed so
    the fanout claim is checked against data, not intuition."""
    from vectordb_from_scratch_spark import registry
    from vectordb_from_scratch_spark.operators import graph

    items, edges, P, n_items, m, t_edges = _graph_corpus(spark, n_orders)
    e = edges.select("src", "dst")
    deg_hub = (
        graph._sym(e).filter(F.col("a") == 0).count()
    )
    print(
        f"walks n_orders={n_orders} P={P}: {m} edges in {t_edges:6.2f}s "
        f"(deg(hub)={deg_hub})"
    )

    t0 = time.perf_counter()
    walks = graph.random_walks(e).persist()
    nw = walks.count()
    t_u = time.perf_counter() - t0
    hub_visits = walks.filter(F.col("node") == 0).count()
    n_nodes = nw // (graph.WALK_STEPS + 1)
    print(
        f"uniform walks ({graph.WALK_STEPS} steps, {n_nodes} walks): "
        f"{t_u:6.2f}s ({nw} rows; hub visited {hub_visits}x -> worst-step "
        f"candidate fanout ~{hub_visits * deg_hub // (graph.WALK_STEPS + 1)})"
    )

    t0 = time.perf_counter()
    n_sg = graph.walk_skipgrams(walks).count()
    print(f"skipgrams (window {graph.SKIPGRAM_WINDOW}): "
          f"{time.perf_counter() - t0:6.2f}s ({n_sg} distinct pairs)")
    walks.unpersist()

    t0 = time.perf_counter()
    n2 = graph.node2vec_walks(e).count()
    print(f"node2vec walks ({graph.N2V_STEPS} steps): "
          f"{time.perf_counter() - t0:6.2f}s ({n2} rows)")

    t0 = time.perf_counter()
    n_emb = graph.node_embeddings(e).count()
    print(
        f"sgns train (dims {graph.EMB_DIMS}, iters {graph.EMB_ITERS}, "
        f"neg {graph.EMB_NEG}): {time.perf_counter() - t0:6.2f}s "
        f"({n_emb} vectors)"
    )
    registry.release_tracked()
    edges.unpersist()
    items.unpersist()


def run_recsys(spark, n_orders: int) -> None:
    """Item-item CF + per-customer recommendations at design point, on
    the planted-hub / oversized-basket corpus: customers own ~10 orders
    each, so ~89% of customers own the hub part — the hot key the
    truncated item-kNN model's |owned|·k candidate bound has to absorb
    (an untruncated model would fan the hub's ~P neighbors out to every
    one of those customers: |owned|·degree ≈ P per customer).

    Measured: model size vs its O(parts·k) bound, candidate volume vs
    the Σ|owned|·k bound, and the walls for cf_cosine and the full
    recommendation pipeline."""
    from vectordb_from_scratch_spark import registry
    from vectordb_from_scratch_spark.operators import graph

    items, edges, P, n_items, m, t_edges = _graph_corpus(spark, n_orders)
    C = max(n_orders // 10, 100)
    purchases = (
        items.select(F.pmod(F.col("ok"), F.lit(C)).alias("c"), F.col("pk").alias("p"))
        .distinct()
        .persist()
    )
    n_pur = purchases.count()
    hub_owners = purchases.filter(F.col("p") == 0).count()
    print(
        f"recsys n_orders={n_orders} P={P} C={C}: {m} edges, "
        f"{n_pur} (customer, part) purchases, hub owned by {hub_owners} "
        f"({100.0 * hub_owners / C:.0f}% of customers)"
    )

    t0 = time.perf_counter()
    top = graph.cf_cosine_pairs(edges).collect()
    print(
        f"cf_cosine top-{graph.CF_TOP}: {time.perf_counter() - t0:6.2f}s "
        f"(best {top[0]['cf_cosine']:.4f})"
    )
    registry.release_tracked()

    # model + candidate volumes: the two bounds that make item-kNN serve
    t0 = time.perf_counter()
    recs = graph.recommend_parts(purchases, edges).persist()
    n_recs = recs.count()
    t_recs = time.perf_counter() - t0
    n_cust = recs.select("custkey").distinct().count()
    cand_bound = n_pur * graph.REC_MODEL_K
    print(
        f"recommendations: {t_recs:6.2f}s ({n_recs} rows for {n_cust} "
        f"customers; candidate fanout bound |purchases|*k = {cand_bound:,}, "
        f"model bound parts*k = {P * graph.REC_MODEL_K:,})"
    )
    recs.unpersist()
    registry.release_tracked()
    purchases.unpersist()
    edges.unpersist()
    items.unpersist()


def run_robust(spark, n_rows: int) -> None:
    """The MAD family at row scale: exact percentile-based MAD
    (events_mad_outliers' shape — per-group aggregation state holds every
    distinct value, the documented percentile shortcoming) vs the
    histogram-sketch twin (mad_outliers_sketch — O(bins) state, four
    linear scans). Synthetic heavy-tailed feed, 4 event types, planted
    gross outliers at 1-in-10k (the poisoned-feed case MAD exists for:
    the outliers are far enough out to drag a mean/stddev screen's own
    threshold). Reports both walls and the screens' agreement."""
    from vectordb_from_scratch_spark.operators import events as ev_ops

    # heavy-tailed base: value = exp(z) with z ~ N(0,1)-ish from a hash
    # (Irwin-Hall 4-fold sum approximates the normal well enough for a
    # wall-clock harness); 1-in-10k rows get a 1e4 multiplier (gross).
    u = lambda salt: (
        F.pmod(F.xxhash64(F.col("id") + F.lit(salt)), F.lit(1_000_000)) / 1_000_000.0
    )
    z = (u(1) + u(2) + u(3) + u(4) - 2.0) * 1.732  # var 1/3 per term
    base = spark.range(n_rows).select(
        F.col("id").alias("event_id"),
        F.concat(F.lit("t"), F.pmod(F.col("id"), F.lit(4)).cast("string")).alias(
            "event_type"
        ),
        (
            F.exp(z)
            * F.when(F.pmod(F.xxhash64("id"), F.lit(10_000)) == 0, 1e4).otherwise(1.0)
        ).alias("value"),
    )
    evt = base.repartition(32).persist()
    n = evt.count()
    print(f"robust n_rows={n}: 4 event types, 1-in-10k gross outliers")

    t0 = time.perf_counter()
    med = evt.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    mad = (
        evt.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(
            F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)).alias("mad")
        )
    )
    rz = (
        F.lit(ev_ops.MAD_CONSISTENCY)
        * (F.col("value") - F.col("med"))
        / F.col("mad")
    )
    n_exact = (
        evt.join(F.broadcast(mad), "event_type")
        .filter(F.abs(rz) > ev_ops.MAD_Z_THRESHOLD)
        .count()
    )
    t_exact = time.perf_counter() - t0
    print(f"exact percentile MAD screen: {t_exact:6.2f}s ({n_exact} outliers)")

    t0 = time.perf_counter()
    n_sketch = ev_ops.mad_outliers_sketch(evt).count()
    t_sketch = time.perf_counter() - t0
    print(
        f"histogram-sketch MAD screen: {t_sketch:6.2f}s ({n_sketch} outliers, "
        f"{100.0 * abs(n_sketch - n_exact) / max(n_exact, 1):.2f}% count delta)"
    )
    evt.unpersist()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    mode = sys.argv[3] if len(sys.argv) > 3 else "core"
    n_queries = 100
    spark = get_spark("stress")
    spark.sparkContext.setLogLevel("ERROR")

    if mode == "zorder":
        return run_zorder(spark, n)
    if mode == "winnow":
        return run_winnow(spark, n)
    if mode == "dupspan":
        return run_dupspan(spark, n)
    if mode == "bpe":
        return run_bpe(spark, n)
    if mode == "bpe_local":
        return run_bpe_local(spark, n, n_merges=d if d > 64 else 1024)
    if mode == "minhash_incr":
        return run_minhash_incr(spark, n)
    if mode == "betw":
        return run_betw(spark, n)
    if mode == "pca":
        return run_pca(spark, n, d)
    if mode == "graph":
        return run_graph(spark, n)
    if mode == "graph2":
        return run_graph2(spark, n)
    if mode == "truss":
        return run_truss(spark, n)
    if mode == "truss_incr":
        return run_truss_incr(spark, n)
    if mode == "vocabidx":
        return run_vocabidx(spark, n)
    if mode == "walks":
        return run_walks(spark, n)
    if mode == "prefixjoin":
        return run_prefixjoin(spark, n)
    if mode == "simhash":
        return run_simhash(spark, n)
    if mode == "fuzzy":
        return run_fuzzy(spark, n)
    if mode == "recsys":
        return run_recsys(spark, n)
    if mode == "robust":
        return run_robust(spark, n)

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

    if mode == "wide":
        return run_wide(spark, emb, n, d, n_queries, qpdf)
    if mode == "cascade":
        return run_cascade(spark, emb, n, d, n_queries, qpdf)
    if mode == "neardup":
        return run_neardup(spark, emb, n, d)
    if mode == "blockjoin":
        return run_blockjoin(spark, emb, n, d)
    if mode == "hybrid":
        return run_hybrid(spark, emb, n, d)
    if mode == "semprune":
        return run_semprune(spark, emb, n, d)
    if mode == "hnsw":
        return run_hnsw(spark, emb, n, d, qpdf)
    if mode == "hnswrouted":
        return run_hnsw_routed(spark, emb, n, d, qpdf)
    if mode == "hnswbounded":
        return run_hnsw_bounded(spark, emb, n, d, qpdf)

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
