"""Flat exact k-NN — the reference's core search semantic, distributed.

Reference behavior (``app/core/indexes/flat.py:42-70``): normalize the query,
linear-scan every stored vector, keep a size-k heap keyed on
``score if higher_is_better else -score``, return (chunk_id, raw_score)
sorted by score descending. k is capped at corpus size; k<=0 → empty.

Spark design:
- Single query → scored scan + ``ORDER BY score DESC LIMIT k``; Catalyst
  plans ``TakeOrderedAndProject`` — per-partition heaps + driver merge, the
  distributed version of the reference's heap. No shuffle of the corpus.
- Batched queries (the interesting case at 100 TB) → broadcast the query set
  (it is small; corpus is huge), score each (query, corpus) pair, rank with a
  per-query window. The corpus is NEVER shuffled: with AQE the
  ``row_number() <= k`` over ``partitionBy(query_id)`` shuffles only
  (qid, cid, score) triples, not embeddings.
- For BLAS-rate scoring at scale, ``topk_pandas`` does per-partition NumPy
  matmul + per-partition top-k, then a tiny global top-k — the same
  "stack to (m,d), one matmul" trick as the reference rerank
  (``ivf.py:116-117``) but per Spark partition.

Tie-break is pinned to (score DESC, id ASC) — the reference's tie order is
incidental heap order (SURVEY.md §2.1 V14); we need determinism for oracles.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.functions import linalg


def score_column(metric: str, a: Column | str, b: Column | str) -> tuple[Column, bool]:
    """(raw score column, higher_is_better) for a registered metric."""
    builder, higher = linalg.METRICS[metric]
    return builder(a, b), higher


def topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    filter_expr: Column | None = None,
) -> DataFrame:
    """Batch exact k-NN, pure built-ins.

    Returns (query_id, vec_id, score) with score RAW (distances not negated —
    reference ``flat.py:60-70``), ordered within each query by goodness then
    id. ``filter_expr`` implements the reference's declared-but-unimplemented
    metadata_filters (``flat.py:46`` TODO) as a corpus pre-filter, which
    Catalyst pushes into the parquet scan.
    """
    if k <= 0:
        raise ValueError("k must be >= 1 (reference caps k to [1, 100] at the API)")
    if filter_expr is not None:
        corpus = corpus.filter(filter_expr)
    score, higher = score_column(metric, F.col(vec_col), F.col(query_vec_col))
    scored = corpus.join(F.broadcast(queries)).select(
        F.col(query_id_col),
        F.col(id_col),
        score.alias("score"),
    )
    order = [F.col("score").desc() if higher else F.col("score").asc(), F.col(id_col).asc()]
    w = Window.partitionBy(query_id_col).orderBy(*order)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "score", "rank")
    )


def local_topk_indices(scores, ids, k: int):
    """Indices of the k best rows under the EXACT global tie-break
    (score DESC, id ASC). A bare argpartition resolves score ties
    arbitrarily, so a batch could keep the higher id and drop the lower
    one the global window (and the DuckDB oracle) would keep — the same
    defect class VERDICT r2 #3 fixed in dedup._batch_topk. Integer-scored
    kernels (SQ8, Hamming, ADC) tie often; this total order is mandatory
    wherever the local cap feeds an oracle-checked merge."""
    import numpy as np

    kk = min(k, len(ids))
    order = np.lexsort((ids, -scores))  # primary: score desc; then id asc
    return order[:kk]


def topk_pandas(
    corpus: DataFrame,
    queries_pdf: pd.DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale-path batch cosine k-NN: per-partition NumPy matmul + local
    top-k, then global top-k per query.

    ``queries_pdf`` is a small pandas frame (query_id, query_vec) broadcast
    to every partition inside the Arrow batch iterator. Each partition emits
    at most Q*k candidate rows, so the final per-query global top-k shuffles
    O(partitions * Q * k) tiny rows — the distributed analog of the
    reference's heap merge, with none of the corpus moving.
    """
    import numpy as np

    qids = queries_pdf["query_id"].to_numpy()
    qmat = np.stack(queries_pdf["query_vec"].to_list()).astype("float64")
    qnorm = np.linalg.norm(qmat, axis=1)
    qnorm[qnorm == 0.0] = 1.0
    qunit = qmat / qnorm[:, None]

    out_schema = f"query_id long, {id_col} long, score double"

    def part_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy()
            X = np.stack(pdf[vec_col].to_list()).astype("float64")
            norms = np.linalg.norm(X, axis=1)
            zero = norms == 0.0
            norms[zero] = 1.0
            Xu = X / norms[:, None]
            S = Xu @ qunit.T  # (m, Q)
            S[zero, :] = 0.0  # reference: zero vector → score 0.0
            rows = []
            for j, qid in enumerate(qids):
                sel = local_topk_indices(S[:, j], ids, k)
                rows.append(
                    pd.DataFrame(
                        {"query_id": qid, id_col: ids[sel], "score": S[sel, j]}
                    )
                )
            yield pd.concat(rows, ignore_index=True)

    candidates = corpus.select(id_col, vec_col).mapInPandas(part_topk, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )


#: Kernel crossover: below this many queries the pure-expression plan wins
#: (the Arrow round-trip of the whole corpus costs more than interpreted
#: scoring of Q·N pairs); above it the per-partition BLAS matmul wins.
#: Measured at sf0.1 (bench r1): Q=10 → expression 1.31 s vs BLAS 2.48 s;
#: Q=100 → BLAS 1.0 s. Both paths scan the corpus exactly once, so the
#: ratio depends on Q, not N — the crossover sits near Q≈32.
BLAS_MIN_QUERIES = 32

#: Block-join targets: each cogrouped task scores one (corpus block ×
#: query block) pair, so these bound per-task memory independent of N
#: and Q: (65536 + 4096)·d doubles ≈ 36 MB of vectors at d=64, plus the
#: score matrix which the kernel chunks to ~64 MB regardless of block
#: shape (a full 4096×65536 float64 matrix would be 2 GB/task).
BLOCK_ROWS_CORPUS = 65536
BLOCK_ROWS_QUERIES = 4096

#: Above this many queries the broadcast/closure paths stop being honest
#: (a 10⁵×d float64 query matrix is ~50 MB riding to every task and the
#: driver); route to the block join, which never materializes Q anywhere.
BLOCKJOIN_MIN_QUERIES = 100_000


def topk_auto(
    corpus: DataFrame,
    queries,
    k: int = 10,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    filter_expr: Column | None = None,
    blas_min_queries: int = BLAS_MIN_QUERIES,
    blockjoin_min_queries: int = BLOCKJOIN_MIN_QUERIES,
    n_queries: int | None = None,
) -> DataFrame:
    """Serving-path dispatcher: route a query batch to the expression plan,
    the per-partition BLAS kernel, or (for Spark-DataFrame batches beyond
    ``blockjoin_min_queries``) the block join — so no kernel's weak regime
    can sneak into the serving path. ``queries`` may be a Spark DataFrame
    or a pandas frame of (query_id, query_vec); only below the block-join
    threshold is it assumed broadcast-small. Non-cosine metrics always
    take the expression plan (the matmul kernels are cosine-only).

    ``n_queries``: optional batch-size hint for Spark-DataFrame batches
    (ADVICE r5: the dispatcher used to run ``queries.count()`` before
    routing, executing the query lineage twice for small batches). With a
    hint at/above ``blockjoin_min_queries`` the batch routes to the block
    join without ever being collected; without one the batch is collected
    ONCE via ``toPandas()`` and routed on its length — callers that might
    hold an unbounded batch should pass the hint."""
    qpdf = queries if isinstance(queries, pd.DataFrame) else None
    if metric == "cosine":
        if qpdf is None:
            if n_queries is not None and n_queries >= blockjoin_min_queries:
                if filter_expr is not None:
                    corpus = corpus.filter(filter_expr)
                return topk_blockjoin(
                    corpus,
                    queries,
                    k=k,
                    id_col=id_col,
                    vec_col=vec_col,
                    n_queries_hint=n_queries,
                )
            qpdf = queries.toPandas()
            if len(qpdf) >= blockjoin_min_queries:
                # un-hinted batch that turned out block-join-sized: route
                # to the unbounded kernel (one ~Q·d driver round-trip was
                # already paid; the kernel itself never rebroadcasts it)
                if filter_expr is not None:
                    corpus = corpus.filter(filter_expr)
                return topk_blockjoin(
                    corpus,
                    queries,
                    k=k,
                    id_col=id_col,
                    vec_col=vec_col,
                    n_queries_hint=len(qpdf),
                )
        if len(qpdf) >= blas_min_queries:
            if filter_expr is not None:
                corpus = corpus.filter(filter_expr)
            return topk_pandas(corpus, qpdf, k=k, id_col=id_col, vec_col=vec_col)
    if qpdf is not None and not isinstance(queries, DataFrame):
        queries = corpus.sparkSession.createDataFrame(
            qpdf, "query_id long, query_vec array<double>"
        )
    return topk(
        corpus,
        queries,
        k=k,
        metric=metric,
        id_col=id_col,
        vec_col=vec_col,
        filter_expr=filter_expr,
    )


def topk_blockjoin(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_corpus_hint: int | None = None,
    n_queries_hint: int | None = None,
    rows_per_block: int = BLOCK_ROWS_CORPUS,
    queries_per_block: int = BLOCK_ROWS_QUERIES,
) -> DataFrame:
    """Exact cosine k-NN for UNBOUNDED query batches: partition BOTH sides
    into bounded blocks, matmul per block pair, merge with the standard
    O(blocks·Q·k) global window (SCALE.md flat-kNN: "beyond ~10⁵ queries
    switch to the block-join variant").

    Neither side is collected, broadcast, or closed over: corpus rows are
    replicated across the ``nqb`` query blocks and query rows across the
    ``ncb`` corpus blocks via an in-plan explode, then
    ``cogroup().applyInPandas`` hands each (cblk, qblk) pair to one task
    as two bounded pandas frames. Replication factors are the block
    COUNTS of the opposite side — the inherent N·Q scoring work of exact
    brute force, laid out so every task is a dense BLAS call with bounded
    memory. Arithmetic and tie-break are identical to ``topk_pandas``
    (normalize → matmul → ``local_topk_indices``), so the two paths are
    oracle-interchangeable.

    ``n_*_hint`` skip the sizing counts when the caller knows cardinality
    from footer stats (the block counts only need magnitudes)."""
    import numpy as np

    n_corpus = n_corpus_hint if n_corpus_hint is not None else corpus.count()
    n_queries = n_queries_hint if n_queries_hint is not None else queries.count()
    ncb = max(1, -(-int(n_corpus) // rows_per_block))
    nqb = max(1, -(-int(n_queries) // queries_per_block))

    c = corpus.select(
        id_col,
        vec_col,
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(ncb)).cast("int").alias("cblk"),
        F.explode(F.sequence(F.lit(0), F.lit(nqb - 1))).alias("qblk"),
    )
    q = queries.select(
        "query_id",
        "query_vec",
        F.pmod(F.xxhash64(F.col("query_id")), F.lit(nqb)).cast("int").alias("qblk"),
        F.explode(F.sequence(F.lit(0), F.lit(ncb - 1))).alias("cblk"),
    )
    id_type = corpus.schema[id_col].dataType.simpleString()

    def block_topk(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            return pd.DataFrame({"query_id": [], id_col: [], "score": []}).astype(
                {"query_id": "int64", "score": "float64"}
            )
        ids = left[id_col].to_numpy()
        X = np.stack(left[vec_col].to_list()).astype("float64")
        norms = np.linalg.norm(X, axis=1)
        zero = norms == 0.0
        norms[zero] = 1.0
        Xu = X / norms[:, None]
        qids = right["query_id"].to_numpy()
        Q = np.stack(right["query_vec"].to_list()).astype("float64")
        qn = np.linalg.norm(Q, axis=1)
        qn[qn == 0.0] = 1.0
        Qu = Q / qn[:, None]
        # Score in QUERY CHUNKS sized so the (chunk × m) similarity
        # matrix stays ~64 MB — a whole-block (4096 × 65536) float64
        # matrix is 2 GB per task and OOM-killed the workers at 32-way
        # concurrency. Per chunk: one row-major gemm, one matrix-level
        # argpartition (a per-query python loop of full lexsorts
        # measured 60s+ per task at 50k-row blocks), then the
        # deterministic (score DESC, id ASC) tie rule restored on the
        # partition boundary only (same discipline as
        # hnsw._exact_links_batch).
        m = Xu.shape[0]
        kk = min(k, m)
        qchunk = max(16, int(8_000_000 // m))
        out_q, out_id, out_s = [], [], []
        for a in range(0, len(qids), qchunk):
            b = min(len(qids), a + qchunk)
            S = Qu[a:b] @ Xu.T  # (chunk, m) row-major
            S[:, zero] = 0.0  # reference: zero vector → score 0.0
            sel = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
            selS = np.take_along_axis(S, sel, axis=1)
            cut = selS.min(axis=1)
            eq_total = (S == cut[:, None]).sum(axis=1)
            eq_sel = (selS == cut[:, None]).sum(axis=1)
            for t in range(b - a):
                cols, sims = sel[t], selS[t]
                if eq_total[t] != eq_sel[t]:
                    # boundary tie at the cut score: lowest corpus ids win
                    row = S[t]
                    definite = cols[sims > cut[t]]
                    tie_pos = np.flatnonzero(row == cut[t])
                    tie_pos = tie_pos[np.argsort(ids[tie_pos], kind="stable")]
                    cols = np.concatenate(
                        [definite, tie_pos[: kk - len(definite)]]
                    )
                    sims = row[cols]
                order = np.lexsort((ids[cols], -sims))
                keep = cols[order]
                out_q.extend([int(qids[a + t])] * len(keep))
                out_id.extend(ids[keep])
                out_s.extend(S[t, keep])
        return pd.DataFrame({"query_id": out_q, id_col: out_id, "score": out_s})

    candidates = (
        c.groupBy("cblk", "qblk")
        .cogroup(q.groupBy("cblk", "qblk"))
        .applyInPandas(
            block_topk, schema=f"query_id long, {id_col} {id_type}, score double"
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )


#: per-process query-set cache: (app_id, sf_dir, n_queries) → pandas
#: frame of the first-n fixture vectors. The ANN entries (ivf_search,
#: lsh_search) re-derived their query set from the embeddings parquet on
#: EVERY call — a full scan job that polluted the cold-vs-prebuilt split
#: (the prebuilt entries should isolate probe+rerank cost, not pay query
#: derivation again). One scan per process; later calls rebuild only a
#: driver-local DataFrame from the cached rows.
_QUERY_CACHE: dict = {}


def fixture_query_set(spark, sf_dir: str, n_queries: int = 10):
    """(qpdf, queries_df) for the first ``n_queries`` embedding vectors:
    ``qpdf`` is the driver-side pandas frame the rerank kernels consume,
    ``queries_df`` a local-relation Spark DataFrame (no parquet scan) for
    the probe joins. Cached per (session, sf_dir, n_queries)."""
    from vectordb_from_scratch_spark.session import load_table

    key = (spark.sparkContext.applicationId, str(sf_dir), n_queries)
    if key not in _QUERY_CACHE:
        emb = load_table(spark, sf_dir, "embeddings")
        pdf = (
            emb.filter(F.col("vec_id") < n_queries)
            .select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec"),
            )
            .toPandas()
        )
        pdf["query_vec"] = pdf["query_vec"].map(list)
        _QUERY_CACHE[key] = pdf
    qpdf = _QUERY_CACHE[key]
    queries_df = spark.createDataFrame(
        qpdf, schema="query_id long, query_vec array<double>"
    )
    return qpdf, queries_df


def score_pairs_joined(
    cand_with_vec: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed rerank for LARGE query batches: join each candidate
    row to its query vector (shuffle on query_id — co-locatable at
    scale), then cosine-score row-wise in one Arrow pass. Unlike
    ``score_pairs_pandas`` no Q×d matrix rides in the closure, so the
    batch size is unbounded; arithmetic is the identical
    normalize-then-einsum, so results match the driver path bit for bit.
    The driver path stays the right call for serving-sized Q (one tiny
    broadcast beats a shuffle join)."""
    import numpy as np

    id_type = cand_with_vec.schema[id_col].dataType.simpleString()
    joined = cand_with_vec.select("query_id", id_col, vec_col).join(
        queries.select("query_id", "query_vec"), "query_id"
    )

    def score_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack(pdf[vec_col].to_list()).astype("float64")
            xn = np.linalg.norm(X, axis=1, keepdims=True)
            Xu = X / np.where(xn == 0, 1.0, xn)
            Q = np.stack(pdf["query_vec"].to_list()).astype("float64")
            qn = np.linalg.norm(Q, axis=1, keepdims=True)
            Qu = Q / np.where(qn == 0, 1.0, qn)
            s = np.einsum("ij,ij->i", Xu, Qu)
            yield pd.DataFrame(
                {"query_id": pdf["query_id"], id_col: pdf[id_col], "score": s}
            )

    return joined.mapInPandas(
        score_iter, schema=f"query_id long, {id_col} {id_type}, score double"
    )


def score_pairs_pandas(
    cand_with_vec: DataFrame,
    queries_pdf: pd.DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine-score (query_id, id, vec) candidate rows against their query
    vectors in one Arrow pass — the rerank kernel shared by IVF and LSH
    search (reference reranks with one matmul too: ivf.py:116-117,
    lsh_simhash.py:123-124).

    Spark's higher-order array functions are interpreted per element, so a
    join + aggregate(zip_with(...)) rerank costs ~10x this kernel on wide
    candidate sets. The query matrix (Q×d) rides in the closure —
    broadcast-small by the same contract as the probe tables."""
    import numpy as np

    qids = queries_pdf["query_id"].to_numpy()
    Q = np.stack(queries_pdf["query_vec"].to_list()).astype("float64")
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    Qu = Q / np.where(qn == 0, 1.0, qn)
    qpos = {int(q): i for i, q in enumerate(qids)}
    id_type = cand_with_vec.schema[id_col].dataType.simpleString()

    def score_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack(pdf[vec_col].to_list()).astype("float64")
            xn = np.linalg.norm(X, axis=1, keepdims=True)
            Xu = X / np.where(xn == 0, 1.0, xn)
            qi = pdf["query_id"].map(qpos).to_numpy()
            s = np.einsum("ij,ij->i", Xu, Qu[qi])
            yield pd.DataFrame(
                {"query_id": pdf["query_id"], id_col: pdf[id_col], "score": s}
            )

    return cand_with_vec.select("query_id", id_col, vec_col).mapInPandas(
        score_iter, schema=f"query_id long, {id_col} {id_type}, score double"
    )
