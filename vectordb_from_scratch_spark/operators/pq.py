"""Product quantization (PQ) — the memory-compression scale path for ANN.

Where SQ8 (operators/quantization.py) compresses 8× and still scans every
code, PQ compresses 64×: split each unit-normalized vector into M=8
subvectors of 8 dims, k-means each subspace to 256 centroids, store one
byte per subspace — 8 bytes a vector instead of 512 (float64). Search is
ADC (asymmetric distance computation): per query, precompute an M×256
lookup table of subspace dot products; a candidate's approximate cosine is
then M table lookups + adds, no float vector ever touched. A shortlist of
ADC winners is exact-reranked against the raw vectors — the standard
IVFADC serving shape (Jégou et al., "Product Quantization for Nearest
Neighbor Search", TPAMI 2011).

The reference holds every vector as float64 in RAM and linear-scans
(``app/core/indexes/flat.py:30-38``); PQ is what that design grows into
when the corpus stops fitting: at 100 TB of float embeddings the codes
table is ~1.6 TB, scannable in seconds by a cluster, and the raw vectors
are touched only for ~shortlist×queries point lookups.

Spark design mirrors ivf.py:
- **train** driver-side on a bounded sample (k-means needs a sample, not
  the corpus — same FAISS convention as ivf.train_centroids), one seeded
  Euclidean Lloyd's per subspace;
- **encode** is one Arrow pass over the corpus (argmin via the
  ||x-c||² = ||x||² - 2x·c + ||c||² expansion, a (batch × 256) matmul
  per subspace), no shuffle;
- **search** broadcasts the per-query LUTs in the kernel closure, emits
  each partition's local top-shortlist, merges O(partitions·shortlist)
  rows, reranks only the shortlist.

Not SQL-expressible (seeded k-means) → rows-only driver check; recall vs
the exact flat scan is pinned in tests/test_ann_recall.py, the same
discipline as IVF and LSH.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vectordb_from_scratch_spark import registry
from vectordb_from_scratch_spark.registry import register
from vectordb_from_scratch_spark.session import load_table

M_SUBSPACES = 8
K_CODES = 256
TRAIN_ITERS = 15
SEED = 42
TRAIN_SAMPLE_CAP = 65536  # plenty for 256 centroids/subspace
DEFAULT_SHORTLIST = 100


def _kmeans_euclidean(X: np.ndarray, k: int, iters: int, rng) -> np.ndarray:
    """Plain seeded Lloyd's (Euclidean) for one subspace. Empty clusters
    reseed from random points, mirroring ivf.kmeans_cosine."""
    n = len(X)
    k = min(k, n)
    C = X[rng.choice(n, size=k, replace=False)]
    for _ in range(iters):
        # argmin ||x-c||^2 = argmax (x·c - ||c||²/2)
        logits = X @ C.T - 0.5 * np.einsum("ij,ij->i", C, C)
        assign_ids = np.argmax(logits, axis=1)
        newC = np.zeros_like(C)
        np.add.at(newC, assign_ids, X)
        counts = np.bincount(assign_ids, minlength=k).astype("float64")
        empty = counts == 0
        if empty.any():
            newC[empty] = X[rng.choice(n, size=int(empty.sum()))]
            counts[empty] = 1.0
        newC /= counts[:, None]
        if np.allclose(newC, C, rtol=1e-5, atol=1e-7):
            C = newC
            break
        C = newC
    return C


def _unit(X: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(X, axis=1, keepdims=True)
    return X / np.where(n == 0, 1.0, n)


def train_codebooks(
    corpus: DataFrame,
    m: int = M_SUBSPACES,
    k: int = K_CODES,
    iters: int = TRAIN_ITERS,
    seed: int = SEED,
    vec_col: str = "embedding",
    n_hint: int | None = None,
) -> np.ndarray:
    """(m, k, d/m) codebook tensor trained on a bounded sample of the
    unit-normalized corpus — one independent Euclidean k-means per
    subspace (PQ trains subspaces independently by construction).
    ``n_hint`` (row count from a parquet footer or an already-paid count)
    skips the sampling-fraction scan."""
    vecs = corpus.select(vec_col)
    n = n_hint if n_hint is not None else vecs.count()
    if n > TRAIN_SAMPLE_CAP:
        vecs = vecs.sample(fraction=min(1.0, 1.25 * TRAIN_SAMPLE_CAP / n), seed=seed)
        vecs = vecs.limit(TRAIN_SAMPLE_CAP)
    X = _unit(np.array([r[0] for r in vecs.collect()], dtype="float64"))
    d = X.shape[1]
    assert d % m == 0, f"dim {d} not divisible by {m} subspaces"
    sub = d // m
    rng = np.random.RandomState(seed)
    return np.stack(
        [_kmeans_euclidean(X[:, i * sub : (i + 1) * sub], k, iters, rng) for i in range(m)]
    )


def encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>): per-subspace nearest-centroid codes in one
    Arrow pass — the codebook tensor rides in the closure (m·k·sub
    doubles ≈ 128 KB, broadcast-small)."""
    mm, kk, sub = codebooks.shape
    # precompute ||c||²/2 per subspace for the argmin expansion
    chalf = 0.5 * np.einsum("mkd,mkd->mk", codebooks, codebooks)  # (m, k)
    id_type = corpus.schema[id_col].dataType.simpleString()

    def enc_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            X = _unit(np.stack(pdf[vec_col].to_list()).astype("float64"))
            codes = np.empty((len(X), mm), dtype="int64")
            for i in range(mm):
                Xs = X[:, i * sub : (i + 1) * sub]
                logits = Xs @ codebooks[i].T - chalf[i]
                codes[:, i] = np.argmax(logits, axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "codes": list(codes)}
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        enc_iter, schema=f"{id_col} {id_type}, codes array<long>"
    )


def _query_luts(queries_pdf: pd.DataFrame, codebooks: np.ndarray):
    """(qids, lut): per-query (m, k) ADC lookup tables — LUT[q, m, c] =
    dot(q_m, codebook[m][c]) over the unit-normalized queries. Shared by
    the shortlist scan and the candidate scorer so the two can never
    drift."""
    mm, kk, sub = codebooks.shape
    qids = queries_pdf["query_id"].to_numpy()
    Q = _unit(np.stack(queries_pdf["query_vec"].to_list()).astype("float64"))
    lut = np.stack(
        [Q[:, i * sub : (i + 1) * sub] @ codebooks[i].T for i in range(mm)], axis=1
    )
    return qids, lut


def adc_shortlist(
    codes: DataFrame,
    queries_pdf: pd.DataFrame,
    codebooks: np.ndarray,
    shortlist: int = DEFAULT_SHORTLIST,
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-query top-``shortlist`` candidate ids by ADC approximate cosine.
    Each partition emits its local shortlist under the exact (score DESC,
    id ASC) order, the global merge ranks O(partitions·Q·shortlist) tiny
    rows."""
    from vectordb_from_scratch_spark.operators import knn

    mm = codebooks.shape[0]
    qids, lut = _query_luts(queries_pdf, codebooks)
    id_type = codes.schema[id_col].dataType.simpleString()

    def adc_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy()
            C = np.stack(pdf["codes"].to_list())  # (n, m) int
            S = np.zeros((len(ids), len(qids)))
            for i in range(mm):
                # lut[:, i, :] is (Q, k); C[:, i] indexes k → (n, Q)
                S += lut[:, i, C[:, i]].T
            rows = []
            for j, qid in enumerate(qids):
                sel = knn.local_topk_indices(S[:, j], ids, shortlist)
                rows.append(
                    pd.DataFrame({"query_id": qid, id_col: ids[sel], "adc": S[sel, j]})
                )
            yield pd.concat(rows, ignore_index=True)

    cand = codes.mapInPandas(
        adc_iter, schema=f"query_id long, {id_col} {id_type}, adc double"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc").desc(), F.col(id_col).asc())
    return (
        cand.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= shortlist)
        .select("query_id", id_col)
    )


def search(
    corpus: DataFrame,
    codes: DataFrame,
    codebooks: np.ndarray,
    queries_pdf: pd.DataFrame,
    k: int = 10,
    shortlist: int = DEFAULT_SHORTLIST,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC shortlist over the codes table, exact cosine rerank of the
    shortlist against the raw vectors (the only touch of float data),
    deterministic (score DESC, id ASC) top-k."""
    short = adc_shortlist(codes, queries_pdf, codebooks, shortlist, id_col=id_col)
    return rerank_exact(corpus, short, queries_pdf, k, id_col=id_col, vec_col=vec_col)


def rerank_exact(
    corpus: DataFrame,
    short: DataFrame,
    queries_pdf: pd.DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine rerank of a (query_id, id) shortlist against the raw
    vectors + deterministic top-k — the shared tail of every
    shortlist-producing index (PQ, IVFPQ), kept in ONE place because
    oracle parity depends on this exact tie-break."""
    from vectordb_from_scratch_spark.operators import knn

    cand_vec = short.join(corpus.select(id_col, vec_col), id_col)
    rr = knn.score_pairs_pandas(cand_vec, queries_pdf, id_col=id_col, vec_col=vec_col)
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        rr.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )


#: (app_id, sf_dir) → (codebooks, cached codes DataFrame); the
#: train-once/search-many regime, same as ivf._BUILD_CACHE.
_BUILD_CACHE: dict = {}


def built_index(spark: SparkSession, sf_dir: str):
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _BUILD_CACHE:
        from vectordb_from_scratch_spark.operators.dedup import embedding_corpus_stats

        emb = load_table(spark, sf_dir, "embeddings")
        n, _ = embedding_corpus_stats(sf_dir)  # footer, no scan job
        books = train_codebooks(emb, n_hint=n)
        codes = encode(emb, books).cache()
        codes.count()
        _BUILD_CACHE[key] = (books, codes)
    return _BUILD_CACHE[key]


def build_and_search(
    spark: SparkSession,
    sf_dir: str,
    k: int = 10,
    n_queries: int = 10,
    shortlist: int = DEFAULT_SHORTLIST,
) -> DataFrame:
    from vectordb_from_scratch_spark.operators import knn

    emb = load_table(spark, sf_dir, "embeddings")
    qpdf, _ = knn.fixture_query_set(spark, sf_dir, n_queries)
    books, codes = built_index(spark, sf_dir)
    return search(emb, codes, books, qpdf, k=k, shortlist=shortlist)


@register("pq_search")  # rows-only: seeded k-means is not SQL-expressible
def pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cold PQ pipeline: train codebooks + encode + ADC + rerank."""
    res = build_and_search(spark, sf_dir)
    return res.select(
        "query_id",
        "vec_id",
        F.round("score", 6).alias("score"),
        F.col("rank").cast("long").alias("rnk"),
    )


def warm_pq(spark: SparkSession, sf_dir: str) -> None:
    """Train codebooks + encode + fixture query set, untimed."""
    from vectordb_from_scratch_spark.operators import knn

    built_index(spark, sf_dir)
    knn.fixture_query_set(spark, sf_dir, 10)


registry.WARMERS["pq_search_prebuilt"] = warm_pq


@register("pq_search_prebuilt")  # rows-only
def pq_search_prebuilt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serve path against the process-cached codes table: ADC + rerank
    only — what a query costs once the index exists (compare ivf_search
    vs ivf_search_prebuilt). Under registry.STRICT_SERVE a cold cache
    raises instead of silently training+encoding inside the timed call."""
    registry.require_warm(
        _BUILD_CACHE, (spark.sparkContext.applicationId, sf_dir), "pq"
    )
    return pq_search(spark, sf_dir)


def search_blockjoin(
    corpus: DataFrame,
    codes: DataFrame,
    codebooks: np.ndarray,
    queries: DataFrame,
    k: int = 10,
    shortlist: int = DEFAULT_SHORTLIST,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_corpus_hint: int | None = None,
    n_queries_hint: int | None = None,
    rows_per_block: int = 65536,
    queries_per_block: int = 4096,
) -> DataFrame:
    """PQ search for UNBOUNDED query batches: the block-join layout of
    ``knn.topk_blockjoin`` applied to the CODES table — the compressed
    tier is where block replication is cheapest (m code bytes per row vs
    4·d float bytes), so the inherent N·Q data motion shrinks by the
    compression ratio. Queries stay a DataFrame end to end: per
    cogrouped (code block × query block) pair the kernel builds ADC LUTs
    from the right frame's query vectors in bounded query chunks (the
    same ``_query_luts`` arithmetic — unit-normalize then per-subspace
    codebook matmul), gather-scores the block's codes, and takes a
    per-block top-``shortlist`` per query with the deterministic
    boundary-tie rule (lowest id at the cut). The global window reduces
    that to exactly ``adc_shortlist``'s per-query shortlist, and the
    exact rerank joins query vectors back in-plan
    (``knn.score_pairs_joined``) — results identical to ``search``."""
    from vectordb_from_scratch_spark.operators import knn

    n_c = n_corpus_hint if n_corpus_hint is not None else codes.count()
    n_q = n_queries_hint if n_queries_hint is not None else queries.count()
    ncb = max(1, -(-int(n_c) // rows_per_block))
    nqb = max(1, -(-int(n_q) // queries_per_block))
    c = codes.select(
        id_col,
        "codes",
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(ncb)).cast("int").alias("cblk"),
        F.explode(F.sequence(F.lit(0), F.lit(nqb - 1))).alias("qblk"),
    )
    q = queries.select(
        "query_id",
        "query_vec",
        F.pmod(F.xxhash64(F.col("query_id")), F.lit(nqb)).cast("int").alias("qblk"),
        F.explode(F.sequence(F.lit(0), F.lit(ncb - 1))).alias("cblk"),
    )
    mm, _, sub = codebooks.shape
    id_type = codes.schema[id_col].dataType.simpleString()

    def pair_short(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            return pd.DataFrame({"query_id": [], id_col: [], "adc": []}).astype(
                {"query_id": "int64", "adc": "float64"}
            )
        ids = left[id_col].to_numpy()
        C = np.stack(left["codes"].to_list())  # (n, m) int
        qids = right["query_id"].to_numpy()
        Qm = _unit(np.stack(right["query_vec"].to_list()).astype("float64"))
        kk = min(shortlist, len(ids))
        qchunk = max(16, int(4_000_000 // len(ids)))  # bounds the score matrix
        out = []
        for a in range(0, len(qids), qchunk):
            b = min(len(qids), a + qchunk)
            lut = np.stack(
                [
                    Qm[a:b, i * sub : (i + 1) * sub] @ codebooks[i].T
                    for i in range(mm)
                ],
                axis=1,
            )  # (chunk, m, k)
            S = np.zeros((b - a, len(ids)))
            for i in range(mm):
                S += lut[:, i, C[:, i]]  # (chunk, n)
            sel = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
            selS = np.take_along_axis(S, sel, axis=1)
            cut = selS.min(axis=1)
            eq_total = (S == cut[:, None]).sum(axis=1)
            eq_sel = (selS == cut[:, None]).sum(axis=1)
            for t in range(b - a):
                cols = sel[t]
                if eq_total[t] != eq_sel[t]:
                    # boundary tie at the cut: lowest ids win (the global
                    # (adc DESC, id ASC) window depends on this set)
                    row = S[t]
                    definite = cols[selS[t] > cut[t]]
                    tie_pos = np.flatnonzero(row == cut[t])
                    tie_pos = tie_pos[np.argsort(ids[tie_pos], kind="stable")]
                    cols = np.concatenate(
                        [definite, tie_pos[: kk - len(definite)]]
                    )
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": int(qids[a + t]),
                            id_col: ids[cols],
                            "adc": S[t, cols],
                        }
                    )
                )
        return pd.concat(out, ignore_index=True)

    cand = (
        c.groupBy("cblk", "qblk")
        .cogroup(q.groupBy("cblk", "qblk"))
        .applyInPandas(
            pair_short, schema=f"query_id long, {id_col} {id_type}, adc double"
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col(id_col).asc()
    )
    short = (
        cand.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= shortlist)
        .select("query_id", id_col)
    )
    cand_vec = short.join(corpus.select(id_col, vec_col), id_col)
    rr = knn.score_pairs_joined(cand_vec, queries, id_col, vec_col)
    wk = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        rr.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )


registry.WARMERS["pq_search_bigq"] = warm_pq


@register("pq_search_bigq")  # rows-only: seeded k-means not SQL-expressible
def pq_search_bigq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The compressed tier's large-batch exit: block-joined ADC over the
    codes table + in-plan exact rerank — no LUT closure, no driver
    collect, so the batch size is unbounded. Shrunken block targets on
    the fixture exercise the multi-block shortlist merge; equality with
    the LUT-closure path is asserted in tests/test_plans.py."""
    from vectordb_from_scratch_spark.operators import knn

    emb = load_table(spark, sf_dir, "embeddings")
    _, queries = knn.fixture_query_set(spark, sf_dir, 10)
    books, codes = built_index(spark, sf_dir)
    res = search_blockjoin(
        emb,
        codes,
        books,
        queries,
        n_queries_hint=10,
        rows_per_block=2048,
        queries_per_block=4,
    )
    return res.select(
        "query_id",
        "vec_id",
        F.round("score", 6).alias("score"),
        F.col("rank").cast("long").alias("rnk"),
    )


@register("pq_code_balance")  # rows-only
def pq_code_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-utilization histogram for subspace 0 — the PQ analog of
    ivf_cluster_sizes: dead codes mean wasted codebook capacity, hot codes
    mean the ADC shortlist degrades toward a full scan. Diagnostic that
    decides retraining at scale."""
    books, codes = built_index(spark, sf_dir)
    return (
        codes.select(F.col("codes")[0].alias("code0"))
        .groupBy("code0")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


def adc_score_candidates(
    cand_codes: DataFrame,
    queries_pdf: pd.DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC-score (query_id, id, codes) candidate rows — the PQ analog of
    knn.score_pairs_pandas: LUTs ride in the closure, each batch is M
    table-gathers, no float vectors touched."""
    mm = codebooks.shape[0]
    qids, lut = _query_luts(queries_pdf, codebooks)
    qpos = {int(q): i for i, q in enumerate(qids)}
    id_type = cand_codes.schema[id_col].dataType.simpleString()

    def score_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            C = np.stack(pdf["codes"].to_list())  # (n, m)
            qi = pdf["query_id"].map(qpos).to_numpy()
            s = np.zeros(len(pdf))
            for i in range(mm):
                s += lut[qi, i, C[:, i]]
            yield pd.DataFrame(
                {"query_id": pdf["query_id"], id_col: pdf[id_col], "adc": s}
            )

    return cand_codes.select("query_id", id_col, "codes").mapInPandas(
        score_iter, schema=f"query_id long, {id_col} {id_type}, adc double"
    )


def adc_score_candidates_joined(
    cand_codes: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
) -> DataFrame:
    """Distributed ADC scorer for LARGE query batches — the PQ analog of
    ``knn.score_pairs_joined``: each candidate row joins its query VECTOR
    in-plan (shuffle on query_id), and the kernel builds each query's
    ~32 KB LUT on the fly per Arrow batch (rows grouped by query inside
    the batch), so no Q-sized LUT tensor rides in any closure and the
    batch size is unbounded. The per-query arithmetic is exactly
    ``_query_luts`` (unit-normalize, per-subspace codebook matmul), so
    scores match the closure path bit for bit."""
    mm, _, sub = codebooks.shape
    id_type = cand_codes.schema[id_col].dataType.simpleString()
    joined = cand_codes.select("query_id", id_col, "codes").join(
        queries.select("query_id", "query_vec"), "query_id"
    )

    def score_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            C = np.stack(pdf["codes"].to_list())  # (n, m) int
            out = np.zeros(len(pdf))
            for _, idx in pdf.groupby("query_id").indices.items():
                q = np.asarray(
                    pdf["query_vec"].iloc[idx[0]], dtype="float64"
                )
                qn = np.linalg.norm(q)
                if qn > 0:
                    q = q / qn
                lut = np.stack(
                    [q[i * sub : (i + 1) * sub] @ codebooks[i].T for i in range(mm)]
                )  # (m, k)
                Ci = C[idx]
                s = np.zeros(len(idx))
                for i in range(mm):
                    s += lut[i, Ci[:, i]]
                out[idx] = s
            yield pd.DataFrame(
                {"query_id": pdf["query_id"], id_col: pdf[id_col], "adc": out}
            )

    return joined.mapInPandas(
        score_iter, schema=f"query_id long, {id_col} {id_type}, adc double"
    )


#: (app_id, sf_dir) → (codebooks, codes-with-cluster cached DF): the
#: IVFADC layout — codes co-located with their IVF cluster, built once.
_IVFPQ_CACHE: dict = {}


def ivfpq_codes(spark: SparkSession, sf_dir: str):
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _IVFPQ_CACHE:
        from vectordb_from_scratch_spark.operators import ivf

        _, assignments = ivf.built_index(spark, sf_dir)
        books, codes = built_index(spark, sf_dir)
        joined = codes.join(assignments, "vec_id").cache()
        joined.count()
        _IVFPQ_CACHE[key] = (books, joined)
    return _IVFPQ_CACHE[key]


def ivfpq_search_df(
    spark: SparkSession,
    sf_dir: str,
    k: int = 10,
    n_probes: int = 8,
    n_queries: int = 10,
    shortlist: int = DEFAULT_SHORTLIST,
) -> DataFrame:
    """IVFPQ — the canonical composed index (FAISS 'IVFx,PQy'): IVF probe
    prunes the candidate set to n_probes/n_clusters of the corpus, ADC
    scores ONLY those candidates from their 8-byte codes, a shortlist is
    exact-reranked. At 100 TB: the probe is partition pruning on the
    cluster-partitioned codes table, the ADC scan reads 64× fewer bytes
    than float, and the raw vectors serve only shortlist×Q point reads —
    compute AND I/O both pruned, multiplicatively.

    The codes⋈assignments co-location is paid ONCE at build time
    (``ivfpq_codes``): the per-query plan is then broadcast(probes) ⋈
    clustered-codes → ADC kernel — zero shuffles of the codes table per
    search, exactly the IVFADC file layout a 100 TB deployment writes
    ``partitionBy(cluster_id)``."""
    from vectordb_from_scratch_spark.operators import ivf, knn

    emb = load_table(spark, sf_dir, "embeddings")
    qpdf, queries_df = knn.fixture_query_set(spark, sf_dir, n_queries)
    centroids, _ = ivf.built_index(spark, sf_dir)
    books, codes_c = ivfpq_codes(spark, sf_dir)
    probes = ivf.probe_clusters_df(centroids, queries_df, n_probes)
    cand_codes = codes_c.join(F.broadcast(probes), "cluster_id").select(
        "query_id", "vec_id", "codes"
    )
    adc = adc_score_candidates(cand_codes, qpdf, books)
    w = Window.partitionBy("query_id").orderBy(F.col("adc").desc(), F.col("vec_id").asc())
    short = (
        adc.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= shortlist)
        .select("query_id", "vec_id")
    )
    return rerank_exact(emb, short, qpdf, k)


@register("ivfpq_search")  # rows-only: composed seeded k-means indexes
def ivfpq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = ivfpq_search_df(spark, sf_dir)
    return res.select(
        "query_id",
        "vec_id",
        F.round("score", 6).alias("score"),
        F.col("rank").cast("long").alias("rnk"),
    )


def warm_ivfpq(spark: SparkSession, sf_dir: str) -> None:
    """Build the full IVFADC layout (ivf + pq + co-location join) untimed."""
    from vectordb_from_scratch_spark.operators import knn

    ivfpq_codes(spark, sf_dir)
    knn.fixture_query_set(spark, sf_dir, 10)


registry.WARMERS["ivfpq_search_bigq"] = warm_ivfpq


@register("ivfpq_search_bigq")  # rows-only: composed seeded k-means indexes
def ivfpq_search_bigq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed tier's large-batch exit: probes were already in-plan
    (probe_clusters_df); this closes the last two driver dependencies —
    ADC LUTs built per-query inside the Arrow kernel from in-plan query
    vectors (adc_score_candidates_joined), exact rerank via the joined
    scorer. No collect/toPandas anywhere; identical results to
    ivfpq_search (asserted in tests/test_plans.py)."""
    from vectordb_from_scratch_spark.operators import ivf, knn

    emb = load_table(spark, sf_dir, "embeddings")
    _, queries_df = knn.fixture_query_set(spark, sf_dir, 10)
    centroids, _ = ivf.built_index(spark, sf_dir)
    books, codes_c = ivfpq_codes(spark, sf_dir)
    probes = ivf.probe_clusters_df(centroids, queries_df, 8)
    cand_codes = codes_c.join(probes, "cluster_id").select(
        "query_id", "vec_id", "codes"
    )
    adc = adc_score_candidates_joined(cand_codes, queries_df, books)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("vec_id").asc()
    )
    short = (
        adc.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= DEFAULT_SHORTLIST)
        .select("query_id", "vec_id")
    )
    cand_vec = short.join(emb.select("vec_id", "embedding"), "vec_id")
    rr = knn.score_pairs_joined(cand_vec, queries_df)
    wk = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    res = (
        rr.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= 10)
        .select("query_id", "vec_id", "score", "rank")
    )
    return res.select(
        "query_id",
        "vec_id",
        F.round("score", 6).alias("score"),
        F.col("rank").cast("long").alias("rnk"),
    )


registry.WARMERS["ivfpq_search_prebuilt"] = warm_ivfpq


@register("ivfpq_search_prebuilt")  # rows-only
def ivfpq_search_prebuilt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serve path against the process-cached IVFADC layout: probe + ADC +
    rerank only — what a query costs once both indexes exist (the same
    cold/serve split as ivf_search / ivf_search_prebuilt). Under
    registry.STRICT_SERVE a cold cache raises instead of building."""
    registry.require_warm(
        _IVFPQ_CACHE, (spark.sparkContext.applicationId, sf_dir), "ivfpq"
    )
    return ivfpq_search(spark, sf_dir)
