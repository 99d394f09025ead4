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

Since r10 the trainer is the integer-lattice Euclidean Lloyd's
(:func:`_kmeans_euclid_grid`) and the ADC arithmetic is exact-integer, so
the whole family carries FULL DuckDB value oracles; recall vs the exact
flat scan is additionally pinned in tests/test_ann_recall.py, the same
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
    reseed from random points, mirroring ivf.kmeans_cosine. Kept for
    id-less corpora (catalog sample paths); the oracle-able default is
    :func:`_kmeans_euclid_grid`."""
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


def _kmeans_euclid_grid(Xq: np.ndarray, k: int, iters: int) -> np.ndarray:
    """Integer-exact Euclidean Lloyd's for one subspace (r10 — the
    kmeans_grid treatment for PQ): rows are lattice ints ALREADY in md5
    draw order; init = first k rows, assignment by exact-integer
    argmin ||x−c||² (as argmax of 2x·c − ||c||², ties to the lowest
    code), update = mean re-snapped to the lattice with floor(s/m + 0.5)
    (an exact-int division, correctly rounded identically in both
    engines), empty codes reseed from draw-rank (t*k + code) mod n.
    Early exit only at an exact fixed point — value-neutral against the
    oracle's fixed unroll. No renormalize: Euclidean means, per Jégou's
    PQ, stay off the sphere."""
    n = len(Xq)
    k = min(k, n)
    C = Xq[:k].copy()
    for t in range(iters):
        logits = 2.0 * (Xq @ C.T) - np.einsum("ij,ij->i", C, C)  # exact ints
        a = np.argmax(logits, axis=1)
        sums = np.zeros_like(C)
        np.add.at(sums, a, Xq)
        counts = np.bincount(a, minlength=k)
        newC = np.zeros_like(C)
        live = counts > 0
        if live.any():
            newC[live] = np.floor(
                sums[live] / counts[live][:, None] + 0.5
            )
        dead = np.flatnonzero(~live)
        for c in dead:
            newC[c] = Xq[(t * k + int(c)) % n]
        if dead.size == 0 and np.array_equal(newC, C):
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
    id_col: str | None = "vec_id",
) -> np.ndarray:
    """(m, k, d/m) codebook tensor trained on a bounded sample of the
    unit-normalized corpus — one independent Euclidean k-means per
    subspace (PQ trains subspaces independently by construction).
    ``n_hint`` (row count from a parquet footer or an already-paid count)
    skips the sampling-fraction scan.

    With ``id_col`` present (the default) the trainer is
    :func:`_kmeans_euclid_grid` over md5-draw-ordered, lattice-quantized
    unit vectors — fully deterministic and DuckDB-replayable, so the PQ
    family carries full value oracles (r10). Codebook entries are exact
    lattice points (ints / KQ_GRID). Pass id_col=None for id-less
    corpora (legacy seeded float trainer, rows-only)."""
    from vectordb_from_scratch_spark.functions import linalg, texthash
    from vectordb_from_scratch_spark.operators.ivf import KQ_SAMPLE, _md5_rank

    if id_col is not None and id_col in corpus.columns:
        rows = (
            corpus.select(id_col, vec_col)
            .orderBy(
                texthash.hash60(F.col(id_col).cast("string")), F.col(id_col)
            )
            .limit(KQ_SAMPLE)
            .collect()
        )
        rows.sort(key=lambda r: _md5_rank(r[0]))
        Xq = linalg.quantize_units_np(
            np.array([r[1] for r in rows], dtype="float64")
        )
        d = Xq.shape[1]
        assert d % m == 0, f"dim {d} not divisible by {m} subspaces"
        sub = d // m
        return np.stack(
            [
                _kmeans_euclid_grid(Xq[:, i * sub : (i + 1) * sub], k, iters)
                for i in range(m)
            ]
        ) / float(linalg.KQ_GRID)
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
    doubles ≈ 128 KB, broadcast-small). Rows quantize to the shared unit
    lattice and codes come from exact-integer argmin (r10) — with
    lattice-trained codebooks both engines compute identical codes, the
    property the PQ value oracles ride on."""
    from vectordb_from_scratch_spark.functions import linalg

    mm, kk, sub = codebooks.shape
    C_int = np.floor(codebooks * linalg.KQ_GRID + 0.5)  # exact lattice ints
    cnorm2 = np.einsum("mkd,mkd->mk", C_int, C_int)  # (m, k) exact ints
    id_type = corpus.schema[id_col].dataType.simpleString()

    def enc_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            X = linalg.quantize_units_np(
                np.stack(pdf[vec_col].to_list()).astype("float64")
            )
            codes = np.empty((len(X), mm), dtype="int64")
            for i in range(mm):
                Xs = X[:, i * sub : (i + 1) * sub]
                logits = 2.0 * (Xs @ C_int[i].T) - cnorm2[i]  # exact ints
                codes[:, i] = np.argmax(logits, axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "codes": list(codes)}
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        enc_iter, schema=f"{id_col} {id_type}, codes array<long>"
    )


def _query_luts(queries_pdf: pd.DataFrame, codebooks: np.ndarray):
    """(qids, lut): per-query (m, k) ADC lookup tables — LUT[q, m, c] =
    dot(q_m, codebook[m][c]) over the lattice-quantized queries (r10:
    exact-integer entries, so ADC sums and the shortlist cut are
    cross-engine exact; the uniform G² scale never reorders). Shared by
    the shortlist scan and the candidate scorer so the two can never
    drift."""
    from vectordb_from_scratch_spark.functions import linalg

    mm, kk, sub = codebooks.shape
    C_int = np.floor(codebooks * linalg.KQ_GRID + 0.5)
    qids = queries_pdf["query_id"].to_numpy()
    Q = linalg.quantize_units_np(
        np.stack(queries_pdf["query_vec"].to_list()).astype("float64")
    )
    lut = np.stack(
        [Q[:, i * sub : (i + 1) * sub] @ C_int[i].T for i in range(mm)], axis=1
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


def _pq_cte_sql(
    m: int = M_SUBSPACES,
    k: int = K_CODES,
    iters: int = TRAIN_ITERS,
    sub: int = 8,
    include_base: bool = True,
) -> str:
    """CTE prefix replaying :func:`train_codebooks` (lattice route) +
    :func:`encode` in DuckDB, ending at ``pcodes(vec_id, m, code)`` and
    ``pc{iters}(m, code, c)`` — every assignment and mean-resnap is
    integer-exact, so the replay hash-proves the whole per-subspace
    training loop (the kmeans_grid discipline; VERDICT r9 #2 extended to
    PQ in r10). Preconditions: corpus d = m·sub = 64 and n ≥ k (both
    fixtures)."""
    from vectordb_from_scratch_spark.functions import linalg
    from vectordb_from_scratch_spark.functions.texthash import hash60_sql

    KQ_SAMPLE = linalg.KQ_SAMPLE
    g = float(linalg.KQ_GRID)
    parts = [] if not include_base else [
        "raw AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)",
        "unit AS (SELECT vec_id, CASE WHEN sqrt(list_dot_product(e, e)) = 0"
        " THEN e ELSE list_transform(e, x -> x / sqrt(list_dot_product(e, e)))"
        " END AS u FROM raw)",
        f"qv AS MATERIALIZED (SELECT vec_id,"
        f" list_transform(u, x -> floor(x * {g} + 0.5)) AS q FROM unit)",
        f"drw AS MATERIALIZED (SELECT vec_id, q,"
        f" row_number() OVER (ORDER BY {hash60_sql('vec_id::VARCHAR')},"
        f" vec_id) - 1 AS rk FROM qv)",
        f"trn AS MATERIALIZED (SELECT * FROM drw WHERE rk < {KQ_SAMPLE})",
        "tn AS (SELECT count(*) AS n FROM trn)",
    ]
    parts += [
        f"psub AS MATERIALIZED (SELECT vec_id, rk, mm.range AS m,"
        f" q[mm.range * {sub} + 1 : mm.range * {sub} + {sub}] AS sv"
        f" FROM trn, range({m}) mm)",
        f"pc0 AS MATERIALIZED (SELECT m, rk AS code, sv AS c"
        f" FROM psub WHERE rk < {k})",
    ]
    assign = (
        "SELECT s.vec_id, s.m, s.sv, c.code, row_number() OVER ("
        "PARTITION BY s.vec_id, s.m ORDER BY "
        "2 * list_dot_product(s.sv, c.c) - list_dot_product(c.c, c.c) DESC, "
        "c.code ASC) AS rn FROM {src} s JOIN {cb} c USING (m)"
    )
    for t in range(iters):
        parts += [
            f"pa{t} AS MATERIALIZED (SELECT vec_id, m, sv, code FROM ("
            + assign.format(src="psub", cb=f"pc{t}")
            + ") WHERE rn = 1)",
            f"ps{t} AS MATERIALIZED (SELECT m, code, dim, sum(val) AS s,"
            f" count(*) AS cnt FROM (SELECT m, code,"
            f" generate_subscripts(sv, 1) AS dim, unnest(sv) AS val"
            f" FROM pa{t}) GROUP BY 1, 2, 3)",
            f"pw{t} AS MATERIALIZED (SELECT m, code,"
            f" list(floor(s / cnt + 0.5) ORDER BY dim) AS c"
            f" FROM ps{t} GROUP BY m, code)",
            f"pc{t + 1} AS MATERIALIZED (SELECT m, code, c FROM pw{t}"
            f" UNION ALL SELECT g.m, g.code, t.sv AS c FROM ("
            f"SELECT mm.range AS m, r.range AS code"
            f" FROM range({m}) mm, range({k}) r"
            f" EXCEPT SELECT m, code FROM pw{t}) g JOIN psub t"
            f" ON t.m = g.m AND t.rk = ({t} * {k} + g.code)"
            f" % (SELECT n FROM tn))",
        ]
    parts += [
        f"suball AS MATERIALIZED (SELECT vec_id, mm.range AS m,"
        f" q[mm.range * {sub} + 1 : mm.range * {sub} + {sub}] AS sv"
        f" FROM drw, range({m}) mm)",
        f"pcodes AS MATERIALIZED (SELECT vec_id, m, code FROM ("
        + assign.format(src="suball", cb=f"pc{iters}")
        + ") WHERE rn = 1)",
    ]
    return ",\n".join(parts)


_PQ_BALANCE_SQL = f"""
WITH {_pq_cte_sql()}
SELECT code::BIGINT AS code0, count(*)::BIGINT AS n_vectors
FROM pcodes WHERE m = 0 GROUP BY code
"""

_PQ_SEARCH_SQL = f"""
WITH {_pq_cte_sql()},
lut AS (SELECT q.vec_id AS query_id, c.m, c.code,
               list_dot_product(q.q[c.m * 8 + 1 : c.m * 8 + 8], c.c) AS dot
        FROM qv q CROSS JOIN pc{TRAIN_ITERS} c WHERE q.vec_id < 10),
adc AS (SELECT l.query_id, p.vec_id, sum(l.dot) AS adc
        FROM pcodes p JOIN lut l USING (m, code)
        GROUP BY 1, 2),
short AS (SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                       ORDER BY adc DESC, vec_id ASC) AS rn
            FROM adc) WHERE rn <= {DEFAULT_SHORTLIST}),
sc AS (SELECT s.query_id, s.vec_id,
              CASE WHEN sqrt(list_dot_product(q.e, q.e))
                        * sqrt(list_dot_product(r.e, r.e)) = 0 THEN 0.0
                   ELSE list_dot_product(q.e, r.e)
                        / (sqrt(list_dot_product(q.e, q.e))
                           * sqrt(list_dot_product(r.e, r.e))) END AS score
       FROM short s JOIN raw q ON q.vec_id = s.query_id
                    JOIN raw r ON r.vec_id = s.vec_id),
rk AS (SELECT query_id, vec_id, score,
              row_number() OVER (PARTITION BY query_id
                  ORDER BY score DESC, vec_id ASC) AS rnk
       FROM sc)
SELECT query_id, vec_id, round(score, 6) AS score, rnk
FROM rk WHERE rnk <= 10
"""


def _ivfpq_search_sql(n_probes: int = 8, k: int = 10) -> str:
    """The composed IVFPQ oracle (r10): the IVF grid-training chain
    (probes + afin) and the PQ chain (pc{T} + pcodes) concatenate over a
    shared base — candidates are the probed clusters' members, ADC runs
    only on those, the shortlist exact-reranks. Every discrete step
    (training, probes, codes, ADC cut) is integer-exact; only the final
    rerank is float, under the proven knn-oracle pattern."""
    from vectordb_from_scratch_spark.functions.lattice_sql import (
        IVF_TRAIN_ITERS as IVF_ITERS,
        kmeans_grid_sql as _kmeans_grid_sql,
    )

    return f"""
WITH {_kmeans_grid_sql()},
{_pq_cte_sql(include_base=False)},
ipr AS (SELECT query_id, cluster_id FROM (
          SELECT q.vec_id AS query_id, c.cluster_id,
                 row_number() OVER (PARTITION BY q.vec_id
                     ORDER BY list_dot_product(q.q, c.c) DESC,
                              c.cluster_id ASC) AS rn
          FROM qv q CROSS JOIN c{IVF_ITERS} c WHERE q.vec_id < 10)
        WHERE rn <= {n_probes}),
icand AS (SELECT p.query_id, a.vec_id FROM ipr p JOIN afin a USING (cluster_id)),
lut AS (SELECT q.vec_id AS query_id, c.m, c.code,
               list_dot_product(q.q[c.m * 8 + 1 : c.m * 8 + 8], c.c) AS dot
        FROM qv q CROSS JOIN pc{TRAIN_ITERS} c WHERE q.vec_id < 10),
adc AS (SELECT ic.query_id, ic.vec_id, sum(l.dot) AS adc
        FROM icand ic JOIN pcodes p USING (vec_id)
        JOIN lut l ON l.query_id = ic.query_id
                  AND l.m = p.m AND l.code = p.code
        GROUP BY 1, 2),
short AS (SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                       ORDER BY adc DESC, vec_id ASC) AS rn
            FROM adc) WHERE rn <= {DEFAULT_SHORTLIST}),
sc AS (SELECT s.query_id, s.vec_id,
              CASE WHEN sqrt(list_dot_product(q.e, q.e))
                        * sqrt(list_dot_product(r.e, r.e)) = 0 THEN 0.0
                   ELSE list_dot_product(q.e, r.e)
                        / (sqrt(list_dot_product(q.e, q.e))
                           * sqrt(list_dot_product(r.e, r.e))) END AS score
       FROM short s JOIN raw q ON q.vec_id = s.query_id
                    JOIN raw r ON r.vec_id = s.vec_id),
rk AS (SELECT query_id, vec_id, score,
              row_number() OVER (PARTITION BY query_id
                  ORDER BY score DESC, vec_id ASC) AS rnk
       FROM sc)
SELECT query_id, vec_id, round(score, 6) AS score, rnk
FROM rk WHERE rnk <= {k}
"""


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


@register("pq_search", _PQ_SEARCH_SQL)
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


@register("pq_search_prebuilt", _PQ_SEARCH_SQL)
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


@register("pq_search_bigq", _PQ_SEARCH_SQL)
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


@register("pq_code_balance", _PQ_BALANCE_SQL)
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
    ``_query_luts`` (lattice-quantize, per-subspace integer codebook
    matmul — r10), so scores match the closure path bit for bit."""
    from vectordb_from_scratch_spark.functions import linalg

    mm, _, sub = codebooks.shape
    C_int = np.floor(codebooks * linalg.KQ_GRID + 0.5)
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
                q = linalg.quantize_units_np(
                    np.asarray(
                        pdf["query_vec"].iloc[idx[0]], dtype="float64"
                    )[None, :]
                )[0]
                lut = np.stack(
                    [q[i * sub : (i + 1) * sub] @ C_int[i].T for i in range(mm)]
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
    probes = ivf.probe_clusters_df(centroids, queries_df, n_probes, grid=True)
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


@register("ivfpq_search", _ivfpq_search_sql())
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


@register("ivfpq_search_bigq", _ivfpq_search_sql())
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
    probes = ivf.probe_clusters_df(centroids, queries_df, 8, grid=True)
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


@register("ivfpq_search_prebuilt", _ivfpq_search_sql())
def ivfpq_search_prebuilt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serve path against the process-cached IVFADC layout: probe + ADC +
    rerank only — what a query costs once both indexes exist (the same
    cold/serve split as ivf_search / ivf_search_prebuilt). Under
    registry.STRICT_SERVE a cold cache raises instead of building."""
    registry.require_warm(
        _IVFPQ_CACHE, (spark.sparkContext.applicationId, sf_dir), "ivfpq"
    )
    return ivfpq_search(spark, sf_dir)
