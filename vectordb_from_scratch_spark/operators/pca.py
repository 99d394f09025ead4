"""Embedding PCA — top two principal components by fixed-iteration power
method + Hotelling deflation over the corpus covariance, plus per-vector
(PC1, PC2) scores.

The dimensionality screen that complements ``eval_mrl_overlap``: MRL
truncation asks "do the FIRST d' coordinates carry the ranking?"; PCA
asks "what single direction carries the most variance?" — the number
that sizes whitening / dim-reduction before an ANN index is built.
No reference anchor (the reference stores vectors verbatim,
/root/reference/app/core/indexes/flat.py); north-star extension per
BASELINE.json.

Determinism contract (the reason this is value-oracle-able at all):
power iteration from a FIXED init vector is a deterministic function —
no eigenvector sign ambiguity exists because the iterate's sign is
pinned by ⟨v0, dominant⟩; both engines run the identical 40 steps in
double precision and outputs are rounded to 6dp (measured cross-engine
drift ~1e-12, dominated by aggregation-order ulps in the covariance).

Scale shape: ONE corpus pass computes the raw second moment — an
Arrow-batched einsum per partition emitting a single (n, Σx, Σxxᵀ) row
per batch (shuffle volume = dims² per batch, independent of corpus
rows) — then the d²-sized moment matrix reduces by key and the 40
matrix-vector steps run driver-side on the 64×64 covariance
(broadcast-class, the train_centroids/probe-policy discipline). The
corpus is never revisited; scores are one more map-side pass with the
component as a literal array.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.registry import register
from vectordb_from_scratch_spark.session import load_table

DIMS = 64
POWER_ITERS = 40

#: (applicationId, sf_dir) -> (mu, v1, eig1, v2, eig2, trace) — the
#: applicationId component invalidates the cache when a new Spark app
#: reuses a fixture path (the _EDGES_CACHE key contract, ADVICE r8).
_PCA_CACHE: dict[tuple[str, str], tuple] = {}

#: (applicationId, sf_dir) -> (mu, C, trace): one moment pass feeds
#: every consumer — the 2-component queries, the rank-r family, and the
#: reduced-dim index composition.
_COV_CACHE: dict[tuple[str, str], tuple] = {}

#: (applicationId, sf_dir, r) -> (mu, [(v_k, eig_k)] * r)
_PCA_TOPR_CACHE: dict[tuple[str, str, int], tuple] = {}


def _moment_rows(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per Arrow batch: one row carrying (n, Σx, flattened Σ x xᵀ)."""
    import numpy as np

    for pdf in it:
        if not len(pdf):
            continue
        X = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
        yield pd.DataFrame(
            {
                "n": [int(len(X))],
                "s": [X.sum(axis=0).tolist()],
                "g": [np.einsum("ni,nj->ij", X, X).reshape(-1).tolist()],
            }
        )


def _covariance(spark: SparkSession, sf_dir: str):
    """(mu, C, trace): the corpus mean and covariance from ONE moment
    pass (cached per (applicationId, sf_dir)). The reduction runs
    executor-side: posexplode + keyed sum — never more than d² rows on
    any node at any batch count; only the d + d² totals
    (broadcast-class) ever reach the driver."""
    import numpy as np

    key = (spark.sparkContext.applicationId, str(sf_dir))
    if key in _COV_CACHE:
        return _COV_CACHE[key]
    from vectordb_from_scratch_spark.registry import track_persist

    emb = load_table(spark, sf_dir, "embeddings").select("embedding")
    parts = track_persist(
        emb.mapInPandas(
            _moment_rows, schema="n long, s array<double>, g array<double>"
        )
    )
    n = float(parts.agg(F.sum("n")).collect()[0][0])
    s_rows = (
        parts.select(F.posexplode("s").alias("i", "val"))
        .groupBy("i")
        .agg(F.sum("val").alias("t"))
        .collect()
    )
    g_rows = (
        parts.select(F.posexplode("g").alias("ij", "val"))
        .groupBy("ij")
        .agg(F.sum("val").alias("t"))
        .collect()
    )
    s = np.zeros(DIMS, dtype=np.float64)
    for r in s_rows:
        s[r["i"]] = r["t"]
    G = np.zeros(DIMS * DIMS, dtype=np.float64)
    for r in g_rows:
        G[r["ij"]] = r["t"]
    G = G.reshape(DIMS, DIMS)
    mu = s / n
    C = G / n - np.outer(mu, mu)
    out = (mu, C, float(np.trace(C)))
    _COV_CACHE[key] = out
    return out


def fit_pca_topr(spark: SparkSession, sf_dir: str, r: int) -> tuple:
    """(mu list, [(v_k list, eig_k)] × r): the top-r principal
    components by SEQUENTIAL Hotelling deflation (r9, VERDICT r8 #6) —
    C_{k+1} = C_k − λ_k v_k v_kᵀ, each component the same 40 fixed
    power steps from the same pinned init. Deflation (not QR block
    iteration) is the rank-r generalization the VALUE ORACLE can
    replay: every arithmetic step is a deterministic function the
    unrolled CTE chain reproduces in double precision, where a QR's
    column signs/pivoting are not SQL-stable. The corpus cost is
    unchanged — ONE moment pass feeds any r (the d² covariance is
    computed in full); each extra component is 40 driver-side 64×64
    matvecs."""
    import numpy as np

    key = (spark.sparkContext.applicationId, str(sf_dir), int(r))
    if key in _PCA_TOPR_CACHE:
        return _PCA_TOPR_CACHE[key]
    mu, C, _ = _covariance(spark, sf_dir)

    def power(M):
        v = np.full(DIMS, 0.125, dtype=np.float64)  # unit-norm fixed init
        for _ in range(POWER_ITERS):
            w = M @ v
            v = w / np.sqrt(float(w @ w))
        return v, float(v @ M @ v)

    comps = []
    Mk = C
    for _ in range(r):
        v, eig = power(Mk)
        comps.append((v.tolist(), eig))
        Mk = Mk - eig * np.outer(v, v)
    out = (mu.tolist(), comps)
    _PCA_TOPR_CACHE[key] = out
    return out


def fit_pca2(spark: SparkSession, sf_dir: str) -> tuple:
    """(mu, v1, eig1, v2, eig2, trace): the top TWO principal components
    — PC2 by Hotelling deflation (C₂ = C − λ₁v₁v₁ᵀ, then the same 40
    fixed power steps from the same init; both engines replay the
    deflation in double precision so the second component is exactly as
    deterministic as the first). Thin view over :func:`fit_pca_topr`."""
    key = (spark.sparkContext.applicationId, str(sf_dir))
    if key in _PCA_CACHE:
        return _PCA_CACHE[key]
    mu, comps = fit_pca_topr(spark, sf_dir, 2)
    (v1, eig1), (v2, eig2) = comps
    trace = _covariance(spark, sf_dir)[2]
    out = (mu, v1, eig1, v2, eig2, trace)
    _PCA_CACHE[key] = out
    return out


# --- oracle -------------------------------------------------------------------


#: CTE name prefixes per component — pa/pb keep the r8 names so the
#: 2-component oracle text is unchanged; pc/pd extend the family.
_PCA_PREFIXES = ("pa", "pb", "pc", "pd")


def _pca_cte_chain(n_comp: int = 2) -> str:
    """Covariance + ``n_comp`` unrolled 40-step power iterations with a
    Hotelling deflation between each (the exact replay of
    :func:`fit_pca_topr`). Every v{k} is MATERIALIZED: w{k+1} references
    it 64 times through the join. Component k's vector lands in
    ``{prefix_k}{POWER_ITERS}``, its Rayleigh eigenvalue in
    ``ray{k}``."""
    ctes = [
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        "nn AS (SELECT count(*)::DOUBLE AS n FROM e)",
        "x AS MATERIALIZED (SELECT vec_id, i, v[i]::DOUBLE AS xi "
        f"FROM e, unnest(range(1, {DIMS + 1})) AS u(i))",
        "mu AS MATERIALIZED (SELECT i, sum(xi) / (SELECT n FROM nn) AS m "
        "FROM x GROUP BY i)",
        "g AS MATERIALIZED (SELECT a.i AS i, b.i AS j, sum(a.xi * b.xi) AS gij "
        "FROM x a JOIN x b USING (vec_id) GROUP BY a.i, b.i)",
        "c AS MATERIALIZED (SELECT g.i, g.j, "
        "g.gij / (SELECT n FROM nn) - ma.m * mb.m AS cij "
        "FROM g JOIN mu ma ON ma.i = g.i JOIN mu mb ON mb.i = g.j)",
        f"v0 AS (SELECT i, 0.125::DOUBLE AS vi "
        f"FROM unnest(range(1, {DIMS + 1})) AS t(i))",
    ]

    def power_chain(prefix: str, mat: str) -> None:
        for k in range(1, POWER_ITERS + 1):
            prev = f"{prefix}{k - 1}" if k > 1 else "v0"
            ctes.append(
                f"{prefix}w{k} AS MATERIALIZED (SELECT m.i, sum(m.cij * v.vi) AS wi "
                f"FROM {mat} m JOIN {prev} v ON v.i = m.j GROUP BY m.i)"
            )
            ctes.append(
                f"{prefix}{k} AS MATERIALIZED (SELECT i, "
                f"wi / (SELECT sqrt(sum(wi * wi)) FROM {prefix}w{k}) AS vi "
                f"FROM {prefix}w{k})"
            )

    mat = "c"
    for comp in range(1, n_comp + 1):
        prefix = _PCA_PREFIXES[comp - 1]
        power_chain(prefix, mat)
        last = f"{prefix}{POWER_ITERS}"
        ctes.append(
            f"ray{comp} AS (SELECT sum(va.vi * {mat}.cij * vb.vi) AS eig "
            f"FROM {mat} JOIN {last} va ON va.i = {mat}.i "
            f"JOIN {last} vb ON vb.i = {mat}.j)"
        )
        if comp < n_comp:
            # Hotelling deflation: C_{k+1} = C_k - eig_k * v_k v_kᵀ
            nxt = f"c{comp + 1}"
            ctes.append(
                f"{nxt} AS MATERIALIZED (SELECT {mat}.i, {mat}.j, "
                f"{mat}.cij - (SELECT eig FROM ray{comp}) * a.vi * b.vi AS cij "
                f"FROM {mat} JOIN {last} a ON a.i = {mat}.i "
                f"JOIN {last} b ON b.i = {mat}.j)"
            )
            mat = nxt
    ctes.append("tr AS (SELECT sum(cij) AS trace FROM c WHERE i = j)")
    return ",\n".join(ctes)


_PCA_COMPONENT_SQL = (
    "WITH "
    + _pca_cte_chain()
    + f"""
SELECT 1::BIGINT AS component, (v.i - 1)::BIGINT AS dim_idx,
       round(v.vi, 6) AS loading,
       round(ray1.eig, 6) AS eigenvalue,
       round(ray1.eig / tr.trace, 6) AS explained_ratio
FROM pa{POWER_ITERS} v CROSS JOIN ray1 CROSS JOIN tr
UNION ALL
SELECT 2::BIGINT, (v.i - 1)::BIGINT,
       round(v.vi, 6), round(ray2.eig, 6), round(ray2.eig / tr.trace, 6)
FROM pb{POWER_ITERS} v CROSS JOIN ray2 CROSS JOIN tr
"""
)


@register("embedding_pca_components", _PCA_COMPONENT_SQL)
def embedding_pca_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 PCA loadings (128 rows) + Rayleigh-quotient eigenvalues +
    explained variance ratios. FULL value oracle: DuckDB recomputes the
    covariance and replays all 80 power steps (40 per component, with
    the deflation in between) through the unrolled CTE chain."""
    mu, v1, eig1, v2, eig2, trace = fit_pca2(spark, sf_dir)
    rows = [
        (c, i, round(float(x), 6), round(e, 6), round(e / trace, 6))
        for c, vec, e in ((1, v1, eig1), (2, v2, eig2))
        for i, x in enumerate(vec)
    ]
    return spark.createDataFrame(
        rows,
        "component bigint, dim_idx bigint, loading double, "
        "eigenvalue double, explained_ratio double",
    )


_PCA_SCORES_SQL = (
    "WITH "
    + _pca_cte_chain()
    + f"""
SELECT x.vec_id,
       round(sum((x.xi - mu.m) * a.vi), 6) AS pc1,
       round(sum((x.xi - mu.m) * b.vi), 6) AS pc2
FROM x JOIN mu ON mu.i = x.i
       JOIN pa{POWER_ITERS} a ON a.i = x.i
       JOIN pb{POWER_ITERS} b ON b.i = x.i
GROUP BY x.vec_id
"""
)


@register("embedding_pca_scores", _PCA_SCORES_SQL)
def embedding_pca_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector (PC1, PC2) projection (x − μ)·vₖ — the 2-D shadow every
    embedding-corpus diagnostic plot starts from. The components ride
    the plan as literal arrays; scoring is one map-side
    aggregate-of-zip_with pass (pure codegen, no UDF, no shuffle beyond
    the scan)."""
    mu, v1, _, v2, _, _ = fit_pca2(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    mu_lit = F.array(*[F.lit(float(m)) for m in mu])
    centered = F.zip_with(
        F.col("embedding").cast("array<double>"), mu_lit, lambda x, m: x - m
    )

    def proj(vec: list) -> Column:
        v_lit = F.array(*[F.lit(float(x)) for x in vec])
        return F.aggregate(
            F.zip_with(centered, v_lit, lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return emb.select(
        "vec_id", F.round(proj(v1), 6).alias("pc1"), F.round(proj(v2), 6).alias("pc2")
    )


# --- rank-r components (r9, VERDICT r8 #6) ------------------------------------

PCA_R4 = 4

_PCA_R4_SQL = (
    "WITH "
    + _pca_cte_chain(PCA_R4)
    + "\nSELECT component, dim_idx, loading, eigenvalue, explained_ratio FROM ("
    + "\nUNION ALL\n".join(
        f"SELECT {k}::BIGINT AS component, (v.i - 1)::BIGINT AS dim_idx, "
        f"round(v.vi, 6) AS loading, round(ray{k}.eig, 6) AS eigenvalue, "
        f"round(ray{k}.eig / tr.trace, 6) AS explained_ratio "
        f"FROM {_PCA_PREFIXES[k - 1]}{POWER_ITERS} v CROSS JOIN ray{k} CROSS JOIN tr"
        for k in range(1, PCA_R4 + 1)
    )
    + ")"
)


@register("embedding_pca_components_r4", _PCA_R4_SQL)
def embedding_pca_components_r4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-4 PCA loadings (256 rows) — the rank-r family past the r8
    2-component ceiling (VERDICT r8 #6). FULL value oracle: DuckDB
    replays all 160 power steps and all three deflations through the
    unrolled CTE chain. The corpus cost is identical to the 2-component
    query (one shared moment pass); only driver-side 64×64 matvecs
    grow with r."""
    mu, comps = fit_pca_topr(spark, sf_dir, PCA_R4)
    _, _, trace = _covariance(spark, sf_dir)
    rows = [
        (k + 1, i, round(float(x), 6), round(eig, 6), round(eig / trace, 6))
        for k, (vec, eig) in enumerate(comps)
        for i, x in enumerate(vec)
    ]
    return spark.createDataFrame(
        rows,
        "component bigint, dim_idx bigint, loading double, "
        "eigenvalue double, explained_ratio double",
    )


def pca_project_col(emb: Column, mu: list, comps: list) -> Column:
    """array<double> of (x − μ)·v_k for each component — pure codegen
    zip_with folds, the same expression family as the 2-D scores."""
    mu_lit = F.array(*[F.lit(float(m)) for m in mu])
    centered = F.zip_with(emb.cast("array<double>"), mu_lit, lambda x, m: x - m)
    outs = []
    for vec, _ in comps:
        v_lit = F.array(*[F.lit(float(x)) for x in vec])
        outs.append(
            F.aggregate(
                F.zip_with(centered, v_lit, lambda x, w: x * w),
                F.lit(0.0),
                lambda acc, t: acc + t,
            )
        )
    return F.array(*outs)


# --- reduced-dim index composition (r9, VERDICT r8 #6) -------------------------
#
# The loop eval_mrl_overlap opened, closed: project the corpus onto the
# top PCA_INDEX_R components, build an IVF index ON THE REDUCED vectors,
# and measure what serving from the compacted index costs against the
# full-dimension exact ranking. This is the whitening/compaction
# decision a 100 TB deployment makes before committing an index: the
# reduced index stores r/d of the bytes and scores r/d of the floats
# per candidate.

PCA_INDEX_RS = (8, 16, 32)
PCA_RECALL_Q = 20
PCA_RECALL_K = 10


@register("eval_pca_ivf_recall")  # rows-only: k-means training is not
# SQL-expressible; the recall curve is pinned in tests/test_ann_recall.py
# and recorded in BASELINE.md
def eval_pca_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(r, query_id, overlap_at_k): top-10 overlap between IVF search
    over the r-dim PCA-reduced corpus and the full-dimension exact
    scan, for r ∈ PCA_INDEX_RS and the first PCA_RECALL_Q vectors as
    queries — the sizing table a deployment reads BEFORE committing a
    compacted index. One component fit at max(r) serves every r
    (sequential deflation is prefix-stable: components 1..8 of the
    rank-32 fit ARE the rank-8 fit), one map-side projection emits the
    32-dim scores, and each r's corpus is a slice of it;
    train/assign/search are the standard ivf kernels with ``vec_col``
    pointed at the sliced column — the composition is wiring, not new
    machinery.

    Measured on the fixture (BASELINE.md): recall@10 ≈ 0.22 / 0.31 /
    0.48 at r = 8 / 16 / 32, tracking the flat eigen-spectrum (energy
    retained 0.20 / 0.38 / 0.65) — the fixture's within-cluster
    directions are near-isotropic, so THIS corpus does not compact,
    and the eval's job is precisely to say so before an index is
    built (contrast eval_mrl_overlap, which measures the oblivious
    prefix cut the same way)."""
    from vectordb_from_scratch_spark.operators import ivf as ivf_ops
    from vectordb_from_scratch_spark.operators import knn
    from vectordb_from_scratch_spark.registry import track_persist

    r_max = max(PCA_INDEX_RS)
    mu, comps = fit_pca_topr(spark, sf_dir, r_max)
    emb = load_table(spark, sf_dir, "embeddings")
    reduced = track_persist(
        emb.select(
            "vec_id", pca_project_col(F.col("embedding"), mu, comps).alias("rv")
        )
    )
    n = reduced.count()
    n_clusters = max(1, min(ivf_ops.DEFAULT_N_CLUSTERS, n // 8 or 1))
    fq = emb.filter(F.col("vec_id") < PCA_RECALL_Q).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("query_vec"),
    )
    # persisted: the exact reference feeds each r's overlap join, and an
    # unmaterialized subtree would be re-evaluated once per union branch
    # (guide §7.2 duplicated-subtree smell)
    full_top = track_persist(
        knn.topk(emb, fq, k=PCA_RECALL_K).select("query_id", "vec_id")
    )
    # ONE md5-ordered sample collect at r_max, sliced per r (r11): the
    # draw order depends only on vec_id, so sample[:, :r] is exactly the
    # sample the r-sliced corpus would have produced — 3 TakeOrdered jobs
    # collapse to 1. Same for the rerank query table.
    Xfull = ivf_ops.train_sample(reduced, vec_col="rv")
    qpdf_full = (
        reduced.filter(F.col("vec_id") < PCA_RECALL_Q)
        .select(F.col("vec_id").alias("query_id"), F.col("rv").alias("query_vec"))
        .toPandas()
    )
    outs = []
    for r in PCA_INDEX_RS:
        red_r = reduced.select(
            "vec_id", F.slice(F.col("rv"), 1, r).alias("rv")
        )
        centroids = ivf_ops.centroids_from_sample(
            spark, Xfull[:, :r], n_clusters
        )
        assignments = ivf_ops.assign(
            red_r, centroids, id_col="vec_id", vec_col="rv"
        )
        rq = red_r.filter(F.col("vec_id") < PCA_RECALL_Q).select(
            F.col("vec_id").alias("query_id"), F.col("rv").alias("query_vec")
        )
        qpdf_r = qpdf_full.assign(query_vec=qpdf_full["query_vec"].map(lambda v: list(v[:r])))
        red_top = ivf_ops.search(
            red_r, centroids, assignments, rq,
            k=PCA_RECALL_K, id_col="vec_id", vec_col="rv", qpdf=qpdf_r,
        ).select("query_id", "vec_id")
        ov = (
            red_top.join(full_top, ["query_id", "vec_id"])
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("overlap_at_k"))
        )
        outs.append(
            fq.select("query_id")
            .join(ov, "query_id", "left")
            .select(
                F.lit(r).cast("long").alias("r"),
                "query_id",
                F.coalesce(F.col("overlap_at_k"), F.lit(0))
                .cast("long")
                .alias("overlap_at_k"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


@register("eval_pca_route_rerank")  # rows-only: k-means training is not
# SQL-expressible; the recall floors are pinned in tests/test_ann_recall.py
def eval_pca_route_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(r, query_id, overlap_at_k): the CONSTRUCTIVE half of the
    compaction verdict. `eval_pca_ivf_recall` shows scoring in reduced
    space forfeits recall on a flat-spectrum corpus; this query puts
    the compaction where it belongs — ROUTING ONLY. Centroids,
    assignments and probes live in the r-dim PCA space (r/d of the
    routing bytes and FLOPs — at 100 TB that is the centroid table, the
    assignment pass, and the per-query probe matmul all shrunk by 8×
    at r=8), while candidates rerank against the ORIGINAL full-dim
    vectors, so the only recall loss left is cluster coverage — the
    same loss full-dim IVF pays. The r = DIMS row routes on the
    ORIGINAL vectors under the identical (n_clusters, n_probes)
    config — the apples-to-apples reference that isolates what the
    reduced route costs vs what probe coverage costs; cluster count
    follows the BASELINE recall-contract config (16 at fixture scale),
    not the serving n//8 heuristic, because recall comparisons need
    coverage held fixed. Measured on the fixture (BASELINE.md): the
    reduced routes land within a few points of the full-dim route at
    every r, where reduced-space SCORING lost half the ranking — the
    classic coarse-quantizer/exact-rerank split (IVFADC's
    architecture), demonstrated on the corpus the plain reduction
    verdict rejected."""
    from pyspark.sql import Window

    from vectordb_from_scratch_spark.operators import ivf as ivf_ops
    from vectordb_from_scratch_spark.operators import knn
    from vectordb_from_scratch_spark.registry import track_persist

    r_max = max(PCA_INDEX_RS)
    mu, comps = fit_pca_topr(spark, sf_dir, r_max)
    emb = load_table(spark, sf_dir, "embeddings")
    reduced = track_persist(
        emb.select(
            "vec_id", pca_project_col(F.col("embedding"), mu, comps).alias("rv")
        )
    )
    n = reduced.count()
    n_clusters = max(1, min(16, n // 30 or 1))
    fq = emb.filter(F.col("vec_id") < PCA_RECALL_Q).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("query_vec"),
    )
    qpdf = fq.toPandas()  # PCA_RECALL_Q rows — probe-table class
    # persisted: reused by every union branch's overlap join (guide §7.2)
    full_top = track_persist(
        knn.topk(emb, fq, k=PCA_RECALL_K).select("query_id", "vec_id")
    )
    # one sample collect serves all three reduced r's (prefix-stable draw,
    # see eval_pca_ivf_recall); the full-dim reference row samples its own
    # (different vector column, same ids)
    Xred = ivf_ops.train_sample(reduced, vec_col="rv")
    # Route per r, but rerank ONCE (r12, VERDICT r11 #7 / guide §4.1):
    # every branch reranks its candidates against the SAME full-dim
    # vectors with the SAME queries, so the per-pair cosine is branch-
    # independent (row-wise numpy ops — no batch-shape dependence). The
    # union's distinct (query_id, vec_id) pool goes through ONE Arrow
    # scoring pass and each branch joins its scores back — 4 Python
    # boundaries collapse to 1 and overlapping candidates score once.
    # Each branch's candidate set is checkpointed: it feeds the pool AND
    # its own rerank join, and unmaterialized the Arrow assign subtree
    # would re-execute per consumer (guide §7.2).
    cands = []
    for r in (*PCA_INDEX_RS, DIMS):
        if r == DIMS:  # full-dim routing reference, identical config
            red_r = emb.select(
                "vec_id", F.col("embedding").cast("array<double>").alias("rv")
            )
            centroids = ivf_ops.train_centroids(
                red_r, n_clusters=n_clusters, vec_col="rv", n_hint=n
            )
        else:
            red_r = reduced.select(
                "vec_id", F.slice(F.col("rv"), 1, r).alias("rv")
            )
            centroids = ivf_ops.centroids_from_sample(
                spark, Xred[:, :r], n_clusters
            )
        assignments = ivf_ops.assign(
            red_r, centroids, id_col="vec_id", vec_col="rv"
        )
        rq = red_r.filter(F.col("vec_id") < PCA_RECALL_Q).select(
            F.col("vec_id").alias("query_id"), F.col("rv").alias("query_vec")
        )
        probes = ivf_ops.probe_clusters_df(
            centroids, rq, ivf_ops.DEFAULT_N_PROBES
        )
        cand = (
            assignments.join(F.broadcast(probes), "cluster_id")
            .select("query_id", "vec_id")
            .localCheckpoint(eager=False)
        )
        cands.append((r, cand))
    pool = cands[0][1]
    for _, c in cands[1:]:
        pool = pool.unionByName(c)
    pool_vec = pool.distinct().join(emb.select("vec_id", "embedding"), "vec_id")
    scores = track_persist(
        knn.score_pairs_pandas(pool_vec, qpdf, "vec_id", "embedding")
    )
    outs = []
    for r, cand in cands:
        rerank = cand.join(scores, ["query_id", "vec_id"])
        w = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("vec_id").asc()
        )
        red_top = (
            rerank.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= PCA_RECALL_K)
            .select("query_id", "vec_id")
        )
        ov = (
            red_top.join(full_top, ["query_id", "vec_id"])
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("overlap_at_k"))
        )
        outs.append(
            fq.select("query_id")
            .join(ov, "query_id", "left")
            .select(
                F.lit(r).cast("long").alias("r"),
                "query_id",
                F.coalesce(F.col("overlap_at_k"), F.lit(0))
                .cast("long")
                .alias("overlap_at_k"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# --- Johnson-Lindenstrauss random projection ---------------------------------
#
# The data-oblivious sibling of PCA: a Rademacher (±1) sign matrix
# S (JL_DIMS × DIMS) with entries derived from the cross-engine md5
# (texthash.hash60 parity — the DSIR/walks uniform discipline), so the
# projection is EXACT arithmetic both engines can replay: ±1·float is
# lossless, the only drift is summation-order ulps, absorbed by 6dp
# rounding. y = S·(x)/√JL_DIMS preserves pairwise distances within the
# JL bound in expectation; `eval_jl_distortion` measures it on the
# fixture instead of assuming it.

JL_DIMS = 16
_JL_SALT = "jl"


def _jl_sign(k: int, i: int) -> int:
    """+1/-1 from md5 parity — mirrors the SQL rule in the oracle."""
    import hashlib

    h = int(hashlib.md5(f"{_JL_SALT}|{k}|{i}".encode()).hexdigest()[:15], 16)
    return 1 if h % 2 == 0 else -1


def jl_signs() -> list[list[int]]:
    """The full JL_DIMS × DIMS sign matrix (1,024 ints — a literal)."""
    return [[_jl_sign(k, i) for i in range(1, DIMS + 1)] for k in range(JL_DIMS)]


def _jl_sign_sql() -> str:
    """signs(k, i, s) CTE — the same parity rule in DuckDB."""
    h = (
        f"(('0x' || substr(md5('{_JL_SALT}|' || k.k || '|' || i.i), 1, 15))::BIGINT)"
    )
    return (
        f"signs AS MATERIALIZED (SELECT k.k, i.i, "
        f"CASE WHEN {h} % 2 = 0 THEN 1.0 ELSE -1.0 END AS s "
        f"FROM unnest(range(0, {JL_DIMS})) AS k(k), "
        f"unnest(range(1, {DIMS + 1})) AS i(i))"
    )


def jl_project_col(emb: Column) -> Column:
    """array<double> of the JL_DIMS projections — pure codegen folds."""
    xs = emb.cast("array<double>")
    outs = []
    for row in jl_signs():
        s_lit = F.array(*[F.lit(float(s)) for s in row])
        outs.append(
            F.aggregate(
                F.zip_with(xs, s_lit, lambda x, s: x * s),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.lit(float(JL_DIMS) ** 0.5)
        )
    return F.array(*outs)


_JL_PROJECT_SQL = f"""
WITH {_jl_sign_sql()},
x AS (SELECT vec_id, i, embedding[i]::DOUBLE AS xi
      FROM (SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings),
           unnest(range(1, {DIMS + 1})) AS u(i))
SELECT x.vec_id, signs.k::BIGINT AS k,
       round(sum(signs.s * x.xi) / sqrt({JL_DIMS}::DOUBLE), 6) AS val
FROM x JOIN signs ON signs.i = x.i
GROUP BY x.vec_id, signs.k
"""


@register("embedding_jl_project", _JL_PROJECT_SQL)
def embedding_jl_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each embedding's 16-dim JL sketch, exploded to (vec_id, k,
    val). One map-side pass — the sign matrix rides the plan as 16
    literal arrays, no shuffle beyond the scan, no UDF. FULL value
    oracle (the oracle re-derives every sign from md5 parity)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", F.posexplode(jl_project_col(F.col("embedding"))).alias("k", "val")
    ).select("vec_id", F.col("k").cast("bigint"), F.round("val", 6).alias("val"))


_JL_PAIRS_N = 40

_JL_DISTORTION_SQL = f"""
WITH {_jl_sign_sql()},
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < {_JL_PAIRS_N}),
x AS (SELECT vec_id, i, v[i]::DOUBLE AS xi FROM e, unnest(range(1, {DIMS + 1})) AS u(i)),
y AS (SELECT x.vec_id, signs.k, sum(signs.s * x.xi) / sqrt({JL_DIMS}::DOUBLE) AS yk
      FROM x JOIN signs ON signs.i = x.i GROUP BY x.vec_id, signs.k),
dx AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              sum((a.xi - b.xi) * (a.xi - b.xi)) AS d2
       FROM x a JOIN x b ON a.i = b.i AND a.vec_id < b.vec_id
       GROUP BY 1, 2),
dy AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              sum((a.yk - b.yk) * (a.yk - b.yk)) AS d2
       FROM y a JOIN y b ON a.k = b.k AND a.vec_id < b.vec_id
       GROUP BY 1, 2)
SELECT dx.id_a, dx.id_b,
       round(dx.d2, 6) AS d2_orig,
       round(dy.d2, 6) AS d2_proj,
       round(dy.d2 / dx.d2, 6) AS distortion
FROM dx JOIN dy ON dx.id_a = dy.id_a AND dx.id_b = dy.id_b
"""


@register("eval_jl_distortion", _JL_DISTORTION_SQL)
def eval_jl_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The JL lemma, measured: squared-distance distortion
    ‖y_a−y_b‖²/‖x_a−x_b‖² over all pairs of the first 40
    vectors — the check that sizes a sketch dimension before committing
    an index to it (companion of `eval_mrl_overlap`, which measures the
    PREFIX-truncation alternative). Pairs come from a broadcast
    self-join of a 40-row slice; distances are zip_with folds."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < _JL_PAIRS_N
    )
    both = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("x"),
        jl_project_col(F.col("embedding")).alias("y"),
    )
    a = both.select(
        F.col("vec_id").alias("id_a"), F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = both.select(
        F.col("vec_id").alias("id_b"), F.col("x").alias("xb"), F.col("y").alias("yb")
    )

    def d2(u: Column, v: Column) -> Column:
        return F.aggregate(
            F.zip_with(u, v, lambda p, q: (p - q) * (p - q)),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )

    pairs = a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a",
        "id_b",
        F.round(d2(F.col("xa"), F.col("xb")), 6).alias("d2_orig"),
        F.round(d2(F.col("ya"), F.col("yb")), 6).alias("d2_proj"),
        F.round(
            d2(F.col("ya"), F.col("yb")) / d2(F.col("xa"), F.col("xb")), 6
        ).alias("distortion"),
    )


# --- rank-2 reconstruction error ----------------------------------------------

_PCA_RECON_SQL = (
    "WITH "
    + _pca_cte_chain()
    + f""",
proj AS (SELECT x.vec_id,
                sum((x.xi - mu.m) * a.vi) AS p1,
                sum((x.xi - mu.m) * b.vi) AS p2
         FROM x JOIN mu ON mu.i = x.i
                JOIN pa{POWER_ITERS} a ON a.i = x.i
                JOIN pb{POWER_ITERS} b ON b.i = x.i
         GROUP BY x.vec_id),
err AS (SELECT x.vec_id,
               sum((x.xi - mu.m - proj.p1 * a.vi - proj.p2 * b.vi)
                   * (x.xi - mu.m - proj.p1 * a.vi - proj.p2 * b.vi)) AS e2,
               sum((x.xi - mu.m) * (x.xi - mu.m)) AS t2
        FROM x JOIN mu ON mu.i = x.i
               JOIN pa{POWER_ITERS} a ON a.i = x.i
               JOIN pb{POWER_ITERS} b ON b.i = x.i
               JOIN proj ON proj.vec_id = x.vec_id
        GROUP BY x.vec_id)
SELECT vec_id, round(e2, 6) AS recon_err2,
       round(1.0 - e2 / t2, 6) AS retained_ratio
FROM err
"""
)


@register("eval_pca_recon_error", _PCA_RECON_SQL)
def eval_pca_recon_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector rank-2 PCA reconstruction error ‖x−μ−p₁v₁−p₂v₂‖² and
    the retained-energy ratio — the third leg of the dim-reduction eval
    family (MRL measures prefix truncation, JL measures the oblivious
    sketch, this measures the data-adapted 2-D subspace). Computed with
    the explicit residual, NOT the orthonormality shortcut t²−p₁²−p₂²:
    the 40-step deflated v₂ is only approximately orthogonal to v₁, and
    the explicit form is exact for whatever vectors the trainer actually
    produced. One map-side pass with μ/v₁/v₂ as literal arrays."""
    mu, v1, _, v2, _, _ = fit_pca2(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    mu_lit = F.array(*[F.lit(float(m)) for m in mu])
    v1_lit = F.array(*[F.lit(float(x)) for x in v1])
    v2_lit = F.array(*[F.lit(float(x)) for x in v2])
    centered = F.zip_with(
        F.col("embedding").cast("array<double>"), mu_lit, lambda x, m: x - m
    )

    def dot(u: Column, v: Column) -> Column:
        return F.aggregate(
            F.zip_with(u, v, lambda p, q: p * q), F.lit(0.0), lambda a, t: a + t
        )

    p1 = dot(centered, v1_lit)
    p2 = dot(centered, v2_lit)
    staged = emb.select(
        "vec_id", centered.alias("c"), p1.alias("__p1"), p2.alias("__p2")
    )
    c = F.col("c")
    resid = F.zip_with(
        F.zip_with(c, v1_lit, lambda x, w: x - F.col("__p1") * w),
        v2_lit,
        lambda x, w: x - F.col("__p2") * w,
    )
    e2 = F.aggregate(
        F.transform(resid, lambda r: r * r), F.lit(0.0), lambda a, t: a + t
    )
    t2 = F.aggregate(
        F.transform(c, lambda x: x * x), F.lit(0.0), lambda a, t: a + t
    )
    return staged.select(
        "vec_id",
        F.round(e2, 6).alias("recon_err2"),
        F.round(F.lit(1.0) - e2 / t2, 6).alias("retained_ratio"),
    )
