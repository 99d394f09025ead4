"""Retrieval-quality evaluation as a first-class operator — the harness
every ANN rollout runs before flipping traffic: rank an approximate
index's results against exact ground truth and report recall@k and
nDCG@k per query.

The evaluated pair here is the SQ8 compressed-domain ranking vs the
exact float cosine scan, because BOTH are SQL-expressible — so unlike
the recall numbers in tests/test_ann_recall.py (Python-side
assertions), this eval is itself a value-oracled QUERY: DuckDB
recomputes the two rankings and the metrics bit-for-bit. The same
DataFrame shape evaluates any (approx, truth) ranking pair; the
k-means/graph indexes plug into the identical join (their rows-only
status comes from the index, not the metric).

Scale shape: truth and approx are both WindowGroupLimit top-k plans
(O(parts·k) shuffles); the metric join is per-(query, k) rows —
thousands, never the corpus — and the final aggregate is one tiny
groupBy(query_id).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.registry import register
from vectordb_from_scratch_spark.session import load_table

EVAL_K = 10
EVAL_Q = 10
#: IDCG@k for binary relevance with all k relevant — a shared literal so
#: both engines divide by the identical constant.
IDCG_AT_K = sum(1.0 / math.log2(i + 1) for i in range(1, EVAL_K + 1))


def ranking_metrics(
    approx: DataFrame,
    truth: DataFrame,
    k: int = EVAL_K,
    id_col: str = "vec_id",
    rank_col: str = "rnk",
) -> DataFrame:
    """(query_id, recall_at_k, ndcg_at_k) for an approximate ranking
    (query_id, id, rank ≤ k) against a truth set (query_id, id). Binary
    relevance: rel = 1 iff the returned id is in the exact top-k."""
    t = truth.select("query_id", F.col(id_col).alias("_tid")).withColumn(
        "_rel", F.lit(1.0)
    )
    j = approx.join(
        t,
        (approx["query_id"] == t["query_id"]) & (approx[id_col] == t["_tid"]),
        "left",
    ).select(approx["query_id"], approx[rank_col], F.coalesce("_rel", F.lit(0.0)).alias("rel"))
    gain = F.col("rel") / F.log2(F.col(rank_col) + 1)
    return j.groupBy("query_id").agg(
        F.round(F.sum("rel") / k, 6).alias("recall_at_k"),
        F.round(F.sum(gain) / F.lit(IDCG_AT_K), 6).alias("ndcg_at_k"),
    )


_EVAL_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < {EVAL_Q}),
c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
s_ex AS (SELECT q.query_id, c.vec_id,
                CASE WHEN sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)) = 0
                     THEN 0.0
                     ELSE list_dot_product(qv, cv)
                          / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
                END AS score
         FROM q CROSS JOIN c),
truth AS (SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY score DESC, vec_id ASC) AS rnk
            FROM s_ex) WHERE rnk <= {EVAL_K}),
enc AS (
  SELECT vec_id,
         CASE WHEN list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) = 0
              THEN list_transform(embedding::DOUBLE[], x -> 0::BIGINT)
              ELSE list_transform(embedding::DOUBLE[],
                     x -> floor(x / list_max(list_transform(embedding::DOUBLE[], y -> abs(y)))
                                * 127 + 0.5)::BIGINT)
         END AS codes
  FROM embeddings),
n AS (SELECT vec_id, codes,
             list_dot_product(codes::DOUBLE[], codes::DOUBLE[]) AS norm2
      FROM enc),
qs AS (SELECT vec_id AS query_id, codes AS qc, norm2 AS qn FROM n
       WHERE vec_id < {EVAL_Q}),
s_sq AS (SELECT qs.query_id, n.vec_id,
                CASE WHEN qs.qn * n.norm2 = 0 THEN 0.0
                     ELSE list_dot_product(qs.qc::DOUBLE[], n.codes::DOUBLE[])
                          / sqrt(qs.qn * n.norm2)
                END AS score
         FROM qs CROSS JOIN n),
approx AS (SELECT query_id, vec_id, rnk FROM (
             SELECT query_id, vec_id,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY score DESC, vec_id ASC) AS rnk
             FROM s_sq) WHERE rnk <= {EVAL_K}),
j AS (SELECT a.query_id, a.rnk,
             CASE WHEN t.vec_id IS NOT NULL THEN 1.0 ELSE 0.0 END AS rel
      FROM approx a LEFT JOIN truth t
        ON t.query_id = a.query_id AND t.vec_id = a.vec_id)
SELECT query_id,
       round(sum(rel) / {EVAL_K}, 6)                 AS recall_at_k,
       round(sum(rel / log2(rnk + 1)) / {IDCG_AT_K!r}, 6) AS ndcg_at_k
FROM j GROUP BY query_id
"""


@register("eval_ann_ndcg", _EVAL_SQL)
def eval_ann_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@10 and nDCG@10 of the SQ8 compressed ranking vs the exact
    cosine scan, per query — the eval harness AS a value-oracled query
    (both rankings and both metrics recomputed identically in DuckDB)."""
    from vectordb_from_scratch_spark.operators import knn
    from vectordb_from_scratch_spark.operators.quantization import knn_sq8_topk

    emb = load_table(spark, sf_dir, "embeddings")
    _, queries = knn.fixture_query_set(spark, sf_dir, EVAL_Q)
    truth = knn.topk(emb, queries, k=EVAL_K).select("query_id", "vec_id")
    approx = knn_sq8_topk(spark, sf_dir).select("query_id", "vec_id", "rnk")
    return ranking_metrics(approx, truth)


# --- embedding distribution drift --------------------------------------------
#
# The monitoring query a production vector pipeline runs on every ingest
# batch: has the embedding distribution moved? (A provider model bump,
# a preprocessing change, or upstream corpus shift all show up here
# before recall degrades.) Statistic: per-dimension mean/std of the new
# slice vs the reference slice, plus the standardized mean difference
# |Δmean|/pooled_std — the univariate drift score whose max over
# dimensions is the page-the-oncall number.
#
# Fully SQL-expressible (posexplode + two-level aggregate), so unlike
# most embedding ops it carries a complete value oracle. Scale shape:
# one scan, explode fans dims× then combines map-side to (slice, dim)
# partials — shuffle volume is 2·dims rows per map task, independent of
# corpus size (the same partial/merge argument as the sketches).

DRIFT_SPLIT_LABEL = 5  # slice A: label < 5 (reference), B: label >= 5 (new)


def embedding_drift(emb: DataFrame) -> DataFrame:
    """(dim, mean_a, mean_b, std_a, std_b, smd): per-dimension drift
    between the two label slices; smd = |mean_a-mean_b| / pooled std."""
    sliced = emb.select(
        F.when(F.col("label") < DRIFT_SPLIT_LABEL, "a").otherwise("b").alias("slice"),
        F.posexplode("embedding").alias("dim", "x"),
    )
    stats = sliced.groupBy("slice", "dim").agg(
        F.avg("x").alias("mean"),
        # population variance (var_pop): deterministic single-pass form,
        # matches DuckDB var_pop exactly at 6dp
        (F.avg(F.col("x") * F.col("x")) - F.avg("x") * F.avg("x")).alias("var"),
    )
    a = stats.filter(F.col("slice") == "a").select(
        "dim", F.col("mean").alias("mean_a"), F.col("var").alias("var_a")
    )
    b = stats.filter(F.col("slice") == "b").select(
        "dim", F.col("mean").alias("mean_b"), F.col("var").alias("var_b")
    )
    pooled = F.sqrt((F.col("var_a") + F.col("var_b")) / 2)
    return (
        a.join(b, "dim")
        .select(
            F.col("dim").cast("long").alias("dim"),
            F.round("mean_a", 6).alias("mean_a"),
            F.round("mean_b", 6).alias("mean_b"),
            F.round(F.sqrt("var_a"), 6).alias("std_a"),
            F.round(F.sqrt("var_b"), 6).alias("std_b"),
            F.round(
                F.when(pooled == 0, F.lit(0.0)).otherwise(
                    F.abs(F.col("mean_a") - F.col("mean_b")) / pooled
                ),
                6,
            ).alias("smd"),
        )
    )


_DRIFT_SQL = f"""
WITH x AS (
  SELECT CASE WHEN label < {DRIFT_SPLIT_LABEL} THEN 'a' ELSE 'b' END AS slice,
         generate_subscripts(embedding, 1) - 1 AS dim,
         unnest(embedding::DOUBLE[]) AS x
  FROM embeddings),
stats AS (
  SELECT slice, dim, avg(x) AS mean,
         avg(x * x) - avg(x) * avg(x) AS var
  FROM x GROUP BY 1, 2),
a AS (SELECT dim, mean AS mean_a, var AS var_a FROM stats WHERE slice = 'a'),
b AS (SELECT dim, mean AS mean_b, var AS var_b FROM stats WHERE slice = 'b')
SELECT dim::BIGINT AS dim,
       round(mean_a, 6) AS mean_a,
       round(mean_b, 6) AS mean_b,
       round(sqrt(var_a), 6) AS std_a,
       round(sqrt(var_b), 6) AS std_b,
       round(CASE WHEN sqrt((var_a + var_b) / 2) = 0 THEN 0.0
                  ELSE abs(mean_a - mean_b) / sqrt((var_a + var_b) / 2)
             END, 6) AS smd
FROM a JOIN b USING (dim)
"""


@register("embedding_drift", _DRIFT_SQL)
def embedding_drift_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding drift between two corpus slices (split on
    label) — the vector-pipeline monitoring query, fully value-oracled.
    The standardized mean difference per dimension is the alarm
    statistic; its max over dims is what a threshold alert watches."""
    return embedding_drift(load_table(spark, sf_dir, "embeddings"))


# --- Matryoshka truncation eval ------------------------------------------------
#
# MRL-style dimensionality cuts (Kusupati et al. 2022, "Matryoshka
# Representation Learning"): serve the first MRL_DIM of the stored dims
# and measure what the cut costs — per query, the top-k overlap between
# the truncated-space and full-space exact rankings, plus the fraction
# of the query vector's L2 energy the prefix retains. Cosine is
# scale-invariant, so "truncate + renormalize" ranks identically to
# plain truncated cosine — the renorm is folded away rather than
# computed. This is the measurement that decides how many dims a 100 TB
# index actually needs before building it.

MRL_DIM = 16
MRL_Q = 20
MRL_K = 10

_MRL_SQL = f"""
WITH q AS (SELECT vec_id AS query_id,
                  embedding::DOUBLE[] AS qv,
                  (embedding::DOUBLE[])[1:{MRL_DIM}] AS qt
           FROM embeddings WHERE vec_id < {MRL_Q}),
     c AS (SELECT vec_id, embedding::DOUBLE[] AS cv,
                  (embedding::DOUBLE[])[1:{MRL_DIM}] AS ct
           FROM embeddings),
     s AS (SELECT q.query_id, c.vec_id,
                  CASE WHEN sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)) = 0
                       THEN 0.0
                       ELSE list_dot_product(qv, cv)
                            / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
                  END AS sf,
                  CASE WHEN sqrt(list_dot_product(qt, qt)) * sqrt(list_dot_product(ct, ct)) = 0
                       THEN 0.0
                       ELSE list_dot_product(qt, ct)
                            / (sqrt(list_dot_product(qt, qt)) * sqrt(list_dot_product(ct, ct)))
                  END AS st
           FROM q CROSS JOIN c),
     rf AS (SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id ORDER BY sf DESC, vec_id) AS rk
            FROM s),
     rt AS (SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id ORDER BY st DESC, vec_id) AS rk
            FROM s),
     ov AS (SELECT f.query_id, count(*)::BIGINT AS overlap_at_k
            FROM rf f JOIN rt t ON f.query_id = t.query_id AND f.vec_id = t.vec_id
            WHERE f.rk <= {MRL_K} AND t.rk <= {MRL_K}
            GROUP BY 1)
SELECT q.query_id, ov.overlap_at_k,
       round(sqrt(list_dot_product(qt, qt)) / sqrt(list_dot_product(qv, qv)), 6)
         AS energy_retained
FROM q JOIN ov ON ov.query_id = q.query_id
"""


@register("eval_mrl_overlap", _MRL_SQL)
def eval_mrl_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, overlap_at_k, energy_retained) for MRL_Q query vectors:
    how much of the exact full-dimension top-k survives when scoring on
    the first MRL_DIM dims only. Both rankings are exact brute-force
    scans (this is an EVAL, run on a sampled query set, not the serving
    path — the bounded ANN tiers serve); the plan is one broadcast of
    the tiny query frame, one scored pass over the corpus feeding TWO
    WindowGroupLimit top-k windows, and a per-(query, k) overlap join —
    nothing but the scored pass is corpus-sized, and it shuffles only
    the surviving top-k rows."""
    from pyspark.sql import Window

    from vectordb_from_scratch_spark.functions import linalg

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < MRL_Q).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
        F.slice(F.col("embedding").cast("array<double>"), 1, MRL_DIM).alias("qt"),
    )
    c = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("cv"),
        F.slice(F.col("embedding").cast("array<double>"), 1, MRL_DIM).alias("ct"),
    )
    s = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        linalg.cosine(F.col("qv"), F.col("cv")).alias("sf"),
        linalg.cosine(F.col("qt"), F.col("ct")).alias("st"),
    )
    wf = Window.partitionBy("query_id").orderBy(F.desc("sf"), F.asc("vec_id"))
    wt = Window.partitionBy("query_id").orderBy(F.desc("st"), F.asc("vec_id"))
    topf = (
        s.withColumn("rk", F.row_number().over(wf))
        .filter(F.col("rk") <= MRL_K)
        .select("query_id", "vec_id")
    )
    topt = (
        s.withColumn("rk", F.row_number().over(wt))
        .filter(F.col("rk") <= MRL_K)
        .select("query_id", "vec_id")
    )
    ov = topf.join(topt, ["query_id", "vec_id"]).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("overlap_at_k")
    )
    energy = q.select(
        "query_id",
        F.round(linalg.l2_norm(F.col("qt")) / linalg.l2_norm(F.col("qv")), 6).alias(
            "energy_retained"
        ),
    )
    return ov.join(energy, "query_id")
