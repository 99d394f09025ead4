"""Search-API extensions beyond the reference's top-k endpoint —
radius (threshold) search and MMR-diversified reranking.

The reference's API surface is top-k only (``app/api/dto.py:58-65``);
these are the other two query shapes every production vector store
serves. Radius search is fully oracle-checked; MMR is rows-only
(greedy argmax is not SQL-shaped) with a determinism test.
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
            mmr = lam * rel - (1 - lam) * red
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


@register("knn_mmr_diversified")  # rows-only: greedy argmax not SQL-shaped
def knn_mmr_diversified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversified top-10: exact cosine shortlist (top-50) per query, then
    the MMR greedy pass per group — the serving pattern that stops near-
    duplicate results crowding out coverage."""
    from vectordb_from_scratch_spark.operators import knn

    emb = load_table(spark, sf_dir, "embeddings")
    qpdf, queries_df = knn.fixture_query_set(spark, sf_dir, 10)
    short = knn.topk(emb, queries_df, k=50).select("query_id", "vec_id")
    cand = short.join(emb.select("vec_id", "embedding"), "vec_id")
    return mmr_rerank(cand, qpdf, k=10)
