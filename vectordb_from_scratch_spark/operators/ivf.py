"""IVF (inverted-file) approximate k-NN — reference V7-V10
(``app/core/indexes/ivf.py``), Spark-first.

Reference semantics: cosine k-means over all stored vectors
(``ivf.py:153-194``, seeded rng, centroids renormalized each iteration),
inverted lists cluster_id → member ids (``ivf.py:38-44``), search scores the
query against centroids, probes the top ``n_probes`` lists, then exact-reranks
the union of their members with one matmul (``ivf.py:91-123``).

Spark design:
- **train**: ``pyspark.ml.clustering.KMeans`` (distributed Lloyd's) on
  unit-normalized vectors. On the unit sphere Euclidean argmin == cosine
  argmax (‖a−b‖² = 2−2a·b), so normalize-then-KMeans preserves the
  reference's assignment semantics; centers are renormalized after fit just
  as the reference renormalizes per iteration (``ivf.py:181-182``).
  Bit-for-bit NumPy-RNG parity is a non-goal (SURVEY.md §2.4.5) — recall vs
  the exact flat scan is the correctness criterion.
- **assign**: broadcast the (tiny) centroid table, max_by over cluster
  scores — one pass over the corpus, no shuffle of embeddings.
- **search**: score query×centroid on the DRIVER (64×64 floats — the same
  place the reference does it), build a (query_id, cluster_id) probe table,
  semi-join the assignments, exact-rerank only the probed members. With the
  index written ``partitionBy(cluster_id)``, the probe filter becomes
  partition pruning: at 100 TB a 1/64-probe search reads 1/64th of the
  files.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.functions import linalg
from vectordb_from_scratch_spark.registry import register
from vectordb_from_scratch_spark.session import load_table

DEFAULT_N_CLUSTERS = 64  # reference ivf.py:22
DEFAULT_N_PROBES = 8  # reference default is 1 (ivf.py:23); 8 hits recall>=0.9
DEFAULT_TRAIN_ITERS = 20  # reference ivf.py:23
SEED = 42  # reference ivf.py:29


def train_centroids(
    corpus: DataFrame,
    n_clusters: int = DEFAULT_N_CLUSTERS,
    max_iter: int = DEFAULT_TRAIN_ITERS,
    seed: int = SEED,
    vec_col: str = "embedding",
) -> DataFrame:
    """V7: distributed k-means on normalized vectors → centroids DataFrame
    (cluster_id INT, centroid ARRAY<DOUBLE>, unit-norm). Each Lloyd's
    iteration is a broadcast-join + partial groupBy-avg across executors —
    the distributed twin of the reference's single matmul loop."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = corpus.sparkSession
    feats = corpus.select(
        array_to_vector(linalg.normalize(vec_col).cast("array<double>")).alias("features")
    )
    n = feats.count()
    k = min(n_clusters, n)  # reference caps k = min(k, n), ivf.py:160
    model = KMeans(k=k, maxIter=max_iter, seed=seed, featuresCol="features").fit(feats)
    centers = []
    for cid, c in enumerate(model.clusterCenters()):
        arr = np.asarray(c, dtype="float64")
        norm = float(np.linalg.norm(arr))
        if norm > 0:
            arr = arr / norm  # renormalize like ivf.py:181-182
        centers.append((cid, [float(x) for x in arr]))
    return spark.createDataFrame(centers, "cluster_id INT, centroid ARRAY<DOUBLE>")


def assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """V8: nearest-centroid assignment — argmax over dot(normalized vec,
    centroid), ties to the lowest cluster_id. Broadcast join; the corpus is
    scanned once and never shuffled."""
    normed = corpus.select(id_col, linalg.normalize(vec_col).alias("_nv"))
    scored = normed.join(F.broadcast(centroids)).select(
        id_col,
        "cluster_id",
        linalg.dot(F.col("_nv"), F.col("centroid")).alias("score"),
    )
    return scored.groupBy(id_col).agg(
        F.max_by(
            "cluster_id", F.struct(F.col("score"), -F.col("cluster_id"))
        ).alias("cluster_id")
    )


def probe_clusters(
    centroids: DataFrame, queries_rows: list, n_probes: int
) -> list[tuple]:
    """V9 step 1 (policy, driver-side exactly like the reference's
    centroid scoring, ivf.py:99-107): per query, the top-n_probes cluster
    ids by cosine. Centroids are tiny (k×d); this never touches executors."""
    cents = centroids.orderBy("cluster_id").collect()
    C = np.array([r["centroid"] for r in cents], dtype="float64")  # unit-norm
    cids = np.array([r["cluster_id"] for r in cents])
    out = []
    for qid, qvec in queries_rows:
        q = np.asarray(qvec, dtype="float64")
        qn = np.linalg.norm(q)
        if qn > 0:
            q = q / qn
        scores = C @ q
        p = min(n_probes, len(cids))
        top = np.argpartition(-scores, p - 1)[:p]
        # rank them like ivf.py:106-107 (sorted by score desc)
        top = top[np.argsort(-scores[top], kind="stable")]
        for cid in cids[top]:
            out.append((int(qid), int(cid)))
    return out


def search(
    corpus: DataFrame,
    centroids: DataFrame,
    assignments: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probes: int = DEFAULT_N_PROBES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """V9: probe + exact rerank. Returns (query_id, vec_id, score, rank)
    with cosine scores, deterministic tie-break (score DESC, id ASC)."""
    spark = corpus.sparkSession
    qrows = [(r["query_id"], r["query_vec"]) for r in queries.collect()]
    probes = spark.createDataFrame(
        probe_clusters(centroids, qrows, n_probes), "query_id LONG, cluster_id INT"
    )
    # candidates: members of probed clusters, per query (small join, then
    # the only corpus touch is fetching candidate vectors by id)
    cand = assignments.join(F.broadcast(probes), "cluster_id").select("query_id", id_col)
    qdf = queries.withColumnRenamed("query_vec", "_qv")
    rerank = (
        cand.join(corpus.select(id_col, vec_col), id_col)
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            id_col,
            linalg.cosine(F.col(vec_col), F.col("_qv")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        rerank.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )


def build_and_search(
    spark: SparkSession,
    sf_dir: str,
    k: int = 10,
    n_probes: int = DEFAULT_N_PROBES,
    n_queries: int = 10,
    n_clusters: int = DEFAULT_N_CLUSTERS,
) -> DataFrame:
    """End-to-end IVF pipeline on the embeddings fixture: train → assign →
    probe → rerank. The queries are the first ``n_queries`` vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    centroids = train_centroids(emb, n_clusters=n_clusters)
    assignments = assign(emb, centroids)
    return search(emb, centroids, assignments, queries, k=k, n_probes=n_probes)


@register("ivf_search")  # no oracle: k-means is not SQL-expressible → rows-only check
def ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = build_and_search(spark, sf_dir)
    return res.select(
        "query_id",
        "vec_id",
        F.round("score", 6).alias("score"),
        F.col("rank").cast("long").alias("rnk"),
    )


@register("ivf_cluster_sizes")  # rows-only: depends on k-means
def ivf_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-list length distribution (the reference's inverted_lists,
    ivf.py:34) — the skew diagnostic that decides probe cost at scale."""
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = train_centroids(emb)
    assignments = assign(emb, centroids)
    return assignments.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n_members"))
