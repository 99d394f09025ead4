"""Query registry: every implemented operator exposed as a
(spark, sf_dir) -> DataFrame callable, plus its DuckDB oracle SQL.

This is the single source of truth consumed by ``__spark_entry__`` and by
``tests/test_oracle_parity.py`` (which replicates the driver's check
locally). Grouped by SURVEY.md §2 inventory sections; each builder's
docstring cites the reference behavior it reproduces.
"""

from __future__ import annotations

import functools
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.session import load_table
from vectordb_from_scratch_spark.operators import knn

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}

#: name -> (spark, sf_dir) warmer for the ``*_prebuilt`` serve twins:
#: builds the process-level index caches OUTSIDE any timed region so the
#: serve-path bench numbers measure probe+rerank only, regardless of
#: invocation order (ADVICE r3: the twins were literal aliases relying on
#: bench ordering for cache warmth).
WARMERS: dict[str, Callable[[SparkSession, str], None]] = {}

#: When True (bench.py sets it after running a query's warmer), a
#: ``*_prebuilt`` entry point RAISES if its build cache is cold instead of
#: silently building — the cold/serve split then measures what it claims.
#: Default False: standalone/driver invocations build on demand, which is
#: correct for correctness checking, just not a serve-cost measurement.
STRICT_SERVE = False


def require_warm(cache: dict, key, what: str) -> None:
    """Serve-path guard: in STRICT_SERVE mode a cold cache is a
    measurement bug, not a build request — fail loudly."""
    if STRICT_SERVE and key not in cache:
        raise RuntimeError(
            f"{what} serve path invoked with a cold build cache under "
            f"STRICT_SERVE — run the registered warmer first"
        )

#: Per-query persisted intermediates (e.g. MinHash band tables that feed both
#: sides of a self-join). A registry caller runs many queries in ONE session;
#: without release, each query's cached partitions pile up in executor
#: storage for the whole run. We can't unpersist inside the builder (the
#: caller hasn't run the action yet), so each query run releases the
#: PREVIOUS query's tracked intermediates — storage is bounded to one
#: query's working set. Deliberately excludes the process-level ANN index
#: caches (operators/ivf.py, operators/lsh.py), which are cross-query by
#: design.
_TRACKED_PERSISTS: list[DataFrame] = []


def track_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` + register for release before the next query runs."""
    return track(df.persist())


def track(df: DataFrame) -> DataFrame:
    """Register an already-persisted DataFrame for deferred release."""
    _TRACKED_PERSISTS.append(df)
    return df


def release_tracked() -> None:
    while _TRACKED_PERSISTS:
        try:
            _TRACKED_PERSISTS.pop().unpersist()
        except Exception:
            pass  # session already stopped


def register(name: str, sql: str | None = None):
    def deco(fn):
        # a duplicate name would SILENTLY shadow the earlier operator in
        # the driver contract (found the hard way in r5: a second
        # text_repetition_scores replaced the original and the query
        # count quietly stopped adding up) — fail at import time instead
        if name in QUERIES:
            raise ValueError(f"query {name!r} is already registered")

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            release_tracked()
            return fn(spark, sf_dir)

        QUERIES[name] = wrapped
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


# ---------------------------------------------------------------------------
# V1/V4/V5/V14 — flat exact k-NN (reference flat.py:42-70), batch form.
# ---------------------------------------------------------------------------

_KNN_Q = 10  # query set: vec_id < 10
_KNN_K = 10

_COS_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < {Q}),
     c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings{where}),
     s AS (SELECT q.query_id, c.vec_id,
                  CASE WHEN sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)) = 0
                       THEN 0.0
                       ELSE list_dot_product(qv, cv)
                            / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
                  END AS score
           FROM q CROSS JOIN c),
     r AS (SELECT query_id, vec_id, score,
                  row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rnk
           FROM s)
SELECT query_id, vec_id, round(score, 6) AS score, rnk
FROM r WHERE rnk <= {K}
"""


def _emb_queries(emb: DataFrame, n: int = _KNN_Q) -> DataFrame:
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def _finish_rank(res: DataFrame) -> DataFrame:
    return res.select(
        "query_id",
        "vec_id",
        F.round("score", 6).alias("score"),
        F.col("rank").cast("long").alias("rnk"),
    )


@register("knn_cosine_topk", _COS_SQL.format(Q=_KNN_Q, K=_KNN_K, where=""))
def knn_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: batch exact cosine k-NN (V1+V4+V5+V14, flat.py:42-70)."""
    emb = load_table(spark, sf_dir, "embeddings")
    res = knn.topk(emb, _emb_queries(emb), k=_KNN_K, metric="cosine")
    return _finish_rank(res)


@register("knn_cosine_topk_blas", _COS_SQL.format(Q=_KNN_Q, K=_KNN_K, where=""))
def knn_cosine_topk_blas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same semantics as knn_cosine_topk via the scale path: per-partition
    NumPy block matmul + local top-k inside mapInPandas, global top-k over
    O(partitions*Q*k) candidate rows. Identical oracle — the two plans must
    agree to 6dp, which pins the kernel against the built-in expression."""
    emb = load_table(spark, sf_dir, "embeddings")
    qpdf = _emb_queries(emb).toPandas()
    res = knn.topk_pandas(emb, qpdf, k=_KNN_K)
    return _finish_rank(res)


_KNN_Q_BIG = 100


@register("knn_cosine_batch100", _COS_SQL.format(Q=_KNN_Q_BIG, K=_KNN_K, where=""))
def knn_cosine_batch100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Throughput shape of the north star ('bulk batch similarity
    search'): 100 queries in one pass — routed through the kernel
    dispatcher (``knn.topk_auto``), which picks the BLAS path at this
    batch size. Scoring work grows 10x vs the Q=10 query but the plan
    and the merge stay O(partitions*Q*k)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qpdf = _emb_queries(emb, n=_KNN_Q_BIG).toPandas()
    res = knn.topk_auto(emb, qpdf, k=_KNN_K)
    return _finish_rank(res)


@register("knn_cosine_blockjoin", _COS_SQL.format(Q=_KNN_Q_BIG, K=_KNN_K, where=""))
def knn_cosine_blockjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The >10⁵-query exit for flat k-NN (SCALE.md flat-kNN "Q scaling"):
    both sides blocked, one matmul per cogrouped block pair, no query
    collect/broadcast/closure anywhere — queries stay a Spark DataFrame
    end to end. Identical oracle to knn_cosine_batch100, which pins the
    block kernel + merge against the broadcast paths. The fixture's 100
    queries run with shrunken block targets so the multi-block merge is
    actually exercised (defaults would put them in one block); corpus
    cardinality comes from parquet footer stats, not a count job."""
    from vectordb_from_scratch_spark.operators.dedup import embedding_corpus_stats

    emb = load_table(spark, sf_dir, "embeddings")
    n, _ = embedding_corpus_stats(sf_dir)
    res = knn.topk_blockjoin(
        emb,
        _emb_queries(emb, n=_KNN_Q_BIG),
        k=_KNN_K,
        n_corpus_hint=n,
        n_queries_hint=_KNN_Q_BIG,
        rows_per_block=2048,
        queries_per_block=32,
    )
    return _finish_rank(res)


@register(
    "knn_cosine_filtered",
    _COS_SQL.format(Q=_KNN_Q, K=_KNN_K, where=" WHERE label < 5"),
)
def knn_cosine_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN with a metadata pre-filter — the reference DECLARES
    metadata_filters but never implements them (flat.py:46 TODO); here it is
    a corpus filter pushed into the parquet scan."""
    emb = load_table(spark, sf_dir, "embeddings")
    res = knn.topk(
        emb, _emb_queries(emb), k=_KNN_K, metric="cosine", filter_expr=F.col("label") < 5
    )
    return _finish_rank(res)


_L2_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < {Q}),
     c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
     s AS (SELECT q.query_id, c.vec_id, list_distance(qv, cv) AS score
           FROM q CROSS JOIN c),
     r AS (SELECT query_id, vec_id, score,
                  row_number() OVER (PARTITION BY query_id ORDER BY score ASC, vec_id ASC) AS rnk
           FROM s)
SELECT query_id, vec_id, round(score, 6) AS score, rnk
FROM r WHERE rnk <= {K}
"""


@register("knn_l2_topk", _L2_SQL.format(Q=_KNN_Q, K=_KNN_K))
def knn_l2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 k-NN: raw distance scores, ascending order (V2; flat supports
    non-cosine metrics, similarity_metrics.py:35-43 + flat.py:60-70)."""
    emb = load_table(spark, sf_dir, "embeddings")
    res = knn.topk(emb, _emb_queries(emb), k=_KNN_K, metric="l2")
    return _finish_rank(res)


_MAN_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < {Q}),
     c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
     s AS (SELECT q.query_id, c.vec_id,
                  list_sum(list_transform(range(1, len(qv) + 1),
                                          i -> abs(qv[i] - cv[i]))) AS score
           FROM q CROSS JOIN c),
     r AS (SELECT query_id, vec_id, score,
                  row_number() OVER (PARTITION BY query_id ORDER BY score ASC, vec_id ASC) AS rnk
           FROM s)
SELECT query_id, vec_id, round(score, 6) AS score, rnk
FROM r WHERE rnk <= {K}
"""


@register("knn_manhattan_topk", _MAN_SQL.format(Q=_KNN_Q, K=_KNN_K))
def knn_manhattan_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manhattan k-NN (V3, similarity_metrics.py:46-54)."""
    emb = load_table(spark, sf_dir, "embeddings")
    res = knn.topk(emb, _emb_queries(emb), k=_KNN_K, metric="manhattan")
    return _finish_rank(res)


@register(
    "vec_normalize_norms",
    """
SELECT vec_id,
       round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS l2_norm,
       (CASE WHEN list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) = 0 THEN 0.0
             ELSE 1.0 END)::DOUBLE AS post_norm
FROM embeddings
""",
)
def vec_normalize_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V4 unit-normalize (indexing.py:16-22): emit each vector's L2 norm and
    the norm AFTER normalization (1.0, or 0.0 for zero vectors — which the
    reference leaves unchanged)."""
    from vectordb_from_scratch_spark.functions import linalg

    emb = load_table(spark, sf_dir, "embeddings")
    normed = emb.select(
        "vec_id",
        F.round(linalg.l2_norm("embedding"), 6).alias("l2_norm"),
        F.round(linalg.l2_norm(linalg.normalize("embedding")), 0).alias("post_norm"),
    )
    return normed


# ---------------------------------------------------------------------------
# Operator modules self-register their queries on import (each calls
# ``register`` at module level). Imported at the bottom so the decorator and
# dicts above already exist.
# ---------------------------------------------------------------------------
from vectordb_from_scratch_spark.operators import tpch  # noqa: E402,F401
from vectordb_from_scratch_spark.operators import catalog_ops  # noqa: E402,F401
from vectordb_from_scratch_spark.operators import events  # noqa: E402,F401
from vectordb_from_scratch_spark.operators import dedup  # noqa: E402,F401
from vectordb_from_scratch_spark.operators import textstats  # noqa: E402,F401
from vectordb_from_scratch_spark.operators import ivf  # noqa: E402,F401
from vectordb_from_scratch_spark.operators import lsh  # noqa: E402,F401
from vectordb_from_scratch_spark.operators import multimodal  # noqa: E402,F401
from vectordb_from_scratch_spark.operators import temporal  # noqa: E402,F401
from vectordb_from_scratch_spark.functions import embedder  # noqa: E402,F401
from vectordb_from_scratch_spark.operators import skew  # noqa: E402,F401
from vectordb_from_scratch_spark.operators import pipeline  # noqa: E402,F401
from vectordb_from_scratch_spark.operators import sketches  # noqa: E402,F401
from vectordb_from_scratch_spark.operators import sampling  # noqa: E402,F401
from vectordb_from_scratch_spark.operators import bucketed  # noqa: E402,F401
from vectordb_from_scratch_spark.operators import quantization  # noqa: E402,F401
from vectordb_from_scratch_spark.operators import pq  # noqa: E402,F401
from vectordb_from_scratch_spark.operators import layout  # noqa: E402,F401
from vectordb_from_scratch_spark.operators import search_ext  # noqa: E402,F401
from vectordb_from_scratch_spark.operators import sqlapi  # noqa: E402,F401
from vectordb_from_scratch_spark.operators import export_shards  # noqa: E402,F401
from vectordb_from_scratch_spark.operators import dq  # noqa: E402,F401
from vectordb_from_scratch_spark.operators import hnsw  # noqa: E402,F401
from vectordb_from_scratch_spark.operators import evalmetrics  # noqa: E402,F401
from vectordb_from_scratch_spark.operators import classifier  # noqa: E402,F401
from vectordb_from_scratch_spark.operators import bpe  # noqa: E402,F401
from vectordb_from_scratch_spark.operators import pca  # noqa: E402,F401
from vectordb_from_scratch_spark.operators import graph  # noqa: E402,F401
