"""Embedding generation — the reference's V18 surface
(``app/api/routes/embed.py:10-57``: batched Cohere HTTP calls, <=128 texts
per request, 1024-dim) re-expressed as a pluggable column operator.

An embedding service is NOT engine semantics (SURVEY.md §7 non-goals): the
engine's job is the batching plumbing — ship texts to the service in
bounded batches from inside executors, attach the vector column, validate
dims. ``embed_texts`` is that plumbing via ``mapInPandas``; the provider is
a plain Python callable ``(list[str]) -> np.ndarray`` looked up in
``PROVIDERS``, so a real Cohere/HTTP client drops in without touching the
engine (register it and pass ``provider="cohere"``).

The default provider is ``hashed``: a deterministic hashing-trick
bag-of-words embedder (token -> 60-bit md5 hash -> bucket h % dims, sign
from bit 59, L2-normalized; zero vectors left as-is exactly like
``indexing.py:16-22``). Deterministic AND cross-engine: the DuckDB oracle
reproduces it in SQL, so the embed pipeline is value-checked — something a
network embedder can never be.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.functions import texthash
from vectordb_from_scratch_spark.registry import register
from vectordb_from_scratch_spark.session import load_table

#: reference EMBED_MAX_TEXTS (embed.py:11-13): provider calls are capped.
MAX_TEXTS_PER_CALL = 128

DEFAULT_DIMS = 16


def _hash60_py(token: str) -> int:
    """Python twin of texthash.hash60 (first 15 md5 hex chars = 60 bits)."""
    return int(hashlib.md5(token.encode("utf-8")).hexdigest()[:15], 16)


def hashed_embedder(dims: int = DEFAULT_DIMS, normalize: bool = True):
    """Deterministic hashing-trick embedder: bucket = h % dims, sign = bit
    59 of h, summed over whitespace tokens (duplicates count — bag of
    words), then L2-normalized."""

    # token -> (bucket, sign) memo: the token STREAM is corpus-sized but
    # the token VOCABULARY is Heaps'-law sublinear, so caching collapses
    # one Python md5 per token to one per distinct token (~2x on the
    # embed queries at sf0.1, where 550k stream tokens share 31 words).
    # Bounded so an adversarial unique-token corpus can't grow the
    # worker's memo without limit; values are exact — same md5 inputs.
    memo: dict[str, tuple[int, float]] = {}
    memo_cap = 1 << 20

    def embed(texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), dims), dtype="float64")
        for i, text in enumerate(texts):
            for tok in text.split(" "):
                if not tok:
                    continue
                v = memo.get(tok)
                if v is None:
                    h = _hash60_py(tok)
                    v = (h % dims, 1.0 if (h >> 59) & 1 else -1.0)
                    if len(memo) >= memo_cap:
                        memo.clear()
                    memo[tok] = v
                out[i, v[0]] += v[1]
        if normalize:
            norms = np.linalg.norm(out, axis=1, keepdims=True)
            out = out / np.where(norms == 0, 1.0, norms)  # zero vecs untouched
        return out

    return embed


from vectordb_from_scratch_spark.functions.http_embedder import http_embedder

PROVIDERS: dict[str, Callable[..., Callable[[list[str]], np.ndarray]]] = {
    "hashed": hashed_embedder,
    # network-embedder shape (reference embed.py:10-57): ≤128-text batches,
    # timeout, 4xx→client / 5xx→upstream error mapping with retries.
    # Requires url=...; `hashed` stays the deterministic oracle path.
    "http": http_embedder,
}


def embed_texts(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "embedding",
    dims: int = DEFAULT_DIMS,
    provider: str = "hashed",
    normalize: bool = True,
    max_texts_per_call: int = MAX_TEXTS_PER_CALL,
    **provider_kwargs,
) -> DataFrame:
    """Attach an embedding column: Arrow-batched ``mapInPandas``, each
    provider call bounded to ``max_texts_per_call`` texts (the reference's
    batch contract). All input columns pass through. Extra kwargs go to
    the provider factory (e.g. ``url=...`` for the http provider)."""
    make = PROVIDERS[provider]
    embed = make(dims=dims, normalize=normalize, **provider_kwargs)
    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema = f"{fields}, {out_col} array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            vecs = []
            texts = pdf[text_col].tolist()
            for lo in range(0, len(texts), max_texts_per_call):
                vecs.append(embed(texts[lo : lo + max_texts_per_call]))
            pdf = pdf.copy()
            pdf[out_col] = list(np.concatenate(vecs))
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


_EMBED_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), w -> w != '')) AS t
  FROM documents),
h AS (SELECT doc_id, {texthash.hash60_sql('t')} AS h FROM tok),
b AS (SELECT doc_id, h % {DEFAULT_DIMS} AS bucket,
             CASE WHEN (h >> 59) & 1 = 1 THEN 1.0 ELSE -1.0 END AS sign
      FROM h),
v AS (SELECT doc_id, bucket, sum(sign) AS val FROM b GROUP BY doc_id, bucket)
SELECT doc_id,
       round(sqrt(sum(val * val)), 6)                       AS pre_norm,
       sum(CASE WHEN val <> 0 THEN 1 ELSE 0 END)::BIGINT    AS n_active
FROM v GROUP BY doc_id
"""


@register("embed_documents", _EMBED_SQL)
def embed_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V18 end-to-end: embed documents.text with the deterministic hashed
    provider (UNnormalized so the oracle can check real magnitudes), then
    summarize each vector (pre-normalization L2 norm, active buckets) —
    the whole embed pipeline value-checked against DuckDB."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = embed_texts(docs, dims=DEFAULT_DIMS, normalize=False)
    sq = F.aggregate(
        F.transform("embedding", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )
    active = F.size(F.filter("embedding", lambda x: x != 0))
    return emb.select(
        "doc_id",
        F.round(F.sqrt(sq), 6).alias("pre_norm"),
        active.cast("long").alias("n_active"),
    )


# --- C14 end-to-end text search ---------------------------------------------

TEXT_SEARCH_QUERY = "hash table scan merge"
_TS_K = 10

_TEXT_SEARCH_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), w -> w != '')) AS t
  FROM documents),
h AS (SELECT doc_id, {texthash.hash60_sql('t')} AS h FROM tok),
b AS (SELECT doc_id, h % {DEFAULT_DIMS} AS bucket,
             CASE WHEN (h >> 59) & 1 = 1 THEN 1.0 ELSE -1.0 END AS sign
      FROM h),
v AS (SELECT doc_id, bucket, sum(sign) AS val FROM b GROUP BY doc_id, bucket),
dnorm AS (SELECT doc_id, sqrt(sum(val * val)) AS nd FROM v GROUP BY doc_id),
qtok AS (SELECT unnest(string_split('{TEXT_SEARCH_QUERY}', ' ')) AS t),
qh AS (SELECT {texthash.hash60_sql('t')} AS h FROM qtok),
qb AS (SELECT h % {DEFAULT_DIMS} AS bucket,
              CASE WHEN (h >> 59) & 1 = 1 THEN 1.0 ELSE -1.0 END AS sign
       FROM qh),
qv AS (SELECT bucket, sum(sign) AS val FROM qb GROUP BY bucket),
qnorm AS (SELECT sqrt(sum(val * val)) AS nq FROM qv),
dt AS (SELECT v.doc_id, sum(v.val * qv.val) AS d
       FROM v JOIN qv USING (bucket) GROUP BY v.doc_id),
scored AS (
  SELECT dnorm.doc_id,
         round(CASE WHEN nd * nq = 0 THEN 0.0
                    ELSE coalesce(d, 0.0) / (nd * nq) END, 6) AS score
  FROM dnorm CROSS JOIN qnorm LEFT JOIN dt USING (doc_id))
SELECT doc_id, score, rnk FROM (
  SELECT *, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rnk
  FROM scored)
WHERE rnk <= {_TS_K}
"""


@register("text_search_e2e", _TEXT_SEARCH_SQL)
def text_search_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C14 end-to-end, ORACLE-CHECKED: embed the query text, embed the
    corpus, cosine top-10 — the reference's `POST /search/text` flow
    (operations.py:92-110: Cohere call → C13 vector search), with the
    deterministic hashed provider standing in for the network embedder so
    the WHOLE flow is value-checked against SQL (the reference can never
    test this path deterministically — its fixture snapshots real Cohere
    vectors).

    Exactness: bucket values are small integers carried in doubles, so
    dot products and norms are exact on both engines and the final
    division is bit-identical — the score comparison needs no tolerance.
    Scale shape: corpus embedding is one Arrow-batched mapInPandas pass;
    the single query vector broadcasts; top-10 is TakeOrderedAndProject."""
    from pyspark.sql import Window

    from vectordb_from_scratch_spark.functions import linalg

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = embed_texts(docs, dims=DEFAULT_DIMS, normalize=False)
    # the ONE query vector is embedded driver-side with the same provider
    # function — a single-row Spark job would cost a full job launch for
    # 16 floats (the probe-policy discipline from ivf.search applies)
    q = hashed_embedder(dims=DEFAULT_DIMS, normalize=False)([TEXT_SEARCH_QUERY])[0]
    query_vec = F.array(*[F.lit(float(x)) for x in q])
    scored = emb.select(
        "doc_id",
        F.round(linalg.cosine(query_vec, F.col("embedding")), 6).alias("score"),
    )
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(_TS_K)
    rnk = F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
    return top.withColumn("rnk", rnk).select("doc_id", "score", "rnk")


# --- late-interaction (ColBERT-style maxsim) retrieval -----------------------
#
# Single-vector retrieval compresses a document to one embedding; late
# interaction keeps MANY vectors per document (one per chunk here) and
# scores score(q, d) = sum over query tokens of the MAX similarity any
# document vector achieves — the ColBERT maxsim operator. It is the
# standard quality upgrade over pooled embeddings, and in Spark it is
# pure composition: the declarative chunker → the Arrow embed pass → a
# per-(doc, qtok) max aggregate → one sum — no new kernel.
#
# FULLY value-oracled: chunk windows, hashed-bucket vectors, cosines,
# maxes and the final sum are all integer-exact or 6dp-rounded-before-
# aggregation on both engines (the same exactness argument as
# text_search_e2e, extended through the max/sum).
#
# Scale shape: chunk+embed is one scan-local pass; each query token's
# similarity is a map-side expression; the ONLY shuffle is the final
# groupBy(doc) — shuffle rows = chunks, payload = q tiny doubles; top-10
# is TakeOrderedAndProject.

MAXSIM_QUERY = TEXT_SEARCH_QUERY  # same query text as the e2e search
_MS_K = 10


def _qtoken_vecs() -> list:
    """One UNnormalized hashed vector per query token (driver-side — the
    probe-policy discipline: a 4x16 matrix never needs a Spark job)."""
    embed = hashed_embedder(dims=DEFAULT_DIMS, normalize=False)
    toks = [t for t in MAXSIM_QUERY.split(" ") if t]
    return [embed([t])[0] for t in toks]


def _maxsim_sql() -> str:
    toks = [t for t in MAXSIM_QUERY.split(" ") if t]
    qtok_rows = ", ".join(f"({qid}, '{t}')" for qid, t in enumerate(toks))
    from vectordb_from_scratch_spark.operators.textstats import (
        _CHUNK_SIZE,
        _CHUNK_STRIDE,
    )

    return f"""
WITH w AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS words
  FROM documents),
s AS (
  SELECT doc_id, words,
         unnest(generate_series(0, len(words) - 1, {_CHUNK_STRIDE})) AS start
  FROM w WHERE len(words) > 0),
chunks AS (
  SELECT doc_id, CAST(start / {_CHUNK_STRIDE} AS BIGINT) AS chunk_seq,
         words[start + 1 : start + {_CHUNK_SIZE}] AS cw
  FROM s),
ctok AS (
  SELECT doc_id, chunk_seq, unnest(cw) AS t FROM chunks),
ch AS (SELECT doc_id, chunk_seq, {texthash.hash60_sql('t')} AS h FROM ctok),
cv AS (SELECT doc_id, chunk_seq, h % {DEFAULT_DIMS} AS bucket,
              sum(CASE WHEN (h >> 59) & 1 = 1 THEN 1.0 ELSE -1.0 END) AS val
       FROM ch GROUP BY 1, 2, 3),
cnorm AS (SELECT doc_id, chunk_seq, sqrt(sum(val * val)) AS nd
          FROM cv GROUP BY 1, 2),
qt AS (SELECT * FROM (VALUES {qtok_rows}) AS q(qid, t)),
qh AS (SELECT qid, {texthash.hash60_sql('t')} AS h FROM qt),
qv AS (SELECT qid, h % {DEFAULT_DIMS} AS bucket,
              CASE WHEN (h >> 59) & 1 = 1 THEN 1.0 ELSE -1.0 END AS val
       FROM qh),
dt AS (SELECT cv.doc_id, cv.chunk_seq, qv.qid, sum(cv.val * qv.val) AS d
       FROM cv JOIN qv USING (bucket) GROUP BY 1, 2, 3),
per_chunk AS (
  SELECT cn.doc_id, cn.qid,
         round(CASE WHEN cn.nd = 0 THEN 0.0
                    ELSE coalesce(dt.d, 0.0) / cn.nd END, 6) AS sim
  FROM (SELECT cnorm.*, q.qid FROM cnorm CROSS JOIN (SELECT DISTINCT qid FROM qt) q) cn
  LEFT JOIN dt ON dt.doc_id = cn.doc_id AND dt.chunk_seq = cn.chunk_seq
              AND dt.qid = cn.qid),
per_qtok AS (
  SELECT doc_id, qid, max(sim) AS best FROM per_chunk GROUP BY 1, 2),
scored AS (
  SELECT doc_id, round(sum(best), 6) AS maxsim FROM per_qtok GROUP BY 1)
SELECT doc_id, maxsim, rnk FROM (
  SELECT *, row_number() OVER (ORDER BY maxsim DESC, doc_id ASC) AS rnk
  FROM scored)
WHERE rnk <= {_MS_K}
"""


@register("text_maxsim_search", None)
def text_maxsim_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction retrieval end-to-end: sliding-window chunks →
    hashed chunk vectors → per-query-token max similarity → summed
    maxsim → top-10 docs. Query-token norms are 1 (single-token hashed
    vectors), so sim = dot/chunk_norm — exact on both engines; each sim
    rounds to 6dp BEFORE the max/sum so aggregation order can't drift
    the oracle comparison."""
    from pyspark.sql import Window

    from vectordb_from_scratch_spark.functions import linalg
    from vectordb_from_scratch_spark.operators.textstats import chunk_documents

    chunks = chunk_documents(spark, sf_dir).select("doc_id", "chunk_text")
    emb = embed_texts(chunks, text_col="chunk_text", normalize=False)
    qvecs = _qtoken_vecs()
    sims = []
    for qid, qv in enumerate(qvecs):
        qcol = F.array(*[F.lit(float(x)) for x in qv])
        sims.append(
            F.round(linalg.cosine(qcol, F.col("embedding")), 6).alias(f"s{qid}")
        )
    per_chunk = emb.select("doc_id", *sims)
    maxes = [F.max(f"s{qid}").alias(f"m{qid}") for qid in range(len(qvecs))]
    per_doc = per_chunk.groupBy("doc_id").agg(*maxes)
    total = F.round(
        sum(F.col(f"m{qid}") for qid in range(len(qvecs))), 6
    ).alias("maxsim")
    scored = per_doc.select("doc_id", total)
    top = scored.orderBy(F.desc("maxsim"), F.asc("doc_id")).limit(_MS_K)
    rnk = F.row_number().over(Window.orderBy(F.desc("maxsim"), F.asc("doc_id")))
    return top.withColumn("rnk", rnk).select("doc_id", "maxsim", "rnk")


from vectordb_from_scratch_spark import registry as _registry  # noqa: E402

_registry.ORACLE_SQL["text_maxsim_search"] = _maxsim_sql()


# --- hybrid retrieval (BM25 + vector, reciprocal-rank fusion) ----------------
#
# The production default for text search: lexical BM25 catches exact
# terms, the embedding catches paraphrase, and reciprocal-rank fusion
# (Cormack et al. 2009) merges them WITHOUT score calibration — each
# list contributes 1/(60 + rank), so only ranks matter and the two
# scoring scales never meet. Both input rankings are already
# value-oracled queries here, and RRF arithmetic is exact rationals in
# doubles, so the FUSED ranking carries a full oracle too — a hybrid
# search whose every stage is cross-engine value-checked.
#
# Scale shape: the BM25 side touches only docs containing a query term;
# the vector side is the embed scan + TakeOrderedAndProject; the fusion
# is a full-outer join of two ≤RRF_POOL-row lists — driver-trivial,
# expressed distributed.

RRF_K = 60
RRF_POOL = 20  # depth of each input ranking fed to the fusion
_RRF_TOP = 10


def _rrf_sql() -> str:
    from vectordb_from_scratch_spark.operators.textstats import (
        _BM25_B,
        _BM25_K1,
    )

    terms = tuple(t for t in MAXSIM_QUERY.split(" ") if t)
    return f"""
WITH dl AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), w -> w != ''))::DOUBLE AS dl
  FROM documents),
stats AS (SELECT avg(dl) AS avgdl, count(*)::DOUBLE AS n FROM dl),
tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), w -> w != '')) AS term
  FROM documents),
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf
  FROM tok WHERE term IN {repr(terms)}
  GROUP BY doc_id, term),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
bm AS (
  SELECT tf.doc_id,
         round(sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                   * tf * ({_BM25_K1} + 1)
                   / (tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl / avgdl))),
               6) AS bm25
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id),
lex AS (SELECT doc_id, rnk AS rnk_lex FROM (
          SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rnk
          FROM bm) WHERE rnk <= {RRF_POOL}),
hb AS (SELECT doc_id, h % {DEFAULT_DIMS} AS bucket,
              CASE WHEN (h >> 59) & 1 = 1 THEN 1.0 ELSE -1.0 END AS sign
       FROM (SELECT doc_id, {texthash.hash60_sql('term')} AS h FROM tok)),
v AS (SELECT doc_id, bucket, sum(sign) AS val FROM hb GROUP BY 1, 2),
dnorm AS (SELECT doc_id, sqrt(sum(val * val)) AS nd FROM v GROUP BY doc_id),
qtok AS (SELECT unnest(string_split('{MAXSIM_QUERY}', ' ')) AS t),
qb AS (SELECT {texthash.hash60_sql('t')} % {DEFAULT_DIMS} AS bucket,
              CASE WHEN ({texthash.hash60_sql('t')} >> 59) & 1 = 1 THEN 1.0 ELSE -1.0 END AS sign
       FROM qtok),
qv AS (SELECT bucket, sum(sign) AS val FROM qb GROUP BY bucket),
qnorm AS (SELECT sqrt(sum(val * val)) AS nq FROM qv),
dt AS (SELECT v.doc_id, sum(v.val * qv.val) AS d
       FROM v JOIN qv USING (bucket) GROUP BY v.doc_id),
cos AS (
  SELECT dnorm.doc_id,
         round(CASE WHEN nd * nq = 0 THEN 0.0
                    ELSE coalesce(d, 0.0) / (nd * nq) END, 6) AS score
  FROM dnorm CROSS JOIN qnorm LEFT JOIN dt USING (doc_id)),
vec AS (SELECT doc_id, rnk AS rnk_vec FROM (
          SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rnk
          FROM cos) WHERE rnk <= {RRF_POOL}),
fused AS (
  SELECT coalesce(lex.doc_id, vec.doc_id) AS doc_id,
         round(coalesce(1.0 / ({RRF_K} + rnk_lex), 0.0)
               + coalesce(1.0 / ({RRF_K} + rnk_vec), 0.0), 6) AS rrf
  FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id)
SELECT doc_id, rrf, rnk FROM (
  SELECT *, row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS rnk
  FROM fused)
WHERE rnk <= {_RRF_TOP}
"""


@register("search_hybrid_rrf", None)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: BM25 top-20 ⊕ embedding-cosine top-20 fused by
    reciprocal rank — every stage (both rankings, the fusion) carries a
    DuckDB value oracle. Docs in only one list score with the other
    contribution absent (coalesce 0), the standard RRF convention."""
    from pyspark.sql import Window

    from vectordb_from_scratch_spark.functions import linalg
    from vectordb_from_scratch_spark.operators.textstats import bm25_ranking

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    terms = tuple(t for t in MAXSIM_QUERY.split(" ") if t)
    lex = bm25_ranking(docs, terms, RRF_POOL).select(
        "doc_id", F.col("rnk").alias("rnk_lex")
    )
    emb = embed_texts(docs, dims=DEFAULT_DIMS, normalize=False)
    q = hashed_embedder(dims=DEFAULT_DIMS, normalize=False)([MAXSIM_QUERY])[0]
    qcol = F.array(*[F.lit(float(x)) for x in q])
    scored = emb.select(
        "doc_id", F.round(linalg.cosine(qcol, F.col("embedding")), 6).alias("score")
    )
    vtop = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(RRF_POOL)
    vrnk = F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
    vec = vtop.withColumn("rnk_vec", vrnk).select("doc_id", "rnk_vec")
    fused = lex.join(vec, "doc_id", "full_outer").select(
        "doc_id",
        F.round(
            F.coalesce(1.0 / (RRF_K + F.col("rnk_lex")), F.lit(0.0))
            + F.coalesce(1.0 / (RRF_K + F.col("rnk_vec")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    top = fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(_RRF_TOP)
    rnk = F.row_number().over(Window.orderBy(F.desc("rrf"), F.asc("doc_id")))
    return top.withColumn("rnk", rnk).select("doc_id", "rrf", "rnk")


_registry.ORACLE_SQL["search_hybrid_rrf"] = _rrf_sql()
