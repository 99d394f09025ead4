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

    def embed(texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), dims), dtype="float64")
        for i, text in enumerate(texts):
            for tok in text.split(" "):
                if not tok:
                    continue
                h = _hash60_py(tok)
                out[i, h % dims] += 1.0 if (h >> 59) & 1 else -1.0
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
