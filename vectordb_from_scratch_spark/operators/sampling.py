"""Corpus sampling for training-data curation: stratified sampling and
deterministic train/validation splits.

A 100 TB corpus is never trained on verbatim: pipelines draw
per-language / per-source quotas (rebalancing) and need splits that are
REPRODUCIBLE and disjoint regardless of partitioning. Two primitives:

- ``stratified_sample``: `sampleBy` (per-stratum Bernoulli, seeded) — one
  scan, no shuffle; each row flips its own coin, so fractions are
  approximate (binomial noise) but unbiased at any scale.
- ``hash_split``: deterministic assignment by content hash — the split a
  row lands in depends only on its id, never on partitioning, sampling
  order, or cluster size. This is the one to use when reproducibility
  across engines matters; it is exact enough to ORACLE (DuckDB computes
  the same md5 buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.functions import texthash
from vectordb_from_scratch_spark.registry import register
from vectordb_from_scratch_spark.session import load_table

SPLIT_BUCKETS = 100


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sample (Spark ``sampleBy``): single pass,
    seeded, no shuffle. Fractions are approximate — assert proportions,
    not counts."""
    return df.sampleBy(strata_col, fractions, seed=seed)


def hash_split(
    df: DataFrame, id_col: str, val_pct: int = 10, buckets: int = SPLIT_BUCKETS
) -> DataFrame:
    """Deterministic split: bucket = md5(id) mod ``buckets``; rows with
    bucket < ``val_pct`` are validation. Independent of partitioning and
    engine — the property that makes held-out sets trustworthy."""
    bucket = texthash.hash60(F.col(id_col).cast("string")) % buckets
    return df.withColumn(
        "split", F.when(bucket < val_pct, "val").otherwise("train")
    )


_SPLIT_SQL = f"""
WITH s AS (SELECT doc_id, lang,
                  CASE WHEN ({texthash.hash60_sql("CAST(doc_id AS VARCHAR)")} % {SPLIT_BUCKETS}) < 10
                       THEN 'val' ELSE 'train' END AS split
           FROM documents)
SELECT split, lang, count(*) AS n_docs
FROM s GROUP BY split, lang
"""


@register("sampling_hash_split", _SPLIT_SQL)
def sampling_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/10 train/val split by content hash, summarized per
    split × lang — byte-identical in DuckDB because the bucket function is
    the cross-engine md5."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        hash_split(docs, "doc_id")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# --- exact stratified quotas ------------------------------------------------

STRATA_QUOTA = 50


def stratified_quota(
    df: DataFrame, strata_col: str, id_col: str, quota: int
) -> DataFrame:
    """EXACT per-stratum quota: rank rows inside each stratum by content
    hash (deterministic, partition-independent) and keep the first
    ``quota``. Complements ``stratified_sample``: Bernoulli gives binomial
    noise around the target; this gives exactly min(quota, |stratum|) rows.

    Scale: the rank-≤-quota filter compiles to WindowGroupLimit, so each
    map task keeps only its local top-``quota`` per stratum BEFORE the
    exchange — the shuffle carries O(partitions · quota) rows per stratum,
    not the stratum. Skewed strata therefore don't skew the shuffle."""
    order = texthash.hash60(F.col(id_col).cast("string"))
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(order.asc(), F.col(id_col).asc())
    return (
        df.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= quota)
    )


_STRATIFIED_SQL = f"""
WITH ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY {texthash.hash60_sql("CAST(doc_id AS VARCHAR)")} ASC, doc_id ASC
         ) AS rk
  FROM documents)
SELECT lang, doc_id, rk FROM ranked WHERE rk <= {STRATA_QUOTA}
"""


@register("sampling_stratified_exact", _STRATIFIED_SQL)
def sampling_stratified_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly STRATA_QUOTA docs per language, chosen by deterministic
    hash order — the reproducible per-stratum rebalancing draw (language
    quotas are the standard LLM-corpus rebalancing lever). Byte-identical
    in DuckDB: the rank order is the cross-engine md5 hash."""
    docs = load_table(spark, sf_dir, "documents")
    return stratified_quota(docs, "lang", "doc_id", STRATA_QUOTA).select(
        "lang", "doc_id", "rk"
    )
