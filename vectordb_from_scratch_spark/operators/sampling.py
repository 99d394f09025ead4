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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.functions import texthash
from vectordb_from_scratch_spark.registry import register, track_persist
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


# --- weighted sampling (Efraimidis-Spirakis A-Res) ---------------------------

WEIGHTED_K = 200


def weighted_sample_topk(
    df: DataFrame, id_col: str, weight_col: str, k: int
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, deterministic: per row draw
    u from the cross-engine md5 hash (u = (h+1)/2^60 ∈ (0,1]) and keep
    the k largest ln(u)/w — the Efraimidis-Spirakis A-Res key, under
    which each row's inclusion probability is proportional to its weight.
    Deterministic u makes the draw REPRODUCIBLE across engines, runs, and
    partitionings — the property a corpus-subsampling job needs so a
    re-run doesn't silently train on a different corpus.

    Scale: one scan; the rank-≤-k compiles to WindowGroupLimit, so the
    shuffle carries O(partitions·k) rows."""
    from pyspark.sql import Window

    u = (texthash.hash60(F.col(id_col).cast("string")) + 1) / F.lit(float(1 << 60))
    # Round the A-Res key to 12 dp before ranking: JVM Math.log and
    # DuckDB ln agree only to ~1 ulp, and an unrounded key makes the
    # cross-engine rank comparison knife-edge flaky at near-ties. 12 dp
    # keeps ~40 bits of the 60-bit draw (keys are O(1e-2..1e-5)), and the
    # id tie-break resolves rounded collisions identically in both engines.
    key = F.round(F.log(u) / F.col(weight_col), 12)
    w = Window.orderBy(key.desc(), F.col(id_col).asc())
    return (
        df.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
    )


_WEIGHTED_SQL = f"""
WITH keyed AS (
  SELECT doc_id, lang, n_chars,
         round(ln(({texthash.hash60_sql("CAST(doc_id AS VARCHAR)")} + 1) / {float(1 << 60)!r})
           / n_chars, 12) AS key
  FROM documents),
ranked AS (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (ORDER BY key DESC, doc_id ASC) AS rk
  FROM keyed)
SELECT doc_id, lang, n_chars, rk FROM ranked WHERE rk <= {WEIGHTED_K}
"""


@register("sampling_weighted", _WEIGHTED_SQL)
def sampling_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted corpus draw: WEIGHTED_K docs sampled without
    replacement with probability ∝ n_chars (the standard size-weighted
    subsampling lever). Value-checked: both engines compute ln of the
    same exact rational, so the selection and ranks agree."""
    docs = load_table(spark, sf_dir, "documents")
    return weighted_sample_topk(docs, "doc_id", "n_chars", WEIGHTED_K).select(
        "doc_id", "lang", "n_chars", "rk"
    )


# --- component-aware (leakage-safe) splits -----------------------------------

from vectordb_from_scratch_spark.functions.minhash import (  # noqa: E402
    bands_sql as _bands_sql,
    minhash_sig_sql as _minhash_sig_sql,
)

_COMPONENT_SPLIT_SQL = f"""
WITH RECURSIVE {_minhash_sig_sql()},
bands AS ({_bands_sql()}),
pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band_id = b.band_id AND a.band_key = b.band_key
           AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
nodes AS (SELECT DISTINCT a AS node FROM edges),
reach AS (SELECT node, node AS r FROM nodes
          UNION
          SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.node),
comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
grouped AS (
  SELECT d.doc_id, coalesce(c.component, d.doc_id) AS grp
  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id),
split AS (
  SELECT doc_id, grp,
         CASE WHEN ({texthash.hash60_sql("CAST(grp AS VARCHAR)")} % {SPLIT_BUCKETS}) < 10 THEN 'test'
              WHEN ({texthash.hash60_sql("CAST(grp AS VARCHAR)")} % {SPLIT_BUCKETS}) < 20 THEN 'val'
              ELSE 'train' END AS split
  FROM grouped)
SELECT doc_id, grp, split FROM split
"""


@register("sampling_component_split", _COMPONENT_SPLIT_SQL)
def sampling_component_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-SAFE train/val/test split: the split unit is the near-dup
    COMPONENT, not the document — hashing doc ids alone would scatter
    near-duplicates across train and test, leaking training text into
    eval (the classic contamination bug an id-level split can't prevent).
    Unclustered docs form singleton groups (their own id). Every doc in a
    component provably lands in the same split (asserted in tests).

    Scale: reuses the cached component labels; the split itself is one
    hash per group — no new shuffle beyond the label join."""
    from vectordb_from_scratch_spark.operators.dedup import corpus_components

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    labels = corpus_components(spark, sf_dir)
    grouped = docs.join(labels, docs["doc_id"] == labels["node"], "left").select(
        "doc_id", F.coalesce(F.col("label"), F.col("doc_id")).alias("grp")
    )
    bucket = texthash.hash60(F.col("grp").cast("string")) % SPLIT_BUCKETS
    return grouped.select(
        "doc_id",
        "grp",
        F.when(bucket < 10, "test").when(bucket < 20, "val").otherwise("train").alias("split"),
    )


# --- domain-mixture materialization (token-budget sampling) ------------------
#
# The missing curation primitive between "split" and "sample": a training
# mix is specified as per-domain WEIGHTS against a global token budget
# (the LLaMA/DoReMi-style mixture table), and materialized as an integer
# number of COPIES of each document — small high-weight domains repeat
# (multi-epoch), low-weight domains subsample. The deterministic rule:
#
#   budget_d = floor(B · w_d / W)            (exact integer split of B)
#   full_d   = floor(budget_d / chars_d)     (whole epochs of the domain)
#   rem_d    = budget_d mod chars_d          (chars of the partial epoch)
#   copies   = full_d + 1 if the doc's exclusive cumulative chars in
#              md5-hash order < rem_d else full_d
#
# so each domain's achieved chars lands within one document of its
# budget, and the selection depends only on content hashes — never on
# partitioning, order, or engine. All-integer arithmetic ⇒ FULL oracle.
#
# Scale: the per-domain aggregate is tiny (broadcast); the only real cost
# is the hash-ordered cumulative sum per domain — one sort keyed by
# (source), i.e. a task per domain. For a corpus where ONE domain is
# web-scale, swap the remainder-prefix rule for the scan-local
# hash-threshold approximation (keep iff hash(doc) / 2^60 < rem_d /
# chars_d — same expectation, no sort); the exact rule here is the
# auditable contract the approximation is measured against.

MIXTURE_BUDGET_DEN = 2  # B = total corpus chars // 2


def _domain_weight(source) -> F.Column:
    """Deterministic non-uniform domain weight 1..3 derived from the
    source name via the cross-engine md5 — a stand-in for the curated
    mixture table a real run would broadcast (weights must come from the
    same hash family so the oracle reproduces them)."""
    return (texthash.hash60(source) % 3 + 1).cast("long")


def domain_mixture_copies(
    docs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    size_col: str = "n_chars",
    budget_den: int = MIXTURE_BUDGET_DEN,
) -> DataFrame:
    """(doc_id, source, n_chars, copies): the materialized mixture.
    copies = 0 means the doc is dropped; ≥ 2 means multi-epoch repeats."""
    from pyspark.sql import Window

    src = F.col(source_col)
    per_dom = docs.groupBy(source_col).agg(
        F.sum(F.col(size_col).cast("long")).alias("chars_d"),
    ).withColumn("w_d", _domain_weight(src))
    # `div` is Spark's INTEGER division — the double-`/`-then-cast form
    # can round across an integer boundary and disagree with the oracle's
    # exact BIGINT `//`.
    scalars = per_dom.agg(
        F.sum("chars_d").alias("tot"), F.sum("w_d").alias("W")
    ).select(F.expr(f"tot div {budget_den}").cast("long").alias("B"), "W")
    dom = (
        per_dom.crossJoin(F.broadcast(scalars))
        .withColumn("budget_d", F.expr("(B * w_d) div W").cast("long"))
        .withColumn("full_d", F.expr("budget_d div chars_d").cast("long"))
        .withColumn("rem_d", F.col("budget_d") % F.col("chars_d"))
        .select(source_col, "full_d", "rem_d")
    )
    order = texthash.hash60(F.col(id_col).cast("string"))
    w = (
        Window.partitionBy(source_col)
        .orderBy(order.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = docs.withColumn(
        "cum_excl", F.coalesce(F.sum(F.col(size_col).cast("long")).over(w), F.lit(0))
    )
    return ranked.join(F.broadcast(dom), source_col).select(
        id_col,
        source_col,
        F.col(size_col).cast("long").alias(size_col),
        (
            F.col("full_d")
            + F.when(F.col("cum_excl") < F.col("rem_d"), 1).otherwise(0)
        ).cast("long").alias("copies"),
    )


_MIXTURE_SQL = f"""
WITH per_dom AS (
  SELECT source, sum(n_chars)::BIGINT AS chars_d,
         ({texthash.hash60_sql("source")} % 3 + 1)::BIGINT AS w_d
  FROM documents GROUP BY source),
scalars AS (
  SELECT (sum(chars_d) // {MIXTURE_BUDGET_DEN})::BIGINT AS B,
         sum(w_d)::BIGINT AS W
  FROM per_dom),
dom AS (
  SELECT source, (B * w_d // W)::BIGINT AS budget_d, chars_d
  FROM per_dom CROSS JOIN scalars),
dom2 AS (
  SELECT source, (budget_d // chars_d)::BIGINT AS full_d,
         (budget_d % chars_d)::BIGINT AS rem_d
  FROM dom),
ranked AS (
  SELECT doc_id, source, n_chars::BIGINT AS n_chars,
         coalesce(sum(n_chars::BIGINT) OVER (
           PARTITION BY source
           ORDER BY {texthash.hash60_sql("CAST(doc_id AS VARCHAR)")} ASC, doc_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl
  FROM documents)
SELECT r.doc_id, r.source, r.n_chars,
       (d.full_d + CASE WHEN r.cum_excl < d.rem_d THEN 1 ELSE 0 END)::BIGINT AS copies
FROM ranked r JOIN dom2 d USING (source)
"""


@register("sampling_domain_mixture", _MIXTURE_SQL)
def sampling_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize a domain-weighted training mixture over ``documents``:
    per-source char budgets from deterministic weights against half the
    corpus, filled as whole epochs + a hash-prefix partial epoch. FULL
    value oracle (all-integer); the within-one-doc budget accuracy and
    partitioning-independence are asserted in tests/test_sampling.py."""
    return domain_mixture_copies(load_table(spark, sf_dir, "documents"))


# --- DSIR importance weights -------------------------------------------------

#: Hashed-feature dimensionality for the DSIR importance estimator. Small
#: enough that the per-bucket log-ratio table always BROADCASTS (256 rows
#: regardless of corpus size); collisions are the method's point — Xie et
#: al. use 10^4 buckets at web scale, and the estimator only needs the
#: bucket marginals, never the raw n-gram vocabulary.
DSIR_BUCKETS = 256

#: Target distribution for the registered query: English documents — the
#: canonical DSIR setup (select raw web data that "looks like" a trusted
#: target corpus; lang is the stand-in for the target here).
DSIR_TARGET_LANG = "en"

_DSIR_SQL = f"""
WITH f AS (
  SELECT doc_id, lang,
         {texthash.hash60_sql("s")} % {DSIR_BUCKETS} AS b
  FROM (SELECT doc_id, lang, unnest({texthash.word_shingles_sql("text", 2)}) AS s
        FROM documents)),
raw AS (SELECT b, count(*)::BIGINT AS cr FROM f GROUP BY b),
tgt AS (SELECT b, count(*)::BIGINT AS ct FROM f WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY b),
tot AS (SELECT (SELECT count(*) FROM f)::DOUBLE AS tr,
               (SELECT count(*) FROM f WHERE lang = '{DSIR_TARGET_LANG}')::DOUBLE AS tt),
lr AS (SELECT r.b,
              ln((coalesce(t.ct, 0) + 1)::DOUBLE / (tot.tt + {DSIR_BUCKETS}))
            - ln((r.cr + 1)::DOUBLE / (tot.tr + {DSIR_BUCKETS})) AS logr
       FROM raw r LEFT JOIN tgt t USING (b), tot)
SELECT f.doc_id, f.lang, count(*)::BIGINT AS n_feats,
       round(sum(lr.logr), 6) AS log_weight
FROM f JOIN lr USING (b)
GROUP BY f.doc_id, f.lang
"""


def dsir_log_weights(
    docs: DataFrame,
    target: Column,
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """(doc_id, lang, n_feats, log_weight): hashed n-gram importance
    weights, Xie et al. 2023 ("Data Selection for Language Models via
    Importance Resampling" — DSIR). Each document's features are its word
    bigrams hashed into ``buckets``; the target and raw corpora induce two
    smoothed multinomials over buckets, and a doc's log importance weight
    is the sum over its feature OCCURRENCES of
    ln(p_target(bucket)) - ln(p_raw(bucket)) (add-one smoothing). High
    weight = looks like the target distribution; feed into
    ``weighted_sample_topk`` (or a Gumbel resample) to select data.

    Scale shape: two aggregations over the exploded bigram table (map-side
    combinable, keyed on a 256-value bucket id — trivially balanced), the
    corpus totals as a broadcast 1-row aggregate, the per-bucket log-ratio
    table as a broadcast join back onto the features, then one groupBy on
    doc_id. Nothing all-pairs, no vocabulary-sized state: the bucket
    table is O(buckets) no matter the corpus."""
    bigr = docs.select(
        "doc_id", "lang", F.explode(texthash.word_shingles("text", 2)).alias("s")
    )
    feats = track_persist(
        bigr.select(
            "doc_id", "lang", (texthash.hash60("s") % buckets).alias("b"), target.alias("is_t")
        )
    )
    raw = feats.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    tgt = feats.filter(F.col("is_t")).groupBy("b").agg(F.count(F.lit(1)).alias("ct"))
    tot = feats.agg(
        F.count(F.lit(1)).cast("double").alias("tr"),
        F.count(F.when(F.col("is_t"), 1)).cast("double").alias("tt"),
    )
    lr = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            (
                F.log((F.coalesce(F.col("ct"), F.lit(0)) + 1) / (F.col("tt") + buckets))
                - F.log((F.col("cr") + 1) / (F.col("tr") + buckets))
            ).alias("logr"),
        )
    )
    return (
        feats.join(F.broadcast(lr), "b")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.round(F.sum("logr"), 6).alias("log_weight"),
        )
    )


@register("sampling_dsir_logweights", _DSIR_SQL)
def sampling_dsir_logweights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights against the English-document target
    distribution. FULL value oracle: the whole estimator (hashed bigram
    counts, smoothed bucket multinomials, per-doc log-weight sums) is
    reproduced in DuckDB and compared at 6 dp."""
    docs = load_table(spark, sf_dir, "documents")
    return dsir_log_weights(docs, F.col("lang") == DSIR_TARGET_LANG)
