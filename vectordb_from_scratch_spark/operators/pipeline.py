"""End-to-end training-data preparation: the composed pipeline a 100 TB
pretraining corpus actually runs, as ONE declarative plan.

    documents
      → quality gate        (C4/CCNet-style heuristics, textstats)
      → near-dup removal    (MinHash bands → candidate pairs → connected
                             components → keep the min-id representative)
      → corpus accounting   (docs + token budget per source × lang)

Each stage exists standalone with its own oracle (text_quality_scores,
dedup_minhash_lsh, dedup_components); this module proves they COMPOSE —
one Spark plan, one recursive-CTE DuckDB oracle, value-matched end to end.

Scale shape: the quality gate is a scan-local projection (no shuffle); the
dedup stages shuffle on (band_id, band_key) then on node id; the final
accounting is a small groupBy. Nothing here is quadratic in the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.functions import minhash, texthash
from vectordb_from_scratch_spark.operators import dedup
from vectordb_from_scratch_spark.registry import register
from vectordb_from_scratch_spark.session import load_table

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")
_STOP_LIST_SQL = "[" + ", ".join(f"'{w}'" for w in _STOPWORDS) + "]"


def quality_keep_flag() -> F.Column:
    """The textstats quality gate as a reusable predicate column (>=20
    words, stopword ratio > 1%, punctuation < 20%)."""
    ws = texthash.words("text")
    n_words = F.size(ws)
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    stop_ratio = F.size(F.filter(ws, lambda w: F.array_contains(stop_arr, w))) / n_words
    punct_ratio = F.regexp_count("text", F.lit("[^a-zA-Z0-9 ]")) / F.length("text")
    return (n_words >= 20) & (stop_ratio > 0.01) & (punct_ratio < 0.2)


def prepare_training_corpus(
    spark: SparkSession, docs: DataFrame, bands: DataFrame | None = None
) -> DataFrame:
    """documents → kept docs with token counts (quality-gated,
    near-dup-cleansed: every doc that belongs to a MinHash duplicate
    component but is not its min-id representative is dropped).

    ``bands``: pass a prebuilt/cached band table (dedup.banded_signatures)
    when the docs are the shared corpus; otherwise it's computed here."""
    from vectordb_from_scratch_spark.registry import track_persist

    if bands is None:
        bands = track_persist(dedup.minhash_bands(dedup.minhash_signatures(docs)))
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    labels = dedup.connected_components(pairs)
    non_reps = labels.filter(F.col("label") != F.col("node")).select(
        F.col("node").alias("doc_id")
    )
    return (
        docs.filter(quality_keep_flag())
        .join(non_reps, "doc_id", "left_anti")
        .select(
            "doc_id",
            "source",
            "lang",
            F.size(texthash.words("text")).cast("long").alias("n_tokens"),
        )
    )


_PREP_SQL = f"""
WITH RECURSIVE {minhash.minhash_sig_sql()},
bands AS ({minhash.bands_sql()}),
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
nonrep AS (SELECT node AS doc_id FROM comp WHERE component <> node),
q AS (SELECT doc_id, source, lang,
             list_filter(string_split(text, ' '), w -> w != '') AS ws,
             len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) * 1.0 / length(text) AS punct_ratio
      FROM documents),
kept AS (SELECT doc_id, source, lang, len(ws)::BIGINT AS n_tokens
         FROM q
         WHERE len(ws) >= 20
           AND len(list_filter(ws, w -> list_contains({_STOP_LIST_SQL}, w))) * 1.0 / len(ws) > 0.01
           AND punct_ratio < 0.2
           AND doc_id NOT IN (SELECT doc_id FROM nonrep))
SELECT source, lang,
       count(*)        AS n_docs,
       sum(n_tokens)::BIGINT AS total_tokens
FROM kept GROUP BY source, lang
"""


@register("pipeline_training_prep", _PREP_SQL)
def pipeline_training_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus accounting after the full prep pipeline: documents and token
    budget per source × lang, quality-gated and near-dup-cleansed — the
    whole composition value-checked against one DuckDB query."""
    docs = load_table(spark, sf_dir, "documents")
    kept = prepare_training_corpus(
        spark, docs, bands=dedup.banded_signatures(spark, sf_dir)
    )
    return kept.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


# --- the FULL pipeline: quality → near-dup → decontaminate → accounting ----------

_CLEAN_SQL = f"""
WITH RECURSIVE {minhash.minhash_sig_sql()},
bands AS ({minhash.bands_sql()}),
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
nonrep AS (SELECT node AS doc_id FROM comp WHERE component <> node),
eval_sh AS (
  SELECT DISTINCT unnest(list_distinct(
           {texthash.word_shingles_sql('text', 6)})) AS s
  FROM documents WHERE source = 'src0'),
batch_sh AS (
  SELECT doc_id, unnest(list_distinct(
           {texthash.word_shingles_sql('text', 6)})) AS s
  FROM documents WHERE source <> 'src0'),
contaminated AS (
  SELECT doc_id FROM batch_sh JOIN eval_sh USING (s)
  GROUP BY doc_id HAVING count(*) >= 5),
q AS (SELECT doc_id, source, lang,
             list_filter(string_split(text, ' '), w -> w != '') AS ws,
             len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) * 1.0 / length(text) AS punct_ratio
      FROM documents WHERE source <> 'src0'),
kept AS (SELECT doc_id, source, lang, len(ws)::BIGINT AS n_tokens
         FROM q
         WHERE len(ws) >= 20
           AND len(list_filter(ws, w -> list_contains({_STOP_LIST_SQL}, w))) * 1.0 / len(ws) > 0.01
           AND punct_ratio < 0.2
           AND doc_id NOT IN (SELECT doc_id FROM nonrep)
           AND doc_id NOT IN (SELECT doc_id FROM contaminated))
SELECT source, lang,
       count(*)      AS n_docs,
       sum(n_tokens)::BIGINT AS total_tokens
FROM kept GROUP BY source, lang
"""


@register("pipeline_clean_corpus", _CLEAN_SQL)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE training-data preparation flow, one plan, one oracle:

        documents (minus the held-out eval source)
          → quality gate          (scan-local predicate)
          → near-dup removal      (MinHash bands → components → keep reps;
                                   note: dup detection runs over the FULL
                                   corpus incl. eval docs, so a training
                                   doc duplicating an eval doc is dropped
                                   by whichever of dedup/decon fires first)
          → eval decontamination  (≥5 shared 6-word shingles with the
                                   src0 eval set → broadcast semi-join)
          → corpus accounting     (docs + token budget per source × lang)

    This is the composition the four standalone oracles
    (text_quality_scores, dedup_minhash_lsh/components,
    dedup_decontaminate, pipeline_training_prep) exist to feed — and the
    end-to-end value check proves the stages don't interfere. Scale shape
    is the union of its parts: band-key shuffles + node-id iterations for
    dedup, an eval-side broadcast for decon, scan-local quality, one
    small final groupBy. The corpus is never joined quadratically and
    never shuffled whole."""
    clean = clean_corpus_docs(spark, sf_dir)
    return clean.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


def clean_corpus_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The kept (doc_id, source, lang, n_tokens) rows after quality gate →
    near-dup removal → eval decontamination — the shared chain behind
    ``pipeline_clean_corpus`` and its classifier-gated variant."""
    docs = load_table(spark, sf_dir, "documents")
    bands = dedup.banded_signatures(spark, sf_dir)
    kept = prepare_training_corpus(spark, docs.filter(F.col("source") != "src0"), bands=bands)

    eval_sh = (
        docs.filter(F.col("source") == "src0")
        .select(F.explode(F.array_distinct(texthash.word_shingles("text", 6))).alias("s"))
        .distinct()
    )
    contaminated = (
        docs.filter(F.col("source") != "src0")
        .select("doc_id", F.explode(F.array_distinct(texthash.word_shingles("text", 6))).alias("s"))
        .join(F.broadcast(eval_sh), "s", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 5)
        .select("doc_id")
    )
    return kept.join(contaminated, "doc_id", "left_anti")


# --- the classifier-gated pipeline -------------------------------------------
#
# r5 shipped the in-engine-trained logistic quality classifier BESIDE the
# pipeline (quality_classifier_scores); this variant composes it INSIDE
# (VERDICT r6 #6): train → score → gate → the existing dedup/decontaminate
# chain, one plan, one oracle. The gate keeps batch documents scoring
# ABOVE THE BATCH MEAN under the learned model — a self-calibrating cut
# (the 3-iteration model's absolute scores sit near 0 on the imbalanced
# fixture label, so a fixed 0.5 threshold would keep nothing). The
# comparison is pure integer arithmetic (6dp score ×10⁶ as BIGINT;
# si·n > Σsi avoids dividing), so gate membership is bit-exact across
# engines — no float-boundary flakiness in WHICH docs pass.

#: fixed-point scale for the gate comparison (scores are 6dp-rounded)
CLS_GATE_SCALE = 1_000_000


def _clean_cls_sql() -> str:
    from vectordb_from_scratch_spark.operators import classifier

    sig = (
        "1.0 / (1.0 + exp(-(w.wb * f.b + w.w1 * f.f1 + w.w2 * f.f2 "
        "+ w.w3 * f.f3 + w.w4 * f.f4)))"
    )
    return f"""
WITH RECURSIVE {minhash.minhash_sig_sql()},
bands AS ({minhash.bands_sql()}),
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
nonrep AS (SELECT node AS doc_id FROM comp WHERE component <> node),
eval_sh AS (
  SELECT DISTINCT unnest(list_distinct(
           {texthash.word_shingles_sql('text', 6)})) AS s
  FROM documents WHERE source = 'src0'),
batch_sh AS (
  SELECT doc_id, unnest(list_distinct(
           {texthash.word_shingles_sql('text', 6)})) AS s
  FROM documents WHERE source <> 'src0'),
contaminated AS (
  SELECT doc_id FROM batch_sh JOIN eval_sh USING (s)
  GROUP BY doc_id HAVING count(*) >= 5),
{classifier._CTES},
cls AS (
  SELECT f.doc_id,
         floor(round({sig}, 6) * {CLS_GATE_SCALE} + 0.5)::BIGINT AS si
  FROM feat f CROSS JOIN {classifier._WFINAL} w
  WHERE f.doc_id IN (SELECT doc_id FROM documents WHERE source <> 'src0')),
cstat AS (SELECT sum(si)::BIGINT AS ssum, count(*)::BIGINT AS n FROM cls),
lowq AS (SELECT doc_id FROM cls CROSS JOIN cstat WHERE si * n <= ssum),
q AS (SELECT doc_id, source, lang,
             list_filter(string_split(text, ' '), w -> w != '') AS ws,
             len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) * 1.0 / length(text) AS punct_ratio
      FROM documents WHERE source <> 'src0'),
kept AS (SELECT doc_id, source, lang, len(ws)::BIGINT AS n_tokens
         FROM q
         WHERE len(ws) >= 20
           AND len(list_filter(ws, w -> list_contains({_STOP_LIST_SQL}, w))) * 1.0 / len(ws) > 0.01
           AND punct_ratio < 0.2
           AND doc_id NOT IN (SELECT doc_id FROM nonrep)
           AND doc_id NOT IN (SELECT doc_id FROM contaminated)
           AND doc_id NOT IN (SELECT doc_id FROM lowq))
SELECT source, lang,
       count(*)      AS n_docs,
       sum(n_tokens)::BIGINT AS total_tokens
FROM kept GROUP BY source, lang
"""


@register("pipeline_clean_corpus_classified", _clean_cls_sql())
def pipeline_clean_corpus_classified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``pipeline_clean_corpus`` with the learned gate composed in: the
    logistic model trains on the FULL corpus inside the plan (the same
    T-iteration distributed GD as ``quality_classifier_scores``, weights
    riding a broadcast 1-row frame), every batch document is scored, and
    only above-batch-mean documents survive into the accounting. FULL
    value oracle — the training arithmetic, the sigmoid, the fixed-point
    gate, and the dedup/decontamination chain all replay in one DuckDB
    query. Scale shape adds T corpus scans (partial-aggregated, zero data
    shuffle) and one broadcast join to the clean-corpus plan."""
    from vectordb_from_scratch_spark.operators import classifier

    docs = load_table(spark, sf_dir, "documents")
    scores = classifier.score_documents(docs).join(
        docs.filter(F.col("source") != "src0").select("doc_id"), "doc_id", "left_semi"
    ).select(
        "doc_id",
        F.floor(F.col("score") * CLS_GATE_SCALE + F.lit(0.5)).cast("long").alias("si"),
    )
    cstat = scores.agg(
        F.sum("si").alias("ssum"), F.count(F.lit(1)).alias("n")
    )
    lowq = (
        scores.crossJoin(F.broadcast(cstat))
        .filter(F.col("si") * F.col("n") <= F.col("ssum"))
        .select("doc_id")
    )
    clean = clean_corpus_docs(spark, sf_dir).join(lowq, "doc_id", "left_anti")
    return clean.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


# --- sequence packing --------------------------------------------------------
#
# Pretraining consumes fixed-length sequences; "packing" concatenates
# documents into token-budget bins so short docs don't waste context
# window. Contiguous first-fit packing is a running sum + integer
# division — pure window arithmetic, so the whole operator is
# SQL-expressible and value-checked. Sharding bounds the window: packing
# is embarrassingly parallel across (lang, shard) groups, which is how a
# 100 TB corpus packs — the global-order variant would serialize on one
# partition.

PACK_BUDGET = 2048  # tokens per packed sequence
PACK_SHARDS = 8

_PACKING_SQL = f"""
WITH d AS (
  SELECT doc_id, lang,
         len(list_filter(string_split(text, ' '), w -> w != ''))::BIGINT AS n_tokens,
         ({texthash.hash60_sql("CAST(doc_id AS VARCHAR)")} % {PACK_SHARDS}) AS shard
  FROM documents),
runs AS (
  SELECT lang, shard, doc_id, n_tokens,
         sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
           AS run_total
  FROM d),
binned AS (
  SELECT lang, shard, doc_id, n_tokens,
         ((run_total - n_tokens) // {PACK_BUDGET})::BIGINT AS bin
  FROM runs)
SELECT lang, shard::BIGINT AS shard, bin,
       count(*)::BIGINT AS n_docs,
       sum(n_tokens)::BIGINT AS total_tokens
FROM binned GROUP BY lang, shard, bin
"""


@register("pipeline_sequence_packing", _PACKING_SQL)
def pipeline_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing: per (lang, shard), docs in
    deterministic id order accumulate into PACK_BUDGET-token bins (a doc
    starts the next bin when its START offset crosses the budget —
    contiguous first-fit). Output is per-bin accounting, all integers.
    The window is PARTITIONED by (lang, shard): each shard packs
    independently, so the plan parallelizes instead of serializing on a
    global cumulative sum."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "lang",
        F.size(texthash.words("text")).cast("long").alias("n_tokens"),
        (texthash.hash60(F.col("doc_id").cast("string")) % PACK_SHARDS).alias("shard"),
    )
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = d.withColumn("run_total", F.sum("n_tokens").over(w)).withColumn(
        # integer DIV, not float division + cast: exact at any magnitude
        "bin", F.expr(f"(run_total - n_tokens) DIV {PACK_BUDGET}")
    )
    return binned.groupBy("lang", F.col("shard").cast("long").alias("shard"), "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


# --- curriculum binning --------------------------------------------------------
#
# Curriculum schedules feed a model progressively harder/cleaner data;
# the data-side operator is "split the corpus into K phases by a quality
# signal". The scale-correct form of ntile: GLOBAL quantile THRESHOLDS
# (one aggregate, a 3-value broadcast) and a comparison per row — never a
# global-order window, which would serialize the corpus through one
# partition. Spark's percentile() and DuckDB's quantile_cont both
# interpolate, and both engines compute them over the 6dp-ROUNDED quality
# score, so the thresholds are bit-identical. The rounding also BOUNDS
# the exact percentile's aggregation state — ≤ 10^6+1 distinct values in
# [0, 1] regardless of corpus size — so unlike the raw-value percentile
# family (see events_value_percentiles), this exact path is scale-safe
# as-is and needs no sketch exit.

CURRICULUM_PHASES = 4

_CURR_SQL = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), w -> w != '') AS ws,
         length(text) AS n_chars,
         len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS n_punct
  FROM documents),
m AS (
  SELECT doc_id, len(ws)::BIGINT AS n_tokens,
         round(0.4 * least(len(ws) / 100.0, 1.0)
               + 0.4 * least(len(list_filter(ws, w -> list_contains({_STOP_LIST_SQL}, w))) * 5.0 / len(ws), 1.0)
               + 0.2 * (1.0 - n_punct * 1.0 / n_chars), 6) AS quality
  FROM t),
th AS (SELECT quantile_cont(quality, 0.25) AS t1,
              quantile_cont(quality, 0.50) AS t2,
              quantile_cont(quality, 0.75) AS t3
       FROM m)
SELECT (1 + CASE WHEN quality > t1 THEN 1 ELSE 0 END
          + CASE WHEN quality > t2 THEN 1 ELSE 0 END
          + CASE WHEN quality > t3 THEN 1 ELSE 0 END)::BIGINT AS phase,
       count(*)::BIGINT AS n_docs,
       sum(n_tokens)::BIGINT AS total_tokens,
       round(min(quality), 6) AS min_quality,
       round(max(quality), 6) AS max_quality
FROM m CROSS JOIN th
GROUP BY 1
"""


@register("pipeline_curriculum_bins", _CURR_SQL)
def pipeline_curriculum_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(phase, n_docs, total_tokens, min_quality, max_quality): the
    corpus cut into CURRICULUM_PHASES quality quartiles — phase 1 is the
    lowest-quality quarter, phase 4 the cleanest (train order is the
    scheduler's choice; the operator's job is the deterministic cut).
    Thresholds come from one percentile aggregate broadcast back over the
    scan (two passes over a scan-local projection, zero wide shuffles
    except the final 4-group aggregate)."""
    from vectordb_from_scratch_spark.operators.textstats import quality_score_col

    docs = load_table(spark, sf_dir, "documents")
    n_words, _, _, quality = quality_score_col()
    m = docs.select(
        n_words.cast("long").alias("n_tokens"), quality.alias("quality")
    )
    th = m.agg(
        F.percentile("quality", F.lit(0.25)).alias("t1"),
        F.percentile("quality", F.lit(0.50)).alias("t2"),
        F.percentile("quality", F.lit(0.75)).alias("t3"),
    )
    phase = (
        F.lit(1)
        + (F.col("quality") > F.col("t1")).cast("int")
        + (F.col("quality") > F.col("t2")).cast("int")
        + (F.col("quality") > F.col("t3")).cast("int")
    ).cast("long")
    return (
        m.crossJoin(F.broadcast(th))
        .groupBy(phase.alias("phase"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.min("quality"), 6).alias("min_quality"),
            F.round(F.max("quality"), 6).alias("max_quality"),
        )
    )
