"""In-engine trained quality classifier (fastText-style linear filter).

Web-scale curation pipelines (CCNet, GPT-3's WebText filter, RefinedWeb)
train a small linear classifier on cheap surface features and score every
document with it. The reference has no model-training surface at all
(its only "learning" is IVF k-means, app/core/indexes/ivf.py:60-101);
this module adds the Spark-first re-expression of that pipeline stage:

- features are pure codegen Column expressions over the token list
  (exact rational arithmetic wherever possible, so both engines agree
  bit-for-bit before the sigmoid);
- training is batch gradient descent on logistic loss where EACH
  ITERATION IS ONE DISTRIBUTED AGGREGATION (the gradient is a 5-float
  sufficient statistic, map-side combinable) and the weight vector rides
  the plan as a broadcast 1-row DataFrame — the whole T-iteration train
  is ONE declarative job, no driver loop, no .collect() anywhere;
- the oracle unrolls the same T iterations as a CTE chain, so training
  is FULLY VALUE-CHECKED cross-engine — not just "converges", but the
  identical weights to 6 decimals.

Scale shape: T passes over the corpus, each a partial-aggregated scan
(zero data shuffles — the only exchange moves one 5-float row); scoring
is a broadcast join + codegen sigmoid. At 100 TB this is exactly
MLlib's treeAggregate loop, minus the driver round-trips per iteration.

Fixture task: predict ``lang = 'en'`` from length/shape signals — the
label is arbitrary (any boolean column works); the contract under test
is the distributed GD arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.functions import texthash
from vectordb_from_scratch_spark.registry import register
from vectordb_from_scratch_spark.session import load_table

#: GD iterations. Each unrolls to one CTE stage in the oracle; 3 is enough
#: to move every weight well away from 0 while keeping the oracle legible.
GD_ITERS = 3
GD_ETA = 1.0  # learning rate

_FEATURES = ["bias", "log_tokens", "mean_word_len", "type_token_ratio", "stopword_frac"]
_STOPWORDS = ("the", "a")


def doc_features(docs: DataFrame, label_col: str = "lang") -> DataFrame:
    """(doc_id, y, b, f1..f4): surface features + the training label.

    All four non-bias features are ratios/logs of exact integer counts,
    so Spark and DuckDB produce identical doubles before any transcendental
    enters the computation."""
    ws = texthash.words("text")
    n = F.size(ws).cast("double")
    stop_hits = F.size(F.filter(ws, lambda w: w.isin(*_STOPWORDS))).cast("double")
    return docs.select(
        "doc_id",
        F.when(F.col(label_col) == "en", 1.0).otherwise(0.0).alias("y"),
        F.lit(1.0).alias("b"),
        F.log(F.lit(1.0) + n).alias("f1"),
        (F.length(F.array_join(ws, "")).cast("double") / n).alias("f2"),
        (F.size(F.array_distinct(ws)).cast("double") / n).alias("f3"),
        (stop_hits / n).alias("f4"),
    )


def _sigma(wcols) -> F.Column:
    z = (
        wcols["wb"] * F.col("b")
        + wcols["w1"] * F.col("f1")
        + wcols["w2"] * F.col("f2")
        + wcols["w3"] * F.col("f3")
        + wcols["w4"] * F.col("f4")
    )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def train_weights(feat: DataFrame, iters: int = GD_ITERS, eta: float = GD_ETA) -> DataFrame:
    """One-row (wb, w1..w4) after ``iters`` full-batch GD steps from w=0.

    The returned DataFrame is a single declarative plan: iteration t's
    aggregate consumes iteration t-1's broadcast 1-row result. Catalyst
    sees T scans of ``feat`` glued by broadcast exchanges — no driver
    synchronization between steps."""
    names = ["wb", "w1", "w2", "w3", "w4"]
    fcols = ["b", "f1", "f2", "f3", "f4"]

    # step 1 from w=0: sigma is the constant 0.5, no join needed
    w = feat.agg(
        *[
            (-eta * F.avg((F.lit(0.5) - F.col("y")) * F.col(c))).alias(nm)
            for nm, c in zip(names, fcols)
        ]
    )
    for _ in range(iters - 1):
        p = feat.crossJoin(F.broadcast(w))
        s = _sigma({nm: F.col(nm) for nm in names})
        w = p.agg(
            *[
                (F.min(nm) - eta * F.avg((s - F.col("y")) * F.col(c))).alias(nm)
                for nm, c in zip(names, fcols)
            ]
        )
    return w


def score_documents(docs: DataFrame, iters: int = GD_ITERS) -> DataFrame:
    """(doc_id, y, score): every document scored by the trained model —
    the quality-filter pass a curation pipeline runs corpus-wide."""
    feat = doc_features(docs)
    w = train_weights(feat, iters)
    p = feat.crossJoin(F.broadcast(w))
    return p.select(
        "doc_id",
        F.col("y").cast("long").alias("y"),
        F.round(_sigma({nm: F.col(nm) for nm in ("wb", "w1", "w2", "w3", "w4")}), 6).alias(
            "score"
        ),
    )


# --- oracle SQL --------------------------------------------------------------

_WS = "list_filter(string_split(text, ' '), x -> x != '')"

_FEAT_SQL = f"""
  SELECT doc_id,
         CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
         1.0 AS b,
         ln(1.0 + len(ws)) AS f1,
         length(array_to_string(ws, '')) * 1.0 / len(ws) AS f2,
         len(list_distinct(ws)) * 1.0 / len(ws) AS f3,
         len(list_filter(ws, x -> x IN ('the', 'a'))) * 1.0 / len(ws) AS f4
  FROM (SELECT doc_id, lang, {_WS} AS ws FROM documents)
"""


def _train_ctes(iters: int = GD_ITERS, eta: float = GD_ETA) -> tuple[str, str]:
    names = ["wb", "w1", "w2", "w3", "w4"]
    fcols = ["b", "f1", "f2", "f3", "f4"]
    parts = [f"feat AS ({_FEAT_SQL})"]
    parts.append(
        "w1_ AS (SELECT "
        + ", ".join(
            f"-{eta} * avg((0.5 - y) * {c}) AS {nm}" for nm, c in zip(names, fcols)
        )
        + " FROM feat)"
    )
    for t in range(2, iters + 1):
        sig = (
            "1.0 / (1.0 + exp(-(wb * b + w1 * f1 + w2 * f2 + w3 * f3 + w4 * f4)))"
        )
        parts.append(
            f"p{t}_ AS (SELECT f.*, w.*, {sig} AS s FROM feat f CROSS JOIN w{t - 1}_ w)"
        )
        parts.append(
            f"w{t}_ AS (SELECT "
            + ", ".join(
                f"min({nm}) - {eta} * avg((s - y) * {c}) AS {nm}"
                for nm, c in zip(names, fcols)
            )
            + f" FROM p{t}_)"
        )
    return ",\n".join(parts), f"w{iters}_"


_CTES, _WFINAL = _train_ctes()

_WEIGHTS_SQL = f"""
WITH {_CTES}
SELECT feature, round(weight, 6) AS weight FROM (
  SELECT unnest(['bias', 'log_tokens', 'mean_word_len', 'type_token_ratio',
                 'stopword_frac']) AS feature,
         unnest([wb, w1, w2, w3, w4]) AS weight
  FROM {_WFINAL})
"""

_SCORES_SQL = f"""
WITH {_CTES}
SELECT f.doc_id, f.y::BIGINT AS y,
       round(1.0 / (1.0 + exp(-(w.wb * f.b + w.w1 * f.f1 + w.w2 * f.f2
                                + w.w3 * f.f3 + w.w4 * f.f4))), 6) AS score
FROM feat f CROSS JOIN {_WFINAL} w
"""


@register("quality_classifier_weights", _WEIGHTS_SQL)
def quality_classifier_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained weight vector itself, value-checked to 6 decimals —
    proof that T distributed GD iterations produce the same arithmetic
    as the oracle's unrolled CTE chain."""
    w = train_weights(doc_features(load_table(spark, sf_dir, "documents")))
    stack_args = ", ".join(
        f"'{feat}', {col}"
        for feat, col in zip(_FEATURES, ("wb", "w1", "w2", "w3", "w4"))
    )
    return w.select(
        F.expr(f"stack({len(_FEATURES)}, {stack_args}) AS (feature, weight)")
    ).select("feature", F.round("weight", 6).alias("weight"))


@register("quality_classifier_scores", _SCORES_SQL)
def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide scoring pass with the in-engine-trained model. FULL
    value oracle (train + score both replayed in DuckDB)."""
    return score_documents(load_table(spark, sf_dir, "documents"))
