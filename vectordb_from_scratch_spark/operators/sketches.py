"""Sketch-based approximate aggregation over ``events`` — HyperLogLog
distinct counts and approximate quantiles.

At 100 TB, exact count(DISTINCT user) shuffles every distinct value and
exact percentiles need a full sort; the sketch versions are single-pass,
mergeable (each partition builds a small sketch, the driver merges — the
same partial/merge algebra as sum), and bounded-error. Spark built-ins:
``approx_count_distinct`` (HLL++, default rsd 5%) and
``percentile_approx`` (Greenwald-Khanna, accuracy 1/eps).

The built-in sketches are rows-only for the driver (HLL++/GK internals
differ across engines, so DuckDB cannot value-match them); correctness is
carried by ``tests/test_sketches.py`` asserting measured error against the
exact answers — the same discipline as the ANN recall tests (approximate
operator, measured guarantee).

``sketch_hll_registers`` / ``sketch_hll_estimate`` go one further: an HLL
built on the cross-engine md5 hash family (functions/texthash), so both
engines compute IDENTICAL registers and the sketch itself is value-checked
— including the estimate, whose harmonic mean runs in scaled integer
arithmetic to stay deterministic."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.functions import texthash
from vectordb_from_scratch_spark.registry import register
from vectordb_from_scratch_spark.session import load_table

QUANTILES = [0.5, 0.9, 0.99]
PA_ACCURACY = 10_000  # percentile_approx: error <= 1/accuracy of rank

# --- cross-engine deterministic HyperLogLog ---------------------------------------
#
# Spark's approx_count_distinct is rows-only for the driver because HLL++
# internals are engine-specific. This HLL is built from the same md5 hash
# family as MinHash (functions/texthash), so Spark and DuckDB compute the
# SAME registers — the sketch itself becomes value-checkable, which is the
# strongest check an approximate-distinct operator can carry. The register
# table is also the honest scale artifact: partial aggregation = per-
# partition max-per-bucket, merge = max again (the same algebra Spark's
# partial aggregates use), and the final sketch is m integers regardless
# of row count.

HLL_P = 8
HLL_M = 1 << HLL_P  # 256 buckets
#: h is 60 bits; bucket takes 8, the remaining v has 52 → rho ∈ [1, 53].
_HLL_VBITS = 52
_HLL_RHO_MAX = _HLL_VBITS + 1
#: standard bias constant alpha_m for m >= 128 (Flajolet et al. 2007).
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)


def _hll_rho_cols(df: DataFrame, key) -> DataFrame:
    """Adds (bucket, rho) per row: bucket = low 8 bits of the 60-bit md5
    hash, rho = 1 + leading zeros of the remaining 52 bits. Leading zeros
    via length(bin(v)) — bin() renders without padding identically in
    Spark and DuckDB (verified), so rho = 53 - length(bin(v)) for v > 0."""
    h = texthash.hash60(key)
    return (
        df.withColumn("_h", h)
        .withColumn("bucket", F.pmod(F.col("_h"), F.lit(HLL_M)))
        # (h - bucket) is a multiple of 256 <= 2^60: exactly representable
        # in double (52-bit mantissa suffices), and /256 is a power-of-two
        # division — so this is EXACT despite passing through double.
        # A bare h/256 would NOT be (h has 60 significant bits).
        .withColumn("_v", ((F.col("_h") - F.col("bucket")) / HLL_M).cast("long"))
        .withColumn(
            "rho",
            F.when(
                F.col("_v") > 0, F.lit(_HLL_RHO_MAX) - F.length(F.bin("_v"))
            ).otherwise(F.lit(_HLL_RHO_MAX)),
        )
    )


def approx_user_counts(events: DataFrame, rsd: float = 0.05) -> DataFrame:
    """(event_type, n_events, approx_users, exact_users): HLL++ distinct
    users next to the exact answer — emitting both is the honest shape
    while validating a sketch rollout; drop the exact column once trusted."""
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.approx_count_distinct("user_id", rsd=rsd).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )


def approx_value_quantiles(events: DataFrame) -> DataFrame:
    """(event_type, p50, p90, p99) via Greenwald-Khanna with exact median
    alongside (median() is exact in Spark 3.4+)."""
    qs = F.percentile_approx("value", QUANTILES, PA_ACCURACY)
    return events.groupBy("event_type").agg(
        qs.alias("approx_q"),
        F.expr("percentile(value, 0.5)").alias("exact_p50"),
    ).select(
        "event_type",
        F.round(F.col("approx_q")[0], 6).alias("p50"),
        F.round(F.col("approx_q")[1], 6).alias("p90"),
        F.round(F.col("approx_q")[2], 6).alias("p99"),
        F.round("exact_p50", 6).alias("exact_p50"),
    )


@register("sketch_distinct_users")  # rows-only: HLL internals engine-specific
def sketch_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return approx_user_counts(load_table(spark, sf_dir, "events"))


_HLL_H_SQL = texthash.hash60_sql("CAST(user_id AS VARCHAR)")

_HLL_REGISTERS_SQL = f"""
WITH h AS (SELECT {_HLL_H_SQL} AS h FROM events),
b AS (SELECT h % {HLL_M} AS bucket, h // {HLL_M} AS v FROM h),
r AS (SELECT bucket,
             CASE WHEN v > 0 THEN {_HLL_RHO_MAX} - length(bin(v))
                  ELSE {_HLL_RHO_MAX} END AS rho
      FROM b)
SELECT bucket::BIGINT AS bucket, max(rho)::BIGINT AS max_rho
FROM r GROUP BY bucket
"""


@register("sketch_hll_registers", _HLL_REGISTERS_SQL)
def sketch_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL sketch ITSELF, value-checked: because the hash is the
    cross-engine md5 family, both engines compute identical registers —
    an approximate-distinct operator with an EXACT oracle on its state
    (Spark's own HLL++ can only ever be rows-only). The register table is
    what actually ships at scale: per-partition partial = max-per-bucket,
    merge = max again, final size m=256 integers regardless of input rows
    — the same partial/merge algebra as sum(), so Spark's two-level
    aggregation IS the sketch merge."""
    ev = load_table(spark, sf_dir, "events")
    r = _hll_rho_cols(ev.select(F.col("user_id").cast("string").alias("k")), "k")
    return r.groupBy(F.col("bucket").cast("long").alias("bucket")).agg(
        F.max("rho").cast("long").alias("max_rho")
    )


_HLL_ESTIMATE_SQL = f"""
WITH h AS (SELECT event_type, user_id, {_HLL_H_SQL} AS h FROM events),
regs AS (SELECT event_type, h % {HLL_M} AS bucket,
                max(CASE WHEN h // {HLL_M} > 0
                         THEN {_HLL_RHO_MAX} - length(bin(h // {HLL_M}))
                         ELSE {_HLL_RHO_MAX} END) AS r
         FROM h GROUP BY 1, 2),
agg AS (SELECT event_type, count(*) AS n_used,
               sum((1::BIGINT << ({_HLL_RHO_MAX} - r)))::BIGINT AS sum_used
        FROM regs GROUP BY 1),
est AS (SELECT event_type, ({HLL_M} - n_used)::BIGINT AS zeros,
               {HLL_ALPHA!r}::DOUBLE * {HLL_M} * {HLL_M} * {1 << _HLL_RHO_MAX}
               / (sum_used + ({HLL_M} - n_used) * {1 << _HLL_RHO_MAX})::DOUBLE AS e_raw
        FROM agg),
ex AS (SELECT event_type, count(DISTINCT user_id)::BIGINT AS exact_users
       FROM events GROUP BY 1)
SELECT ex.event_type, exact_users,
       round(CASE WHEN e_raw <= {2.5 * HLL_M} AND zeros > 0
                  THEN {HLL_M}.0 * ln({HLL_M}.0 / zeros) ELSE e_raw END, 2) AS hll_users
FROM est JOIN ex USING (event_type)
"""


@register("sketch_hll_estimate", _HLL_ESTIMATE_SQL)
def sketch_hll_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type HLL cardinality estimate next to the exact count.
    The harmonic mean runs in INTEGER arithmetic (each 2^-rho term scaled
    by 2^53 — sums stay < 2^61), so the only float ops are one division
    and the small-range ln() correction, making the estimate itself
    deterministic enough to value-check at 2dp. Standard Flajolet alpha_m
    bias constant and linear-counting correction below 2.5m."""
    ev = load_table(spark, sf_dir, "events")
    r = _hll_rho_cols(
        ev.select("event_type", F.col("user_id").cast("string").alias("k")), "k"
    )
    regs = r.groupBy("event_type", "bucket").agg(F.max("rho").alias("r"))
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({_HLL_RHO_MAX} - r AS INT))")
    agg = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_used"), F.sum(term).alias("sum_used")
    )
    scale = F.lit(1 << _HLL_RHO_MAX).cast("long")
    zeros = (F.lit(HLL_M) - F.col("n_used")).cast("long")
    e_raw = (
        F.lit(HLL_ALPHA * HLL_M * HLL_M)
        * scale
        / (F.col("sum_used") + zeros * scale).cast("double")
    )
    est = agg.select(
        "event_type",
        zeros.alias("zeros"),
        e_raw.alias("e_raw"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_users")
    )
    hll = F.when(
        (F.col("e_raw") <= 2.5 * HLL_M) & (F.col("zeros") > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / F.col("zeros")),
    ).otherwise(F.col("e_raw"))
    return est.join(exact, "event_type").select(
        "event_type", "exact_users", F.round(hll, 2).alias("hll_users")
    )


@register("sketch_value_quantiles")  # rows-only: GK sketch engine-specific
def sketch_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return approx_value_quantiles(load_table(spark, sf_dir, "events"))
