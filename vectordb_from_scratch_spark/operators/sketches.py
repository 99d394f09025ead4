"""Sketch-based approximate aggregation over ``events`` — HyperLogLog
distinct counts and approximate quantiles.

At 100 TB, exact count(DISTINCT user) shuffles every distinct value and
exact percentiles need a full sort; the sketch versions are single-pass,
mergeable (each partition builds a small sketch, the driver merges — the
same partial/merge algebra as sum), and bounded-error. Spark built-ins:
``approx_count_distinct`` (HLL++, default rsd 5%) and
``percentile_approx`` (Greenwald-Khanna, accuracy 1/eps).

These are rows-only for the driver (sketch internals differ across
engines, so DuckDB cannot value-match them); correctness is carried by
``tests/test_sketches.py`` asserting measured error against the exact
answers — the same discipline as the ANN recall tests (approximate
operator, measured guarantee)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.registry import register
from vectordb_from_scratch_spark.session import load_table

QUANTILES = [0.5, 0.9, 0.99]
PA_ACCURACY = 10_000  # percentile_approx: error <= 1/accuracy of rank


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


@register("sketch_value_quantiles")  # rows-only: GK sketch engine-specific
def sketch_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return approx_value_quantiles(load_table(spark, sf_dir, "events"))
