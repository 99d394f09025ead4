"""Measured error bounds for the sketch operators — the approximate-
operator discipline (like ANN recall): don't trust the rsd/accuracy
parameter, measure it on the fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectordb_from_scratch_spark.operators.sketches import (
    approx_user_counts,
    approx_value_quantiles,
)
from vectordb_from_scratch_spark.session import load_table


def test_hll_distinct_within_rsd(spark, sf_oracle):
    e = load_table(spark, sf_oracle, "events")
    for r in approx_user_counts(e).collect():
        rel_err = abs(r["approx_users"] - r["exact_users"]) / r["exact_users"]
        assert rel_err <= 0.15, (r["event_type"], rel_err)  # 3x the 5% rsd


def test_quantiles_bracket_exact_median(spark, sf_oracle):
    e = load_table(spark, sf_oracle, "events")
    for r in approx_value_quantiles(e).collect():
        assert r["p50"] <= r["p90"] <= r["p99"]  # monotone
        denom = abs(r["exact_p50"]) or 1.0
        assert abs(r["p50"] - r["exact_p50"]) / denom <= 0.05, r
