"""Sources round-trips (parquet/CSV/JSON, typed at the boundary) and the
custom stateful streaming operator (state carried across micro-batches)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_from_scratch_spark import sources, streaming
from vectordb_from_scratch_spark.session import load_table


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json"])
def test_roundtrip_preserves_rows_and_types(spark, sf_small, tmp_path, fmt):
    orig = load_table(spark, sf_small, "nation")
    path = str(tmp_path / f"nation_{fmt}")
    sources.write(orig, path, fmt=fmt)
    back = sources.read(spark, path, fmt=fmt, schema=orig.schema)
    assert back.schema == orig.schema  # CSV/JSON types survive via declared schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, orig.collect()))


def test_csv_without_schema_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        sources.read(spark, str(tmp_path), fmt="csv")
    with pytest.raises(ValueError, match="unknown format"):
        sources.read(spark, str(tmp_path), fmt="avro")


def test_partitioned_write_prunes(spark, sf_small, tmp_path):
    ev = load_table(spark, sf_small, "events").withColumn(
        "ts", F.unix_micros("ts")
    )  # plain long for a clean round-trip
    path = str(tmp_path / "events_by_type")
    sources.write(ev, path, partition_by="event_type")
    from vectordb_from_scratch_spark import plans

    one = sources.read(spark, path).filter(F.col("event_type") == "click")
    # partition filter never reaches the row groups — it prunes directories
    assert "PartitionFilters" in plans.physical_plan(one)
    assert one.count() == ev.filter(F.col("event_type") == "click").count()


def test_stateful_running_totals_across_microbatches(spark, sf_small, tmp_path):
    """applyInPandasWithState must accumulate across micro-batches: split
    the events into 4 files -> 4 micro-batches, final per-user state must
    equal the batch groupBy."""
    ev = load_table(spark, sf_small, "events")
    src = str(tmp_path / "ev_stream")
    ev.withColumn("ts", F.unix_micros("ts")).repartition(4).write.parquet(src)

    schema = "event_id long, ts long, user_id long, event_type string, value double, props string"
    stream = sources.read_stream(spark, src, schema=spark.read.parquet(src).schema)
    out = streaming.running_user_totals_stream(stream)
    streaming.run_stream_to_memory(out, "t_running_totals", output_mode="update")

    # update-mode sink holds every intermediate emit; counts are monotone so
    # the per-user max IS the final state
    final = (
        spark.table("t_running_totals")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n"), F.max(F.round("total_value", 6)).alias("v"))
    )
    expected = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("v")
    )
    assert sorted(map(tuple, final.collect())) == sorted(map(tuple, expected.collect()))
    # and it genuinely ran more than one micro-batch per user somewhere
    n_updates = spark.table("t_running_totals").groupBy("user_id").count()
    assert n_updates.agg(F.max("count")).first()[0] > 1
