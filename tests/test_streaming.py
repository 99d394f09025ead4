"""Batch/stream equivalence: the same expressions over readStream must
produce the same rows as over spark.read — Spark guarantees it, these tests
pin that our operators are written in the compatible subset."""

from vectordb_from_scratch_spark import streaming
from vectordb_from_scratch_spark.session import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_tumbling_stream_equals_batch(spark, sf_small):
    batch = streaming.tumbling_counts(
        load_table(spark, sf_small, "events"), with_watermark=False
    )
    stream = streaming.tumbling_counts(streaming.read_events_stream(spark, sf_small))
    streaming.run_stream_to_memory(stream, "t_tumbling")
    assert _rows(spark.table("t_tumbling")) == _rows(batch)


def test_session_stream_equals_batch(spark, sf_small):
    batch = streaming.session_windows(
        load_table(spark, sf_small, "events"), with_watermark=False
    )
    stream = streaming.session_windows(streaming.read_events_stream(spark, sf_small))
    streaming.run_stream_to_memory(stream, "t_sessions")
    assert _rows(spark.table("t_sessions")) == _rows(batch)


def test_session_window_agrees_with_lag_formulation(spark, sf_small):
    """The built-in session_window and the batch lag/cumsum sessionization
    (operators/events.py) must segment identically (no gap in the fixture
    sits exactly on the 30-min boundary)."""
    from vectordb_from_scratch_spark.operators.events import events_sessionization

    lag_based = events_sessionization(spark, sf_small)
    sw = streaming.session_windows(
        load_table(spark, sf_small, "events"), with_watermark=False
    )
    a = sorted(
        (r["user_id"], r["n_events"], r["session_value"]) for r in lag_based.collect()
    )
    b = sorted((r["user_id"], r["n_events"], r["session_value"]) for r in sw.collect())
    assert a == b


def test_streaming_dedup_drops_redelivered_batches(spark, sf_small, tmp_path):
    """At-least-once redelivery: the same events file arrives as two
    micro-batches; dropDuplicatesWithinWatermark must emit each event_id
    exactly once."""
    import shutil

    src = tmp_path / "dup_src"
    src.mkdir()
    shutil.copy(f"{sf_small}/events.parquet", src / "a.parquet")
    shutil.copy(f"{sf_small}/events.parquet", src / "b.parquet")
    stream = streaming.dedup_stream(
        streaming.read_events_stream(spark, str(src), glob="*.parquet")
    )
    streaming.run_stream_to_memory(stream, "t_dedup", output_mode="append")
    got = spark.table("t_dedup")
    n_distinct = load_table(spark, sf_small, "events").select("event_id").distinct().count()
    assert got.count() == n_distinct
    assert got.select("event_id").distinct().count() == n_distinct


def test_stream_stream_join_equals_batch(spark, sf_small):
    """Stream-stream interval join (purchase attributed to prior views
    within 1 h) must produce exactly the batch join's pairs."""
    from pyspark.sql import functions as F

    batch_events = load_table(spark, sf_small, "events")
    b_views = batch_events.filter(F.col("event_type") == "view")
    b_purch = batch_events.filter(F.col("event_type") == "purchase")
    # build the batch twin through the same function: it only uses
    # DataFrame expressions, so static inputs produce a static plan
    batch = streaming.view_purchase_join_stream(b_views, b_purch)

    s = streaming.read_events_stream(spark, sf_small)
    stream = streaming.view_purchase_join_stream(
        s.filter(F.col("event_type") == "view"),
        s.filter(F.col("event_type") == "purchase"),
    )
    streaming.run_stream_to_memory(stream, "t_vp_join", output_mode="append")
    assert _rows(spark.table("t_vp_join")) == _rows(batch)


def test_streaming_hll_registers_match_batch(spark, sf_oracle):
    """Register state after draining the stream == the batch register
    table: the sketch's max-merge algebra makes streaming exact."""
    from vectordb_from_scratch_spark import streaming
    from vectordb_from_scratch_spark.operators.sketches import sketch_hll_registers

    ev_stream = streaming.read_events_stream(spark, sf_oracle)
    streaming.run_stream_to_memory(
        streaming.hll_registers_stream(ev_stream), "t_hll_stream"
    )
    got = {
        (r["bucket"], r["max_rho"]) for r in spark.table("t_hll_stream").collect()
    }
    want = {
        (r["bucket"], r["max_rho"])
        for r in sketch_hll_registers(spark, sf_oracle).collect()
    }
    assert got == want


def test_minhash_maintenance_stream_equals_batch(spark, tmp_path):
    """The r10 MinHash maintenance stream: document micro-batches folded
    through the two delta-sided band joins land on EXACTLY the pair table
    the one-shot self-join builds over the union — including a cross-batch
    near-dup pair (batch-2 doc agreeing with a batch-1 doc's bands, the
    decomposition's interesting case) and a batch contributing no pairs."""
    from pyspark.sql import functions as F

    from vectordb_from_scratch_spark.operators import dedup

    base = "the quick brown fox jumps over the lazy dog today"
    b1 = [(1, base), (2, base + " again"), (3, "completely different words here now")]
    b2 = [(10, base), (11, "nothing shares any shingle with others xyzzy")]
    b3 = [(20, base + " again"), (21, base)]
    src = tmp_path / "docs"
    src.mkdir()
    for name, rows in (("b1", b1), ("b2", b2), ("b3", b3)):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(str(src / name))
    bands, pairs = streaming.minhash_maintenance_stream(
        spark, str(src / "*"), str(tmp_path / "ckpt")
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["n_shared_bands"] for r in pairs.collect()
    }
    all_docs = spark.createDataFrame(b1 + b2 + b3, "doc_id long, text string")
    all_bands = dedup.minhash_bands(dedup.minhash_signatures(all_docs))
    want = {
        (r["doc_a"], r["doc_b"]): r["n_shared_bands"]
        for r in dedup._minhash_pair_counts(all_bands, all_bands).collect()
    }
    assert got == want
    assert (1, 10) in got and (1, 21) in got and (10, 21) in got  # cross-batch
    assert got[(1, 10)] == 4  # identical text agrees on all four bands
    # the maintained band table equals the one-shot one, row for row
    assert sorted(map(tuple, bands.collect())) == sorted(
        map(tuple, all_bands.collect())
    )


def test_streaming_countmin_counters_match_batch(spark, sf_oracle):
    """Count-Min counter state after draining the stream == the batch
    sketch: CM merge is addition, so the streaming sum IS the sketch."""
    from vectordb_from_scratch_spark import streaming
    from vectordb_from_scratch_spark.operators.sketches import (
        sketch_countmin_counters,
    )

    ev_stream = streaming.read_events_stream(spark, sf_oracle)
    streaming.run_stream_to_memory(
        streaming.countmin_counters_stream(ev_stream), "t_cm_stream"
    )
    got = {
        (r["row"], r["bucket"], r["c"])
        for r in spark.table("t_cm_stream").collect()
    }
    want = {
        (r["row"], r["bucket"], r["c"])
        for r in sketch_countmin_counters(spark, sf_oracle).collect()
    }
    assert got == want
