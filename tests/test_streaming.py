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
