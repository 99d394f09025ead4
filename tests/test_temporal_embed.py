"""Unit tests for the temporal joins (as-of, banded range) and the V18
embed plumbing — semantics pinned on tiny hand-built frames (the oracle
parity suite covers the fixture-scale runs)."""

from __future__ import annotations

import numpy as np

from vectordb_from_scratch_spark.functions.embedder import embed_texts
from vectordb_from_scratch_spark.operators.temporal import asof_join, range_pair_stats


def test_asof_join_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 205, "b"), (2, 50, "c"), (3, 10, "d")],
        "k long, t long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 100, "r100"), (1, 200, "r200"), (1, 300, "r300"), (2, 60, "r60")],
        "k long, t long, payload string",
    )
    res = {
        r["tag"]: r["right_payload"]
        for r in asof_join(
            left, right, key="k", left_ts="t", right_ts="t", right_cols=["payload"]
        ).collect()
    }
    assert res["a"] == "r100"  # exact-tie matches (inclusive <=, DuckDB ASOF parity)
    assert res["b"] == "r200"  # most recent prior, not a later one
    assert res["c"] is None  # right exists but only later -> no match
    assert res["d"] is None  # key with no right rows at all


def test_range_pair_stats_banded_exactly_once(spark):
    # width 100: pairs (10,50) g40, (10,109) g99, (50,109) g59, (109,200) g91
    # twice (two events at 200), (200,200') g0 via id tie-break; (10,200)
    # g190 excluded.
    events = spark.createDataFrame(
        [(1, 1, 10), (1, 2, 50), (1, 3, 109), (1, 4, 200), (1, 5, 200), (2, 6, 0)],
        "user_id long, event_id long, us long",
    )
    from pyspark.sql import functions as F

    ev = events.withColumn("ts", F.timestamp_micros("us")).drop("us")
    rows = {r["user_id"]: r for r in range_pair_stats(ev, width_us=100).collect()}
    assert rows[1]["n_pairs"] == 6
    assert rows[1]["total_gap_us"] == 40 + 99 + 59 + 91 + 91 + 0
    assert 2 not in rows  # singleton user: no pairs -> no row


def test_embed_texts_batching_and_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta beta"), (2, " "), (3, "alpha beta beta"), (4, "gamma")],
        "id long, text string",
    )
    out = {
        r["id"]: np.array(r["embedding"])
        for r in embed_texts(df, dims=8, max_texts_per_call=2).collect()
    }
    assert np.allclose(out[1], out[3])  # deterministic across provider calls
    assert abs(np.linalg.norm(out[1]) - 1.0) < 1e-9  # unit-normalized
    assert np.all(out[2] == 0.0)  # zero vector left unnormalized (indexing.py:16-22)
    assert len(out[4]) == 8
