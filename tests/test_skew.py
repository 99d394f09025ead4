"""Salted aggregation/join exactness: the skew-safe plans must return
byte-identical results to the plain ones (salting redistributes work,
never changes semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectordb_from_scratch_spark.operators.skew import salted_agg, salted_join
from vectordb_from_scratch_spark.session import load_table


def _sorted(df):
    return sorted(map(tuple, df.collect()))


def test_salted_agg_equals_plain(spark, sf_small):
    e = load_table(spark, sf_small, "events")
    salted = salted_agg(
        e,
        keys=["event_type"],
        partial_aggs=[F.count(F.lit(1)).alias("_n"), F.max("value").alias("_max")],
        final_aggs=[F.sum("_n").alias("n"), F.max("_max").alias("mx")],
    )
    plain = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.max("value").alias("mx")
    )
    assert _sorted(salted) == _sorted(plain)


def test_salted_join_equals_plain(spark, sf_small):
    li = load_table(spark, sf_small, "lineitem").select("l_orderkey", "l_quantity")
    # rename to share the join key name
    orders = load_table(spark, sf_small, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    salted = salted_join(li, orders, key="l_orderkey", n_salts=8)
    plain = li.join(orders, "l_orderkey")
    assert salted.count() == plain.count()
    agg_s = salted.groupBy("o_orderpriority").agg(F.round(F.sum("l_quantity"), 2).alias("q"))
    agg_p = plain.groupBy("o_orderpriority").agg(F.round(F.sum("l_quantity"), 2).alias("q"))
    assert _sorted(agg_s) == _sorted(agg_p)


def test_salted_join_left_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "a"), (2, "b"), (99, "z")], "k long, v string")
    small = spark.createDataFrame([(1, "x"), (2, "y")], "k long, w string")
    out = salted_join(big, small, key="k", n_salts=4, how="left")
    rows = {r["k"]: r["w"] for r in out.collect()}
    assert rows == {1: "x", 2: "y", 99: None}


def test_connected_components_hand_graph(spark):
    """Two components incl. a 4-node chain (propagation must cross
    multiple hops) and an isolated pair."""
    from vectordb_from_scratch_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (9, 8)], "doc_a long, doc_b long"
    )
    labels = {r["node"]: r["label"] for r in connected_components(edges).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 8: 8, 9: 8}
