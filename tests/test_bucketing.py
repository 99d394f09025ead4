"""Bucketed co-located joins: writing both sides bucketed by the join key
removes the shuffle from every subsequent join — the layout decision that
matters most for a fact table joined daily at 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_from_scratch_spark import plans
from vectordb_from_scratch_spark.session import load_table


@pytest.fixture(scope="module")
def warehouse(spark, sf_small):
    """Two tables bucketed by the join key into the session warehouse."""
    import shutil

    li = load_table(spark, sf_small, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_small, "orders").select("o_orderkey", "o_totalprice")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_lineitem", "b_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # the session-local catalog forgets tables between runs but their
        # warehouse directories persist; clear them or saveAsTable refuses
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable("b_lineitem")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable("b_orders")
    yield spark


def test_bucketed_join_has_no_shuffle(warehouse):
    spark = warehouse
    # disable broadcast so the join shape itself is under test
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        p = plans.physical_plan(j)
        assert "SortMergeJoin" in p
        # both sides are pre-bucketed on the key: zero exchanges
        assert plans.n_shuffles(j) == 0, p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_bucketed_join_matches_plain_join(warehouse, sf_small):
    spark = warehouse
    bucketed = spark.table("b_lineitem").join(
        spark.table("b_orders"), F.col("l_orderkey") == F.col("o_orderkey")
    )
    li = load_table(spark, sf_small, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_small, "orders").select("o_orderkey", "o_totalprice")
    plain = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    assert bucketed.count() == plain.count()
    a = bucketed.agg(F.round(F.sum("l_quantity"), 2), F.round(F.sum("o_totalprice"), 2)).first()
    b = plain.agg(F.round(F.sum("l_quantity"), 2), F.round(F.sum("o_totalprice"), 2)).first()
    assert tuple(a) == tuple(b)
