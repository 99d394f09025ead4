"""Bucketed co-located joins: writing both sides bucketed by the join key
removes the shuffle from every subsequent join — the layout decision that
matters most for a fact table joined daily at 100 TB. Exercises the
production surface (sources.write_bucketed / register_bucketed via
operators.bucketed.ensure_bucketed), not ad-hoc writes."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from vectordb_from_scratch_spark import plans
from vectordb_from_scratch_spark.operators import bucketed
from vectordb_from_scratch_spark.session import load_table


@pytest.fixture(scope="module")
def btables(spark, sf_small):
    """The production bucketed join sides for the small fixture dir."""
    return bucketed.ensure_bucketed(spark, sf_small)


def test_one_file_per_bucket(btables):
    """repartition-before-bucketBy must yield exactly n_buckets files —
    the small-files guard that makes the layout viable at scale."""
    for tbl in btables.values():
        d = os.path.join(bucketed._WAREHOUSE, tbl)
        parts = [f for f in os.listdir(d) if f.startswith("part-")]
        assert len(parts) == bucketed.N_BUCKETS, (tbl, len(parts))


def test_bucketed_join_has_no_shuffle(spark, btables):
    # disable broadcast so the join shape itself is under test
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table(btables["lineitem"]).join(
            spark.table(btables["orders"]),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        p = plans.physical_plan(j)
        assert "SortMergeJoin" in p
        assert "Bucketed: true" in p
        # both sides are pre-bucketed on the key: zero exchanges
        assert plans.n_shuffles(j) == 0, p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_ensure_is_idempotent_no_rewrite(spark, sf_small, btables):
    """A second ensure in the same process (cache hit) and a
    catalog-cleared ensure (DDL re-attach path) must both leave the data
    files untouched."""
    mtimes = lambda: {  # noqa: E731
        f: os.path.getmtime(f)
        for tbl in btables.values()
        for f in glob.glob(os.path.join(bucketed._WAREHOUSE, tbl, "part-*"))
    }
    before = mtimes()
    assert bucketed.ensure_bucketed(spark, sf_small) == btables  # cache hit
    # simulate a fresh session: catalog forgets, process cache cleared
    # (the cache key embeds the source fingerprint, so clear by value)
    saved = {k: v for k, v in bucketed._TABLES_CACHE.items() if v == btables}
    for k in saved:
        bucketed._TABLES_CACHE.pop(k)
    for tbl in btables.values():
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    try:
        again = bucketed.ensure_bucketed(spark, sf_small)
        assert again == btables
        assert spark.table(again["orders"]).count() > 0
        assert mtimes() == before, "re-attach must not rewrite data files"
    finally:
        # leave the module fixture state intact for other tests
        bucketed._TABLES_CACHE.update(saved)


def test_bucketed_join_matches_plain_join(spark, btables, sf_small):
    b = spark.table(btables["lineitem"]).join(
        spark.table(btables["orders"]), F.col("l_orderkey") == F.col("o_orderkey")
    )
    li = load_table(spark, sf_small, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_small, "orders").select("o_orderkey", "o_orderpriority")
    plain = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    assert b.count() == plain.count()
    a = b.agg(F.round(F.sum("l_quantity"), 2).alias("q")).first()["q"]
    e = plain.agg(F.round(F.sum("l_quantity"), 2).alias("q")).first()["q"]
    assert a == e
