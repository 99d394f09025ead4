"""Raw-SQL API surface: the engine consumed through ``spark.sql`` over
registered views, not the DataFrame builders.

A user migrating from the reference (or from any warehouse) often holds
SQL text, not code. These queries register the driver tables as temp
views and execute ANSI SQL strings end-to-end — proving the whole
Catalyst surface (joins, aggregates, windows, pushdown) is reachable
without touching the Python DataFrame API. The DuckDB oracle runs the
dialect-equivalent text, so the check is SQL-in == SQL-out across
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from vectordb_from_scratch_spark.registry import register
from vectordb_from_scratch_spark.session import load_table


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


_REV_SPARK = """
SELECT o.o_orderpriority,
       count(*) AS n_orders,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderdate >= DATE'1995-01-01'
GROUP BY o.o_orderpriority
"""

_REV_ORACLE = """
SELECT o.o_orderpriority,
       count(*)::BIGINT AS n_orders,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderdate >= DATE '1995-01-01'
GROUP BY o.o_orderpriority
"""


@register("sql_api_revenue_by_priority", _REV_ORACLE)
def sql_api_revenue_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by order priority, submitted as SQL TEXT via spark.sql —
    the same string a warehouse user would run. Catalyst still pushes the
    date filter to the orders scan and broadcasts the small side; the
    plan is identical whether it arrives as SQL text or DataFrame
    calls."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_REV_SPARK)


_TOPC_TEXT = """
SELECT c_mktsegment, c_name, total, rk FROM (
  SELECT c.c_mktsegment, c.c_name, t.total, c.c_custkey,
         rank() OVER (PARTITION BY c.c_mktsegment
                      ORDER BY t.total DESC, c.c_custkey) AS rk
  FROM (
    SELECT o_custkey, round(sum(o_totalprice), 2) AS total
    FROM orders GROUP BY o_custkey
  ) t JOIN customer c ON c.c_custkey = t.o_custkey
) WHERE rk <= 3
"""


@register("sql_api_top_customers_window", _TOPC_TEXT)
def sql_api_top_customers_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers per market segment — aggregate-subquery + rank
    window + window filter, submitted as raw text. The SAME string runs
    on both engines (the portable nested-window form; OSS Spark has no
    QUALIFY). The rank window runs over the pre-aggregated per-customer
    totals, so the window input is |customers|, not |orders|, and the
    rk<=3 filter compiles to WindowGroupLimit map-side pruning."""
    _views(spark, sf_dir, "orders", "customer")
    return spark.sql(_TOPC_TEXT)
