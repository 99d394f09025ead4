"""Relational coverage: TPC-H-style join/aggregation/window/set-op queries
over the driver tables.

The reference has almost none of this (SURVEY.md §2.3: counts only, no
joins, no windows) — these are the north-star extensions that make the
engine a real analytics system at 100 TB. Every query here is declarative
DataFrame API so Catalyst gets pushdown/pruning/join-reordering, and each
one is oracle-checked against DuckDB.

Scale notes (what survives 1000 executors):
- fact-fact joins (orders ⋈ lineitem) hash-shuffle on the join key; AQE
  coalesces/skew-splits at runtime;
- dim tables (region/nation/customer at TPC-H ratios, and always here)
  broadcast — no shuffle of the fact side;
- aggregations are partial (map-side combine) before the exchange — Spark
  does this automatically for all hash aggregates below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.registry import register
from vectordb_from_scratch_spark.session import load_table


# --- Q1-style pricing summary (pure scan + hash agg; tests partial agg) ----

_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                        AS sum_qty,
       round(sum(l_extendedprice), 2)                                   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       round(avg(l_quantity), 4)                                        AS avg_qty,
       round(avg(l_extendedprice), 4)                                   AS avg_price,
       round(avg(l_discount), 6)                                        AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("tpch_q1_pricing_summary", _Q1_SQL)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- Q3-style shipping priority (dim-filter + 3-way join + agg + top-k) ----

_Q3_SQL = """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10
"""


@register("tpch_q3_shipping_priority", _Q3_SQL)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer is the small side → broadcast; orders ⋈ lineitem shuffles on
    orderkey (the only unavoidable shuffle); top-10 is TakeOrderedAndProject."""
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


# --- Q5-style local supplier volume (5-way join through dim chain) ---------

_Q5_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


@register("tpch_q5_local_supplier", _Q5_SQL)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All dims broadcast; the fact side is touched once. Catalyst reorders
    the dim joins; the region filter prunes nation/supplier before the
    broadcast, so the big lineitem ⋈ orders shuffle is the only exchange."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


_Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 75 DAY)
GROUP BY o_orderpriority
"""


@register("tpch_q4_order_priority", _Q4_SQL)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (the driver's lineitem has no commit/receipt dates, so
    'late' = shipped >75 days after the order): EXISTS as a LEFT SEMI join
    — the same shape as the reference's ownership checks
    (vector_db.py:186-191), here over the fact tables. The date filter
    prunes orders BEFORE the semi-join; only (orderkey, shipdate) is read
    from lineitem (column pruning)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 75 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


_Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey) t
GROUP BY c_count
"""


@register("tpch_q13_customer_distribution", _Q13_SQL)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join keeping zero-order customers, then
    a two-level aggregation (count per customer → histogram of counts).
    The non-equi part of the predicate (priority filter) stays on the
    orders side so it pushes into the scan; first agg shuffles on
    c_custkey, second on the tiny c_count domain."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --- rollup / grouping sets -------------------------------------------------

_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       count(*)                  AS cnt
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register("agg_rollup", _ROLLUP_SQL)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )


_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority,
       round(sum(o_totalprice), 2) AS total,
       count(*)                    AS cnt
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@register("agg_cube", _CUBE_SQL)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.round(F.sum("o_totalprice"), 2).alias("total"),
        F.count(F.lit(1)).alias("cnt"),
    )


# --- distinct aggregation ----------------------------------------------------

_DISTINCT_SQL = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS distinct_parts,
       count(DISTINCT l_suppkey) AS distinct_supps,
       count(*)                  AS cnt
FROM lineitem
GROUP BY l_returnflag
"""


@register("agg_count_distinct", _DISTINCT_SQL)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.countDistinct("l_suppkey").alias("distinct_supps"),
        F.count(F.lit(1)).alias("cnt"),
    )


# --- window functions --------------------------------------------------------

_RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
       row_number() OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq
FROM orders
"""


@register("window_running_customer_totals", _RUNNING_SQL)
def window_running_customer_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-customer revenue — one shuffle on o_custkey, then both
    window functions share the same sort (single Window physical node)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2).alias(
            "running_total"
        ),
        F.row_number().over(w).cast("long").alias("order_seq"),
    )


_TOPN_SQL = """
WITH r AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (
             PARTITION BY o_custkey
             ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
  FROM orders)
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, rnk
FROM r WHERE rnk <= 3
"""


@register("window_topn_per_group", _TOPN_SQL)
def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — WindowGroupLimit pre-filters each
    partition to <=3 rows per key before the exchange (same mechanism the
    batch k-NN rides)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"), "rnk")
    )


_LAG_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(date_diff('day',
            lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
            o_orderdate) AS BIGINT) AS days_since_prev
FROM orders
"""


@register("window_lag_days_between_orders", _LAG_SQL)
def window_lag_days_between_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), prev).cast("long").alias("days_since_prev"),
    )


# --- set operations -----------------------------------------------------------

_SETOP_SQL = """
(SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
 INTERSECT
 SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
"""


@register("setops_intersect_except", _SETOP_SQL)
def setops_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with both open and finished orders but no pending ones —
    INTERSECT + EXCEPT (set ops the reference only has as in-memory set
    unions, lsh_simhash.py:112-116)."""
    o = load_table(spark, sf_dir, "orders")
    key = lambda st: o.filter(F.col("o_orderstatus") == st).select(  # noqa: E731
        F.col("o_custkey").alias("custkey")
    )
    return key("O").intersect(key("F")).subtract(key("P"))


_UNION_SQL = """
SELECT custkey, count(*) AS appearances FROM (
  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
  UNION ALL
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
GROUP BY custkey
"""


@register("setops_union_all", _UNION_SQL)
def setops_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    u = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey")).unionAll(
        o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    )
    return u.groupBy("custkey").agg(F.count(F.lit(1)).alias("appearances"))


# --- scalar function coverage --------------------------------------------------

_SCALAR_SQL = """
SELECT p_partkey,
       lower(p_name)                         AS lname,
       upper(p_brand)                        AS ubrand,
       length(p_type)                        AS type_len,
       substr(p_name, 1, 5)                  AS name5,
       concat(p_brand, ':', p_type)          AS brand_type,
       round(p_retailprice * 1.1, 2)         AS marked_up,
       CAST(floor(p_size / 10) AS BIGINT)    AS size_bucket,
       CASE WHEN p_size >= 25 THEN 'large' WHEN p_size >= 10 THEN 'medium'
            ELSE 'small' END                 AS size_class
FROM part
"""


@register("scalar_functions", _SCALAR_SQL)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/number scalar library (reference has only lower(), C2 —
    vector_db.py:98)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lname"),
        F.upper("p_brand").alias("ubrand"),
        F.length("p_type").cast("long").alias("type_len"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("marked_up"),
        F.floor(F.col("p_size") / 10).cast("long").alias("size_bucket"),
        F.when(F.col("p_size") >= 25, "large")
        .when(F.col("p_size") >= 10, "medium")
        .otherwise("small")
        .alias("size_class"),
    )


_Q6_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("tpch_q6_forecast_revenue", _Q6_SQL)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate — the query whose entire cost
    is how many bytes the scan reads. All four predicates push to parquet
    (min/max row-group skipping) and only 4 of 11 columns are read."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue")
    )


_Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       round(sum(volume), 2) AS revenue
FROM (SELECT n1.n_name AS supp_nation,
             n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@register("tpch_q7_volume_shipping", _Q7_SQL)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: trade volume between a nation pair by year. The
    nation table joins TWICE under different roles (supplier side /
    customer side) — the aliased-dimension pattern; both broadcast, and
    the symmetric pair filter runs post-join on broadcast columns."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


_Q10_SQL = """
SELECT c_custkey, c_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       round(c_acctbal, 2) AS c_acctbal,
       n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


@register("tpch_q10_returned_items", _Q10_SQL)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top 20 customers by returned-item revenue in a
    half-year window — fact-fact shuffle on orderkey, dims broadcast,
    global top-k as TakeOrderedAndProject (never a full sort)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
    )


_Q14_SQL = """
SELECT round(100.00 * sum(CASE WHEN p_type = 'PROMO'
                               THEN l_extendedprice * (1 - l_discount)
                               ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
"""


@register("tpch_q14_promo_effect", _Q14_SQL)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share — conditional aggregation over
    a broadcast dimension join, one month of the fact table (pushed-down
    date range)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


_PIVOT_SQL = """
SELECT user_id,
       count(*) FILTER (event_type = 'view')     ::BIGINT AS view,
       count(*) FILTER (event_type = 'click')    ::BIGINT AS click,
       count(*) FILTER (event_type = 'purchase') ::BIGINT AS purchase,
       count(*) FILTER (event_type = 'signup')   ::BIGINT AS signup,
       count(*) FILTER (event_type = 'error')    ::BIGINT AS error
FROM events GROUP BY user_id
"""


@register("pivot_events_by_type", _PIVOT_SQL)
def pivot_events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: long→wide on event_type with an explicit value list (never
    let pivot infer values at scale — that is an extra distinct scan).
    Compiles to one hash aggregate with conditional counts, exactly the
    oracle's FILTER formulation."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .pivot("event_type", ["view", "click", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


_FRAMES_SQL = """
WITH o AS (SELECT *, CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
SELECT o_orderkey, o_custkey,
       sum(cents) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)          AS rolling3_cents,
       sum(cents) OVER (PARTITION BY o_custkey)                           AS cust_total_cents,
       count(*) OVER (PARTITION BY o_custkey)                              AS n_orders,
       ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS quartile,
       round(percent_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey), 6) AS pct_rank
FROM o
"""


@register("window_frames", _FRAMES_SQL)
def window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-frame variety on one pass: a rolling 3-row sum (bounded ROWS
    frame), a whole-partition average (unbounded frame), ntile and
    percent_rank (rank family). All share the same partitioning, so
    Catalyst computes them in a single Window over one shuffle.

    Money flows through exact integer cents, and the partition average
    is emitted as (total_cents, n) rather than a rounded quotient:
    2dp-price averages land exactly on rounding midpoints often enough
    that Spark's BigDecimal HALF_UP and DuckDB's double rounding flip
    ~0.2% of rows in opposite directions — integers cannot disagree."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "cents", F.round(F.col("o_totalprice") * 100).cast("long")
    )
    by_cust = Window.partitionBy("o_custkey")
    by_date = by_cust.orderBy("o_orderdate", "o_orderkey")
    by_price = by_cust.orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum("cents").over(by_date.rowsBetween(-2, 0)).alias("rolling3_cents"),
        F.sum("cents").over(by_cust).alias("cust_total_cents"),
        F.count(F.lit(1)).over(by_cust).alias("n_orders"),
        F.ntile(4).over(by_price).alias("quartile"),
        F.round(F.percent_rank().over(by_price), 6).alias("pct_rank"),
    )


_CORR_SQL = """
SELECT o.o_orderkey, o.o_custkey, round(o.o_totalprice, 2) AS o_totalprice
FROM orders o
WHERE o.o_totalprice > 1.5 * (SELECT avg(o2.o_totalprice) FROM orders o2
                              WHERE o2.o_custkey = o.o_custkey)
"""


@register("subquery_above_customer_avg", _CORR_SQL)
def subquery_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — orders 50% above their own customer's
    average — written as the decorrelated plan Catalyst would produce
    anyway (groupBy avg + equi-join back): one aggregation + one join on
    the correlation key, never a per-row subquery execution."""
    o = load_table(spark, sf_dir, "orders")
    avgs = o.groupBy(F.col("o_custkey").alias("_ck")).agg(
        F.avg("o_totalprice").alias("_avg")
    )
    return (
        o.join(avgs, o.o_custkey == F.col("_ck"))
        .filter(F.col("o_totalprice") > 1.5 * F.col("_avg"))
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )
