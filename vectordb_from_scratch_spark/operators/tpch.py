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


# --- Q1 decimal lane: exact DECIMAL money arithmetic, cross-engine ---------
#
# The double-based queries keep floats honest by rounding; this variant
# retires the float class entirely for money: every factor is cast to
# DECIMAL(18,2), products stay exact (2dp × 2dp × 2dp = 6dp), sums are
# exact decimal aggregation on both engines. The FINAL outputs are
# fixed-scale decimals rendered as STRINGS: a decimal output column would
# survive Spark but DuckDB's pandas conversion canonicalizes DECIMAL to
# float64 (exactly the HUGEINT bug class from round 2), while the string
# rendering of a fixed-scale decimal is engine-independent and pins both
# the value AND the scale ('453925196.125575' must match to the digit).

_Q1_DECIMAL_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS VARCHAR) AS sum_qty,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS VARCHAR) AS sum_base_price,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
       AS DECIMAL(28,4)) AS VARCHAR) AS sum_disc_price,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
               * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2))))
       AS DECIMAL(28,6)) AS VARCHAR) AS sum_charge,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("tpch_q1_decimal", _Q1_DECIMAL_SQL)
def q1_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    d = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    one = F.lit(1).cast("decimal(18,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(d("l_quantity")).cast("decimal(28,2)").cast("string").alias("sum_qty"),
            F.sum(d("l_extendedprice"))
            .cast("decimal(28,2)")
            .cast("string")
            .alias("sum_base_price"),
            F.sum(d("l_extendedprice") * (one - d("l_discount")))
            .cast("decimal(28,4)")
            .cast("string")
            .alias("sum_disc_price"),
            F.sum(
                d("l_extendedprice") * (one - d("l_discount")) * (one + d("l_tax"))
            )
            .cast("decimal(28,6)")
            .cast("string")
            .alias("sum_charge"),
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


_GSETS_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)      AS sum_qty,
       count(*)                       AS cnt,
       grouping(l_returnflag)::BIGINT AS g_rf,
       grouping(l_linestatus)::BIGINT AS g_ls
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
"""


@register("agg_grouping_sets", _GSETS_SQL)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary (non-hierarchical) GROUPING SETS — the general form rollup
    and cube are shorthands for. One Expand node replicates each input row
    once per set before a single hash aggregate: one scan, one shuffle for
    all three groupings. grouping() flags disambiguate NULL-as-total from
    NULL-in-data."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"], ["l_returnflag", "l_linestatus"]],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
        F.grouping("l_returnflag").cast("long").alias("g_rf"),
        F.grouping("l_linestatus").cast("long").alias("g_ls"),
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
       (sum(cents) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))::BIGINT AS rolling3_cents,
       (sum(cents) OVER (PARTITION BY o_custkey))::BIGINT                 AS cust_total_cents,
       count(*) OVER (PARTITION BY o_custkey)                              AS n_orders,
       ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS quartile,
       rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS price_rank
FROM o
"""


@register("window_frames", _FRAMES_SQL)
def window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-frame variety on one pass: a rolling 3-row sum (bounded ROWS
    frame), a whole-partition average (unbounded frame), ntile and
    percent_rank (rank family). All share the same partitioning, so
    Catalyst computes them in a single Window over one shuffle.

    Money flows through exact integer cents, and the rank family is
    emitted as exact integers too: (price_rank, n_orders) determine
    percent_rank = (rank-1)/(n-1) exactly, whereas a round()ed double
    quotient lands on rounding midpoints often enough that Spark's
    BigDecimal HALF_UP and DuckDB's double rounding flip rows in
    opposite directions — integers cannot disagree."""
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
        F.rank().over(by_price).cast("long").alias("price_rank"),
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


# --- Q8-style national market share --------------------------------------
# Adapted to the driver schema: no p_container/partsupp, so the part filter
# is p_type = 'PROMO'; share of ASIA-region PROMO revenue supplied by
# NATION_5, by order year.

_Q8_SQL = """
SELECT year(o_orderdate)::INT AS o_year,
       round(sum(CASE WHEN n2.n_name = 'NATION_5'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = c_nationkey
JOIN region   ON r_regionkey = n1.n_regionkey
JOIN nation n2 ON n2.n_nationkey = s_nationkey
WHERE r_name = 'ASIA' AND p_type = 'PROMO'
GROUP BY o_year
"""


@register("tpch_q8_market_share", _Q8_SQL)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: one fact-fact shuffle (lineitem ⋈ orders on orderkey);
    every other side — part, supplier, customer, nation twice, region — is
    a broadcast, so the 8-way join costs the same shuffle count as a
    2-way. The conditional-sum ratio avoids a second aggregation pass."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.alias("n1")
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_nationkey"), F.col("n_name").alias("n2_name")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(region), F.col("n1.n_regionkey") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2_nationkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("n2_name") == "NATION_5", rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                6,
            ).alias("mkt_share")
        )
    )


# --- Q9-style product-type profit ------------------------------------------
# No partsupp table, so supply cost is modeled as 60% of p_retailprice —
# the join/agg shape (parts by name pattern, profit by supplier nation and
# order year) is what matters.

_Q9_SQL = """
SELECT n_name AS nation, year(o_orderdate)::INT AS o_year,
       round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT))
                 - 60 * CAST(round(p_retailprice * 100) AS BIGINT)
                      * CAST(l_quantity AS BIGINT)) / 10000.0, 2) AS sum_profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE p_name LIKE '%gear%'
GROUP BY n_name, o_year
"""


@register("tpch_q9_product_type_profit", _Q9_SQL)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: LIKE-filtered part dim broadcast into the fact, profit
    expression evaluated rowwise inside codegen, grouped on a low-cardinality
    (nation, year) pair — partial aggregation collapses almost everything
    map-side before the single exchange. Money flows through exact integer
    fixed-point (see inline note)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    # exact fixed-point money: prices/discounts are 2dp decimals stored as
    # doubles, so round(x*100) recovers exact integer cents and the profit
    # sums in units of 1e-4 dollars as BIGINT — a double sum here lands on
    # rounding midpoints often enough to flip the 2dp output by a cent
    # between engines.
    cents = lambda c: F.round(F.col(c) * 100).cast("long")  # noqa: E731
    profit = cents("l_extendedprice") * (100 - cents("l_discount")) - 60 * cents(
        "p_retailprice"
    ) * F.col("l_quantity").cast("long")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(profit) / 10000.0, 2).alias("sum_profit"))
    )


# --- Q11-style important parts (HAVING against a global scalar) ------------

_Q11_SQL = """
WITH v AS (
  SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS value
  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
                JOIN nation   ON n_nationkey = s_nationkey
  WHERE n_name IN ('NATION_3', 'NATION_7')
  GROUP BY l_partkey)
SELECT l_partkey, round(value, 2) AS value
FROM v
WHERE value > (SELECT sum(value) * 0.001 FROM v)
"""


@register("tpch_q11_important_parts", _Q11_SQL)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: group-by HAVING against a global scalar aggregate. The
    per-part values are computed once and reused for both the threshold and
    the filter (cached single-row threshold broadcast into the filter join) —
    never two scans of the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    v = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("value"))
    )
    threshold = v.agg((F.sum("value") * 0.001).alias("_thr"))
    return (
        v.join(F.broadcast(threshold))
        .filter(F.col("value") > F.col("_thr"))
        .select("l_partkey", F.round("value", 2).alias("value"))
    )


# --- Q15-style top supplier (argmax against a derived aggregate) ------------

_Q15_SQL = """
WITH r AS (
  SELECT l_suppkey, CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100)
                         AS BIGINT) AS rev_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, round(rev_cents / 100.0, 2) AS total_revenue
FROM r JOIN supplier ON s_suppkey = l_suppkey
WHERE rev_cents = (SELECT max(rev_cents) FROM r)
"""


@register("tpch_q15_top_supplier", _Q15_SQL)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: supplier(s) achieving the max quarterly revenue. The
    winner comparison runs on integer cents — selecting an argmax via
    float equality is exactly where cross-engine double summation order
    would flip the answer."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    r = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100)
        .cast("long")
        .alias("rev_cents")
    )
    best = r.agg(F.max("rev_cents").alias("_best"))
    return (
        r.join(F.broadcast(best), F.col("rev_cents") == F.col("_best"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("rev_cents") / 100.0, 2).alias("total_revenue"),
        )
    )


# --- Q17-style small-quantity revenue (decorrelated per-part average) -------

_Q17_SQL = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23' AND p_size <= 10
  AND l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = lineitem.l_partkey)
"""


@register("tpch_q17_small_qty_revenue", _Q17_SQL)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: correlated per-part average decorrelated into a groupBy
    over ONLY the brand's parts — the semi-join-first ordering matters at
    scale: averaging all 200M parts' lineitems to then keep 0.1% of them
    wastes 99.9% of the aggregation, so the part filter is applied before
    the per-part aggregate, not after."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_size") <= 10)
    )
    li = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(part.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey")
    )
    avgs = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (0.5 * F.avg("l_quantity")).alias("_half_avg")
    )
    return (
        li.join(F.broadcast(avgs), F.col("l_partkey") == F.col("_pk"))
        .filter(F.col("l_quantity") < F.col("_half_avg"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# --- Q18-style large-volume customers --------------------------------------

_Q18_SQL = """
SELECT c_name, o_orderkey, o_orderdate, round(o_totalprice, 2) AS o_totalprice,
       round(sum(l_quantity), 2) AS sum_qty
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice
HAVING sum(l_quantity) > 250
"""


@register("tpch_q18_large_volume_customer", _Q18_SQL)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: aggregate the fact FIRST (sum qty per order, having >
    threshold — ~1% of orders survive), then join the small survivor set to
    orders/customer. Joining before aggregating would shuffle the full
    lineitem against orders for rows that are about to be discarded."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "sum_qty",
        )
    )


# --- Q19-style disjunctive predicate revenue --------------------------------

_Q19_SQL = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


@register("tpch_q19_discounted_revenue", _Q19_SQL)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: OR-of-ANDs spanning both join sides. The part-only
    disjunction (any of the three brand/size arms) is pre-applied to the
    dim before broadcast — Catalyst derives this common-factor pushdown
    itself, but stating it keeps the broadcast minimal and the intent
    explicit; the mixed part+lineitem residual stays as the join filter."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15))
    )
    arm = lambda brand, lo, hi, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(lo, hi)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(
            arm("Brand#12", 1, 5, 1, 11)
            | arm("Brand#23", 1, 10, 10, 20)
            | arm("Brand#34", 1, 15, 20, 30)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


# --- Q21-style suppliers who shipped last on shared orders ------------------
# The driver schema has no commit/receipt dates, so "kept the order
# waiting" is recast on l_shipdate: for finished ('F') orders with >= 2
# distinct suppliers, the unique supplier whose latest line shipped
# strictly after every other supplier's lines delayed the order.

_Q21_SQL = """
WITH sl AS (
  SELECT l_orderkey, l_suppkey, max(l_shipdate) AS s_last
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey, l_suppkey),
w AS (
  SELECT *,
         count(*)    OVER (PARTITION BY l_orderkey) AS n_supp,
         max(s_last) OVER (PARTITION BY l_orderkey) AS o_last
  FROM sl),
lone AS (
  SELECT l_orderkey, l_suppkey
  FROM (SELECT *, count(*) FILTER (s_last = o_last)
                    OVER (PARTITION BY l_orderkey) AS n_at_max
        FROM w)
  WHERE n_supp >= 2 AND n_at_max = 1 AND s_last = o_last)
SELECT s_name, count(*)::BIGINT AS numwait
FROM lone JOIN supplier ON s_suppkey = l_suppkey
GROUP BY s_name
"""


@register("tpch_q21_waiting_supplier", _Q21_SQL)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape (EXISTS + NOT EXISTS over self-joined lineitem) computed
    without any self-join: one aggregation to per-(order, supplier) latest
    ship date, then two window functions over the same order partitioning.
    The explicit repartition on l_orderkey makes the aggregation AND both
    windows share a single exchange: hash(l_orderkey) satisfies the
    clustered distribution of the (l_orderkey, l_suppkey) groupBy and of
    the window partitioning, where the default plan would shuffle twice —
    once on the grouping pair, again on the window key. (Partial map-side
    combine is lost, but at ~1 line per (order, supplier) it reduced
    nothing.) The textbook formulation self-joins lineitem twice; this is
    the plan the decorrelation should reach."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = load_table(spark, sf_dir, "supplier")
    sl = (
        li.join(orders.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"))
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("s_last"))
    )
    by_order = Window.partitionBy("l_orderkey")
    w = sl.select(
        "*",
        F.count(F.lit(1)).over(by_order).alias("n_supp"),
        F.max("s_last").over(by_order).alias("o_last"),
    ).withColumn(
        "n_at_max",
        F.sum(F.when(F.col("s_last") == F.col("o_last"), 1).otherwise(0)).over(by_order),
    )
    lone = w.filter(
        (F.col("n_supp") >= 2) & (F.col("n_at_max") == 1) & (F.col("s_last") == F.col("o_last"))
    )
    return (
        lone.join(F.broadcast(supp), lone.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# --- Q22-style global sales opportunity -------------------------------------
# No c_phone column: the country-code membership test becomes a nationkey
# set. Every customer in the driver data has at least one order, so the
# "never ordered" test becomes "no order in the last year" — same
# scalar-subquery threshold + NOT EXISTS anti-join shape, non-empty result.

_Q22_SQL = """
WITH pool AS (
  SELECT * FROM customer WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)),
thr AS (SELECT avg(c_acctbal) AS a FROM pool WHERE c_acctbal > 0.0)
SELECT c_nationkey, count(*)::BIGINT AS numcust, round(sum(c_acctbal), 2) AS totacctbal
FROM pool, thr
WHERE c_acctbal > a
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-07-01 00:00:00')
GROUP BY c_nationkey
"""


@register("tpch_q22_global_sales_opportunity", _Q22_SQL)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: scalar-aggregate threshold (broadcast single row) + NOT
    EXISTS against orders. A naive left-anti of customers vs orders must
    either broadcast a year of orders (driver OOM at scale) or shuffle
    both sides; instead the fact table is streamed ONCE through a
    broadcast semi join against the tiny rich-customer key set, reducing
    it to at-most-|rich| distinct custkeys, and the anti join then runs
    against that small set as a broadcast. Both joins broadcast the small
    side; orders is never shuffled or broadcast."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13)
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-07-01 00:00:00").cast("timestamp")
    )
    thr = cust.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("_a"))
    rich = cust.join(F.broadcast(thr)).filter(F.col("c_acctbal") > F.col("_a"))
    active_keys = (
        orders.select("o_custkey")
        .join(F.broadcast(rich.select("c_custkey")), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .distinct()
    )
    no_orders = rich.join(
        F.broadcast(active_keys), rich.c_custkey == F.col("o_custkey"), "left_anti"
    )
    return no_orders.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
    )


# --- Q2-style minimum-cost supplier (correlated min over regional domain) ---

_Q2_SQL = """
WITH eligible AS (
  SELECT l.l_partkey, l.l_suppkey,
         CAST(round(l.l_extendedprice * 100) AS BIGINT) AS price_cents
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
             AND p.p_type = 'LARGE' AND p.p_size <= 10
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_regionkey = 3),
cost AS (
  SELECT l_partkey, l_suppkey, min(price_cents) AS cost_cents
  FROM eligible GROUP BY l_partkey, l_suppkey),
best AS (
  SELECT *, min(cost_cents) OVER (PARTITION BY l_partkey) AS best_cents
  FROM cost)
SELECT p_partkey, p_name, s_name, n_name,
       round(cost_cents / 100.0, 2) AS best_price
FROM best
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE cost_cents = best_cents
"""


@register("tpch_q2_min_cost_supplier", _Q2_SQL)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape adapted to this schema (no partsupp table — offered price
    becomes the cheapest observed lineitem price): for each qualifying part,
    the supplier(s) in one region offering the minimum price. The classic
    correlated subquery `price = (SELECT min(...) WHERE ps_partkey =
    p_partkey AND <region>)` is decorrelated into a window min over the
    SAME filtered domain — one pass, no rejoin of the subquery.

    Scale shape: part/supplier/nation filters broadcast into the lineitem
    scan (semi-join pruning before the agg); the groupBy shuffles AFTER
    map-side combine on (partkey, suppkey), and the window's re-shuffle to
    partkey-only runs over already-aggregated rows (|parts|x|suppliers|),
    so the only full-size shuffle input is combiner output. Price comparison
    runs on integer cents — float min-equality is where cross-engine
    summation order flips answers. Reference has no joins at all
    (SURVEY §2.3); this is north-star relational coverage."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 10)
    )
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 3)
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    eligible = (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp.select("s_suppkey")), li.l_suppkey == F.col("s_suppkey"))
        .select(
            "l_partkey",
            "l_suppkey",
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_cents"),
        )
    )
    cost = eligible.groupBy("l_partkey", "l_suppkey").agg(
        F.min("price_cents").alias("cost_cents")
    )
    best = cost.withColumn(
        "best_cents", F.min("cost_cents").over(Window.partitionBy("l_partkey"))
    ).filter(F.col("cost_cents") == F.col("best_cents"))
    return (
        best.join(F.broadcast(part), best.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), best.l_suppkey == supp.s_suppkey)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            F.round(F.col("cost_cents") / 100.0, 2).alias("best_price"),
        )
    )


# --- Q12-style priority counts (conditional aggregation over fact join) -----

_Q12_SQL = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
GROUP BY l_returnflag
"""


@register("tpch_q12_priority_shipping", _Q12_SQL)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape adapted (no l_shipmode column — group by l_returnflag):
    high- vs low-priority line counts via CASE-WHEN conditional sums over
    an orders ⋈ lineitem join. Only (o_orderkey, o_orderpriority) is read
    from orders — column pruning keeps the shuffled build side narrow;
    the year filter pushes into the lineitem scan. One join shuffle on
    orderkey + one tiny agg shuffle; both AQE-coalesced."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


# --- Q16-style supplier variety (count distinct + NOT IN anti-join) ---------

_Q16_SQL = """
SELECT p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#45'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_type, p_size
"""


@register("tpch_q16_supplier_variety", _Q16_SQL)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape adapted (no partsupp / no comment column — supplier
    exclusion keys on negative account balance): distinct-supplier counts
    per part descriptor, excluding a blacklist via NOT IN. The blacklist
    is a handful of keys → broadcast LEFT ANTI against the fact table
    (s_suppkey is non-null, so NOT IN == anti-join without the null
    trap). count(DISTINCT) runs as Spark's two-phase Expand+agg — partial
    per partition, no full-row shuffle of lineitem."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# --- Q20-style excess shipments (nested IN → semi-join chain) ---------------

_Q20_SQL = """
WITH heavy AS (
  SELECT l_suppkey
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'red%'
  GROUP BY l_suppkey, l_partkey
  HAVING sum(l_quantity) > 80)
SELECT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON n_nationkey = s_nationkey
WHERE s_suppkey IN (SELECT l_suppkey FROM heavy)
"""


@register("tpch_q20_excess_shipments", _Q20_SQL)
def q20_excess_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape adapted (no partsupp — "excess stock" becomes heavy
    shipped quantity): suppliers who moved > 80 units of any red part.
    The nested `IN (GROUP BY ... HAVING)` subquery becomes: prune
    lineitem by a broadcast of red part keys, aggregate on
    (suppkey, partkey), filter, then LEFT SEMI from supplier against the
    resulting key set. The fact table is touched once; supplier — the
    outer side — never shuffles (semi-join build side is tiny after
    HAVING)."""
    red = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    heavy = (
        li.join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 80)
        .select("l_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        supp.join(F.broadcast(heavy), supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )


# --- window: first/last/nth value over a full frame ------------------------------

_FLN_SQL = """
WITH o AS (SELECT *, CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
SELECT o_orderkey, o_custkey,
       first_value(cents) OVER w AS first_cents,
       last_value(cents)  OVER w AS last_cents,
       nth_value(cents, 2) OVER w AS second_cents,
       lead(cents, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_cents
FROM o
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


@register("window_first_last_nth", _FLN_SQL)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The value-navigation window family (first_value / last_value /
    nth_value over an explicit full frame, plus lead) — the one window
    group not yet covered by the running/topn/lag/frames queries. All
    four share one (o_custkey, date-ordered) window, so Catalyst computes
    them in a single Window over one exchange; values ride as exact
    integer cents. last_value/nth_value REQUIRE the unbounded-following
    frame — the default frame stops at CURRENT ROW and silently yields
    the running last, a classic semantics trap pinned here on both
    engines."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "cents", F.round(F.col("o_totalprice") * 100).cast("long")
    )
    base = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    full = base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("cents").over(full).alias("first_cents"),
        F.last("cents").over(full).alias("last_cents"),
        F.nth_value("cents", 2).over(full).alias("second_cents"),
        F.lead("cents", 1).over(base).alias("next_cents"),
    )


# --- full outer join: period-over-period reconciliation --------------------------

_FOJ_SQL = """
WITH y94 AS (SELECT o_custkey, sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents_1994
             FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1994 GROUP BY o_custkey),
y95 AS (SELECT o_custkey, sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents_1995
        FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995 GROUP BY o_custkey)
SELECT coalesce(y94.o_custkey, y95.o_custkey) AS custkey,
       coalesce(cents_1994, 0)::BIGINT AS cents_1994,
       coalesce(cents_1995, 0)::BIGINT AS cents_1995,
       CASE WHEN y94.o_custkey IS NULL THEN '1995_only'
            WHEN y95.o_custkey IS NULL THEN '1994_only'
            ELSE 'both' END AS status
FROM y94 FULL OUTER JOIN y95 ON y94.o_custkey = y95.o_custkey
"""


@register("join_full_outer_reconcile", _FOJ_SQL)
def join_full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period reconciliation via FULL OUTER join — the one
    classic join type the q1-q22 suite never exercises (customers active
    in either year, with null-materialized absences classified). Both
    sides aggregate BEFORE the join (aggregate-then-join, same discipline
    as q18), so the full outer joins two small per-customer tables, never
    fact rows; money is exact integer cents. Note a full outer join
    cannot broadcast either side (both sides must see unmatched rows) —
    Catalyst correctly plans a shuffle join here, asserted nowhere else
    in the suite."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")

    def year_totals(year: int, out: str) -> DataFrame:
        return (
            o.filter(F.year("o_orderdate") == year)
            .groupBy("o_custkey")
            .agg(F.sum(cents).alias(out))
        )

    y94 = year_totals(1994, "cents_1994").withColumnRenamed("o_custkey", "ck94")
    y95 = year_totals(1995, "cents_1995").withColumnRenamed("o_custkey", "ck95")
    joined = y94.join(y95, y94["ck94"] == y95["ck95"], "full_outer")
    return joined.select(
        F.coalesce("ck94", "ck95").alias("custkey"),
        F.coalesce("cents_1994", F.lit(0)).alias("cents_1994"),
        F.coalesce("cents_1995", F.lit(0)).alias("cents_1995"),
        F.when(F.col("ck94").isNull(), "1995_only")
        .when(F.col("ck95").isNull(), "1994_only")
        .otherwise("both")
        .alias("status"),
    )
