"""Data-quality rules engine: constraint auditing as one declarative pass.

The reference enforces its constraints transactionally, one request at a
time — dims on every chunk (`/root/reference/app/core/vector_db.py:226-227`),
uniqueness via Mongo indexes, ownership on every lookup. A warehouse
ingesting 100 TB needs the same rules as a BATCH AUDIT: run every
referential / domain / temporal constraint over the whole corpus and
report (rule, rows checked, violations) — the dbt-tests / Deequ shape.

Each rule is a declarative aggregate:
- referential rules are broadcast anti-join counts (dim side small) or
  shuffle anti-joins where both sides are facts — either way ONE count,
  no row materialization;
- domain rules are conditional aggregates fused into a single scan of
  the table they check (one job for all domain rules of one table);
- temporal rules (ship-before-order) join fact-to-fact on the fact key —
  at scale this is the bucketed-join case (operators/bucketed.py).

The audit is honest about what it checked: `n_checked` comes from the
same scan as the violation count, so a silently-empty input reads as
0/0, not as a pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.registry import register
from vectordb_from_scratch_spark.session import load_table

_DQ_SQL = """
WITH r1 AS (
  SELECT 'orders_orphan_custkey' AS rule,
         (SELECT count(*) FROM orders)::BIGINT AS n_checked,
         (SELECT count(*) FROM orders o
           WHERE NOT EXISTS (SELECT 1 FROM customer c
                             WHERE c.c_custkey = o.o_custkey))::BIGINT AS n_violations
), r2 AS (
  SELECT 'lineitem_orphan_orderkey',
         (SELECT count(*) FROM lineitem)::BIGINT,
         (SELECT count(*) FROM lineitem l
           WHERE NOT EXISTS (SELECT 1 FROM orders o
                             WHERE o.o_orderkey = l.l_orderkey))::BIGINT
), r3 AS (
  SELECT 'orders_without_lineitems',
         (SELECT count(*) FROM orders)::BIGINT,
         (SELECT count(*) FROM orders o
           WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                             WHERE l.l_orderkey = o.o_orderkey))::BIGINT
), r4 AS (
  SELECT 'lineitem_ship_before_order',
         (SELECT count(*) FROM lineitem l JOIN orders o
            ON l.l_orderkey = o.o_orderkey)::BIGINT,
         (SELECT count(*) FROM lineitem l JOIN orders o
            ON l.l_orderkey = o.o_orderkey
           WHERE l.l_shipdate < o.o_orderdate)::BIGINT
), r5 AS (
  SELECT 'lineitem_discount_domain',
         (SELECT count(*) FROM lineitem)::BIGINT,
         (SELECT count(*) FROM lineitem
           WHERE l_discount < 0 OR l_discount > 0.1)::BIGINT
), r6 AS (
  SELECT 'lineitem_quantity_domain',
         (SELECT count(*) FROM lineitem)::BIGINT,
         (SELECT count(*) FROM lineitem
           WHERE l_quantity < 1 OR l_quantity > 50)::BIGINT
), r7 AS (
  SELECT 'orders_totalprice_positive',
         (SELECT count(*) FROM orders)::BIGINT,
         (SELECT count(*) FROM orders WHERE o_totalprice <= 0)::BIGINT
)
SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3
UNION ALL SELECT * FROM r4 UNION ALL SELECT * FROM r5
UNION ALL SELECT * FROM r6 UNION ALL SELECT * FROM r7
"""


def _rule(name: str, checked, violations) -> DataFrame:
    return checked.crossJoin(violations).select(
        F.lit(name).alias("rule"),
        F.col("n_checked").cast("long").alias("n_checked"),
        F.col("n_violations").cast("long").alias("n_violations"),
    )


@register("dq_constraint_audit", _DQ_SQL)
def dq_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every constraint in one report. Domain rules for one table fuse
    into a single conditional-aggregate scan; referential rules are
    anti-join counts with the smaller side broadcast; the fact-fact
    temporal rule shares one join. The scalar frames composing each
    report row are single-row crossJoins (8-byte values, not arrays)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")

    # --- domain rules: ONE scan per table for all its rules
    li_domain = lineitem.agg(
        F.count(F.lit(1)).alias("n_checked"),
        F.sum(
            ((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)).cast("long")
        ).alias("v_discount"),
        F.sum(
            ((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).cast("long")
        ).alias("v_quantity"),
    ).localCheckpoint(eager=True)
    o_domain = orders.agg(
        F.count(F.lit(1)).alias("n_checked"),
        F.sum((F.col("o_totalprice") <= 0).cast("long")).alias("v_price"),
    ).localCheckpoint(eager=True)

    # --- referential rules: anti-join counts
    o_cnt = o_domain.select("n_checked")
    li_cnt = li_domain.select("n_checked")
    orphan_orders = (
        orders.join(
            F.broadcast(customer.select("c_custkey")),
            orders.o_custkey == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_violations"))
    )
    orphan_lineitem = (
        lineitem.join(
            orders.select("o_orderkey"),
            lineitem.l_orderkey == F.col("o_orderkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_violations"))
    )
    childless_orders = (
        orders.join(
            lineitem.select("l_orderkey").distinct(),
            orders.o_orderkey == F.col("l_orderkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_violations"))
    )

    # --- temporal rule: one fact-fact join serves checked AND violations
    lo = lineitem.select("l_orderkey", "l_shipdate").join(
        orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    temporal = lo.agg(
        F.count(F.lit(1)).alias("n_checked"),
        F.sum((F.col("l_shipdate") < F.col("o_orderdate")).cast("long")).alias(
            "n_violations"
        ),
    ).localCheckpoint(eager=True)

    return (
        _rule("orders_orphan_custkey", o_cnt, orphan_orders)
        .unionByName(_rule("lineitem_orphan_orderkey", li_cnt, orphan_lineitem))
        .unionByName(_rule("orders_without_lineitems", o_cnt, childless_orders))
        .unionByName(
            temporal.select(
                F.lit("lineitem_ship_before_order").alias("rule"),
                F.col("n_checked").cast("long").alias("n_checked"),
                F.col("n_violations").cast("long").alias("n_violations"),
            )
        )
        .unionByName(
            _rule(
                "lineitem_discount_domain",
                li_cnt,
                li_domain.select(F.col("v_discount").alias("n_violations")),
            )
        )
        .unionByName(
            _rule(
                "lineitem_quantity_domain",
                li_cnt,
                li_domain.select(F.col("v_quantity").alias("n_violations")),
            )
        )
        .unionByName(
            _rule(
                "orders_totalprice_positive",
                o_domain.select("n_checked"),
                o_domain.select(F.col("v_price").alias("n_violations")),
            )
        )
    )
