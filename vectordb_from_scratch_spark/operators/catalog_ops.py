"""Catalog / CRUD relational shapes (SURVEY.md §2.2 C1-C17), demonstrated on
the driver tables.

The reference's service layer is point CRUD against Mongo; on Spark each of
those shapes is a set-oriented job. Each query here is the *relational
skeleton* of a C-series operator, run deterministically so the DuckDB oracle
can check it:

- existence / ownership checks (C5, C8)        → semi joins
- cascade delete (C4, C7)                      → anti joins
- upsert / MERGE (C16)                         → full outer join + coalesce
- uniqueness constraint (Mongo unique indexes) → groupBy-count > 1
- library stats (C15)                          → groupBy aggregation
- sorted listing (C2)                          → orderBy(lower(name), id)
- metadata filters (declared-but-unimplemented
  in the reference, flat.py:46)               → map/JSON access predicates
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.registry import register
from vectordb_from_scratch_spark.session import load_table


# --- C5/C8: existence checks as semi joins -----------------------------------

_SEMI_SQL = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
"""


@register("crud_exists_semijoin", _SEMI_SQL)
def crud_exists_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Does the parent exist' check (create_chunk validates library+document
    existence, vector_db.py:186-193) as a LEFT SEMI join — no row
    multiplication, the validation shape at any scale."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


# --- C4/C7: cascade delete as anti joins ---------------------------------------

_CASCADE_SQL = """
WITH del_nations AS (
  SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'),
del_customers AS (
  SELECT c_custkey FROM customer
  WHERE c_nationkey IN (SELECT n_nationkey FROM del_nations)),
del_orders AS (
  SELECT o_orderkey FROM orders
  WHERE o_custkey IN (SELECT c_custkey FROM del_customers))
SELECT 'customer' AS table_name,
       (SELECT count(*) FROM customer
        WHERE c_custkey NOT IN (SELECT c_custkey FROM del_customers))::BIGINT AS remaining
UNION ALL
SELECT 'orders',
       (SELECT count(*) FROM orders
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM del_orders))::BIGINT
UNION ALL
SELECT 'lineitem',
       (SELECT count(*) FROM lineitem
        WHERE l_orderkey NOT IN (SELECT o_orderkey FROM del_orders))::BIGINT
"""


@register("crud_cascade_delete", _CASCADE_SQL)
def crud_cascade_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cascade delete (delete_library removes chunks→documents→library,
    vector_db.py:137-150) as anti joins: per-table post-delete row counts for
    deleting one region's subtree. Anti joins broadcast the (small) delete
    key set, so the fact tables are scanned once, never shuffled."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    del_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey")
    del_cust = cust.join(
        F.broadcast(del_nations), cust.c_nationkey == del_nations.n_nationkey, "left_semi"
    ).select("c_custkey")
    del_orders = orders.join(
        F.broadcast(del_cust), orders.o_custkey == del_cust.c_custkey, "left_semi"
    ).select("o_orderkey")

    rem_cust = cust.join(F.broadcast(del_cust), "c_custkey", "left_anti")
    rem_orders = orders.join(F.broadcast(del_orders), "o_orderkey", "left_anti")
    rem_li = li.join(
        F.broadcast(del_orders), li.l_orderkey == del_orders.o_orderkey, "left_anti"
    )

    def row(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("remaining")).select(
            F.lit(name).alias("table_name"), "remaining"
        )

    return row("customer", rem_cust).unionAll(row("orders", rem_orders)).unionAll(
        row("lineitem", rem_li)
    )


# --- C16: MERGE / upsert --------------------------------------------------------

_MERGE_SQL = """
WITH delta AS (
  SELECT c_custkey, c_name, round(c_acctbal + 100.0, 2) AS c_acctbal
  FROM customer WHERE c_custkey % 10 = 0
  UNION ALL
  SELECT c_custkey + 1000000, concat('new_', c_name), 0.0
  FROM customer WHERE c_custkey % 100 = 0)
SELECT coalesce(d.c_custkey, b.c_custkey)           AS c_custkey,
       coalesce(d.c_name, b.c_name)                 AS c_name,
       round(coalesce(d.c_acctbal, b.c_acctbal), 2) AS c_acctbal,
       CASE WHEN d.c_custkey IS NULL THEN 'kept'
            WHEN b.c_custkey IS NULL THEN 'inserted'
            ELSE 'updated' END                       AS merge_action
FROM customer b FULL OUTER JOIN delta d ON b.c_custkey = d.c_custkey
"""


@register("crud_merge_upsert", _MERGE_SQL)
def crud_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert (all reference saves are replace_one(upsert=True),
    mongo_storage.py:59-69) as MERGE semantics: WHEN MATCHED update, WHEN NOT
    MATCHED insert — expressed as a full outer join so the oracle can check
    it. The delta is derived deterministically from the base table."""
    base = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    updates = (
        base.filter(F.col("c_custkey") % 10 == 0)
        .withColumn("c_acctbal", F.round(F.col("c_acctbal") + 100.0, 2))
    )
    inserts = base.filter(F.col("c_custkey") % 100 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.concat(F.lit("new_"), F.col("c_name")).alias("c_name"),
        F.lit(0.0).alias("c_acctbal"),
    )
    delta = updates.unionAll(inserts)
    b, d = base.alias("b"), delta.alias("d")
    return b.join(d, "c_custkey", "full_outer").select(
        F.col("c_custkey"),
        F.coalesce(F.col("d.c_name"), F.col("b.c_name")).alias("c_name"),
        F.round(F.coalesce(F.col("d.c_acctbal"), F.col("b.c_acctbal")), 2).alias("c_acctbal"),
        F.when(F.col("d.c_name").isNull(), "kept")
        .when(F.col("b.c_name").isNull(), "inserted")
        .otherwise("updated")
        .alias("merge_action"),
    )


# --- uniqueness constraint check --------------------------------------------------

_UNIQ_SQL = """
SELECT p_brand, count(*) AS cnt
FROM (SELECT DISTINCT p_brand, p_type FROM part) t
GROUP BY p_brand HAVING count(*) > 10
"""


@register("crud_uniqueness_check", _UNIQ_SQL)
def crud_uniqueness_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark has no unique constraints (Mongo unique indexes,
    mongo_storage.py:27-38); the engine-level equivalent is a groupBy-count
    violation report. Here: brands carrying more than 10 distinct types."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.select("p_brand", "p_type")
        .distinct()
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 10)
    )


# --- C15: stats aggregation ---------------------------------------------------------

_STATS_SQL = """
SELECT source,
       count(*)                   AS num_documents,
       sum(n_chars)::BIGINT       AS total_chars,
       round(avg(n_chars), 4)     AS avg_chars,
       count(DISTINCT lang)       AS num_langs
FROM documents
GROUP BY source
"""


@register("crud_library_stats", _STATS_SQL)
def crud_library_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Library stats (C15, operations.py:52-69 — the reference's ONLY
    aggregation: num_documents/num_chunks) generalized to a grouped agg over
    the documents table with source as the 'library'."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("num_documents"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.countDistinct("lang").alias("num_langs"),
    )


# --- C2: sorted listing ----------------------------------------------------------

_LISTING_SQL = """
SELECT c_custkey, c_name,
       row_number() OVER (ORDER BY lower(c_name), c_custkey) AS pos
FROM customer
"""


@register("crud_sorted_listing", _LISTING_SQL)
def crud_sorted_listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """list_libraries sorts by (lower(name), id)
    (app/api/routes/libraries.py:29); the position column pins the total
    order so the order-insensitive oracle hash still verifies the sort."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.orderBy(F.lower("c_name"), F.col("c_custkey"))
    return c.select(
        "c_custkey", "c_name", F.row_number().over(w).cast("long").alias("pos")
    )


# --- metadata filters (map/JSON access) ---------------------------------------------

_METAFILTER_SQL = """
SELECT event_id, user_id, event_type,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) < 10
  AND event_type = 'purchase'
"""


@register("crud_metadata_filter", _METAFILTER_SQL)
def crud_metadata_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference declares metadata_filters but never implements them
    (models.py:48, flat.py:46 TODO). Here: predicate on a JSON/metadata
    attribute — the dynamic-schema escape hatch — combined with an equality
    filter, both pushed below the scan where possible."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.filter((k < 10) & (F.col("event_type") == "purchase"))
        .select("event_id", "user_id", "event_type", k.alias("k"))
    )


# --- C8: dimension validation ---------------------------------------------------------

_DIMCHECK_SQL = """
SELECT count(*) AS bad_rows
FROM embeddings WHERE len(embedding) != 64
"""


@register("crud_dim_validation", _DIMCHECK_SQL)
def crud_dim_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-length validation (create_chunk dim check,
    vector_db.py:192-193; also flat.py:24-25) as a bulk job: count of rows
    whose vector length differs from the library dims (64 in the fixtures)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.size("embedding") != 64).agg(F.count(F.lit(1)).alias("bad_rows"))
