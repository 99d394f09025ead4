"""Temporal join operators over ``events``: as-of join and range join.

The reference has no join operator at all (SURVEY.md §2.3 — its only join
shapes are FK hydration and semi/anti ownership checks); these are the
training-pipeline extensions for event/time-series data. Both are
implemented with the SHUFFLE-MINIMAL shapes that survive 100 TB:

- **as-of join**: the union+window trick — tag both sides, union, one
  shuffle on the key, sort within partition by (ts, side), and carry the
  right side forward with last(ignorenulls) over a running window. No
  range-condition join (which Spark would plan as a broadcast-nested-loop
  or a theta sort-merge with per-row rescans), no per-key collect. One
  shuffle, linear scan — the same cost as a groupBy.

- **range join**: time-banding — bucket both sides by the range width,
  equi-join on (key, bucket) with the left side exploded to its two
  candidate buckets, then filter to the exact predicate. Each true pair is
  found exactly once (the right row's bucket is either the left's or the
  next), so no dedup pass; the join is a plain hash equi-join AQE can
  size, never a quadratic per-key blowup as long as keys × width are
  bounded.

Timestamps: microsecond longs end-to-end (``unix_micros``) so every gap is
exact integer arithmetic — no float drift against the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.registry import register
from vectordb_from_scratch_spark.session import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """Generic as-of join: for each left row, the right row with the
    greatest ``right_ts`` <= ``left_ts`` for the same ``key`` (direction
    'backward'; inclusive, matching DuckDB ASOF JOIN). Left rows with no
    match keep nulls. Returns all left columns plus ``right_cols``.

    Union+window: right rows sort before left rows at equal ts (side 0 <
    side 1) so an exact-tie right row IS visible to the left row."""
    if direction != "backward":
        raise ValueError("only backward as-of is implemented")
    lcols = left.columns
    tagged_l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
    )
    tagged_r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(left.select(F.struct(*lcols)).schema[0].dataType).alias("_l"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_l.unionByName(tagged_r).select(
        "_side",
        "_l",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_r_{c}") for c in right_cols],
    )
    return carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_l.{c}").alias(c) for c in lcols],
        *[F.col(f"_r_{c}").alias(f"right_{c}") for c in right_cols],
    )


_ASOF_SQL = """
SELECT p.event_id                                   AS purchase_id,
       p.user_id                                    AS user_id,
       v.event_id                                   AS view_id,
       epoch_us(p.ts) - epoch_us(v.ts)              AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND v.ts <= p.ts
"""


@register("events_asof_last_view", _ASOF_SQL)
def events_asof_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution as-of join: each purchase matched to the same user's
    most recent view at-or-before it (LEFT: purchases with no prior view
    keep nulls). Oracle is DuckDB's native ASOF LEFT JOIN."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.unix_micros("ts").alias("p_us")
    )
    views = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", F.unix_micros("ts").alias("v_us")
    )
    res = asof_join(
        purchases, views, key="user_id", left_ts="p_us", right_ts="v_us",
        right_cols=["view_id", "v_us"],
    )
    return res.select(
        "purchase_id",
        "user_id",
        F.col("right_view_id").alias("view_id"),
        (F.col("p_us") - F.col("right_v_us")).alias("gap_us"),
    )


RANGE_WIDTH_US = 5 * 60 * 1_000_000  # 5 minutes


def range_pair_stats(events: DataFrame, width_us: int = RANGE_WIDTH_US) -> DataFrame:
    """Per-user count and total gap of event pairs within ``width_us`` of
    each other (a.ts <= b.ts, ties broken by event_id). Banded equi-join:
    the left row probes its own bucket and the next; a qualifying pair is
    produced exactly once because the right row's bucket is fixed."""
    base = events.select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    ).withColumn("bucket", F.col("us") - (F.col("us") % width_us))
    probe = base.select(
        F.col("user_id"),
        F.col("event_id").alias("a_id"),
        F.col("us").alias("a_us"),
        F.explode(
            F.array(F.col("bucket"), F.col("bucket") + width_us)
        ).alias("bucket"),
    )
    build = base.select(
        "user_id",
        F.col("event_id").alias("b_id"),
        F.col("us").alias("b_us"),
        "bucket",
    )
    gap = F.col("b_us") - F.col("a_us")
    pairs = probe.join(build, ["user_id", "bucket"]).filter(
        (gap >= 0)
        & (gap <= width_us)
        & ((F.col("a_us") < F.col("b_us")) | ((F.col("a_us") == F.col("b_us")) & (F.col("a_id") < F.col("b_id"))))
    )
    return pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_pairs"), F.sum(gap).alias("total_gap_us")
    )


_RANGE_SQL = f"""
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events)
SELECT a.user_id AS user_id,
       count(*)            AS n_pairs,
       sum(b.us - a.us)::BIGINT AS total_gap_us
FROM e a JOIN e b
  ON a.user_id = b.user_id
 AND b.us - a.us BETWEEN 0 AND {RANGE_WIDTH_US}
 AND (a.us < b.us OR (a.us = b.us AND a.event_id < b.event_id))
GROUP BY a.user_id
"""


@register("events_range_pairs", _RANGE_SQL)
def events_range_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self range join: pairs of a user's events within 5 minutes,
    aggregated per user (all-integer output — no float drift)."""
    return range_pair_stats(load_table(spark, sf_dir, "events"))
