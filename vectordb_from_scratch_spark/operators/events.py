"""Event-stream operators over the ``events`` table: tumbling/sliding
windows, sessionization, per-user funnels.

The reference has no streaming at all (SURVEY.md §2.3); these are the
Structured-Streaming-shaped extensions. Every operator here is written
against a static DataFrame — in Spark, windowed aggregation over a static
frame has IDENTICAL semantics to the streaming version (readStream + the
same expressions + watermark); ``streaming/`` wires the same logic to
readStream/writeStream and the tests assert batch/stream equivalence.

Scale notes: all groupings key on (user_id) or (window bucket) — high
cardinality, well-distributed → clean hash shuffles; sessionization uses a
per-user sort window, the standard gap-based formulation that needs exactly
one shuffle on user_id.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.registry import register
from vectordb_from_scratch_spark.session import load_table

SESSION_GAP_MIN = 30


# --- tumbling windows -----------------------------------------------------------

_TUMBLING_SQL = """
SELECT date_trunc('hour', ts)      AS window_start,
       event_type,
       count(*)                    AS n_events,
       round(sum(value), 2)        AS total_value,
       count(DISTINCT user_id)     AS unique_users
FROM events
GROUP BY date_trunc('hour', ts), event_type
"""


@register("events_tumbling_windows", _TUMBLING_SQL)
def events_tumbling_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows. Uses F.window (the streaming-compatible
    bucketing op) and exposes window.start so the oracle can match on
    date_trunc."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.countDistinct("user_id").alias("unique_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
            "unique_users",
        )
    )


# --- sliding windows --------------------------------------------------------------

_SLIDING_SQL = """
WITH ev AS (
  SELECT value,
         make_timestamp(CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 * 1000000) AS b0
  FROM events),
expanded AS (
  SELECT b0 AS window_start, value FROM ev
  UNION ALL
  SELECT b0 - INTERVAL 30 MINUTE, value FROM ev)
SELECT window_start, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM expanded GROUP BY window_start
"""


@register("events_sliding_windows", _SLIDING_SQL)
def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-minute windows sliding every 30 — each event lands in exactly two
    buckets. F.window(ts, '60 minutes', '30 minutes') duplicates rows into
    their buckets JVM-side (explode of 2 structs, no shuffle until the agg)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "60 minutes", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


# --- sessionization ---------------------------------------------------------------

_SESSION_SQL = f"""
WITH ordered AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                OR date_diff('second',
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                     ts) > {SESSION_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS is_new
  FROM events),
sess AS (
  SELECT user_id, ts, value,
         (sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS session_id
  FROM ordered)
SELECT user_id, session_id,
       count(*)                                   AS n_events,
       round(sum(value), 2)                       AS session_value,
       CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS duration_sec
FROM sess
GROUP BY user_id, session_id
"""


@register("events_sessionization", _SESSION_SQL)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): mark session starts with
    lag(), then a running sum assigns session ids — ONE shuffle on user_id,
    both windows share the sort. The streaming twin is
    F.session_window / applyInPandasWithState (see streaming module)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    marked = e.withColumn(
        "is_new", F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60), 1).otherwise(0)
    )
    wrun = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sess = marked.withColumn("session_id", F.sum("is_new").over(wrun))
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("session_value"),
        (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long")))
        .cast("long")
        .alias("duration_sec"),
    )


# --- per-user funnel / behavior stats ------------------------------------------------

_FUNNEL_SQL = """
SELECT user_id,
       count(*)                                              AS n_events,
       count(*) FILTER (WHERE event_type = 'view')           AS views,
       count(*) FILTER (WHERE event_type = 'click')          AS clicks,
       count(*) FILTER (WHERE event_type = 'purchase')       AS purchases,
       round(sum(value) FILTER (WHERE event_type = 'purchase'), 2) AS purchase_value,
       CAST(min(floor(epoch(ts))) AS BIGINT)                 AS first_seen_epoch,
       CAST(max(floor(epoch(ts))) AS BIGINT)                 AS last_seen_epoch
FROM events
GROUP BY user_id
"""


@register("events_user_funnel", _FUNNEL_SQL)
def events_user_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation per user (view→click→purchase funnel) — the
    pivot-style shape of behavioral pipelines; single hash agg."""
    e = load_table(spark, sf_dir, "events")
    cnt_if = lambda t: F.count(F.when(F.col("event_type") == t, 1))  # noqa: E731
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        cnt_if("view").alias("views"),
        cnt_if("click").alias("clicks"),
        cnt_if("purchase").alias("purchases"),
        F.round(
            F.sum(F.when(F.col("event_type") == "purchase", F.col("value"))), 2
        ).alias("purchase_value"),
        F.min(F.col("ts").cast("long")).alias("first_seen_epoch"),
        F.max(F.col("ts").cast("long")).alias("last_seen_epoch"),
    )


# --- hypertable rollup (continuous aggregate) -------------------------------------

_HYPER_SQL = """
SELECT date_trunc('hour', ts)  AS window_start,
       event_type,
       count(*)                AS n_events,
       round(sum(value), 2)    AS total_value,
       round(sum(value) / count(*), 6) AS avg_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
"""


def minute_rollup(events: DataFrame) -> DataFrame:
    """The materialized fine-grain rollup: 1-minute buckets carrying the
    ALGEBRAIC partials (count, sum) that any coarser window can be
    re-aggregated from. This is the table a hypertable engine would keep
    continuously updated; in Spark it is a DataFrame you persist and let
    every dashboard query reuse."""
    return events.groupBy(
        F.date_trunc("minute", "ts").alias("minute_start"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))


def rollup_to_hours(minutes: DataFrame) -> DataFrame:
    """Coarse window answered FROM the rollup — 60x fewer input rows than
    the raw table; avg derived from the partials (algebraic re-aggregation:
    counts and sums compose, avg = sum/count at the end)."""
    return (
        minutes.groupBy(
            F.date_trunc("hour", "minute_start").alias("window_start"), "event_type"
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.round(F.sum("sum_value"), 2).alias("total_value"),
            F.round(F.sum("sum_value") / F.sum("n_events"), 6).alias("avg_value"),
        )
    )


@register("events_hypertable_rollup", _HYPER_SQL)
def events_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: hourly stats computed from
    the 1-minute rollup table, value-checked against the direct hourly
    GROUP BY in DuckDB — proving the rollup composition loses nothing."""
    return rollup_to_hours(minute_rollup(load_table(spark, sf_dir, "events")))


# --- JSON property extraction ------------------------------------------------------

_JSON_SQL = """
SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
       count(*)              AS n_events,
       round(sum(value), 2)  AS total_value
FROM events
GROUP BY k_mod
"""


@register("events_json_props", _JSON_SQL)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access: extract a typed field from the JSON props
    column (get_json_object stays in codegen) and aggregate on it — the
    dynamic-schema escape hatch every event pipeline needs (the
    reference's analog is its MAP<STRING,STRING> metadata, SURVEY §1.2)."""
    e = load_table(spark, sf_dir, "events")
    k_mod = (F.get_json_object("props", "$.k").cast("long") % 10).alias("k_mod")
    return e.groupBy(k_mod).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


_GAPFILL_SQL = """
WITH counts AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         count(*) AS n, round(sum(value), 2) AS total
  FROM events GROUP BY event_type, hour),
span AS (SELECT min(hour) AS lo, max(hour) AS hi FROM counts),
grid AS (
  SELECT t.event_type, g.hour
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
              FROM span) g)
SELECT grid.event_type, grid.hour,
       coalesce(n, 0)::BIGINT AS n, coalesce(total, 0.0) AS total
FROM grid LEFT JOIN counts
  ON counts.event_type = grid.event_type AND counts.hour = grid.hour
"""


@register("events_gapfill_hourly", _GAPFILL_SQL)
def events_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + gap-fill: hourly counts per event type with
    empty hours materialized as zero rows (the timescale-style `time_bucket
    + gapfill` every monitoring pipeline needs; absent from the reference —
    SURVEY §2.3 lists no temporal ops at all).

    Scale shape: the fact table is aggregated FIRST (one shuffle on
    (type, hour) — output is |types|x|hours|, tiny); the dense grid is
    GENERATED from a one-row span via sequence+explode, never stored; the
    outer join then runs small x small. The 100 TB cost is one pass over
    events + a partial-agg shuffle — gap-filling itself is free."""
    e = load_table(spark, sf_dir, "events")
    counts = (
        e.withColumn("hour", F.date_trunc("hour", F.col("ts")))
        .groupBy("event_type", "hour")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
    )
    span = counts.agg(F.min("hour").alias("lo"), F.max("hour").alias("hi"))
    hours = span.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    )
    grid = hours.crossJoin(F.broadcast(e.select("event_type").distinct()))
    return grid.join(counts, ["event_type", "hour"], "left").select(
        "event_type",
        "hour",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.coalesce("total", F.lit(0.0)).alias("total"),
    )


_RETENTION_SQL = """
WITH first_seen AS (
  SELECT user_id, date_trunc('week', min(ts))::TIMESTAMP AS cohort_week
  FROM events GROUP BY user_id),
activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
  FROM events)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, active_week) / 7 AS BIGINT) AS weeks_since,
       count(DISTINCT a.user_id) AS active_users
FROM activity a
JOIN first_seen f USING (user_id)
GROUP BY cohort_week, weeks_since
"""


@register("events_retention_cohorts", _RETENTION_SQL)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the product-analytics staple: users
    bucketed by first-seen week, then distinct active users per
    (cohort, weeks-since-signup) cell. Reference has no temporal or
    grouping analytics at all (SURVEY §2.3).

    Scale shape: NO JOIN — first-seen is a min() window over user_id, so
    cohort and activity ride the same rows after ONE exchange on user_id;
    the distinct on (user, cohort, active_week) is satisfied by that same
    partitioning (clustering on a key subset), adding no exchange. After
    the distinct each user appears once per active week, so the cell
    count is a plain count(*) — no count-distinct Expand. Two shuffles
    total: user_id, then the tiny (cohort, week) cell agg (asserted in
    test_plans.py). Weeks arithmetic is pure column math on
    week-truncated timestamps (both engines truncate to Monday)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    base = e.select(
        "user_id",
        F.date_trunc("week", F.min("ts").over(w)).alias("cohort_week"),
        F.date_trunc("week", F.col("ts")).alias("active_week"),
    ).distinct()
    return (
        base.select(
            "cohort_week",
            (F.datediff(F.col("active_week"), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("weeks_since"),
        )
        .groupBy("cohort_week", "weeks_since")
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


_RANGE_WINDOW_SQL = """
SELECT event_id, user_id, ts,
       round(sum(value) OVER w, 2)   AS trailing_hour_value,
       CAST(count(*) OVER w AS BIGINT) AS trailing_hour_events
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


@register("events_trailing_hour_window", _RANGE_WINDOW_SQL)
def events_trailing_hour_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE window frame: per user, the trailing-one-hour sum
    and count at every event — the value-based frame ROWS frames can't
    express (variable row count per frame). Ordering key is epoch
    MICROseconds on both engines so the frame boundary is exact; a
    seconds-granularity cast would silently widen the frame.

    Scale shape: one shuffle on user_id, then a per-partition ordered scan
    with a sliding accumulator — Spark's WindowExec evicts rows older than
    the range bound incrementally, so memory is O(events-per-hour-per-user)
    not O(partition)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.sum("value").over(w), 2).alias("trailing_hour_value"),
        F.count(F.lit(1)).over(w).alias("trailing_hour_events"),
    )


_PERCENTILES_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.25), 6) AS p25,
       round(quantile_cont(value, 0.50), 6) AS p50,
       round(quantile_cont(value, 0.75), 6) AS p75,
       round(quantile_cont(value, 0.90), 6) AS p90,
       round(min(value), 6) AS vmin,
       round(max(value), 6) AS vmax
FROM events
GROUP BY event_type
"""


@register("events_value_percentiles", _PERCENTILES_SQL)
def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles per group (linear interpolation — identical
    definition in Spark's `percentile` and DuckDB's `quantile_cont`),
    complementing the approximate KLL/HLL sketches in `sketches.py`: the
    sketch path is the 100 TB default, the exact path is the small-group /
    verification tool. Exact percentile requires a full sort of each
    group's values — per-group memory, not streaming — which is precisely
    why the sketch variant exists; keeping both documents the trade-off."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.25)), 6).alias("p25"),
        F.round(F.percentile("value", F.lit(0.50)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.75)), 6).alias("p75"),
        F.round(F.percentile("value", F.lit(0.90)), 6).alias("p90"),
        F.round(F.min("value"), 6).alias("vmin"),
        F.round(F.max("value"), 6).alias("vmax"),
    )


_ATTRIBUTION_SQL = """
SELECT p.event_id AS purchase_id,
       v.event_id AS view_id,
       p.user_id  AS user_id,
       v.ts       AS view_ts,
       p.ts       AS purchase_ts,
       p.value    AS amount
FROM events v
JOIN events p
  ON v.user_id = p.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND v.ts < p.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
"""

_attr_run = itertools.count()


@register("streaming_attribution_pairs", _ATTRIBUTION_SQL)
def streaming_attribution_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join, ORACLE-CHECKED: the view→purchase
    attribution pairs computed by a real Structured Streaming query
    (two watermarked streams, availableNow trigger, append sink) must
    value-hash-match the static SQL join — the strongest correctness claim
    a streaming operator can make, well beyond the rows-only checks
    non-deterministic streaming ops get. Join-state eviction and plan
    details live in streaming.view_purchase_join_stream; the batch/stream
    equivalence is also pinned in test_streaming.py."""
    from vectordb_from_scratch_spark import streaming

    name = f"t_attribution_{next(_attr_run)}"
    s = streaming.read_events_stream(spark, sf_dir)
    stream = streaming.view_purchase_join_stream(
        s.filter(F.col("event_type") == "view"),
        s.filter(F.col("event_type") == "purchase"),
    )
    # Stateful-operator partitioning is fixed at stream start from
    # spark.sql.shuffle.partitions, and EVERY partition materializes four
    # state-store instances per micro-batch (two sides x two stores for a
    # stream-stream join) — at local fixture scale the per-store setup
    # dominates (measured 11.9s at 32 partitions vs 2.6s at 8 for the same
    # 342 matches). Size it to the data here; a cluster-scale deployment
    # raises it with input rate, not with executor count.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        streaming.run_stream_to_memory(stream, name, output_mode="append")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


# --- data profiling + outlier detection --------------------------------------

_PROFILE_SQL = """
SELECT 'o_totalprice' AS col,
       count(*)::BIGINT AS n_rows,
       count(o_totalprice)::BIGINT AS n_nonnull,
       count(DISTINCT o_totalprice)::BIGINT AS n_distinct,
       round(min(o_totalprice), 2) AS min_v,
       round(max(o_totalprice), 2) AS max_v,
       round(avg(o_totalprice), 4) AS mean_v
FROM orders
UNION ALL
SELECT 'o_custkey',
       count(*)::BIGINT, count(o_custkey)::BIGINT,
       count(DISTINCT o_custkey)::BIGINT,
       round(min(o_custkey), 2), round(max(o_custkey), 2),
       round(avg(o_custkey), 4)
FROM orders
UNION ALL
SELECT 'o_orderstatus',
       count(*)::BIGINT, count(o_orderstatus)::BIGINT,
       count(DISTINCT o_orderstatus)::BIGINT,
       NULL, NULL, NULL
FROM orders
"""


@register("profile_orders", _PROFILE_SQL)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling — the data-quality pass every ingestion pipeline
    runs before training: per-column row/non-null/distinct counts and
    numeric ranges as ONE aggregation job (Catalyst plans the
    multi-column distinct counts via Expand; a per-column describe loop
    would run a job per column), then `stack` unpivots the single stats
    row into one row per column. Numeric and categorical columns share
    the output schema with NULLed numeric stats for the latter."""
    o = load_table(spark, sf_dir, "orders")
    cols = (("o_totalprice", True), ("o_custkey", True), ("o_orderstatus", False))
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for col, numeric in cols:
        aggs.append(F.count(col).alias(f"{col}__nn"))
        aggs.append(F.countDistinct(col).alias(f"{col}__nd"))
        if numeric:
            aggs.append(F.round(F.min(col), 2).cast("double").alias(f"{col}__mn"))
            aggs.append(F.round(F.max(col), 2).cast("double").alias(f"{col}__mx"))
            aggs.append(F.round(F.avg(col), 4).cast("double").alias(f"{col}__mu"))
    one = o.agg(*aggs)  # single scan: every stat is a partial aggregate
    parts = []
    for col, numeric in cols:
        nums = (
            f"`{col}__mn`, `{col}__mx`, `{col}__mu`"
            if numeric
            else "CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)"
        )
        parts.append(f"'{col}', n_rows, `{col}__nn`, `{col}__nd`, {nums}")
    return one.select(
        F.expr(
            f"stack({len(cols)}, {', '.join(parts)}) AS "
            "(col, n_rows, n_nonnull, n_distinct, min_v, max_v, mean_v)"
        )
    )


_OUTLIERS_SQL = """
WITH s AS (
  SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sd
  FROM events GROUP BY event_type)
SELECT e.event_id, e.event_type,
       round(e.value, 2) AS value,
       round((e.value - s.mu) / s.sd, 4) AS zscore
FROM events e JOIN s USING (event_type)
WHERE abs(e.value - s.mu) > 3 * s.sd
"""


@register("events_value_outliers", _OUTLIERS_SQL)
def events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-sigma outliers per event type — the anomaly screen run before
    metrics trust a feed. Two-pass shape: tiny per-type (mean, stddev)
    aggregate broadcasts back onto the scan, the filter stays in codegen,
    and only outlier rows survive to the driver. stddev_samp matches
    DuckDB's stddev_samp definition exactly (n-1 denominator)."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sd")
    )
    return (
        ev.join(F.broadcast(s), "event_type")
        .filter(F.abs(F.col("value") - F.col("mu")) > 3 * F.col("sd"))
        .select(
            "event_id",
            "event_type",
            F.round("value", 2).alias("value"),
            F.round((F.col("value") - F.col("mu")) / F.col("sd"), 4).alias("zscore"),
        )
    )


# --- per-key recurrence: exponentially-weighted moving average -----------------

_EWMA_ALPHA = 0.5  # exact binary fraction: both engines' folds are bitwise equal

_EWMA_SQL = f"""
SELECT user_id,
       count(*)::BIGINT AS n_events,
       round(list_reduce(list(value::DOUBLE ORDER BY ts, event_id),
                         (acc, x) -> acc * {_EWMA_ALPHA} + x * {_EWMA_ALPHA}), 6)
         AS ewma
FROM events
GROUP BY user_id
"""


@register("events_ewma_by_user", _EWMA_SQL)
def events_ewma_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of event values — a RECURRENCE (state_t depends on
    state_{t-1}), the window-function blind spot: no frame can express
    it, and the usual closed form (α·Σ(1-α)^{n-i}x_i via running sums)
    overflows for long histories. Spark-first answer: one shuffle on the
    key, collect the ordered sequence per user, fold it with the
    higher-order ``aggregate`` — JVM-side expression evaluation, no UDF,
    no driver loop. DuckDB's ``list_reduce`` runs the identical
    left-to-right fold, and with α an exact binary fraction every
    intermediate is bitwise equal across engines (init = first element,
    the EWMA_1 = x_1 convention on both sides).

    Scale shape: the shuffle is the same per-user exchange
    sessionization pays; the per-key sequence must fit a task (true of
    any per-entity history operator — beyond that, the streaming twin
    territory: applyInPandasWithState carries the recurrence as state).
    Order is pinned by (ts, event_id) so duplicate timestamps cannot
    flip the fold."""
    ev = load_table(spark, sf_dir, "events")
    seq = (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "value"))
            ).alias("seq"),
        )
    )
    vals = F.transform(F.col("seq"), lambda s: s["value"])
    ewma = F.aggregate(
        F.slice(vals, 2, F.size(vals) - 1),
        F.element_at(vals, 1),
        lambda acc, x: acc * F.lit(_EWMA_ALPHA) + x * F.lit(_EWMA_ALPHA),
    )
    return seq.select(
        "user_id",
        F.col("n_events").cast("long").alias("n_events"),
        F.round(ewma, 6).alias("ewma"),
    )


# --- robust (MAD) outlier screen ------------------------------------------------

#: Modified z-score threshold (Iglewicz & Hoaglin's 3.5) and the
#: 0.6745 normal-consistency constant that makes MAD comparable to σ.
MAD_Z_THRESHOLD = 3.5
MAD_CONSISTENCY = 0.6745

_MAD_OUTLIERS_SQL = f"""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY 1),
mad AS (
  SELECT e.event_type, m.med,
         quantile_cont(abs(e.value - m.med), 0.5) AS mad
  FROM events e JOIN med m USING (event_type)
  GROUP BY 1, 2)
SELECT e.event_id, e.event_type,
       round(e.value, 2) AS value,
       round({MAD_CONSISTENCY} * (e.value - m.med) / m.mad, 4) AS robust_z
FROM events e JOIN mad m USING (event_type)
WHERE abs({MAD_CONSISTENCY} * (e.value - m.med) / m.mad) > {MAD_Z_THRESHOLD}
"""


@register("events_mad_outliers", _MAD_OUTLIERS_SQL)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outliers per event type (Iglewicz & Hoaglin
    modified z-score) — the screen that survives what breaks the 3σ one:
    heavy outliers inflate the mean AND the stddev, masking themselves;
    the median and the median absolute deviation have a 50% breakdown
    point, so a poisoned feed cannot hide its own anomalies. Same
    two-pass shape as ``events_value_outliers``: two tiny per-type
    percentile aggregates broadcast back onto the scan (Spark
    percentile == DuckDB quantile_cont, both interpolate), filter stays
    in codegen, only outliers survive."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)).alias("mad"))
    )
    rz = F.lit(MAD_CONSISTENCY) * (F.col("value") - F.col("med")) / F.col("mad")
    return (
        ev.join(F.broadcast(mad), "event_type")
        .filter(F.abs(rz) > MAD_Z_THRESHOLD)
        .select(
            "event_id",
            "event_type",
            F.round("value", 2).alias("value"),
            F.round(rz, 4).alias("robust_z"),
        )
    )


# --- sketch-based (mergeable) MAD outlier screen ---------------------------------
#
# events_mad_outliers is exact but rides F.percentile, whose aggregation
# state is every distinct value per group — per-group memory proportional
# to the DATA, the documented single-node shortcut of the percentile
# family (see events_value_percentiles). This twin is the 100 TB exit:
# median and MAD come from BRACKET-REFINED equi-width histograms, so every
# aggregation is mergeable with O(bins) state per group and every pass is
# one linear scan.
#
# Why refinement and not one histogram: a single equi-width pass
# COLLAPSES under exactly the poisoned feed MAD exists for. With gross
# 1e4× outliers stretching the range, the entire bulk lands in bin 0 —
# med_est = vmin, mad_est = 0, and the screen returns NOTHING
# (tools/stress.py robust caught this at 10M rows: 0 flagged vs the exact
# screen's 790k — this repo's recurring lesson that plans must be
# measured under planted pathologies). The fix: after each histogram
# pass, zoom the bracket [lo, hi) into the one bin holding the target
# order statistic and re-bin. L passes localize the median to
# (hi0-lo0)/bins^L — at 1024 bins and 3 levels, a 2^-30 of the range,
# below any screening-relevant error — while per-pass state stays
# O(bins) and out-of-bracket rows cost one comparison (bins -1/B catch
# them, and the cumulative-rank arithmetic stays exact).
#
#   pass 1        per-type min/max/count (exact, mergeable)
#   passes 2..L+1 value ladder -> med_est
#   passes ..2L+1 |v - med_est| ladder -> mad_est (the deviation range
#                 needs NO extra scan: dmax = greatest(med-vmin, vmax-med)
#                 falls out of pass-1 stats)
#   final pass    filter |0.6745·(v-med)/mad| > 3.5 (codegen)
#
# Fully value-oracled: both engines run the identical IEEE bin/edge/
# bracket arithmetic, CTE-per-level in the oracle.

MAD_SKETCH_BINS = 1024
MAD_SKETCH_LEVELS = 3


def _refine_bracket(events, br, dev, bins: int, levels: int) -> DataFrame:
    """One median-localizing ladder. ``br`` is the per-type bracket frame
    (event_type, lo, hi, n, [med]); ``dev()`` builds the measured Column
    against the (events ⋈ br) frame. The target order statistic (the
    smallest rank r with 2r >= n) lies in [lo, hi] at every level — rows
    below/above the bracket land in sentinel bins -1/``bins`` so the
    cumulative rank stays exact — hence the final ``lo`` is within
    (hi0-lo0)/bins^levels of it."""
    w = Window.partitionBy("event_type").orderBy("bin")
    carry = [c for c in br.columns if c != "event_type"]
    extra = [c for c in carry if c not in ("lo", "hi")]
    for _ in range(levels):
        v = dev()
        bin_ = (
            F.when(F.col("hi") == F.col("lo"), F.lit(0))
            .when(v < F.col("lo"), F.lit(-1))
            .when(v >= F.col("hi"), F.lit(bins))
            .otherwise(
                F.least(
                    F.lit(bins - 1),
                    F.floor((v - F.col("lo")) / (F.col("hi") - F.col("lo")) * bins),
                )
            )
            .cast("long")
        )
        g = (
            events.join(F.broadcast(br), "event_type")
            .withColumn("bin", bin_)
            .groupBy("event_type", *carry, "bin")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        picked = (
            g.withColumn("cum", F.sum("c").over(w))
            .groupBy("event_type", *carry)
            .agg(
                F.min(
                    F.when(F.col("cum") * 100 >= F.col("n") * 50, F.col("bin"))
                ).alias("mbin")
            )
        )
        width = (F.col("hi") - F.col("lo")) / bins
        br = picked.select(
            "event_type",
            (F.col("lo") + F.col("mbin") * width).alias("lo"),
            (F.col("lo") + (F.col("mbin") + F.lit(1)) * width).alias("hi"),
            *extra,
        )
    return br


def mad_sketch_stats(
    events: DataFrame,
    bins: int = MAD_SKETCH_BINS,
    levels: int = MAD_SKETCH_LEVELS,
) -> DataFrame:
    """(event_type, med, mad): bracket-refined histogram median and MAD —
    passes 1..2L+1 of the screen (see section comment). Each estimate is
    its final bracket's lower edge, within (range)/bins^levels of the
    exact order statistic."""
    stats = events.groupBy("event_type").agg(
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        F.count(F.lit(1)).alias("n"),
    )
    vbr = stats.select(
        "event_type", F.col("vmin").alias("lo"), F.col("vmax").alias("hi"), "n"
    )
    vbr = _refine_bracket(events, vbr, lambda: F.col("value"), bins, levels)
    medt = (
        stats.join(vbr.select("event_type", F.col("lo").alias("med")), "event_type")
        .select(
            "event_type",
            F.lit(0.0).alias("lo"),
            F.greatest(
                F.col("med") - F.col("vmin"), F.col("vmax") - F.col("med")
            ).alias("hi"),
            "n",
            "med",
        )
    )
    dbr = _refine_bracket(
        events, medt, lambda: F.abs(F.col("value") - F.col("med")), bins, levels
    )
    return dbr.select("event_type", "med", F.col("lo").alias("mad"))


def mad_outliers_sketch(
    events: DataFrame,
    bins: int = MAD_SKETCH_BINS,
    levels: int = MAD_SKETCH_LEVELS,
) -> DataFrame:
    """(event_id, event_type, value, robust_z): the histogram-sketch
    robust outlier screen — same output contract as the exact
    ``events_mad_outliers``, mergeable-state plan (see section comment)."""
    mad = mad_sketch_stats(events, bins, levels)
    rz = F.lit(MAD_CONSISTENCY) * (F.col("value") - F.col("med")) / F.col("mad")
    return (
        events.join(F.broadcast(mad), "event_type")
        .filter((F.col("mad") > 0) & (F.abs(rz) > MAD_Z_THRESHOLD))
        .select(
            "event_id",
            "event_type",
            F.round("value", 2).alias("value"),
            F.round(rz, 4).alias("robust_z"),
        )
    )


def _mad_sketch_sql(
    bins: int = MAD_SKETCH_BINS, levels: int = MAD_SKETCH_LEVELS
) -> str:
    """CTE-per-level oracle mirroring :func:`_refine_bracket` literally."""

    def ladder(prefix: str, v: str, extra: str) -> list[str]:
        ctes = []
        for i in range(1, levels + 1):
            src = f"{prefix}br{i - 1}"
            ctes.append(
                f"""{prefix}b{i} AS (
  SELECT e.event_type, b.lo, b.hi, b.n{extra},
         CASE WHEN b.hi = b.lo THEN 0
              WHEN {v} < b.lo THEN -1
              WHEN {v} >= b.hi THEN {bins}
              ELSE least({bins - 1}, floor(({v} - b.lo) / (b.hi - b.lo) * {bins}))
         END::BIGINT AS bin,
         count(*)::BIGINT AS c
  FROM events e JOIN {src} b USING (event_type)
  GROUP BY ALL)"""
            )
            ctes.append(
                f"""{prefix}c{i} AS (
  SELECT *, sum(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum
  FROM {prefix}b{i})"""
            )
            ctes.append(
                f"""{prefix}br{i} AS (
  SELECT event_type,
         lo + mbin * ((hi - lo) / {bins}) AS lo,
         lo + (mbin + 1) * ((hi - lo) / {bins}) AS hi,
         n{extra.replace('b.', '')}
  FROM (SELECT event_type, lo, hi, n{extra.replace('b.', '')},
               min(CASE WHEN cum * 100 >= n * 50 THEN bin END) AS mbin
        FROM {prefix}c{i} GROUP BY ALL))"""
            )
        return ctes

    ctes = [
        """stats AS (
  SELECT event_type, min(value) AS vmin, max(value) AS vmax,
         count(*)::BIGINT AS n
  FROM events GROUP BY event_type)""",
        "vbr0 AS (SELECT event_type, vmin AS lo, vmax AS hi, n FROM stats)",
        *ladder("v", "e.value", ""),
        f"""dbr0 AS (
  SELECT s.event_type, 0.0::DOUBLE AS lo,
         greatest(m.lo - s.vmin, s.vmax - m.lo) AS hi,
         s.n, m.lo AS med
  FROM stats s JOIN vbr{levels} m USING (event_type))""",
        *ladder("d", "abs(e.value - b.med)", ", b.med"),
        f"madt AS (SELECT event_type, med, lo AS mad FROM dbr{levels})",
    ]
    joined = ",\n".join(ctes)
    return f"""
WITH {joined}
SELECT e.event_id, e.event_type,
       round(e.value, 2) AS value,
       round({MAD_CONSISTENCY} * (e.value - m.med) / m.mad, 4) AS robust_z
FROM events e JOIN madt m USING (event_type)
WHERE m.mad > 0
  AND abs({MAD_CONSISTENCY} * (e.value - m.med) / m.mad) > {MAD_Z_THRESHOLD}
"""


@register("events_mad_outliers_sketch", _mad_sketch_sql())
def events_mad_outliers_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeable-state twin of ``events_mad_outliers`` (see the
    section comment: 2·levels+2 linear scans, O(bins) per-group state,
    median and MAD from bracket-refined cross-engine histograms)."""
    return mad_outliers_sketch(load_table(spark, sf_dir, "events"))


# --- CUSUM drift screen ------------------------------------------------------
#
# The change-point companion of the MAD screens: MAD flags individual
# outlier rows, CUSUM flags SUSTAINED level shifts (a feed whose values
# drift 10% for an afternoon never trips a 3.5-sigma row test). Classic
# two-sided CUSUM around a per-type reference, evaluated per (type, day)
# so every fold is day-bounded — the same per-task-sequence argument as
# the EWMA recurrence, plus a partition key that keeps 100 TB of history
# embarrassingly parallel.
#
# Determinism: the reference is the per-type MEDIAN (interpolated order
# statistic — both engines derive it from the same two order stats, so
# any divergence is a final-ulp interpolation difference that stays
# bounded through the fold: max(0, .) is 1-Lipschitz, so trajectories
# can never split at a clamp by more than the accumulated ulps), and the
# fold order is pinned by (ts, event_id). The fold state carries both
# directions AND their running peaks in one struct so a single pass
# yields the screen; DuckDB's list_reduce needs acc type == element
# type, hence the zero-padded element structs + prepended zero state.

_CUSUM_DAY_US = 86_400_000_000

_CUSUM_SQL = f"""
WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
             FROM events GROUP BY 1),
seq AS (SELECT e.event_type,
               (epoch_us(ts) // {_CUSUM_DAY_US})::BIGINT AS day,
               count(*)::BIGINT AS n_events,
               list(value::DOUBLE ORDER BY ts, event_id) AS vals,
               any_value(med.med) AS med
        FROM events e JOIN med USING (event_type)
        GROUP BY 1, 2),
f AS (SELECT event_type, day, n_events,
             -- field order is LOAD-BEARING: DuckDB's list_reduce
             -- overwrites accumulator fields IN DECLARATION ORDER as the
             -- struct_pack evaluates, so a later field referencing an
             -- earlier one reads the NEW value (caught by a
             -- 3-element fold: mm came out 4.0 where the snapshot fold
             -- gives 3.0). Peaks (mp, mm) therefore come FIRST — they
             -- read sp/sm before those are overwritten — making the
             -- fold correct under both snapshot and in-place semantics.
             list_reduce(
               list_prepend(
                 struct_pack(mp := 0.0::DOUBLE, mm := 0.0::DOUBLE,
                             sp := 0.0::DOUBLE, sm := 0.0::DOUBLE),
                 list_transform(vals, x -> struct_pack(
                     mp := 0.0::DOUBLE, mm := 0.0::DOUBLE,
                     sp := x, sm := 0.0::DOUBLE))),
               (acc, x) -> struct_pack(
                  mp := greatest(acc.mp, greatest(0.0, acc.sp + (x.sp - med))),
                  mm := greatest(acc.mm, greatest(0.0, acc.sm - (x.sp - med))),
                  sp := greatest(0.0, acc.sp + (x.sp - med)),
                  sm := greatest(0.0, acc.sm - (x.sp - med)))) AS st
      FROM seq)
SELECT event_type, day, n_events,
       round(st.mp, 6) AS peak_pos, round(st.mm, 6) AS peak_neg
FROM f
"""


@register("events_cusum_drift", _CUSUM_SQL)
def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (event_type, epoch-day) two-sided CUSUM peaks around the
    type's corpus median — the sustained-shift screen: rank days by
    peak_pos/peak_neg to find where a feed ran hot or cold for hours
    (row-level z screens are blind to this).

    One shuffle on (type, day); per group the ordered day sequence folds
    through a 4-field struct accumulator (both CUSUM directions + their
    running peaks) with the higher-order ``aggregate`` — JVM expression
    codegen, no UDF; the per-type median broadcasts back onto the scan.
    FULL value oracle via DuckDB's identical list_reduce fold."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    seq = (
        ev.groupBy("event_type", F.expr(f"unix_micros(ts) DIV {_CUSUM_DAY_US}").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "value"))
            ).alias("seq"),
        )
        .join(F.broadcast(med), "event_type")
    )
    vals = F.transform(F.col("seq"), lambda s: s["value"])
    zero = F.lit(0.0)
    acc0 = F.struct(
        zero.alias("sp"), zero.alias("sm"), zero.alias("mp"), zero.alias("mm")
    )
    m = F.col("med")

    def step(acc, x):
        sp = F.greatest(zero, acc["sp"] + (x - m))
        sm = F.greatest(zero, acc["sm"] - (x - m))
        return F.struct(
            sp.alias("sp"),
            sm.alias("sm"),
            F.greatest(acc["mp"], sp).alias("mp"),
            F.greatest(acc["mm"], sm).alias("mm"),
        )

    st = F.aggregate(vals, acc0, step)
    return seq.select(
        "event_type",
        F.col("day").cast("long").alias("day"),
        F.col("n_events").cast("long").alias("n_events"),
        F.round(st["mp"], 6).alias("peak_pos"),
        F.round(st["mm"], 6).alias("peak_neg"),
    )
