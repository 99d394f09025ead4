"""Skew mitigation: salted two-phase aggregation and salted broadcast-free
joins.

At 100 TB a handful of hot keys (one viral document, one default
library_id, one empty-string token) can put 10% of the table into a single
reducer. AQE's skew-join splitting (enabled session-wide in
``session.get_spark``) handles sort-merge join skew at runtime; these
helpers cover the two shapes AQE does not rewrite:

- **salted_agg**: pre-aggregate on (key, salt) so a hot key's rows combine
  across `n_salts` reducers, then finish on key. Exact for any algebraic
  aggregate expressed as (partial, merge) — the classic two-phase combine,
  made explicit when the partial-combine that Spark already does map-side
  is not enough (e.g. high-cardinality payloads where map-side combine
  barely reduces).

- **salted_join**: replicate the small side `n_salts` times, salt the big
  side's key randomly; a hot join key fans across `n_salts` tasks. Use
  when the small side is too big to broadcast but the key histogram is
  spiky.

The `events_salted_type_totals` query proves exactness: salted result ==
plain groupBy == DuckDB oracle, on a grouping column with only 5 distinct
values (maximal skew for 32 reducers: without salting, 27 do nothing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_from_scratch_spark.registry import register
from vectordb_from_scratch_spark.session import load_table

DEFAULT_N_SALTS = 16


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    n_salts: int = DEFAULT_N_SALTS,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``partial_aggs`` run on (keys + salt); ``final_aggs`` merge the
    partials on keys alone. Aliases must line up: a partial
    ``F.sum(x).alias("s")`` is merged by a final ``F.sum("s").alias(...)``.
    """
    salt = (F.rand(seed=42) * n_salts).cast("int").alias("_salt")
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = DEFAULT_N_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join without broadcast: the big side gets a random
    salt in [0, n_salts); the small side is exploded once per salt value,
    so every (key, salt) bucket finds its match and a hot key's rows land
    on ``n_salts`` different reducers."""
    big_salted = big.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    small_salted = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = big_salted.join(small_salted, [key, "_salt"], how)
    return out.drop("_salt")


_SALTED_SQL = """
SELECT event_type,
       count(*)                 AS n_events,
       round(sum(value), 2)     AS total_value,
       round(max(value), 6)     AS max_value
FROM events
GROUP BY event_type
"""


@register("events_salted_type_totals", _SALTED_SQL)
def events_salted_type_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation over a 5-value grouping key (maximal skew) via the
    salted two-phase plan; the oracle is the plain GROUP BY — exactness is
    the whole point."""
    e = load_table(spark, sf_dir, "events")
    return salted_agg(
        e,
        keys=["event_type"],
        partial_aggs=[
            F.count(F.lit(1)).alias("_n"),
            F.sum("value").alias("_sum"),
            F.max("value").alias("_max"),
        ],
        final_aggs=[
            F.sum("_n").alias("n_events"),
            F.round(F.sum("_sum"), 2).alias("total_value"),
            F.round(F.max("_max"), 6).alias("max_value"),
        ],
    )


_SALTED_JOIN_SQL = """
WITH dim AS (SELECT event_type, avg(value) AS type_avg FROM events GROUP BY 1)
SELECT e.event_type,
       count(*)::BIGINT AS n,
       round(sum(e.value / d.type_avg), 2) AS rel_sum
FROM events e JOIN dim d USING (event_type)
GROUP BY 1
"""


@register("events_salted_skew_join", _SALTED_JOIN_SQL)
def events_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe JOIN demo: events (5-value key — maximal skew) joined to
    a per-type dimension through ``salted_join``, merge-hinted so the
    fixture actually exercises the salted SHUFFLE shape (Catalyst would
    broadcast a 40-row side and hide it). A hot key's rows land on
    n_salts reducers instead of one. The oracle is the plain join — the
    salt must be invisible in the answer, which is the whole contract."""
    e = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    dim = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.avg("value").alias("type_avg"))
        .hint("merge")
    )
    j = salted_join(e, dim, key="event_type")
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("value") / F.col("type_avg")), 2).alias("rel_sum"),
    )
