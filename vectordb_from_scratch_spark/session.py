"""SparkSession factory + table loading helpers.

The reference app wires a MongoStorage + VectorDBService at startup
(reference ``app/main.py:34-52``); our analog is a SparkSession with
scale-appropriate defaults and parquet tables on disk.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: Tables the driver materializes at /root/testdata/sf*/ (TESTDATA.md).
DRIVER_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(app_name: str = "vectordb_from_scratch_spark", cpus: str | None = None) -> SparkSession:
    """Build a local SparkSession with defaults that mirror what we'd set on
    a real cluster: AQE on (runtime re-planning, skew handling, broadcast
    conversion), Arrow on (fast pandas_udf transfer), modest shuffle
    partition count for local mode.

    On a 1000-executor cluster only ``master`` and ``shuffle.partitions``
    change; every operator in this package is written against the DataFrame
    API so the same plans scale out unchanged.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    # One BLAS thread per python worker: task-level parallelism comes from
    # Spark (`cpus` concurrent workers); letting each worker's OpenBLAS
    # also spawn `cpus` threads oversubscribes cores ~32x and measurably
    # slows every Arrow matmul kernel. Workers inherit this env in local
    # mode; on a cluster set spark.executorEnv.* to the same values.
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.default.parallelism", cpus)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet stores TIMESTAMP(NANOS) which vanilla Spark rejects
        # (PARQUET_TYPE_ILLEGAL); read as long and convert in load_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver parquet table. Plain ``spark.read.parquet`` so
    Catalyst gets predicate pushdown + column pruning at the scan.

    ``events.ts`` has shipped as parquet TIMESTAMP(NANOS) (rounds 1-2) and
    as plain timestamp[us] without UTC adjustment (round 3+), and we must
    work under *any* caller's SparkSession (the correctness harness builds
    its own, without our ``get_spark`` defaults). So normalize whatever
    arrives to a TIMESTAMP_LTZ whose epoch equals the stored wall-clock
    read as UTC — the same semantics DuckDB's naive-timestamp view gives
    the oracle:

    - NANOS + nanosAsLong → bigint → ``timestamp_micros(ts DIV 1000)``
      (exact integer division — no double rounding);
    - timestamp[us], isAdjustedToUTC=false → TIMESTAMP_NTZ under Spark 4's
      default inference → pure-NTZ ``timestampdiff`` from the NTZ epoch,
      then ``timestamp_micros``. NTZ→LTZ via CAST or to_utc_timestamp is
      session-timezone-dependent; timestampdiff(NTZ, NTZ) is not."""
    from pyspark.errors import AnalysisException

    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass  # older/locked sessions: fall through and hope the read works
    try:
        df = spark.read.parquet(path)
    except AnalysisException:
        # A session that already cached a rejected footer, or one where the
        # conf wasn't applied above: set it explicitly and retry once.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
    if name == "events":
        df = normalize_event_ts(df)
    return df


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to TIMESTAMP_LTZ with epoch == the
    stored wall clock read as UTC, independent of the session timezone.
    Accepts bigint nanos (legacy nanosAsLong reads), TIMESTAMP_NTZ
    (parquet timestamp[us] without UTC adjustment), or an already-LTZ
    timestamp (left untouched)."""
    from pyspark.sql import functions as F

    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} DIV 1000")))
    if dtype == "timestamp_ntz":
        return df.withColumn(
            col,
            F.timestamp_micros(
                F.expr(f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})")
            ),
        )
    return df


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Fan-out rebalance: round-robin repartition a NARROW input ahead of
    per-row explosion work (shingles, grams, signatures, per-doc BLAS)
    whose cost is many times the input bytes — but ONLY when the scan
    arrived with fewer splits than the target parallelism.

    Why this exists (r6): Spark assigns parquet splits per row group, and
    a fixture-scale table is ONE row group — so every explode-heavy
    operator was running its entire fan-out on a single core while 31
    idled (measured: text_repetition_scores 5.9s → 0.9s at sf0.1).
    At 100 TB the same scan arrives with thousands of row groups, the
    partition count already exceeds the target, and this is a no-op —
    exactly the semantics you want: the shuffle moves only the narrow
    input rows, and only when the cluster would otherwise be idle.
    The partition-count probe is driver-side metadata (file listing),
    not a job."""
    target = partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in DRIVER_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view so ``spark.sql`` queries
    can reference them by name (mirrors the driver's DuckDB view setup)."""
    for name in DRIVER_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
