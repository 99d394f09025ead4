"""Sources & sinks — format connectors with one interface.

The reference's only storage is MongoDB collections behind motor cursors
(``app/core/mongo_storage.py:100-220``); it has no file formats and no
connectors (SURVEY.md §2.3 "Scans/sources/sinks"). This module is the
engine's connector surface: batch read/write over parquet, CSV, JSON
(+ streaming reads for the same formats), with schema enforcement at the
boundary the way the reference validates at its Pydantic boundary.

Design rules:
- **parquet is the canonical format** (columnar, statistics, predicate
  pushdown + column pruning); CSV/JSON exist for interchange. ``read``
  always returns the DECLARED schema, so a CSV round-trip preserves types
  (CSV itself is untyped).
- writes go through ``write(df, path, fmt, partition_by=...)`` so the
  partition layout (e.g. ``library_id``) is chosen once at the sink, where
  partition pruning is earned.
- ``read_stream`` wires the same formats into Structured Streaming (file
  source); swapping in Kafka changes only this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FORMATS = ("parquet", "csv", "json", "orc")


def _check_fmt(fmt: str) -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; one of {FORMATS}")


def read(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Batch read. Parquet may infer (schema travels with the data);
    CSV/JSON require a declared schema — silent inference is how string
    columns turn into doubles in one partition and longs in another.

    ``merge_schema=True`` (parquet only) reconciles files written by
    DIFFERENT schema generations: a dataset that gained a column keeps
    its old files readable, the missing column surfacing as NULL. The
    default reads the latest footer only — Spark's own default, which
    silently DROPS a column that exists only in older files; evolution
    must be asked for, never inferred."""
    _check_fmt(fmt)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt not in ("parquet", "orc"):
        # parquet/ORC are self-describing (schema travels in the footer)
        raise ValueError(f"{fmt} reads require an explicit schema")
    if merge_schema:
        if fmt != "parquet":
            raise ValueError("merge_schema is a parquet-only option")
        reader = reader.option("mergeSchema", "true")
    if fmt == "csv":
        return reader.option("header", "true").csv(path)
    if fmt == "json":
        return reader.json(path)
    if fmt == "orc":
        return reader.orc(path)
    return reader.parquet(path)


def write(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: str | list[str] | None = None,
) -> None:
    _check_fmt(fmt)
    writer = df.write.mode(mode)
    if partition_by:
        cols = [partition_by] if isinstance(partition_by, str) else partition_by
        writer = writer.partitionBy(*cols)
    if fmt == "csv":
        writer.option("header", "true").csv(path)
    elif fmt == "json":
        writer.json(path)
    elif fmt == "orc":
        writer.orc(path)
    else:
        writer.parquet(path)


def read_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream over the same formats (schema mandatory — a
    stream can never infer). One file per micro-batch by default."""
    _check_fmt(fmt)
    reader = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
    )
    if fmt == "csv":
        return reader.option("header", "true").csv(path)
    if fmt == "json":
        return reader.json(path)
    if fmt == "orc":
        return reader.orc(path)
    return reader.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_cols: str | list[str] | None = None,
    location: str | None = None,
) -> None:
    """Write ``df`` as a bucketed parquet table: rows pre-hash-partitioned
    on the join/agg key so every later join or aggregation on that key is
    shuffle-free (the scan's bucket spec satisfies the required child
    distribution, so Catalyst plans no Exchange on either side).

    Layout discipline for a fact table joined daily at 100 TB:

    - ``repartition(n_buckets, key)`` FIRST. Spark's bucket-id hash and its
      shuffle hash are the same Murmur3-on-value, so after the repartition
      each task holds exactly one bucket and writes exactly one file.
      Without it every task writes a sliver of every bucket —
      ``n_tasks x n_buckets`` small files, the classic bucketed-write
      explosion.
    - ``sortBy`` within buckets keeps each bucket file internally sorted,
      so the partition-local Sort under a sort-merge join degenerates to a
      near-no-op pass over already-ordered runs. (Spark ≥3.0 still PLANS
      the Sort node by default — eliminating it requires file listing at
      planning time, gated behind
      ``spark.sql.legacy.bucketedTableScan.outputOrdering``.)
    - an explicit ``location`` pins the data directory independent of the
      caller's ``spark.sql.warehouse.dir`` (which defaults to the process
      cwd); a fresh session re-registers the same files via
      ``register_bucketed`` instead of rewriting them.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if location is not None:
        import shutil

        shutil.rmtree(location, ignore_errors=True)
    writer = (
        df.repartition(n_buckets, bucket_col)
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_cols:
        cols = [sort_cols] if isinstance(sort_cols, str) else sort_cols
        writer = writer.sortBy(*cols)
    if location is not None:
        writer = writer.option("path", location)
    writer.saveAsTable(table)


def register_bucketed(
    spark: SparkSession,
    table: str,
    schema: T.StructType,
    bucket_col: str,
    n_buckets: int,
    location: str,
    sort_cols: str | list[str] | None = None,
) -> None:
    """Re-attach an existing bucketed directory (written by
    ``write_bucketed``) to a NEW session's catalog without rewriting data.

    Bucket metadata lives in the catalog, not in the parquet files, and the
    default in-memory catalog forgets tables when the session ends — so a
    second session (the driver's vanilla session, the next cluster job)
    must re-declare the same bucket spec over the same LOCATION. The DDL
    must match what was written: same column order, same bucket column,
    same count — a mismatched declaration silently yields wrong joins,
    which is why this helper derives nothing and requires everything."""
    cols = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)
    sort_clause = ""
    if sort_cols:
        sc = [sort_cols] if isinstance(sort_cols, str) else sort_cols
        sort_clause = f"SORTED BY ({', '.join(sc)}) "
    spark.sql(
        f"CREATE TABLE {table} ({cols}) USING parquet "
        f"CLUSTERED BY ({bucket_col}) {sort_clause}INTO {n_buckets} BUCKETS "
        f"LOCATION '{location}'"
    )
