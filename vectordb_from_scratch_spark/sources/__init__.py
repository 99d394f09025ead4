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

FORMATS = ("parquet", "csv", "json")


def _check_fmt(fmt: str) -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; one of {FORMATS}")


def read(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
) -> DataFrame:
    """Batch read. Parquet may infer (schema travels with the data);
    CSV/JSON require a declared schema — silent inference is how string
    columns turn into doubles in one partition and longs in another."""
    _check_fmt(fmt)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt != "parquet":
        raise ValueError(f"{fmt} reads require an explicit schema")
    if fmt == "csv":
        return reader.option("header", "true").csv(path)
    if fmt == "json":
        return reader.json(path)
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
    return reader.parquet(path)
