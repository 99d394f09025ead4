"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship batch exact k-NN on sf0.001.
``queries()`` — one entry per implemented operator from SURVEY.md §2.
``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible query.

Conventions that keep the driver's hash-compare stable:
- every float output is computed in DOUBLE and rounded (6 decimals for
  similarity scores, 2-4 for money aggregates);
- every ranking pins the tie-break (score DESC, id ASC);
- row_number/count outputs are BIGINT on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from vectordb_from_scratch_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.QUERIES["knn_cosine_topk"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLE_SQL)
