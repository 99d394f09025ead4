"""Parquet schema evolution through the sources layer.

Contract under test: a dataset whose later files gained a column stays
fully readable with ``merge_schema=True`` (old rows surface NULL for the
new column); the default read keeps Spark's latest-footer behavior; and
an explicit declared schema projects old and new files alike — the three
behaviors a long-lived 100 TB dataset cycles through as its schema
grows.
"""

from __future__ import annotations

import pyspark.sql.types as T
import pytest

from vectordb_from_scratch_spark import sources


@pytest.fixture(scope="module")
def evolved_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("evolve")
    gen1 = spark.createDataFrame([(1, "a"), (2, "b")], "id LONG, name STRING")
    gen1.coalesce(1).write.mode("append").parquet(str(root))
    gen2 = spark.createDataFrame(
        [(3, "c", 0.5), (4, "d", 0.9)], "id LONG, name STRING, score DOUBLE"
    )
    gen2.coalesce(1).write.mode("append").parquet(str(root))
    return str(root)


def test_merge_schema_unions_generations(spark, evolved_dir):
    df = sources.read(spark, evolved_dir, merge_schema=True)
    assert set(df.columns) == {"id", "name", "score"}
    rows = {r["id"]: r["score"] for r in df.collect()}
    assert rows[1] is None and rows[2] is None  # pre-evolution rows
    assert rows[3] == 0.5 and rows[4] == 0.9


def test_declared_schema_projects_both_generations(spark, evolved_dir):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    df = sources.read(spark, evolved_dir, schema=schema)
    assert df.count() == 4
    assert {r["id"] for r in df.filter("score IS NULL").collect()} == {1, 2}


def test_merge_schema_rejected_for_row_formats(spark, evolved_dir):
    with pytest.raises(ValueError, match="parquet-only"):
        sources.read(
            spark,
            evolved_dir,
            fmt="json",
            schema=T.StructType([T.StructField("id", T.LongType())]),
            merge_schema=True,
        )
