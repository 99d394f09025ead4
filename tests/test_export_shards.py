"""Training-shard export: placement, ordering, idempotency.

The manifest's value parity vs the DuckDB oracle is covered by
tests/test_oracle_parity.py (export_shard_manifest is a registered
query); these tests pin the physical properties the manifest can't see.
"""

import glob
import os

import pytest

from vectordb_from_scratch_spark.operators import export_shards


@pytest.fixture(scope="module")
def export_path(spark, sf_oracle):
    return export_shards.export_training_shards(spark, sf_oracle)


def test_one_file_per_shard(export_path):
    for shard in range(export_shards.N_SHARDS):
        files = glob.glob(os.path.join(export_path, f"shard={shard}", "*.parquet"))
        assert len(files) == 1, f"shard {shard}: {len(files)} files"


def test_rows_sorted_within_each_shard_file(export_path):
    import pyarrow.parquet as pq

    for shard in range(export_shards.N_SHARDS):
        [f] = glob.glob(os.path.join(export_path, f"shard={shard}", "*.parquet"))
        ids = pq.read_table(f, columns=["doc_id"]).column("doc_id").to_pylist()
        assert ids == sorted(ids)
        assert len(ids) > 0


def test_reexport_is_idempotent_no_rewrite(spark, sf_oracle, export_path):
    inodes = {
        f: os.stat(f).st_ino for f in glob.glob(os.path.join(export_path, "**", "*.parquet"))
    }
    again = export_shards.export_training_shards(spark, sf_oracle)
    assert again == export_path
    for f, ino in inodes.items():
        assert os.stat(f).st_ino == ino, f"{f} was rewritten"


def test_shard_dir_matches_hash_rule(spark, sf_oracle, export_path):
    # the directory a document landed in must equal the hash rule applied
    # to the source row — placement is derivable without reading the export
    from pyspark.sql import functions as F

    from vectordb_from_scratch_spark.session import load_table

    back = spark.read.parquet(export_path).select(
        "doc_id", F.col("shard").cast("int").alias("shard_disk")
    )
    src = load_table(spark, sf_oracle, "documents").select(
        "doc_id",
        export_shards.shard_col("doc_id", export_shards.N_SHARDS).alias("shard_rule"),
    )
    bad = (
        back.join(src, "doc_id", "full_outer")
        .where(
            F.col("shard_disk").isNull()
            | F.col("shard_rule").isNull()
            | (F.col("shard_disk") != F.col("shard_rule"))
        )
        .count()
    )
    assert bad == 0
