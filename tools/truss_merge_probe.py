"""Break down merge_edge_delta cost at sf0.1 (guide §1)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vectordb_from_scratch_spark.session import get_spark, load_table  # noqa: E402
from vectordb_from_scratch_spark.operators import graph as G  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("truss-merge-probe")
    sc = spark.sparkContext

    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))

    t = time.perf_counter()
    base = G.copurchase_edges_from_items(
        items.filter(F.col("ok") % 10 != 0)
    ).localCheckpoint()
    print(f"warm base: {time.perf_counter() - t:.1f}s  edges={base.count()}")

    new_items = items.filter(F.col("ok") % 10 == 0)

    sc.setJobDescription("M1 delta edge derivation")
    t = time.perf_counter()
    delta = G.copurchase_edges_from_items(new_items).localCheckpoint()
    n_delta = delta.count()
    print(f"M1 delta derive: {time.perf_counter() - t:.1f}s  rows={n_delta}")

    sc.setJobDescription("M2 union + groupBy sum")
    t = time.perf_counter()
    merged = (
        base.select("src", "dst", "n_orders")
        .unionByName(delta)
        .groupBy("src", "dst")
        .agg(F.sum("n_orders").cast("long").alias("n_orders"))
    ).localCheckpoint()
    print(f"M2 merge agg: {time.perf_counter() - t:.1f}s  rows={merged.count()}")


if __name__ == "__main__":
    main()
