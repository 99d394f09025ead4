"""Phase breakdown of graph_ktruss_incremental at sf0.1 (guide §1).

Times each phase of the registered composition separately so the round's
optimization targets the dominant one:
  P1 base edge build (90% orders)        -> localCheckpoint + count
  P2 seed enumeration edge_support(base) -> materialized via noop-count
  P3 truss_support_delta (10% delta)     -> localCheckpoint + count
  P4 warm peel ktruss(support0=...)      -> noop sink

Run: SPARK_GRAFT_TRUSS_DEBUG=1 python tools/truss_inc_probe.py [sf_dir]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vectordb_from_scratch_spark.session import get_spark, load_table  # noqa: E402
from vectordb_from_scratch_spark.operators import graph as G  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("truss-inc-probe")
    sc = spark.sparkContext
    t0 = time.perf_counter()

    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))

    sc.setJobDescription("P1 base edge build")
    t = time.perf_counter()
    base = G.copurchase_edges_from_items(
        items.filter(F.col("ok") % 10 != 0)
    ).localCheckpoint()
    n_base = base.count()
    print(f"P1 base build: {time.perf_counter() - t:.1f}s  edges={n_base}")

    sc.setJobDescription("P2 seed edge_support(base)")
    t = time.perf_counter()
    base_sup = G.edge_support(base.select("src", "dst")).localCheckpoint()
    n_sup = base_sup.count()
    print(f"P2 seed enum: {time.perf_counter() - t:.1f}s  rows={n_sup}")

    sc.setJobDescription("P3 truss_support_delta")
    t = time.perf_counter()
    maintained = G.truss_support_delta(
        base, base_sup, items.filter(F.col("ok") % 10 == 0)
    ).localCheckpoint()
    n_m = maintained.count()
    print(f"P3 support delta: {time.perf_counter() - t:.1f}s  rows={n_m}")

    sc.setJobDescription("P4 warm peel")
    t = time.perf_counter()
    out = G.ktruss(
        maintained.select("src", "dst"),
        support0=maintained.select("src", "dst", "sup"),
    )
    out.write.format("noop").mode("overwrite").save()
    print(f"P4 peel: {time.perf_counter() - t:.1f}s")
    print(f"TOTAL: {time.perf_counter() - t0:.1f}s")


if __name__ == "__main__":
    main()
