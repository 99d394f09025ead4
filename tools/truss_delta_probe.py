"""Fine-grained breakdown of truss_support_delta at sf0.1 (guide §1)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vectordb_from_scratch_spark.session import get_spark, load_table  # noqa: E402
from vectordb_from_scratch_spark.operators import graph as G  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("truss-delta-probe")
    sc = spark.sparkContext

    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))

    base = G.copurchase_edges_from_items(
        items.filter(F.col("ok") % 10 != 0)
    ).localCheckpoint()
    base.count()
    base_sup = G.edge_support(base.select("src", "dst")).localCheckpoint()
    base_sup.count()
    new_items = items.filter(F.col("ok") % 10 == 0)
    print("--- warmup done; timing truss_support_delta internals ---")

    sc.setJobDescription("D1 merge_edge_delta")
    t = time.perf_counter()
    merged = G.merge_edge_delta(base, new_items).localCheckpoint()
    n_edges = merged.count()
    print(f"D1 merge: {time.perf_counter() - t:.1f}s  edges={n_edges}")

    sc.setJobDescription("D2 new-edge anti-join")
    t = time.perf_counter()
    new_e = merged.select("src", "dst").join(
        base.select("src", "dst"), ["src", "dst"], "left_anti"
    ).localCheckpoint()
    n_new = new_e.count()
    print(f"D2 anti-join: {time.perf_counter() - t:.1f}s  new_edges={n_new}")

    sc.setJobDescription("D3 frontier triangles")
    t = time.perf_counter()
    trid, n_cand = G._frontier_triangles(
        new_e, merged.select("src", "dst"), n_edges
    )
    c = G._triple_edge_counts(trid).localCheckpoint()
    n_c = c.count()
    print(f"D3 frontier enum: {time.perf_counter() - t:.1f}s  cand={n_cand} touched={n_c}")

    sc.setJobDescription("D4 final merge join")
    t = time.perf_counter()
    out = (
        merged.join(base_sup, ["src", "dst"], "left")
        .join(c, ["src", "dst"], "left")
        .select(
            "src", "dst", "n_orders",
            (F.coalesce(F.col("sup"), F.lit(0)) + F.coalesce(F.col("c"), F.lit(0))).alias("sup"),
        )
    )
    out.write.format("noop").mode("overwrite").save()
    print(f"D4 final join: {time.perf_counter() - t:.1f}s")


if __name__ == "__main__":
    main()
