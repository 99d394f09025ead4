"""Sub-step breakdown of graph_ktruss_incremental's four phases (r12,
guide §1): times each materialization point of the registered composition
separately so the optimization targets the dominant sub-step, not the
phase. Run: python tools/truss_inc_substeps.py [sf_dir]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vectordb_from_scratch_spark.session import get_spark, load_table  # noqa: E402
from vectordb_from_scratch_spark.operators import graph as G  # noqa: E402
from vectordb_from_scratch_spark.registry import track_persist  # noqa: E402


def step(sc, name, fn):
    sc.setJobDescription(name)
    t = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t
    print(f"{name}: {dt:.2f}s -> {out}", flush=True)
    return dt


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("truss-inc-substeps")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    t0 = time.perf_counter()

    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
    items_d = track_persist(items.distinct())
    step(sc, "P1a items distinct", lambda: items_d.count())

    base_lazy = G.copurchase_edges_from_items(
        items_d.filter(F.col("ok") % 10 != 0), pre_distinct=True
    )
    base = base_lazy.localCheckpoint(eager=False)
    step(sc, "P1b base edges derive+ckpt", lambda: base.count())
    n_base = base.count()

    # P2 substeps: orientation build, wedge stats, enum+explode+groupBy
    cur = base.select("src", "dst")
    oriented = track_persist(
        G.oriented_edges(cur, n_edges=n_base).repartition("u")
    )
    step(sc, "P2a orientation build", lambda: oriented.count())
    import vectordb_from_scratch_spark.operators.graph as g
    t = time.perf_counter()
    n_wedges, n_edges2 = g._wedge_stats(oriented)
    print(f"P2b wedge stats: {time.perf_counter()-t:.2f}s -> w={n_wedges} m={n_edges2}", flush=True)
    tri = G.triangle_enum(oriented)
    step(sc, "P2c enum (noop)", lambda: tri.write.format("noop").mode("overwrite").save())
    base_sup = G.edge_support(cur, oriented=oriented).localCheckpoint(eager=False)
    step(sc, "P2d support groupBy", lambda: base_sup.count())

    # P3 substeps
    new_items = items_d.filter(F.col("ok") % 10 == 0)
    merged = G.merge_edge_delta(base, new_items, pre_distinct=True).localCheckpoint(eager=False)
    step(sc, "P3a merge delta", lambda: merged.count())
    n_edges = merged.count()
    new_e = merged.select("src", "dst").join(
        base.select("src", "dst"), ["src", "dst"], "left_anti"
    ).localCheckpoint(eager=False)
    step(sc, "P3b new-edge anti-join", lambda: new_e.count())
    t = time.perf_counter()
    trid, n_cand = g._frontier_triangles(new_e, merged.select("src", "dst"), n_edges)
    trid = trid.localCheckpoint(eager=False)
    nt = trid.count()
    print(f"P3c frontier triangles: {time.perf_counter()-t:.2f}s -> cand={n_cand} tri={nt}", flush=True)
    delta = g._triple_edge_counts(trid)
    maintained = (
        merged.join(base_sup, ["src", "dst"], "left")
        .join(delta, ["src", "dst"], "left")
        .select(
            "src", "dst", "n_orders",
            (F.coalesce(F.col("sup"), F.lit(0)) + F.coalesce(F.col("c"), F.lit(0))).alias("sup"),
        )
        .localCheckpoint(eager=False)
    )
    step(sc, "P3d maintained 3-way join", lambda: maintained.count())

    # P4: the peel
    t = time.perf_counter()
    out = G.ktruss(
        maintained.select("src", "dst"),
        support0=maintained.select("src", "dst", "sup"),
    )
    out.write.format("noop").mode("overwrite").save()
    print(f"P4 peel: {time.perf_counter()-t:.2f}s", flush=True)
    print(f"TOTAL: {time.perf_counter()-t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
