"""Stage-level profile of the triangle kernel at design point (r7):
where does the wall go as wedge volume scales — generation, the
wedge-shaped exchange, the closing join, or the count aggregate?

Usage: python tools/tri_profile.py <n_orders> [variant ...]
Variants: base (phase breakdown of the current kernel), packed
(single-long (x,y) join key — 2 longs/row through the exchange instead
of 3), bloom (optimizer runtime bloom filter injected from the closing
side into the wedge stream pre-shuffle).
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from vectordb_from_scratch_spark import registry  # noqa: E402
from vectordb_from_scratch_spark.operators import graph  # noqa: E402
from vectordb_from_scratch_spark.session import get_spark  # noqa: E402
from tools.stress import _graph_corpus  # noqa: E402


def _noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    n_orders = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    variants = sys.argv[2:] or ["base"]
    spark = get_spark("tri_profile")
    spark.sparkContext.setLogLevel("ERROR")
    items, edges, P, n_items, m, t_edges = _graph_corpus(spark, n_orders)
    print(f"corpus: {n_orders} orders, {m} edges ({t_edges:.1f}s derive)")

    t0 = time.perf_counter()
    oriented = graph.oriented_edges(edges.select("src", "dst")).repartition("u").persist()
    oriented.count()
    print(f"oriented build+persist: {time.perf_counter() - t0:6.2f}s")
    n_part = graph._wedge_partitions(oriented)
    print(f"wedge partitions: {n_part}")

    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    wedges = o1.join(
        o2,
        (F.col("o1.u") == F.col("o2.u"))
        & (F.struct("o1.dv", "o1.v") < F.struct("o2.dv", "o2.v")),
    ).select(
        F.col("o1.u").alias("apex"), F.col("o1.v").alias("x"), F.col("o2.v").alias("y")
    )
    closing = oriented.select(F.col("u").alias("x"), F.col("v").alias("y"))

    if "kernel" in variants:
        t0 = time.perf_counter()
        nt = graph.triangle_counts(
            edges.select("src", "dst"), oriented=oriented
        ).count()
        print(f"K kernel (bloom prefilter): {time.perf_counter() - t0:6.2f}s ({nt} nodes)")

    if "base" in variants:
        print(f"A wedge gen -> noop: {_noop(wedges):6.2f}s")
        print(
            f"B gen+exchange({n_part}) -> noop: "
            f"{_noop(wedges.repartition(n_part, 'x', 'y')):6.2f}s"
        )
        tri = wedges.repartition(n_part, "x", "y").join(
            closing.repartition(n_part, "x", "y").hint("shuffle_hash"), ["x", "y"]
        )
        print(f"C gen+exchange+join -> noop: {_noop(tri):6.2f}s")
        t0 = time.perf_counter()
        nt = (
            tri.select(F.explode(F.array("apex", "x", "y")).alias("part_id"))
            .groupBy("part_id")
            .agg(F.count(F.lit(1)).alias("n_triangles"))
            .count()
        )
        print(f"D full kernel: {time.perf_counter() - t0:6.2f}s ({nt} nodes)")
        t0 = time.perf_counter()
        ntri = tri.count()
        print(
            f"closure rate: {ntri:,} triangles / est wedges "
            f"({time.perf_counter() - t0:6.2f}s count)"
        )

    if "packed" in variants:
        # pack (x, y) into one long (ids < 2^31 here): 2 longs/row through
        # the wedge exchange instead of 3, single-long join key
        pw = wedges.select(
            "apex", (F.col("x") * F.lit(1 << 32) + F.col("y")).alias("xy")
        )
        pc = closing.select((F.col("x") * F.lit(1 << 32) + F.col("y")).alias("xy"))
        print(
            f"P packed gen+exchange -> noop: "
            f"{_noop(pw.repartition(n_part, 'xy')):6.2f}s"
        )
        ptri = pw.repartition(n_part, "xy").join(
            pc.repartition(n_part, "xy").hint("shuffle_hash"), ["xy"]
        )
        t0 = time.perf_counter()
        nt = (
            ptri.select(
                F.explode(
                    F.array(
                        "apex",
                        (F.col("xy") / F.lit(1 << 32)).cast("long"),
                        F.pmod("xy", F.lit(1 << 32)).cast("long"),
                    )
                ).alias("part_id")
            )
            .groupBy("part_id")
            .agg(F.count(F.lit(1)).alias("n_triangles"))
            .count()
        )
        print(f"P packed full: {time.perf_counter() - t0:6.2f}s ({nt} nodes)")

    if "bloom" in variants:
        confs = {
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "1GB",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
            "spark.sql.optimizer.runtime.bloomFilter.expectedNumItems": "30000000",
            "spark.sql.optimizer.runtime.bloomFilter.maxNumItems": "64000000",
        }
        old = {k: spark.conf.get(k, None) for k in confs}
        for k, v in confs.items():
            spark.conf.set(k, v)
        try:
            tri = wedges.repartition(n_part, "x", "y").join(
                closing.repartition(n_part, "x", "y").hint("shuffle_hash"),
                ["x", "y"],
            )
            plan = tri._sc._jvm.PythonSQLUtils.explainString(
                tri._jdf.queryExecution(), "formatted"
            ) if False else ""
            t0 = time.perf_counter()
            nt = (
                tri.select(F.explode(F.array("apex", "x", "y")).alias("part_id"))
                .groupBy("part_id")
                .agg(F.count(F.lit(1)).alias("n_triangles"))
                .count()
            )
            print(f"F bloom-conf full: {time.perf_counter() - t0:6.2f}s ({nt} nodes)")
        finally:
            for k, v in old.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)

    registry.release_tracked()
    oriented.unpersist()
    edges.unpersist()
    items.unpersist()


if __name__ == "__main__":
    main()
