"""Time each piece of the warm-truss round-1 frontier enumeration
(guide §1: isolate before optimizing). Reproduces exactly what
ktruss_truncation_delta does in round 1 and times sub-steps with the
noop sink."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from vectordb_from_scratch_spark.operators import graph  # noqa: E402
from vectordb_from_scratch_spark.session import get_spark  # noqa: E402


def noop(df, label):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    print(f"{label}: {time.perf_counter() - t0:.1f}s", flush=True)


def main() -> int:
    sf = "/root/testdata/sf0.1"
    spark = get_spark("truss-probe")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    graph.warm_truss_base(spark, sf)
    print(f"warmer: {time.perf_counter() - t0:.1f}s", flush=True)
    key = (spark.sparkContext.applicationId, sf)
    base, base_sup, states = graph._TRUSS_BASE_CACHE[key]
    items = graph._base_items(spark, sf)
    t0 = time.perf_counter()
    d = (
        graph.copurchase_edges_from_items(items.filter(F.col("ok") % 10 == 0))
        .select("src", "dst")
        .join(base.select("src", "dst"), ["src", "dst"], "left_anti")
        .localCheckpoint()
    )
    n_d = d.count()
    print(f"delta ckpt: {n_d} edges {time.perf_counter() - t0:.1f}s", flush=True)

    eb, nb = states[0]
    s_prev = eb.select("src", "dst").unionAll(d)
    n_edges = nb + n_d

    # --- piece 1: sym + degrees
    sym_s = s_prev.select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    ).unionAll(s_prev.select(F.col("dst").alias("a"), F.col("src").alias("b")))
    deg_s = sym_s.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    noop(deg_s, "deg_s")

    # --- piece 2: pivot + estimate
    r = (
        d.join(deg_s.withColumnRenamed("node", "src"), "src")
        .withColumnRenamed("deg", "ds")
        .join(
            deg_s.withColumnRenamed("node", "dst").withColumnRenamed(
                "deg", "dd"
            ),
            "dst",
        )
    )
    fwd = F.struct("ds", "src") < F.struct("dd", "dst")
    piv = r.select(
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("p"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("q"),
        F.when(fwd, F.col("ds")).otherwise(F.col("dd")).alias("dp"),
    )
    t0 = time.perf_counter()
    n_cand = int(piv.agg(F.sum("dp").alias("c")).collect()[0]["c"] or 0)
    print(
        f"estimate job: n_cand={n_cand} {time.perf_counter() - t0:.1f}s",
        flush=True,
    )

    # --- piece 3: wedge expansion join (no closure)
    cand = (
        piv.join(sym_s, piv["p"] == sym_s["a"])
        .filter(F.col("b") != F.col("q"))
        .select(
            "p",
            "q",
            F.col("b").alias("w"),
            F.least("q", F.col("b")).alias("x"),
            F.greatest("q", F.col("b")).alias("y"),
        )
    )
    noop(cand, "wedge expansion")

    # --- piece 4: closure SHJ
    floor_part = spark.sparkContext.defaultParallelism
    n_part = int(
        min(
            graph.WEDGE_MAX_PARTITIONS,
            max(
                floor_part,
                n_cand * graph.WEDGE_ROW_BYTES
                // graph.WEDGE_PARTITION_TARGET_BYTES
                + 1,
                n_edges * graph.WEDGE_ROW_BYTES // graph.SHJ_BUILD_TARGET_BYTES
                + 1,
            ),
        )
    )
    print(f"n_part={n_part}", flush=True)
    closing = s_prev.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    tri = (
        cand.select("p", "q", "w", "x", "y")
        .repartition(n_part, "x", "y")
        .join(closing.repartition(n_part, "x", "y").hint("shuffle_hash"), ["x", "y"])
    )
    noop(tri, "closure SHJ")

    # --- piece 5: full trid distinct
    trid = tri.select(F.array_sort(F.array("p", "q", "w")).alias("t")).distinct()
    noop(trid, "trid distinct")

    # --- piece 6: triple edge counts
    noop(graph._triple_edge_counts(trid), "triple counts")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
