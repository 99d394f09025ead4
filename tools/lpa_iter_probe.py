"""Measure LPA's per-iteration exchange count and wall (guide §2.1).

Current shape per iteration: join(sym_b, labels) -> groupBy(node, label)
[Exchange hash(node,label)] -> window partitionBy(node) [Exchange
hash(node)] = 2 label-volume exchanges. Candidate: repartition the
joined frame ONCE by node — hash(node) satisfies both the (node, label)
clustering and the window's partitioning, so the agg and the top-1
window run in the SAME stage with ONE exchange.

Prints wall for K iterations of each variant plus a result checksum so
the variants are provably value-identical.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from vectordb_from_scratch_spark.operators import graph  # noqa: E402
from vectordb_from_scratch_spark.session import get_spark  # noqa: E402

ITERS = 4


def run(sym, variant: str):
    labels = sym.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("label"))
    for _ in range(ITERS):
        joined = sym.join(labels, sym["b"] == labels["node"]).select(
            sym["a"].alias("node"), "label"
        )
        if variant == "one-exchange":
            joined = joined.repartition("node")
        cnt = joined.groupBy("node", "label").agg(F.count(F.lit(1)).alias("c"))
        labels = (
            cnt.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("node", "label")
        )
    return labels


def main() -> int:
    sf = "/root/testdata/sf0.1"
    spark = get_spark("lpa-probe")
    spark.sparkContext.setLogLevel("ERROR")
    edges = graph.shared_edges(spark, sf).select("src", "dst")
    sym = graph.track_persist(graph._sym(edges).repartition("b"))
    sym.count()
    for variant in ("current", "one-exchange", "current", "one-exchange"):
        t0 = time.perf_counter()
        out = run(sym, variant)
        chk = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("node") * F.col("label")).alias("s"),
        ).collect()[0]
        print(
            f"{variant}: {time.perf_counter() - t0:.2f}s  n={chk['n']} s={chk['s']}",
            flush=True,
        )
    import contextlib, io

    for variant in ("current", "one-exchange"):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            run(sym, variant).explain("formatted")
        n_ex = buf.getvalue().count("Exchange")
        print(f"{variant}: {n_ex} Exchange nodes in {ITERS}-iter plan", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
