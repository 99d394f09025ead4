"""Capture the PER-ITERATION physical plan of the bfs_hops / sssp_weighted
frontier kernels, before vs after the r11 gated state broadcast (guide §3.1).

The registered queries eagerly localCheckpoint every round, so their final
explain is just a union of RDD scans — the join strategy only shows in the
iteration frame itself, and only at a LATER hop: iteration 1's state is a
1-row aggregate Catalyst already estimates as tiny, but from hop 2 on the
state is a checkpointed join/distinct output whose LogicalRDD stats carry
the pre-checkpoint join estimates, so the plain join degrades to SMJ.
This probe replays the kernels' exact loop for ``HOP-1`` rounds and writes
``explain("formatted")`` of the hop-``HOP`` frame for both routes:

- ``before``: plain joins, as at the pre-r11 HEAD;
- ``after``: ``_iter_state(state, True)`` = ``F.broadcast(state)``.

Usage: python tools/frontier_iter_plan.py <sf_dir> <out_dir>
Writes <out_dir>/graph_{bfs_hops,sssp_weighted}_iter_{before,after}.txt
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from vectordb_from_scratch_spark.operators import graph  # noqa: E402
from vectordb_from_scratch_spark.session import get_spark  # noqa: E402

HOP = 3


def fmt(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def bfs_frame(edges, sym, route: str):
    """The kernel's loop, verbatim, returning the hop-HOP frame unexecuted."""
    wrap = (lambda s: graph._iter_state(s, True)) if route == "after" else (lambda s: s)
    visited = (
        edges.agg(F.min("src").alias("node"))
        .withColumn("hops", F.lit(0).cast("long"))
        .localCheckpoint()
    )
    frontier = visited.select("node")
    for h in range(1, HOP + 1):
        f_in = wrap(frontier)
        nxt = (
            f_in.join(sym, f_in["node"] == sym["a"])
            .select(F.col("b").alias("node"))
            .distinct()
            .join(wrap(visited), "node", "left_anti")
            .withColumn("hops", F.lit(h).cast("long"))
        )
        if h == HOP:
            return nxt
        nxt = nxt.localCheckpoint()
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt.select("node")


def sssp_frame(edges, symw, route: str):
    wrap = (lambda s: graph._iter_state(s, True)) if route == "after" else (lambda s: s)
    dist = (
        edges.agg(F.min("src").alias("node"))
        .select("node", F.lit(0.0).alias("d"))
        .localCheckpoint()
    )
    for h in range(1, HOP + 1):
        d_in = wrap(dist)
        relaxed = d_in.join(symw, d_in["node"] == symw["a"]).select(
            F.col("b").alias("node"), (F.col("d") + F.col("w")).alias("d")
        )
        step = (
            dist.select("node", "d")
            .unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("d").alias("d"))
        )
        if h == HOP:
            return step
        dist = step.localCheckpoint()


def main() -> None:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    spark = get_spark()
    edges = graph.copurchase_edges(spark, sf_dir)

    sym = graph._sym(edges.select("src", "dst")).repartition("a").persist()
    sym.count()
    for route in ("before", "after"):
        with open(f"{out_dir}/graph_bfs_hops_iter_{route}.txt", "w") as f:
            f.write(fmt(bfs_frame(edges, sym, route)))

    symw = (
        graph._sym_w(edges)
        .select("a", "b", (F.lit(1.0) / F.col("w0")).alias("w"))
        .repartition("a")
        .persist()
    )
    symw.count()
    for route in ("before", "after"):
        with open(f"{out_dir}/graph_sssp_weighted_iter_{route}.txt", "w") as f:
            f.write(fmt(sssp_frame(edges, symw, route)))
    print("done")


if __name__ == "__main__":
    main()
