"""PageRank per-iteration plan + timing probe (guide §1, §3.1).

Shows the join strategy of one power-iteration frame against the persisted
adjacency, and times the registered graph_pagerank / graph_pagerank_weighted
bodies with warm artifacts (the bench regime). Optional arg `hint` compares
the default plan against a SHUFFLE_HASH-hinted ranks side (the persisted
adjacency is cached hash-partitioned but UNSORTED, so a sort-merge join
re-sorts 2|E| rows every iteration; a shuffled-hash join builds on the
node-sized ranks instead).

Run: python tools/pr_iter_probe.py
"""
import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vectordb_from_scratch_spark.session import get_spark  # noqa: E402
from vectordb_from_scratch_spark.operators import graph as G  # noqa: E402


def iter_frame(adjw, ranks, hint: bool):
    r = ranks.hint("shuffle_hash") if hint else ranks
    contrib = (
        adjw.join(r, adjw["a"] == r["node"])
        .groupBy("b")
        .agg(F.sum(F.col("r") * F.col("w")).alias("mass"))
    )
    return contrib


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("pr-probe")
    spark.sparkContext.setLogLevel("ERROR")
    G.warm_graph(spark, sf_dir, kinds=("adj_uniform", "adj_weighted"))
    adjw = G.shared_artifact(spark, sf_dir, "adj_uniform")

    nodes = adjw.select(F.col("a").alias("node")).distinct()
    ranks = nodes.select("node", F.lit(1.0).alias("r")).localCheckpoint()
    for hint in (False, True):
        buf = io.StringIO()
        with redirect_stdout(buf):
            iter_frame(adjw, ranks, hint).explain("formatted")
        plan = buf.getvalue()
        joins = [
            ln.strip()
            for ln in plan.splitlines()
            if "Join" in ln and "Exchange" not in ln
        ][:3]
        print(f"hint={hint}: exchanges={plan.count('Exchange')} joins={joins}")
        os.makedirs("plans/r11", exist_ok=True)
        nm = "after" if hint else "before"
        with open(f"plans/r11/graph_pagerank_iter_{nm}.txt", "w") as fh:
            fh.write(plan)

    # timed A/B of the full registered bodies (warm artifacts, noop-free
    # bench action: .count(), matching bench.py)
    for q in ("graph_pagerank", "graph_pagerank_weighted"):
        from vectordb_from_scratch_spark import registry

        for rep in range(3):
            t0 = time.perf_counter()
            registry.QUERIES[q](spark, sf_dir).count()
            print(f"{q} rep{rep}: {time.perf_counter() - t0:.2f}s")


if __name__ == "__main__":
    main()
