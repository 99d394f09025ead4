"""Capture the SGNS per-iteration gradient-aggregate physical plan.

`graph_node_embeddings`' end-of-query plan is trivial (the training loop
eagerly checkpoints), so the plan evidence for the per-iteration work is
captured here: build one training iteration exactly as `_train_sgns` does
and explain the `ing` gradient aggregate over it.

Usage: python tools/sgns_iter_plan.py out.txt
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from vectordb_from_scratch_spark.operators import graph  # noqa: E402
from vectordb_from_scratch_spark.session import get_spark  # noqa: E402


def main() -> int:
    out_path = sys.argv[1]
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark("sgns-iter-plan")
    spark.sparkContext.setLogLevel("ERROR")
    edges = graph.shared_edges(spark, sf_dir).select("src", "dst")
    pairs = graph.walk_skipgrams(
        graph.random_walks(edges, steps=graph.WALK_STEPS),
        window=graph.SKIPGRAM_WINDOW,
    )
    vocab_nodes = (
        graph._sym(edges).select(F.col("a").alias("node")).distinct()
    )
    nv = vocab_nodes.count()
    dims = graph.EMB_DIMS
    pos = pairs.select("center", "context", "n_pairs", F.lit(1.0).alias("y"))
    train = pos.localCheckpoint(eager=False)  # stand-in for pos+negs union
    in_e = vocab_nodes.select("node", *graph._emb_init_cols("i", dims))
    out_e = vocab_nodes.select("node", *graph._emb_init_cols("o", dims))
    in_side = in_e.withColumnRenamed("node", "center")
    out_side = out_e.withColumnRenamed("node", "context")
    bcast_state = nv <= 10_000_000 and not os.environ.get(
        "SGNS_PLAN_NO_BROADCAST"
    )
    if bcast_state:
        in_side, out_side = F.broadcast(in_side), F.broadcast(out_side)
    tr = train.join(in_side, "center").join(out_side, "context")
    dot = sum(F.col(f"i{d}") * F.col(f"o{d}") for d in range(dims))
    gw = F.col("n_pairs") * (
        F.lit(1.0) / (F.lit(1.0) + F.exp(-dot)) - F.col("y")
    )
    tr = tr.withColumn("gw", gw)
    ing = tr.groupBy(F.col("center").alias("node")).agg(
        *[
            (F.sum(F.col("gw") * F.col(f"o{d}")) / F.sum("n_pairs")).alias(
                f"g{d}"
            )
            for d in range(dims)
        ]
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ing.explain("formatted")
    with open(out_path, "w") as fh:
        fh.write(
            f"# SGNS one-iteration gradient aggregate plan (|V|={nv}, "
            f"dims={dims}, broadcast_state={bcast_state})\n"
        )
        fh.write(buf.getvalue())
    print(f"wrote {out_path} (|V|={nv}, broadcast={bcast_state})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
