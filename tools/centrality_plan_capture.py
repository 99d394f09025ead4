"""Capture before/after per-iteration plans for the r11 centrality
broadcast gates (betweenness forward level, closeness level, kcore
decrement join) into plans/r11/."""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vectordb_from_scratch_spark.session import get_spark  # noqa: E402
from vectordb_from_scratch_spark.operators import graph as G  # noqa: E402


def dump(df, name: str) -> None:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    os.makedirs("plans/r11", exist_ok=True)
    with open(f"plans/r11/{name}.txt", "w") as fh:
        fh.write(buf.getvalue())
    plan = buf.getvalue()
    joins = [
        ln.strip().split("(")[0].strip("* ")
        for ln in plan.splitlines()
        if ("Join" in ln and "#" in ln)
    ]
    print(f"{name}: joins={joins[:4]}")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("centrality-plan")
    spark.sparkContext.setLogLevel("ERROR")
    G.warm_graph(spark, sf_dir, kinds=("sym_a",), with_purchases=False)
    sym = G.shared_artifact(spark, sf_dir, "sym_a")

    seeds = G._md5_seeds(sym, G.BETW_SEEDS)
    l0 = seeds.select(
        "s", F.col("s").alias("v"), F.lit(1.0).alias("sigma")
    ).localCheckpoint()
    for tag, bcast in (("before", False), ("after", True)):
        f_in = G._iter_state(l0, bcast)
        cand = (
            f_in.join(sym, f_in["v"] == sym["a"])
            .select("s", F.col("b").alias("vn"), "sigma")
            .groupBy("s", "vn")
            .agg(F.sum("sigma").alias("sigma"))
        )
        dump(cand, f"graph_betweenness_level_{tag}")
        nxt = (
            f_in.join(sym, f_in["v"] == sym["a"])
            .select("s", F.col("b").alias("v"))
            .distinct()
            .join(
                G._iter_state(l0.select("s", "v"), bcast), ["s", "v"], "left_anti"
            )
        )
        dump(nxt, f"graph_closeness_level_{tag}")

    deg = (
        sym.groupBy(F.col("a").alias("node"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint()
    )
    frontier = deg.filter(F.col("deg") < G.KCORE_K).select("node")
    f_a = frontier.withColumnRenamed("node", "a")
    for tag, fr in (("before", f_a.hint("shuffle_hash")), ("after", F.broadcast(f_a))):
        dec = (
            sym.join(fr, "a")
            .groupBy(F.col("b").alias("node"))
            .agg(F.count(F.lit(1)).alias("d"))
        )
        dump(dec, f"graph_kcore_round_{tag}")


if __name__ == "__main__":
    main()
