"""A/B timing probe for graph_betweenness / graph_closeness / graph_kcore
(warm artifacts, bench action .count(), 3 reps each — guide §1)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectordb_from_scratch_spark.session import get_spark  # noqa: E402
from vectordb_from_scratch_spark.operators import graph as G  # noqa: E402
from vectordb_from_scratch_spark import registry  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("centrality-ab")
    spark.sparkContext.setLogLevel("ERROR")
    G.warm_graph(spark, sf_dir, kinds=("sym_a",), with_purchases=False)
    for q in ("graph_betweenness", "graph_closeness", "graph_kcore"):
        for rep in range(3):
            t0 = time.perf_counter()
            registry.QUERIES[q](spark, sf_dir).count()
            print(f"{q} rep{rep}: {time.perf_counter() - t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
