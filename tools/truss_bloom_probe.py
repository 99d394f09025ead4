"""A/B the bloom-bitmap prefilter on the warm-truss DELTA round
(guide §1: isolate; §2.2: shuffle fewer bytes).

Round 1 of ktruss_truncation_delta enumerates ~13M delta-incident wedge
candidates against a 1.3M-edge closing set. TRI_BLOOM_WEDGE_FLOOR=32M
was calibrated on the FULL enumeration (bitmap build cost ~ |E| vs
savings ~ wedges); for the delta rounds n_cand/n_edges is ~10x, so the
floor may be mis-calibrated for this regime. Times the round-1 triangle
chain with the floor as-is (no bitmap) and forced low (bitmap on).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from vectordb_from_scratch_spark.operators import graph  # noqa: E402
from vectordb_from_scratch_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf = "/root/testdata/sf0.1"
    spark = get_spark("truss-bloom-probe")
    spark.sparkContext.setLogLevel("ERROR")
    graph.warm_truss_base(spark, sf)
    key = (spark.sparkContext.applicationId, sf)
    base, _sup, states = graph._TRUSS_BASE_CACHE[key]
    items = graph._base_items(spark, sf)
    d = (
        graph.copurchase_edges_from_items(items.filter(F.col("ok") % 10 == 0))
        .select("src", "dst")
        .join(base.select("src", "dst"), ["src", "dst"], "left_anti")
        .localCheckpoint()
    )
    n_d = d.count()
    eb, nb = states[0]
    s_prev = eb.select("src", "dst").unionAll(d)
    print(f"delta={n_d} merged_edges={nb + n_d}", flush=True)

    floor0 = graph.TRI_BLOOM_WEDGE_FLOOR
    for mode, floor in (
        ("no-bloom", floor0),
        ("bloom", 1),
        ("no-bloom", floor0),
        ("bloom", 1),
    ):
        graph.TRI_BLOOM_WEDGE_FLOOR = floor
        t0 = time.perf_counter()
        trid, n_cand = graph._frontier_triangles(d, s_prev, nb + n_d)
        c = graph._triple_edge_counts(trid)
        row = c.agg(
            F.count(F.lit(1)).alias("n"), F.sum("c").alias("s")
        ).collect()[0]
        print(
            f"{mode}: {time.perf_counter() - t0:.2f}s  n_cand={n_cand} "
            f"c_rows={row['n']} c_sum={row['s']}",
            flush=True,
        )
    graph.TRI_BLOOM_WEDGE_FLOOR = floor0
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
