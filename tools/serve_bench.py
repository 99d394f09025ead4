"""Serving-concurrency measurement (VERDICT r10 #5): the reference is a
concurrent FastAPI service (its e2e suite drives concurrent creates,
tests-mongo/test_e2e_mongo.py:523-572); the catalog is its in-process
equivalent, so measure what N simultaneous callers actually get.

Drives N concurrent ``catalog.search`` / ``search_batch`` calls against
WARM indexes in one SparkSession. Spark schedules concurrent jobs from
multiple submitting threads; each worker thread gets its own FAIR
scheduler pool (pools are created on demand under
``spark.scheduler.mode=FAIR``) so one caller's long stage cannot starve
the rest — the same setting a shared serving cluster would run with.

Records q/s + p50/p95 per index type at N=8 and N=32, and asserts the
concurrent results are IDENTICAL to the serial baseline (no cross-query
interference through shared plan/index caches). Results go to SCALE.md.

Usage: python tools/serve_bench.py [n_chunks] [dims]
"""

from __future__ import annotations

import statistics
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, "/root/repo")

import numpy as np
from pyspark.sql import SparkSession

INDEX_TYPES = ("flat", "ivf", "lsh_simhash", "pq")
N_QUERIES = 16  # distinct query vectors, reused round-robin
CALLS_PER_THREAD = 4


def canon(results) -> list:
    return [(r.chunk_id, round(r.similarity_score, 9)) for r in results]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    spark = (
        SparkSession.builder.appName("serve-bench")
        .master(f"local[{__import__('os').environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.scheduler.mode", "FAIR")
        # match the engine session's heap (session.py): the default 1g
        # driver JVM GC-thrashes under 32 concurrent local jobs
        .config(
            "spark.driver.memory",
            __import__("os").environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from vectordb_from_scratch_spark.catalog import VectorCatalog

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((64, d)).astype("float32")
    X = centers[rng.integers(0, 64, size=n)] + 0.3 * rng.standard_normal(
        (n, d)
    ).astype("float32")
    queries = [X[i].tolist() for i in range(N_QUERIES)]

    import tempfile

    root = tempfile.mkdtemp(prefix="serve_bench_")
    cat = VectorCatalog(spark, root)
    libs: dict[str, str] = {}
    for itype in INDEX_TYPES:
        t0 = time.perf_counter()
        lib = cat.create_library(f"serve-{itype}", d, index_type=itype)
        doc = cat.create_document(lib, "d")
        cat.add_chunks(
            lib,
            doc,
            [{"text": f"c{i}", "embedding": X[i].tolist()} for i in range(n)],
            ids=[f"{itype}-{i:06d}" for i in range(n)],
        )
        cat.search(lib, queries[0], k=10)  # lazy-ensure build, outside timing
        libs[itype] = lib
        print(f"# built {itype}: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # serial baseline: expected results + serial latency per type
    expected: dict[tuple, list] = {}
    serial_lat: dict[str, list] = {t: [] for t in INDEX_TYPES}
    for itype in INDEX_TYPES:
        for qi in range(N_QUERIES):
            t0 = time.perf_counter()
            res = cat.search(libs[itype], queries[qi], k=10)
            serial_lat[itype].append(time.perf_counter() - t0)
            expected[(itype, qi)] = canon(res)

    def one_call(task):
        tid, itype, qi = task
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", f"pool{tid}")
        t0 = time.perf_counter()
        res = cat.search(libs[itype], queries[qi], k=10)
        dt = time.perf_counter() - t0
        ok = canon(res) == expected[(itype, qi)]
        return itype, dt, ok

    for n_threads in (8, 32):
        tasks = []
        for tid in range(n_threads):
            for c in range(CALLS_PER_THREAD):
                itype = INDEX_TYPES[(tid + c) % len(INDEX_TYPES)]
                qi = (tid * CALLS_PER_THREAD + c) % N_QUERIES
                tasks.append((tid, itype, qi))
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=n_threads) as ex:
            out = list(ex.map(one_call, tasks))
        wall = time.perf_counter() - t0
        bad = [o for o in out if not o[2]]
        assert not bad, f"interference: {len(bad)} mismatched results"
        lats = sorted(o[1] for o in out)
        by_type: dict[str, list] = {t: [] for t in INDEX_TYPES}
        for itype, dt, _ in out:
            by_type[itype].append(dt)
        print(
            f"concurrency N={n_threads}: {len(tasks)} calls in {wall:.2f}s "
            f"= {len(tasks) / wall:.1f} q/s | "
            f"p50 {statistics.median(lats) * 1000:.0f}ms "
            f"p95 {lats[int(len(lats) * 0.95) - 1] * 1000:.0f}ms | all results == serial"
        )
        for itype in INDEX_TYPES:
            ls = sorted(by_type[itype])
            ser = statistics.median(serial_lat[itype])
            print(
                f"  {itype:12s} p50 {statistics.median(ls) * 1000:6.0f}ms "
                f"p95 {ls[int(len(ls) * 0.95) - 1] * 1000:6.0f}ms "
                f"(serial p50 {ser * 1000:.0f}ms)"
            )


if __name__ == "__main__":
    main()
