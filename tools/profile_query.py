"""Isolated per-query measurement + plan capture (optimization guide §1).

Runs registered queries one at a time in a fresh session, timing the
bench-identical region (warmer outside the timer, then fn + count — the
driver's methodology) and optionally a noop-sink timing (guide §1.4: the
noop write computes every column; count() lets Catalyst prune).

Usage:
  python tools/profile_query.py q1,q2,...        # time (bench methodology)
  python tools/profile_query.py q1 --noop        # also time via noop sink
  python tools/profile_query.py q1 --plan out/   # write .explain("formatted")
  python tools/profile_query.py q1 --repeat 3    # repeats (fresh lazy plan each)

Timings print to stdout as `name<TAB>count_sec[<TAB>noop_sec]` per repeat.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from vectordb_from_scratch_spark import registry  # noqa: E402
from vectordb_from_scratch_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    noop = "--noop" in args
    if noop:
        args.remove("--noop")
    plan_dir = None
    if "--plan" in args:
        i = args.index("--plan")
        plan_dir = args[i + 1]
        del args[i : i + 2]
        os.makedirs(plan_dir, exist_ok=True)
    repeat = 1
    if "--repeat" in args:
        i = args.index("--repeat")
        repeat = int(args[i + 1])
        del args[i : i + 2]
    names = args[0].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    # same JVM warmup as bench.py
    registry.QUERIES["knn_cosine_topk"](spark, sf_dir).count()
    registry.STRICT_SERVE = True
    for name in names:
        fn = registry.QUERIES[name]
        warmer = registry.WARMERS.get(name)
        if warmer is not None:
            warmer(spark, sf_dir)
        for r in range(repeat):
            spark.sparkContext.setJobDescription(f"{name} [count r{r}]")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.count()
            t_count = time.perf_counter() - t0
            line = f"{name}\t{t_count:.3f}"
            if noop:
                spark.sparkContext.setJobDescription(f"{name} [noop r{r}]")
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                line += f"\t{time.perf_counter() - t0:.3f}"
            print(line, flush=True)
            spark.sparkContext.setJobDescription(None)
        if plan_dir is not None:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plan_dir, f"{name}.txt"), "w") as fh:
                fh.write(buf.getvalue())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
