"""Capture plans/r12 before/after explain("formatted") dumps for the r12
touched queries. Run from the repo-version to capture (the worktree at the
old commit for *_before, the working tree for *_after).

Usage: python tools/r12_plan_capture.py <suffix: before|after> [sf_dir] [out_dir]
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectordb_from_scratch_spark.session import get_spark  # noqa: E402
from vectordb_from_scratch_spark import registry  # noqa: E402
import vectordb_from_scratch_spark.operators  # noqa: F401,E402

QUERIES = (
    "graph_ktruss_incremental",
    "graph_triangle_counts",
    "eval_pca_route_rerank",
)


def main() -> None:
    suffix = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/plans/r12"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("r12-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name in QUERIES:
        df = registry.QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        path = f"{out_dir}/{name}_{suffix}.txt"
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = sum(1 for ln in plan.splitlines() if ln.strip().startswith("Exchange"))
        n_py = sum(
            1
            for ln in plan.splitlines()
            if "ArrowEvalPython" in ln or "BatchEvalPython" in ln or "MapInPandas" in ln
        )
        print(f"{name}_{suffix}: {len(plan.splitlines())} lines, "
              f"Exchange(detail)={n_ex}, PyNodes={n_py}", flush=True)


if __name__ == "__main__":
    main()
