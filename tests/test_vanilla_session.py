"""load_table must work under ANY caller's SparkSession, not just the one
``get_spark`` builds.

The correctness harness constructs its own vanilla session (no
``spark.sql.legacy.parquet.nanosAsLong``), and ``events.parquet`` stores
TIMESTAMP(NANOS) — which vanilla Spark rejects with PARQUET_TYPE_ILLEGAL
unless load_table sets the conf defensively at call time. The round-1
driver run errored every events-backed query this way while the whole
local suite stayed green, because conftest's session fixture already had
the conf baked in. This test reproduces the driver's environment:
it must NOT use the shared ``spark`` fixture.

Runs in a subprocess so the shared session-scoped SparkSession (same JVM)
can't leak its conf into the vanilla session under test.
"""

import subprocess
import sys

_SCRIPT = """
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .appName("vanilla-driver-like")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "false"

from vectordb_from_scratch_spark.session import load_table

df = load_table(spark, "/root/testdata/sf0.001", "events")
dt = dict(df.dtypes)
assert dt["ts"] == "timestamp", dt
n = df.count()
assert n > 0, n

# EVERY registered query must run under the driver's own session — the
# round-1 driver errored all events-backed queries while the local suite
# stayed green. Smoke at sf0.001: build + count, no oracle (parity is
# tests/test_oracle_parity.py's job under the shared session).
from vectordb_from_scratch_spark.registry import QUERIES

failed = []
for name, fn in sorted(QUERIES.items()):
    try:
        fn(spark, "/root/testdata/sf0.001").count()
    except Exception as exc:  # noqa: BLE001
        failed.append((name, repr(exc)[:200]))
assert not failed, failed
print(f"VANILLA_OK {len(QUERIES)} queries")
spark.stop()
"""


def test_load_events_under_vanilla_session():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        # ~230 registered queries × a few seconds of sf0.001 smoke each:
        # the surface outgrew the original 300s budget at ~180 queries
        # and the 900s budget at ~230 (r9 — measured 900s+ with the
        # iterative graph/PCA evals on a loaded box; 1800 leaves the
        # same ~2× headroom the 900 originally did)
        timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "VANILLA_OK" in proc.stdout


def test_any_module_import_order():
    """Importing an operator module directly (before registry) must not
    hit the registry's module-load cycle — a user importing
    operators.dedup first used to crash in pipeline's oracle-SQL
    construction while dedup was partially initialized."""
    for entry in (
        "vectordb_from_scratch_spark.operators.dedup",
        "vectordb_from_scratch_spark.operators.pipeline",
        "vectordb_from_scratch_spark.operators.tpch",
        "vectordb_from_scratch_spark.catalog",
    ):
        proc = subprocess.run(
            [
                sys.executable,
                "-c",
                f"import sys; sys.path.insert(0, '/root/repo'); import {entry}; "
                "from vectordb_from_scratch_spark import registry; "
                "assert len(registry.QUERIES) > 100",
            ],
            capture_output=True,
            text=True,
            timeout=120,
        )
        assert proc.returncode == 0, (entry, proc.stderr[-1500:])
