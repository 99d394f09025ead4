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

Runs in subprocesses so the shared session-scoped SparkSession (same JVM)
can't leak its conf into the vanilla session under test. SHARDED 4 ways
by a stable name hash (VERDICT r10 #6): at 235 registered queries one
monolithic subprocess needed an 1800s budget and was the first thing to
flake on a loaded box; four ~60-query shards each stay well under a 600s
budget and a flake localizes to its shard.
"""

import hashlib
import subprocess
import sys

import pytest

N_SHARDS = 4

_SCRIPT = """
import hashlib
import sys
sys.path.insert(0, "/root/repo")
shard = int(sys.argv[1])
n_shards = int(sys.argv[2])
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
# tests/test_oracle_parity.py's job under the shared session). This
# process runs only its shard (stable md5 name hash, not the
# per-process-randomized builtin hash).
from vectordb_from_scratch_spark.registry import QUERIES

mine = sorted(
    name
    for name in QUERIES
    if int(hashlib.md5(name.encode()).hexdigest(), 16) % n_shards == shard
)
failed = []
for name in mine:
    try:
        QUERIES[name](spark, "/root/testdata/sf0.001").count()
    except Exception as exc:  # noqa: BLE001
        failed.append((name, repr(exc)[:200]))
assert not failed, failed
print(f"VANILLA_OK shard {shard}: {len(mine)} queries")
spark.stop()
"""


@pytest.mark.parametrize("shard", range(N_SHARDS))
def test_load_events_under_vanilla_session(shard):
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT, str(shard), str(N_SHARDS)],
        capture_output=True,
        text=True,
        # ~60 queries/shard × a few seconds of sf0.001 smoke each, plus
        # session startup; measured well under 600s/shard on a quiet box
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "VANILLA_OK" in proc.stdout


def test_vanilla_shards_cover_every_query():
    """The md5 sharding must partition the registry exactly — no query
    skipped, none run twice (guards a future hash/modulus edit)."""
    from vectordb_from_scratch_spark.registry import QUERIES

    shards = [
        int(hashlib.md5(name.encode()).hexdigest(), 16) % N_SHARDS
        for name in QUERIES
    ]
    assert len(shards) == len(QUERIES)
    assert set(shards) <= set(range(N_SHARDS))
    # every shard non-trivially populated (balanced within reason)
    from collections import Counter

    counts = Counter(shards)
    assert all(counts[s] > len(QUERIES) // (N_SHARDS * 3) for s in range(N_SHARDS)), counts


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
