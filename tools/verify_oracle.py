"""Driver-contract verification: run every `__spark_entry__.queries()`
entry at sf0.01 and hash-compare against its `oracle_sql()` in DuckDB —
the same comparison the round driver performs (order-insensitive,
column-name-sorted, NULL-safe, floats rounded to 9dp).

Usage: python tools/verify_oracle.py [sf_dir] [--only prefix1,prefix2]
`--only` restricts the sweep to queries whose name starts with any of the
given comma-separated prefixes (fast per-batch spot checks).
Exits non-zero on any mismatch.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as e
from vectordb_from_scratch_spark.session import DRIVER_TABLES, get_spark


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cv(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return repr(round(v, 9))
        return str(v)

    return sorted(tuple(cv(r[i]) for i in order) for r in rows)


def main() -> int:
    args = sys.argv[1:]
    only: list[str] | None = None
    if "--only" in args:
        i = args.index("--only")
        only = args[i + 1].split(",")
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    spark = get_spark("verify", cpus="8")
    if only is None:
        n_entry = len(e.entry(spark).collect())
        assert n_entry > 0, "entry() returned no rows"
        print(f"entry rows: {n_entry}")
    con = duckdb.connect()
    for t in DRIVER_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    fails = []
    for name, fn in sorted(e.queries().items()):
        if only is not None and not any(name.startswith(p) for p in only):
            continue
        df = fn(spark, sf_dir)
        srows, scols = [tuple(r) for r in df.collect()], list(df.columns)
        sql = e.oracle_sql().get(name)
        if sql is None:
            print(f"{name}: rows={len(srows)} (rows-only)")
            continue
        res = con.execute(sql)
        ocols = [d[0] for d in res.description]
        ok = canon(srows, scols) == canon(res.fetchall(), ocols)
        print(f"{name}: rows={len(srows)} match={ok}")
        if not ok:
            fails.append(name)
    print("FAILS:", fails or "none")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
