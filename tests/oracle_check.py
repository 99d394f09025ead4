"""Local replica of the driver's DuckDB-oracle comparison: run a Spark
query and its oracle SQL side by side, compare row count, column names, and
order-insensitive values. Used by tests/test_oracle_parity.py."""

from __future__ import annotations

import math

import duckdb

from vectordb_from_scratch_spark.session import DRIVER_TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in DRIVER_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return "0"  # normalize -0.0
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def canonical_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def compare(spark_df, con, sql: str, name: str = "?") -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    srows = [tuple(r) for r in spark_df.collect()]
    scols = list(spark_df.columns)
    ores = con.execute(sql)
    ocols = [d[0] for d in ores.description]
    orows = ores.fetchall()

    if sorted(scols) != sorted(ocols):
        problems.append(f"{name}: columns differ spark={sorted(scols)} oracle={sorted(ocols)}")
        return problems
    if len(srows) != len(orows):
        problems.append(f"{name}: row count spark={len(srows)} oracle={len(orows)}")
    sc, oc = canonical_rows(scols, srows), canonical_rows(ocols, orows)
    if sc != oc:
        only_s = [r for r in sc if r not in set(oc)][:5]
        only_o = [r for r in oc if r not in set(sc)][:5]
        problems.append(
            f"{name}: value mismatch; spark-only={only_s} oracle-only={only_o} (cols sorted: {sorted(scols)})"
        )
    return problems
