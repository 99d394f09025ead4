"""The local correctness gate: every registry query with an oracle must
hash-match DuckDB at sf0.01 — exactly what the driver does per round."""

import pytest

from vectordb_from_scratch_spark import registry
from tests.oracle_check import compare, duck_connection

NAMES = sorted(registry.ORACLE_SQL)


@pytest.fixture(scope="module")
def duck(sf_oracle):
    con = duck_connection(sf_oracle)
    yield con
    con.close()


@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity(spark, sf_oracle, duck, name):
    df = registry.QUERIES[name](spark, sf_oracle)
    problems = compare(df, duck, registry.ORACLE_SQL[name], name)
    assert not problems, "\n".join(problems)


_DUCK_INTEGRAL = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}
_DUCK_FLOAT = {"FLOAT", "DOUBLE"}


@pytest.mark.parametrize("name", NAMES)
def test_oracle_output_types(spark, sf_oracle, duck, name):
    """Lint every oracle's DuckDB output types against the driver's
    canonicalization path. DuckDB sum(BIGINT) returns HUGEINT (int128),
    which pandas/Arrow canonicalizes as float64 — so a value-identical
    int column hash-mismatches Spark's int64 (the r2 window_frames /
    join_full_outer_reconcile failures). Assert (a) no oracle emits
    HUGEINT/UHUGEINT anywhere in its output schema, and (b) numeric
    class (integral vs floating vs decimal) agrees with the Spark
    schema column-by-column."""
    from pyspark.sql import types as T

    rel = duck.sql(f"SELECT * FROM ({registry.ORACLE_SQL[name]}) __q LIMIT 0")
    duck_types = {c: str(t).upper() for c, t in zip(rel.columns, rel.types)}
    offenders = {c: t for c, t in duck_types.items() if "HUGEINT" in t}
    assert not offenders, f"{name}: oracle emits int128 (driver canonicalizes to float64): {offenders}"

    schema = {f.name: f.dataType for f in registry.QUERIES[name](spark, sf_oracle).schema.fields}
    assert sorted(schema) == sorted(duck_types), f"{name}: column sets differ"
    for col, dt in duck_types.items():
        st = schema[col]
        if dt in _DUCK_INTEGRAL:
            assert isinstance(st, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)), (
                f"{name}.{col}: oracle {dt} vs spark {st} — integral/float class mismatch"
            )
        elif dt in _DUCK_FLOAT:
            assert isinstance(st, (T.FloatType, T.DoubleType)), (
                f"{name}.{col}: oracle {dt} vs spark {st} — float/integral class mismatch"
            )
        elif dt.startswith("DECIMAL"):
            assert isinstance(st, T.DecimalType), f"{name}.{col}: oracle {dt} vs spark {st}"


def test_all_queries_return_rows(spark, sf_small):
    for name, fn in registry.QUERIES.items():
        df = fn(spark, sf_small)
        assert df.count() >= 0, name
