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


def test_all_queries_return_rows(spark, sf_small):
    for name, fn in registry.QUERIES.items():
        df = fn(spark, sf_small)
        assert df.count() >= 0, name
