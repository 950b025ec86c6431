"""Driver-contract parity for the reference operator queries (SURVEY §2A),
checked the way the driver checks them: Spark vs DuckDB oracle at sf0.01."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_harness import compare_query, duck_connection

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


def _contract_cases():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    return [(name, qs[name], oracles[name]) for name in qs if name in oracles]


@pytest.mark.parametrize(
    "name,qfn,sql", _contract_cases(), ids=[c[0] for c in _contract_cases()]
)
def test_contract_query_matches_oracle(spark, duck, name, qfn, sql):
    compare_query(spark, duck, qfn, sql, SF_DIR, name=name)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["line"]
