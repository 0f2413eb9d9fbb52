"""Every queries() entry with an oracle must match it exactly at sf0.001/sf0.01.

This is a local replica of the driver's correctness gate
(CORRECTNESS_r{N}.json): order-insensitive, exact after the shared
ROUND(…, 6) convention.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_CORRECT, SF_SMOKE
from tests.oracle_harness import compare, duckdb_con

ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.fixture(scope="module")
def con_smoke():
    con = duckdb_con(SF_SMOKE)
    yield con
    con.close()


@pytest.fixture(scope="module")
def con_correct():
    con = duckdb_con(SF_CORRECT)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity_sf0001(spark, con_smoke, name):
    compare(QUERIES[name](spark, SF_SMOKE), con_smoke, ORACLES[name], name)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity_sf001(spark, con_correct, name):
    compare(QUERIES[name](spark, SF_CORRECT), con_correct, ORACLES[name], name)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_queries_have_unique_rowsets(spark):
    # every registered query must at least run at smoke scale
    for name, fn in QUERIES.items():
        df = fn(spark, SF_SMOKE)
        assert df.columns, name
