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
def test_oracle_parity_sf0001(spark, con_smoke, built_smoke, name):
    # built_smoke: one construction per query per session, shared with
    # the plan-lint sweeps (suite wall-clock, VERDICT r9 item 3)
    compare(built_smoke(name), con_smoke, ORACLES[name], name)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity_sf001(spark, con_correct, name):
    compare(QUERIES[name](spark, SF_CORRECT), con_correct, ORACLES[name], name)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_queries_have_unique_rowsets(spark, built_smoke):
    # every registered query must at least build at smoke scale. The
    # oracled names are each BUILT TWICE by the parity sweeps above, so
    # re-building all ~465 here only re-spent minutes of construction
    # time (VERDICT r9: the driver's pytest run no longer fit its time
    # cap) — cover the rows-only queries, which nothing else builds.
    for name in QUERIES:
        if name in ORACLES:
            continue
        assert built_smoke(name).columns, name
