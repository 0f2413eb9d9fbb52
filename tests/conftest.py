from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from open_source_financial_time_series_data_pipeline_architecture_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="fts-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def built_smoke(spark):
    """Session-scoped memo of registered queries BUILT at smoke scale.

    The oracle-parity sweep, the registry-wide plan lint and the
    benched-window lint each used to construct every registered
    query's DataFrame independently — 3-4 full construction sweeps of
    ~465 queries per run, the single largest block of suite wall clock
    (VERDICT r9: the driver's pytest run stopped fitting its time
    cap). A built DataFrame is an immutable plan, so sharing one build
    per query across those consumers changes nothing about what each
    test checks."""
    import __spark_entry__ as entry_mod

    cache: dict[str, object] = {}

    def get(name: str):
        if name not in cache:
            cache[name] = entry_mod.QUERIES[name](spark, SF_SMOKE)
        return cache[name]

    return get
