"""The local harness must hold the DRIVER's bar: array-typed output
columns crash the driver's canonicalization (CORRECTNESS_r01.json,
verbatim `unhashable type: 'list'`), -0.0 breaks the value hash, and
ns-vs-µs timestamp drift breaks it too. These meta-tests pin that the
strict harness actually rejects each hazard class."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.oracle_harness import _check_driver_hashable, _normalize


def test_rejects_array_typed_column():
    df = pd.DataFrame({"id": [1, 2], "arr": [[1.0, 2.0], [3.0]]})
    with pytest.raises(AssertionError, match="list-typed"):
        _check_driver_hashable(df, "spark", "meta")


def test_rejects_negative_zero():
    df = pd.DataFrame({"x": [0.0, -0.0, 1.5]})
    with pytest.raises(AssertionError, match="-0.0"):
        _check_driver_hashable(df, "spark", "meta")


def test_normalize_preserves_sub_microsecond_digits():
    ns = pd.DataFrame({"t": pd.to_datetime(["2024-01-01 00:00:00.000000001"])})
    us = pd.DataFrame(
        {"t": pd.to_datetime(["2024-01-01 00:00:00.000000"]).astype("datetime64[us]")}
    )
    a, b = _normalize(ns), _normalize(us)
    assert not (a["t"] == b["t"]).all(), "ns digits must NOT be coerced away"


def test_scalar_frame_accepted():
    df = pd.DataFrame({"id": [1], "x": [2.5], "s": ["ok"]})
    _check_driver_hashable(df, "spark", "meta")


def test_rejects_int_vs_float_dtype_kind_skew():
    """Round 3: DuckDB sum(INTEGER) → HUGEINT → pandas float64 while
    Spark emits int64. `==` passes (1 == 1.0) but the driver's value
    hash distinguishes the dtypes — the r01/r02 user_sessionization
    red row. compare() must fail loudly on the kind skew."""
    import duckdb

    from tests.oracle_harness import compare

    class _FakeSparkDF:
        def __init__(self, pdf):
            self._pdf = pdf

        def toPandas(self):
            return self._pdf

    con = duckdb.connect()
    spark_side = pd.DataFrame({"k": [1, 2], "s": np.array([3, 4], dtype="int64")})
    # windowed sum over INTEGER: HUGEINT → float64 in pandas
    sql = """
    SELECT k, sum(x) OVER (PARTITION BY k) AS s
    FROM (VALUES (1, 3), (2, 4)) t(k, x)
    """
    assert con.execute(sql).df()["s"].dtype == "float64"  # the trap is real
    with pytest.raises(AssertionError, match="dtype kind skew"):
        compare(_FakeSparkDF(spark_side), con, sql, "meta")


def test_rejects_bool_vs_int_kind_skew():
    """bool-vs-int is the same hazard class as int-vs-float: True == 1
    passes, the driver's value hash does not."""
    import duckdb

    from tests.oracle_harness import compare

    class _FakeSparkDF:
        def __init__(self, pdf):
            self._pdf = pdf

        def toPandas(self):
            return self._pdf

    con = duckdb.connect()
    spark_side = pd.DataFrame({"k": [1, 2], "f": [True, False]})
    sql = "SELECT k, f FROM (VALUES (1, 1), (2, 0)) t(k, f)"
    with pytest.raises(AssertionError, match="bool-kind skew"):
        compare(_FakeSparkDF(spark_side), con, sql, "meta")
