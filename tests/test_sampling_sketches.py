"""Deterministic hash sampling + sketch-aggregate error bounds.

These are the rows-only driver queries (hash_sample, approx_stats):
no DuckDB oracle can hash-match them, so their contracts are pinned
here instead — determinism, nesting, rate, and sketch error vs exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as em
from tests.conftest import SF_CORRECT


def _sample_ids(spark, pct: int) -> set:
    t = em._trades(spark, SF_CORRECT)
    return {
        r["trade_id"]
        for r in t.filter(
            F.pmod(F.xxhash64("trade_id"), F.lit(100)) < pct
        ).select("trade_id").collect()
    }


def test_hash_sample_deterministic(spark):
    a = {r["trade_id"] for r in em.QUERIES["hash_sample"](spark, SF_CORRECT).collect()}
    b = {r["trade_id"] for r in em.QUERIES["hash_sample"](spark, SF_CORRECT).collect()}
    assert a == b and a


def test_hash_sample_rate_close_to_10pct(spark):
    total = em._trades(spark, SF_CORRECT).count()
    n = len(_sample_ids(spark, 10))
    assert 0.07 <= n / total <= 0.13, n / total


def test_hash_samples_nest(spark):
    # the 2% sample must be a subset of the 10% sample — the property
    # that lets pipelines grow a sample without resampling history
    assert _sample_ids(spark, 2) <= _sample_ids(spark, 10)


def test_approx_stats_error_bounds(spark):
    t = em._trades(spark, SF_CORRECT)
    exact = {
        r["symbol"]: r
        for r in t.groupBy("symbol")
        .agg(
            F.countDistinct("trade_id").alias("n"),
            F.expr("percentile(price, 0.5)").alias("p50"),
            F.expr("percentile(price, 0.95)").alias("p95"),
        )
        .collect()
    }
    approx = {r["symbol"]: r for r in em.QUERIES["approx_stats"](spark, SF_CORRECT).collect()}
    assert set(approx) == set(exact)
    for sym, a in approx.items():
        e = exact[sym]
        assert abs(a["approx_trades"] - e["n"]) / e["n"] < 0.05, sym
        # KLL quantile error is rank-based; on ~2k rows/symbol the
        # value-space deviation at p50/p95 stays well under 1%
        assert abs(a["approx_p50"] - e["p50"]) / abs(e["p50"]) < 0.01, sym
        assert abs(a["approx_p95"] - e["p95"]) / abs(e["p95"]) < 0.01, sym
