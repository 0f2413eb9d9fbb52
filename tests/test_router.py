"""Aggregate navigator (plans/router.py): routed bars must be value-
identical to direct computation from trades, serve rollups from the
bar store (not the events table), and merge the raw tail exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.functions.features import ohlc
from open_source_financial_time_series_data_pipeline_architecture_spark.plans.router import (
    AggregateRouter,
)
from open_source_financial_time_series_data_pipeline_architecture_spark.schema import (
    trades_from_events,
)
from open_source_financial_time_series_data_pipeline_architecture_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _key(rows):
    return sorted(
        (r["bucket"], r["symbol"], round(r["open"], 6), round(r["high"], 6),
         round(r["low"], 6), round(r["close"], 6), round(r["volume"], 6),
         r["trade_count"])
        for r in rows
    )


@pytest.fixture(scope="module")
def trades(spark):
    return trades_from_events(load_table(spark, SF, "events")).cache()


@pytest.fixture(scope="module")
def router(spark, trades, tmp_path_factory):
    r = AggregateRouter(
        spark, str(tmp_path_factory.mktemp("bars") / "bars_1m"), 60
    )
    r.materialize(trades)
    return r


def test_rollup_route_matches_direct(spark, trades, router):
    for secs in (60, 300, 3600):
        routed = router.bars(trades, secs)
        direct = ohlc(trades, bucket_seconds=secs)
        assert _key(routed.collect()) == _key(direct.collect()), secs


def test_unservable_granularity_falls_back(spark, trades, router):
    routed = router.bars(trades, 90)  # not a multiple of 60
    direct = ohlc(trades, bucket_seconds=90)
    assert _key(routed.collect()) == _key(direct.collect())


def test_rollup_scans_store_not_events(spark, trades, router):
    plan = (
        router.bars(trades, 300)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "bars_1m" in plan
    assert "events.parquet" not in plan


def _aligned_mid(trades):
    # refresh policies materialize bucket-ALIGNED windows; cut on a
    # bucket boundary so the store never holds a partial bar
    mid = trades.agg(
        F.expr("percentile(cast(time as double), 0.5)").alias("m")
    ).collect()[0]["m"]
    return float(int(mid // 60) * 60)


def test_realtime_merges_raw_tail(spark, trades, router, tmp_path):
    """Materialize only the first half of history; realtime routing
    must still reproduce the full direct computation exactly."""
    mid = _aligned_mid(trades)
    early = trades.filter(F.col("time").cast("double") < mid)
    stale = AggregateRouter(spark, str(tmp_path / "stale_bars"), 60)
    stale.materialize(early)
    routed = stale.bars(trades, 300, realtime=True)
    direct = ohlc(trades, bucket_seconds=300)
    assert _key(routed.collect()) == _key(direct.collect())


def test_realtime_tail_starts_after_hwm(spark, trades, router, tmp_path):
    """Stale-store realtime at the STORE granularity: stored rows and
    tail rows partition the bucket space (no duplicate buckets)."""
    mid = _aligned_mid(trades)
    early = trades.filter(F.col("time").cast("double") < mid)
    stale = AggregateRouter(spark, str(tmp_path / "stale2"), 60)
    stale.materialize(early)
    out = stale.bars(trades, 60, realtime=True)
    dupes = (
        out.groupBy("bucket", "symbol").count().filter(F.col("count") > 1)
    )
    assert dupes.count() == 0
