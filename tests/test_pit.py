"""PIT correctness invariants, mirroring the reference test strategy
(SURVEY §5: tests/test_pit_correctness.py:38-102, 204-233 and
tests/test_feast_pit_correctness.py:42-151):

- future as_of raises before any query runs;
- no future leakage: every feature value attached to an entity row comes
  from a feature row with ts <= event_timestamp (swept over ~100 probes);
- repeated evaluation is deterministic;
- TTL expires stale feature values.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark import functions as FX
from open_source_financial_time_series_data_pipeline_architecture_spark import operators as OPS
from open_source_financial_time_series_data_pipeline_architecture_spark.operators.asof import (
    FutureTimestampError,
)
from open_source_financial_time_series_data_pipeline_architecture_spark.schema import (
    trades_from_events,
)
from open_source_financial_time_series_data_pipeline_architecture_spark.sources import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def trades(spark):
    return trades_from_events(load_table(spark, SF_SMOKE, "events")).cache()


def test_future_as_of_rejected(spark, trades):
    now = dt.datetime(2024, 1, 10)
    with pytest.raises(FutureTimestampError):
        OPS.pit_snapshot(
            spark,
            {"ohlc": (FX.ohlc(trades), "bucket", ["close"])},
            symbol="purchase",
            as_of=dt.datetime(2024, 2, 1),
            now=now,
        )


def test_no_future_leakage_sweep(spark, trades):
    # ~100 deterministic probes spread over the data range, incl. exact
    # bucket boundaries and timestamps before the first trade.
    ohlc = FX.ohlc(trades, 60).select(
        "symbol", "bucket", F.col("close").alias("ohlc_close")
    )
    probes = (
        trades.filter(F.col("trade_id").cast("bigint") % 11 == 0)
        .select("symbol", F.col("time").alias("event_timestamp"))
        .union(
            trades.select(
                "symbol",
                FX.time_bucket("time", 60).alias("event_timestamp"),
            ).limit(20)
        )
        .union(
            spark.createDataFrame(
                [("purchase", dt.datetime(2020, 1, 1))],
                "symbol string, event_timestamp timestamp",
            )
        )
    )
    joined = OPS.asof_join(
        probes,
        ohlc,
        key="symbol",
        entity_time="event_timestamp",
        feature_time="bucket",
        matched_time_col="matched_ts",
    )
    n_leaks = joined.filter(F.col("matched_ts") > F.col("event_timestamp")).count()
    assert n_leaks == 0
    # the pre-data probe must have NULL features
    early = joined.filter(F.col("event_timestamp") == dt.datetime(2020, 1, 1)).collect()
    assert len(early) == 1 and early[0]["ohlc_close"] is None


def test_asof_deterministic(spark, trades):
    ohlc = FX.ohlc(trades, 60).select(
        "symbol", "bucket", F.col("close").alias("ohlc_close")
    )
    probes = trades.filter(F.col("trade_id").cast("bigint") % 37 == 0).select(
        "symbol", F.col("time").alias("event_timestamp")
    )
    a = OPS.asof_join(probes, ohlc, entity_time="event_timestamp", feature_time="bucket")
    b = OPS.asof_join(probes, ohlc, entity_time="event_timestamp", feature_time="bucket")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_ttl_expires_stale_features(spark):
    feature = spark.createDataFrame(
        [("A", dt.datetime(2024, 1, 1, 0, 0), 1.0)],
        "symbol string, time timestamp, v double",
    )
    probes = spark.createDataFrame(
        [
            ("A", dt.datetime(2024, 1, 1, 0, 30)),   # 30 min later: fresh
            ("A", dt.datetime(2024, 1, 1, 2, 0)),    # 2 h later: expired
        ],
        "symbol string, event_timestamp timestamp",
    )
    out = OPS.asof_join(
        probes, feature, entity_time="event_timestamp", feature_time="time",
        ttl_seconds=3600,
    ).orderBy("event_timestamp").collect()
    assert out[0]["v"] == 1.0
    assert out[1]["v"] is None
