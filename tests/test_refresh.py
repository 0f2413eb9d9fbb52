"""Incremental continuous-aggregate refresh: after an initial
materialization over partial data, a refresh with new (and late) rows
must converge to exactly the full recompute — while rewriting only the
affected date partitions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.functions import ohlc
from open_source_financial_time_series_data_pipeline_architecture_spark.schema import (
    trades_from_events,
)
from open_source_financial_time_series_data_pipeline_architecture_spark.sources import load_table
from open_source_financial_time_series_data_pipeline_architecture_spark.streaming.refresh import (
    incremental_refresh,
    validate_spec,
)
from tests.conftest import SF_SMOKE


def _norm(df):
    return sorted(
        map(
            tuple,
            df.select("bucket", "symbol", "open", "high", "low", "close", "volume", "trade_count").collect(),
        )
    )


def test_incremental_refresh_converges(spark, tmp_path):
    trades = trades_from_events(load_table(spark, SF_SMOKE, "events"))
    target = str(tmp_path / "ohlc_1m")
    cutoff = "2024-01-20"

    # initial build over the first ~2/3 of the data
    r1 = incremental_refresh(
        spark, trades.filter(F.col("time") < cutoff), "ohlc_1m", target
    )
    assert r1["mode"] == "initial" and r1["rows_written"] > 0

    # refresh with the full data (new rows after the hwm + lookback)
    r2 = incremental_refresh(spark, trades, "ohlc_1m", target, lookback_seconds=3600)
    assert r2["mode"] == "incremental" and r2["hwm"] is not None

    got = spark.read.parquet(target).drop("__date")
    full = ohlc(trades, 60)
    assert _norm(got) == _norm(full)


def test_refresh_rejects_row_window_features(spark):
    with pytest.raises(ValueError):
        validate_spec("sma_20")


def test_refresh_is_idempotent(spark, tmp_path):
    trades = trades_from_events(load_table(spark, SF_SMOKE, "events"))
    target = str(tmp_path / "vwap_5m")
    incremental_refresh(spark, trades, "vwap_5m", target)
    n1 = spark.read.parquet(target).count()
    incremental_refresh(spark, trades, "vwap_5m", target)  # no new data
    n2 = spark.read.parquet(target).count()
    assert n1 == n2
