"""Engine facade: the 'switch from the reference' user surface."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.api import Engine
from open_source_financial_time_series_data_pipeline_architecture_spark.operators.asof import (
    FutureTimestampError,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def eng(spark):
    return Engine(spark, SF_SMOKE)


def test_features_by_name(eng):
    assert len(eng.feature_names()) == 9
    ohlc = eng.feature("ohlc_1m")
    assert {"bucket", "symbol", "open", "close"} <= set(ohlc.columns)
    assert ohlc.count() > 0


def test_pit_snapshot_facade(eng):
    as_of = eng.trades().agg(F.max("time")).collect()[0][0]
    row = eng.pit_snapshot("purchase", as_of, now=as_of).collect()[0]
    assert row["symbol"] == "purchase"
    assert row["ohlc_close"] is not None and row["sma_20"] is not None
    with pytest.raises(FutureTimestampError):
        eng.pit_snapshot("purchase", as_of + dt.timedelta(days=1), now=as_of)


def test_get_historical_features_facade(eng):
    entity = eng.trades().limit(50).select(
        "symbol", F.col("time").alias("event_timestamp")
    )
    out = eng.get_historical_features(entity, ["ohlc_1m", "vwap_5m"])
    cols = set(out.columns)
    assert "ohlc_1m__close" in cols and "vwap_5m__vwap" in cols
    assert out.count() == 50


def test_sql_views(eng, spark):
    eng.register_sql_views()
    got = spark.sql(
        "SELECT o.symbol, o.close, v.vwap FROM ohlc_1m o "
        "JOIN vwap_5m v ON o.symbol = v.symbol AND v.bucket <= o.bucket "
        "LIMIT 5"
    ).collect()
    assert len(got) == 5


def test_quality_reports(eng):
    dq = eng.dq_report().collect()[0]
    assert dq["passed"]
    now = eng.trades().agg(F.max("time")).collect()[0][0]
    fresh = eng.freshness_report(now=now).collect()
    assert len(fresh) == 9
    assert all(r["latest_ts"] is not None for r in fresh)


def test_quickstart_example_runs(spark):
    # the examples/quickstart.py flow, driven through the same session
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples", "quickstart.py")
    spec = importlib.util.spec_from_file_location("quickstart", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # imports only; main() not invoked here

    from open_source_financial_time_series_data_pipeline_architecture_spark.api import Engine

    eng = Engine(spark, "/root/testdata/sf0.001")
    assert len(eng.feature_names()) >= 9
    sym = eng.trades().select("symbol").first()["symbol"]
    snap = eng.pit_snapshot(sym, as_of="2024-01-08T00:00:00")
    assert snap.count() >= 0


def test_engine_continuous_aggregate_facade(spark, tmp_path):
    from pyspark.sql import functions as F

    from open_source_financial_time_series_data_pipeline_architecture_spark.api import Engine
    from open_source_financial_time_series_data_pipeline_architecture_spark.sources import versioned as V

    base = str(tmp_path / "b")
    V.commit(
        spark.range(0, 50).select(
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") * 30).alias("ts"),
            (F.col("id") % 2).cast("string").alias("sym"),
            (F.col("id") * 1.0).alias("px"),
        ),
        base,
    )
    eng = Engine.__new__(Engine)  # facade methods only need .spark
    eng.spark = spark
    ca = eng.continuous_aggregate(
        base,
        str(tmp_path / "a"),
        time_col="ts",
        bucket_seconds=60,
        group_cols=["sym"],
        aggs={"n": F.count(F.lit(1))},
    )
    ca.create()
    assert ca.read().agg(F.sum("n")).first()[0] == 50
