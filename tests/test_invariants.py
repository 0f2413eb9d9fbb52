"""Smart-DB contract invariants on real feature output, mirroring the
reference's correctness suite (tests/test_smartdb_correctness.py:94-170
and the deterministic SMA fixture :46-92)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark import functions as FX
from open_source_financial_time_series_data_pipeline_architecture_spark.schema import (
    trades_from_events,
)
from open_source_financial_time_series_data_pipeline_architecture_spark.sources import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def trades(spark):
    return trades_from_events(load_table(spark, SF_SMOKE, "events")).cache()


def test_ohlc_invariants(trades):
    ohlc = FX.ohlc(trades, 60)
    assert ohlc.filter(F.col("high") < F.col("low")).count() == 0
    assert ohlc.filter(
        (F.col("open") > F.col("high")) | (F.col("open") < F.col("low"))
    ).count() == 0
    assert ohlc.filter(
        (F.col("close") > F.col("high")) | (F.col("close") < F.col("low"))
    ).count() == 0
    assert ohlc.filter(F.col("close").isNull()).count() == 0
    assert ohlc.filter(F.col("trade_count") <= 0).count() == 0


def test_volatility_nonnegative(trades):
    vol = FX.volatility(trades, 3600)
    assert vol.filter(F.col("volatility") < 0).count() == 0


def test_vwap_positive_with_volume(trades):
    vw = FX.vwap(trades, 300)
    assert vw.filter((F.col("total_volume") > 0) & ~(F.col("vwap") > 0)).count() == 0
    # VWAP bounded by min/max trade price in the bucket at all times
    assert vw.filter(F.col("vwap").isNull() & (F.col("total_volume") > 0)).count() == 0


def test_imbalance_bounded(trades):
    imb = FX.trade_imbalance(trades, 300)
    assert imb.filter(
        (F.col("trade_imbalance") < -1) | (F.col("trade_imbalance") > 1)
    ).count() == 0


def test_regime_domain(trades):
    regimes = FX.regime_tags(trades, 20)
    vals = {r[0] for r in regimes.select("regime_tag").distinct().collect()}
    assert vals <= {"up", "down", "neutral"}


def test_sma_deterministic_fixture(spark):
    # the reference's ascending-price oracle: 25 trades, price=150+i*0.1,
    # 1-minute spacing → sma_20 at the last row = mean of prices 5..24
    base = dt.datetime(2024, 6, 1)
    rows = [
        (base + dt.timedelta(minutes=i), "TEST", 150.0 + i * 0.1, 100.0, f"F-{i:02d}")
        for i in range(25)
    ]
    df = spark.createDataFrame(
        rows, "time timestamp, symbol string, price double, volume double, trade_id string"
    )
    out = FX.sma(df, 20).orderBy("time").collect()
    expected_last = sum(150.0 + i * 0.1 for i in range(5, 25)) / 20
    assert abs(out[-1]["sma_20"] - expected_last) < 1e-9
    # first row's 20-row trailing window is just itself
    assert abs(out[0]["sma_20"] - 150.0) < 1e-12


def test_ewm_deterministic_fixture(spark):
    base = dt.datetime(2024, 6, 1)
    prices = [100.0, 110.0, 120.0]
    df = spark.createDataFrame(
        [
            (base + dt.timedelta(minutes=i), "TEST", p, f"E-{i}")
            for i, p in enumerate(prices)
        ],
        "time timestamp, symbol string, price double, trade_id string",
    )
    out = FX.ewm(df, span=12, alpha=0.15).orderBy("time").collect()
    # y0=100; y1=.15*110+.85*100=101.5; y2=.15*120+.85*101.5=104.275
    assert [round(r["ewm_12"], 6) for r in out] == [100.0, 101.5, 104.275]


def test_large_trade_flag_rate(trades):
    lt = FX.large_trade_flags(trades, 0.95)
    per_symbol = lt.groupBy("symbol").agg(
        (F.sum(F.col("large_trade_flag").cast("int")) / F.count(F.lit(1))).alias("rate")
    )
    # ~5% flagged by construction of the p95 threshold (volume is
    # integer-valued so ties can push the rate slightly under)
    assert per_symbol.filter((F.col("rate") > 0.08) | (F.col("rate") < 0.01)).count() == 0


def test_kalman_gain_converges_to_riccati_fixed_point(spark):
    import math

    from open_source_financial_time_series_data_pipeline_architecture_spark.operators.statespace import (
        kalman_local_level,
    )

    base = dt.datetime(2024, 6, 1)
    rows = [
        (base + dt.timedelta(minutes=i), "TEST", 100.0 + (i % 7), f"K-{i:03d}")
        for i in range(300)
    ]
    df = spark.createDataFrame(
        rows, "time timestamp, symbol string, price double, trade_id string"
    )
    out = kalman_local_level(df, q=0.01, r=1.0, p_init=1.0).orderBy("time").collect()
    # scalar Riccati fixed point: p* = (−q + sqrt(q² + 4qr))/2
    q_, r_ = 0.01, 1.0
    p_star = (-q_ + math.sqrt(q_ * q_ + 4 * q_ * r_)) / 2
    k_star = (p_star + q_) / (p_star + q_ + r_)
    assert out[0]["kf_gain"] is None
    assert abs(out[0]["kf_var"] - 1.0) < 1e-12
    assert abs(out[-1]["kf_gain"] - k_star) < 1e-9
    assert abs(out[-1]["kf_var"] - p_star) < 1e-9
    # gain decreases monotonically from the uncertain start
    gains = [r["kf_gain"] for r in out[1:]]
    assert all(a >= b for a, b in zip(gains, gains[1:]))
    # filtered level stays inside the observed price envelope
    assert all(100.0 <= r["kf_level"] <= 106.0 for r in out)


def test_dtw_invariants(spark):
    from open_source_financial_time_series_data_pipeline_architecture_spark.operators.statespace import (
        dtw_pair_distances,
    )

    base = dt.date(2024, 6, 1)
    rows = []
    for i in range(30):
        va = float((i * 7) % 11)
        rows.append(("A", "B", base + dt.timedelta(days=i), va, va))  # identical
        rows.append(
            ("A", "C", base + dt.timedelta(days=i), va, float((i * 5) % 9))
        )
    df = spark.createDataFrame(
        rows, "symbol_a string, symbol_b string, d date, va double, vb double"
    )
    out = {
        (r["symbol_a"], r["symbol_b"]): r
        for r in dtw_pair_distances(df, band=5).collect()
    }
    # identical series → zero distance
    assert out[("A", "B")]["dtw_dist"] == 0.0
    # dtw <= L1 euclidean (band includes the identity alignment)
    for r in out.values():
        assert r["dtw_dist"] <= r["euclidean_l1"] + 1e-12
    # widening the band can only reduce (or keep) the distance
    wide = {
        (r["symbol_a"], r["symbol_b"]): r["dtw_dist"]
        for r in dtw_pair_distances(df, band=15).collect()
    }
    for k, r in out.items():
        assert wide[k] <= r["dtw_dist"] + 1e-12


def test_kalman_schema_derived_from_input(spark):
    """ADVICE r2: output pass-through dtypes must come from the input
    relation — a numeric key and a date order column keep their types
    instead of being silently cast to the old hardcoded
    [timestamp, string, string, double] list."""
    from open_source_financial_time_series_data_pipeline_architecture_spark.operators.statespace import (
        kalman_local_level,
    )

    rows = [
        (dt.date(2024, 6, 1 + i), 7, 100.0 + i) for i in range(5)
    ] + [(dt.date(2024, 6, 1 + i), 9, 50.0 + i) for i in range(5)]
    df = spark.createDataFrame(rows, "d date, sensor int, reading double")
    out = kalman_local_level(
        df,
        key_col="sensor",
        value_col="reading",
        order_cols=("d",),
    )
    dtypes = dict(out.dtypes)
    assert dtypes["sensor"] == "int"
    assert dtypes["d"] == "date"
    assert dtypes["reading"] == "double"
    assert dtypes["kf_level"] == "double"
    got = {r["sensor"] for r in out.select("sensor").distinct().collect()}
    assert got == {7, 9}


def test_lttb_single_bucket_keeps_first_and_last(spark):
    """ADVICE r2: a key spanning one bucket must keep BOTH endpoints
    (LTTB endpoint rule); a one-point bucket collapses to a single
    'first' row rather than duplicating it."""
    from open_source_financial_time_series_data_pipeline_architecture_spark.operators.downsample import (
        lttb_downsample,
    )

    base = dt.datetime(2024, 6, 1)
    rows = [
        # SOLO spans a single 6h bucket with 3 points
        (base + dt.timedelta(minutes=i * 10), "SOLO", 100.0 + i, f"S-{i}")
        for i in range(3)
    ] + [
        # LONE has exactly one point in its single bucket
        (base, "LONE", 42.0, "L-0")
    ] + [
        # MULTI spans three buckets (normal path, regression guard)
        (base + dt.timedelta(hours=6 * i), "MULTI", 10.0 + i, f"M-{i}")
        for i in range(3)
    ]
    df = spark.createDataFrame(
        rows, "time timestamp, symbol string, price double, trade_id string"
    )
    out = lttb_downsample(df, bucket_seconds=21600).collect()
    by_sym: dict[str, list] = {}
    for r in out:
        by_sym.setdefault(r["symbol"], []).append(r)
    solo = {r["rule"]: r for r in by_sym["SOLO"]}
    assert set(solo) == {"first", "last"}
    assert solo["first"]["trade_id"] == "S-0"
    assert solo["last"]["trade_id"] == "S-2"
    # one-point bucket: exactly one row, no duplicate 'last'
    assert [r["rule"] for r in by_sym["LONE"]] == ["first"]
    # normal multi-bucket key unchanged: first + area + last
    assert sorted(r["rule"] for r in by_sym["MULTI"]) == [
        "area",
        "first",
        "last",
    ]
