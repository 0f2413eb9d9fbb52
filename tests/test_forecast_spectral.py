"""Holt linear smoothing (operators/statespace.holt_linear) and the
DFT periodogram (functions/spectral.periodogram): recurrence
correctness against a hand loop, seed/edge behavior, and spectral
peak detection on a synthetic periodic series."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.functions import spectral as SPX
from open_source_financial_time_series_data_pipeline_architecture_spark.operators import statespace as SS


def test_holt_matches_hand_loop_and_seed(spark):
    ys = [10.0, 12.0, 11.0, 15.0, 14.0]
    df = spark.createDataFrame(
        [(i, "A", f"t{i}", y) for i, y in enumerate(ys)],
        "time long, symbol string, trade_id string, price double",
    )
    got = {
        r["time"]: (r["hw_level"], r["hw_trend"], r["hw_forecast"])
        for r in SS.holt_linear(df).collect()
    }
    level, trend = None, 0.0
    for i, y in enumerate(ys):
        if level is None:
            level, trend = y, 0.0
        else:
            prev = level
            level = 0.5 * y + 0.5 * (prev + trend)
            trend = 0.3 * (level - prev) + 0.7 * trend
        assert got[i] == (level, trend, level + trend), i
    # single-row series: seeded, zero trend, forecast = the value
    one = spark.createDataFrame(
        [(0, "B", "t0", 7.5)],
        "time long, symbol string, trade_id string, price double",
    )
    row = SS.holt_linear(one).collect()[0]
    assert (row["hw_level"], row["hw_trend"], row["hw_forecast"]) == (
        7.5,
        0.0,
        7.5,
    )


def test_holt_keys_are_independent(spark):
    df = spark.createDataFrame(
        [(0, "A", "a", 1.0), (1, "A", "b", 2.0), (0, "B", "c", 100.0)],
        "time long, symbol string, trade_id string, price double",
    )
    got = {
        (r["symbol"], r["time"]): r["hw_level"]
        for r in SS.holt_linear(df).collect()
    }
    assert got[("B", 0)] == 100.0  # B's seed is B's own first value
    assert got[("A", 1)] == 0.5 * 2.0 + 0.5 * (1.0 + 0.0)


def test_periodogram_finds_planted_frequency(spark):
    # x_t = cos(2π·3·t/N): all spectral mass at k=3
    n = 240
    rows = [
        ("A", t, math.cos(2.0 * math.pi * 3.0 * t / n)) for t in range(n)
    ]
    df = spark.createDataFrame(rows, "symbol string, bucket long, x double")
    got = {r["k"]: r["power"] for r in SPX.periodogram(df).collect()}
    assert set(got) == set(range(1, 9))
    peak = max(got, key=got.get)
    assert peak == 3
    # the planted bin carries (N/2)² power; every other bin is ~zero
    assert got[3] > 1000 * max(v for k, v in got.items() if k != 3)
    assert all(r == n for r in [len(rows)])


def test_periodogram_constant_series_is_flat_zero(spark):
    df = spark.createDataFrame(
        [("A", t, 5.0) for t in range(64)],
        "symbol string, bucket long, x double",
    )
    got = SPX.periodogram(df).collect()
    # centering removes the DC component: a constant series has no
    # power anywhere (up to float noise)
    assert all(abs(r["power"]) < 1e-18 for r in got)
    assert all(r["n_buckets"] == 64 for r in got)
