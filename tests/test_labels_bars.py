"""Semantic tests for the session-3 operators: triple-barrier labels,
dollar bars, containment dedup, chunk-level cross-source overlap,
Hurst exponent. (DuckDB value parity is covered by test_oracle_parity;
these pin the operator CONTRACTS on deterministic fixtures.)
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.functions.labels import (
    triple_barrier,
)
from open_source_financial_time_series_data_pipeline_architecture_spark.functions.microstructure import (
    dollar_bars,
)
from open_source_financial_time_series_data_pipeline_architecture_spark.functions.indicators import (
    hurst_exponent,
    hurst_slope_coeffs,
)
from open_source_financial_time_series_data_pipeline_architecture_spark.operators.dedup import (
    containment_pairs,
    cross_source_overlap,
)


def _bars(spark, closes, symbol="A"):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (symbol, t0 + dt.timedelta(minutes=i), float(c))
        for i, c in enumerate(closes)
    ]
    return spark.createDataFrame(rows, "symbol string, bucket timestamp, close double")


def test_triple_barrier_up_first(spark):
    # monotone rise: +0.2% barrier hit at the first bar that crosses it
    closes = [100.0 * (1.001**i) for i in range(15)]
    out = triple_barrier(_bars(spark, closes), horizon=10).orderBy("bucket")
    rows = out.collect()
    # rows with a full forward window: 15 - 10 = 5
    assert len(rows) == 5
    for r in rows:
        assert r.label == 1
        assert r.up_idx >= 1 and r.dn_idx == 0
        # 1.001^2 > 1.002 -> barrier crossed at the second forward bar
        assert r.up_idx == 2


def test_triple_barrier_down_and_neutral(spark):
    closes = [100.0 * (0.999**i) for i in range(15)]
    down = triple_barrier(_bars(spark, closes), horizon=10).collect()
    # 0.999^2 = 0.998001 > 0.998 -> the barrier is only crossed at bar 3
    assert all(r.label == -1 and r.dn_idx == 3 for r in down)
    flat = triple_barrier(_bars(spark, [100.0] * 15), horizon=10).collect()
    assert all(r.label == 0 and r.up_idx == 0 and r.dn_idx == 0 for r in flat)


def _trades_df(spark, rows):
    return spark.createDataFrame(
        rows, "symbol string, time timestamp, trade_id string, price double, volume double"
    )


def test_dollar_bars_partition_and_conservation(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("A", t0 + dt.timedelta(seconds=i), f"t{i:04d}", 10.0, 30.0)
        for i in range(100)
    ]  # each trade = $300; threshold 1000 -> bars of 4 trades (cum-before rule)
    out = dollar_bars(_trades_df(spark, rows), threshold=1000.0).orderBy("bar_id")
    bars = out.collect()
    assert sum(r.n_trades for r in bars) == 100
    assert abs(sum(r.dollar_volume for r in bars) - 30000.0) < 1e-6
    # bar_id assignment uses cumulative dollars BEFORE the trade:
    # trades 0-3 (cum-before 0..900) -> bar 0; trade 4 (cum 1200) -> bar 1
    assert bars[0].n_trades == 4
    # all interior bars carry >= threshold dollars except possibly the first
    for r in bars[1:-1]:
        assert r.dollar_volume >= 900.0


def test_containment_subset_doc(spark):
    # B contains all of A's shingles -> containment_ab == 1.0
    a_text = "alpha beta gamma delta epsilon zeta"
    b_text = a_text + " eta theta iota kappa lambda mu nu xi"
    docs = spark.createDataFrame(
        [(1, a_text), (2, b_text)], "doc_id long, text string"
    )
    out = containment_pairs(docs, n=3, threshold=0.5, max_doc_freq=None).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.containment_ab == pytest.approx(1.0)
    assert r.containment_ba < 1.0


def test_cross_source_overlap_planted_passage(spark):
    passage = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (1, passage + " unique1 filler filler2 a b c d e f g", "s1"),
            (2, passage + " other2 pad pad2 h i j k l m n", "s2"),
            (3, "totally different words " + " ".join(f"z{i}" for i in range(10)), "s3"),
        ],
        "doc_id long, text string, source string",
    )
    out = {
        (r.source_a, r.source_b): r.n_shared
        for r in cross_source_overlap(docs, chunk_words=10).collect()
    }
    assert out == {("s1", "s2"): 1}


def test_hurst_coeffs_and_bounds(spark):
    cs = hurst_slope_coeffs((1, 2, 4, 8, 16))
    assert abs(sum(cs)) < 1e-12  # centered
    # deterministic bounded oscillation -> strongly mean-reverting,
    # H well below 0.5 (variance stops growing with scale); sin keeps
    # every lag's variance positive, unlike a period-2 alternation
    import math

    closes = [100.0 + math.sin(float(i)) for i in range(200)]
    out = hurst_exponent(_bars(spark, closes)).collect()
    assert len(out) == 1
    assert out[0].hurst is not None and out[0].hurst < 0.25
