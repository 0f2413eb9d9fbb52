"""End-to-end streaming feature pipeline: producer → topic → four sinks
(raw upsert, two watermarked features through the transactional file
sink, DLQ), then a re-run over the same topic with fresh checkpoints to
prove replay safety of the raw path."""

from __future__ import annotations

from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark.sources.producer import (
    FileTradeProducer,
)
from open_source_financial_time_series_data_pipeline_architecture_spark.streaming.pipeline import (
    run_streaming_feature_pipeline,
)

BASE_MS = 1_709_290_800_000  # 2024-03-01 11:00:00 UTC


def test_full_pipeline(spark, tmp_path):
    topic = str(tmp_path / "topic")
    out = str(tmp_path / "out")

    p = FileTradeProducer(topic)
    for i in range(300):
        p.produce_trade(
            "AAPL" if i % 2 else "MSFT",
            f"{100 + (i % 37) * 0.25:.2f}",
            f"{50 + i % 10}.00",
            f"S-{i:04d}",
            time_ms=BASE_MS + i * 2000,  # 2 s apart → 10 minutes of data
            side="buy" if i % 3 else "sell",
        )
    p.flush()
    # a malformed line straight into the topic (producer validation
    # would have caught it — this simulates upstream corruption) → the
    # STREAM's DLQ branch must catch it
    with open(f"{topic}/corrupt.jsonl", "w") as f:
        f.write("{this is not json\n")
    # watermark sentinel: one far-future trade finalizes all real windows
    p.produce_trade("AAPL", "100.0", "1.00", "S-SENTINEL", time_ms=BASE_MS + 3_600_000)
    p.flush()

    run_streaming_feature_pipeline(spark, topic, out)

    raw = spark.read.parquet(f"{out}/raw_trades")
    assert raw.count() == 301  # 300 + sentinel, bad row excluded
    ohlc = spark.read.parquet(f"{out}/ohlc_1m")
    assert ohlc.filter(F.col("symbol") == "AAPL").count() >= 9
    # finalized windows only: every bucket fully before the sentinel
    assert ohlc.agg(F.max("bucket")).collect()[0][0].year == 2024
    vwap = spark.read.parquet(f"{out}/vwap_5m")
    assert vwap.count() >= 4
    dlq = spark.read.parquet(f"{out}/dlq")
    assert dlq.count() == 1

    # chaos replay: same topic, FRESH checkpoints → raw upsert must not
    # duplicate anything
    import shutil

    shutil.rmtree(f"{out}/_ckpt")
    run_streaming_feature_pipeline(spark, topic, out)
    raw2 = spark.read.parquet(f"{out}/raw_trades")
    assert raw2.count() == 301
    assert raw2.groupBy("trade_id").count().filter("count > 1").count() == 0
