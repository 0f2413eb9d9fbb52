"""Producer contract (S1: validation + DLQ routing) and observability
shims (V4/V5) — end-to-end through the streaming ingest."""

from __future__ import annotations

import pytest

from open_source_financial_time_series_data_pipeline_architecture_spark import streaming as STR
from open_source_financial_time_series_data_pipeline_architecture_spark.functions.observability import (
    LineageRecorder,
)
from open_source_financial_time_series_data_pipeline_architecture_spark.sources.producer import (
    FileTradeProducer,
)


def test_producer_contract_and_ingest(spark, tmp_path):
    topic = str(tmp_path / "trades-topic")
    p = FileTradeProducer(topic)
    for i in range(20):
        assert p.produce_trade(
            "AAPL", f"{150 + i * 0.1:.2f}", "100.00", f"P-{i:03d}",
            time_ms=1_709_000_000_000 + i * 1000, side="buy" if i % 2 else "sell",
        )
    # contract violations → DLQ, not the topic
    assert not p.produce_trade("AAPL", None, "100", "P-BAD1", time_ms=1)
    assert not p.produce_trade("AAPL", "1.0", "100", "P-BAD2", time_ms=2, side="hold")
    p.flush()
    assert p.produced == 20 and p.rejected == 2

    good, dlq = STR.read_trade_stream_json(spark, topic)
    q = (
        good.writeStream.format("memory").queryName("prod_ingest")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(60)
    rows = spark.sql("SELECT * FROM prod_ingest").collect()
    assert len(rows) == 20
    assert all(r["price"] is not None for r in rows)


def test_lineage_recorder_spans(spark, tmp_path):
    d = str(tmp_path / "lineage")
    rec = LineageRecorder(spark, d)
    with rec.span("ohlc_refresh", inputs=["trades"], outputs=["ohlc_1m"]):
        pass
    with pytest.raises(RuntimeError):
        with rec.span("failing_job"):
            raise RuntimeError("boom")
    rec.flush()
    got = spark.read.parquet(d)
    types = {(r["job"], r["event_type"]) for r in got.collect()}
    assert ("ohlc_refresh", "COMPLETE") in types
    assert ("failing_job", "FAIL") in types
    assert got.count() == 4
