"""The streaming feature pipeline — the reference's
``streaming_feature_updates.py`` job re-composed on Structured Streaming.

One callable wires ingest → parse/DLQ → watermarked features → sinks:

- raw trades land through the **idempotent keyed upsert** sink
  (foreachBatch, exactly-once under replay — T6);
- finalized feature windows (append mode behind the watermark) go to
  Spark's **transactional file sink** (parquet + _spark_metadata commit
  log): each micro-batch commits atomically, replays are deduplicated
  by batch id — the second exactly-once mechanism, no keys needed
  because append-mode windows emit exactly once;
- malformed events stream to the DLQ table (S13).

Triggers: `availableNow` drains everything then stops (test/batch
catch-up mode); `processingTime='10 seconds'` matches the reference's
10 s micro-batches (streaming_feature_updates.py:90).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..sources.sinks import foreach_batch_upsert
from .jobs import parse_trades_with_dlq, streaming_ohlc, streaming_vwap


def run_streaming_feature_pipeline(
    spark: SparkSession,
    topic_dir: str,
    out_base: str,
    watermark: str = "1 minute",
    trigger_available_now: bool = True,
    processing_time: str = "10 seconds",
    await_seconds: int = 300,
) -> list[StreamingQuery]:
    """Start (and with availableNow: drain) the full pipeline.

    Layout under ``out_base``:
      raw_trades/   keyed-upsert parquet (time, symbol, trade_id)
      ohlc_1m/      transactional file sink, finalized 1-min windows
      vwap_5m/      transactional file sink, finalized 5-min windows
      dlq/          malformed raw events
      _ckpt/*       one checkpoint dir per sink
    """
    raw = spark.readStream.format("text").load(topic_dir)
    good, dlq = parse_trades_with_dlq(raw)

    def _trigger(writer):
        if trigger_available_now:
            return writer.trigger(availableNow=True)
        return writer.trigger(processingTime=processing_time)

    queries: list[StreamingQuery] = []

    queries.append(
        _trigger(
            good.writeStream.foreachBatch(
                foreach_batch_upsert(f"{out_base}/raw_trades")
            ).option("checkpointLocation", f"{out_base}/_ckpt/raw")
        ).start()
    )
    queries.append(
        _trigger(
            streaming_ohlc(good, "1 minute", watermark)
            .writeStream.format("parquet")
            .option("path", f"{out_base}/ohlc_1m")
            .option("checkpointLocation", f"{out_base}/_ckpt/ohlc")
            .outputMode("append")
        ).start()
    )
    queries.append(
        _trigger(
            streaming_vwap(good, "5 minutes", watermark)
            .writeStream.format("parquet")
            .option("path", f"{out_base}/vwap_5m")
            .option("checkpointLocation", f"{out_base}/_ckpt/vwap")
            .outputMode("append")
        ).start()
    )
    queries.append(
        _trigger(
            dlq.writeStream.format("parquet")
            .option("path", f"{out_base}/dlq")
            .option("checkpointLocation", f"{out_base}/_ckpt/dlq")
            .outputMode("append")
        ).start()
    )

    if trigger_available_now:
        for q in queries:
            q.awaitTermination(await_seconds)
    return queries
