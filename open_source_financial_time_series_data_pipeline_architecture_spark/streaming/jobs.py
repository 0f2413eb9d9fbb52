"""Structured Streaming jobs: ingest, DLQ branch, watermarked features.

Re-implements the reference's streaming surface Spark-first:

- S3–S5  Kafka scan → from_json → epoch-ms to timestamp
  (/root/reference/spark/streaming_feature_updates.py:55-75)
- T9/S13 malformed rows → DLQ side-output
  (/root/reference/src/quality/data_contracts.py:203-222)
- T1/T2  watermark + tumbling-window OHLC/VWAP
  (/root/reference/spark/streaming_feature_updates.py:96-126)

The same feature functions used in batch apply to streams — a streaming
DataFrame goes through the identical `groupBy(window(...))` logical
plan, which is the whole point of the unified Dataset API.

Kafka itself is config, not code: `read_trade_stream_json` accepts any
streaming source DataFrame with a string `value` column (kafka, file,
rate, memory); tests drive it with file/memory sources since no broker
exists in this environment.

Exactly-once: checkpointed offsets + the idempotent `merge_upsert` sink
(sources/sinks.py) keyed on (time, symbol, trade_id) — micro-batch
replay re-writes the same keys, so duplicates cannot land (T6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Wire schema of a JSON trade event (epoch-ms `time`, stringified
# decimals — matching the reference's Avro-with-string-decimals contract,
# market_data_producer.py:90-93).
TRADE_JSON_SCHEMA = T.StructType(
    [
        T.StructField("time", T.LongType()),
        T.StructField("symbol", T.StringType()),
        T.StructField("price", T.StringType()),
        T.StructField("volume", T.StringType()),
        T.StructField("trade_id", T.StringType()),
        T.StructField("side", T.StringType()),
        T.StructField("bid", T.StringType()),
        T.StructField("ask", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "latest",
    exactly_once_source: bool = True,
) -> DataFrame:
    """Kafka streaming scan (S3/S10): untested here (no broker), kept as
    the documented config surface. `isolation.level=read_committed`
    mirrors the reference's EOS source setting
    (enhanced_anomaly_detection.py:231-248)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
    )
    if exactly_once_source:
        reader = reader.option("kafka.isolation.level", "read_committed")
    return reader.load()


def parse_trades_with_dlq(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """S4/S5/T9/S13 — decode JSON `value`, split (good, dlq).

    A row is DLQ'd when JSON parsing fails or contract-required fields
    (time, symbol, price, volume, trade_id) are missing, mirroring the
    reference's deserialize-or-None + DLQ routing."""
    parsed = raw.select(
        F.col("value").cast("string").alias("raw_value")
    ).withColumn("j", F.from_json("raw_value", TRADE_JSON_SCHEMA))

    required_ok = (
        F.col("j").isNotNull()
        & F.col("j.time").isNotNull()
        & F.col("j.symbol").isNotNull()
        & F.col("j.price").isNotNull()
        & F.col("j.volume").isNotNull()
        & F.col("j.trade_id").isNotNull()
    )
    good = (
        parsed.filter(required_ok)
        .select(
            F.timestamp_millis(F.col("j.time")).alias("time"),
            F.col("j.symbol").alias("symbol"),
            F.col("j.price").cast("double").alias("price"),
            F.col("j.volume").cast("double").alias("volume"),
            F.col("j.trade_id").alias("trade_id"),
            F.col("j.side").alias("side"),
            F.col("j.bid").cast("double").alias("bid"),
            F.col("j.ask").cast("double").alias("ask"),
            F.col("j.source").alias("source"),
        )
    )
    dlq = parsed.filter(~required_ok).select(
        "raw_value", F.current_timestamp().alias("dlq_time")
    )
    return good, dlq


def read_trade_stream_json(
    spark: SparkSession, path: str, max_files_per_trigger: int = 10
) -> tuple[DataFrame, DataFrame]:
    """File-based streaming ingest of JSON-lines trade events (the
    broker-free test path; swap `read_kafka_stream` in for prod)."""
    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
    )
    return parse_trades_with_dlq(raw.withColumnRenamed("value", "value"))


def streaming_ohlc(
    trades: DataFrame, bucket: str = "1 minute", watermark: str = "1 minute"
) -> DataFrame:
    """T1/T2/A1 — watermarked tumbling-window OHLC on a stream.

    Same semantics as the batch `functions.ohlc`; uses `window()` (the
    streaming-capable bucketing) and min_by/max_by for open/close. The
    watermark bounds state: buckets older than it are finalized and
    evicted (late rows beyond it are dropped — T9).
    """
    tkey = F.struct(F.col("time"), F.col("trade_id"))
    return (
        trades.withWatermark("time", watermark)
        .groupBy(F.window("time", bucket).alias("w"), "symbol")
        .agg(
            F.min_by("price", tkey).alias("open"),
            F.max("price").alias("high"),
            F.min("price").alias("low"),
            F.max_by("price", tkey).alias("close"),
            F.sum("volume").alias("volume"),
            F.count(F.lit(1)).alias("trade_count"),
        )
        .select(F.col("w.start").alias("bucket"), "symbol", "open", "high", "low", "close", "volume", "trade_count")
    )


def streaming_imbalance(
    trades: DataFrame, bucket: str = "5 minutes", watermark: str = "1 minute"
) -> DataFrame:
    """T2/A8 — watermarked buy/sell imbalance on a stream; identical
    conditional-aggregation logical plan to the batch
    `functions.trade_imbalance` (the unified Dataset API at work)."""
    buy = F.sum(F.when(F.col("side") == "buy", F.col("volume")).otherwise(0.0))
    sell = F.sum(F.when(F.col("side") == "sell", F.col("volume")).otherwise(0.0))
    return (
        trades.filter(F.col("side").isNotNull())
        .withWatermark("time", watermark)
        .groupBy(F.window("time", bucket).alias("w"), "symbol")
        .agg(
            buy.alias("buy_volume"),
            sell.alias("sell_volume"),
            ((buy - sell) / F.nullif(buy + sell, F.lit(0.0))).alias(
                "trade_imbalance"
            ),
        )
        .select(
            F.col("w.start").alias("bucket"),
            "symbol",
            "buy_volume",
            "sell_volume",
            "trade_imbalance",
        )
    )


def streaming_dedup(
    trades: DataFrame,
    watermark: str = "1 minute",
    keys: list[str] | None = None,
) -> DataFrame:
    """J4/T6 at streaming scale — drop duplicate trade events with
    state BOUNDED by the watermark.

    The reference anchors exactly-once on the `(time, symbol, trade_id)`
    PK (/root/reference/sql/timescaledb_schema.sql:24 and the chaos test
    tests/test_chaos_flink_exactly_once.py:182-226). A plain
    `dropDuplicates` on a stream keeps every key ever seen — unbounded
    state, a guaranteed OOM on an infinite stream.
    `dropDuplicatesWithinWatermark` evicts keys once the watermark
    passes them, so state is O(events per watermark window) regardless
    of stream lifetime — the only formulation that survives at 100 TB/day.
    Duplicates arriving later than the watermark are handled by the
    idempotent `merge_upsert` sink (defense in depth, same as the
    reference's PK-plus-idempotent-producer pairing).
    """
    keys = keys or ["time", "symbol", "trade_id"]
    return trades.withWatermark("time", watermark).dropDuplicatesWithinWatermark(keys)


def streaming_sessions(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 minute",
    user_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
) -> DataFrame:
    """T10 — native session windows on a stream.

    The reference never uses session windows (SURVEY §2.10 T10); the
    batch analog here is the gap-based `user_sessionization` query. This
    is the Spark-native streaming form: `session_window` merges rows
    within `gap` of each other into one growing window per key, state
    is finalized and evicted when the watermark passes a session's end.
    Unlike the batch lag/cumsum formulation there is no full sort per
    key — sessions merge incrementally in the state store.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sw"), F.col(user_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(val_col).alias("total_value"),
        )
        .select(
            F.col(user_col),
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def streaming_vwap(
    trades: DataFrame, bucket: str = "5 minutes", watermark: str = "1 minute"
) -> DataFrame:
    """T2/A5 — watermarked VWAP on a stream."""
    return (
        trades.withWatermark("time", watermark)
        .groupBy(F.window("time", bucket).alias("w"), "symbol")
        .agg(
            (
                F.sum(F.col("price") * F.col("volume"))
                / F.nullif(F.sum("volume"), F.lit(0.0))
            ).alias("vwap"),
            F.sum("volume").alias("total_volume"),
        )
        .select(F.col("w.start").alias("bucket"), "symbol", "vwap", "total_volume")
    )


def streaming_trade_quote_join(
    trades: DataFrame,
    quotes: DataFrame,
    lag_seconds: int = 30,
    watermark: str = "1 minute",
) -> DataFrame:
    """Stream-stream interval join: enrich each trade with the quotes
    observed for its symbol in the preceding ``lag_seconds``.

    The reference joins its real-time paths only through the database
    (Flink writes bidask_spreads, queries read it back); Spark can join
    the two live streams directly. Both sides carry watermarks and the
    join condition bounds quote time to
    [trade.time − lag, trade.time], which is exactly what Spark needs
    to know when buffered state is safe to evict — per-side state is
    O(events per watermark+lag horizon), never unbounded. Rows joining
    later than the watermark are dropped, same contract as every other
    watermarked operator here (late data is the upsert sink's job).

    ``quotes`` needs columns (qtime, symbol, bid, ask); output is one
    row per (trade, matching quote).
    """
    t = trades.withWatermark("time", watermark).select(
        "time", "symbol", "price", "volume", "trade_id"
    )
    q = quotes.withWatermark("qtime", watermark).select(
        F.col("qtime"),
        F.col("symbol").alias("qsymbol"),
        "bid",
        "ask",
    )
    return t.join(
        q,
        (F.col("symbol") == F.col("qsymbol"))
        & (F.col("qtime") <= F.col("time"))
        & (
            F.col("qtime")
            >= F.col("time") - F.expr(f"INTERVAL {int(lag_seconds)} SECONDS")
        ),
        "inner",
    ).select(
        "time",
        "symbol",
        "trade_id",
        "price",
        "qtime",
        "bid",
        "ask",
        (F.col("ask") - F.col("bid")).alias("quote_spread"),
    )
