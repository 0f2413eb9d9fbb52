"""Streaming-path tests, mirroring the reference's chaos/exactly-once
strategy (SURVEY §5: tests/test_chaos_flink_exactly_once.py:44-226) and
the CEP semantics (anomaly_detection.py:40-149).

- file-source JSON ingest with DLQ split;
- exactly-once: replayed micro-batches produce zero duplicates through
  the idempotent upsert sink (1000-trade chaos batch, duplicate ids);
- stateful CEP: ≥3 large trades within 5 minutes → anomaly, buffer
  pruned correctly across micro-batches;
- watermarked streaming OHLC matches the batch computation for
  finalized windows.
"""

from __future__ import annotations

import datetime as dt
import json
import time as _time

import pytest
from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark import streaming as STR
from open_source_financial_time_series_data_pipeline_architecture_spark.sources.sinks import (
    upsert_parquet,
)
from open_source_financial_time_series_data_pipeline_architecture_spark.streaming.cep import (
    large_trade_cep,
)

BASE = dt.datetime(2024, 3, 1, 10, 0, 0)


def _trade(i: int, symbol: str = "AAPL", volume: float = 100.0, minute: float = 0.0):
    t = BASE + dt.timedelta(minutes=minute)
    return {
        "time": int(t.timestamp() * 1000),
        "symbol": symbol,
        "price": f"{150 + (i % 10) * 0.1:.2f}",
        "volume": f"{volume:.2f}",
        "trade_id": f"CHAOS-{i:04d}",
        "side": "buy" if i % 2 == 0 else "sell",
        "bid": None,
        "ask": None,
        "source": "chaos",
    }


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write((r if isinstance(r, str) else json.dumps(r)) + "\n")


def _run_stream_to_upsert(spark, src_dir, out_dir, ckpt_dir):
    good, _ = STR.read_trade_stream_json(spark, str(src_dir))
    from open_source_financial_time_series_data_pipeline_architecture_spark.sources.sinks import (
        foreach_batch_upsert,
    )

    q = (
        good.writeStream.foreachBatch(foreach_batch_upsert(str(out_dir)))
        .option("checkpointLocation", str(ckpt_dir))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_ingest_dlq_and_exactly_once(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"

    rows = [_trade(i, minute=i * 0.05) for i in range(1000)]
    # chaos slices: malformed JSON, missing required field, duplicates
    bad = ["{not json", json.dumps({"symbol": "AAPL"})]
    dupes = [rows[0], rows[1], rows[2]]
    _write_jsonl(src / "part1.jsonl", rows[:500] + bad)
    _write_jsonl(src / "part2.jsonl", rows[500:] + dupes)

    _run_stream_to_upsert(spark, src, out, ckpt)

    result = spark.read.parquet(str(out))
    assert result.count() == 1000  # dupes + malformed never land
    assert result.select("trade_id").distinct().count() == 1000

    # kill/restart replay: run the whole stream again with a FRESH
    # checkpoint (worst case: every batch replayed from offset 0)
    _run_stream_to_upsert(spark, src, out, tmp_path / "ckpt2")
    result2 = spark.read.parquet(str(out))
    assert result2.count() == 1000
    assert (
        result2.groupBy("trade_id").count().filter(F.col("count") > 1).count() == 0
    )

    # DLQ branch catches exactly the malformed rows
    good, dlq = STR.read_trade_stream_json(spark, str(src))
    dq = (
        dlq.writeStream.format("memory")
        .queryName("dlq_probe")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    dq.awaitTermination(60)
    assert spark.sql("SELECT count(*) c FROM dlq_probe").collect()[0]["c"] == 2


def test_upsert_parquet_idempotent_direct(spark, tmp_path):
    out = tmp_path / "direct"
    df = spark.createDataFrame(
        [(BASE, "AAPL", "T-1", 1.0), (BASE, "AAPL", "T-2", 2.0)],
        "time timestamp, symbol string, trade_id string, price double",
    )
    assert upsert_parquet(spark, df, str(out)) == 2
    # replay identical batch → 0 new rows; conflicting price doesn't land
    df2 = spark.createDataFrame(
        [(BASE, "AAPL", "T-1", 99.0), (BASE, "AAPL", "T-3", 3.0)],
        "time timestamp, symbol string, trade_id string, price double",
    )
    assert upsert_parquet(spark, df2, str(out)) == 1
    got = spark.read.parquet(str(out))
    assert got.count() == 3
    assert got.filter("trade_id = 'T-1'").collect()[0]["price"] == 1.0  # first write wins


def test_large_trade_cep(spark, tmp_path):
    src = tmp_path / "cep_src"
    src.mkdir()
    # symbol AAPL: large trades at t=0,2,4 min (3 within 5 min → fire),
    # then one at t=20 (buffer pruned → no fire). MSFT: only 2 large.
    events = (
        [_trade(i, minute=float(i)) for i in range(10)]  # small, ignored
        + [_trade(100, volume=5000, minute=0.0)]
        + [_trade(101, volume=6000, minute=2.0)]
        + [_trade(102, volume=7000, minute=4.0)]
        + [_trade(103, volume=8000, minute=20.0)]
        + [_trade(200, symbol="MSFT", volume=5000, minute=1.0)]
        + [_trade(201, symbol="MSFT", volume=5000, minute=2.0)]
    )
    _write_jsonl(src / "a.jsonl", events)
    good, _ = STR.read_trade_stream_json(spark, str(src))
    anomalies = large_trade_cep(good, threshold=1000.0, window_sec=300.0, min_count=3)
    q = (
        anomalies.writeStream.format("memory")
        .queryName("cep_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM cep_out").collect()
    assert len(got) == 1
    row = got[0]
    assert row["symbol"] == "AAPL" and row["n_large_trades"] == 3
    assert sorted(row["trade_ids"]) == ["CHAOS-0100", "CHAOS-0101", "CHAOS-0102"]


def test_cep_state_survives_across_batches(spark, tmp_path):
    src = tmp_path / "cep2_src"
    src.mkdir()
    ckpt = tmp_path / "cep2_ckpt"
    # batch 1: two large trades; batch 2 (separate file → maxFilesPerTrigger=1
    # forces separate micro-batches): the third → must fire using state.
    _write_jsonl(
        src / "b1.jsonl",
        [_trade(300, volume=5000, minute=0.0), _trade(301, volume=5000, minute=1.0)],
    )
    _write_jsonl(src / "b2.jsonl", [_trade(302, volume=5000, minute=2.0)])
    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 1)
        .load(str(src))
    )
    good, _ = STR.parse_trades_with_dlq(raw)
    anomalies = large_trade_cep(good, threshold=1000.0, window_sec=300.0, min_count=3)
    q = (
        anomalies.writeStream.format("memory")
        .queryName("cep_state_out")
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM cep_state_out").collect()
    assert len(got) == 1 and got[0]["n_large_trades"] == 3


def test_streaming_ohlc_matches_batch(spark, tmp_path):
    src = tmp_path / "ohlc_src"
    src.mkdir()
    rows = [_trade(i, minute=i * 0.2) for i in range(100)]
    # sentinel far in the future advances the watermark → all real
    # windows finalize and emit in append mode
    sentinel = _trade(9999, minute=600.0)
    _write_jsonl(src / "a.jsonl", rows)
    _write_jsonl(src / "z.jsonl", [sentinel])

    raw = (
        spark.readStream.format("text").option("maxFilesPerTrigger", 1).load(str(src))
    )
    good, _ = STR.parse_trades_with_dlq(raw)
    q = (
        STR.streaming_ohlc(good, "1 minute", "1 minute")
        .writeStream.format("memory")
        .queryName("sohlc")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["bucket"], r["symbol"]): (r["open"], r["high"], r["low"], r["close"], r["volume"], r["trade_count"])
        for r in spark.sql("SELECT * FROM sohlc").collect()
    }
    assert streamed, "no finalized windows emitted"

    from open_source_financial_time_series_data_pipeline_architecture_spark.functions import ohlc

    batch_good, _ = STR.parse_trades_with_dlq(
        spark.read.format("text").load(str(src))
    )
    batch = {
        (r["bucket"], r["symbol"]): (r["open"], r["high"], r["low"], r["close"], r["volume"], r["trade_count"])
        for r in ohlc(batch_good, 60).collect()
    }
    for k, v in streamed.items():
        assert batch[k] == v, k


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Duplicate trade_ids inside the watermark window are dropped with
    bounded state (dropDuplicatesWithinWatermark), matching the
    reference's PK-anchored exactly-once semantics."""
    src = tmp_path / "dedup_src"
    src.mkdir()
    rows = [_trade(i, minute=i * 0.1) for i in range(50)]
    dups = [dict(r) for r in rows[:20]]  # exact replays of 20 events
    sentinel = _trade(9999, minute=600.0)
    _write_jsonl(src / "a.jsonl", rows)
    _write_jsonl(src / "b.jsonl", dups)
    _write_jsonl(src / "z.jsonl", [sentinel])

    raw = (
        spark.readStream.format("text").option("maxFilesPerTrigger", 1).load(str(src))
    )
    good, _ = STR.parse_trades_with_dlq(raw)
    q = (
        STR.streaming_dedup(good, watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("sdedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT trade_id FROM sdedup").collect()
    ids = [r["trade_id"] for r in got]
    assert len(ids) == len(set(ids)), "duplicates survived the stream"
    assert set(ids) == {f"CHAOS-{i:04d}" for i in range(50)} | {"CHAOS-9999"}


def test_streaming_session_window(spark, tmp_path):
    """Native session_window merges events within the gap into one
    session per user and finalizes it once the watermark passes."""
    import datetime as dtm

    src = tmp_path / "sess_src"
    src.mkdir()
    base = dtm.datetime(2024, 3, 1, 10, 0, 0)

    def ev(uid, minute, value):
        return json.dumps(
            {
                "ts": (base + dtm.timedelta(minutes=minute)).isoformat(sep=" "),
                "user_id": uid,
                "value": value,
            }
        )

    # user 1: two sessions (gap > 5 min between minute 2 and minute 30);
    # user 2: one session
    _write_jsonl(
        src / "a.jsonl",
        [ev(1, 0, 1.0), ev(1, 2, 2.0), ev(1, 30, 4.0), ev(2, 0, 8.0)],
    )
    _write_jsonl(src / "z.jsonl", [ev(99, 600, 0.0)])  # watermark sentinel

    schema = "ts timestamp, user_id bigint, value double"
    raw = (
        spark.readStream.format("text").option("maxFilesPerTrigger", 1).load(str(src))
    )
    events = raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("j")
    ).select("j.*")
    q = (
        STR.streaming_sessions(events, gap="5 minutes", watermark="1 minute")
        .writeStream.format("memory")
        .queryName("ssess")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM ssess WHERE user_id < 99").collect()
    }
    assert got == {
        (1, base): (2, 3.0),
        (1, base + dtm.timedelta(minutes=30)): (1, 4.0),
        (2, base): (1, 8.0),
    }


def test_streaming_imbalance_matches_batch(spark, tmp_path):
    src = tmp_path / "imb_src"
    src.mkdir()
    rows = [_trade(i, minute=i * 0.3) for i in range(80)]
    sentinel = _trade(9999, minute=600.0)
    _write_jsonl(src / "a.jsonl", rows)
    _write_jsonl(src / "z.jsonl", [sentinel])

    raw = (
        spark.readStream.format("text").option("maxFilesPerTrigger", 1).load(str(src))
    )
    good, _ = STR.parse_trades_with_dlq(raw)
    q = (
        STR.streaming_imbalance(good, "5 minutes", "1 minute")
        .writeStream.format("memory")
        .queryName("simb")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["bucket"], r["symbol"]): (
            r["buy_volume"],
            r["sell_volume"],
            round(r["trade_imbalance"], 9),
        )
        for r in spark.sql("SELECT * FROM simb").collect()
    }
    assert streamed

    from open_source_financial_time_series_data_pipeline_architecture_spark.functions import (
        trade_imbalance,
    )

    batch_good, _ = STR.parse_trades_with_dlq(spark.read.format("text").load(str(src)))
    batch = {
        (r["bucket"], r["symbol"]): (
            r["buy_volume"],
            r["sell_volume"],
            round(r["trade_imbalance"], 9),
        )
        for r in trade_imbalance(batch_good, 300).collect()
    }
    for key, v in streamed.items():
        assert batch[key] == v, key


def test_streaming_quantile_flags(spark, tmp_path):
    """Per-symbol p95 threshold maintained in GroupState: after the
    stream drains (n < sample_size), the last batch's estimate equals
    the exact batch percentile, and state (n_seen) accumulates across
    micro-batches."""
    src = tmp_path / "q_src"
    src.mkdir()
    rows = [_trade(i, volume=100.0 + i, minute=i * 0.1) for i in range(100)]
    _write_jsonl(src / "a.jsonl", rows[:50])
    _write_jsonl(src / "b.jsonl", rows[50:])

    raw = (
        spark.readStream.format("text").option("maxFilesPerTrigger", 1).load(str(src))
    )
    good, _ = STR.parse_trades_with_dlq(raw)
    from open_source_financial_time_series_data_pipeline_architecture_spark.streaming.quantile import (
        streaming_quantile_flags,
    )

    q = (
        streaming_quantile_flags(good, q=0.95, sample_size=1024)
        .writeStream.format("memory")
        .queryName("sq")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM sq").collect()
    assert len(out) == 100
    assert max(r["n_seen"] for r in out) == 100  # state accumulated

    import numpy as np

    exact_p95 = float(np.percentile([100.0 + i for i in range(100)], 95))
    final_est = {r["p95_estimate"] for r in out if r["n_seen"] == 100}
    assert final_est == {exact_p95}
    # flags in the final batch agree with the exact threshold
    for r in out:
        if r["n_seen"] == 100:
            assert r["large_trade_flag"] == (r["volume"] > exact_p95)


def test_stream_stream_trade_quote_join(spark, tmp_path):
    """Stream-stream interval join == the equivalent batch join for
    data fully inside the watermark horizon."""
    import pyspark.sql.types as T

    tsrc = tmp_path / "tsrc"
    qsrc = tmp_path / "qsrc"
    tsrc.mkdir()
    qsrc.mkdir()

    trades = [_trade(i, minute=i * 0.2) for i in range(30)]
    quotes = []
    for i in range(30):
        t = BASE + dt.timedelta(minutes=i * 0.2, seconds=-5)
        quotes.append(
            {
                "qtime": int(t.timestamp() * 1000),
                "symbol": "AAPL",
                "bid": 149.9 + (i % 5) * 0.01,
                "ask": 150.1 + (i % 5) * 0.01,
            }
        )
    # sentinel rows far in the future so the watermark passes everything
    trades.append(_trade(999, minute=600))
    quotes.append(
        {
            "qtime": int((BASE + dt.timedelta(minutes=600)).timestamp() * 1000),
            "symbol": "ZZZ",
            "bid": 1.0,
            "ask": 2.0,
        }
    )
    _write_jsonl(tsrc / "t.jsonl", trades)
    _write_jsonl(qsrc / "q.jsonl", quotes)

    qschema = T.StructType(
        [
            T.StructField("qtime", T.LongType()),
            T.StructField("symbol", T.StringType()),
            T.StructField("bid", T.DoubleType()),
            T.StructField("ask", T.DoubleType()),
        ]
    )

    tgood, _ = STR.read_trade_stream_json(spark, str(tsrc))
    qraw = (
        spark.readStream.schema(qschema)
        .json(str(qsrc))
        .withColumn("qtime", F.timestamp_millis(F.col("qtime")))
    )
    joined = STR.streaming_trade_quote_join(tgood, qraw, lag_seconds=30)
    query = (
        joined.writeStream.format("memory")
        .queryName("ssjoin")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    query.awaitTermination(120)
    got = {
        (r["trade_id"], r["qtime"])
        for r in spark.sql("SELECT * FROM ssjoin").collect()
    }

    # batch recomputation of the same join
    tb = spark.createDataFrame(
        [(r["time"], r["symbol"], float(r["price"]), r["trade_id"]) for r in trades],
        "time long, symbol string, price double, trade_id string",
    ).withColumn("time", F.timestamp_millis("time"))
    qb = spark.createDataFrame(
        [(r["qtime"], r["symbol"], r["bid"], r["ask"]) for r in quotes], qschema
    ).withColumn("qtime", F.timestamp_millis("qtime"))
    exp = {
        (r["trade_id"], r["qtime"])
        for r in tb.join(
            qb,
            (tb.symbol == qb.symbol)
            & (qb.qtime <= tb.time)
            & (qb.qtime >= tb.time - F.expr("INTERVAL 30 SECONDS")),
        ).collect()
    }
    assert got == exp and got


def test_streaming_volatility_matches_batch(spark, tmp_path):
    """Stateful hourly volatility == the batch operator for finalized
    hours, INCLUDING the cross-hour carry (first return of an hour uses
    the prior hour's last price) — with the input split across two
    micro-batch files so the carry also crosses a batch boundary."""
    from open_source_financial_time_series_data_pipeline_architecture_spark import functions as FX
    from open_source_financial_time_series_data_pipeline_architecture_spark.schema import (
        TRADES_SCHEMA,
    )
    from open_source_financial_time_series_data_pipeline_architecture_spark.streaming.cep import (
        streaming_volatility,
    )

    src = tmp_path / "volsrc"
    src.mkdir()
    # 3 hours of trades, 30 per hour, 2 symbols; final sentinel hour
    # forces hour-3 finalization
    rows = []
    for sym_i, sym in enumerate(["AAPL", "MSFT"]):
        for h in range(3):
            for i in range(30):
                t = BASE + dt.timedelta(hours=h, minutes=i * 2)
                rows.append(
                    {
                        "time": int(t.timestamp() * 1000),
                        "symbol": sym,
                        "price": f"{100 + sym_i * 50 + ((h * 31 + i * 7) % 13) - 6}.50",
                        "volume": "10.00",
                        "trade_id": f"V-{sym}-{h:02d}-{i:04d}",
                        "side": None, "bid": None, "ask": None, "source": "t",
                    }
                )
        rows.append(
            {
                "time": int((BASE + dt.timedelta(hours=10)).timestamp() * 1000),
                "symbol": sym,
                "price": "100.00", "volume": "1.00",
                "trade_id": f"V-{sym}-SENTINEL",
                "side": None, "bid": None, "ask": None, "source": "t",
            }
        )
    # split mid-hour so both the hour carry and batch carry are exercised;
    # pin file mtimes so the source's batch order is deterministic
    import os as _os
    import time as _t

    rows.sort(key=lambda r: r["time"])
    _write_jsonl(src / "a.jsonl", rows[: len(rows) // 2])
    _write_jsonl(src / "b.jsonl", rows[len(rows) // 2 :])
    now = _t.time()
    _os.utime(src / "a.jsonl", (now - 60, now - 60))
    _os.utime(src / "b.jsonl", (now, now))

    # one file per micro-batch so the carry genuinely crosses batches
    good, _ = STR.read_trade_stream_json(spark, str(src), max_files_per_trigger=1)
    q = (
        streaming_volatility(good, bucket_seconds=3600)
        .writeStream.format("memory")
        .queryName("svol")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["symbol"], r["bucket"]): (r["volatility"], r["sample_count"])
        for r in spark.sql("SELECT * FROM svol").collect()
    }

    batch_df = spark.createDataFrame(
        [
            (
                dt.datetime.fromtimestamp(r["time"] / 1000),
                r["symbol"],
                float(r["price"]),
                float(r["volume"]),
                r["trade_id"],
                None, None, None, "t",
            )
            for r in rows
        ],
        TRADES_SCHEMA,
    )
    exp = {
        (r["symbol"], r["bucket"]): (r["volatility"], r["sample_count"])
        for r in FX.volatility(batch_df, 3600).collect()
    }
    # streaming emits only FINALIZED hours (all 3 + sentinel-open);
    # every emitted hour must match batch exactly
    assert len(got) == 6  # 2 symbols x 3 finalized hours
    for k, (vol, n) in got.items():
        evol, en = exp[k]
        assert n == en, k
        assert (vol is None and evol is None) or abs(vol - evol) < 1e-9, (k, vol, evol)


def test_streaming_row_features_match_batch(spark, tmp_path):
    """Streaming SMA-20 / EWM-12 / regime == the batch operators row by
    row, with the input split across micro-batches mid-window so the
    trailing buffer and the recurrence both carry state across batches."""
    from open_source_financial_time_series_data_pipeline_architecture_spark import functions as FX
    from open_source_financial_time_series_data_pipeline_architecture_spark.schema import (
        TRADES_SCHEMA,
    )
    from open_source_financial_time_series_data_pipeline_architecture_spark.streaming.cep import (
        streaming_row_features,
    )

    src = tmp_path / "rf_src"
    src.mkdir()
    rows = []
    for sym_i, sym in enumerate(["AAPL", "MSFT"]):
        for i in range(60):
            t = BASE + dt.timedelta(minutes=i)
            rows.append(
                {
                    "time": int(t.timestamp() * 1000),
                    "symbol": sym,
                    "price": f"{100 + sym_i * 50 + ((i * 17) % 23) - 11}.25",
                    "volume": "10.00",
                    "trade_id": f"RF-{sym}-{i:04d}",
                    "side": None, "bid": None, "ask": None, "source": "t",
                }
            )
    rows.sort(key=lambda r: r["time"])
    # split at an awkward point: mid-SMA-window for both symbols.
    # FileStreamSource orders batches by modification time — make it
    # explicit (same contract as Kafka's per-key ordering guarantee).
    import os as _os
    import time as _t

    _write_jsonl(src / "a.jsonl", rows[:47])
    _write_jsonl(src / "b.jsonl", rows[47:])
    now = _t.time()
    _os.utime(src / "a.jsonl", (now - 60, now - 60))
    _os.utime(src / "b.jsonl", (now, now))

    raw = (
        spark.readStream.format("text").option("maxFilesPerTrigger", 1).load(str(src))
    )
    good, _ = STR.parse_trades_with_dlq(raw)
    q = (
        streaming_row_features(good)
        .writeStream.format("memory")
        .queryName("srowfeat")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "rf_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["trade_id"]: (r["sma_20"], r["ewm_12"], r["regime_tag"])
        for r in spark.sql("SELECT * FROM srowfeat").collect()
    }

    batch_df = spark.createDataFrame(
        [
            (
                dt.datetime.fromtimestamp(r["time"] / 1000),
                r["symbol"],
                float(r["price"]),
                float(r["volume"]),
                r["trade_id"],
                None, None, None, "t",
            )
            for r in rows
        ],
        TRADES_SCHEMA,
    )
    sma_b = {r["trade_id"]: r["sma_20"] for r in FX.sma(batch_df, 20).collect()}
    ewm_b = {r["trade_id"]: r["ewm_12"] for r in FX.ewm(batch_df, 12).collect()}
    reg_b = {r["trade_id"]: r["regime_tag"] for r in FX.regime_tags(batch_df, 20).collect()}

    assert len(got) == len(rows)
    for tid, (sma_s, ewm_s, reg_s) in got.items():
        assert abs(sma_s - sma_b[tid]) < 1e-9, tid
        assert abs(ewm_s - ewm_b[tid]) < 1e-12, tid
        assert reg_s == reg_b[tid], tid


def test_gap_monitor_state_crosses_batches(spark, tmp_path):
    """A feed gap spanning two micro-batches must be detected exactly
    once, using the last-seen state carried from the first batch."""
    import os as _os
    import time as _time

    from open_source_financial_time_series_data_pipeline_architecture_spark.streaming.cep import (
        gap_monitor,
    )

    src = tmp_path / "gap_src"
    src.mkdir()
    ckpt = tmp_path / "gap_ckpt"
    _write_jsonl(
        src / "b1.jsonl",
        [_trade(400, minute=0.0), _trade(401, minute=1.0)],
    )
    # 40 minutes later — the gap crosses the micro-batch boundary
    _write_jsonl(src / "b2.jsonl", [_trade(402, minute=41.0)])
    now = _time.time()
    _os.utime(src / "b1.jsonl", (now - 60, now - 60))
    _os.utime(src / "b2.jsonl", (now, now))
    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 1)
        .load(str(src))
    )
    good, _ = STR.parse_trades_with_dlq(raw)
    alerts = gap_monitor(good, threshold_sec=1800.0)
    q = (
        alerts.writeStream.format("memory")
        .queryName("gap_out")
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM gap_out").collect()
    assert len(got) == 1
    assert abs(got[0]["gap_seconds"] - 2400.0) < 1e-6


def test_streaming_kalman_matches_batch(spark, tmp_path):
    """Streaming Kalman == batch kalman_local_level row by row, with
    the input split across micro-batches so (level, variance) state
    carries over the boundary mid-recurrence."""
    from open_source_financial_time_series_data_pipeline_architecture_spark.operators.statespace import (
        kalman_local_level,
    )
    from open_source_financial_time_series_data_pipeline_architecture_spark.schema import (
        TRADES_SCHEMA,
    )
    from open_source_financial_time_series_data_pipeline_architecture_spark.streaming.cep import (
        streaming_kalman,
    )

    src = tmp_path / "kf_src"
    src.mkdir()
    rows = []
    for sym_i, sym in enumerate(["AAPL", "MSFT"]):
        for i in range(50):
            t = BASE + dt.timedelta(minutes=i)
            rows.append(
                {
                    "time": int(t.timestamp() * 1000),
                    "symbol": sym,
                    "price": f"{100 + sym_i * 50 + ((i * 13) % 19) - 9}.50",
                    "volume": "10.00",
                    "trade_id": f"KF-{sym}-{i:04d}",
                    "side": None, "bid": None, "ask": None, "source": "t",
                }
            )
    rows.sort(key=lambda r: r["time"])
    import os as _os
    import time as _t

    _write_jsonl(src / "a.jsonl", rows[:37])
    _write_jsonl(src / "b.jsonl", rows[37:])
    now = _t.time()
    _os.utime(src / "a.jsonl", (now - 60, now - 60))
    _os.utime(src / "b.jsonl", (now, now))

    raw = (
        spark.readStream.format("text").option("maxFilesPerTrigger", 1).load(str(src))
    )
    good, _ = STR.parse_trades_with_dlq(raw)
    q = (
        streaming_kalman(good)
        .writeStream.format("memory")
        .queryName("skalman")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "kf_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["trade_id"]: (r["kf_level"], r["kf_var"], r["kf_gain"])
        for r in spark.sql("SELECT * FROM skalman").collect()
    }

    batch_df = spark.createDataFrame(
        [
            (
                dt.datetime.fromtimestamp(r["time"] / 1000),
                r["symbol"],
                float(r["price"]),
                float(r["volume"]),
                r["trade_id"],
                None, None, None, "t",
            )
            for r in rows
        ],
        TRADES_SCHEMA,
    )
    exp = {
        r["trade_id"]: (r["kf_level"], r["kf_var"], r["kf_gain"])
        for r in kalman_local_level(batch_df).collect()
    }
    assert len(got) == len(rows)
    for tid, (lv, var, gain) in got.items():
        elv, evar, egain = exp[tid]
        assert lv == elv, tid          # identical double arithmetic
        assert var == evar, tid
        assert gain == egain or (gain is None and egain is None), tid
