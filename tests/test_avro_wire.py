"""Avro binary wire contract (S1/S3): codec golden bytes, roundtrip,
registry compat gate, framed file transport end-to-end through Spark.

Reference behavior: src/kafka/market_data_producer.py:44-59 (Confluent
framing + decimal logical types), src/kafka/schema_compatibility.py
(BACKWARD gate on register).
"""

from __future__ import annotations

import decimal

import pytest

from open_source_financial_time_series_data_pipeline_architecture_spark.sources import avro_wire as aw


def _trade(i=0, **over):
    rec = {
        "time": 1700000000000 + i,
        "symbol": "AAPL",
        "price": "187.12345678",
        "volume": "100.50",
        "trade_id": f"t-{i}",
        "side": "buy",
        "bid": "187.12000000",
        "ask": "187.13000000",
        "source": "sim",
    }
    rec.update(over)
    return rec


def test_zigzag_golden():
    # spec examples: 0→00, -1→01, 1→02, -2→03, 2→04
    assert aw._zigzag_encode(0) == b"\x00"
    assert aw._zigzag_encode(-1) == b"\x01"
    assert aw._zigzag_encode(1) == b"\x02"
    assert aw._zigzag_encode(-2) == b"\x03"
    assert aw._zigzag_encode(64) == b"\x80\x01"
    import io

    for n in (0, -1, 1, 63, -64, 64, 2**40, -(2**40), 2**62):
        assert aw._zigzag_decode(io.BytesIO(aw._zigzag_encode(n))) == n


def test_decimal_bytes_golden():
    # 1.50 at scale 2 = unscaled 150 = 0x00 0x96 (needs sign byte)
    assert aw._decimal_to_bytes("1.50", 2) == b"\x00\x96"
    assert aw._bytes_to_decimal(b"\x00\x96", 2) == decimal.Decimal("1.50")
    # negative two's complement
    assert aw._decimal_to_bytes("-1.50", 2) == b"\xff\x6a"
    assert aw._bytes_to_decimal(b"\xff\x6a", 2) == decimal.Decimal("-1.50")


def test_record_roundtrip_all_fields():
    rec = _trade()
    out = aw.decode_record(aw.encode_record(rec))
    assert out["time"] == rec["time"]
    assert out["symbol"] == "AAPL"
    assert out["price"] == decimal.Decimal("187.12345678")
    assert out["volume"] == decimal.Decimal("100.50")
    assert out["side"] == "buy"
    assert out["source"] == "sim"


def test_record_roundtrip_null_unions():
    rec = _trade(side=None, bid=None, ask=None, source=None)
    out = aw.decode_record(aw.encode_record(rec))
    assert out["side"] is None and out["bid"] is None
    assert out["ask"] is None and out["source"] is None


def test_framing():
    body = aw.encode_record(_trade())
    msg = aw.frame(body, 7)
    assert msg[0] == 0 and len(msg) == len(body) + 5
    sid, out = aw.unframe(msg)
    assert sid == 7 and out == body
    with pytest.raises(ValueError):
        aw.unframe(b"\x01junk")


def test_registry_backward_gate():
    reg = aw.SchemaRegistryShim()
    sid = reg.register("market_data-value", aw.MARKET_DATA_V1)
    assert reg.register("market_data-value", aw.MARKET_DATA_V1) == sid  # idempotent
    # compatible evolution: add a defaulted nullable field
    v2 = {
        **aw.MARKET_DATA_V1,
        "fields": aw.MARKET_DATA_V1["fields"]
        + [{"name": "venue", "type": ["null", "string"], "default": None}],
    }
    sid2 = reg.register("market_data-value", v2)
    assert sid2 != sid and reg.latest("market_data-value") == v2
    # incompatible: new required field without default
    bad = {
        **aw.MARKET_DATA_V1,
        "fields": aw.MARKET_DATA_V1["fields"] + [{"name": "must", "type": "string"}],
    }
    with pytest.raises(ValueError, match="incompatible"):
        reg.register("market_data-value", bad)
    # incompatible: type change on a shared field
    mutated = {
        **aw.MARKET_DATA_V1,
        "fields": [
            {**f, "type": "string"} if f["name"] == "time" else f
            for f in aw.MARKET_DATA_V1["fields"]
        ],
    }
    with pytest.raises(ValueError, match="type changed"):
        reg.register("market_data-value", mutated)


def test_producer_to_spark_end_to_end(spark, tmp_path):
    topic = str(tmp_path / "avro-topic")
    prod = aw.AvroFileTradeProducer(topic)
    for i in range(25):
        prod.produce_trade(
            symbol="MSFT" if i % 2 else "AAPL",
            price=f"{100 + i}.25",
            volume="10.00",
            trade_id=f"t-{i}",
            time_ms=1700000000000 + i * 1000,
            side="buy" if i % 3 else "sell",
            bid=f"{100 + i}.20",
            ask=f"{100 + i}.30",
            source="sim",
        )
    # contract violations go to DLQ, not the topic
    prod.produce_trade("AAPL", None, "1.00", "bad-1", 1700000000000)
    prod.produce_trade("AAPL", "1.00", "1.00", "bad-2", 1700000000000, side="hold")
    prod.flush()
    assert prod.produced == 25 and prod.rejected == 2

    df = aw.read_avro_topic_df(spark, topic, prod.registry)
    rows = {r["trade_id"]: r for r in df.collect()}
    assert len(rows) == 25 and "bad-1" not in rows
    r0 = rows["t-0"]
    assert r0["symbol"] == "AAPL" and r0["price"] == "100.25000000"
    assert r0["volume"] == "10.00" and r0["side"] == "sell"
    assert r0["time"] == 1700000000000
    dlq = spark.read.json(topic + "-dlq")
    assert dlq.count() == 2


def test_mixed_schema_versions_in_one_topic(spark, tmp_path):
    """A topic can carry v1 and v2 messages simultaneously — per-message
    schema-id dispatch must decode both (the entire point of the wire
    framing)."""
    topic = str(tmp_path / "avro-mixed")
    prod = aw.AvroFileTradeProducer(topic)
    prod.produce_trade("AAPL", "1.00", "2.00", "t-v1", 1700000000000)
    v2 = {
        **aw.MARKET_DATA_V1,
        "fields": aw.MARKET_DATA_V1["fields"]
        + [{"name": "venue", "type": ["null", "string"], "default": None}],
    }
    sid2 = prod.registry.register("market_data-value", v2)
    body = aw.encode_record({**_trade(1), "venue": "XNAS"}, v2)
    prod._buf.append(aw.frame(body, sid2))
    prod.flush()
    out = aw.read_avro_topic_df(spark, topic, prod.registry).collect()
    # v2's extra field is dropped by the v1-shaped projection; both rows decode
    assert {r["trade_id"] for r in out} == {"t-v1", "t-1"}
