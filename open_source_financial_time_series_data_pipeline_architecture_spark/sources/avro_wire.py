"""Avro binary wire serde + schema-registry shim (S1/S3 wire contract).

The reference produces Confluent-framed Avro to Kafka
(/root/reference/src/kafka/market_data_producer.py:44-59 with
schemas/market_data.v1.avsc:1-93): magic byte 0x00, big-endian 4-byte
schema id, then the Avro binary body. This environment has no Kafka,
Schema Registry, or the spark-avro connector jar, so the wire format is
implemented here directly from the public Avro 1.11 spec
(https://avro.apache.org/docs/1.11.1/specification/ — zig-zag varint
longs, length-prefixed strings/bytes, union index prefix, enum index,
decimal = big-endian two's-complement unscaled bytes) and the public
Confluent framing. Swapping in a real registry changes only the
id-lookup transport.

Spark integration is `decode_avro_df` — an Arrow-batched `mapInPandas`
over a binary `value` column (the exact shape `spark.readStream` yields
from a Kafka source), emitting the same decimals-as-strings row
contract the JSON producer path uses, so everything downstream
(TRADES_CTE parsing, DLQ, features) is transport-agnostic.

Scale: decode cost is per-row Python, but batched through Arrow and
trivially parallel — each Kafka partition decodes independently; no
shuffle is introduced. On a real cluster the spark-avro connector
replaces this UDF with JVM-side decode; the contract stays identical.
"""

from __future__ import annotations

import decimal
import io
import json
import struct
from typing import Any, Iterator

MAGIC = b"\x00"

# The reference's market-data contract (schemas/market_data.v1.avsc),
# restated: ms timestamps, decimal(20,8) prices as bytes, nullable
# union branches for side/bid/ask/source.
MARKET_DATA_V1: dict = {
    "type": "record",
    "name": "MarketData",
    "fields": [
        {"name": "time", "type": {"type": "long", "logicalType": "timestamp-millis"}},
        {"name": "symbol", "type": "string"},
        {
            "name": "price",
            "type": {"type": "bytes", "logicalType": "decimal", "precision": 20, "scale": 8},
        },
        {
            "name": "volume",
            "type": {"type": "bytes", "logicalType": "decimal", "precision": 20, "scale": 2},
        },
        {"name": "trade_id", "type": "string"},
        {
            "name": "side",
            "type": ["null", {"type": "enum", "name": "TradeSide", "symbols": ["buy", "sell"]}],
            "default": None,
        },
        {
            "name": "bid",
            "type": ["null", {"type": "bytes", "logicalType": "decimal", "precision": 20, "scale": 8}],
            "default": None,
        },
        {
            "name": "ask",
            "type": ["null", {"type": "bytes", "logicalType": "decimal", "precision": 20, "scale": 8}],
            "default": None,
        },
        {"name": "source", "type": ["null", "string"], "default": None},
    ],
}


# -- core binary codec (Avro spec §Binary Encoding) -------------------------


def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: io.BytesIO) -> int:
    shift = 0
    u = 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise EOFError("truncated varint")
        b = byte[0]
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1)


def _decimal_to_bytes(value, scale: int) -> bytes:
    """Unscaled two's-complement big-endian, minimal length (Avro spec
    §Logical Types / decimal)."""
    d = decimal.Decimal(str(value)).quantize(
        decimal.Decimal(1).scaleb(-scale), rounding=decimal.ROUND_HALF_UP
    )
    unscaled = int(d.scaleb(scale))
    nbytes = max(1, (unscaled.bit_length() + 8) // 8)
    return unscaled.to_bytes(nbytes, "big", signed=True)


def _bytes_to_decimal(raw: bytes, scale: int) -> decimal.Decimal:
    unscaled = int.from_bytes(raw, "big", signed=True)
    return decimal.Decimal(unscaled).scaleb(-scale)


def _is_null_union(schema) -> bool:
    return isinstance(schema, list)


def _encode_value(value: Any, schema, out: bytearray) -> None:
    if _is_null_union(schema):
        if value is None:
            idx = schema.index("null")
            out += _zigzag_encode(idx)
            return
        idx, branch = next(
            (i, s) for i, s in enumerate(schema) if s != "null"
        )
        out += _zigzag_encode(idx)
        _encode_value(value, branch, out)
        return
    if isinstance(schema, str):
        stype, logical = schema, None
    else:
        stype, logical = schema["type"], schema.get("logicalType")
    if stype == "null":
        return
    if stype in ("long", "int"):
        out += _zigzag_encode(int(value))
    elif stype == "string":
        raw = str(value).encode("utf-8")
        out += _zigzag_encode(len(raw)) + raw
    elif stype == "bytes":
        if logical == "decimal":
            raw = _decimal_to_bytes(value, schema["scale"])
        else:
            raw = bytes(value)
        out += _zigzag_encode(len(raw)) + raw
    elif stype == "enum":
        symbols = schema["symbols"]
        out += _zigzag_encode(symbols.index(value))
    elif stype == "boolean":
        out += b"\x01" if value else b"\x00"
    elif stype == "double":
        out += struct.pack("<d", float(value))
    elif stype == "float":
        out += struct.pack("<f", float(value))
    elif stype == "record":
        for f in schema["fields"]:
            _encode_value(value.get(f["name"]), f["type"], out)
    elif stype == "array":
        items = list(value)
        if items:
            out += _zigzag_encode(len(items))
            for item in items:
                _encode_value(item, schema["items"], out)
        out += _zigzag_encode(0)
    else:
        raise NotImplementedError(f"avro type {stype!r}")


def _decode_value(buf: io.BytesIO, schema) -> Any:
    if _is_null_union(schema):
        idx = _zigzag_decode(buf)
        branch = schema[idx]
        if branch == "null":
            return None
        return _decode_value(buf, branch)
    if isinstance(schema, str):
        stype, logical = schema, None
    else:
        stype, logical = schema["type"], schema.get("logicalType")
    if stype == "null":
        return None
    if stype in ("long", "int"):
        return _zigzag_decode(buf)
    if stype == "string":
        n = _zigzag_decode(buf)
        return buf.read(n).decode("utf-8")
    if stype == "bytes":
        n = _zigzag_decode(buf)
        raw = buf.read(n)
        if logical == "decimal":
            return _bytes_to_decimal(raw, schema["scale"])
        return raw
    if stype == "enum":
        return schema["symbols"][_zigzag_decode(buf)]
    if stype == "boolean":
        return buf.read(1) == b"\x01"
    if stype == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if stype == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if stype == "record":
        return {f["name"]: _decode_value(buf, f["type"]) for f in schema["fields"]}
    if stype == "array":
        out = []
        while True:
            n = _zigzag_decode(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix (spec-permitted)
                _zigzag_decode(buf)
                n = -n
            for _ in range(n):
                out.append(_decode_value(buf, schema["items"]))
    raise NotImplementedError(f"avro type {stype!r}")


def encode_record(record: dict, schema: dict = MARKET_DATA_V1) -> bytes:
    out = bytearray()
    _encode_value(record, schema, out)
    return bytes(out)


def decode_record(payload: bytes, schema: dict = MARKET_DATA_V1) -> dict:
    return _decode_value(io.BytesIO(payload), schema)


# -- Confluent wire framing + registry shim ---------------------------------


def frame(payload: bytes, schema_id: int) -> bytes:
    """magic(1) + schema_id(4, big-endian) + avro body."""
    return MAGIC + struct.pack(">I", schema_id) + payload


def unframe(message: bytes) -> tuple[int, bytes]:
    if not message[:1] == MAGIC:
        raise ValueError("bad magic byte — not Confluent-framed Avro")
    (schema_id,) = struct.unpack(">I", message[1:5])
    return schema_id, message[5:]


class SchemaRegistryShim:
    """In-memory Schema Registry with BACKWARD compatibility on
    register (the reference registry's default mode,
    src/kafka/schema_compatibility.py:185-222). Same subject→versions
    model; ids are global and stable for identical schemas."""

    def __init__(self) -> None:
        self._by_id: dict[int, dict] = {}
        self._subjects: dict[str, list[int]] = {}
        self._next_id = 1

    def register(self, subject: str, schema: dict) -> int:
        canon = json.dumps(schema, sort_keys=True)
        for sid, s in self._by_id.items():
            if json.dumps(s, sort_keys=True) == canon and sid in self._subjects.get(
                subject, []
            ):
                return sid
        prior = self.latest(subject)
        if prior is not None:
            errs = _avro_backward_errors(prior, schema)
            if errs:
                raise ValueError(f"incompatible schema for {subject}: {errs}")
        sid = self._next_id
        self._next_id += 1
        self._by_id[sid] = schema
        self._subjects.setdefault(subject, []).append(sid)
        return sid

    def get(self, schema_id: int) -> dict:
        return self._by_id[schema_id]

    def latest(self, subject: str) -> dict | None:
        ids = self._subjects.get(subject)
        return self._by_id[ids[-1]] if ids else None


def _field_type_key(t) -> str:
    """Normalized comparable type label (unions compare by branch set)."""
    if isinstance(t, list):
        return "|".join(sorted(_field_type_key(b) for b in t))
    if isinstance(t, dict):
        if t.get("logicalType") == "decimal":
            return f"decimal({t['precision']},{t['scale']})"
        return str(t["type"])
    return str(t)


def _avro_backward_errors(old: dict, new: dict) -> list[str]:
    """BACKWARD: a reader of `new` must read data written with `old` —
    added fields need defaults; shared fields must keep their type.
    (Promotion handling lives in functions/schema_compat.py for Spark
    StructTypes; Avro-side we require exact type equality, the
    conservative subset.)"""
    errors = []
    old_fields = {f["name"]: f for f in old.get("fields", [])}
    for nf in new.get("fields", []):
        of = old_fields.get(nf["name"])
        if of is None:
            if "default" not in nf:
                errors.append(f"added field {nf['name']!r} has no default")
        elif _field_type_key(of["type"]) != _field_type_key(nf["type"]):
            errors.append(
                f"field {nf['name']!r} type changed "
                f"{_field_type_key(of['type'])} -> {_field_type_key(nf['type'])}"
            )
    return errors


# -- file-transport producer (Avro flavor of FileTradeProducer) -------------


class AvroFileTradeProducer:
    """Same contract/DLQ behavior as `FileTradeProducer`, but the wire
    body is Confluent-framed Avro binary. File transport needs record
    boundaries (Kafka frames per-message): 4-byte big-endian length
    prefix per message, the simplest self-delimiting container."""

    REQUIRED = ("time", "symbol", "price", "volume", "trade_id")

    def __init__(self, topic_dir: str, registry: SchemaRegistryShim | None = None):
        import os

        self.topic_dir = topic_dir
        self.dlq_dir = topic_dir.rstrip("/") + "-dlq"
        os.makedirs(self.topic_dir, exist_ok=True)
        os.makedirs(self.dlq_dir, exist_ok=True)
        self.registry = registry or SchemaRegistryShim()
        self.schema_id = self.registry.register("market_data-value", MARKET_DATA_V1)
        self._buf: list[bytes] = []
        self._dlq_buf: list[str] = []
        self._file_no = 0
        self.produced = 0
        self.rejected = 0

    def produce_trade(
        self,
        symbol: str,
        price,
        volume,
        trade_id: str,
        time_ms: int,
        side: str | None = None,
        bid=None,
        ask=None,
        source: str | None = None,
    ) -> bool:
        record = {
            "time": time_ms,
            "symbol": symbol,
            "price": price,
            "volume": volume,
            "trade_id": trade_id,
            "side": side,
            "bid": bid,
            "ask": ask,
            "source": source,
        }
        if any(record[k] in (None, "") for k in self.REQUIRED) or (
            side is not None and side not in ("buy", "sell")
        ):
            # DLQ keeps the *readable* form — a poison message may not
            # even be encodable, which is exactly why it's poison
            self._dlq_buf.append(json.dumps({**record, "price": str(price), "volume": str(volume)}))
            self.rejected += 1
            return False
        body = encode_record(record)
        self._buf.append(frame(body, self.schema_id))
        self.produced += 1
        return True

    def flush(self) -> None:
        import os

        if self._buf:
            path = os.path.join(self.topic_dir, f"part-{self._file_no:05d}.avrobin")
            with open(path, "wb") as f:
                for msg in self._buf:
                    f.write(struct.pack(">I", len(msg)) + msg)
            self._buf = []
        if self._dlq_buf:
            path = os.path.join(self.dlq_dir, f"dlq-{self._file_no:05d}.jsonl")
            with open(path, "w") as f:
                f.write("\n".join(self._dlq_buf) + "\n")
            self._dlq_buf = []
        self._file_no += 1


# -- Spark-side decode ------------------------------------------------------

DECODED_SCHEMA = (
    "time long, symbol string, price string, volume string, trade_id string, "
    "side string, bid string, ask string, source string"
)


def decode_avro_df(df, registry: SchemaRegistryShim, value_col: str = "value"):
    """Decode a binary `value` column of Confluent-framed Avro messages
    into typed rows (decimals as strings — the producer contract).
    Arrow-batched `mapInPandas`; per-message schema-id lookup supports
    mixed schema versions in one topic, exactly like a real consumer.
    """
    import pandas as pd  # noqa: F401  (type hints resolve at def-time)

    by_id = dict(registry._by_id)

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for raw in pdf[value_col]:
                sid, body = unframe(bytes(raw))
                rec = decode_record(body, by_id[sid])
                rows.append(
                    {
                        k: (str(v) if isinstance(v, decimal.Decimal) else v)
                        for k, v in rec.items()
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "time", "symbol", "price", "volume", "trade_id",
                    "side", "bid", "ask", "source",
                ],
            )

    return df.mapInPandas(_decode, DECODED_SCHEMA)


def read_avro_topic_df(spark, topic_dir: str, registry: SchemaRegistryShim):
    """Batch-read a file 'topic' of length-prefixed framed messages into
    one binary message per row, then decode. Uses binaryFile format (a
    whole file per row — fine for micro-batch-sized files) and a
    mapInPandas splitter, so file parsing stays on executors."""
    import pandas as pd  # noqa: F401

    files = spark.read.format("binaryFile").load(topic_dir + "/*.avrobin")

    def _split(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            msgs = []
            for content in pdf["content"]:
                buf = bytes(content)
                off = 0
                while off < len(buf):
                    (n,) = struct.unpack(">I", buf[off : off + 4])
                    msgs.append(buf[off + 4 : off + 4 + n])
                    off += 4 + n
            yield pd.DataFrame({"value": msgs})

    messages = files.select("content").mapInPandas(_split, "value binary")
    return decode_avro_df(messages, registry)
