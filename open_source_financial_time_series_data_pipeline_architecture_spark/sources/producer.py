"""Trade event producer (S1/S2) — the broker-free test harness.

Mirrors the reference's Kafka producer contract
(/root/reference/src/kafka/market_data_producer.py:18-127): decimals
serialized as strings, key=symbol, contract validation before send,
failed/invalid events routed to a DLQ — but writes JSON-lines files
(the file "topic" the streaming jobs consume). Swapping in a real
Kafka producer changes only the transport, not the contract.
"""

from __future__ import annotations

import json
import os
from typing import Any


class FileTradeProducer:
    """Append-only JSON-lines producer with contract validation + DLQ."""

    REQUIRED = ("time", "symbol", "price", "volume", "trade_id")

    def __init__(self, topic_dir: str, dlq_dir: str | None = None):
        self.topic_dir = topic_dir
        self.dlq_dir = dlq_dir or topic_dir.rstrip("/") + "-dlq"
        os.makedirs(self.topic_dir, exist_ok=True)
        os.makedirs(self.dlq_dir, exist_ok=True)
        self._buf: list[str] = []
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
        event: dict[str, Any] = {
            "time": time_ms,
            "symbol": symbol,
            # decimals as strings, like the reference's Avro wire format
            "price": None if price is None else str(price),
            "volume": None if volume is None else str(volume),
            "trade_id": trade_id,
            "side": side,
            "bid": None if bid is None else str(bid),
            "ask": None if ask is None else str(ask),
            "source": source,
        }
        if any(event[k] in (None, "") for k in self.REQUIRED) or (
            side is not None and side not in ("buy", "sell")
        ):
            self._dlq_buf.append(json.dumps(event))
            self.rejected += 1
            return False
        self._buf.append(json.dumps(event))
        self.produced += 1
        return True

    def flush(self) -> None:
        """One file per flush = one micro-batch worth of data."""
        if self._buf:
            path = os.path.join(self.topic_dir, f"part-{self._file_no:05d}.jsonl")
            with open(path, "w") as f:
                f.write("\n".join(self._buf) + "\n")
            self._buf = []
        if self._dlq_buf:
            path = os.path.join(self.dlq_dir, f"dlq-{self._file_no:05d}.jsonl")
            with open(path, "w") as f:
                f.write("\n".join(self._dlq_buf) + "\n")
            self._dlq_buf = []
        self._file_no += 1
