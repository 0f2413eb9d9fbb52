"""`tickgen` — a custom Python Data Source generating synthetic trades.

Spark-native replacement for the reference's driver-side generator
(/root/reference/scripts/generate_test_data.py:13-111): 5 symbols,
random-walk prices (±0.5 per step around a per-symbol base), volume
U(10,1000), bid/ask spread U(0.01,0.10), alternating buy/sell with
occasional NULL side, and an injected 10-15× "large trade" — but
produced ON THE EXECUTORS through Spark 4's Python Data Source API
(`pyspark.sql.datasource`), one partition per symbol, deterministic
from (seed, symbol) so every retry/replay of a task regenerates
identical rows (safe under speculative execution).

    spark.dataSource.register(TickGenDataSource)
    spark.read.format("tickgen")
        .option("rows_per_symbol", 1000).option("seed", 7).load()
    spark.readStream.format("tickgen")
        .option("rows_per_batch", 100).load()

The streaming side implements the same generator behind
`SimpleDataSourceStreamReader` offsets — each micro-batch is a
deterministic row range, so checkpoint replay reproduces the exact
batch (exactly-once composes with the idempotent upsert sink).

The generator never touches the driver: scale the row count and the
work fans out by partition like any other scan.
"""

from __future__ import annotations

import datetime as dt
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

TICK_SCHEMA = (
    "time timestamp, symbol string, price double, volume double, "
    "trade_id string, side string, bid double, ask double, source string"
)

SYMBOLS = ("AAPL", "GOOGL", "MSFT", "AMZN", "TSLA")
BASE_PRICES = {"AAPL": 150.0, "GOOGL": 2800.0, "MSFT": 380.0, "AMZN": 170.0, "TSLA": 250.0}
EPOCH = dt.datetime(2024, 6, 1, 9, 30, 0)


def _lcg(state: int):
    """Park–Miller LCG yielding floats in [0, 1) — dependency-free and
    identical on every executor/Python version."""
    while True:
        state = (state * 48271) % 2147483647
        yield state / 2147483647.0


def _symbol_seed(seed: int, symbol: str) -> int:
    h = 0
    for ch in symbol:
        h = (h * 131 + ord(ch)) % 2147483647
    return (seed * 2654435761 + h) % 2147483647 or 1


def gen_rows(symbol: str, start: int, end: int, seed: int, step_ms: int = 1000):
    """Deterministic trade rows [start, end) for one symbol.

    The random walk is re-derived from row 0 each call so any row range
    is reproducible in isolation; cost is O(end), which keeps the
    generator pure — the trade-off the exactly-once replay contract
    wants (micro-batch ranges are always near the head at stream scale
    ... for backfills use one batch read instead).
    """
    rnd = _lcg(_symbol_seed(seed, symbol))
    price = BASE_PRICES.get(symbol, 100.0)
    for i in range(end):
        price = max(1.0, price + (next(rnd) - 0.5))
        vol = 10.0 + next(rnd) * 990.0
        large = next(rnd) < 0.01
        if large:
            vol *= 10.0 + next(rnd) * 5.0
        spread = 0.01 + next(rnd) * 0.09
        side_roll = next(rnd)
        if i < start:
            continue
        ts = EPOCH + dt.timedelta(milliseconds=i * step_ms)
        side = None if side_roll < 0.1 else ("buy" if side_roll < 0.55 else "sell")
        yield (
            ts,
            symbol,
            round(price, 4),
            round(vol, 2),
            f"{symbol}-{i:08d}",
            side,
            round(price - spread / 2, 4),
            round(price + spread / 2, 4),
            "tickgen",
        )


class _SymbolPartition(InputPartition):
    def __init__(self, symbol: str, start: int, end: int, seed: int, step_ms: int):
        self.symbol = symbol
        self.start = start
        self.end = end
        self.seed = seed
        self.step_ms = step_ms


class TickGenReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows_per_symbol", 1000))
        self.seed = int(options.get("seed", 42))
        self.step_ms = int(options.get("step_ms", 1000))
        self.symbols = tuple(
            s for s in options.get("symbols", ",".join(SYMBOLS)).split(",") if s
        )
        # split each symbol into slices so parallelism is not capped at
        # |symbols| — the 100 TB posture for a generator-backed backfill
        self.slices = max(1, int(options.get("slices_per_symbol", 1)))

    def partitions(self):
        parts = []
        per = self.rows // self.slices or self.rows
        for sym in self.symbols:
            lo = 0
            while lo < self.rows:
                hi = min(self.rows, lo + per)
                parts.append(_SymbolPartition(sym, lo, hi, self.seed, self.step_ms))
                lo = hi
        return parts

    def read(self, partition: _SymbolPartition) -> Iterator[tuple]:
        yield from gen_rows(
            partition.symbol,
            partition.start,
            partition.end,
            partition.seed,
            partition.step_ms,
        )


class TickGenStreamReader(SimpleDataSourceStreamReader):
    """Offset = rows emitted per symbol; each micro-batch is the next
    `rows_per_batch` rows of every symbol — a pure function of the
    offset range, so checkpoint replay regenerates identical batches."""

    def __init__(self, options):
        self.batch = int(options.get("rows_per_batch", 100))
        self.seed = int(options.get("seed", 42))
        self.step_ms = int(options.get("step_ms", 1000))
        self.symbols = tuple(
            s for s in options.get("symbols", ",".join(SYMBOLS)).split(",") if s
        )

    def initialOffset(self):
        return {"n": 0}

    def read(self, start: dict):
        end = {"n": start["n"] + self.batch}
        return self._rows(start["n"], end["n"]), end

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["n"], end["n"])

    def _rows(self, lo: int, hi: int) -> list[tuple]:
        # a concrete list, not a generator: the SimpleStreamReader
        # wrapper caches and copy.copy()s the batch for replay
        out: list[tuple] = []
        for sym in self.symbols:
            out.extend(gen_rows(sym, lo, hi, self.seed, self.step_ms))
        return out


class TickGenDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "tickgen"

    def schema(self) -> str:
        return TICK_SCHEMA

    def reader(self, schema) -> TickGenReader:
        return TickGenReader(self.options)

    def simpleStreamReader(self, schema) -> TickGenStreamReader:
        return TickGenStreamReader(self.options)
