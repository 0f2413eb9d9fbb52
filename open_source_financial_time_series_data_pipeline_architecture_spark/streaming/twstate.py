"""Stateful streaming on Spark 4's `transformWithStateInPandas`.

The applyInPandasWithState handlers in `cep.py` carry their whole state
as one tuple; this module uses the NEWER typed-state API
(StatefulProcessor + ListState/ValueState/MapState + timers) — the
shape Spark is standardizing on for arbitrary stateful streaming. One
production-shaped example lives here: a per-symbol running top-k
largest-trades tracker.

`transformWithStateInPandas` requires the RocksDB state store provider
(`spark.sql.streaming.stateStore.providerClass = ...RocksDBStateStoreProvider`)
— set it on the session before starting the query (bundled with Spark 4,
no extra install) — AND the `protobuf` Python package (its state server
speaks protobuf). This container has no protobuf, so the test suite
skips execution here (tests/test_twstate.py importorskip) and the
equivalent applyInPandasWithState operators in `cep.py` carry the
tested streaming-state coverage; on a normal cluster (pyspark ships
protobuf as a dependency) this module runs as-is.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

TOPK_OUTPUT_SCHEMA = (
    "symbol string, version long, trade_ids array<string>, volumes array<double>"
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class TopTradesProcessor(StatefulProcessor):
    """Maintains the top-k trades by volume per symbol in ListState and
    emits a full (versioned) snapshot whenever membership changes —
    downstream consumers only ever need the latest version per key.

    State is exactly k rows per symbol regardless of stream length; the
    version counter lives in a ValueState."""

    def __init__(self, k: int):
        self.k = k

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.top = handle.getListState("top", "volume double, trade_id string")
        self.version = handle.getValueState("version", "v long")

    def handleInputRows(
        self, key, rows, timerValues
    ) -> Iterator[pd.DataFrame]:
        current = [(float(r[0]), str(r[1])) for r in self.top.get()]
        before = sorted(current)
        for pdf in rows:
            for r in pdf.itertuples():
                entry = (float(r.volume), str(r.trade_id))
                if len(current) < self.k:
                    current.append(entry)
                elif entry > min(current):
                    current.remove(min(current))
                    current.append(entry)
        current.sort(reverse=True)
        if sorted(current) == before:
            return iter(())
        v = (self.version.get()[0] if self.version.exists() else 0) + 1
        self.version.update((v,))
        self.top.put([(vol, tid) for vol, tid in current])
        out = pd.DataFrame(
            {
                "symbol": [key[0]],
                "version": [v],
                "trade_ids": [[tid for _, tid in current]],
                "volumes": [[vol for vol, _ in current]],
            }
        )
        return iter((out,))

    def close(self) -> None:
        pass


def top_trades_tracker(trades: DataFrame, k: int = 3) -> DataFrame:
    """Per-symbol running top-k largest trades as a
    `transformWithStateInPandas` query (typed ListState + ValueState;
    state bounded at k rows per key forever). Emits a versioned
    snapshot per membership change; the max-version row per symbol is
    always the current top-k — batch parity is tested in
    tests/test_twstate.py."""
    return (
        trades.select("symbol", "volume", "trade_id")
        .groupBy("symbol")
        .transformWithStateInPandas(
            TopTradesProcessor(k),
            outputStructType=TOPK_OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="None",
        )
    )
