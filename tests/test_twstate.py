"""transformWithStateInPandas (Spark 4 typed-state API): per-symbol
running top-k largest trades, state bounded at k rows per key,
snapshots versioned — latest version per symbol == batch top-k."""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from open_source_financial_time_series_data_pipeline_architecture_spark import streaming as STR
from open_source_financial_time_series_data_pipeline_architecture_spark.streaming.twstate import (
    ROCKSDB_PROVIDER,
    top_trades_tracker,
)

BASE = dt.datetime(2024, 3, 1, 10, 0, 0)

# the runtime path (not the processor logic) needs protobuf for the
# transformWithState state server — absent in this container
needs_protobuf = pytest.mark.skipif(
    __import__("importlib").util.find_spec("google") is None,
    reason="transformWithStateInPandas state server needs protobuf "
    "(see twstate.py docstring)",
)


@pytest.fixture()
def rocksdb_state(spark):
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    yield
    if old is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, old)


@needs_protobuf
def test_top_trades_tracker_matches_batch(spark, tmp_path, rocksdb_state):
    src = tmp_path / "tt_src"
    src.mkdir()
    rows = []
    for sym_i, sym in enumerate(["AAPL", "MSFT"]):
        for i in range(40):
            t = BASE + dt.timedelta(minutes=i)
            rows.append(
                {
                    "time": int(t.timestamp() * 1000),
                    "symbol": sym,
                    "price": "100.0",
                    "volume": f"{((i * 37 + sym_i * 11) % 100) + 1}.00",
                    "trade_id": f"TT-{sym}-{i:04d}",
                    "side": None, "bid": None, "ask": None, "source": "t",
                }
            )
    # two micro-batches with pinned order: state must carry
    import os as _os
    import time as _t

    with open(src / "a.jsonl", "w") as f:
        for r in rows[:40]:
            f.write(json.dumps(r) + "\n")
    with open(src / "b.jsonl", "w") as f:
        for r in rows[40:]:
            f.write(json.dumps(r) + "\n")
    now = _t.time()
    _os.utime(src / "a.jsonl", (now - 60, now - 60))
    _os.utime(src / "b.jsonl", (now, now))

    good, _ = STR.read_trade_stream_json(spark, str(src), max_files_per_trigger=1)
    q = (
        top_trades_tracker(good, k=3)
        .writeStream.format("memory")
        .queryName("toptrades")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    latest = {}
    for r in spark.sql("SELECT * FROM toptrades").collect():
        if r["symbol"] not in latest or r["version"] > latest[r["symbol"]]["version"]:
            latest[r["symbol"]] = r
    assert set(latest) == {"AAPL", "MSFT"}

    # batch ground truth: top-3 by (volume, trade_id) per symbol
    batch = spark.createDataFrame(
        [(r["symbol"], float(r["volume"]), r["trade_id"]) for r in rows],
        "symbol string, volume double, trade_id string",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("symbol").orderBy(
        F.col("volume").desc(), F.col("trade_id").desc()
    )
    exp = {
        sym: [
            (r["volume"], r["trade_id"])
            for r in batch.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .filter(F.col("symbol") == sym)
            .orderBy(F.col("volume").desc(), F.col("trade_id").desc())
            .collect()
        ]
        for sym in ["AAPL", "MSFT"]
    }
    for sym, row in latest.items():
        got_pairs = list(zip(row["volumes"], row["trade_ids"]))
        assert got_pairs == exp[sym], (sym, got_pairs, exp[sym])


def test_processor_logic_with_stub_state():
    """The top-k maintenance logic itself, driven with stub state (no
    streaming runtime needed): the runtime path is env-gated above, the
    semantics are pinned here."""
    import pandas as pd

    from open_source_financial_time_series_data_pipeline_architecture_spark.streaming.twstate import (
        TopTradesProcessor,
    )

    class StubList:
        def __init__(self):
            self.rows = []
        def get(self):
            return iter(self.rows)
        def put(self, rows):
            self.rows = list(rows)

    class StubValue:
        def __init__(self):
            self.v = None
        def exists(self):
            return self.v is not None
        def get(self):
            return self.v
        def update(self, v):
            self.v = v

    p = TopTradesProcessor(k=2)
    p.top, p.version = StubList(), StubValue()

    def feed(vols_ids):
        pdf = pd.DataFrame(
            {"volume": [v for v, _ in vols_ids], "trade_id": [t for _, t in vols_ids]}
        )
        return list(p.handleInputRows(("AAPL",), iter([pdf]), None))

    out1 = feed([(10.0, "a"), (30.0, "b")])
    assert out1[0]["trade_ids"].iloc[0] == ["b", "a"]
    # smaller trade does not change membership -> no emission
    assert feed([(5.0, "c")]) == []
    # bigger trade evicts the min and bumps the version
    out3 = feed([(20.0, "d")])
    assert out3[0]["trade_ids"].iloc[0] == ["b", "d"]
    assert out3[0]["version"].iloc[0] == 2
