"""Stateful CEP handlers (T3–T5) via ``applyInPandasWithState``.

Re-implements the reference's Flink KeyedProcessFunctions:

- ``large_trade_cep``  — LargeTradeDetector: ≥N large trades within a
  sliding window per symbol → anomaly event carrying the trade list
  (/root/reference/flink-jobs/market-realtime/anomaly_detection.py:40-102,
  enhanced_anomaly_detection.py:48-124). Exact stateful semantics — the
  buffer is pruned to [t−window, t] per element, NOT a tumbling-window
  approximation.
- ``spread_ema_monitor`` — BidAskSpreadMonitor: running EMA (α=0.1) of
  the spread as the "normal" baseline; alert when spread > mult×EMA
  (anomaly_detection.py:105-149).

State shape mirrors the Flink ValueState/ListState pair (T4): the
buffer is kept as parallel lists inside the GroupState tuple; Spark
checkpoints it per micro-batch, giving the same restart-survival the
RocksDB backend provides in the reference.

Scale: state is per-symbol and bounded (buffer ≤ events within the
window; EMA is O(1)). Keys partition across executors; a hot symbol is
the unit of serialization, exactly as in Flink's keyed streams.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ANOMALY_SCHEMA = (
    "symbol string, anomaly_time timestamp, n_large_trades int, "
    "trade_ids array<string>, total_volume double"
)
_LT_STATE_SCHEMA = "ts array<double>, vols array<double>, ids array<string>"

ALERT_SCHEMA = (
    "symbol string, alert_time timestamp, spread double, ema_spread double"
)
_EMA_STATE_SCHEMA = "ema double"


def _large_trade_fn(threshold: float, window_sec: float, min_count: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ts, vols, ids = state.get
            ts, vols, ids = list(ts), list(vols), list(ids)
        else:
            ts, vols, ids = [], [], []
        out_rows = []
        rows = pd.concat(list(pdfs)).sort_values(["time", "trade_id"])
        for r in rows.itertuples():
            t = r.time.timestamp()
            if r.volume <= threshold:
                continue
            ts.append(t)
            vols.append(float(r.volume))
            ids.append(str(r.trade_id))
            # prune buffer to [t - window, t]
            while ts and ts[0] < t - window_sec:
                ts.pop(0)
                vols.pop(0)
                ids.pop(0)
            if len(ts) >= min_count:
                out_rows.append(
                    {
                        "symbol": key[0],
                        "anomaly_time": r.time,
                        "n_large_trades": len(ts),
                        "trade_ids": list(ids),
                        "total_volume": float(sum(vols)),
                    }
                )
        state.update((ts, vols, ids))
        yield pd.DataFrame(
            out_rows,
            columns=[
                "symbol",
                "anomaly_time",
                "n_large_trades",
                "trade_ids",
                "total_volume",
            ],
        )

    return fn


def large_trade_cep(
    trades: DataFrame,
    threshold: float,
    window_sec: float = 300.0,
    min_count: int = 3,
) -> DataFrame:
    """T3/T4 — emit an anomaly for every large trade that brings the
    per-symbol count within the trailing window to ≥ min_count."""
    return trades.select("time", "symbol", "volume", "trade_id").groupBy(
        "symbol"
    ).applyInPandasWithState(
        _large_trade_fn(threshold, window_sec, min_count),
        outputStructType=ANOMALY_SCHEMA,
        stateStructType=_LT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _spread_ema_fn(alpha: float, mult: float):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        ema = state.get[0] if state.exists else None
        out_rows = []
        rows = pd.concat(list(pdfs)).sort_values(["time"])
        for r in rows.itertuples():
            if r.bid is None or r.ask is None or pd.isna(r.bid) or pd.isna(r.ask):
                continue
            spread = float(r.ask) - float(r.bid)
            if ema is None:
                ema = spread
            else:
                if ema > 0 and spread > mult * ema:
                    out_rows.append(
                        {
                            "symbol": key[0],
                            "alert_time": r.time,
                            "spread": spread,
                            "ema_spread": ema,
                        }
                    )
                ema = alpha * spread + (1.0 - alpha) * ema
        if ema is not None:
            state.update((float(ema),))
        yield pd.DataFrame(
            out_rows, columns=["symbol", "alert_time", "spread", "ema_spread"]
        )

    return fn


def spread_ema_monitor(
    trades: DataFrame, alpha: float = 0.1, mult: float = 3.0
) -> DataFrame:
    """T5/W5 — running-EMA spread baseline + anomaly alerts."""
    return trades.select("time", "symbol", "bid", "ask").groupBy(
        "symbol"
    ).applyInPandasWithState(
        _spread_ema_fn(alpha, mult),
        outputStructType=ALERT_SCHEMA,
        stateStructType=_EMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
