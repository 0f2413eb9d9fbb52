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

import numpy as np
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


VOL_SCHEMA = "bucket timestamp, symbol string, volatility double, sample_count long"
_VOL_STATE_SCHEMA = (
    "last_price double, cur_bucket long, rets array<double>"
)


def _volatility_fn(bucket_seconds: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import math

        if state.exists:
            last_price, cur_bucket, rets = state.get
            rets = list(rets)
        else:
            last_price, cur_bucket, rets = None, None, []

        out_rows = []

        def finalize(bucket: int, returns: list[float]):
            n = len(returns)
            if n >= 2:
                mean = sum(returns) / n
                var = sum((x - mean) ** 2 for x in returns) / (n - 1)
                vol = math.sqrt(var)
            else:
                vol = None
            out_rows.append(
                {
                    "bucket": pd.Timestamp(bucket * bucket_seconds, unit="s"),
                    "symbol": key[0],
                    "volatility": vol,
                    "sample_count": n,
                }
            )

        rows = pd.concat(list(pdfs)).sort_values(["time", "trade_id"])
        for r in rows.itertuples():
            price = float(r.price)
            bucket = int(pd.Timestamp(r.time).timestamp()) // bucket_seconds
            if cur_bucket is not None and bucket != cur_bucket:
                finalize(cur_bucket, rets)
                rets = []
            cur_bucket = bucket
            # the batch job's rule (features.volatility): lag over the
            # WHOLE symbol partition — an hour's first return uses the
            # prior hour's last price; null/invalid lag contributes 0.0
            if last_price is not None and last_price > 0 and price > 0:
                rets.append(math.log(price / last_price))
            else:
                rets.append(0.0)
            last_price = price

        state.update((last_price, cur_bucket, rets))
        yield pd.DataFrame(
            out_rows, columns=["bucket", "symbol", "volatility", "sample_count"]
        )

    return fn


def streaming_volatility(trades: DataFrame, bucket_seconds: int = 3600) -> DataFrame:
    """A4 as a stateful streaming operator: per-symbol hourly stddev of
    log returns with the batch job's cross-hour carry (the first return
    of an hour uses the PRIOR hour's last price — state crosses both
    hour and micro-batch boundaries, which no watermarked windowed agg
    can express because the lag reaches outside the window).

    An hour is finalized and emitted when a later-hour row arrives for
    that symbol; the in-progress hour lives in state (one float per
    return, bounded by the hour's row count). Batch parity is tested in
    tests/test_streaming.py.
    """
    return trades.select("time", "symbol", "price", "trade_id").groupBy(
        "symbol"
    ).applyInPandasWithState(
        _volatility_fn(bucket_seconds),
        outputStructType=VOL_SCHEMA,
        stateStructType=_VOL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ROWFEAT_SCHEMA = (
    "time timestamp, symbol string, trade_id string, price double, "
    "sma_20 double, ewm_12 double, regime_tag string"
)
_ROWFEAT_STATE_SCHEMA = "prices array<double>, ewm double"


def _row_features_fn(n: int, alpha: float):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            prices, ewm = state.get
            prices = list(prices)
            ewm = None if pd.isna(ewm) else float(ewm)
        else:
            prices, ewm = [], None

        out = []
        rows = pd.concat(list(pdfs)).sort_values(["time", "trade_id"])
        for r in rows.itertuples():
            price = float(r.price)
            prices.append(price)
            if len(prices) > n:
                prices.pop(0)
            sma = sum(prices) / len(prices)
            ewm = price if ewm is None else alpha * price + (1.0 - alpha) * ewm
            regime = "up" if price > sma else ("down" if price < sma else "neutral")
            out.append(
                {
                    "time": r.time,
                    "symbol": key[0],
                    "trade_id": r.trade_id,
                    "price": price,
                    "sma_20": sma,
                    "ewm_12": ewm,
                    "regime_tag": regime,
                }
            )

        state.update((prices, ewm))
        yield pd.DataFrame(
            out,
            columns=[
                "time", "symbol", "trade_id", "price", "sma_20", "ewm_12", "regime_tag",
            ],
        )

    return fn


def streaming_row_features(
    trades: DataFrame, n: int = 20, span: int = 12
) -> DataFrame:
    """A2/A3/A9 as ONE stateful streaming pass: per-trade SMA-n, EWM
    recurrence, and regime tag. State per symbol is the last n−1 prices
    plus the EWM accumulator — O(n) floats, crossing micro-batch
    boundaries, so the trailing window and the recurrence are exact
    continuations of all history (a watermarked windowed agg cannot
    express either: the row frame and the recurrence both reach across
    window boundaries). Completes the streaming side of the 11-feature
    contract next to streaming_ohlc/vwap/imbalance/volatility/
    quantile_flags. Batch parity: tests/test_streaming.py.
    """
    alpha = 2.0 / (span + 1)
    return trades.select("time", "symbol", "price", "trade_id").groupBy(
        "symbol"
    ).applyInPandasWithState(
        _row_features_fn(n, alpha),
        outputStructType=ROWFEAT_SCHEMA,
        stateStructType=_ROWFEAT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


GAP_SCHEMA = (
    "symbol string, gap_start timestamp, gap_end timestamp,"
    " gap_seconds double"
)
_GAP_STATE_SCHEMA = "last_us long, last_tid string"


def _gap_monitor_fn(threshold_sec: float):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        # exact integer microseconds — a float-seconds roundtrip would
        # perturb the emitted gap_start at the nanosecond level and
        # break hash parity with the oracle's lag(time)
        last_us = state.get[0] if state.exists else None
        out_rows = []
        rows = pd.concat(list(pdfs)).sort_values(["time", "trade_id"])
        last_tid = state.get[1] if state.exists else None
        for r in rows.itertuples():
            ts_us = r.time.value // 1000
            if last_us is not None and (ts_us - last_us) / 1e6 > threshold_sec:
                out_rows.append(
                    {
                        "symbol": key[0],
                        "gap_start": pd.Timestamp(last_us * 1000),
                        "gap_end": r.time,
                        "gap_seconds": round((ts_us - last_us) / 1e6, 6),
                    }
                )
            last_us, last_tid = ts_us, r.trade_id
        if last_us is not None:
            state.update((int(last_us), str(last_tid)))
        yield pd.DataFrame(
            out_rows,
            columns=["symbol", "gap_start", "gap_end", "gap_seconds"],
        )

    return fn


def gap_monitor(trades: DataFrame, threshold_sec: float = 1800.0) -> DataFrame:
    """Streaming feed-outage detector (the streaming twin of the batch
    heartbeat/uptime accounting): per-symbol last-seen timestamp lives
    in GroupState — O(1) floats per key — and an alert row is emitted
    for every inter-arrival gap exceeding ``threshold_sec``. State
    crosses micro-batch boundaries, so a gap spanning two batches is
    still detected exactly once."""
    return trades.select("time", "symbol", "trade_id").groupBy(
        "symbol"
    ).applyInPandasWithState(
        _gap_monitor_fn(threshold_sec),
        outputStructType=GAP_SCHEMA,
        stateStructType=_GAP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


KALMAN_SCHEMA = (
    "time timestamp, symbol string, trade_id string, price double,"
    " kf_level double, kf_var double, kf_gain double"
)
_KALMAN_STATE_SCHEMA = "m double, p double"


def _kalman_fn(q_var: float, r_var: float, p_init: float):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            m, p = state.get
            m, p = float(m), float(p)
        else:
            m, p = None, None
        rows = pd.concat(list(pdfs)).sort_values(["time", "trade_id"])
        n = len(rows)
        # The (m, p) recurrence stays a sequential python-float fold —
        # bit-parity with the batch operator and the oracle pins the
        # exact left-fold arithmetic — but the row assembly is
        # array-based: the old dict-per-row itertuples build dominated
        # the per-batch cost (guide §4.2). float64 NaN for the first
        # row's undefined gain converts to the same null the old None
        # did (both pass through a float64 pandas column).
        y_arr = np.ascontiguousarray(rows["price"].to_numpy(dtype="float64"))
        levels = np.empty(n, dtype="float64")
        variances = np.empty(n, dtype="float64")
        gains = np.empty(n, dtype="float64")
        for i in range(n):
            y = float(y_arr[i])
            if m is None:
                m, p, k = y, float(p_init), float("nan")
            else:
                pp = p + q_var
                k = pp / (pp + r_var)
                m = m + k * (y - m)
                p = (1.0 - k) * pp
            levels[i] = m
            variances[i] = p
            gains[i] = k
        state.update((m, p))
        yield pd.DataFrame(
            {
                "time": rows["time"].to_numpy(),
                "symbol": key[0],
                "trade_id": rows["trade_id"].to_numpy(),
                "price": y_arr,
                "kf_level": levels,
                "kf_var": variances,
                "kf_gain": gains,
            }
        )

    return fn


def streaming_kalman(
    trades: DataFrame,
    q: float = 0.01,
    r: float = 1.0,
    p_init: float = 1.0,
) -> DataFrame:
    """W5-class state-space streaming: the local-level Kalman filter
    (operators/statespace.py) as an exact continuation across
    micro-batch boundaries. State per symbol is (level, posterior
    variance) — two doubles; identical double arithmetic to the batch
    operator, so streaming output == batch output row by row (pinned
    in tests/test_streaming.py). The adaptive gain is what the
    fixed-alpha spread_ema_monitor cannot express."""
    return trades.select("time", "symbol", "price", "trade_id").groupBy(
        "symbol"
    ).applyInPandasWithState(
        _kalman_fn(q, r, p_init),
        outputStructType=KALMAN_SCHEMA,
        stateStructType=_KALMAN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


LEE_READY_SCHEMA = (
    "symbol string, time timestamp, trade_id string, cls string"
)
_LR_STATE_SCHEMA = "last_price double, last_mid double, tickdir int"


def _lee_ready_fn():
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        last_price, last_mid, tickdir = (
            state.get if state.exists else (None, None, None)
        )
        rows = pd.concat(list(pdfs)).sort_values(["time", "trade_id"])
        out = []
        for r in rows.itertuples():
            price = float(r.price)
            mid_prev = last_mid
            if last_price is not None:
                if price > last_price:
                    tickdir = 1
                elif price < last_price:
                    tickdir = -1  # zero ticks carry the old direction
            if mid_prev is not None and price > mid_prev:
                cls = "buy"
            elif mid_prev is not None and price < mid_prev:
                cls = "sell"
            elif tickdir == 1:
                cls = "buy"
            elif tickdir == -1:
                cls = "sell"
            else:
                cls = None
            out.append(
                {
                    "symbol": key[0],
                    "time": r.time,
                    "trade_id": r.trade_id,
                    "cls": cls,
                }
            )
            last_price = price
            has_quotes = (
                r.bid is not None
                and r.ask is not None
                and not pd.isna(r.bid)
                and not pd.isna(r.ask)
            )
            last_mid = (
                (float(r.bid) + float(r.ask)) / 2 if has_quotes else None
            )
        state.update((last_price, last_mid, tickdir))
        yield pd.DataFrame(
            out, columns=["symbol", "time", "trade_id", "cls"]
        )

    return fn


def streaming_lee_ready(trades: DataFrame) -> DataFrame:
    """The prevailing-quote Lee-Ready classifier as keyed streaming
    state: (last price, last midquote, carried tick direction) — three
    scalars per symbol, exact continuation across micro-batches, so the
    streamed per-trade labels equal the batch window plan row-for-row
    (pinned in tests/test_streaming.py). The batch form's growing
    ignore-nulls last() IS this carry."""
    return trades.select(
        "time", "symbol", "price", "trade_id", "bid", "ask"
    ).groupBy("symbol").applyInPandasWithState(
        _lee_ready_fn(),
        outputStructType=LEE_READY_SCHEMA,
        stateStructType=_LR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
