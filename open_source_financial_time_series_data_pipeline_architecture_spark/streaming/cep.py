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
        rows = pd.concat(list(pdfs)).sort_values(["time", "trade_id"])
        # Batch assembly (guide §4.2): the old itertuples walked EVERY
        # row building a namedtuple per trade; the vectorized mask
        # touches only the large trades (the buffer recurrence itself
        # stays a python-float fold — its pruning comparisons and
        # sum(vols) are parity-pinned against the batch oracle).
        # NB ~(v <= thr), not v > thr: NaN volumes pass the old guard.
        big = rows[~(rows["volume"] <= threshold)]
        n_big = len(big)
        out_rows = []
        if n_big:
            ns = big["time"].to_numpy(dtype="datetime64[ns]").astype("int64")
            # pandas Timestamp.timestamp() == round(ns/1e9, 6) — python
            # round, replicated exactly so prune boundaries at the
            # window edge compare identically to the old per-row form
            sec = [round(v / 1e9, 6) for v in ns.tolist()]
            vol_l = [float(v) for v in big["volume"].to_numpy(dtype="float64")]
            id_l = [str(x) for x in big["trade_id"].tolist()]
            times = big["time"].tolist()
            for i in range(n_big):
                t = sec[i]
                ts.append(t)
                vols.append(vol_l[i])
                ids.append(id_l[i])
                # prune buffer to [t - window, t]
                cut = t - window_sec
                head = 0
                while ts[head] < cut:
                    head += 1
                if head:
                    del ts[:head]
                    del vols[:head]
                    del ids[:head]
                if len(ts) >= min_count:
                    out_rows.append(
                        {
                            "symbol": key[0],
                            "anomaly_time": times[i],
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
        # Batch assembly (guide §4.2): vectorize the null filter and
        # spread arithmetic; the EMA recurrence stays a python-float
        # left fold (bit-parity with the fixed-α batch oracle), and
        # only alert rows — rare by construction — build dicts.
        q = rows[rows["bid"].notna() & rows["ask"].notna()]
        if len(q):
            spreads = [
                float(x)
                for x in (
                    q["ask"].to_numpy(dtype="float64")
                    - q["bid"].to_numpy(dtype="float64")
                )
            ]
            times = q["time"].tolist()
            for i, spread in enumerate(spreads):
                if ema is None:
                    ema = spread
                else:
                    if ema > 0 and spread > mult * ema:
                        out_rows.append(
                            {
                                "symbol": key[0],
                                "alert_time": times[i],
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
        # Batch assembly (guide §4.2): bucket ids come from one exact
        # int64 division over the whole batch (µs-grain event times:
        # int(Timestamp.timestamp()) // bs ≡ ns // (bs·10⁹) for
        # positive times); prices cross once as a float64 array. The
        # return/variance recurrences stay python-float folds —
        # math.log and the sequential sum are parity-pinned against
        # the batch operator.
        ns = rows["time"].to_numpy(dtype="datetime64[ns]").astype("int64")
        buckets = (ns // (bucket_seconds * 1_000_000_000)).tolist()
        prices = [float(p) for p in rows["price"].to_numpy(dtype="float64")]
        for i in range(len(prices)):
            price = prices[i]
            bucket = buckets[i]
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

        rows = pd.concat(list(pdfs)).sort_values(["time", "trade_id"])
        m = len(rows)
        # Batch assembly (guide §4.2, the §18 Kalman pattern): the
        # SMA/EWM recurrences stay python-float folds (sum(prices) is
        # the same left fold per row — parity-pinned vs the batch
        # window plan), but rows are assembled from preallocated numpy
        # arrays instead of a dict per row, and the regime tag is one
        # vectorized comparison (same IEEE semantics as the scalar >).
        price_in = rows["price"].to_numpy(dtype="float64")
        price_l = [float(p) for p in price_in]
        sma_arr = np.empty(m, dtype="float64")
        ewm_arr = np.empty(m, dtype="float64")
        for i in range(m):
            price = price_l[i]
            prices.append(price)
            if len(prices) > n:
                prices.pop(0)
            sma = sum(prices) / len(prices)
            ewm = price if ewm is None else alpha * price + (1.0 - alpha) * ewm
            sma_arr[i] = sma
            ewm_arr[i] = ewm

        state.update((prices, ewm))
        p_arr = np.asarray(price_l, dtype="float64")
        regime = np.where(
            p_arr > sma_arr, "up", np.where(p_arr < sma_arr, "down", "neutral")
        )
        yield pd.DataFrame(
            {
                "time": rows["time"].to_numpy(),
                "symbol": key[0],
                "trade_id": rows["trade_id"].to_numpy(),
                "price": p_arr,
                "sma_20": sma_arr,
                "ewm_12": ewm_arr,
                "regime_tag": regime,
            }
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
        n = len(rows)
        if n:
            # Batch assembly (guide §4.2): gap detection is one
            # vectorized int64 diff — identical integer-µs arithmetic
            # to the old per-row form — and only actual gap rows (rare
            # by construction) build output dicts.
            us = (
                rows["time"].to_numpy(dtype="datetime64[ns]").astype("int64")
                // 1000
            )
            prev = np.empty(n, dtype="int64")
            prev[1:] = us[:-1]
            prev[0] = last_us if last_us is not None else us[0]
            mask = (us - prev) / 1e6 > threshold_sec
            if last_us is None:
                mask[0] = False
            if mask.any():
                times = rows["time"]
                for i in np.nonzero(mask)[0].tolist():
                    p = int(prev[i])
                    out_rows.append(
                        {
                            "symbol": key[0],
                            "gap_start": pd.Timestamp(p * 1000),
                            "gap_end": times.iloc[i],
                            "gap_seconds": round((int(us[i]) - p) / 1e6, 6),
                        }
                    )
            last_us, last_tid = int(us[-1]), rows["trade_id"].iloc[-1]
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
        n = len(rows)
        if n == 0:
            state.update((last_price, last_mid, tickdir))
            yield pd.DataFrame(
                [], columns=["symbol", "time", "trade_id", "cls"]
            )
            return
        # Batch assembly (guide §4.2): the whole classifier vectorizes.
        # The quote rule compares price to the PREVIOUS row's midquote
        # (NaN encodes "no quote" — price>NaN is False, exactly the
        # old `mid_prev is not None and ...` guard); the tick rule is a
        # sign array with zeros forward-filled from the last nonzero
        # (zero ticks carry the old direction), seeded from state.
        # Same IEEE comparisons as the scalar form — label-identical.
        price = rows["price"].to_numpy(dtype="float64")
        bid = rows["bid"].to_numpy(dtype="float64")
        ask = rows["ask"].to_numpy(dtype="float64")
        mids = (bid + ask) / 2.0  # NaN where either quote is missing
        mid_prev = np.empty(n, dtype="float64")
        mid_prev[1:] = mids[:-1]
        mid_prev[0] = last_mid if last_mid is not None else np.nan
        prev_price = np.empty(n, dtype="float64")
        prev_price[1:] = price[:-1]
        prev_price[0] = last_price if last_price is not None else np.nan
        sign = np.where(
            price > prev_price, 1, np.where(price < prev_price, -1, 0)
        )
        seed = tickdir if tickdir is not None else 0
        nz_idx = np.where(sign != 0, np.arange(n), -1)
        last_nz = np.maximum.accumulate(nz_idx)
        tick = np.where(last_nz >= 0, sign[np.maximum(last_nz, 0)], seed)
        cls = np.select(
            [
                price > mid_prev,
                price < mid_prev,
                tick == 1,
                tick == -1,
            ],
            ["buy", "sell", "buy", "sell"],
            default=None,
        )
        last_price = float(price[-1])
        last_mid = None if np.isnan(mids[-1]) else float(mids[-1])
        td = int(tick[-1])
        tickdir = td if td != 0 else (tickdir if tickdir is not None else None)
        state.update((last_price, last_mid, tickdir))
        yield pd.DataFrame(
            {
                "symbol": key[0],
                "time": rows["time"].to_numpy(),
                "trade_id": rows["trade_id"].to_numpy(),
                "cls": cls,
            }
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
