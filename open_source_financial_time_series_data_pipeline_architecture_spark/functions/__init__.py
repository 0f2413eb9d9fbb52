from .features import (
    bidask_spreads,
    ewm,
    ewm_series,
    large_trade_flags,
    bar_rollup,
    ohlc,
    regime_tags,
    sma,
    time_bucket,
    trade_imbalance,
    volatility,
    vwap,
)

__all__ = [
    "bidask_spreads",
    "ewm",
    "ewm_series",
    "large_trade_flags",
    "bar_rollup",
    "ohlc",
    "regime_tags",
    "sma",
    "time_bucket",
    "trade_imbalance",
    "volatility",
    "vwap",
]
